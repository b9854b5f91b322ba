package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Preference-data preparation for RLHF/DPO-style post-training.
  *
  * Public-algorithm provenance (ideas, not code): direct preference
  * optimization trains on (prompt, chosen, rejected) triples with a
  * score margin (Rafailov et al. 2023, "Direct Preference
  * Optimization"); best-of-n rejection sampling scores n candidates
  * per prompt and keeps the winner (Stiennon et al. 2020, "Learning to
  * summarize from human feedback"; Touvron et al. 2023, Llama 2).
  * Extension tier — no counterpart in the reference
  * (/root/reference/wrangle_pypes is record wrangling only).
  *
  * Float-parity note: scores are SELECTED (max/min/max_by), never
  * accumulated, so they stay bit-identical to the oracle's; the one
  * accumulated quantity (a batch mean) goes through the engine-exact
  * quantized decimal sum used everywhere else (see
  * graft.queries.Oracle.dsum — duplicated inline here because ext/
  * must not depend on the query layer).
  */
object Preference {

  /** The engine-exact quantized decimal sum — the cross-engine float
    * contract every accumulated double in this module (and its DuckDB
    * oracles) must share: floor(x·1e7 + 0.5) in double space, summed as
    * exact DECIMAL(27,0), divided back. ONE definition so the constants
    * cannot drift apart between fits (see graft.queries.Oracle.dsum —
    * duplicated here because ext/ must not depend on the query layer). */
  private def qsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(floor(c * lit(1e7) + lit(0.5)).cast(DecimalType(27, 0)))
      .cast(DoubleType) / lit(1e7)

  /** The deterministic bootstrap COUNT DRAW shared by every resampler:
    * per (edge, replicate) the endpoint rolling hashes mix with the
    * caller's draw key through the given prime and the Knuth step into
    * one of the 250 z-quantile buckets, and the count resamples as
    * round(N(n, n)) clipped at 0. ONE definition so the three engine
    * call sites and their oracle renderings cannot drift apart.
    * `edges` carries (x, y, n) plus any grouping columns; `drawKey` is
    * the replicate id (or a composite group·reps+replicate) evaluated
    * AFTER the reps cross join. Returns the input columns plus the
    * reps column, with `n` replaced by the positive drawn counts. */
  private def countDraw(edges: DataFrame, hashed: DataFrame,
                        repsDf: DataFrame, mix: Long,
                        drawKey: org.apache.spark.sql.Column): DataFrame = {
    val session = edges.sparkSession
    import session.implicits._
    val zt = ZTable.zipWithIndex.map { case (z, i) => (i.toLong, z) }
      .toSeq.toDF("zb", "z")
    val key0 = pmod(col("hx") * lit(31L) + col("hy"), lit(HashMod))
    val bucket = pmod(
      pmod(key0 * lit(mix) + drawKey, lit(HashMod)) * lit(Knuth),
      lit(ZBuckets.toLong))
    val nD = col("n").cast(DoubleType)
    edges
      .join(hashed.select(col("item").as("x"), col("h").as("hx")), Seq("x"))
      .join(hashed.select(col("item").as("y"), col("h").as("hy")), Seq("y"))
      .crossJoin(broadcast(repsDf))
      .join(broadcast(zt), col("zb") === bucket)
      .withColumn("n_drawn",
        greatest(lit(0L), floor(nD + sqrt(nD) * col("z") + lit(0.5))))
      .filter(col("n_drawn") > 0)
  }

  /** DPO pair construction: per candidate group (prompt), chosen = the
    * highest-scored candidate, rejected = the lowest-scored; a pair is
    * emitted only when the score margin clears `minMargin` (weak
    * preferences make noisy DPO labels, so margin filtering is the
    * standard knob).
    *
    * Scale shape: ONE hash aggregate — map-side partial `max_by`/
    * `min_by`, a single shuffle on the group key, HAVING-style filter
    * after. No window over the corpus, no self-join, nothing on the
    * driver; at 100 TB the group key (prompt id) is high-cardinality,
    * exactly what hash aggregation wants. Ties break deterministically
    * to the smallest candidate id on both sides: the chosen ordering
    * key is (score, -id) maximized, the rejected key (score, id)
    * minimized.
    */
  def pairs(candidates: DataFrame, groupCols: Seq[String], idCol: String,
            scoreCol: String, minMargin: Double): DataFrame = {
    val g = candidates
      .filter(col(scoreCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_candidates"),
        expr(s"max_by($idCol, struct($scoreCol, -$idCol))").as("chosen_id"),
        max(col(scoreCol)).as("chosen_score"),
        expr(s"min_by($idCol, struct($scoreCol, $idCol))").as("rejected_id"),
        min(col(scoreCol)).as("rejected_score"))
    // chosen_id =!= rejected_id: with minMargin <= 0 an all-tied group
    // passes the margin filter and both extremes tie-break to the same
    // smallest id — a DPO pair of an item against itself is never a
    // valid label, so degenerate pairs are dropped unconditionally.
    g.withColumn("margin", col("chosen_score") - col("rejected_score"))
      .filter(col("n_candidates") >= 2 && col("margin") >= lit(minMargin) &&
        col("chosen_id") =!= col("rejected_id"))
  }

  /** Best-of-n rejection sampling over deterministic candidate batches:
    * within each group, candidates in `idCol` order are bucketed into
    * consecutive batches of `n` (each batch models one sampling round);
    * the batch winner is the highest-scored (ties to the smallest id).
    * Emits per batch the winner, its score, the batch's exact mean
    * score and the winner's uplift over that mean — the quantities a
    * rejection-sampling curriculum filters and monitors on.
    *
    * Scale shape: one window bounded by a single group's candidates
    * (never the corpus) to number the batch, then one hash aggregate
    * on (group, batch). The mean is the quantized-decimal exact sum,
    * so it is partition-order-independent.
    */
  def bestOfN(candidates: DataFrame, groupCols: Seq[String], idCol: String,
              scoreCol: String, n: Int): DataFrame = {
    require(n >= 2, s"best-of-n needs n >= 2, got $n")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(idCol))
    val batched = candidates
      .filter(col(scoreCol).isNotNull)
      .withColumn("batch",
        ((row_number().over(w) - 1) / n).cast("long"))
    val qsum = sum(floor(col(scoreCol) * lit(1e7) + lit(0.5))
      .cast(DecimalType(27, 0))).cast(DoubleType) / lit(1e7)
    batched
      .groupBy((groupCols :+ "batch").map(col): _*)
      .agg(
        count(lit(1)).as("n_in_batch"),
        expr(s"max_by($idCol, struct($scoreCol, -$idCol))").as("best_id"),
        max(col(scoreCol)).as("best_score"),
        (qsum / count(lit(1))).as("pool_avg"))
      .withColumn("uplift", col("best_score") - col("pool_avg"))
  }

  /** Bradley–Terry ratings from aggregated pairwise outcomes via the MM
    * fixed-point (Hunter 2004, "MM algorithms for generalized
    * Bradley–Terry models" — the rating scheme behind Chatbot-Arena-style
    * LLM comparisons): from gamma = 1,
    * `gamma_i <- W_i / Σ_j n_ij / (gamma_i + gamma_j)`, iterated a fixed
    * `iters` times.
    *
    * Determinism discipline: the Σ_j is the quantized-decimal exact sum
    * (partition-order-free); every other op — the per-edge division, the
    * W_i/S_i update — is per-row IEEE on identical operands, so the
    * ratings replay bit-identically in the oracle's unrolled CTE chain.
    * A zero-win item rates 0 (its update is 0/S); S is never 0 because
    * every edge has a winner, hence a positive-gamma endpoint.
    *
    * Scale shape: per iteration, two hash joins of the edge list against
    * the K-row rating table plus one hash aggregate — edges partition by
    * item key, K-row sides broadcast under AQE, the driver holds
    * nothing. `comparisons` is the aggregated directed outcome table
    * (winner, loser, n).
    */
  def btRatings(comparisons: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"btRatings needs iters >= 1, got $iters")
    // The outcome table is K²-bounded (K = rated items) and feeds the
    // edge list, the wins side and the totals side, which in turn feed
    // every MM iteration — ONE materialization here, or the lazy plan
    // re-runs the caller's comparison extraction once per use.
    val comp = comparisons.localCheckpoint()
    val sym = comp
      .select(col("winner").as("i"), col("loser").as("j"), col("n"))
      .unionAll(comp
        .select(col("loser").as("i"), col("winner").as("j"), col("n")))
      .groupBy("i", "j").agg(sum("n").as("n"))
    val wins = sym.select(col("i").as("item")).distinct()
      .join(comp.groupBy(col("winner").as("item"))
        .agg(sum("n").as("w")), Seq("item"), "left")
      .select(col("item"), coalesce(col("w"), lit(0L)).as("w"))
    val tot = sym.groupBy(col("i").as("item"))
      .agg(sum("n").as("n_comparisons"))
    var g = wins.select(col("item"), lit(1.0).as("gamma"))
    for (_ <- 1 to iters) {
      val s = sym
        .join(g.select(col("item").as("i"), col("gamma").as("gi")), Seq("i"))
        .join(g.select(col("item").as("j"), col("gamma").as("gj")), Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(qsum(col("n") / (col("gi") + col("gj"))).as("s"))
      // Pin each iterate: g feeds the next iteration twice, so an
      // unresolved plan doubles per iteration — O(2^iters) analysis
      // blows up the driver at the tens of iterations real BT/MM fits
      // use. The K-row checkpoint keeps every iteration O(K) flat.
      g = wins.join(s, Seq("item"))
        .select(col("item"),
          (col("w").cast(DoubleType) / col("s")).as("gamma"))
        .localCheckpoint()
    }
    g.join(wins, Seq("item")).join(tot, Seq("item"))
      .select(col("item"), col("w").as("n_wins"), col("n_comparisons"),
        col("gamma"))
  }

  /** Per-group Bradley-Terry leaderboards: the [[btRatings]] MM fit run
    * independently per group `b` — the workhorse behind both the
    * bootstrap CI (b = replicate) and rating DRIFT over time (b = time
    * window; Arena-style leaderboards are nonstationary, and a rating
    * fitted over all history hides a model that got better or worse).
    * Input is the directed outcome table keyed by group: (b, winner,
    * loser, n); items are rated only in groups where they appear, and
    * an item that never wins within its group rates 0 there.
    *
    * Scale shape: identical to [[btRatings]] with the group id carried
    * through every join/aggregate key — per iteration two hash joins
    * of the sum-of-K²-per-group edge list against the (item, b) rating
    * grid plus one hash aggregate. Judgment volume enters only through
    * the aggregated counts.
    *
    * @return (item, b, gamma) — one row per item per group it appears in
    */
  def btRatingsGrouped(comparisons: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"btRatingsGrouped needs iters >= 1, got $iters")
    val comp = comparisons.localCheckpoint()
    val itemsb = comp.select(col("b"), col("winner").as("item"))
      .unionAll(comp.select(col("b"), col("loser").as("item")))
      .distinct()
    btFitGrouped(comp, itemsb, iters)
  }

  /** Pairwise win rates with Wilson score intervals — the model-vs-model
    * cell of an honest arena report: for each unordered pair (a < b),
    * a's tie-inclusive win rate p = (w_a + t/2) / n with the Wilson 95%
    * interval (Wilson 1927 — the standard small-n binomial interval;
    * the normal approximation is exactly what fails at the sparse
    * per-pair counts this targets). A draw contributes half a win to
    * each side, the conventional tie handling for win-rate reporting.
    *
    * Determinism: every operand is per-row IEEE double arithmetic on
    * identical literals (z enters as the caller's literal; the only
    * root is an IEEE-exact sqrt), so the oracle replays each interval
    * bit-identically — no accumulation, nothing to quantize until the
    * final report rounding.
    *
    * Scale shape: two hash aggregates (directed wins, ties) + one
    * K²-bounded join — independent of judgment volume.
    *
    * @param comparisons directed win outcomes (winner, loser, n)
    * @param ties        unordered draw outcomes (a, b, n), a < b canonical
    * @param z           normal quantile for the interval (1.96 for 95%)
    * @return (a, b, n_a_wins, n_b_wins, n_ties, n, p, lo, hi)
    */
  def pairWinRates(comparisons: DataFrame, ties: DataFrame,
                   z: Double): DataFrame = {
    require(z > 0, s"pairWinRates needs z > 0, got $z")
    val comp = comparisons.localCheckpoint()
    val fwd = comp.filter(col("winner") < col("loser"))
      .select(col("winner").as("a"), col("loser").as("b"),
        col("n").as("naw"))
    val bwd = comp.filter(col("winner") > col("loser"))
      .select(col("loser").as("a"), col("winner").as("b"),
        col("n").as("nbw"))
    val t = ties.select(col("a"), col("b"), col("n").as("nt"))
    val cells = fwd
      .join(bwd, Seq("a", "b"), "full_outer")
      .join(t, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        coalesce(col("naw"), lit(0L)).as("n_a_wins"),
        coalesce(col("nbw"), lit(0L)).as("n_b_wins"),
        coalesce(col("nt"), lit(0L)).as("n_ties"))
      .withColumn("n", col("n_a_wins") + col("n_b_wins") + col("n_ties"))
    val zz = lit(z) * lit(z)
    val nD = col("n").cast(DoubleType)
    val p = (col("n_a_wins").cast(DoubleType) +
      col("n_ties").cast(DoubleType) * lit(0.5)) / nD
    val denom = lit(1.0) + zz / nD
    val center = (col("p") + zz / (lit(2.0) * nD)) / denom
    val hw = (lit(z) * sqrt(col("p") * (lit(1.0) - col("p")) / nD +
      zz / (lit(4.0) * nD * nD))) / denom
    cells.withColumn("p", p)
      .withColumn("lo", center - hw)
      .withColumn("hi", center + hw)
  }

  // ------------------------------------------------------------- bootstrap CI

  /** Inverse standard-normal quantiles at the 250 bucket midpoints
    * ((i+0.5)/250, i = 0..249) — a driver-computed constant embedded as
    * identical literals in engine and oracle (the NDCG discount-table
    * discipline: no transcendental is ever evaluated engine-side, so
    * cross-engine replay is bit-exact). */
  val ZTable: Array[Double] = Array(
    -2.8781617, -2.5121443, -2.3263479, -2.1972864, -2.0969274, -2.0140908,
    -1.9431338, -1.8807936, -1.8250068, -1.7743819, -1.7279343, -1.6849408,
    -1.6448536, -1.6072479, -1.5717868, -1.5381989, -1.5062617, -1.475791,
    -1.4466321, -1.4186537, -1.3917438, -1.3658056, -1.340755, -1.3165187,
    -1.293032, -1.2702376, -1.2480848, -1.2265281, -1.2055268, -1.1850441,
    -1.1650469, -1.1455051, -1.1263911, -1.1076801, -1.089349, -1.0713769,
    -1.0537443, -1.0364334, -1.0194276, -1.0027117, -0.9862713, -0.9700933,
    -0.9541653, -0.9384757, -0.9230138, -0.9077695, -0.8927333, -0.8778963,
    -0.8632501, -0.8487867, -0.8344987, -0.8203791, -0.8064212, -0.7926187,
    -0.7789656, -0.7654561, -0.7520849, -0.7388468, -0.725737, -0.7127508,
    -0.6998836, -0.6871313, -0.6744898, -0.6619551, -0.6495236, -0.6371917,
    -0.6249559, -0.612813, -0.6007598, -0.5887932, -0.5769104, -0.5651085,
    -0.5533847, -0.5417366, -0.5301614, -0.5186569, -0.5072207, -0.4958503,
    -0.4845438, -0.4732988, -0.4621134, -0.4509855, -0.4399132, -0.4288945,
    -0.4179277, -0.4070109, -0.3961424, -0.3853205, -0.3745435, -0.3638099,
    -0.353118, -0.3424663, -0.3318533, -0.3212776, -0.3107377, -0.3002323,
    -0.2897598, -0.279319, -0.2689086, -0.2585273, -0.2481737, -0.2378467,
    -0.227545, -0.2172674, -0.2070126, -0.1967796, -0.1865672, -0.1763742,
    -0.1661994, -0.1560419, -0.1459004, -0.1357739, -0.1256613, -0.1155616,
    -0.1054736, -0.0953964, -0.0853288, -0.0752699, -0.0652185, -0.0551738,
    -0.0451346, -0.0351, -0.0250689, -0.0150403, -0.0050133, 0.0050133,
    0.0150403, 0.0250689, 0.0351, 0.0451346, 0.0551738, 0.0652185,
    0.0752699, 0.0853288, 0.0953964, 0.1054736, 0.1155616, 0.1256613,
    0.1357739, 0.1459004, 0.1560419, 0.1661994, 0.1763742, 0.1865672,
    0.1967796, 0.2070126, 0.2172674, 0.227545, 0.2378467, 0.2481737,
    0.2585273, 0.2689086, 0.279319, 0.2897598, 0.3002323, 0.3107377,
    0.3212776, 0.3318533, 0.3424663, 0.353118, 0.3638099, 0.3745435,
    0.3853205, 0.3961424, 0.4070109, 0.4179277, 0.4288945, 0.4399132,
    0.4509855, 0.4621134, 0.4732988, 0.4845438, 0.4958503, 0.5072207,
    0.5186569, 0.5301614, 0.5417366, 0.5533847, 0.5651085, 0.5769104,
    0.5887932, 0.6007598, 0.612813, 0.6249559, 0.6371917, 0.6495236,
    0.6619551, 0.6744898, 0.6871313, 0.6998836, 0.7127508, 0.725737,
    0.7388468, 0.7520849, 0.7654561, 0.7789656, 0.7926187, 0.8064212,
    0.8203791, 0.8344987, 0.8487867, 0.8632501, 0.8778963, 0.8927333,
    0.9077695, 0.9230138, 0.9384757, 0.9541653, 0.9700933, 0.9862713,
    1.0027117, 1.0194276, 1.0364334, 1.0537443, 1.0713769, 1.089349,
    1.1076801, 1.1263911, 1.1455051, 1.1650469, 1.1850441, 1.2055268,
    1.2265281, 1.2480848, 1.2702376, 1.293032, 1.3165187, 1.340755,
    1.3658056, 1.3917438, 1.4186537, 1.4466321, 1.475791, 1.5062617,
    1.5381989, 1.5717868, 1.6072479, 1.6448536, 1.6849408, 1.7279343,
    1.7743819, 1.8250068, 1.8807936, 1.9431338, 2.0140908, 2.0969274,
    2.1972864, 2.3263479, 2.5121443, 2.8781617)

  private val HashMod = 1000000007L   // the corpus-wide rolling-hash modulus
  private val Knuth = 2654435761L     // 2^32 * golden ratio (exec.Sampling)
  private val ZBuckets = 250

  /** Deterministic bootstrap 95% confidence intervals for Bradley-Terry
    * ratings: B replicates resample each directed edge count as
    * round(N(n, n)) clipped at 0 — the large-count limit of the Poisson
    * count bootstrap (judgments are iid multinomial draws; per-edge
    * counts are asymptotically independent Poisson(n), and Poisson(n) ~
    * N(n, n)) — then refit the MM per replicate and take order-statistic
    * quantiles of the replicate ratings per item.
    *
    * Every draw is a pure function of (winner, loser, replicate): the
    * rolling hash of both endpoint strings mixes with the replicate id
    * through the Knuth multiplicative step into one of 250 buckets, and
    * the bucket indexes the literal z-quantile table. No RNG state, no
    * partition dependence — the oracle replays the identical draws.
    *
    * Scale shape: the draw table is K^2 x B rows (K = rated items) and
    * each MM iteration is two broadcast-joins + one hash aggregate over
    * it — cost is independent of judgment VOLUME, which only ever
    * enters through the aggregated counts. An item absent from a
    * replicate (every edge drawn to 0) contributes gamma = 0 to its
    * quantiles, the resampling analogue of "never observed".
    *
    * Returns (item, lo, hi): the loRank-th and hiRank-th smallest of the
    * B replicate ratings, ties broken by replicate id. Callers pick the
    * ranks (for B = 100 at 95%: 3 and 98 — the conservative symmetric
    * order-statistic interval).
    */
  def btBootstrapCi(comparisons: DataFrame, iters: Int, reps: Int,
                    loRank: Int, hiRank: Int): DataFrame = {
    require(reps >= 2 && loRank >= 1 && hiRank <= reps && loRank < hiRank,
      s"bad bootstrap spec: reps=$reps loRank=$loRank hiRank=$hiRank")
    val session = comparisons.sparkSession
    import session.implicits._
    val comp = comparisons.localCheckpoint()
    val items = comp.select(col("winner").as("item"))
      .unionAll(comp.select(col("loser").as("item"))).distinct()
    val hashed = items
      .withColumn("h", TextAnalysis.fingerprint(col("item")))
      .localCheckpoint()
    val repsDf = (0L until reps.toLong).toDF("b")
    // per (edge, replicate): the shared count draw keyed by the plain
    // replicate id
    val drawn = countDraw(
        comp.select(col("winner").as("x"), col("loser").as("y"), col("n")),
        hashed, repsDf, 131071L, col("b"))
      .select(col("b"), col("x").as("winner"), col("y").as("loser"),
        col("n_drawn").as("n"))
    val itemsb = items.crossJoin(broadcast(repsDf))
    val gfin = btFitGrouped(drawn, itemsb, iters)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("gamma").asc, col("b").asc)
    gfin.withColumn("rn", row_number().over(w))
      .groupBy("item")
      .agg(max(when(col("rn") === loRank, col("gamma"))).as("lo"),
        max(when(col("rn") === hiRank, col("gamma"))).as("hi"))
  }

  /** The [[btRatings]] MM fit run independently per replicate `b`:
    * identical arithmetic (quantized exact sums, w/S updates) with the
    * replicate id carried through every key. Input `dcomp` is the
    * resampled directed outcome table (b, winner, loser, n); `itemsb`
    * the full item x replicate grid. Items that lost every edge in a
    * replicate come back with gamma = 0 (left-join coalesce) so every
    * grid cell has exactly one rating. */
  private def btFitGrouped(dcomp: DataFrame, itemsb: DataFrame,
                           iters: Int): DataFrame = {
    // the symmetrized edge grid and the per-cell win totals are
    // independent derivations of the outcome table — materialized
    // concurrently (§2.6)
    val Seq(symb, winsb) = graft.exec.Concurrent.all(Seq(
      () => dcomp
        .select(col("b"), col("winner").as("i"), col("loser").as("j"),
          col("n"))
        .unionAll(dcomp
          .select(col("b"), col("loser").as("i"), col("winner").as("j"),
            col("n")))
        .groupBy("b", "i", "j").agg(sum("n").as("n"))
        .localCheckpoint(),
      () => itemsb
        .join(dcomp.groupBy(col("b"), col("winner").as("item"))
          .agg(sum("n").as("w0")), Seq("item", "b"), "left")
        .select(col("item"), col("b"), coalesce(col("w0"), lit(0L)).as("w"))
        .localCheckpoint()))
    var g = itemsb.select(col("item"), col("b"), lit(1.0).as("gamma"))
    for (_ <- 1 to iters) {
      val s = symb
        .join(g.select(col("b"), col("item").as("i"), col("gamma").as("gi")),
          Seq("b", "i"))
        .join(g.select(col("b"), col("item").as("j"), col("gamma").as("gj")),
          Seq("b", "j"))
        .groupBy(col("b"), col("i").as("item"))
        .agg(qsum(col("n") / (col("gi") + col("gj"))).as("s"))
      g = winsb.join(s, Seq("item", "b"))
        .select(col("item"), col("b"),
          (col("w").cast(DoubleType) / col("s")).as("gamma"))
        .localCheckpoint()
    }
    itemsb.join(g, Seq("item", "b"), "left")
      .select(col("item"), col("b"),
        coalesce(col("gamma"), lit(0.0)).as("gamma"))
  }

  // ------------------------------------------------------- Rao-Kupper ties

  /** Tie-aware Bradley-Terry ratings: the Rao-Kupper extension (Rao &
    * Kupper 1967; MM treatment in Hunter 2004 §4) models a draw
    * explicitly — P(i beats j) = g_i / (g_i + t*g_j) with a tie
    * parameter t >= 1; a draw has probability proportional to
    * (t^2 - 1) g_i g_j over both ordered denominators. Real judgment
    * streams contain draws, and the plain (winner, loser, n) matrix
    * cannot represent them.
    *
    * The likelihood regroups exactly into BT shape over AUGMENTED
    * directed counts a_ij = w_ij + t_ij (wins plus shared ties), with
    * denominators (g_i + t*g_j). Each MM iteration:
    *
    *   g_i  <-  A_i / sum_j [ a_ij/(g_i + t*g_j) + a_ji*t/(g_j + t*g_i) ]
    *   t    <-  (T + sqrt(T^2 + C^2)) / C,
    *            C = sum_{i!=j} a_ij*g_j / (g_i + t_old*g_j) at the NEW g
    *
    * where A_i = sum_j a_ij and T = total ties. The g update is
    * Hunter's supporting-line minorization of -ln; the t update solves
    * the same surrogate's scalar maximization in closed form (the
    * quadratic C*t^2 - 2T*t - C = 0), so no transcendental beyond an
    * IEEE-exact sqrt is ever evaluated. C = 0 (no item with positive
    * strength ever appears on the right of an edge — only possible with
    * zero ties) guards to t = 1, the plain-BT limit. T = 0 reproduces
    * [[btRatings]] up to the t=1 fixed point.
    *
    * Determinism: both per-item sums and C go through the quantized
    * exact decimal sum; t is extracted as a one-row scalar per
    * iteration (K²-bounded driver pull, the codebook discipline) and
    * re-enters as a literal, so the oracle's unrolled CTE chain
    * replays every float bit-identically.
    *
    * Scale shape: per iteration two hash joins of the K²-bounded
    * augmented edge list against the K-row rating table, one hash
    * aggregate, and a one-row global aggregate for C. Judgment volume
    * enters only through the aggregated counts.
    *
    * @param comparisons directed win outcomes (winner, loser, n)
    * @param ties        unordered draw outcomes (a, b, n), a < b canonical
    * @return (item, n_wins, n_ties, n_comparisons, gamma, theta)
    */
  def rkRatings(comparisons: DataFrame, ties: DataFrame,
                iters: Int): DataFrame = {
    require(iters >= 1, s"rkRatings needs iters >= 1, got $iters")
    // independent inputs, materialized concurrently (§2.6)
    val Seq(comp, tie) = graft.exec.Concurrent.all(Seq(
      () => comparisons.localCheckpoint(),
      () => ties.localCheckpoint()))
    val adir = comp.select(col("winner").as("i"), col("loser").as("j"), col("n"))
      .unionAll(tie.select(col("a").as("i"), col("b").as("j"), col("n")))
      .unionAll(tie.select(col("b").as("i"), col("a").as("j"), col("n")))
      .groupBy("i", "j").agg(sum("n").as("a"))
      .localCheckpoint()
    val items = adir.select(col("i").as("item"))
      .unionAll(adir.select(col("j").as("item"))).distinct()
    val bigA = items
      .join(adir.groupBy(col("i").as("item")).agg(sum("a").as("a0")),
        Seq("item"), "left")
      .select(col("item"), coalesce(col("a0"), lit(0L)).as("A"))
      .localCheckpoint()
    val tTotal = tie.agg(coalesce(sum("n"), lit(0L))).head.getLong(0)
    val tD = tTotal.toDouble
    var g = items.select(col("item"), lit(1.0).as("gamma"))
    var theta = 1.0
    for (_ <- 1 to iters) {
      val d = adir
        .join(g.select(col("item").as("i"), col("gamma").as("gi")), Seq("i"))
        .join(g.select(col("item").as("j"), col("gamma").as("gj")), Seq("j"))
        .withColumn("dij", col("gi") + lit(theta) * col("gj"))
      val s = d.select(col("i").as("item"), (col("a") / col("dij")).as("v"))
        .unionAll(d.select(col("j").as("item"),
          (col("a") * lit(theta) / col("dij")).as("v")))
        .groupBy("item").agg(qsum(col("v")).as("s"))
      g = bigA.join(s, Seq("item"))
        .select(col("item"),
          (col("A").cast(DoubleType) / col("s")).as("gamma"))
        .localCheckpoint()
      val c = adir
        .join(g.select(col("item").as("i"), col("gamma").as("gi")), Seq("i"))
        .join(g.select(col("item").as("j"), col("gamma").as("gj")), Seq("j"))
        .select(((col("a") * col("gj")) /
          (col("gi") + lit(theta) * col("gj"))).as("v"))
        // coalesce: an empty outcome table must degrade to the empty
        // rating frame (theta = 1 via the c = 0 guard), not NPE here
        .agg(coalesce(qsum(col("v")), lit(0.0)).as("c")).head.getDouble(0)
      theta = if (c > 0) (tD + math.sqrt(tD * tD + c * c)) / c else 1.0
    }
    val wins = comp.groupBy(col("winner").as("item")).agg(sum("n").as("w0"))
    val tcount = tie.select(col("a").as("item"), col("n"))
      .unionAll(tie.select(col("b").as("item"), col("n")))
      .groupBy("item").agg(sum("n").as("t0"))
    val losses = comp.groupBy(col("loser").as("item")).agg(sum("n").as("l0"))
    g.join(wins, Seq("item"), "left")
      .join(tcount, Seq("item"), "left")
      .join(losses, Seq("item"), "left")
      .select(col("item"),
        coalesce(col("w0"), lit(0L)).as("n_wins"),
        coalesce(col("t0"), lit(0L)).as("n_ties"),
        (coalesce(col("w0"), lit(0L)) + coalesce(col("t0"), lit(0L)) +
          coalesce(col("l0"), lit(0L))).as("n_comparisons"),
        col("gamma"), lit(theta).as("theta"))
  }

  /** Deterministic bootstrap CIs for the RAO-KUPPER fit: both the
    * directed win matrix and the tie matrix are resampled with the
    * [[btBootstrapCi]] count draw (round(N(n, n)) clipped at 0, pure
    * hash of (endpoints, replicate) — ties use a different mix prime so
    * win and tie draws are decorrelated), the full tie-aware MM refits
    * per replicate with THETA CARRIED AS A PER-REPLICATE COLUMN (no
    * driver scalar — B refits stay one plan), and order-statistic
    * quantiles come back for every item's gamma AND for theta itself:
    * the leaderboard's draw-mass parameter gets an interval too.
    *
    * Scale shape: K²×B + K×B grids end to end; per iteration two hash
    * joins against the (item, b) rating grid, a per-(b, item) hash
    * aggregate, and a per-b aggregate for C — independent of judgment
    * volume. Returns (item, lo, hi, theta_lo, theta_hi).
    */
  def rkBootstrapCi(comparisons: DataFrame, ties: DataFrame, iters: Int,
                    reps: Int, loRank: Int, hiRank: Int): DataFrame = {
    require(reps >= 2 && loRank >= 1 && hiRank <= reps && loRank < hiRank,
      s"bad bootstrap spec: reps=$reps loRank=$loRank hiRank=$hiRank")
    val session = comparisons.sparkSession
    import session.implicits._
    // independent inputs, materialized concurrently (§2.6)
    val Seq(comp, tie) = graft.exec.Concurrent.all(Seq(
      () => comparisons.localCheckpoint(),
      () => ties.localCheckpoint()))
    val items = comp.select(col("winner").as("item"))
      .unionAll(comp.select(col("loser").as("item")))
      .unionAll(tie.select(col("a").as("item")))
      .unionAll(tie.select(col("b").as("item"))).distinct()
    val hashed = items
      .withColumn("h", TextAnalysis.fingerprint(col("item")))
      .localCheckpoint()
    val repsDf = (0L until reps.toLong).toDF("b")
    // the shared count draw under each table's own mix prime (win and
    // tie resamples stay decorrelated)
    def draw(edges: DataFrame, mix: Long): DataFrame =
      countDraw(edges, hashed, repsDf, mix, col("b"))
        .select(col("b"), col("x"), col("y"), col("n_drawn").as("n"))
    val dcomp = draw(comp.select(col("winner").as("x"), col("loser").as("y"),
      col("n")), 131071L)
    val dtie = draw(tie.select(col("a").as("x"), col("b").as("y"),
      col("n")), 524287L)
    val adirb = dcomp.select(col("b"), col("x").as("i"), col("y").as("j"), col("n"))
      .unionAll(dtie.select(col("b"), col("x").as("i"), col("y").as("j"), col("n")))
      .unionAll(dtie.select(col("b"), col("y").as("i"), col("x").as("j"), col("n")))
      .groupBy("b", "i", "j").agg(sum("n").as("a"))
      .localCheckpoint()
    val itemsb = items.crossJoin(broadcast(repsDf))
    // per-cell augmented totals (over the checkpointed adirb) and
    // per-replicate tie totals (over the tie draw) are independent —
    // materialized concurrently (§2.6)
    val Seq(bigAb, ttb) = graft.exec.Concurrent.all(Seq(
      () => itemsb
        .join(adirb.groupBy(col("b"), col("i").as("item"))
          .agg(sum("a").as("a0")), Seq("item", "b"), "left")
        .select(col("item"), col("b"), coalesce(col("a0"), lit(0L)).as("A"))
        .localCheckpoint(),
      () => repsDf
        .join(dtie.groupBy("b").agg(sum("n").as("t0")), Seq("b"), "left")
        .select(col("b"), coalesce(col("t0"), lit(0L)).as("T"))
        .localCheckpoint()))
    val (gfin, th) = rkFitGrouped(adirb, itemsb, bigAb, ttb, repsDf, iters)
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item")).orderBy(col("gamma").asc, col("b").asc)
    val ciG = gfin.withColumn("rn", row_number().over(wG))
      .groupBy("item")
      .agg(max(when(col("rn") === loRank, col("gamma"))).as("lo"),
        max(when(col("rn") === hiRank, col("gamma"))).as("hi"))
    val wT = org.apache.spark.sql.expressions.Window
      .orderBy(col("t").asc, col("b").asc)
    val ciT = th.withColumn("rn", row_number().over(wT))
      .agg(max(when(col("rn") === loRank, col("t"))).as("theta_lo"),
        max(when(col("rn") === hiRank, col("t"))).as("theta_hi"))
    ciG.crossJoin(broadcast(ciT))
  }

  /** Bootstrap CIs PER GROUP: [[btBootstrapCi]] run independently for
    * every group of a (b, winner, loser, n) outcome table — the
    * uncertainty side of a drift report (rank churn between windows is
    * noise unless the windows' intervals separate). Replicates nest
    * inside groups through a composite fit key b·reps + r (windows and
    * replicates both ride the SAME grouped MM machinery), and the count
    * draw mixes the composite id so resamples are decorrelated across
    * windows as well as replicates.
    *
    * Scale shape: the grid is (items-per-group) × groups × reps rows —
    * judgment volume enters only through the aggregated counts.
    * Returns (item, b, lo, hi) for every (group, item) cell.
    */
  def btBootstrapCiGrouped(comparisons: DataFrame, iters: Int, reps: Int,
                           loRank: Int, hiRank: Int): DataFrame = {
    require(reps >= 2 && loRank >= 1 && hiRank <= reps && loRank < hiRank,
      s"bad bootstrap spec: reps=$reps loRank=$loRank hiRank=$hiRank")
    val session = comparisons.sparkSession
    import session.implicits._
    val comp = comparisons.localCheckpoint()
    val itemsW = comp.select(col("b"), col("winner").as("item"))
      .unionAll(comp.select(col("b"), col("loser").as("item"))).distinct()
      .localCheckpoint()
    val hashed = itemsW.select("item").distinct()
      .withColumn("h", TextAnalysis.fingerprint(col("item")))
      .localCheckpoint()
    val repsDf = (0L until reps.toLong).toDF("r")
    // the shared count draw keyed by the COMPOSITE window*reps+replicate
    // id, so resamples decorrelate across windows as well as replicates
    val cb = col("b") * lit(reps.toLong) + col("r")
    val drawn = countDraw(
        comp.select(col("b"), col("winner").as("x"), col("loser").as("y"),
          col("n")),
        hashed, repsDf, 131071L, cb)
      .select(cb.as("b"), col("x").as("winner"), col("y").as("loser"),
        col("n_drawn").as("n"))
    val itemsb = itemsW.select(col("item"), col("b").as("w"))
      .crossJoin(broadcast(repsDf))
      .select(col("item"),
        (col("w") * lit(reps.toLong) + col("r")).as("b"))
    val gfin = btFitGrouped(drawn, itemsb, iters)
      .withColumn("w", floor(col("b") / lit(reps.toDouble)).cast("long"))
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"), col("w"))
      .orderBy(col("gamma").asc, col("b").asc)
    gfin.withColumn("rn", row_number().over(ord))
      .groupBy(col("item"), col("w").as("b"))
      .agg(max(when(col("rn") === loRank, col("gamma"))).as("lo"),
        max(when(col("rn") === hiRank, col("gamma"))).as("hi"))
  }

  /** Bootstrap CIs for the RAO-KUPPER fit PER GROUP — the tie-aware
    * sibling of [[btBootstrapCiGrouped]] and the uncertainty side of
    * q_rk_drift: windows and replicates both ride the grouped RK MM
    * through the composite fit key b·reps + r; win and tie counts
    * resample under their own mix primes (decorrelated, and the
    * composite id decorrelates windows too); theta refits per
    * replicate, so the DRAW-MASS parameter gets a per-window interval
    * as well. For the group with id 0 the composite key equals the
    * plain replicate id, so this reproduces [[rkBootstrapCi]]'s draws
    * bit-exactly (asserted in StatsSpec).
    *
    * Scale shape: (items-per-group × groups × reps) + (groups × reps)
    * grids; judgment volume enters only through aggregated counts.
    * Returns (item, b, lo, hi, theta_lo, theta_hi). */
  def rkBootstrapCiGrouped(comparisons: DataFrame, ties: DataFrame,
                           iters: Int, reps: Int, loRank: Int,
                           hiRank: Int): DataFrame = {
    require(reps >= 2 && loRank >= 1 && hiRank <= reps && loRank < hiRank,
      s"bad bootstrap spec: reps=$reps loRank=$loRank hiRank=$hiRank")
    val session = comparisons.sparkSession
    import session.implicits._
    val comp = comparisons.localCheckpoint()
    val tie = ties.localCheckpoint()
    val itemsW = comp.select(col("b"), col("winner").as("item"))
      .unionAll(comp.select(col("b"), col("loser").as("item")))
      .unionAll(tie.select(col("b"), col("i").as("item")))
      .unionAll(tie.select(col("b"), col("j").as("item")))
      .distinct().localCheckpoint()
    val hashed = itemsW.select("item").distinct()
      .withColumn("h", TextAnalysis.fingerprint(col("item")))
      .localCheckpoint()
    val repsDf = (0L until reps.toLong).toDF("r")
    val cb = col("b") * lit(reps.toLong) + col("r")
    val dcomp = countDraw(
        comp.select(col("b"), col("winner").as("x"), col("loser").as("y"),
          col("n")), hashed, repsDf, 131071L, cb)
      .select(cb.as("b"), col("x").as("i"), col("y").as("j"),
        col("n_drawn").as("n"))
    val dtie = countDraw(
        tie.select(col("b"), col("i").as("x"), col("j").as("y"), col("n")),
        hashed, repsDf, 524287L, cb)
      .select(cb.as("b"), col("x"), col("y"), col("n_drawn").as("n"))
    val adirb = dcomp
      .unionAll(dtie.select(col("b"), col("x").as("i"), col("y").as("j"),
        col("n")))
      .unionAll(dtie.select(col("b"), col("y").as("i"), col("x").as("j"),
        col("n")))
      .groupBy("b", "i", "j").agg(sum("n").as("a"))
      .localCheckpoint()
    val itemsb = itemsW.select(col("item"), col("b").as("w"))
      .crossJoin(broadcast(repsDf))
      .select(col("item"),
        (col("w") * lit(reps.toLong) + col("r")).as("b"))
      .localCheckpoint()
    val groups = itemsW.select(col("b").as("w")).distinct()
      .crossJoin(broadcast(repsDf))
      .select((col("w") * lit(reps.toLong) + col("r")).as("b"))
    val bigAb = itemsb
      .join(adirb.groupBy(col("b"), col("i").as("item")).agg(sum("a").as("a0")),
        Seq("item", "b"), "left")
      .select(col("item"), col("b"), coalesce(col("a0"), lit(0L)).as("A"))
      .localCheckpoint()
    val ttb = groups
      .join(dtie.groupBy("b").agg(sum("n").as("t0")), Seq("b"), "left")
      .select(col("b"), coalesce(col("t0"), lit(0L)).as("T"))
      .localCheckpoint()
    val (gfin, th) = rkFitGrouped(adirb, itemsb, bigAb, ttb, groups, iters)
    val wG = org.apache.spark.sql.expressions.Window
      .partitionBy(col("item"), col("w"))
      .orderBy(col("gamma").asc, col("b").asc)
    val ciG = gfin
      .withColumn("w", floor(col("b") / lit(reps.toDouble)).cast("long"))
      .withColumn("rn", row_number().over(wG))
      .groupBy(col("item"), col("w").as("b"))
      .agg(max(when(col("rn") === loRank, col("gamma"))).as("lo"),
        max(when(col("rn") === hiRank, col("gamma"))).as("hi"))
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w")).orderBy(col("t").asc, col("b").asc)
    val ciT = th
      .withColumn("w", floor(col("b") / lit(reps.toDouble)).cast("long"))
      .withColumn("rn", row_number().over(wT))
      .groupBy(col("w").as("b"))
      .agg(max(when(col("rn") === loRank, col("t"))).as("theta_lo"),
        max(when(col("rn") === hiRank, col("t"))).as("theta_hi"))
    ciG.join(ciT, Seq("b"))
  }

  /** The Rao-Kupper MM fit run independently per group `b` — identical
    * arithmetic to [[rkRatings]] with the group id carried through
    * every key and theta a PER-GROUP column (no driver scalar, so any
    * number of groups stays one plan). Inputs: the augmented directed
    * edge list (b, i, j, a), the (item, b) universe, per-cell augmented
    * totals (item, b, A), per-group tie totals (b, T), and the group
    * universe (b). Returns ((item, b, gamma) with absent cells at 0,
    * (b, t)). */
  private def rkFitGrouped(adirb: DataFrame, itemsb: DataFrame,
                           bigAb: DataFrame, ttb: DataFrame,
                           groups: DataFrame, iters: Int)
      : (DataFrame, DataFrame) = {
    var g = itemsb.select(col("item"), col("b"), lit(1.0).as("gamma"))
    var th = groups.select(col("b"), lit(1.0).as("t"))
    for (_ <- 1 to iters) {
      val d = adirb
        .join(g.select(col("b"), col("item").as("i"), col("gamma").as("gi")),
          Seq("b", "i"))
        .join(g.select(col("b"), col("item").as("j"), col("gamma").as("gj")),
          Seq("b", "j"))
        .join(th, Seq("b"))
        .withColumn("dij", col("gi") + col("t") * col("gj"))
      val s = d.select(col("b"), col("i").as("item"), (col("a") / col("dij")).as("v"))
        .unionAll(d.select(col("b"), col("j").as("item"),
          (col("a") * col("t") / col("dij")).as("v")))
        .groupBy("b", "item").agg(qsum(col("v")).as("s"))
      g = bigAb.join(s, Seq("item", "b"))
        .select(col("item"), col("b"),
          (col("A").cast(DoubleType) / col("s")).as("gamma"))
        .localCheckpoint()
      val cTab = adirb
        .join(g.select(col("b"), col("item").as("i"), col("gamma").as("gi")),
          Seq("b", "i"))
        .join(g.select(col("b"), col("item").as("j"), col("gamma").as("gj")),
          Seq("b", "j"))
        .join(th, Seq("b"))
        .groupBy("b")
        .agg(qsum((col("a") * col("gj")) / (col("gi") + col("t") * col("gj")))
          .as("c"))
      th = groups.join(cTab, Seq("b"), "left").join(ttb, Seq("b"))
        .select(col("b"),
          when(col("c") > lit(0.0),
            (col("T").cast(DoubleType) + sqrt(col("T").cast(DoubleType) *
              col("T").cast(DoubleType) + col("c") * col("c"))) / col("c"))
            .otherwise(lit(1.0)).as("t"))
        .localCheckpoint()
    }
    val gfin = itemsb.join(g, Seq("item", "b"), "left")
      .select(col("item"), col("b"), coalesce(col("gamma"), lit(0.0)).as("gamma"))
    (gfin, th)
  }

  /** Per-group tie-aware leaderboards: the [[rkRatings]] fit run
    * independently per group `b` — the tie-aware sibling of
    * [[btRatingsGrouped]] (b = time window for drift, or any other
    * partition of the judgment stream). Draws are first-class per
    * group, and each group gets its own theta: draw mass itself drifts.
    *
    * @param comparisons directed win outcomes keyed by group (b, winner, loser, n)
    * @param ties        unordered draw outcomes keyed by group (b, i, j, n), i < j
    * @return (item, b, gamma, theta) — items rated only in groups they
    *         appear in; theta constant within a group
    */
  def rkRatingsGrouped(comparisons: DataFrame, ties: DataFrame,
                       iters: Int): DataFrame = {
    require(iters >= 1, s"rkRatingsGrouped needs iters >= 1, got $iters")
    val comp = comparisons.localCheckpoint()
    val tie = ties.localCheckpoint()
    val adirb = comp
      .select(col("b"), col("winner").as("i"), col("loser").as("j"), col("n"))
      .unionAll(tie.select(col("b"), col("i"), col("j"), col("n")))
      .unionAll(tie.select(col("b"), col("j").as("i"), col("i").as("j"),
        col("n")))
      .groupBy("b", "i", "j").agg(sum("n").as("a"))
      .localCheckpoint()
    val itemsb = adirb.select(col("b"), col("i").as("item"))
      .unionAll(adirb.select(col("b"), col("j").as("item"))).distinct()
    val groups = adirb.select("b").distinct()
    val bigAb = itemsb
      .join(adirb.groupBy(col("b"), col("i").as("item")).agg(sum("a").as("a0")),
        Seq("item", "b"), "left")
      .select(col("item"), col("b"), coalesce(col("a0"), lit(0L)).as("A"))
      .localCheckpoint()
    val ttb = groups
      .join(tie.groupBy("b").agg(sum("n").as("t0")), Seq("b"), "left")
      .select(col("b"), coalesce(col("t0"), lit(0L)).as("T"))
      .localCheckpoint()
    val (g, th) = rkFitGrouped(adirb, itemsb, bigAb, ttb, groups, iters)
    g.join(th, Seq("b"))
      .select(col("item"), col("b"), col("gamma"), col("t").as("theta"))
  }
}

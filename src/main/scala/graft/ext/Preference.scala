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
    def qsum(c: org.apache.spark.sql.Column) =
      sum(floor(c * lit(1e7) + lit(0.5)).cast(DecimalType(27, 0)))
        .cast(DoubleType) / lit(1e7)
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
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for web-scale corpora: exact, MinHash+LSH,
  * SimHash, and exact n-gram Jaccard. Everything is expressed as
  * shuffles-on-narrow-keys + column expressions:
  *
  *  - exact dedup shuffles once on the text hash (not the full text);
  *  - MinHash/LSH candidate generation shuffles once on (band, bandHash) —
  *    the standard way to keep near-dup detection out of O(n²) at 100 TB;
  *  - hot LSH buckets are capped (`maxBucket`) so one degenerate bucket
  *    cannot quadratically blow up a task — the documented recall tradeoff;
  *  - exact-verification joins happen only on the candidate pairs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: one representative (min id) per distinct text.
    * Group keys are (hash, text) so the shuffle sorts/compares 8-byte
    * hashes first instead of full documents. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("__h"), col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col(textCol), col("n_copies"))

  /** Streaming exact dedup: first occurrence of each key wins; the
    * watermark bounds the dedup state (keys older than the watermark minus
    * the delay are evicted), so state is O(rate × delay), not O(stream).
    * Batch twin of the semantics: `dropDuplicates(keys)`. */
  def exactStream(stream: DataFrame, keys: Seq[String],
                  eventTimeCol: String, delay: String): DataFrame =
    stream.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles (distinct) of the lower-cased text — tight-loop
    * expression; [[shinglesHof]] is the cross-check twin. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.TextExpressions.wordShingles(text, n)

  /** Pre-sorted shingles (for prefix filtering) in one pass. */
  def shinglesSorted(text: Column, n: Int = 3): Column =
    graft.functions.TextExpressions.wordShingles(text, n, sort = true)

  /** Interpreted HOF twin, kept for parity tests. */
  def shinglesHof(text: Column, n: Int = 3): Column = {
    val t = TextAnalysis.tokens(text)
    val grams = transform(
      sequence(lit(0), greatest(size(t) - n, lit(0))),
      i => concat_ws(" ", slice(t, i + lit(1), lit(n))))
    array_distinct(grams)
  }

  /** Exact Jaccard similarity of two string arrays (already distinct). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - inter).cast(DoubleType)
  }

  // -------------------------------------------------------------- MinHash

  val MinHashPrime: Long = graft.functions.MinHashPerms.Prime

  /** Deterministic universal-hash parameters for the k permutations —
    * the shared [[graft.functions.MinHashPerms]] table, so the HOF twin
    * can never drift from the tight-loop expressions. */
  private def perms(k: Int, seed: Long): Seq[(Long, Long)] = {
    val (a, b) = graft.functions.MinHashPerms.perms(k, seed)
    a.zip(b).toSeq
  }

  /** 32-bit base hashes of the shingles (xxhash64 truncated). */
  def baseHashes(sh: Column): Column =
    transform(sh, s => pmod(xxhash64(s), lit(4294967296L)))

  /** k-wide MinHash signature — tight-loop custom expression
    * (graft.functions.TextExpressions); hash values identical to the HOF
    * twin below. */
  def minhashSignature(sh: Column, k: Int = 64, seed: Long = 42L): Column =
    graft.functions.TextExpressions.minhashSignature(sh, k, seed)

  /** Interpreted HOF twin, kept for cross-checking the expression: a single
    * `aggregate` pass folding every base hash into a k-wide running minimum.
    * (Historical note: writing this as k independent
    * `array_min(transform(...))` expressions re-embeds the shingle pipeline
    * k times — the interpreted HOF path has no CSE — measured ~64x slower.) */
  def minhashSignatureHof(sh: Column, k: Int = 64, seed: Long = 42L): Column = {
    val ab = typedLit(perms(k, seed))
    aggregate(
      baseHashes(sh),
      array_repeat(lit(MinHashPrime), k),
      (acc, h) => zip_with(acc, ab, (cur, p) =>
        least(cur, pmod(h * p.getField("_1") + p.getField("_2"), lit(MinHashPrime)))))
  }

  /** The per-band LSH hashes of a k-wide signature: band i hashes
    * ("band", i, the i-th r-wide slice). ONE definition shared by
    * [[minhashPairs]] and the standing index's band table
    * (graft.ext.DedupIndex) — the band join only works if both sides
    * band identically. */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(lit("band"), b, slice(sig, b * rows + lit(1), lit(rows))))

  /** Estimated Jaccard from two equal-width signatures. */
  def minhashEstimate(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), b => b))
      .cast(DoubleType) / k

  /** The shared banding frame of [[minhashPairs]]: one row per (doc,
    * band) with the band's bucket hash, signature attached. The
    * repartition is a deliberate materialization point: every consumer
    * (bucket counting, both join sides) reuses the same shuffle via
    * ReuseExchange, so the signature is computed once per doc. */
  private def minhashBanded(df: DataFrame, textCol: String, idCol: String,
                            k: Int, bands: Int, shingleN: Int,
                            seed: Long): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    df.select(col(idCol).as("id"),
        minhashSignature(shingles(col(textCol), shingleN), k, seed).as("sig"))
      .repartition(col("id"))
      .select(col("id"), col("sig"),
        posexplode(bandHashes(col("sig"), bands, rows)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bhash")
  }

  /** The (band, bhash) LSH bucket memberships behind [[minhashPairs]] —
    * a PER-DOC property (text + seed only, corpus-independent), so two
    * runs over different corpora agree on every shared doc's buckets.
    * For comparability audits: a pair is generated as a candidate iff it
    * shares a band bucket that survives the hot-bucket cap in that run.
    * Output: (id, band, bhash). */
  def minhashBandBuckets(df: DataFrame, textCol: String, idCol: String,
                         k: Int = 64, bands: Int = 16, shingleN: Int = 3,
                         seed: Long = 42L): DataFrame =
    minhashBanded(df, textCol, idCol, k, bands, shingleN, seed)
      .select(col("id"), col("band"), col("bhash"))

  /** Observability twin of [[trimmedBuckets]] for the MINHASH family:
    * the (band, bhash) buckets [[minhashPairs]]'s hot-bucket cap trims
    * in THIS corpus at `maxBucket`, with occupancy. One aggregation on
    * the same banding expression as the pair join; output bounded by
    * the number of HOT buckets. */
  def minhashTrimmedBuckets(df: DataFrame, textCol: String, idCol: String,
                            k: Int = 64, bands: Int = 16, shingleN: Int = 3,
                            seed: Long = 42L,
                            maxBucket: Int = 200): DataFrame =
    minhashBanded(df, textCol, idCol, k, bands, shingleN, seed)
      .groupBy(col("band"), col("bhash"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)

  /** MinHash + LSH candidate pairs with estimated Jaccard ≥ `minEstimate`.
    *
    * Pipeline: signature → `bands` band hashes → explode → self-join on
    * (band, bandHash) → distinct pairs → estimate filter. One shuffle for
    * the band join, one for pair distinct. `maxBucket` drops degenerate
    * buckets (boilerplate shingles) to bound worst-case pair blowup.
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 64, bands: Int = 16, shingleN: Int = 3,
                   minEstimate: Double = 0.5, seed: Long = 42L,
                   maxBucket: Int = 200): DataFrame = {
    val banded = minhashBanded(df, textCol, idCol, k, bands, shingleN, seed)

    // Cap pathological buckets with a partition-frame window count, not a
    // groupBy + join back: the window computes the bucket size inside the
    // ONE (band, bhash) exchange, and the self-join below then joins two
    // branches of that same shuffle (identically partitioned and sorted —
    // no further exchange of the banded frame). The groupBy formulation
    // shuffled the banded rows twice more.
    val bucketW = org.apache.spark.sql.expressions.Window.partitionBy("band", "bhash")
    val small = banded.withColumn("__cnt", count(lit(1)).over(bucketW))
      .filter(col("__cnt") <= maxBucket && col("__cnt") >= 2).drop("__cnt")

    val a = small.select(col("band"), col("bhash"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = small.select(col("band"), col("bhash"), col("id").as("id_b"), col("sig").as("sig_b"))
    // Estimate + filter before the pair dedup: duplicates of a pair carry
    // identical signatures, and shuffling (id, id, est) triples beats
    // shuffling two k-wide signatures per candidate.
    a.join(b, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        minhashEstimate(col("sig_a"), col("sig_b"), k).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstimate)
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash-LSH parameter auto-tuning: evaluate the banding S-curve
    * P(candidate | similarity s) = 1 − (1 − s^r)^b over the full
    * (bands, rows) grid and score each setting's expected error at the
    * given operating `threshold` — the closed-form answer to "which
    * (b, r) should my near-dup pass run at", instead of the fixed
    * 16×4 default.
    *
    * Per grid cell and calibration point s ∈ {0.05 … 0.95}: the
    * S-curve value via LEFT-ASSOCIATED multiplication chains
    * (`aggregate` over `array_repeat` — s^r and (1−s^r)^b as repeated
    * IEEE multiplies, never `pow`, so an oracle replays every bit with
    * the same fold); each point's contribution quantized to 1e-6 and
    * summed as integers (exact, order-free):
    *
    *  - `fp_q6`  = Σ_{s <  t} q6(P(s))   — sub-threshold mass the bands
    *    would pass to the (wasted) verify stage;
    *  - `fn_q6`  = Σ_{s >= t} q6(1−P(s)) — above-threshold mass the
    *    bands would MISS (the recall loss, unrecoverable);
    *  - `feasible` — both means within the caller's budgets;
    *  - `score_qi` = fp_q6·nAbove + fn_q6·nBelow (the count-weighted
    *    sum ≡ mean fp + mean fn on a common denominator — integer);
    *  - `chosen` — true on exactly one row: feasible first, then
    *    min score, ties to the cheapest signature (k = b·r, then b).
    *
    * The grid is a few hundred rows — this is a planning query; its
    * cost is independent of any corpus. */
  def lshTune(spark: org.apache.spark.sql.SparkSession, threshold: Double,
              fpBudget: Double, fnBudget: Double, maxBands: Int = 32,
              maxRows: Int = 8, maxK: Int = 128): DataFrame = {
    val grid = spark.range(1, maxBands + 1L)
      .select(col("id").cast("int").as("bands"))
      .crossJoin(spark.range(1, maxRows + 1L)
        .select(col("id").cast("int").as("rpb")))
      .filter(col("bands") * col("rpb") <= maxK)
    val pts = spark.range(1, 20)
      .select((col("id").cast("double") / lit(20.0)).as("s"))
    val nBelow = (1 until 20).count(_ / 20.0 < threshold).toLong
    val nAbove = 19L - nBelow
    val sr = aggregate(array_repeat(col("s"), col("rpb")),
      lit(1.0), (a, x) => a * x)
    val p = lit(1.0) - aggregate(array_repeat(lit(1.0) - sr, col("bands")),
      lit(1.0), (a, x) => a * x)
    def q6(c: org.apache.spark.sql.Column) =
      floor(c * lit(1000000.0) + lit(0.5)).cast("long")
    val scored = grid.crossJoin(pts)
      .withColumn("p", p)
      .groupBy("bands", "rpb")
      .agg(
        sum(when(col("s") < lit(threshold), q6(col("p")))
          .otherwise(lit(0L))).as("fp_q6"),
        sum(when(col("s") >= lit(threshold), q6(lit(1.0) - col("p")))
          .otherwise(lit(0L))).as("fn_q6"))
      .withColumn("k", (col("bands") * col("rpb")).cast("int"))
      .withColumn("feasible",
        col("fp_q6") <= lit(math.floor(fpBudget * 1e6 + 0.5).toLong * nBelow) &&
        col("fn_q6") <= lit(math.floor(fnBudget * 1e6 + 0.5).toLong * nAbove))
      .withColumn("score_qi",
        col("fp_q6") * lit(nAbove) + col("fn_q6") * lit(nBelow))
    val ord = org.apache.spark.sql.expressions.Window.orderBy(
      col("feasible").desc, col("score_qi").asc, col("k").asc,
      col("bands").asc)
    scored.withColumn("chosen", row_number().over(ord) === 1)
      .select(col("bands"), col("rpb"), col("k"), col("fp_q6"),
        col("fn_q6"), col("feasible"), col("score_qi"), col("chosen"))
  }

  /** LSH candidates verified with *exact* shingle Jaccard — the scalable
    * exact pipeline: O(n) LSH prefilter, exact check only on candidates.
    *
    * Deliberately the TWO-PHASE shape (candidate distinct, THEN two
    * verify joins on hash-sorted 8-byte shingles): each pair is
    * estimate-pruned per band match but exact-verified exactly ONCE —
    * the verify stage is pair-minimal by construction. The fused
    * alternative (shingle arrays riding the band join, verify in-stage —
    * the [[prefixJaccardPairs]] shape) was MEASURED at the 100× scale
    * rehearsal and lost: re-verifying a near-identical pair once per
    * shared band (up to all 16 for clique-heavy corpora) made
    * q_dedup_clusters 2.1× slower at sf10 (339 s vs 162 s) while this
    * plan's candidate shuffle — (id, id, est) triples, 24 bytes per
    * candidate — fits scratch comfortably. The prefix path fuses because
    * its per-pair duplication factor is the shared-prefix LENGTH
    * (unbounded); the band path's factor is capped at `bands`. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   threshold: Double = 0.7, shingleN: Int = 3): DataFrame = {
    val cand = minhashPairs(df, textCol, idCol, minEstimate = threshold * 0.5,
      shingleN = shingleN)
    // Verify on hash-sorted 8-byte shingles (see [[prefixJaccardPairs]]):
    // same exact Jaccard, ~2.5x narrower verify-join shuffle.
    val sh = df.select(col(idCol).as("id"),
        graft.functions.TextExpressions
          .sortedShingleHashes(col(textCol), shingleN).as("sh"))
      .repartition(col("id")) // shared by both verify joins via ReuseExchange
    cand.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.TextExpressions
          .jaccardSortedLongs(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact blocked n-gram Jaccard pairs — the oracle-checkable exact
    * variant: pairs only inside a blocking key (e.g. language), exact
    * similarity, no approximation.
    *
    * The self-join is salted (`salts`-way): blocking keys are few and
    * coarse, so without salting one task owns the biggest block's entire
    * O(block²) pair loop — the classic join-skew fix, and the same dial
    * you'd turn at 100 TB. The intersect size is projected once and the
    * Jaccard derived from sizes, because an expression referenced twice is
    * *evaluated* twice in the interpreted HOF path. */
  def blockedJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                          blockCol: String, threshold: Double,
                          shingleN: Int = 3, salts: Int = 16): DataFrame = {
    val sh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
      shingles(col(textCol), shingleN).as("sh"))
    val a = sh.select(col("blk"), pmod(xxhash64(col("id")), lit(salts)).as("salt"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("blk"), explode(sequence(lit(0), lit(salts - 1))).as("salt"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk", "salt")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.TextExpressions.jaccardSim(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Double-rounding guard for the PPJoin integer bounds: `0.7 * 10` is
    * `7.000000000000001` in binary, and a spurious `ceil` round-up would
    * over-PRUNE a true pair (filters) or SHORTEN a prefix by one and skip
    * a true candidate (prefix length). Subtracting epsilon before `ceil`
    * only makes every filter more conservative and every prefix longer —
    * losslessness is preserved. */
  private[ext] val PpEps = 1e-9

  /** The PPJoin prefix length `|s| − ceil(t·|s|) + 1`, FP-guarded. */
  private[ext] def prefLenOf(sz: Column, threshold: Double): Column =
    sz - ceil(lit(threshold) * sz - lit(PpEps)).cast("int") + lit(1)

  /** PPJoin candidate-pair pruning, applied per matched prefix element.
    * `sa`/`sb` are the two sets' sizes, `pa`/`pb` the 1-based positions of
    * the shared element in each hash-sorted set. Both bounds upper-bound
    * the true overlap, so a pair is pruned only when it PROVABLY fails the
    * threshold — recall is untouched (PPJoin, Xiao et al., WWW'08):
    *  - length filter: |a∩b| ≤ min(|a|,|b|) and J ≥ t forces
    *    min ≥ ceil(t·max);
    *  - positional filter: elements before the match contribute at most
    *    min(pa−1, pb−1), elements from the match on at most
    *    min(sa−pa+1, sb−pb+1); their sum must reach the overlap threshold
    *    α = ceil(t/(1+t)·(sa+sb)) (J ≥ t ⟺ |a∩b| ≥ t/(1+t)·(|a|+|b|)). */
  private[graft] def ppFilter(sa: Column, pa: Column, sb: Column, pb: Column,
                              threshold: Double): Column = {
    val alpha =
      ceil(lit(threshold / (1 + threshold)) * (sa + sb) - lit(PpEps))
    val lengthOk =
      least(sa, sb) >= ceil(lit(threshold) * greatest(sa, sb) - lit(PpEps))
    val overlapUb =
      least(pa - 1, pb - 1) + least(sa - pa + 1, sb - pb + 1)
    lengthOk && overlapUb >= alpha
  }

  /** Prefix explode carrying the PPJoin pruning payload: one row per
    * prefix element with the element's 1-based position and the set size.
    * prefLen = |s| − ceil(t·|s|) + 1, the PPJoin prefix bound. */
  private def prefixRowsWithPos(sh: DataFrame, threshold: Double): DataFrame = {
    val prefLen = prefLenOf(size(col("sh")), threshold)
    sh.select(col("blk"), col("id"), size(col("sh")).as("sz"),
        posexplode(slice(col("sh"), lit(1), prefLen)))
      .select(col("blk"), col("id"), col("sz"),
        (col("pos") + lit(1)).as("pos"), col("col").as("p"))
  }

  /** Candidate pairs from the prefix rule over a prepared (blk, id, sh)
    * frame — package-private so tests can measure how much the positional
    * and length filters (`filtered = true`, the production path) shrink
    * the candidate set vs the bare prefix-intersection rule. */
  private[graft] def prefixCandidates(sh: DataFrame, threshold: Double,
                                      filtered: Boolean = true): DataFrame = {
    val pref = prefixRowsWithPos(sh, threshold)
    val joined = pref.select(col("blk"), col("p"), col("id").as("id_a"),
        col("sz").as("__sza"), col("pos").as("__pa"))
      .join(pref.select(col("blk"), col("p"), col("id").as("id_b"),
        col("sz").as("__szb"), col("pos").as("__pb")), Seq("blk", "p"))
      .filter(col("id_a") < col("id_b"))
    val pruned =
      if (filtered) joined.filter(ppFilter(
        col("__sza"), col("__pa"), col("__szb"), col("__pb"), threshold))
      else joined
    pruned.select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard pairs via *prefix filtering* (PPJoin-style set-similarity
    * join) — lossless for the threshold, and the algorithm you'd run at
    * 100 TB instead of the O(block²) loop: two sets with Jaccard ≥ t must
    * share at least one element among the first `|s| - ceil(t*|s|) + 1`
    * elements under a global order. Candidate generation is an equi-join on
    * (block, prefix-shingle), pruned per match by [[ppFilter]]'s positional
    * and length bounds — the PPJoin defense against a boilerplate shingle
    * landing in millions of prefixes and going quadratic on one key; the
    * exact check runs only on surviving candidates.
    * Returns exactly [[blockedJaccardPairs]]'s rows. */
  def prefixJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         blockCol: String, threshold: Double,
                         shingleN: Int = 3): DataFrame = {
    // Shingles are HASH-SORTED 8-byte values end-to-end: prefix-filter
    // theory only needs *a* consistent global order, and hash order
    // qualifies. Set sizes/intersections — hence exact Jaccard — are
    // preserved (64-bit collisions are negligible), while both the verify
    // join (full array) and the candidate explode (~half the array) shuffle
    // 8 bytes per shingle instead of ~20 bytes of text.
    //
    // Deliberately NOT the classic rarest-first (ascending document
    // frequency) order: df-ordering shrinks candidate sets further, but
    // the order would then be a function of the CORPUS — it drifts as the
    // corpus grows, and a standing index ([[DedupIndex]]) whose stored
    // prefixes were cut under an older order silently loses the prefix
    // guarantee against probes cut under a newer one. Hash order is
    // corpus-independent (stable forever) and already scatters hot
    // shingles uniformly through prefixes; the positional/length filters
    // above reclaim most of df-ordering's pruning without the drift.
    // Verification FUSED into the prefix join (same rationale as
    // [[nearDupPairs]]): each prefix row carries its doc's full sorted
    // shingle array, the PPJoin positional/length filters prune per
    // match, and the exact Jaccard runs IN-STAGE on survivors — the only
    // pair-shaped exchange carries VERIFIED pairs. The former candidate
    // DISTINCT exchange carried every (pair × shared-prefix-element)
    // duplicate — near-identical docs share ~their whole prefix, so that
    // volume grows as cluster² × prefix length and was the 100×
    // rehearsal's scratch-disk killer. Prefix-row volume grows by the
    // attached array (~|s| longs over ~prefLen rows ≈ |s|²/2 longs per
    // doc), linear in the corpus. A pair is re-verified once per shared
    // surviving prefix element, on identical operands — bounded CPU for
    // unbounded disk.
    val sh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        graft.functions.TextExpressions
          .sortedShingleHashes(col(textCol), shingleN).as("sh"))
    val prefLen = prefLenOf(size(col("sh")), threshold)
    val pref = sh
      .select(col("blk"), col("id"), size(col("sh")).as("sz"), col("sh"),
        posexplode(slice(col("sh"), lit(1), prefLen)))
      .select(col("blk"), col("id"), col("sz"), col("sh"),
        (col("pos") + lit(1)).as("pos"), col("col").as("p"))
      // one (blk, p) exchange feeds both join sides via ReuseExchange —
      // the shingle pass runs once
      .repartition(col("blk"), col("p"))
    val a = pref.select(col("blk"), col("p"), col("id").as("id_a"),
      col("sz").as("__sza"), col("pos").as("__pa"), col("sh").as("sh_a"))
    val b = pref.select(col("blk"), col("p"), col("id").as("id_b"),
      col("sz").as("__szb"), col("pos").as("__pb"), col("sh").as("sh_b"))
    a.join(b, Seq("blk", "p"))
      .filter(col("id_a") < col("id_b"))
      .filter(ppFilter(col("__sza"), col("__pa"), col("__szb"), col("__pb"),
        threshold))
      // PAIR-MINIMAL verify gate, lossless: a pair joins once per SHARED
      // prefix element (near-identical docs share ~their whole prefix, so
      // cliques ran the exact Jaccard — and exchanged the verified pair —
      // ~prefix-length times over); keep only the row whose matched
      // element is the pair's FIRST common prefix element. That row always
      // exists (the min shared element is in both prefixes) and always
      // passes the positional filter above when any row of the pair does
      // (smaller positions only loosen its bound), so the surviving pair
      // set is bit-identical — one Jaccard and one exchanged row per pair.
      // The gate's merge scan exits at the first equality: O(1) for the
      // near-identical pairs that dominate the row count.
      .filter(col("p") === graft.functions.TextExpressions
        .firstCommonPrefixLong(col("sh_a"), col("sh_b"),
          prefLenOf(col("__sza"), threshold),
          prefLenOf(col("__szb"), threshold)))
      .select(col("id_a"), col("id_b"),
        graft.functions.TextExpressions
          .jaccardSortedLongs(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** Diagnostic for the pair-minimal verify gate in
    * [[prefixJaccardPairs]]: (rows the exact verify would run on WITHOUT
    * the gate, rows it runs on WITH it) — i.e. PPJoin-surviving prefix
    * match rows before/after keeping only each pair's first-common-
    * element row. The ratio is the measured per-pair verify (and
    * verified-exchange) multiplicity the gate removes; recorded per
    * scale in the growth artifact. */
  def prefixVerifyGateStats(df: DataFrame, textCol: String, idCol: String,
                            blockCol: String, threshold: Double,
                            shingleN: Int = 3): (Long, Long) = {
    val sh = df.select(col(blockCol).as("blk"), col(idCol).as("id"),
        graft.functions.TextExpressions
          .sortedShingleHashes(col(textCol), shingleN).as("sh"))
    val prefLen = prefLenOf(size(col("sh")), threshold)
    val pref = sh
      .select(col("blk"), col("id"), size(col("sh")).as("sz"), col("sh"),
        posexplode(slice(col("sh"), lit(1), prefLen)))
      .select(col("blk"), col("id"), col("sz"), col("sh"),
        (col("pos") + lit(1)).as("pos"), col("col").as("p"))
      .repartition(col("blk"), col("p"))
    val a = pref.select(col("blk"), col("p"), col("id").as("id_a"),
      col("sz").as("__sza"), col("pos").as("__pa"), col("sh").as("sh_a"))
    val b = pref.select(col("blk"), col("p"), col("id").as("id_b"),
      col("sz").as("__szb"), col("pos").as("__pb"), col("sh").as("sh_b"))
    // two lazy count passes, NOT a checkpoint: the pre-gate row set is
    // exactly the explosion being measured (pairs × shared prefix), and
    // materializing it with both shingle arrays attached is the r12
    // scratch-disk killer this gate exists to avoid
    val surv = a.join(b, Seq("blk", "p"))
      .filter(col("id_a") < col("id_b"))
      .filter(ppFilter(col("__sza"), col("__pa"), col("__szb"), col("__pb"),
        threshold))
    val pre = surv.count()
    val post = surv.filter(col("p") === graft.functions.TextExpressions
      .firstCommonPrefixLong(col("sh_a"), col("sh_b"),
        prefLenOf(col("__sza"), threshold),
        prefLenOf(col("__szb"), threshold))).count()
    (pre, post)
  }

  /** Sub-document segment dedup (CCNet-style line/paragraph dedup): split
    * every document into consecutive `segTokens`-token segments, keep ONE
    * copy of each distinct segment corpus-wide — the first by
    * (doc_id, seg_idx) — and reassemble the surviving text per document.
    * Documents whose every segment was claimed elsewhere drop out.
    *
    * The dedup key shuffles once as (xxhash64(seg), seg) so the exchange
    * compares 8-byte hashes before text, same trick as [[exact]]; the
    * keep-first choice is a window row_number over that key, and
    * reassembly is a sorted collect per doc (bounded by segments/doc). */
  def dedupSegments(df: DataFrame, textCol: String, idCol: String,
                    segTokens: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = TextAnalysis.tokens(col(textCol))
    val nSegs = expr(
      s"(greatest(size(${"__toks"}) - $segTokens, 0) + ${segTokens - 1}) div $segTokens + 1")
    val segs = df
      .select(col(idCol).as("id"), toks.as("__toks"))
      .select(col("id"), posexplode(transform(sequence(lit(0), nSegs - 1),
        i => concat_ws(" ", slice(col("__toks"), i * segTokens + 1, lit(segTokens))))))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
    val w = Window.partitionBy(xxhash64(col("seg")), col("seg"))
      .orderBy(col("id"), col("seg_idx"))
    segs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_segs"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("seg_idx"), col("seg")))),
          s => s.getField("seg"))).as("cleaned"))
  }

  /** Cross-set prefix-filtered exact-Jaccard join (PPJoin candidate rule
    * on BOTH prefixes): all (left, right) pairs inside a block with
    * Jaccard ≥ `threshold`. Same hashed-shingle machinery as
    * [[prefixJaccardPairs]] but over two distinct frames — the primitive
    * behind incremental (delta-vs-corpus) dedup, where the quadratic
    * corpus×corpus pass would be wasted work. */
  def prefixJaccardJoin(left: DataFrame, right: DataFrame,
                        textCol: String, idCol: String, blockCol: String,
                        threshold: Double, shingleN: Int = 3): DataFrame = {
    def prep(df: DataFrame, tag: String) =
      df.select(col(blockCol).as("blk"), col(idCol).as(s"id_$tag"),
          graft.functions.TextExpressions
            .sortedShingleHashes(col(textCol), shingleN).as(s"sh_$tag"))
        .repartition(col(s"id_$tag"))
    def pref(df: DataFrame, tag: String) = {
      val sh = col(s"sh_$tag")
      val prefLen = prefLenOf(size(sh), threshold)
      df.select(col("blk"), col(s"id_$tag"), size(sh).as(s"__sz_$tag"),
          posexplode(slice(sh, lit(1), prefLen)))
        .select(col("blk"), col(s"id_$tag"), col(s"__sz_$tag"),
          (col("pos") + lit(1)).as(s"__pos_$tag"), col("col").as("p"))
    }
    val a = prep(left, "a"); val b = prep(right, "b")
    val cand = pref(a, "a").join(pref(b, "b"), Seq("blk", "p"))
      .filter(ppFilter(col("__sz_a"), col("__pos_a"),
        col("__sz_b"), col("__pos_b"), threshold))
      .select("id_a", "id_b").distinct()
    cand
      .join(a.select(col("id_a"), col("sh_a")), "id_a")
      .join(b.select(col("id_b"), col("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        graft.functions.TextExpressions
          .jaccardSortedLongs(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental dedup: judge a `delta` batch against an existing
    * `corpus` WITHOUT touching corpus×corpus — the shape of continuous
    * ingestion at 100 TB, where the corpus is petabytes and the delta is
    * not. Two drop rules, each one join: exact text match (on
    * `(xxhash64(text), text)` so the shuffle compares 8-byte hashes
    * first), and blocked exact Jaccard ≥ `threshold` via the cross-set
    * prefix join. Output: every delta row with `keep` and the drop
    * `reason` ('exact' wins over 'near'; NULL when kept). */
  def dedupIncremental(corpus: DataFrame, delta: DataFrame,
                       textCol: String, idCol: String, blockCol: String,
                       threshold: Double, shingleN: Int = 3): DataFrame = {
    val exactIds = delta
      .select(col(idCol).as("id"), xxhash64(col(textCol)).as("__h"),
        col(textCol).as("__t"))
      .join(
        corpus.select(xxhash64(col(textCol)).as("__h"), col(textCol).as("__t"))
          .distinct(),
        Seq("__h", "__t"), "left_semi")
      .select(col("id"), lit(true).as("__e"))
    val nearIds = prefixJaccardJoin(corpus, delta, textCol, idCol, blockCol,
        threshold, shingleN)
      .select(col("id_b").as("id")).distinct()
      .select(col("id"), lit(true).as("__n"))
    delta.select(col(idCol).as("id"))
      .join(exactIds, Seq("id"), "left")
      .join(nearIds, Seq("id"), "left")
      .select(col("id").as(idCol),
        (col("__e").isNull && col("__n").isNull).as("keep"),
        when(col("__e").isNotNull, "exact")
          .when(col("__n").isNotNull, "near").as("reason"))
  }

  /** Resolve near-dup pairs into duplicate clusters: connected components
    * by iterative min-label propagation (each id adopts the smallest label
    * among itself and its neighbors until fixpoint). Label propagation is
    * joins-only — the standard large-graph CC shape; iterations are
    * bounded by the graph diameter, here capped at `maxIter` (near-dup
    * components are tiny star/chain clusters in practice).
    *
    * Output: (id, cluster) for every id in `ids`, cluster = min id of its
    * component (singletons map to themselves). */
  def clusters(ids: DataFrame, pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE. Exchange reuse does not span actions,
    // so without this every iteration's join (and every convergence count)
    // would re-execute the entire upstream pair-generation pipeline —
    // LSH banding, candidate join, exact verify — from the parquet scan up.
    // localCheckpoint (NOT cache): caching keeps the full logical lineage,
    // so every iteration re-optimizes the entire upstream pair-generation
    // plan even though execution reads cached blocks — measured slower
    // than checkpointing, which truncates the plan to a leaf.
    // The trailing repartition(v) is load-bearing: localCheckpoint preserves
    // outputPartitioning, and every iteration joins edges on v — so the
    // edge side of the per-iteration join never re-shuffles.
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct()
      .repartition(col("v"))
      .localCheckpoint()
    // Only nodes that appear in an edge participate in propagation. In a
    // dedup graph almost every document is a singleton, so at scale this
    // shrinks the iterated frame from |corpus| to |near-dup docs|;
    // singletons are stitched back as their own cluster at the end.
    // No checkpoint here: the plan is one distinct over the (materialized)
    // edge leaf, so the first iteration folds it into its own action
    // instead of paying a separate materialization job.
    var labels = edges.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("cluster"))
    // Convergence detection rides the checkpoint action itself: a counting
    // side effect on the label projection populates an accumulator while
    // localCheckpoint materializes the iteration, so each iteration is ONE
    // job instead of checkpoint + count. Task retries can only over-count
    // rows that genuinely changed, so the `== 0` convergence test is exact.
    val changedAcc = ids.sparkSession.sparkContext.longAccumulator("cc_changed")
    val mark = udf((prev: Long, cur: Long) => {
      if (prev != cur) changedAcc.add(1L); cur
    })
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v2"), col("v") === col("v2"))
        .groupBy(col("u").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      changedAcc.reset()
      val next = labels.withColumnRenamed("cluster", "prev")
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          mark(col("prev"),
            least(col("prev"), coalesce(col("nmin"), col("prev")))).as("cluster"))
        .localCheckpoint() // also truncates the growing iterative lineage
      changed = changedAcc.value
      // the superseded iteration's label blocks are dead the moment `next`
      // materializes — free them now, or a long-diameter run accumulates
      // one full label frame per superstep until driver GC (no-op for the
      // first iteration, whose labels frame is derived, not a checkpoint)
      graft.exec.Partitioning.unpersistCheckpoint(labels)
      labels = next
      iter += 1
      System.err.println(s"[clusters] iter $iter: $changed labels changed")
    }
    // Fail FAST on non-convergence: a not-yet-converged label frame is an
    // upper bound on components (wrong representatives), and the only
    // place that would catch it silently is an oracle — which does not run
    // at production scale. A graph with propagation diameter > maxIter
    // must abort loudly so the caller raises maxIter, never ship labels
    // that look like clusters but aren't.
    if (changed > 0)
      throw new IllegalStateException(
        s"Dedup.clusters: not converged after $maxIter iterations " +
          s"($changed labels still changing) — the pair graph has " +
          s"propagation diameter > $maxIter; raise maxIter")
    // the returned plan references only `labels` (a checkpoint root after
    // any iteration) and `ids` — the edge blocks are no longer reachable
    if (iter >= 1) graft.exec.Partitioning.unpersistCheckpoint(edges)
    ids.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }

  /** End-to-end near-duplicate removal: LSH+verified pairs → clusters →
    * keep only each cluster's min-id representative. */
  def dedupNear(df: DataFrame, textCol: String, idCol: String,
                threshold: Double = 0.8): DataFrame = {
    val pairs = nearDupPairs(df, textCol, idCol, threshold)
    val cl = clusters(df.select(col(idCol).as("id")), pairs)
    df.join(cl.filter(col("id") === col("cluster")).select(col("id").as(idCol)),
      Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------- SimHash

  /** The 64 bit masks 1L<<i as a literal array — zip_with against it avoids
    * non-literal shift amounts (Spark's shift functions take Int only). */
  private val bitMasks: Column = {
    import org.apache.spark.sql.functions.typedLit
    typedLit((0 until 64).map(i => 1L << i))
  }

  /** 64-bit SimHash of the token stream: per-token 64-bit hash votes ±1 on
    * each bit; the sign of each bit-sum forms the fingerprint. Tight-loop
    * custom expression; [[simhashHof]] is the cross-check twin. */
  def simhash(text: Column): Column =
    graft.functions.TextExpressions.simhash64(TextAnalysis.tokens(text))

  /** Interpreted HOF twin (64-wide zip_with fold), kept for parity tests. */
  def simhashHof(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    val votes = aggregate(
      t,
      array_repeat(lit(0L), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        zip_with(acc, bitMasks,
          (a, m) => a + when(h.bitwiseAND(m) === m, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, bitMasks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  // ------------------------------------------------------ duplicated spans

  /** Token-window fingerprints of every position: (id, pos, n_tokens, h)
    * with 1-based `pos` and `h = xxhash64(w-token window at pos)`. The
    * scalable stand-in for suffix-array substring dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * duplicated substring of ≥ w tokens is a run of duplicated w-windows,
    * so window-hash collisions find exactly the spans a suffix array
    * would, at minimum length w, without the global sort a distributed
    * suffix array needs. The shuffle key is the 8-byte hash, never the
    * window text. Docs shorter than w contribute one truncated window
    * (the whole doc), so short exact dups still collide. */
  private[ext] def spanWindows(df: DataFrame, textCol: String, idCol: String,
                          w: Int): DataFrame = {
    // Tight-loop kernel (one pass per doc, no window-string array through
    // the plan); bit-identical to the HOF construction
    // xxhash64(concat_ws(" ", slice(tokens, pos, w))) — twin-tested — so
    // stored span-index fingerprints stay valid across the swap.
    val t = TextAnalysis.tokens(col(textCol))
    df.select(col(idCol).as("id"), size(t).as("n_tokens"),
        posexplode(graft.functions.TextExpressions
          .positionalWindowHashes(col(textCol), w)).as(Seq("p0", "h")))
      .select(col("id"), col("n_tokens"), (col("p0") + 1).as("pos"), col("h"))
  }

  /** Interpreted HOF twin of the window fingerprint path, kept for parity
    * tests (same convention as [[shinglesHof]]). */
  private[graft] def spanWindowHashesHof(text: Column, w: Int): Column = {
    val t = TextAnalysis.tokens(text)
    transform(sequence(lit(1), greatest(size(t) - (w - 1), lit(1))),
      i => xxhash64(concat_ws(" ", slice(t, i, lit(w)))))
  }

  /** Merge the fixed-width dup windows of one doc into disjoint islands:
    * input must have (id, n_tokens, pos); output (id, n_tokens, s, e)
    * token spans, end clamped to the doc. Classic gaps-and-islands: a new
    * island starts when the previous window (pos-1 … pos-1+w-1) no longer
    * touches this one. */
  private[ext] def mergeIslands(dupPos: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("id").orderBy("pos")
    dupPos
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) < w, 0).otherwise(1))
      .withColumn("island", sum("brk").over(byDoc))
      .groupBy("id", "island")
      .agg(first("n_tokens").as("n_tokens"), min("pos").as("s"),
        least(max("pos") + (w - 1), first("n_tokens")).as("e"))
      .select(col("id"), col("n_tokens"), col("s"), col("e"))
  }

  /** Per-document duplicated-span stats: how many of each doc's tokens sit
    * inside a ≥w-token span that occurs more than once in the corpus
    * (counting both copies — this measures exposure to duplication, the
    * usual filter signal; [[trimSpans]] is the asymmetric keep-one-copy
    * editor). Output: (id, n_tokens, dup_tokens, dup_frac).
    *
    * Cost shape at 100 TB: one shuffle on the 8-byte window hash for the
    * occurrence count, one on doc id for the island merge — both linear in
    * corpus token count; no pair join, no global sort. Occurrence counts
    * come from a groupBy, not an analytic window over `h`: partial
    * aggregation combines map-side, the join-back carries one row per
    * duplicated hash, and a boilerplate window occurring a billion times
    * streams through the sort-merge join (and is AQE-skew-splittable)
    * instead of buffering in a single window task. */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     w: Int = 6): DataFrame = {
    // Deliberate materialization point (the minhashPairs pattern): the
    // occurrence count and the join-back both consume the same h-keyed
    // exchange via ReuseExchange, so fingerprints are computed once, not
    // once per branch.
    val we = spanWindows(df, textCol, idCol, w).repartition(col("h"))
    val dupHashes = we.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
      .select("h")
    val dup = we.join(dupHashes, Seq("h"))
      .select(col("id"), col("n_tokens"), col("pos"))
    val perDoc = mergeIslands(dup, w)
      .groupBy("id")
      .agg(sum(col("e") - col("s") + 1).as("dup_tokens"))
    df.select(col(idCol).as("id"),
        size(TextAnalysis.tokens(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
          greatest(col("n_tokens"), lit(1))).as("dup_frac"))
  }

  /** Remove every duplicated ≥w-token span except its canonical (first by
    * (id, pos)) occurrence and reassemble the surviving tokens — the
    * trim step of substring-level dedup. Every doc comes back (an exact
    * duplicate of an earlier doc comes back empty). Output:
    * (id, kept_tokens, trimmed_text).
    *
    * Three shuffles, all linear: window-hash (rank occurrences), doc id
    * (island merge), doc id (reassembly of the token branch against the
    * covered positions — AQE broadcasts the covered side when it is small,
    * else it is a shuffled anti join on (id, pos)). Covered positions are
    * exploded from disjoint islands, so that explode is bounded by the
    * doc's own token count. */
  def trimSpans(df: DataFrame, textCol: String, idCol: String,
                w: Int = 6): DataFrame = {
    // h-keyed materialization point shared by the canon aggregation and
    // the join-back (see duplicateSpans)
    val we = spanWindows(df, textCol, idCol, w).repartition(col("h"))
    // Canonical occurrence per duplicated hash via groupBy (min over the
    // (id, pos) struct), not row_number over an analytic window — same
    // skew-robustness argument as in duplicateSpans.
    val canon = we.groupBy("h")
      .agg(count(lit(1)).as("n_occ"),
        min(struct(col("id"), col("pos"))).as("canon"))
      .filter(col("n_occ") > 1)
      .select(col("h"), col("canon"))
    val extra = we.join(canon, Seq("h"))
      .filter(struct(col("id"), col("pos")) =!= col("canon"))
      .select(col("id"), col("n_tokens"), col("pos"))
    removeCovered(df, textCol, idCol, mergeIslands(extra, w))
  }

  /** Drop every token of `df` covered by an island span and reassemble
    * the survivors in order; every input doc comes back (fully-covered
    * docs come back empty). `islands`: (id, s, e) disjoint token spans.
    *
    * The cut itself is a per-row expression: the islands collapse to one
    * small spans-array row per affected doc, join back to the UNEXPLODED
    * corpus (AQE broadcasts the spans side when contamination is rare),
    * and a positional filter rebuilds the text in place. The corpus is
    * never exploded to token rows, so reassembly costs no corpus-wide
    * shuffle — the spans aggregation (bounded by island count) is the
    * only exchange. The per-token `exists` over a doc's spans is cheap
    * because islands are disjoint and few. */
  private[ext] def removeCovered(df: DataFrame, textCol: String, idCol: String,
                            islands: DataFrame): DataFrame = {
    val spans = islands.groupBy("id")
      .agg(collect_list(struct(col("s"), col("e"))).as("spans"))
    val t = TextAnalysis.tokens(col(textCol))
    val keep = (i: Column) => col("spans").isNull ||
      !exists(col("spans"),
        x => x.getField("s") <= i && i <= x.getField("e"))
    val kept = filter(
      transform(sequence(lit(1), size(t)),
        i => when(keep(i), element_at(t, i))),
      x => x.isNotNull)
    df.select(col(idCol).as("id"), col(textCol))
      .join(spans, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(kept).cast(LongType).as("kept_tokens"),
        array_join(kept, " ").as("trimmed_text"))
  }

  /** Span-level decontamination: cut every ≥w-token window of `df` that
    * appears verbatim anywhere in `ref` (a benchmark/eval corpus) and
    * reassemble the rest — the surgical alternative to dropping whole
    * contaminated documents ([[TextAnalysis.contamination]] is the
    * flagging view). Output: (id, kept_tokens, trimmed_text), every doc
    * present.
    *
    * 100 TB shape: the reference fingerprint set is distinct window
    * hashes of the (small) benchmark side — broadcast to the corpus scan
    * like a bloom probe, so the corpus never shuffles for matching; the
    * only corpus-keyed shuffles are the per-doc island merge and
    * reassembly. */
  def trimMatchingSpans(df: DataFrame, textCol: String, idCol: String,
                        ref: DataFrame, refTextCol: String,
                        w: Int = 6): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val refH = spanWindows(ref.select(lit(0L).as("rid"), col(refTextCol)),
        refTextCol, "rid", w)
      .select(col("h")).distinct()
    val hit = spanWindows(df, textCol, idCol, w)
      .join(broadcast(refH), Seq("h"))
      .select(col("id"), col("n_tokens"), col("pos"))
    removeCovered(df, textCol, idCol, mergeIslands(hit, w))
  }

  /** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003): from every k consecutive window hashes keep the minimum, so
    * ~2/(k+1) of positions survive while any shared run of ≥ w+k-1 tokens
    * is still guaranteed to leave a selected fingerprint in BOTH copies
    * (the k-window fully inside the run sees identical hashes in both
    * docs, so both select the same minimum — context outside the run
    * cannot veto it, because a window's min is selected wherever that
    * window fits in the doc). Selection is value-equality based ("h equals
    * the best window-min of any k-window containing it"), which both
    * engines can mirror; 64-bit hashes make value ties negligible.
    * Input: (id, pos, h) per [[spanWindows]]; output: selected (id, h). */
  private def winnowed(we: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("id").orderBy("pos")
    we.withColumn("m", min("h").over(byDoc.rowsBetween(0, k - 1)))
      .withColumn("selmax", max(col("m")).over(byDoc.rowsBetween(-(k - 1), 0)))
      .filter(col("selmax") === col("h"))
      .select(col("id"), col("h"))
  }

  /** Document pairs sharing a verbatim run of at least `minRun` tokens,
    * with the exact length of their longest shared run — the
    * plagiarism/contamination pair primitive. Candidates come from
    * winnowed fingerprints (k = minRun-w+1, so the winnowing guarantee
    * length equals `minRun` and no qualifying pair can be missed);
    * verification then joins the candidates' FULL window sets and measures
    * the longest diagonal run of colliding windows (positions (pa, pb)
    * with equal hashes on one diagonal pa-pb, merged gaps-and-islands
    * style; a shared run of R tokens is R-w+1 consecutive windows, so
    * max_run = island length + w - 1). Output: (id_a, id_b, max_run),
    * id_a < id_b.
    *
    * 100 TB shape: the expensive all-window self-join never happens —
    * only selected fingerprints (~2/(k+1) of windows) join to find
    * candidates, and only candidate documents' windows are re-joined to
    * verify. `maxBucket` caps a degenerate fingerprint bucket (same
    * documented recall tradeoff as [[minhashPairs]]); the default never
    * triggers at fixture scale so oracle parity holds exactly. */
  def sharedRunPairs(df: DataFrame, textCol: String, idCol: String,
                     minRun: Int = 8, w: Int = 6,
                     maxBucket: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minRun >= w, s"minRun ($minRun) must be >= window width ($w)")
    val k = minRun - w + 1
    // id-keyed materialization point: the winnowing windows and the
    // verification's candidate-doc semi join both consume one id-keyed
    // exchange, so fingerprints are computed once (see duplicateSpans)
    val we = spanWindows(df, textCol, idCol, w).repartition(col("id"))
    val sel = winnowed(we, k)
      .withColumn("n_sel", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("n_sel") <= maxBucket)
    val pairs = sel.select(col("h"), col("id").as("id_a"))
      .join(sel.select(col("h"), col("id").as("id_b")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val candDocs = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct()
    val wf = we.join(candDocs, Seq("id"), "left_semi")
    val shared = wf.select(col("h"), col("id").as("id_a"), col("pos").as("pa"))
      .join(wf.select(col("h"), col("id").as("id_b"), col("pos").as("pb")), Seq("h"))
      .join(pairs, Seq("id_a", "id_b"), "left_semi")
      .select(col("id_a"), col("id_b"), col("pa"), col("pb"))
    val byDiag = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    shared.withColumn("diag", col("pa") - col("pb"))
      .withColumn("brk",
        when(col("pa") - lag("pa", 1).over(byDiag) === 1, 0).otherwise(1))
      .withColumn("isl", sum("brk").over(byDiag))
      .groupBy("id_a", "id_b", "diag", "isl")
      .agg((max("pa") - min("pa") + w).as("run"))
      .groupBy("id_a", "id_b")
      .agg(max("run").as("max_run"))
      .filter(col("max_run") >= minRun)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit chunks
    * (guarantees recall for hamming ≤ 3), join per chunk, verify hamming.
    * Same one-shuffle LSH shape as MinHash — including the `maxBucket`
    * hot-bucket cap: a degenerate (band, chunk) bucket (a boilerplate-
    * heavy corpus slice hashing to one fingerprint region) would
    * otherwise go quadratic in that bucket's size. The cap is a REAL
    * recall loss, not a redundancy-protected trim: pigeonhole only
    * guarantees a hamming ≤ 3 pair at least ONE whole agreeing chunk,
    * so a pair whose only agreeing chunk lands in a trimmed bucket is
    * lost entirely. Size the cap with [[trimmedBuckets]] (which buckets
    * a corpus actually trims, and how many fingerprints each drops);
    * the `_verified` companion's false-positive contract is unaffected
    * either way (the cap only removes candidates). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    hammingPairs(
      df.select(col(idCol).as("id"), simhash(col(textCol)).as("fp")),
      "id", "fp", maxHamming, maxBucket)

  /** The 64-bit hamming-near pair join over ANY (id, bits) frame — the
    * banding kernel shared by text simhash and image dHash
    * ([[Multimodal.imageDhash]]): 4×16-bit chunks, equi-join per chunk
    * (pigeonhole-EXACT for hamming ≤ 3 — such a pair agrees on at least
    * one whole chunk), hamming verified on the full 64 bits. Same
    * one-shuffle LSH shape and `maxBucket` degenerate-bucket dial as
    * MinHash — and the same caveat as [[simhashPairs]]: pigeonhole
    * guarantees only ≥ 1 agreeing chunk, so trimming a bucket can lose
    * a pair outright. [[trimmedBuckets]] makes that loss observable. */
  def hammingPairs(df: DataFrame, idCol: String, bitsCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val fp = df.select(col(idCol).as("id"), col(bitsCol).as("fp"))
      .repartition(col("id")) // fingerprint computed once, reused by both sides
    val banded = fp.select(col("id"), col("fp"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      .withColumn("__cnt", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("chunk"))))
      .filter(col("__cnt") <= maxBucket && col("__cnt") >= 2).drop("__cnt")
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), hamming64(col("fp_a"), col("fp_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Observability for [[hammingPairs]]' hot-bucket cap: the (band,
    * chunk) buckets the cap would trim at `maxBucket`, with their
    * occupancy — i.e. exactly where recall is being lost and how much
    * fingerprint mass each trim drops. One aggregation over the same
    * banding expression as the pair join (cost: one shuffle on (band,
    * chunk), output bounded by the number of HOT buckets, not the
    * corpus), so operators can audit/size the cap without running the
    * quadratic uncapped join. */
  def trimmedBuckets(df: DataFrame, bitsCol: String,
                     maxBucket: Int = 1000): DataFrame =
    df.select(posexplode(array((0 until 4).map(b =>
        shiftright(col(bitsCol), b * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
      .groupBy(col("band"), col("chunk"))
      .agg(count(lit(1)).as("n_fingerprints"))
      .filter(col("n_fingerprints") > maxBucket)
}

package graft.exec

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling for training-data pipelines.
  *
  * `df.sample()` draws from an RNG seeded per partition — resplitting the
  * input changes the selected rows, and no other engine can reproduce the
  * choice. Hash-based sampling keys the decision on row CONTENT: the same
  * row is always in or out, across runs, engines, partitionings, and
  * incremental reprocessing — which is what dataset curation needs
  * (stable held-out splits, rerunnable downsampling).
  *
  * The hash is plain 64-bit arithmetic (Knuth multiplicative on a reduced
  * key) rather than xxhash64 so any SQL engine can replicate it; the
  * pre-reduction keeps the product within Long range (ANSI mode would
  * throw on overflow). Map-side only — no shuffle, composes with scans. */
object Sampling {

  private val Mod = 1000000007L          // reduce key below 2^30
  private val Knuth = 2654435761L        // 2^32 * golden ratio
  private val Buckets = 10000L

  /** Uniform bucket in [0, 10000) for a numeric key column. */
  def hashBucket(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(Mod)) * lit(Knuth), lit(Buckets))

  /** Deterministic ~`cap`-row slice: every row whose xxhash64(id) lands
    * in a fixed residue class, full passthrough at or under the cap.
    * Hash-based (not limit/sample) so the slice is stable across
    * partitionings, runs and engines. The residue modulus is the
    * CEILING of n/cap, so the expected slice never exceeds the cap —
    * floor would pass the full input through anywhere between cap and
    * 2·cap. One use: scale-gating the brute-force sides of refutation
    * companions, whose cost must not grow with the corpus. */
  def boundedSlice(df: DataFrame, idCol: String, cap: Long): DataFrame =
    boundedSlice(df, idCol, cap, df.count())

  /** [[boundedSlice]] with the row count already known — callers that
    * count the frame anyway (to branch on full-coverage) pass it here
    * instead of paying a second count job. */
  def boundedSlice(df: DataFrame, idCol: String, cap: Long,
                   knownCount: Long): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    if (knownCount <= cap) df
    else df.filter(
      pmod(xxhash64(col(idCol)), lit((knownCount + cap - 1) / cap)) === 0L)
  }

  /** Keep ~`rate` of rows, decided by the key's hash bucket. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit((rate * Buckets).toLong))

  /** Per-stratum rates (e.g. downsample dominant languages), with a
    * default for unlisted strata. One map-side filter, no shuffle. */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double): DataFrame = {
    val threshold = rates.foldLeft(lit((defaultRate * Buckets).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * Buckets).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Weight-proportional reproducible sampling: row i is kept with
    * probability w_i / w_max — the heaviest row always survives, a row
    * with half its weight survives half the time — decided by the same
    * content hash as [[hashSample]], so the selection is stable across
    * runs/engines/partitionings (importance sampling for curation:
    * weight by quality score, length, dedup-cluster size...). Integer
    * floor arithmetic throughout; w_max arrives via a broadcast one-row
    * cross join, everything else is a map-side filter. */
  def weightedHashSample(df: DataFrame, keyCol: String,
                         weightCol: String): DataFrame = {
    // Degenerate weights fail loudly instead of silently dropping every
    // row: a non-positive max weight raises (the rate w/w_max is
    // meaningless), and a NULL per-row weight raises rather than letting
    // the NULL comparison filter the row. An empty input stays a clean
    // empty result (the NULL max never meets a row to raise on).
    val mx = df.agg(max(col(weightCol).cast("long")).as("__wmax"))
    df.crossJoin(broadcast(mx))
      .filter(
        when(col(weightCol).isNull || col("__wmax") <= 0,
          raise_error(concat(
            lit(s"weightedHashSample: $weightCol must be non-NULL with a " +
              "positive max; got weight="),
            coalesce(col(weightCol).cast("string"), lit("NULL")),
            lit(", max="),
            coalesce(col("__wmax").cast("string"), lit("NULL")))))
        // `div`, not `/`: Long / Long is DOUBLE division in Spark; the
        // oracle's `//` is floor division and the two must floor alike
        .otherwise(hashBucket(col(keyCol)) <
          expr(s"CAST($weightCol AS BIGINT) * $Buckets div __wmax")))
      .drop("__wmax")
  }

  /** EXACT-k per-stratum sampling under a reproducible total order.
    *
    * Spec: within each stratum, take the first `n` rows ordered by
    * (hashBucket(key), md5(key), key). The naive plan — one row_number
    * window per stratum — sorts EVERY row of the stratum on one task:
    * a corpus that is half English puts half of 100 TB through a single
    * partition's sort. This plan makes the same selection with the
    * per-stratum sort bounded to ONE bucket's rows (~1/10000 of the
    * stratum):
    *
    *  1. count rows per (stratum, bucket) — map-side-combinable agg to
    *     at most |strata| × 10000 rows;
    *  2. a cumulative sum over that tiny aggregate finds each stratum's
    *     BOUNDARY bucket (first bucket where the running count reaches
    *     n) and how many rows the boundary still owes;
    *  3. rows in buckets below the boundary pass with a broadcast-join
    *     filter — no sort; only the boundary bucket's rows enter the
    *     md5-ordered row_number window; buckets above drop.
    *
    * All arithmetic is integer/hex-string comparison, so the naive
    * window IS the oracle: hash-matching it proves the two-phase plan
    * selects identical rows. A stratum with fewer than n rows is kept
    * whole (no boundary exists). */
  def exactStratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                            n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"sample size must be positive: $n")
    val withB = df.withColumn("__b", hashBucket(col(keyCol)))
    val counts = withB.groupBy(col(strataCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(col(strataCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(cumW))
    // per stratum: the first bucket whose cumulative count reaches n,
    // and how many of its rows to take. Buckets are unique per stratum,
    // so min(struct) picks the boundary deterministically. Strata that
    // never reach n simply have no row here (left join keeps them whole).
    val bounds = cum.filter(col("__cum") >= n)
      .groupBy(col(strataCol))
      .agg(min(struct(col("__b"), (col("__cum") - col("__c")).as("__before")))
        .as("__m"))
      .select(col(strataCol), col("__m.__b").as("__bb"),
        (lit(n.toLong) - col("__m.__before")).as("__take"))
    val joined = withB.join(broadcast(bounds), Seq(strataCol), "left")
    val below = joined.filter(col("__bb").isNull || col("__b") < col("__bb"))
    // the boundary window sees ONLY the boundary bucket's rows — the
    // bounded sort that replaces the naive whole-stratum sort
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    val atBoundary = joined.filter(col("__b") === col("__bb"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__take")).drop("__rn")
    below.unionByName(atBoundary).drop("__b", "__bb", "__take")
  }

  /** Stable train/val/test (or any) split assignment: consecutive hash-
    * bucket ranges sized by the given fractions. A row's split never
    * changes when data is added, removed, or repartitioned — the property
    * an eval holdout must have. Fractions should sum to ≤ 1 (any
    * remainder falls into the last split). */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty)
    val bounds = splits.scanLeft(0L) { case (acc, (_, f)) =>
      acc + (f * Buckets).toLong
    }.tail
    val bucket = hashBucket(col(keyCol))
    val assigned = splits.init.zip(bounds.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), hi), acc) =>
      when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, assigned)
  }
}

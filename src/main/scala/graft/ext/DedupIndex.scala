package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Standing dedup index as BUCKETED tables, so continuous (delta-vs-corpus)
  * ingestion never shuffles the corpus side again.
  *
  * [[Dedup.dedupIncremental]] recomputes corpus hashes/shingles and
  * exchanges them on every batch — fine for a one-shot backfill, wasted
  * work for the 100 TB steady state where the corpus is petabytes and the
  * delta is not. This module persists the corpus's dedup artifacts ONCE,
  * each bucketed on exactly its probe-join keys, so every per-batch join
  * reads bucket files already partitioned the way the join needs them
  * (`FileSourceScanExec` reports the bucket `HashPartitioning`, and
  * EnsureRequirements shuffles only the small delta side to match —
  * asserted in IOSpec):
  *
  *  - `<base>_exact(h, t)`      bucketed by `(h, t)`, h = xxhash64(text) —
  *    the exact-duplicate rule probes it with an equi-join on `h` plus the
  *    text equality (which Catalyst folds into the join keys, so the
  *    bucket spec carries BOTH keys; the leading 8-byte hash keeps bucket
  *    sort comparisons cheap);
  *  - `<base>_pref(bk, id)`     bucketed by `bk` = xxhash64(block, prefix
  *    shingle hash) — PPJoin candidate generation is an equi-join on the
  *    fused key (a 64-bit collision can only ADD a candidate, which the
  *    exact verify then rejects — recall is unaffected);
  *  - `<base>_sh(id, blk, sh)`  bucketed by `id` — the verify join fetches
  *    each candidate's full sorted shingle-hash array by id;
  *  - `<base>_band(bk, id)`     bucketed by `bk` = the MinHash band hash —
  *    the LSH candidate generator (`candidates = "lsh"`), for corpora
  *    where the prefix explode is too wide (very long documents): ~b·n
  *    index rows regardless of document length, at the cost of LSH's
  *    probabilistic recall. Both generators feed the SAME exact-Jaccard
  *    verify, so precision is exact either way.
  *
  * Kept batches append to the same tables (`SaveMode.Append` preserves the
  * bucket spec), so the index *is* the corpus state and ingestion is:
  * judge batch → append survivors → next batch. Every row carries the
  * `bid` (batch id) it arrived in, and a probe can EXCLUDE its own batch
  * id — that makes a replayed micro-batch (restart after the append)
  * judge against exactly the pre-append state, so replay verdicts equal
  * the originals (tested in StreamSpec). */
object DedupIndex {

  def exactTable(base: String) = s"${base}_exact"
  def prefTable(base: String)  = s"${base}_pref"
  def shTable(base: String)    = s"${base}_sh"
  def bandTable(base: String)  = s"${base}_band"

  /** MinHash/LSH banding parameters (k = bands·rows): 16 bands of 4 rows —
    * [[Dedup.minhashPairs]]' defaults; collision probability at the 0.5
    * Jaccard operating point ≈ 0.64 per pair and ≥ 0.99 by ~0.7. */
  val LshK = 64
  val LshBands = 16
  val LshSeed = 42L

  /** The per-document index artifacts for one frame: id, block, text hash,
    * text, and the hash-sorted shingle array ([[Dedup.prefixJaccardPairs]]'
    * representation — prefix-filter theory only needs a consistent global
    * order, and hash order qualifies). */
  private def artifacts(df: DataFrame, textCol: String, idCol: String,
                        blockCol: String, shingleN: Int): DataFrame =
    df.select(
      col(idCol).as("id"),
      col(blockCol).cast("string").as("blk"),
      xxhash64(col(textCol)).as("h"),
      col(textCol).as("t"),
      graft.functions.TextExpressions
        .sortedShingleHashes(col(textCol), shingleN).as("sh"))

  /** Bulk (non-batch) index rows carry this sentinel batch id. */
  val BulkBid: Long = -1L

  /** LSH band explode of the shingle arrays: one (bk, id) row per MinHash
    * band, bk = xxhash64("band", band index, the band's signature slice) —
    * identical banding to [[Dedup.minhashPairs]], derived from the STORED
    * hashes ([[graft.functions.TextExpressions.minhashFromHashes]] produces
    * the same signature as hashing the text's shingles directly). */
  private def bandRows(art: DataFrame): DataFrame = {
    val rows = LshK / LshBands
    art.select(col("id"), col("bid"),
        graft.functions.TextExpressions
          .minhashFromHashes(col("sh"), LshK, LshSeed).as("sig"))
      .select(col("id"), col("bid"),
        explode(Dedup.bandHashes(col("sig"), LshBands, rows)).as("bk"))
      .select(col("bk"), col("id"), col("bid"))
  }

  /** Prefix-filter explode of the shingle arrays: one (bk, id) row per
    * prefix shingle, bk fused from (block, shingle hash) so the candidate
    * join is single-key. prefLen = |s| - ceil(t·|s|) + 1 — the PPJoin
    * prefix bound for Jaccard ≥ t. */
  private def prefixRows(art: DataFrame, threshold: Double): DataFrame = {
    val prefLen =
      size(col("sh")) - ceil(lit(threshold) * size(col("sh"))).cast("int") + lit(1)
    art.select(col("blk"), col("id"), col("bid"),
        explode(slice(col("sh"), lit(1), prefLen)).as("p"))
      .select(xxhash64(col("blk"), col("p")).as("bk"), col("id"), col("bid"))
  }

  /** Build (overwrite) the standing index for `corpus`. `threshold` is
    * baked into the stored prefix length — probe with the same threshold.
    * One pass derives all four tables (the artifact frame is
    * materialized once, then written four ways). */
  def write(corpus: DataFrame, textCol: String, idCol: String,
            blockCol: String, base: String, threshold: Double,
            shingleN: Int = 3, buckets: Int = 32,
            mode: SaveMode = SaveMode.Overwrite,
            batchId: Long = BulkBid): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // bid stamped ONCE here (constant per call, so the exact table's
    // distinct over (h, t, bid) still dedups texts), shingle once,
    // feed four writes
    val art = artifacts(corpus, textCol, idCol, blockCol, shingleN)
      .withColumn("bid", lit(batchId))
      .localCheckpoint()
    try {
      // The four writes are independent actions over the one checkpointed
      // artifact frame — submitted concurrently so the scheduler overlaps
      // them (driver-side job-submission overhead dominates small builds;
      // on a cluster the stages simply share the executors).
      val writes = Seq(
        () => writeBucketed(art.select(col("h"), col("t"), col("bid")).distinct(),
          exactTable(base), Seq("h", "t"), buckets, mode),
        () => writeBucketed(prefixRows(art, threshold),
          prefTable(base), Seq("bk"), buckets, mode),
        () => writeBucketed(art.select(col("id"), col("blk"), col("sh"), col("bid")),
          shTable(base), Seq("id"), buckets, mode),
        () => writeBucketed(bandRows(art), bandTable(base), Seq("bk"), buckets, mode))
      // Wait for ALL four writes to SETTLE (not fail-fast): the shared
      // localCheckpoint blocks cannot be recomputed from lineage, so
      // unpersisting while sibling writes are still running would kill
      // them with missing-block errors — and in Append mode leave the
      // four tables inconsistently appended. Collect every outcome,
      // unpersist in `finally`, then rethrow the first failure.
      import scala.util.{Failure, Try}
      val settled = Await.result(
        Future.sequence(writes.map(w => Future(w()).transform(Try(_)))),
        Duration.Inf)
      settled.collectFirst { case Failure(e) => e }.foreach(throw _)
    } finally
      // free the checkpoint blocks even when a write fails mid-retry —
      // otherwise every failed attempt pins a dead block set until GC
      graft.exec.Partitioning.unpersistCheckpoint(art)
  }

  private def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                            buckets: Int, mode: SaveMode): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", tablePath(df.sparkSession, table))
      .format("parquet").saveAsTable(table)

  /** External-table location: pinned under the JVM temp dir so the index
    * works regardless of warehouse configuration (and lands outside the
    * repo during local runs). The path is host-shared state — that is the
    * point of a STANDING index (a later session reads what an earlier one
    * built) — so concurrent writers must use distinct `base` names, like
    * any shared table. */
  private def tablePath(spark: SparkSession, table: String): String =
    new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_dedup_index/$table").getAbsolutePath

  /** Compact the standing index: rewrite every table in place with its
    * own bucket spec. Each kept batch appends one file per bucket, so a
    * long-running ingestion accumulates per-bucket file counts linear in
    * the batch count — the probe plan is unaffected (a bucket is read as
    * a group), but scan open/seek overhead and replayed-append
    * duplicates are not. Compaction folds each bucket back to one file
    * and drops exact-duplicate rows a replayed append may have left.
    * Run it OFFLINE relative to probes (it is the standard bucketed-table
    * maintenance trade, same as any warehouse). */
  def compact(spark: SparkSession, base: String, buckets: Int = 32): Unit = {
    // the ORIGINAL bucket spec per table — re-bucketing on different keys
    // would break the probes' exchange-free scans
    val tables = Seq(
      exactTable(base) -> Seq("h", "t"),
      prefTable(base)  -> Seq("bk"),
      shTable(base)    -> Seq("id"),
      bandTable(base)  -> Seq("bk"))
    tables.foreach { case (table, keys) =>
      // materialize before overwriting the location being read
      val snap = spark.table(table).distinct().localCheckpoint()
      try writeBucketed(snap, table, keys, buckets, SaveMode.Overwrite)
      finally graft.exec.Partitioning.unpersistCheckpoint(snap)
    }
  }

  /** Judge `delta` against the standing index — same output contract as
    * [[Dedup.dedupIncremental]] (every delta row with `keep` + drop
    * `reason`), but the corpus side of every join is a bucketed scan with
    * NO exchange: only the delta's artifacts shuffle.
    *
    * `candidates` picks the near-rule generator: `"prefix"` (lossless
    * PPJoin, the default) or `"lsh"` (MinHash bands — constant index rows
    * per document, probabilistic recall).
    *
    * `excludeBatchId`: ignore index rows stamped with this batch id — a
    * replayed micro-batch passes its own id so its earlier append (if the
    * first attempt died after appending) is invisible, and the replay
    * reproduces the original verdicts exactly. */
  def dedupIncremental(spark: SparkSession, base: String, delta: DataFrame,
                       textCol: String, idCol: String, blockCol: String,
                       threshold: Double, shingleN: Int = 3,
                       candidates: String = "prefix",
                       excludeBatchId: Long = Long.MinValue): DataFrame = {
    // Legacy (pre-bid) indexes read as all-bulk: no stamp, no exclusion.
    def tbl(name: String) = {
      val raw = spark.table(name)
      if (raw.columns.contains("bid"))
        raw.filter(col("bid") =!= lit(excludeBatchId)).drop("bid")
      else raw
    }
    val d = artifacts(delta, textCol, idCol, blockCol, shingleN)
      .withColumn("bid", lit(BulkBid)) // probe-side stamp is never stored
      .repartition(col("id")) // one artifact pass shared by all three rules
    // Exact rule: equi-join on the 64-bit text hash (the bucket key),
    // settled by the residual full-text comparison.
    val exactIds = d.select(col("id"), col("h"), col("t").as("__dt"))
      .join(tbl(exactTable(base)), Seq("h"))
      .filter(col("t") === col("__dt"))
      .select(col("id")).distinct()
      .select(col("id"), lit(true).as("__e"))
    // Near rule: candidates from the chosen generator, verified with
    // exact Jaccard on the stored shingle arrays — both generators are
    // single-key equi-joins against their bucketed table.
    val (probe, table) = candidates match {
      case "prefix" => (prefixRows(d, threshold), prefTable(base))
      case "lsh"    => (bandRows(d), bandTable(base))
      case other => throw new IllegalArgumentException(
        s"candidates must be 'prefix' or 'lsh', got '$other'")
    }
    val cand = probe.withColumnRenamed("id", "id_b")
      .join(tbl(table).withColumnRenamed("id", "id_a"), Seq("bk"))
      .select(col("id_a"), col("id_b")).distinct()
    val corpusSh = tbl(shTable(base))
    val nearIds = cand
      .join(corpusSh.select(col("id").as("id_a"), col("blk").as("__blk_a"),
        col("sh").as("__sh_a")), Seq("id_a"))
      .join(d.select(col("id").as("id_b"), col("blk").as("__blk_b"),
        col("sh").as("__sh_b")), Seq("id_b"))
      // the blk equality settles fused-key collisions across blocks
      .filter(col("__blk_a") === col("__blk_b") &&
        graft.functions.TextExpressions
          .jaccardSortedLongs(col("__sh_a"), col("__sh_b")) >= threshold)
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

  /** Fold a judged batch's KEPT rows into the index (bucket-preserving
    * appends) — the state transition of continuous ingestion. The bucket
    * count is read from the existing table's spec: an append with a
    * different count would be rejected by the catalog. */
  def appendKept(spark: SparkSession, base: String, batch: DataFrame,
                 verdicts: DataFrame, textCol: String, idCol: String,
                 blockCol: String, threshold: Double,
                 shingleN: Int = 3, batchId: Long = BulkBid): Unit = {
    val buckets = spark.sessionState.catalog
      .getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(exactTable(base)))
      .bucketSpec.map(_.numBuckets).getOrElse(32)
    val kept = batch.join(
      verdicts.filter(col("keep")).select(col(idCol)), Seq(idCol), "left_semi")
    write(kept, textCol, idCol, blockCol, base, threshold, shingleN, buckets,
      mode = SaveMode.Append, batchId = batchId)
  }
}

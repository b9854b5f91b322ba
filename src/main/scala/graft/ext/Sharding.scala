package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-epoch preparation: a REPRODUCIBLE global shuffle of the corpus
  * and token-budget shard assignment — the step that turns a filtered
  * corpus into the ordered, evenly-sized shards a trainer streams.
  *
  * Reproducibility: the permutation is `sort by (hash(id, seed), id)` with
  * a pure modular hash — same seed, same corpus ⇒ the same epoch order on
  * any cluster size, any partition count. The hash stays inside BIGINT
  * range by reducing mod [[HashMod]] before multiplying (Spark 4 runs ANSI
  * mode: silent Long wraparound is an error, and an overflow-free formula
  * is also what lets the DuckDB oracle evaluate it identically).
  *
  * Scale shape: one range exchange (the sort), then a TWO-PHASE PREFIX SUM
  * for cumulative token counts — per-partition totals (P longs) come to
  * the driver, offsets broadcast back, each partition streams its rows
  * once adding its offset. No global single-task window, no second
  * corpus-wide shuffle for the running total; the result is identical to
  * the window formulation (the oracle) but the cumulative pass is
  * embarrassingly parallel. The final in-shard position IS a window, but
  * partitioned by shard — per-key work is bounded by budget/avg_tokens
  * rows, never the corpus. */
object Sharding {

  val HashMod: Long = 1000000007L
  val HashMulA: Long = 1103515245L
  val HashMulB: Long = 2654435761L

  /** Deterministic shuffle key in [0, HashMod). Two affine steps with a
    * mod-reduce BETWEEN them: a single affine map `(a·id + seed) mod M` is
    * order-isomorphic to `a·id mod M` up to one rotation, so consecutive
    * seeds would yield near-identical epoch orders (caught by
    * ShardingSpec). The interleaved reduction makes the composition
    * non-affine and each seed a genuinely different permutation.
    * Max intermediate: (M-1)·B ≈ 2.7e18 < 2^63 — ANSI-safe. */
  def shuffleKey(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    (((id % HashMod) * HashMulA + seed) % HashMod) * HashMulB % HashMod

  /** Shuffle the corpus by (hash, id), accumulate token counts in epoch
    * order, and assign each document to the shard holding its starting
    * token (shard = cum_before div budget). Output: (idCol, h, n_tokens,
    * cum_before, shard, pos). */
  def epochShuffle(docs: DataFrame, idCol: String, textCol: String,
                   seed: Long, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      col(idCol).cast(LongType).as("id"),
      TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("h", shuffleKey(col("id"), seed))
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    // Range boundaries are sampled, but the RESULT is boundary-invariant:
    // (h, id) is a total order, offsets are computed from the partitions
    // that actually materialized, so any boundary split yields the same
    // cumulative sums. localCheckpoint pins one materialization for the
    // two passes (totals, then offset-add) — without it the second job
    // would re-shuffle and could legally land different boundaries.
    val ranged = base.repartitionByRange(parts, col("h"), col("id"))
      .sortWithinPartitions("h", "id")
      .select(col("id"), col("n_tokens"), col("h")).as[(Long, Long, Long)]
      .localCheckpoint()
    // Partition identity comes from mapPartitionsWithIndex's split index,
    // never TaskContext.getPartitionId(): a downstream narrow re-partitioning
    // (a sink's coalesce) folds checkpoint partitions into one task where
    // getPartitionId() is the coalesced id — every folded chunk would read
    // the same offset. The split index is bound at RDD definition.
    val totals = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator((pid, s))
    }.collect().toMap
    val offsets: Map[Int, Long] = {
      val sorted = totals.toSeq.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _)).toMap
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val withCum = spark.createDataset(
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var run = bc.value(pid)
        it.map { case (id, tok, h) =>
          val before = run; run += tok; (id, h, tok, before)
        }
      }).toDF(idCol, "h", "n_tokens", "cum_before")
    withCum
      .withColumn("shard", expr(s"cum_before div $budget"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("h", idCol)))
  }

  /** CONTENT-DEFINED chunking — the incremental-retraining counterpart of
    * the ordinal epoch shards. The epoch manifest has a cascade problem:
    * dropping one document shifts every later shard's token interval, so
    * a tiny corpus delta invalidates almost all shards. Here chunk
    * BOUNDARIES are content-chosen (documents whose shuffle hash ≡ 0 mod
    * `cutMod` start a chunk — the rsync/CDC trick applied to corpora) and
    * a chunk's IDENTITY is its cut document's hash, not an ordinal: a
    * delete or edit changes only the chunk(s) that actually contain the
    * touched documents (plus one merge when the cut doc itself vanishes),
    * leaving every other chunk's key AND checksum byte-identical — so an
    * incremental pipeline re-tokenizes a bounded set, never the corpus.
    *
    * Same two-phase scale shape as the epoch shuffle: one range exchange
    * on (h, id), per-partition last-cut hashes chained through the driver
    * (P values), rows streamed once. Output: (idCol, h, n_tokens,
    * chunk_key) where chunk_key = h of the chunk's cut doc, −1 for the
    * prefix before the first cut. */
  def contentChunks(docs: DataFrame, idCol: String, textCol: String,
                    seed: Long, cutMod: Long): DataFrame =
    assignChunkKeys(
      docs.select(
        col(idCol).cast(LongType).as("id"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
        .withColumn("h", shuffleKey(col("id"), seed)),
      cutMod)
      .withColumnRenamed("id", idCol)

  /** The cut-assignment core over any (id, n_tokens, h) frame. */
  def assignChunkKeys(base0: DataFrame, cutMod: Long): DataFrame =
    assignChunkKeysBy(base0.withColumn("is_cut",
      (col("h") % cutMod === 0L).cast("long")))

  /** Flag-driven variant: `is_cut` marks the chunk-starting rows
    * explicitly. The standing chunk index needs BOTH the post-batch
    * assignment (batch cut docs start new chunks) and the pre-batch one
    * (only standing cuts count — where would this doc have landed before
    * the batch?) over the same frame, which a pure h-mod predicate can't
    * express. */
  def assignChunkKeysBy(base0: DataFrame): DataFrame = {
    val spark = base0.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = base0.repartitionByRange(parts, col("h"), col("id"))
      .sortWithinPartitions("h", "id")
      .select(col("id"), col("n_tokens"), col("h"), col("is_cut"))
      .as[(Long, Long, Long, Long)]
      .localCheckpoint()
    // Phase 1: each partition's LAST cut hash (if any).
    val lastCuts: Map[Int, Long] = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var last = Long.MinValue
      it.foreach { case (_, _, h, cut) => if (cut != 0L) last = h }
      if (last == Long.MinValue) Iterator.empty else Iterator((pid, last))
    }.collect().toMap
    // Phase 2: the cut hash each partition INHERITS = the latest cut in
    // any earlier partition; −1 before the first cut in the corpus.
    val incoming: Map[Int, Long] = {
      var run = -1L
      (0 until parts).map { pid =>
        val in = pid -> run
        lastCuts.get(pid).foreach(run = _)
        in
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(incoming)
    spark.createDataset(
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var cur = bc.value(pid)
        it.map { case (id, tok, h, cut) =>
          if (cut != 0L) cur = h
          (id, h, tok, cur)
        }
      }).toDF("id", "h", "n_tokens", "chunk_key")
  }

  /** TWO cut assignments in ONE exchange: [[assignChunkKeysBy]] run for
    * two independent `is_cut` flags over the same frame. The standing
    * chunk index's append needs both the POST-batch assignment (batch
    * cut docs start chunks) and the PRE-batch one (only standing cuts
    * count) of every row, and running them as two calls paid the range
    * shuffle, the checkpoint pin, and the two partition passes twice —
    * the flags share the (h, id) order, so one pass can carry both
    * running cut hashes. Output: (id, h, n_tokens, key_a, key_b);
    * parity with two independent runs is property-pinned in
    * ShardingSpec. */
  def assignChunkKeysBy2(base0: DataFrame): DataFrame = {
    val spark = base0.sparkSession
    import spark.implicits._
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = base0.repartitionByRange(parts, col("h"), col("id"))
      .sortWithinPartitions("h", "id")
      .select(col("id"), col("n_tokens"), col("h"),
        col("is_cut_a"), col("is_cut_b"))
      .as[(Long, Long, Long, Long, Long)]
      .localCheckpoint()
    // Phase 1: each partition's LAST cut hash per flag (if any).
    val lastCuts: Map[Int, (Long, Long)] =
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var la = Long.MinValue; var lb = Long.MinValue
        it.foreach { case (_, _, h, ca, cb) =>
          if (ca != 0L) la = h
          if (cb != 0L) lb = h
        }
        if (la == Long.MinValue && lb == Long.MinValue) Iterator.empty
        else Iterator((pid, (la, lb)))
      }.collect().toMap
    // Phase 2: per-flag inherited cut = latest cut in earlier partitions.
    val incoming: Map[Int, (Long, Long)] = {
      var runA = -1L; var runB = -1L
      (0 until parts).map { pid =>
        val in = pid -> ((runA, runB))
        lastCuts.get(pid).foreach { case (la, lb) =>
          if (la != Long.MinValue) runA = la
          if (lb != Long.MinValue) runB = lb
        }
        in
      }.toMap
    }
    val bc = spark.sparkContext.broadcast(incoming)
    spark.createDataset(
      ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
        var (curA, curB) = bc.value(pid)
        it.map { case (id, tok, h, ca, cb) =>
          if (ca != 0L) curA = h
          if (cb != 0L) curB = h
          (id, h, tok, curA, curB)
        }
      }).toDF("id", "h", "n_tokens", "key_a", "key_b")
  }

  /** Per-chunk manifest with an ORDER-INSENSITIVE content checksum
    * (membership + text fingerprints), the unit of incremental diffing. */
  def chunkManifest(docs: DataFrame, idCol: String, textCol: String,
                    seed: Long, cutMod: Long): DataFrame =
    contentChunks(docs, idCol, textCol, seed, cutMod)
      .join(docs.select(col(idCol).cast(LongType).as(idCol),
        TextAnalysis.fingerprint(col(textCol)).as("__fp")), idCol)
      .groupBy("chunk_key")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        sum(expr(s"($idCol * 31 + __fp) % $HashMod")).as("checksum"))

  /** Materialize the epoch to disk in the layout a trainer streams:
    * `path/shard=K/` holds shard K's documents IN EPOCH ORDER inside the
    * parquet files, and `path/_manifest/` records each shard's doc/token
    * counts, token interval and an order-sensitive checksum (the
    * underscore prefix keeps it invisible to a plain directory read).
    *
    * Shape: the shard assignment is joined back to the text (one shuffle
    * keyed on the id), then ONE hash exchange on `shard` gives writer
    * parallelism of #shards with exactly one file per shard — a shard IS
    * a file, which is what sequential trainer reads want. The manifest is
    * a ≤#shards-row aggregate of the assignment, not a corpus re-read. */
  def writeShards(docs: DataFrame, idCol: String, textCol: String,
                  seed: Long, budget: Long, path: String): Unit = {
    val assigned = epochShuffle(docs, idCol, textCol, seed, budget)
      .localCheckpoint() // one epoch computation feeds both files and manifest
    assigned
      .join(docs.select(col(idCol), col(textCol)), idCol)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    assigned.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("n_tokens"),
        min("cum_before").as("start_tok"),
        max(expr("cum_before + n_tokens")).as("end_tok"),
        sum(expr(s"($idCol * pos) % $HashMod")).as("checksum"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** One shard, partition-pruned: only `shard=K/` files are scanned. */
  def readShard(spark: org.apache.spark.sql.SparkSession,
                path: String, shard: Long): DataFrame =
    spark.read.parquet(path).filter(col("shard") === shard)

  def readManifest(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/_manifest")
}

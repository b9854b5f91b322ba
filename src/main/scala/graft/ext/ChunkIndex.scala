package graft.ext

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STANDING content-defined chunk index — the streaming maintenance of
  * [[Sharding.contentChunks]]: as document batches arrive, the per-chunk
  * manifest (counts, token totals, order-insensitive checksums) is kept
  * current by recomputing ONLY the dirty chunks — the chunks the batch's
  * documents land in, plus the chunk each new CUT document splits — and
  * the work per batch is bounded by batch size + dirty-chunk members,
  * never the corpus.
  *
  * Layout at `base/` (all three tables are per-batch DELTA partitions,
  * written with dynamic partition overwrite so a replayed micro-batch
  * rewrites its own partition — the same idempotence contract as the
  * dedup-index ingestion):
  *  - `docs/batch_id=N/`     doc stats (doc_id, h, n_tokens, fp), h-sorted
  *                           inside files so the dirty-range scan prunes
  *                           on parquet min/max
  *  - `cuts/batch_id=N/`     the batch's cut documents (doc_id, h)
  *  - `manifest/batch_id=N/` manifest rows recomputed this batch
  *
  * Reads: the current manifest is each chunk key's row from the LATEST
  * batch that recomputed it (chunk keys are stable content identities, so
  * versions supersede by key). All reads inside a batch step exclude the
  * current batch's partitions, so a replay sees exactly the pre-batch
  * state and reproduces its output byte-for-byte.
  *
  * Deletion (takedown) follows the dedup-index tombstone pattern:
  * `tombs/batch_id=N/` masks doc ids on every read — an O(|deleted|)
  * append, no delta rewritten — and the delete step recomputes only the
  * victims' chunks plus, for each deleted CUT doc, its predecessor chunk
  * (where the orphaned members merge; chains of adjacent deleted cuts
  * resolve because every victim contributes its own predecessor). */
object ChunkIndex {

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h", LongType),
    StructField("n_tokens", LongType), StructField("fp", LongType),
    StructField("batch_id", LongType)))
  private val cutsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("h", LongType),
    StructField("batch_id", LongType)))
  private val manifestSchema = StructType(Seq(
    StructField("chunk_key", LongType), StructField("n_docs", LongType),
    StructField("n_tokens", LongType), StructField("checksum", LongType),
    StructField("batch_id", LongType)))

  private val tombsSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("batch_id", LongType)))

  private def readOr(spark: SparkSession, path: String,
                     schema: StructType): DataFrame =
    scala.util.Try(spark.read.schema(schema).parquet(path))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  private def readTombs(spark: SparkSession, base: String,
                        excludeBatch: Long): DataFrame =
    readOr(spark, s"$base/tombs", tombsSchema)
      .filter(col("batch_id") =!= excludeBatch)
      .select("doc_id")

  /** Doc stats with tombstones masked — deletion is an O(|deleted|)
    * tombstone append; no delta partition is ever rewritten. */
  def readDocs(spark: SparkSession, base: String,
               excludeBatch: Long = Long.MinValue): DataFrame =
    readOr(spark, s"$base/docs", docsSchema)
      .filter(col("batch_id") =!= excludeBatch)
      .join(readTombs(spark, base, excludeBatch), Seq("doc_id"), "left_anti")

  /** Cut markers with tombstones masked: a deleted cut doc stops being a
    * boundary the moment its tombstone lands. */
  def readCuts(spark: SparkSession, base: String,
               excludeBatch: Long = Long.MinValue): DataFrame =
    readOr(spark, s"$base/cuts", cutsSchema)
      .filter(col("batch_id") =!= excludeBatch)
      .join(readTombs(spark, base, excludeBatch), Seq("doc_id"), "left_anti")

  /** Current manifest: per chunk key, the row from the latest batch that
    * recomputed it. The window partitions by key — per-key state is the
    * handful of versions a key has ever had, never the corpus. */
  def readManifest(spark: SparkSession, base: String,
                   excludeBatch: Long = Long.MinValue): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    readOr(spark, s"$base/manifest", manifestSchema)
      .filter(col("batch_id") =!= excludeBatch)
      .withColumn("__rk", row_number().over(
        Window.partitionBy("chunk_key").orderBy(col("batch_id").desc)))
      .filter(col("__rk") === 1)
      .filter(col("n_docs") > 0) // zero-member versions are tombstones
      .select("chunk_key", "n_docs", "n_tokens", "checksum")
  }

  /** Ingest one batch of documents. */
  def append(spark: SparkSession, base: String, batch: DataFrame,
             textCol: String, idCol: String, seed: Long, cutMod: Long,
             batchId: Long): Unit = {
    val stats = batch.select(
        col(idCol).cast(LongType).as("doc_id"),
        TextAnalysis.tokenCount(col(textCol)).cast(LongType).as("n_tokens"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .withColumn("h", Sharding.shuffleKey(col("doc_id"), seed))
      .select("doc_id", "h", "n_tokens", "fp")
      .localCheckpoint()

    val standingCuts = readCuts(spark, base, excludeBatch = batchId)
      .select("doc_id", "h").localCheckpoint()

    // POST assignment: standing cuts and batch cuts both start chunks.
    // PRE assignment: only standing cuts do — it names the chunk a new
    // cut doc SPLITS (whose remaining members must be recounted).
    def assign(batchCutsCount: Boolean): DataFrame = Sharding.assignChunkKeysBy(
      standingCuts.select(col("doc_id").as("id"), lit(0L).as("n_tokens"),
          col("h"), lit(1L).as("is_cut"))
        .unionByName(stats.select(col("doc_id").as("id"), col("n_tokens"),
          col("h"),
          (if (batchCutsCount) (col("h") % cutMod === 0L).cast("long")
           else lit(0L)).as("is_cut"))))
    val batchIds = stats.select(col("doc_id").as("id"))
    val post = assign(batchCutsCount = true).join(batchIds, "id")
      .select(col("id"), col("chunk_key").as("post_key")).localCheckpoint()
    val pre = assign(batchCutsCount = false).join(batchIds, "id")
      .select(col("id"), col("chunk_key").as("pre_key"))
    val dirty = post.select(col("post_key").as("chunk_key"))
      .union(pre.select(col("pre_key").as("chunk_key")))
      .distinct().localCheckpoint()

    // Dirty-chunk h-ranges from the POST cut set: [cut, next cut).
    val postCuts = standingCuts.select("h")
      .unionByName(stats.filter(col("h") % cutMod === 0L).select("h"))
      .distinct()
    val dirtyRanges = cutRanges(spark, postCuts).join(dirty, "chunk_key")
      .localCheckpoint()

    // Members of dirty chunks: standing docs in the dirty h-ranges (the
    // parquet scan prunes on h min/max because delta files are h-sorted)
    // + the whole batch (every batch doc's post chunk is dirty).
    val standingMembers = readDocs(spark, base, excludeBatch = batchId)
      .join(broadcast(dirtyRanges), col("h") >= col("lo") && col("h") < col("hi"))
      .select(col("doc_id"), col("chunk_key"), col("n_tokens"), col("fp"))
    val batchMembers = stats
      .join(post, stats("doc_id") === post("id"))
      .select(col("doc_id"), col("post_key").as("chunk_key"),
        col("n_tokens"), col("fp"))
    val recomputed = recomputeManifest(dirty,
      standingMembers.unionByName(batchMembers))

    writeDelta(base, batchId)(stats, "docs", Some("h"))
    writeDelta(base, batchId)(
      stats.filter(col("h") % cutMod === 0L).select("doc_id", "h"),
      "cuts", Some("h"))
    writeDelta(base, batchId)(recomputed, "manifest", None)
  }

  /** (chunk_key, lo, hi) h-ranges of the given cut set, including the −1
    * prefix chunk. */
  private def cutRanges(spark: SparkSession, cuts: DataFrame): DataFrame = {
    import spark.implicits._
    val rankedCuts = graft.exec.Ranks.globalRowNumber(cuts, Seq(col("h")), "rk")
    val nextCuts = rankedCuts.select(col("h").as("next_h"), (col("rk") - 1).as("rk"))
    val prefixRange =
      if (cuts.isEmpty) // cutless corpus: everything is the -1 chunk
        Seq((-1L, Long.MinValue, Long.MaxValue)).toDF("chunk_key", "lo", "hi")
      else rankedCuts.filter(col("rk") === 1)
        .select(lit(-1L).as("chunk_key"), lit(Long.MinValue).as("lo"),
          col("h").as("hi"))
    rankedCuts
      .join(nextCuts, Seq("rk"), "left")
      .select(col("h").as("chunk_key"), col("h").as("lo"),
        coalesce(col("next_h"), lit(Long.MaxValue)).as("hi"))
      .unionByName(prefixRange)
  }

  /** Left-join from the dirty keys: a dirty chunk that ends the batch
    * EMPTY (a late cut absorbing the whole −1 prefix, or a delete
    * draining a chunk) must still emit a row — n_docs = 0 — or its stale
    * pre-batch version would survive the latest-wins read
    * (ChunkIndexSpec pins this). */
  private def recomputeManifest(dirty: DataFrame, members: DataFrame): DataFrame =
    dirty.join(
        members.groupBy("chunk_key")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
            sum(expr(s"(doc_id * 31 + fp) % ${Sharding.HashMod}")).as("checksum")),
        Seq("chunk_key"), "left")
      .select(col("chunk_key"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("checksum"), lit(0L)).as("checksum"))

  private def writeDelta(base: String, batchId: Long)(
      df: DataFrame, table: String, sortCol: Option[String]): Unit = {
    val stamped = df.withColumn("batch_id", lit(batchId))
    val sorted = sortCol.map(c => stamped.sortWithinPartitions(c)).getOrElse(stamped)
    sorted.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$base/$table")
  }

  /** Takedown: tombstone `ids` and recompute only the chunks they leave —
    * each victim's chunk under the PRE-delete cuts, plus the predecessor
    * chunk of every victim CUT doc (its orphaned members merge there).
    * Caller contract: `batchId` must exceed every previous batch id (the
    * manifest read is latest-wins per key). Replay-idempotent like
    * append: all three deltas are this batch's own partitions. */
  def delete(spark: SparkSession, base: String, ids: DataFrame,
             idCol: String, cutMod: Long, batchId: Long): Unit = {
    val victims = readDocs(spark, base, excludeBatch = batchId)
      .join(ids.select(col(idCol).cast(LongType).as("doc_id")), Seq("doc_id"))
      .select("doc_id", "h", "n_tokens", "fp")
      .localCheckpoint()
    val preCuts = readCuts(spark, base, excludeBatch = batchId)
      .select("doc_id", "h").localCheckpoint()

    // chunk of each non-cut victim under PRE cuts
    val nonCutKeys = Sharding.assignChunkKeysBy(
        preCuts.select(col("doc_id").as("id"), lit(0L).as("n_tokens"),
          col("h"), lit(1L).as("is_cut"))
        .unionByName(victims.filter(col("h") % cutMod =!= 0L)
          .select(col("doc_id").as("id"), col("n_tokens"), col("h"),
            lit(0L).as("is_cut"))))
      .join(victims.filter(col("h") % cutMod =!= 0L)
        .select(col("doc_id").as("id")), Seq("id"))
      .select("chunk_key")
    // each victim cut dirties itself and its predecessor (chains of
    // adjacent deleted cuts resolve: every victim contributes its own)
    val victimCuts = victims.filter(col("h") % cutMod === 0L).select("h")
    val rankedPre = graft.exec.Ranks.globalRowNumber(
      preCuts.select("h"), Seq(col("h")), "rk")
    val prevPre = rankedPre.select(col("h").as("prev_h"), (col("rk") + 1).as("rk"))
    val cutAndPred = victimCuts.join(rankedPre, Seq("h"))
      .join(prevPre, Seq("rk"), "left")
      .select(col("h").as("chunk_key"),
        coalesce(col("prev_h"), lit(-1L)).as("pred_key"))
    val dirty = nonCutKeys
      .union(cutAndPred.select(col("chunk_key")))
      .union(cutAndPred.select(col("pred_key").as("chunk_key")))
      .distinct().localCheckpoint()

    // post-delete cut set and the surviving members of dirty chunks
    val postCuts = preCuts.select("h")
      .join(victimCuts.withColumnRenamed("h", "h"), Seq("h"), "left_anti")
    val dirtyRanges = cutRanges(spark, postCuts).join(dirty, "chunk_key")
      .localCheckpoint()
    val members = readDocs(spark, base, excludeBatch = batchId)
      .join(victims.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(broadcast(dirtyRanges), col("h") >= col("lo") && col("h") < col("hi"))
      .select(col("doc_id"), col("chunk_key"), col("n_tokens"), col("fp"))

    writeDelta(base, batchId)(victims.select("doc_id"), "tombs", None)
    writeDelta(base, batchId)(recomputeManifest(dirty, members), "manifest", None)
  }

  /** Streaming maintenance: each micro-batch appends through the batch
    * step above. foreachBatch, not a stateful operator — the chunk state
    * must outlive the stream and serve batch readers. Micro-batch ids
    * version the delta partitions directly, so a replayed batch
    * overwrites its own partitions and the standing manifest is
    * unchanged (ChunkIndexSpec pins the same step called twice). */
  def run(stream: DataFrame, base: String, textCol: String, idCol: String,
          seed: Long, cutMod: Long, checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        append(batch.sparkSession, base, batch, textCol, idCol,
          seed, cutMod, batchId)
      }
}

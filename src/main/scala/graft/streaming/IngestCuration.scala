package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

import graft.ext.TextAnalysis

/** Streaming corpus curation against a STANDING importance-feature table —
  * the unbounded twin of q_importance: each micro-batch is scored by the
  * hashed-unigram likelihood ratio (target domain vs raw corpus) learned
  * from every PREVIOUS batch, routed keep/reject with a per-row verdict,
  * and (optionally) folded into the feature table so the model sharpens
  * as the crawl flows.
  *
  * State shape at 100 TB: the standing state is `Buckets` counters — a
  * few KB — stored as per-batch DELTA partitions (`stamp=K/`) and
  * aggregated on read, so updates are appends, never read-modify-write,
  * and a replayed micro-batch overwrites its own delta partition instead
  * of double-counting (same dynamic-partition-overwrite idempotence as
  * the verdict sink). Scoring excludes the current batch's stamp, so a
  * restart between sink write and checkpoint commit reproduces the
  * original verdicts exactly. foreachBatch, not a stateful operator: the
  * feature table must outlive the stream and serve batch queries too.
  *
  * Integer arithmetic throughout (scaled count ratios) — verdicts are
  * bit-reproducible across engines and replays. */
object IngestCuration {

  val Buckets = 1024
  /** Scaled ratio of a bucket: (n_target * RatioScale) div n_raw. */
  val RatioScale = 10000L

  private val featSchema = StructType(Seq(
    StructField("b", LongType),
    StructField("n_target", LongType),
    StructField("n_raw", LongType),
    StructField("stamp", LongType)))

  /** The standing feature table, aggregated per bucket; rows whose stamp
    * equals `excludeStamp` are ignored (replay safety). Empty (0 rows)
    * until the first delta lands — the bootstrap state. */
  def readFeatures(spark: SparkSession, featPath: String,
                   excludeStamp: Long = Long.MinValue): DataFrame = {
    val raw = scala.util.Try(spark.read.schema(featSchema).parquet(featPath))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], featSchema))
    raw.filter(col("stamp") =!= excludeStamp)
      .groupBy("b")
      .agg(sum("n_target").as("n_target"), sum("n_raw").as("n_raw"))
  }

  /** Per-(doc, bucket) token counts — ONE tokenization pass, the same
    * collapse as the batch query. */
  private def docBuckets(batch: DataFrame, textCol: String, idCol: String,
                         targetExpr: String): DataFrame =
    batch.select(col(idCol), expr(targetExpr).as("__is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .withColumn("b", TextAnalysis.tokenBucket(col("token"), Buckets))
      .groupBy(col(idCol), col("__is_target"), col("b"))
      .agg(count(lit(1)).as("n"))

  /** Score one batch against a feature snapshot. Emits a verdict row per
    * INPUT row: (id, n_tokens, score, avg_ratio, keep, reason). Policy:
    * bootstrap (empty features) keeps everything; token-less docs are
    * rejected with their own reason; otherwise keep ⇔ avg_ratio ≥
    * minRatio. */
  def scoreBatch(batch: DataFrame, feat: DataFrame, textCol: String,
                 idCol: String, targetExpr: String, minRatio: Long): DataFrame = {
    val bootstrap = feat.isEmpty
    val db = docBuckets(batch, textCol, idCol, targetExpr)
    val scored = db.join(broadcast(feat), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(sum("n").as("n_tokens"),
        sum(expr(s"n * ((coalesce(n_target, 0) * $RatioScale) div greatest(coalesce(n_raw, 0), 1))"))
          .as("score"))
      .withColumn("avg_ratio", expr("score div n_tokens"))
    batch.select(col(idCol)).distinct()
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score"), lit(0L)).as("score"),
        coalesce(col("avg_ratio"), lit(0L)).as("avg_ratio"),
        when(col("n_tokens").isNull, lit(false))
          .when(lit(bootstrap), lit(true))
          .otherwise(col("avg_ratio") >= minRatio).as("keep"),
        when(col("n_tokens").isNull, lit("no_tokens"))
          .when(lit(bootstrap), lit("bootstrap"))
          .when(col("avg_ratio") >= minRatio, lit(null).cast("string"))
          .otherwise(lit("low_importance")).as("reason"))
  }

  /** One micro-batch step, exposed for direct replay testing. */
  def processBatch(batch: DataFrame, batchId: Long, featPath: String,
                   textCol: String, idCol: String, targetExpr: String,
                   minRatio: Long, verdictPath: String,
                   updateFeatures: Boolean, runTag: String = ""): Unit = {
    val spark = batch.sparkSession
    // Stable across restarts of this run, unique across runs sharing the
    // feature table — same contract as the dedup-index stamp.
    val stamp = graft.functions.TextHash.xxhash(
      org.apache.spark.unsafe.types.UTF8String.fromString(s"$runTag#$batchId"))
    val feat = readFeatures(spark, featPath, excludeStamp = stamp)
      .localCheckpoint()
    try {
      scoreBatch(batch, feat, textCol, idCol, targetExpr, minRatio)
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(verdictPath)
      if (updateFeatures)
        docBuckets(batch, textCol, idCol, targetExpr)
          .groupBy("b")
          .agg(sum(when(col("__is_target"), col("n")).otherwise(0L)).as("n_target"),
            sum("n").as("n_raw"))
          .withColumn("stamp", lit(stamp))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("stamp").parquet(featPath)
    } finally graft.exec.Partitioning.unpersistCheckpoint(feat)
  }

  /** Build the writer (caller `.start()`s it). */
  def run(stream: DataFrame, featPath: String, textCol: String, idCol: String,
          targetExpr: String, minRatio: Long, verdictPath: String,
          checkpoint: String, updateFeatures: Boolean): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, featPath, textCol, idCol, targetExpr,
          minRatio, verdictPath, updateFeatures, runTag = checkpoint)
      }
}

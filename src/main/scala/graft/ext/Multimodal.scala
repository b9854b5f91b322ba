package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing — schema, partition sizing, per-partition batch
  * processing, output shape — is real and tested. The codec itself is a
  * clearly-marked deterministic STUB (`fakeDecode`): this container has no
  * image/audio libraries, so the stub stands where an actual JNI/ffmpeg/
  * turbojpeg call would go. Swapping it out changes no plumbing.
  *
  * Scale notes: media rows are large and skewed — [[repartitionBySize]]
  * re-buckets by cumulative payload size so one task never holds a few
  * multi-GB videos while others starve; decode runs in `mapPartitions`
  * so per-partition codec setup (thread pools, native contexts) is paid
  * once per task, not once per row. */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Build a media table from the `documents` fixture: payload = utf-8
    * bytes of the text, metadata synthesized deterministically from doc_id.
    * Stands in for `spark.read.format("binaryFile")` + sidecar metadata. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("format"),
        (lit(32) + pmod(col("doc_id"), lit(8)) * 16).cast(IntegerType).as("width"),
        (lit(32) + pmod(col("doc_id"), lit(5)) * 16).cast(IntegerType).as("height"),
        (pmod(col("doc_id"), lit(60)) * 1000L).as("duration_ms")).as("meta"))

  /** ======== STUB ========
    * Deterministic fake decoder: a real implementation would hand `bytes`
    * to an image codec and return pixel features. The fake derives features
    * only from the raw bytes (byte count, mean byte value, min/max), so it
    * is reproducible and oracle-checkable while exercising the identical
    * batch shape a real codec would. */
  private[ext] def fakeDecode(bytes: Array[Byte]): (Long, Double, Int, Int) = {
    if (bytes == null || bytes.isEmpty) (0L, 0.0, 0, 0)
    else {
      var sum = 0L; var mn = 255; var mx = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xFF
        sum += b; if (b < mn) mn = b; if (b > mx) mx = b
        i += 1
      }
      (bytes.length.toLong, sum.toDouble / bytes.length, mn, mx)
    }
  }

  /** Decode + feature-extract over the media column. Runs as one
    * `mapPartitions` pass (codec init once per partition); output keeps the
    * metadata and appends the feature struct. */
  def decodeFeatures(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("mean_byte", DoubleType),
      StructField("min_byte", IntegerType),
      StructField("max_byte", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      // per-partition codec setup would go here (STUB: none needed)
      rows.map { r =>
        val (n, mean, mn, mx) = fakeDecode(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), r.getStruct(metaIdx).getString(0), n, mean, mn, mx)
      }
    }(enc)
  }

  /** ======== STUB ======== Resize: recomputes metadata to the target box
    * (aspect-preserving) and truncates the payload proportionally — a real
    * impl would re-encode pixels; the metadata/plumbing contract is the
    * same. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"),
      lit(1.0))
    media.withColumn("__scale", scale)
      .withColumn("meta",
        struct(
          col("meta.format").as("format"),
          floor(col("meta.width") * col("__scale")).cast(IntegerType).as("width"),
          floor(col("meta.height") * col("__scale")).cast(IntegerType).as("height"),
          col("meta.duration_ms").as("duration_ms")))
      .withColumn("media",
        expr("substring(media, 1, greatest(cast(floor(octet_length(media) * __scale) as int), 1))"))
      .drop("__scale")
  }

  /** Frame sampling for video-like payloads: one output row per sampled
    * frame offset (explode — the scalable shape; frames of one video can
    * then scatter across tasks). */
  def frameSample(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("meta.duration_ms") > 0)
      .select(col("doc_id"), col("meta"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs)))
          .as("frame_ms"))
      .select(col("doc_id"), col("frame_ms"),
        floor(col("frame_ms").cast(DoubleType) /
          greatest(col("meta.duration_ms"), lit(1L)) * 100.0)
          .cast(IntegerType).as("pct"))

  /** ======== STUB ======== Audio feature extraction: the payload is read
    * as an 8-bit sample stream (a real impl would decode PCM via a codec),
    * chunked into fixed-size windows, and per-chunk loudness features
    * (RMS, peak) are computed — one output row per chunk, so the chunks of
    * one long recording scatter across tasks downstream. Integer
    * accumulation keeps the result bit-reproducible across engines. */
  def audioChunkFeatures(media: DataFrame, samplesPerChunk: Int = 256,
                         idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("chunk", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      // per-partition decoder/resampler init would go here (STUB: none)
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val nChunks = (bytes.length + samplesPerChunk - 1) / samplesPerChunk
          (0 until nChunks).iterator.map { c =>
            val from = c * samplesPerChunk
            val until = math.min(from + samplesPerChunk, bytes.length)
            var sumSq = 0L; var peak = 0
            var i = from
            while (i < until) {
              val b = bytes(i) & 0xFF
              sumSq += b.toLong * b; if (b > peak) peak = b
              i += 1
            }
            val n = until - from
            Row(id, c, n, math.sqrt(sumSq.toDouble / n), peak)
          }
        }
      }
    }(enc)
  }

  /** ViT-style patch grid: one output row per (px, py) patch of each
    * image's metadata dimensions (partial edge patches dropped, like ViT).
    * Pixel slicing itself would live in the decode stage (STUB); the grid
    * explode is the scale-relevant plumbing — patches of one image fan
    * out across tasks downstream. */
  def patchGrid(media: DataFrame, patch: Int, idCol: String = "doc_id"): DataFrame =
    media
      .withColumn("nx", expr(s"meta.width div $patch"))
      .withColumn("ny", expr(s"meta.height div $patch"))
      .filter(col("nx") > 0 && col("ny") > 0)
      .select(col(idCol), col("nx"),
        explode(sequence(lit(0L), col("nx").cast("long") * col("ny") - 1)).as("p"))
      .select(col(idCol),
        (col("p") % col("nx")).cast(IntegerType).as("px"),
        expr("p div nx").cast(IntegerType).as("py"),
        ((col("p") % col("nx")) * patch).cast(IntegerType).as("x0"),
        (expr("p div nx") * patch).cast(IntegerType).as("y0"))

  /** Re-bucket by cumulative payload size: `targetBytes` per partition.
    * Media tables are size-skewed; row-count partitioning starves tasks. */
  def repartitionBySize(media: DataFrame, targetBytes: Long): DataFrame = {
    val spark = media.sparkSession
    val totalBytes = media.agg(sum(octet_length(col("media")))).head.getLong(0)
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts, col("doc_id"))
  }
}

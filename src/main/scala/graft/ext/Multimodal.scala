package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * Decode is REAL for every format a stock JVM can parse:
  * [[Codecs.decodeWav]] (RIFF/WAVE PCM) feeds [[audioChunkFeatures]];
  * [[Codecs.decodeImage]] feeds [[imageFeatures]] / [[resizeImage]] /
  * [[patchPixelFeatures]] — uncompressed 24-bit BMP through the
  * oracle-exact byte parser, JPEG/PNG/GIF/TIFF through the JDK's own
  * `javax.imageio` (pure Java, headless, no native libraries). Formats
  * with no JVM decoder (webp, compressed audio) stay opaque:
  * [[byteStats]] covers them honestly — byte statistics only, no decode
  * claim.
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

  /** Byte-level statistics for OPAQUE payloads (formats with no JVM
    * decoder — webp, compressed audio): byte count, mean/min/max byte
    * value. No decode claim; a native codec would slot into the same
    * mapPartitions shape with per-partition init. */
  private[ext] def byteStats(bytes: Array[Byte]): (Long, Double, Int, Int) = {
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

  /** Byte-stats pass over the media column for opaque formats. Runs as one
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
      rows.map { r =>
        val (n, mean, mn, mx) = byteStats(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), r.getStruct(metaIdx).getString(0), n, mean, mn, mx)
      }
    }(enc)
  }

  /** Permissive decode — the §1.3 error contract applied to media: a
    * payload that fails its codec yields `ok = false` + a coarse reason
    * instead of killing the job. At crawl scale corrupt media is routine
    * (truncated downloads, mislabeled content types), so a fail-fast
    * decode over 100 TB would abort on the first bad row of billions;
    * this is the quarantine path — downstream splits on `ok` to route
    * failures to a dead-letter sink. Same mapPartitions shape as the
    * strict decodes; the try/catch is per-row so one bad payload cannot
    * poison its partition. The reason is a STABLE class ("undecodable"),
    * not an exception message, so oracles and dedup-on-reason stay
    * engine-portable. */
  def imageFeaturesPermissive(media: DataFrame,
                              idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("ok", BooleanType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("reason", StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        try {
          val img = Codecs.decodeImage(r.getAs[Array[Byte]](mIdx))
          Row(id, true, img.width, img.height,
            img.width.toLong * img.height, null)
        } catch { case scala.util.control.NonFatal(_) =>
          Row(id, false, null, null, null, "undecodable")
        }
      }
    }(enc)
  }

  // ------------------------------------------------ real-codec tables

  /** Synthesize a REAL RIFF/WAVE PCM16 payload per document — a valid
    * file [[Codecs.decodeWav]] round-trips exactly. Sample values follow
    * a closed-form integer formula so an oracle can recompute the decoded
    * features without a decoder:
    * `n = 200 + doc_id % 400`, `s_i = (doc_id*31 + i*17) % 4001 - 2000`,
    * `rate = 8000 + (doc_id % 4) * 4000`, mono. */
  def wavTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    // id-only projection + repartition: prune the scan, then spread the
    // 8-byte ids so the per-row synthesis parallelizes even off a
    // single-row-group source (see gridMediaTable)
    docs.select(col(idCol)).repartition(col(idCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (200 + id % 400).toInt
        val samples = Array.tabulate(n) { i =>
          ((id * 31 + i * 17) % 4001 - 2000).toShort
        }
        val rate = (8000 + (id % 4) * 4000).toInt
        Row(id, Codecs.encodeWavPcm16(samples, rate))
      }
    }(enc)
  }

  /** [[wavTable]]'s NOISE twin — hash-valued samples instead of the
    * arithmetic-progression sweep, for the same reason [[noiseBmpTable]]
    * exists: the sweep's per-frame energies vary smoothly and correlate
    * ACROSS ids (measured: 6000 ids → 4672 distinct energy fingerprints,
    * 42k spurious hamming ≤ 3 id pairs — superlinear), which would make
    * "near-dup" audio pairs quadratic in the corpus. Hash samples give
    * each id an effectively unique energy envelope the way real
    * recordings have. Same closed-form-in-id contract (the xor-shift
    * affine hash is plain int64 arithmetic any SQL engine replays):
    * `n = 200 + id % 400`, `k_i = id*1024 + i`,
    * `h = ((k_i % M) * MulA + seed) % M * MulB % M`,
    * `s_i = (h ^ (h >> 13)) % 4001 - 2000`, rate 8000, mono. */
  def noiseWavTable(docs: DataFrame, idCol: String = "doc_id",
                    seed: Long = 7L): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    docs.select(col(idCol)).repartition(col(idCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (200 + id % 400).toInt
        val m = Sharding.HashMod
        val samples = Array.tabulate(n) { i =>
          val k = id * 1024 + i
          val h2 =
            ((k % m) * Sharding.HashMulA + seed) % m * Sharding.HashMulB % m
          (((h2 ^ (h2 >> 13)) % 4001) - 2000).toShort
        }
        Row(id, Codecs.encodeWavPcm16(samples, 8000))
      }
    }(enc)
  }

  /** Synthesize a REAL uncompressed 24-bit BMP payload per document
    * (bottom-up rows, 4-byte padding — the real layout). Pixel channels
    * follow closed-form formulas for oracle recomputation:
    * `w = 4 + doc_id % 12`, `h = 4 + doc_id % 7`,
    * `r = (doc_id + 3x + 7y) % 256`, `g = (doc_id*2 + 5x + y) % 256`,
    * `b = (doc_id + x*y) % 256`. */
  def bmpTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridImageTable(docs, idCol, Codecs.encodeBmp24)

  /** The shared closed-form pixel grid behind [[bmpTable]] / [[pngTable]]
    * / [[jpegTable]] — one formula, three container formats, so the same
    * oracle arithmetic checks whichever encoder produced the payload. */
  private def gridPixel(id: Long): (Int, Int) => Int = (x: Int, y: Int) => {
    val rr = ((id + 3 * x + 7 * y) % 256).toInt
    val gg = ((id * 2 + 5 * x + y) % 256).toInt
    val bb = ((id + x.toLong * y) % 256).toInt
    (rr << 16) | (gg << 8) | bb
  }

  /** One synthesized payload per document from the shared (id, w, h)
    * derivation — the single place the grid dimensions formula lives, so
    * the image tables and the video table cannot drift apart from the
    * oracle SQL that assumes they match. */
  private def gridMediaTable(docs: DataFrame, idCol: String,
                             make: (Long, Int, Int) => Array[Byte]): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    // the synthesis is a pure function of the id: project BEFORE the
    // opaque mapPartitions so the scan prunes to one column instead of
    // deserializing the (large) text of every document row. Then
    // REPARTITION the pruned 8-byte ids before the encode: the per-row
    // work downstream (JPEG/PNG encode, container mux, frame decode) is
    // the CPU-bound part, and a source that arrives as one parquet row
    // group would otherwise pin the whole pipeline to a single task —
    // the same spread-before-per-row-media-work rule as
    // [[repartitionBySize]], bought here for an id-column-only shuffle.
    docs.select(col(idCol)).repartition(col(idCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, make(id, (4 + id % 12).toInt, (4 + id % 7).toInt))
      }
    }(enc)
  }

  private def gridImageTable(docs: DataFrame, idCol: String,
                             encode: (Int, Int, (Int, Int) => Int) => Array[Byte])
      : DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) => encode(w, h, gridPixel(id)))

  /** Synthesize REAL PNG payloads ([[Codecs.encodePng]], the JDK encoder)
    * over [[bmpTable]]'s closed-form pixel grid — PNG is lossless, so the
    * decoded features are bit-exact against the same oracle formulas. */
  def pngTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridImageTable(docs, idCol, Codecs.encodePng)

  /** Synthesize REAL baseline-JPEG payloads ([[Codecs.encodeJpeg]]) over
    * the same grid. JPEG is lossy: dimensions and pixel COUNTS survive
    * the round-trip exactly, channel values only approximately — oracle
    * checks stick to the lossless properties. */
  def jpegTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridImageTable(docs, idCol, Codecs.encodeJpeg)

  /** Synthesize REAL AVI videos: a valid RIFF/`AVI ` container
    * ([[Codecs.encodeAvi]] — avih/strh/strf headers, movi frame chunks)
    * with `1 + doc_id % 5` raw-DIB frames at 25 fps (40 ms/frame), frame
    * `f`'s pixels following the shared closed-form grid seeded with
    * `doc_id + f` — so an oracle recomputes every sampled frame's decoded
    * features without a decoder. */
  def aviTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) => {
      val frames = Array.tabulate((1 + id % 5).toInt)(f =>
        Codecs.encodeDib24(w, h, gridPixel(id + f)))
      Codecs.encodeAvi(w, h, usecPerFrame = 40000,
        fourcc = "DIB ", frames = frames.toSeq)
    })

  /** Synthesize REAL MOTION-JPEG AVIs: the same RIFF container as
    * [[aviTable]] but with `MJPG` streams whose frames are whole
    * baseline JPEGs over the shared grid (`doc_id + f` seed) — the
    * per-frame-compressed layout webcams and capture cards ship.
    * JPEG frames are lossy, so the oracle-checkable surface is the
    * lossless properties (frame schedule, dimensions, pixel counts) —
    * same contract as [[mp4Table]]. */
  def aviMjpgTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) => {
      val frames = Array.tabulate((1 + id % 5).toInt)(f =>
        Codecs.encodeJpeg(w, h, gridPixel(id + f)))
      Codecs.encodeAvi(w, h, usecPerFrame = 40000,
        fourcc = "MJPG", frames = frames.toSeq)
    })

  /** Synthesize REAL TIFF payloads ([[Codecs.encodeTiff]], the JDK's
    * bundled TIFF plugin) over the same closed-form grid — TIFF is
    * lossless RGB, so the SAME oracle as BMP/PNG checks it. */
  def tiffTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridImageTable(docs, idCol, Codecs.encodeTiff)

  /** Synthesize REAL GIF payloads ([[Codecs.encodeGifGray]]) — GIF's
    * palette limit makes arbitrary RGB lossy, so the grid is the GRAY
    * projection of the shared formula's red channel: every decoded
    * channel equals `(doc_id + 3x + 7y) % 256` exactly. */
  def gifTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) =>
      Codecs.encodeGifGray(w, h,
        (x, y) => ((id + 3 * x + 7 * y) % 256).toInt))

  /** Synthesize REAL MP4 videos: a valid ISO-BMFF container
    * ([[Codecs.encodeMp4]] — ftyp/mdat/moov with a full stbl sample
    * table) whose samples are whole baseline JPEGs over the shared grid
    * seeded with `doc_id + f`, `1 + doc_id % 5` frames at 25 fps. JPEG
    * samples are lossy, so the oracle-checkable surface is the lossless
    * properties (sample schedule, dimensions, pixel counts) — same
    * contract as [[jpegTable]]. */
  def mp4Table(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) => {
      val frames = Array.tabulate((1 + id % 5).toInt)(f =>
        Codecs.encodeJpeg(w, h, gridPixel(id + f)))
      Codecs.encodeMp4(w, h, timescale = 1000, sampleDelta = 40,
        fourcc = "jpeg", samples = frames.toSeq)
    })

  /** Synthesize FRAGMENTED (DASH-style) MP4s: same frame content and
    * timing as [[mp4Table]], but muxed as `ftyp`/`moov`(+`mvex`) followed
    * by `moof`+`mdat` segment pairs of 2 samples each
    * ([[Codecs.encodeFmp4]]) — the layout crawl video overwhelmingly
    * ships in. The decode surface (sample schedule, dimensions, pixel
    * counts) is identical, so the same closed-form oracle applies. */
  def fmp4Table(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) => {
      val frames = Array.tabulate((1 + id % 5).toInt)(f =>
        Codecs.encodeJpeg(w, h, gridPixel(id + f)))
      Codecs.encodeFmp4(w, h, timescale = 1000, sampleDelta = 40,
        fourcc = "jpeg", samples = frames.toSeq, samplesPerFragment = 2)
    })

  /** Synthesize REAL WebM headers ([[Codecs.encodeWebm]] — EBML walk,
    * DocType webm, one VP9 video track) over the shared grid dimensions,
    * duration matching [[mp4Table]]'s frame schedule. VP9 payloads have
    * no JVM decoder, so frames stay honestly opaque; the oracle surface
    * is the container metadata. */
  def webmTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    gridMediaTable(docs, idCol, (id, w, h) =>
      Codecs.encodeWebm(w, h, durationMs = (1 + id % 5) * 40))

  /** Synthesize REAL MPEG-1 Layer III (MP3) streams: valid frame headers
    * with tabulated sizes ([[Codecs.encodeMp3Cbr]]), deterministic filler
    * payloads. Rate/bitrate/length are closed-form in doc_id:
    * `rate = [44100,48000,32000][id%3]`, `kbps = [96,128,192,320][id%4]`,
    * `frames = 5 + id%20`. */
  def mp3Table(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val rates = Array(44100, 48000, 32000)
    val kbps = Array(96, 128, 192, 320)
    // id-only projection: prune the scan before the opaque mapPartitions
    docs.select(col(idCol)).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, Codecs.encodeMp3Cbr(rates((id % 3).toInt),
          kbps((id % 4).toInt), (5 + id % 20).toInt, seed = id))
      }
    }(enc)
  }

  /** REAL MP3 metadata extraction: the frame-header walk
    * ([[Codecs.decodeMp3Meta]]) yields sample rate, frame count, exact
    * duration and mean bitrate — audio samples stay honestly opaque (no
    * pure-JVM MP3 decoder). Pure per-row projection, no shuffle. */
  def mp3Meta(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("mean_kbps", DoubleType),
      StructField("vbr", BooleanType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = Codecs.decodeMp3Meta(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), m.sampleRate, m.nFrames, m.durationMs,
          m.meanBitrateKbps, m.vbr)
      }
    }(enc)
  }

  /** REAL WebM/Matroska metadata extraction: the EBML tree walk
    * ([[Codecs.decodeWebmMeta]]) yields the video track's codec id,
    * exact pixel dimensions, and the Info duration — the full honest
    * surface for a container whose frame payloads (VP8/VP9/AV1) have no
    * pure-JVM decoder. Pure per-row projection: no shuffle, columns
    * pruned to (id, media) at the scan. */
  def webmMeta(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("codec", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = Codecs.decodeWebmMeta(r.getAs[Array[Byte]](mIdx))
        Row(r.getLong(idIdx), m.codecId, m.width, m.height, m.durationMs)
      }
    }(enc)
  }

  /** REAL sampled-frame video decode: parse each container — RIFF/AVI or
    * ISO-BMFF/MP4, dispatched on the magic bytes — pick the frame under
    * every `everyMs` timestamp (0, everyMs, … < duration), decode ONLY
    * those frames ([[Codecs.decodeVideoFrame]] / [[Codecs.decodeMp4Frame]]
    * — raw DIB via the byte kernel, JPEG-family samples via ImageIO),
    * and reduce each to channel sums. One output row per sampled frame —
    * frames of one video scatter across tasks downstream, and unsampled
    * frames never pay a decode (the AVI walk is chunk-offset arithmetic;
    * the MP4 `stbl` walk never slices unsampled `mdat` ranges). */
  def videoFrameFeatures(media: DataFrame, everyMs: Long,
                         idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_ms", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val id = r.getLong(idIdx)
          // container dispatch: RIFF magic → AVI; anything else → MP4
          // (decodeMp4 validates ftyp/moov and fails loudly otherwise)
          val isAvi = bytes.length >= 4 && bytes(0) == 'R'.toByte &&
            bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte &&
            bytes(3) == 'F'.toByte
          val (periodMs, nFrames, decode) =
            if (isAvi) {
              val video = Codecs.decodeAvi(bytes)
              (math.max(video.usecPerFrame / 1000L, 1L),
                video.frames.length,
                (fi: Int) => Codecs.decodeVideoFrame(video, fi))
            } else {
              val video = Codecs.decodeMp4(bytes)
              (video.msPerFrame, video.numSamples,
                (fi: Int) => Codecs.decodeMp4Frame(video, fi))
            }
          val durationMs = nFrames * periodMs
          Iterator.range(0L, durationMs, everyMs).map { t =>
            val fi = (t / periodMs).toInt
            val img = decode(fi)
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < img.rgb.length) {
              val p = img.rgb(i)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              i += 1
            }
            Row(id, fi, t, img.width, img.height,
              img.rgb.length.toLong, sr, sg, sb)
          }
        }
      }
    }(enc)
  }

  /** Synthesize REAL gzip payloads from the documents fixture (utf-8
    * text, gzip-compressed) — the compressed-ingestion shape web-crawl
    * corpora arrive in. */
  def gzipTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex(idCol)
    val tIdx = docs.schema.fieldIndex("text")
    docs.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(idIdx), Codecs.gzip(r.getString(tIdx).getBytes("UTF-8")))
      }
    }(enc)
  }

  /** REAL compressed-text ingestion: gunzip each payload (multi-member
    * aware) and surface the decoded text as a column, so every downstream
    * text operator (tokenize, quality, dedup) composes unchanged — the
    * oracle recomputes from the original plaintext, closing the
    * compress→decompress loop end-to-end. NULL/empty payloads are missing
    * data (skipped); corrupt streams fail loudly. */
  def textFromGzip(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("text", StringType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else Iterator.single(
          Row(r.getLong(idIdx), new String(Codecs.gunzip(bytes), "UTF-8")))
      }
    }(enc)
  }

  /** REAL image decode + feature extraction: parses each payload via
    * [[Codecs.decodeImage]] (BMP through the byte parser; JPEG/PNG/GIF/
    * TIFF through `javax.imageio`) and reduces the pixel grid to
    * per-channel sums. One mapPartitions pass; decoder state is
    * per-task. */
  def imageFeatures(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_pixels", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      // NULL / empty payloads are MISSING data, not malformed media: they
      // yield no feature row. Anything long enough to carry a header is
      // decoded and fails loudly if malformed (the codec contract).
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else Iterator.single {
        val img = Codecs.decodeImage(bytes)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.rgb.length) {
          val p = img.rgb(i)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          i += 1
        }
        Row(r.getLong(idIdx), img.width, img.height,
          img.rgb.length.toLong, sr, sg, sb)
        }
      }
    }(enc)
  }

  /** Synthesize 16×16 grayscale-NOISE BMPs: every pixel's gray level is
    * the engine's two-stage modular hash of (id·256 + y·16 + x) — so,
    * unlike the smooth [[bmpTable]] ramps (whose tiny gradients collapse
    * into a handful of distinct dHashes), each id's image has an
    * effectively unique perceptual fingerprint, the way real photos do.
    * The pixel formula is closed-form, so a SQL oracle recomputes any
    * derived hash bit-exactly. The dedup driver query builds its
    * duplicate clusters on THIS table. */
  def noiseBmpTable(docs: DataFrame, idCol: String = "doc_id",
                    seed: Long = 7L): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType), StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = docs.schema.fieldIndex(idCol)
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(idIdx)
        def gray(x: Int, y: Int): Int = {
          val k = id * 256 + y * 16 + x
          val m = Sharding.HashMod
          val h2 =
            ((k % m) * Sharding.HashMulA + seed) % m * Sharding.HashMulB % m
          // xor-shift mix: the affine hash's CONSECUTIVE-key differences
          // share structure across ids (affine composed with affine is
          // affine), which made every image's gradient-sign pattern —
          // the dHash — nearly identical; folding high bits in
          // nonlinearly decorrelates neighboring pixels
          ((h2 ^ (h2 >> 13)) % 256).toInt
        }
        Row(id, Codecs.encodeBmp24(16, 16, (x, y) => {
          val g = gray(x, y); (g << 16) | (g << 8) | g
        }))
      }
    }(enc)
  }

  /** Perceptual difference hash (dHash, 64-bit) per image — the standard
    * near-duplicate image fingerprint of large-scale multimodal dedup: a
    * re-encoded, resized or slightly-recompressed copy keeps (almost)
    * the same hash, so hamming-near pairs are duplicate candidates.
    * Decode ([[Codecs.decodeImage]]), grayscale (integer (r+g+b) div 3),
    * nearest-neighbor resample to a 9×8 grid with the SAME floor source
    * mapping as [[resizeImage]] (`x·w div 9`, `y·h div 8` — closed-form
    * for the synthetic grids, so the oracle recomputes every bit), then
    * bit (y·8+x) = 1 iff gray(x+1, y) > gray(x, y). One mapPartitions
    * decode pass; NULL/empty payloads yield no row (missing data, same
    * contract as [[imageFeatures]]). Output: (idCol, dhash LONG). */
  def imageDhash(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("dhash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else Iterator.single {
          val img = Codecs.decodeImage(bytes)
          def gray(x9: Int, y8: Int): Int = {
            val p = img.rgb(
              (y8 * img.height / 8) * img.width + (x9 * img.width / 9))
            (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
          }
          var h = 0L
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              if (gray(x + 1, y) > gray(x, y)) h |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          Row(r.getLong(idIdx), h)
        }
      }
    }(enc)
  }

  /** REAL image resize: decode ([[Codecs.decodeImage]] — BMP byte parser
    * or `javax.imageio` by magic) → nearest-neighbor resample into the
    * aspect-preserving `maxW`×`maxH` box (never upscaled) → re-encode in
    * the source's format family (BMP stays BMP; ImageIO formats re-encode
    * as lossless PNG, the archival choice — resampled JPEG pixels are
    * already approximations and a second lossy pass would compound).
    * The source pixel for output (x, y) is `(x·w0 div w1, y·h0 div h1)` —
    * integer floor mapping, so an oracle recomputes the resampled grid
    * without a decoder (bit-exact for BMP/PNG sources). One mapPartitions
    * pass, codec state per task. */
  def resizeImage(media: DataFrame, maxW: Int, maxH: Int,
                  idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("media", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else Iterator.single {
        val img = Codecs.decodeImage(bytes)
        val scale = math.min(
          math.min(maxW.toDouble / img.width, maxH.toDouble / img.height), 1.0)
        val w1 = math.max(math.floor(img.width * scale).toInt, 1)
        val h1 = math.max(math.floor(img.height * scale).toInt, 1)
        val px = (x: Int, y: Int) =>
          img.rgb((y * img.height / h1) * img.width + (x * img.width / w1))
        val out =
          if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
            Codecs.encodeBmp24(w1, h1, px)
          else Codecs.encodePng(w1, h1, px)
        Row(r.getLong(idIdx), out)
        }
      }
    }(enc)
  }

  /** BMP-specific alias of [[resizeImage]], kept for the oracle-exact BMP
    * pipeline's name stability. */
  def resizeBmp(media: DataFrame, maxW: Int, maxH: Int,
                idCol: String = "doc_id"): DataFrame =
    resizeImage(media, maxW, maxH, idCol)

  /** REAL per-patch pixel features: decode each BMP, cut the ViT-style
    * `patch`×`patch` grid (partial edge patches dropped, like
    * [[patchGrid]]), and reduce every patch to exact integer channel sums
    * — one output row per patch, so patches of one image scatter across
    * tasks downstream. The metadata-only grid ([[patchGrid]]) stays the
    * planner's cheap path; this is the decode path. */
  def patchPixelFeatures(media: DataFrame, patch: Int,
                         idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("px", IntegerType),
      StructField("py", IntegerType),
      StructField("n_px", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
        val img = Codecs.decodeImage(bytes)
        val nx = img.width / patch; val ny = img.height / patch
        for { py <- (0 until ny).iterator; px <- (0 until nx).iterator } yield {
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = py * patch
          while (y < (py + 1) * patch) {
            var x = px * patch
            while (x < (px + 1) * patch) {
              val p = img.rgb(y * img.width + x)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              x += 1
            }
            y += 1
          }
          Row(id, px, py, patch * patch, sr, sg, sb)
        }
        }
      }
    }(enc)
  }

  /** Metadata-level resize for OPAQUE payloads (no JVM decoder):
    * recomputes metadata to the target box (aspect-preserving) and
    * truncates the payload proportionally — the plumbing contract for
    * formats whose real resample lives behind a native codec (the BMP
    * path above is the real one). */
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

  /** REAL audio feature extraction: each payload is parsed as a RIFF/WAVE
    * PCM file ([[Codecs.decodeWav]] — chunk walk, fmt validation, 8/16-bit
    * samples), the decoded sample stream is chunked into fixed-size
    * windows, and per-chunk loudness features (RMS over signed samples,
    * peak) are computed — one output row per chunk, so the chunks of one
    * long recording scatter across tasks downstream. Integer accumulation
    * + IEEE sqrt keep the result bit-reproducible across engines. */
  def audioChunkFeatures(media: DataFrame, samplesPerChunk: Int = 256,
                         idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("sample_rate", IntegerType),
      StructField("chunk", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (pure-JVM: none needed)
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
        val wav = Codecs.decodeWav(bytes)
        val s = wav.samples
        if (s.isEmpty) Iterator.empty
        else {
          val nChunks = (s.length + samplesPerChunk - 1) / samplesPerChunk
          (0 until nChunks).iterator.map { c =>
            val from = c * samplesPerChunk
            val until = math.min(from + samplesPerChunk, s.length)
            var sumSq = 0L; var peak = Int.MinValue
            var i = from
            while (i < until) {
              val v = s(i)
              sumSq += v.toLong * v; if (v > peak) peak = v
              i += 1
            }
            val n = until - from
            Row(id, wav.sampleRate, c, n, math.sqrt(sumSq.toDouble / n), peak)
          }
        }
        }
      }
    }(enc)
  }

  /** 64-bit audio ENERGY fingerprint — the dHash idea applied to sound
    * (a simplified chromaprint): decode, split the sample run into 65
    * near-equal frames (sample i → frame (i·65) div n), per-frame energy
    * = Σ sᵢ² in EXACT integer arithmetic, bit f = E(f+1) > E(f). The
    * temporal energy envelope survives re-encoding and resampling-free
    * rate relabeling, so hamming-near fingerprints are duplicate
    * candidates ([[graft.ext.Dedup.hammingPairs]] composes directly);
    * sample-rate-INVARIANT by construction (the rate never enters).
    * Exact integers end to end → bit-reproducible in a SQL oracle.
    * Output: (idCol, afp LONG); empty/NULL payloads yield no row. */
  def audioFingerprint(media: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("afp", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idIdx = media.schema.fieldIndex(idCol)
    val mIdx = media.schema.fieldIndex("media")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](mIdx)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val s = Codecs.decodeWav(bytes).samples
          if (s.isEmpty) Iterator.empty
          else Iterator.single {
            val e = new Array[Long](65)
            var i = 0
            while (i < s.length) {
              val v = s(i).toLong
              e((i.toLong * 65 / s.length).toInt) += v * v
              i += 1
            }
            var h = 0L
            var f = 0
            while (f < 64) {
              if (e(f + 1) > e(f)) h |= 1L << f
              f += 1
            }
            Row(r.getLong(idIdx), h)
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
    * Media tables are size-skewed; row-count partitioning starves tasks.
    *
    * Sizing comes from Catalyst's own plan statistics (`stats.sizeInBytes`
    * — file-size metadata for scans, propagated through operators), NOT a
    * data pass: the previous `agg(sum(octet_length))` read every payload
    * byte just to pick a partition count, a full extra scan at 100 TB.
    * For scans the statistic is the ON-DISK (compressed) size — when the
    * downstream holds DECODED payloads, pass the expected decode ratio as
    * `expansion` (e.g. ~5-10x for snappy-compressed WAV/text) so tasks
    * are sized for what they will actually hold. */
  def repartitionBySize(media: DataFrame, targetBytes: Long,
                        expansion: Double = 1.0): DataFrame = {
    val est = media.queryExecution.optimizedPlan.stats.sizeInBytes
    val scaled = (BigDecimal(est) * expansion).toBigInt
    val parts = (scaled / targetBytes).min(BigInt(1 << 20)).max(1).toInt
    media.repartition(parts, col("doc_id"))
  }
}

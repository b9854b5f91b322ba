package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Multimodal
import graft.streaming.{Sessionize, Windows}
import Oracle._

/** Driver-checked queries for event-time windowing (tumbling / sliding /
  * session — identical plans run under Structured Streaming, see
  * StreamSpec) and for the multimodal-column plumbing. */
object StreamQueries {

  private def aggs = Seq(count(lit(1)).as("n"), dsum(col("value")).as("total"))

  def qTumbling(s: SparkSession, dir: String): DataFrame =
    Windows.tumbling(Tables.events(s, dir), "ts", "5 minutes",
      Seq("event_type"), aggs)

  val qTumblingSql: String =
    s"""SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) AS w_start,
       |time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP) + INTERVAL 5 MINUTE AS w_end,
       |event_type, count(*) AS n, ${sqlSum("value")} AS total
       |FROM events GROUP BY 1, 2, 3""".stripMargin

  def qSliding(s: SparkSession, dir: String): DataFrame =
    Windows.sliding(Tables.events(s, dir), "ts", "10 minutes", "5 minutes",
      Seq("event_type"), aggs)

  val qSlidingSql: String =
    s"""SELECT time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP)
       |  - (off.k * INTERVAL 5 MINUTE) AS w_start,
       |time_bucket(INTERVAL '5 minutes', ts::TIMESTAMP)
       |  - (off.k * INTERVAL 5 MINUTE) + INTERVAL 10 MINUTE AS w_end,
       |event_type, count(*) AS n, ${sqlSum("value")} AS total
       |FROM events CROSS JOIN (VALUES (0), (1)) AS off(k)
       |GROUP BY 1, 2, 3""".stripMargin

  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    Windows.session(Tables.events(s, dir), "ts", "10 minutes",
      Seq("user_id"), aggs)

  val qSessionWindowSql: String =
    s"""WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts, value FROM events),
       |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS p FROM e),
       |f AS (SELECT *, CASE WHEN p IS NULL OR ts - p >= INTERVAL 10 MINUTE
       |                     THEN 1 ELSE 0 END AS brk FROM l),
       |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
       |        ROWS UNBOUNDED PRECEDING) AS sid FROM f)
       |SELECT min(ts) AS s_start, max(ts) + INTERVAL 10 MINUTE AS s_end,
       |user_id, count(*) AS n, ${sqlSum("value")} AS total
       |FROM g GROUP BY user_id, sid""".stripMargin

  /** Custom keyed state (flatMapGroupsWithState) sessionization — batch
    * twin; the streaming path is exercised in StreamSpec. */
  def qSessionizeCustom(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value")).as[Sessionize.Event]
    Sessionize.sessionsBatch(ev, gapMs = 10 * 60 * 1000)
      .select(col("user_id"), col("s_start"), col("s_end"), col("n"))
  }

  val qSessionizeCustomSql: String =
    """WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
      |l AS (SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS p FROM e),
      |f AS (SELECT *, CASE WHEN p IS NULL OR ts - p >= INTERVAL 10 MINUTE
      |                     THEN 1 ELSE 0 END AS brk FROM l),
      |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |        ROWS UNBOUNDED PRECEDING) AS sid FROM f)
      |SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 10 MINUTE AS s_end,
      |count(*) AS n
      |FROM g GROUP BY user_id, sid""".stripMargin

  /** Stream-stream interval join, batch twin (the identical plan runs as a
    * watermarked streaming self-join in StreamSpec): each view matched to
    * the same user's purchases within 30 minutes. */
  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("amount"))
    graft.streaming.StreamJoins.intervalJoin(
        v, p, "v_user", "p_user", "v_ts", "p_ts", "30 minutes")
      .select(col("view_id"), col("purchase_id"), col("v_user").as("user_id"),
        col("amount"))
  }

  val qIntervalJoinSql: String =
    """SELECT v.event_id AS view_id, p.event_id AS purchase_id,
      |v.user_id, p.value AS amount
      |FROM events v JOIN events p ON v.user_id = p.user_id
      | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
      |WHERE v.event_type = 'view' AND p.event_type = 'purchase'""".stripMargin

  /** CDC compaction: keep each key's LATEST record (ties broken by
    * event_id) — the keep-last twin of exact dedup's keep-first, and the
    * read-side of a log-compacted changelog. */
  def qCompact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
  }

  val qCompactSql: String =
    """SELECT user_id, event_id, ts::TIMESTAMP AS ts, event_type FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1""".stripMargin

  /** SCD2 history build: each change event becomes a version row with a
    * [valid_from, valid_to) interval; the current version is open
    * (valid_to NULL). */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"),
        (lead(col("ts"), 1).over(w).isNull).as("is_current"))
  }

  val qScd2Sql: String =
    """SELECT user_id, event_id, event_type,
      |ts::TIMESTAMP AS valid_from,
      |lead(ts::TIMESTAMP, 1) OVER w AS valid_to,
      |lead(ts, 1) OVER w IS NULL AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin

  // ------------------------------------------------------- multimodal

  /** REAL image decode: synthesize a valid 24-bit BMP per document
    * (bottom-up rows, 4-byte padding), parse it back with the pure-JVM
    * codec, reduce pixels to channel sums. The oracle recomputes the
    * features from the closed-form pixel formulas — matching proves the
    * encode→parse→extract roundtrip is byte-exact. */
  def qMultimodalDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(Multimodal.bmpTable(Tables(s, dir, "documents")))

  val qMultimodalDecodeSql: String =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 12 AS w, 4 + doc_id % 7 AS h
      |  FROM documents)
      |SELECT doc_id, w::INT AS width, h::INT AS height,
      |  (w * h)::BIGINT AS n_pixels,
      |  CAST(sum((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id * 2 + 5 * x + y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_b
      |FROM d, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y)
      |GROUP BY doc_id, w, h""".stripMargin

  /** REAL PNG decode via the JDK's `javax.imageio`: synthesize a valid
    * PNG per document over the same closed-form pixel grid as
    * [[qMultimodalDecode]], decode it back, reduce to channel sums. PNG
    * is lossless, so the oracle is the SAME arithmetic as the BMP query —
    * matching proves the ImageIO encode→decode→extract loop is bit-exact
    * on the dominant lossless crawl format. */
  def qMultimodalPng(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(Multimodal.pngTable(Tables(s, dir, "documents")))

  val qMultimodalPngSql: String = qMultimodalDecodeSql

  /** REAL JPEG decode via `javax.imageio`: synthesize a valid baseline
    * JPEG per document, decode it back. JPEG is LOSSY — channel sums are
    * approximations — so the checked columns are the properties the
    * round-trip preserves exactly: dimensions and pixel count. (The
    * decode itself is as real as the PNG path; only the oracle-checkable
    * surface shrinks with the format's information loss.) */
  def qMultimodalJpeg(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(Multimodal.jpegTable(Tables(s, dir, "documents")))
      .select(col("doc_id"), col("width"), col("height"), col("n_pixels"))

  val qMultimodalJpegSql: String =
    """SELECT doc_id, (4 + doc_id % 12)::INT AS width,
      |  (4 + doc_id % 7)::INT AS height,
      |  ((4 + doc_id % 12) * (4 + doc_id % 7))::BIGINT AS n_pixels
      |FROM documents""".stripMargin

  /** REAL resize over PNG payloads: ImageIO decode → nearest-neighbor
    * resample → lossless PNG re-encode → decode again for features. Same
    * integer source-pixel mapping as the BMP resize, so the SAME oracle
    * checks it — proving [[Multimodal.resizeImage]] is pixel-exact across
    * both decoder families. */
  def qMultimodalResizePng(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(
      Multimodal.resizeImage(Multimodal.pngTable(Tables(s, dir, "documents")), 8, 8))

  /** REAL video decode: synthesize a valid AVI per document (RIFF chunk
    * walk — avih/strh/strf headers, movi frame list) holding raw-DIB
    * frames whose pixels follow the closed-form grid seeded with
    * `doc_id + frame`, then sample a frame every 80 ms (25 fps source →
    * every 2nd frame) and decode ONLY the sampled frames to channel
    * sums. The oracle recomputes the sampled indices and per-frame sums
    * arithmetically — matching proves the container walk, the frame
    * sampling arithmetic, and the per-frame DIB decode are all exact. */
  def qMultimodalVideo(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameFeatures(
      Multimodal.aviTable(Tables(s, dir, "documents")), everyMs = 80)

  val qMultimodalVideoSql: String =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 12 AS w, 4 + doc_id % 7 AS h,
      |  1 + doc_id % 5 AS nf FROM documents),
      |f AS (SELECT doc_id, w, h, t AS frame_ms, t // 40 AS fi
      |  FROM d, UNNEST(range(0, nf * 40, 80)) AS tt(t)),
      |px AS (SELECT doc_id, frame_ms, fi, w, h, x, y
      |  FROM f, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y))
      |SELECT doc_id, fi::INT AS frame_idx, frame_ms::BIGINT AS frame_ms,
      |  w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels,
      |  CAST(sum((doc_id + fi + 3 * x + 7 * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum(((doc_id + fi) * 2 + 5 * x + y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + fi + x * y) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY doc_id, frame_ms, fi, w, h""".stripMargin

  /** REAL Motion-JPEG AVI decode: the same RIFF walk as
    * [[qMultimodalVideo]] but with `MJPG` streams — each sampled frame
    * is a whole baseline JPEG decoded through ImageIO instead of the
    * raw-DIB byte kernel. JPEG is lossy, so the oracle checks the
    * losslessly-preserved surface (the frame schedule the chunk walk
    * produces, each decoded frame's dimensions and pixel count) — the
    * same contract as q_multimodal_mp4, whose oracle this shares
    * (identical 25 fps / 80 ms sampling arithmetic). */
  def qMultimodalAviMjpg(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameFeatures(
      Multimodal.aviMjpgTable(Tables(s, dir, "documents")), everyMs = 80)
      .select(col("doc_id"), col("frame_idx"), col("frame_ms"),
        col("width"), col("height"), col("n_pixels"))

  /** Perceptual image fingerprints ([[Multimodal.imageDhash]]) over real
    * BMP payloads: decode → integer grayscale → 9×8 nearest-neighbor
    * resample (the resize operator's floor mapping) → 64 gradient bits.
    * Every stage is closed-form in doc_id for the synthetic grid, so the
    * oracle recomputes each hash bit-exactly without a decoder. */
  def qImageDhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageDhash(Multimodal.bmpTable(Tables(s, dir, "documents")))

  /** The closed-form dHash CTE chain over a one-column id relation
    * named `d(gid)` — shared by the hash query (gid = doc_id) and the
    * dedup query (gid = doc_id div 10 group seed). */
  private def dhashSql(idRelation: String): String = {
    val sx = "((x * w) // 9)"
    val sy = "((y * h) // 8)"
    s"""dd AS (SELECT gid, 4 + gid % 12 AS w, 4 + gid % 7 AS h
       |  FROM ($idRelation)),
       |g AS (SELECT gid, x, y,
       |  ((gid + 3 * $sx + 7 * $sy) % 256
       |   + (gid * 2 + 5 * $sx + $sy) % 256
       |   + (gid + $sx * $sy) % 256) // 3 AS gray
       |  FROM dd, UNNEST(range(0, 9)) AS tx(x), UNNEST(range(0, 8)) AS ty(y)),
       |bset AS (SELECT g1.gid, (g1.y * 8 + g1.x)::BIGINT AS bit
       |  FROM g g1 JOIN g g2 ON g1.gid = g2.gid AND g2.y = g1.y AND g2.x = g1.x + 1
       |  WHERE g1.x < 8 AND g2.gray > g1.gray),
       |hs AS (SELECT dd.gid, coalesce(CAST(sum(
       |    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
       |         ELSE (1::BIGINT << bit) END) AS BIGINT), 0) AS dh
       |  FROM dd LEFT JOIN bset ON dd.gid = bset.gid GROUP BY dd.gid)""".stripMargin
  }

  val qImageDhashSql: String =
    s"""WITH ${dhashSql("SELECT doc_id AS gid FROM documents")}
       |SELECT gid AS doc_id, dh AS dhash FROM hs""".stripMargin

  /** Image NEAR-DUP pairs — the multimodal dedup pass: documents in the
    * same run of ten share one synthesized image (re-used payload, the
    * duplicate-upload shape), fingerprints via the real decode → dHash
    * pipeline, pairs via the generic 4×16-band hamming join
    * ([[graft.ext.Dedup.hammingPairs]] — pigeonhole-EXACT at hamming
    * ≤ 3, so the oracle replays the SAME 4×16 banding over the
    * closed-form hashes — group-level chunk equi-join, then expansion
    * to doc pairs — and its cost tracks the emitted pair count, not
    * O(n²) doc enumeration). The images are the NOISE table
    * ([[Multimodal.noiseBmpTable]]): hash-valued pixels give each group
    * an effectively unique fingerprint the way real photos have —
    * [[bmpTable]]'s smooth ramps collapse to a handful of hashes, which
    * would make cross-group "near-dup" pairs quadratic in the corpus
    * (measured: 500 group seeds → 147 distinct ramp hashes, 23k spurious
    * pairs). Group size is sf-invariant (10), so output, bucket sizes
    * and the oracle's band-join cost all stay linear in the corpus. */
  def qImageDedup(s: SparkSession, dir: String): DataFrame =
    groupMediaPairs(Tables(s, dir, "documents"),
      Multimodal.noiseBmpTable(_), Multimodal.imageDhash(_), "dhash")

  /** The duplicate-upload wiring shared by the image and audio dedup
    * passes: documents in the same run of ten share ONE synthesized
    * payload (group id = doc_id div 10), fingerprints come from the
    * given real decode pipeline, and pairs from the generic 4×16-band
    * hamming join ([[graft.ext.Dedup.hammingPairs]], pigeonhole-exact
    * at hamming ≤ 3). */
  private def groupMediaPairs(docs: DataFrame,
                              mediaTable: DataFrame => DataFrame,
                              fingerprint: DataFrame => DataFrame,
                              bitsCol: String): DataFrame = {
    val groups = docs.select(expr("doc_id div 10").as("doc_id"))
      .distinct()
    val groupMedia = mediaTable(groups)
      .withColumnRenamed("doc_id", "__grp")
    val media = docs
      .select(col("doc_id"), expr("doc_id div 10").as("__grp"))
      .join(groupMedia, "__grp")
      .select("doc_id", "media")
    graft.ext.Dedup.hammingPairs(
      fingerprint(media), "doc_id", bitsCol, maxHamming = 3)
  }

  /** The noise-table dHash: 16×16 image, so sx = x·16 div 9, sy = 2y,
    * gray = shuffleKey(gid·256 + sy·16 + sx, 7) mod 256 — [[dhashSql]]'s
    * structure with the hash-noise gray. */
  private val noiseDhashSql: String = {
    val key = "(gid * 256 + ((y * 16) // 8) * 16 + ((x * 16) // 9))"
    val h = s"((($key % 1000000007) * 1103515245 + 7) % 1000000007" +
      " * 2654435761 % 1000000007)"
    val gray = s"(xor($h, $h >> 13) % 256)"
    s"""g AS (SELECT gid, x, y, $gray AS gray
       |  FROM dd, UNNEST(range(0, 9)) AS tx(x), UNNEST(range(0, 8)) AS ty(y)),
       |bset AS (SELECT g1.gid, (g1.y * 8 + g1.x)::BIGINT AS bit
       |  FROM g g1 JOIN g g2 ON g1.gid = g2.gid AND g2.y = g1.y AND g2.x = g1.x + 1
       |  WHERE g1.x < 8 AND g2.gray > g1.gray),
       |hs AS (SELECT dd.gid, coalesce(CAST(sum(
       |    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
       |         ELSE (1::BIGINT << bit) END) AS BIGINT), 0) AS dh
       |  FROM dd LEFT JOIN bset ON dd.gid = bset.gid GROUP BY dd.gid)""".stripMargin
  }

  val qImageDedupSql: String =
    s"""WITH dd AS (SELECT DISTINCT doc_id // 10 AS gid FROM documents),
       |$noiseDhashSql,
       |bands AS (SELECT gid, dh, b, (dh >> (b * 16)) & 65535 AS chunk
       |  FROM hs, UNNEST(range(0, 4)) AS t(b)),
       |gp AS (SELECT DISTINCT a.gid AS ga, b.gid AS gb,
       |    bit_count(xor(a.dh, b.dh))::INT AS hamming
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.chunk = b.chunk
       |    AND a.gid <= b.gid
       |  WHERE bit_count(xor(a.dh, b.dh)) <= 3),
       |m AS (SELECT doc_id, doc_id // 10 AS grp FROM documents)
       |SELECT x.doc_id AS id_a, y.doc_id AS id_b, gp.hamming
       |FROM gp JOIN m x ON x.grp = gp.ga
       |        JOIN m y ON y.grp = gp.gb
       |WHERE x.doc_id < y.doc_id""".stripMargin

  /** Audio fingerprints ([[Multimodal.audioFingerprint]]) over real WAV
    * payloads: decode → 65-frame integer energy envelope → 64 gradient
    * bits. The synthetic samples are closed-form, and every stage is
    * exact integer arithmetic, so the oracle recomputes each fingerprint
    * bit-for-bit without a decoder. */
  def qAudioFingerprint(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioFingerprint(
      Multimodal.wavTable(Tables(s, dir, "documents")))

  val qAudioFingerprintSql: String =
    """WITH d AS (SELECT doc_id, 200 + doc_id % 400 AS n FROM documents),
      |sm AS (SELECT doc_id, (i * 65) // n AS f,
      |    ((doc_id * 31 + i * 17) % 4001 - 2000) AS s
      |  FROM d, UNNEST(range(0, n)) AS t(i)),
      |en AS (SELECT doc_id, f, CAST(sum(s * s) AS BIGINT) AS e
      |  FROM sm GROUP BY doc_id, f),
      |bset AS (SELECT a.doc_id, a.f::BIGINT AS bit
      |  FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.f = a.f + 1
      |  WHERE a.f < 64 AND b.e > a.e)
      |SELECT d.doc_id, coalesce(CAST(sum(
      |    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
      |         ELSE (1::BIGINT << bit) END) AS BIGINT), 0) AS afp
      |FROM d LEFT JOIN bset ON d.doc_id = bset.doc_id
      |GROUP BY d.doc_id""".stripMargin

  /** Audio NEAR-DUP pairs — the audio half of the multimodal dedup pass,
    * wired exactly like [[qImageDedup]]: documents in the same run of
    * ten share one synthesized WAV (re-uploaded recording shape),
    * fingerprints via the real decode → energy-envelope pipeline
    * ([[Multimodal.audioFingerprint]]), pairs via the generic 4×16-band
    * hamming join ([[graft.ext.Dedup.hammingPairs]] — pigeonhole-EXACT
    * at hamming ≤ 3, so the oracle replays the same banding over the
    * closed-form fingerprints and its cost tracks emitted pairs). The
    * audio is the NOISE table ([[Multimodal.noiseWavTable]]): the plain
    * [[Multimodal.wavTable]] sweep's energy envelopes correlate across
    * ids (measured: 6000 ids → 42k spurious cross-id pairs), the same
    * smooth-signal trap [[Multimodal.noiseBmpTable]] exists for. Group
    * size is sf-invariant (10), so output and bucket sizes stay linear
    * in the corpus. */
  def qAudioDedup(s: SparkSession, dir: String): DataFrame =
    groupMediaPairs(Tables(s, dir, "documents"),
      Multimodal.noiseWavTable(_), Multimodal.audioFingerprint(_), "afp")

  /** The noise-WAV energy fingerprint per group seed, then the same
    * group-level band join + doc expansion as [[qImageDedupSql]]. */
  val qAudioDedupSql: String = {
    val h = "((((gid * 1024 + i) % 1000000007) * 1103515245 + 7)" +
      " % 1000000007 * 2654435761 % 1000000007)"
    s"""WITH dd AS (SELECT DISTINCT doc_id // 10 AS gid FROM documents),
       |d AS (SELECT gid, 200 + gid % 400 AS n FROM dd),
       |sm AS (SELECT gid, (i * 65) // n AS f,
       |    (xor($h, $h >> 13) % 4001) - 2000 AS s
       |  FROM d, UNNEST(range(0, n)) AS t(i)),
       |en AS (SELECT gid, f, CAST(sum(s * s) AS BIGINT) AS e
       |  FROM sm GROUP BY gid, f),
       |bset AS (SELECT a.gid, a.f::BIGINT AS bit
       |  FROM en a JOIN en b ON b.gid = a.gid AND b.f = a.f + 1
       |  WHERE a.f < 64 AND b.e > a.e),
       |hs AS (SELECT d.gid, coalesce(CAST(sum(
       |    CASE WHEN bit = 63 THEN -9223372036854775807 - 1
       |         ELSE (1::BIGINT << bit) END) AS BIGINT), 0) AS dh
       |  FROM d LEFT JOIN bset ON d.gid = bset.gid GROUP BY d.gid),
       |bands AS (SELECT gid, dh, b, (dh >> (b * 16)) & 65535 AS chunk
       |  FROM hs, UNNEST(range(0, 4)) AS t(b)),
       |gp AS (SELECT DISTINCT a.gid AS ga, b.gid AS gb,
       |    bit_count(xor(a.dh, b.dh))::INT AS hamming
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.chunk = b.chunk
       |    AND a.gid <= b.gid
       |  WHERE bit_count(xor(a.dh, b.dh)) <= 3),
       |m AS (SELECT doc_id, doc_id // 10 AS grp FROM documents)
       |SELECT x.doc_id AS id_a, y.doc_id AS id_b, gp.hamming
       |FROM gp JOIN m x ON x.grp = gp.ga
       |        JOIN m y ON y.grp = gp.gb
       |WHERE x.doc_id < y.doc_id""".stripMargin
  }

  /** REAL TIFF decode via the JDK's bundled TIFF plugin: lossless RGB
    * over the shared grid, so the SAME closed-form oracle as BMP/PNG
    * proves the round-trip bit-exact on the archival-scan format. */
  def qMultimodalTiff(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(Multimodal.tiffTable(Tables(s, dir, "documents")))

  val qMultimodalTiffSql: String = qMultimodalDecodeSql

  /** REAL GIF decode: indexed 256-gray palette keeps GIF's LZW round
    * trip exact (an RGB grid would be palette-quantized), so each
    * decoded channel is closed-form `(doc_id + 3x + 7y) % 256`. */
  def qMultimodalGif(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(Multimodal.gifTable(Tables(s, dir, "documents")))

  val qMultimodalGifSql: String =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 12 AS w, 4 + doc_id % 7 AS h
      |  FROM documents)
      |SELECT doc_id, w::INT AS width, h::INT AS height,
      |  (w * h)::BIGINT AS n_pixels,
      |  CAST(sum((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS sum_b
      |FROM d, UNNEST(range(0, w)) AS tx(x), UNNEST(range(0, h)) AS ty(y)
      |GROUP BY doc_id, w, h""".stripMargin

  /** REAL MP4 decode: synthesize a valid ISO-BMFF container per document
    * (ftyp/mdat/moov box walk, full stbl sample table) holding whole-
    * JPEG samples, then sample a frame every 80 ms via the SAMPLE TABLE
    * (unsampled mdat ranges are never sliced) and ImageIO-decode only
    * the sampled frames. JPEG samples are lossy, so the oracle checks
    * the losslessly-preserved surface: the sample schedule the stbl
    * arithmetic produces, and each decoded frame's exact dimensions and
    * pixel count — same contract as q_multimodal_jpeg. Inter-frame
    * codecs (avc1/vp09) stay honestly opaque ([[qMediaBytestats]]). */
  def qMultimodalMp4(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameFeatures(
      Multimodal.mp4Table(Tables(s, dir, "documents")), everyMs = 80)
      .select(col("doc_id"), col("frame_idx"), col("frame_ms"),
        col("width"), col("height"), col("n_pixels"))

  val qMultimodalMp4Sql: String =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 12 AS w, 4 + doc_id % 7 AS h,
      |  1 + doc_id % 5 AS nf FROM documents)
      |SELECT doc_id, (t // 40)::INT AS frame_idx, t::BIGINT AS frame_ms,
      |  w::INT AS width, h::INT AS height, (w * h)::BIGINT AS n_pixels
      |FROM d, UNNEST(range(0, nf * 40, 80)) AS tt(t)""".stripMargin

  /** Fragmented-MP4 twin of [[qMultimodalMp4]]: same frames and timing,
    * DASH segment layout (`moof`/`trun` + `mvex`, empty `stbl`). The
    * fragment walk reconstructs the identical sample schedule, so the
    * oracle is the same closed form. */
  def qMultimodalFmp4(s: SparkSession, dir: String): DataFrame =
    Multimodal.videoFrameFeatures(
      Multimodal.fmp4Table(Tables(s, dir, "documents")), everyMs = 80)
      .select(col("doc_id"), col("frame_idx"), col("frame_ms"),
        col("width"), col("height"), col("n_pixels"))

  val qMultimodalFmp4Sql: String = qMultimodalMp4Sql

  /** WebM container metadata over the documents grid: the EBML tree walk
    * recovers codec, dimensions and duration — closed-form in doc_id, so
    * the oracle is exact even though VP9 frames are undecodable. */
  def qMultimodalWebm(s: SparkSession, dir: String): DataFrame =
    Multimodal.webmMeta(Multimodal.webmTable(Tables(s, dir, "documents")))

  val qMultimodalWebmSql: String =
    """SELECT doc_id, 'V_VP9' AS codec,
      |(4 + doc_id % 12)::INT AS width, (4 + doc_id % 7)::INT AS height,
      |((1 + doc_id % 5) * 40)::BIGINT AS duration_ms
      |FROM documents""".stripMargin

  /** MP3 metadata over the documents grid: the frame-header walk
    * recovers rate, frame count, exact duration and bitrate — closed
    * form in doc_id, exact even though the audio frames are opaque. */
  def qMultimodalMp3(s: SparkSession, dir: String): DataFrame =
    Multimodal.mp3Meta(Multimodal.mp3Table(Tables(s, dir, "documents")))

  val qMultimodalMp3Sql: String =
    """WITH d AS (SELECT doc_id,
      |  list_extract([44100,48000,32000], (doc_id % 3 + 1)::INT) AS rate,
      |  list_extract([96,128,192,320], (doc_id % 4 + 1)::INT) AS kbps,
      |  5 + doc_id % 20 AS nf FROM documents)
      |SELECT doc_id, rate::INT AS sample_rate, nf::INT AS n_frames,
      |  (nf * 1152000 // rate)::BIGINT AS duration_ms,
      |  kbps::DOUBLE AS mean_kbps, false AS vbr
      |FROM d""".stripMargin

  /** Permissive media decode (§1.3 error contract on the multimodal
    * surface): every 7th payload is replaced with non-image junk; the
    * quarantine path must mark exactly those rows undecodable and decode
    * the rest — the job must NOT die on the corrupt rows, which is what
    * the strict decode would do at crawl scale. */
  def qMultimodalQuarantine(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeaturesPermissive(
      Multimodal.pngTable(Tables(s, dir, "documents"))
        .withColumn("media",
          when(col("doc_id") % 7 === 0,
            encode(lit("deliberately not an image payload"), "UTF-8"))
            .otherwise(col("media"))))

  val qMultimodalQuarantineSql: String =
    """SELECT doc_id, (doc_id % 7 <> 0) AS ok,
      |CASE WHEN doc_id % 7 <> 0 THEN (4 + doc_id % 12)::INT END AS width,
      |CASE WHEN doc_id % 7 <> 0 THEN (4 + doc_id % 7)::INT END AS height,
      |CASE WHEN doc_id % 7 <> 0
      |  THEN ((4 + doc_id % 12) * (4 + doc_id % 7))::BIGINT END AS n_pixels,
      |CASE WHEN doc_id % 7 = 0 THEN 'undecodable' END AS reason
      |FROM documents""".stripMargin

  /** Byte statistics over opaque payloads (formats with no JVM decoder).
    * Oracle exploits the fixture texts being pure ASCII: byte stream ==
    * codepoint stream. */
  def qMediaBytestats(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(Multimodal.mediaTable(Tables(s, dir, "documents")))

  val qMediaBytestatsSql: String =
    """WITH codes AS (SELECT doc_id, text,
      |  list_transform(range(1, length(text) + 1), i -> ascii(text[i])) AS cs
      |FROM documents)
      |SELECT doc_id,
      |  list_extract(['png', 'jpeg', 'webp'], (doc_id % 3 + 1)::INT) AS format,
      |  length(text)::BIGINT AS n_bytes,
      |  list_sum(cs)::DOUBLE / length(text) AS mean_byte,
      |  list_min(cs)::INT AS min_byte,
      |  list_max(cs)::INT AS max_byte
      |FROM codes""".stripMargin

  def qMultimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(Multimodal.mediaTable(Tables(s, dir, "documents")),
      everyMs = 7000)

  val qMultimodalFramesSql: String =
    """SELECT doc_id, f.frame_ms,
      |floor(f.frame_ms::DOUBLE / ((doc_id % 60) * 1000) * 100.0)::INT AS pct
      |FROM documents
      |CROSS JOIN UNNEST(range(0, (doc_id % 60) * 1000, 7000)) AS f(frame_ms)
      |WHERE (doc_id % 60) * 1000 > 0""".stripMargin

  def qMultimodalResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resize(Multimodal.mediaTable(Tables(s, dir, "documents")), 64, 64)
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("w"), col("meta.height").as("h"),
        octet_length(col("media")).as("n_bytes"))

  val qMultimodalResizeSql: String =
    """WITH m AS (SELECT doc_id,
      |  list_extract(['png', 'jpeg', 'webp'], (doc_id % 3 + 1)::INT) AS format,
      |  32 + (doc_id % 8) * 16 AS w0, 32 + (doc_id % 5) * 16 AS h0,
      |  length(text) AS len0 FROM documents),
      |sc AS (SELECT *, least(64.0 / w0, 64.0 / h0, 1.0) AS scale FROM m)
      |SELECT doc_id, format,
      |  floor(w0 * scale)::INT AS w, floor(h0 * scale)::INT AS h,
      |  greatest(floor(len0 * scale)::INT, 1) AS n_bytes
      |FROM sc""".stripMargin

  /** REAL resize: synthesize valid BMPs, decode → nearest-neighbor
    * resample into an 8×8 box → re-encode, then extract pixel features
    * from the RESIZED payloads. The oracle recomputes the resampled grid
    * from the closed-form pixel formulas and the integer source-pixel
    * mapping (x·w0 div w1) — matching proves decode→resample→encode→
    * decode is pixel-exact. */
  def qMultimodalResizeReal(s: SparkSession, dir: String): DataFrame =
    Multimodal.imageFeatures(
      Multimodal.resizeBmp(Multimodal.bmpTable(Tables(s, dir, "documents")), 8, 8))

  val qMultimodalResizeRealSql: String =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 12 AS w0, 4 + doc_id % 7 AS h0
      |  FROM documents),
      |s AS (SELECT *, least(8.0 / w0, 8.0 / h0, 1.0) AS sc FROM d),
      |t AS (SELECT doc_id, w0, h0,
      |  greatest(floor(w0 * sc)::INT, 1) AS w1,
      |  greatest(floor(h0 * sc)::INT, 1) AS h1 FROM s),
      |px AS (SELECT doc_id, w1, h1,
      |  (x * w0) // w1 AS sx, (y * h0) // h1 AS sy
      |  FROM t, UNNEST(range(0, w1)) AS tx(x), UNNEST(range(0, h1)) AS ty(y))
      |SELECT doc_id, w1::INT AS width, h1::INT AS height,
      |  (w1 * h1)::BIGINT AS n_pixels,
      |  CAST(sum((doc_id + 3 * sx + 7 * sy) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id * 2 + 5 * sx + sy) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + sx * sy) % 256) AS BIGINT) AS sum_b
      |FROM px GROUP BY doc_id, w1, h1""".stripMargin

  /** REAL per-patch pixel features: 4×4 patches of each decoded BMP
    * reduced to exact integer channel sums (edge partials dropped). */
  def qMultimodalPatchPx(s: SparkSession, dir: String): DataFrame =
    Multimodal.patchPixelFeatures(
      Multimodal.bmpTable(Tables(s, dir, "documents")), patch = 4)

  val qMultimodalPatchPxSql: String =
    """WITH d AS (SELECT doc_id, 4 + doc_id % 12 AS w, 4 + doc_id % 7 AS h
      |  FROM documents),
      |g AS (SELECT doc_id, w, h, w // 4 AS nx, h // 4 AS ny FROM d),
      |pt AS (SELECT doc_id, w, px, py FROM g,
      |  UNNEST(range(0, nx)) AS tx(px), UNNEST(range(0, ny)) AS ty(py)),
      |c AS (SELECT doc_id, px, py, px * 4 + dx AS x, py * 4 + dy AS y
      |  FROM pt, UNNEST(range(0, 4)) AS t1(dx), UNNEST(range(0, 4)) AS t2(dy))
      |SELECT doc_id, px::INT AS px, py::INT AS py, 16 AS n_px,
      |  CAST(sum((doc_id + 3 * x + 7 * y) % 256) AS BIGINT) AS sum_r,
      |  CAST(sum((doc_id * 2 + 5 * x + y) % 256) AS BIGINT) AS sum_g,
      |  CAST(sum((doc_id + x * y) % 256) AS BIGINT) AS sum_b
      |FROM c GROUP BY doc_id, px, py""".stripMargin

  /** ViT-style 16px patch grid over the media metadata. */
  def qMultimodalPatches(s: SparkSession, dir: String): DataFrame =
    Multimodal.patchGrid(Multimodal.mediaTable(Tables(s, dir, "documents")),
      patch = 16)

  val qMultimodalPatchesSql: String =
    """WITH m AS (SELECT doc_id, 32 + (doc_id % 8) * 16 AS w,
      |  32 + (doc_id % 5) * 16 AS h FROM documents),
      |g AS (SELECT doc_id, w // 16 AS nx, h // 16 AS ny FROM m
      |      WHERE w // 16 > 0 AND h // 16 > 0)
      |SELECT doc_id, (p % nx)::INT AS px, (p // nx)::INT AS py,
      |  ((p % nx) * 16)::INT AS x0, ((p // nx) * 16)::INT AS y0
      |FROM g, UNNEST(range(0, nx * ny)) AS t(p)""".stripMargin

  /** REAL audio decode: synthesize a valid RIFF/WAVE PCM16 file per
    * document, parse it back with the pure-JVM codec (chunk walk, fmt
    * validation), then window the decoded signed samples into 256-sample
    * chunks with RMS/peak. The oracle recomputes everything from the
    * closed-form sample formula — matching proves the encode→parse→
    * extract roundtrip is sample-exact. */
  def qMultimodalAudio(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioChunkFeatures(
      Multimodal.wavTable(Tables(s, dir, "documents")), samplesPerChunk = 256)

  val qMultimodalAudioSql: String =
    """WITH s AS (SELECT doc_id,
      |  8000 + (doc_id % 4) * 4000 AS sample_rate,
      |  i, (doc_id * 31 + i * 17) % 4001 - 2000 AS v
      |FROM documents, UNNEST(range(0, 200 + doc_id % 400)) AS t(i))
      |SELECT doc_id, sample_rate::INT AS sample_rate,
      |  (i // 256)::INT AS chunk, count(*)::INT AS n_samples,
      |  sqrt(CAST(sum(v * v) AS DOUBLE) / count(*)) AS rms,
      |  max(v)::INT AS peak
      |FROM s GROUP BY doc_id, sample_rate, i // 256""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_audio"  -> (qMultimodalAudio _),
    "q_media_bytestats"   -> (qMediaBytestats _),
    "q_multimodal_patches" -> (qMultimodalPatches _),
    "q_window_tumbling"   -> (qTumbling _),
    "q_window_sliding"    -> (qSliding _),
    "q_window_session"    -> (qSessionWindow _),
    "q_sessionize_custom" -> (qSessionizeCustom _),
    "q_interval_join"     -> (qIntervalJoin _),
    "q_compact"           -> (qCompact _),
    "q_scd2"              -> (qScd2 _),
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_image_dhash"       -> (qImageDhash _),
    "q_image_dedup"       -> (qImageDedup _),
    "q_audio_fingerprint" -> (qAudioFingerprint _),
    "q_audio_dedup"       -> (qAudioDedup _),
    "q_multimodal_png"    -> (qMultimodalPng _),
    "q_multimodal_jpeg"   -> (qMultimodalJpeg _),
    "q_multimodal_resize_png" -> (qMultimodalResizePng _),
    "q_multimodal_video"  -> (qMultimodalVideo _),
    "q_multimodal_avi_mjpg" -> (qMultimodalAviMjpg _),
    "q_multimodal_mp4"    -> (qMultimodalMp4 _),
    "q_multimodal_fmp4"   -> (qMultimodalFmp4 _),
    "q_multimodal_webm"   -> (qMultimodalWebm _),
    "q_multimodal_quarantine" -> (qMultimodalQuarantine _),
    "q_multimodal_mp3"    -> (qMultimodalMp3 _),
    "q_multimodal_tiff"   -> (qMultimodalTiff _),
    "q_multimodal_gif"    -> (qMultimodalGif _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_resize_real" -> (qMultimodalResizeReal _),
    "q_multimodal_patchpx" -> (qMultimodalPatchPx _))

  val oracle: Map[String, String] = Map(
    "q_multimodal_audio"  -> qMultimodalAudioSql,
    "q_media_bytestats"   -> qMediaBytestatsSql,
    "q_multimodal_patches" -> qMultimodalPatchesSql,
    "q_window_tumbling"   -> qTumblingSql,
    "q_window_sliding"    -> qSlidingSql,
    "q_window_session"    -> qSessionWindowSql,
    "q_sessionize_custom" -> qSessionizeCustomSql,
    "q_interval_join"     -> qIntervalJoinSql,
    "q_compact"           -> qCompactSql,
    "q_scd2"              -> qScd2Sql,
    "q_multimodal_decode" -> qMultimodalDecodeSql,
    "q_image_dhash"       -> qImageDhashSql,
    "q_image_dedup"       -> qImageDedupSql,
    "q_audio_fingerprint" -> qAudioFingerprintSql,
    "q_audio_dedup"       -> qAudioDedupSql,
    "q_multimodal_png"    -> qMultimodalPngSql,
    "q_multimodal_jpeg"   -> qMultimodalJpegSql,
    "q_multimodal_resize_png" -> qMultimodalResizeRealSql,
    "q_multimodal_video"  -> qMultimodalVideoSql,
    "q_multimodal_avi_mjpg" -> qMultimodalMp4Sql,
    "q_multimodal_mp4"    -> qMultimodalMp4Sql,
    "q_multimodal_fmp4"   -> qMultimodalFmp4Sql,
    "q_multimodal_webm"   -> qMultimodalWebmSql,
    "q_multimodal_quarantine" -> qMultimodalQuarantineSql,
    "q_multimodal_mp3"    -> qMultimodalMp3Sql,
    "q_multimodal_tiff"   -> qMultimodalTiffSql,
    "q_multimodal_gif"    -> qMultimodalGifSql,
    "q_multimodal_frames" -> qMultimodalFramesSql,
    "q_multimodal_resize" -> qMultimodalResizeSql,
    "q_multimodal_resize_real" -> qMultimodalResizeRealSql,
    "q_multimodal_patchpx" -> qMultimodalPatchPxSql)
}

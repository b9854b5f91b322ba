package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Codecs

/** Byte-level codec tests: exact roundtrips, the layout details real
  * files exercise (chunk padding, extra chunks, row padding, top-down
  * rows), and loud failures on malformed input. */
class CodecSpec extends AnyFunSuite {

  test("WAV PCM16 roundtrip is sample-exact") {
    val samples = Array.tabulate(777)(i => ((i * 131) % 65536 - 32768).toShort)
    val wav = Codecs.decodeWav(Codecs.encodeWavPcm16(samples, 44100, 2))
    assert(wav.sampleRate == 44100 && wav.channels == 2 && wav.bitsPerSample == 16)
    assert(wav.samples.toSeq == samples.map(_.toInt).toSeq)
  }

  test("WAV parser walks past extra chunks and odd-size padding") {
    import java.nio.{ByteBuffer, ByteOrder}
    val base = Codecs.encodeWavPcm16(Array[Short](1, -2, 3), 8000)
    // splice a 5-byte (odd → 1 pad byte) LIST chunk between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = ByteBuffer.allocate(8 + 6).order(ByteOrder.LITTLE_ENDIAN)
    extra.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put(Array[Byte](1, 2, 3, 4, 5, 0))
    val spliced = base.take(fmtEnd) ++ extra.array() ++ base.drop(fmtEnd)
    val wav = Codecs.decodeWav(spliced)
    assert(wav.samples.toSeq == Seq(1, -2, 3))
  }

  test("WAV parser rejects malformed input loudly") {
    val good = Codecs.encodeWavPcm16(Array[Short](1, 2), 8000)
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Codecs.decodeWav(bytes)).getMessage
    assert(msg("not a riff file at all, padded to 44+".getBytes ++ good)
      .contains("RIFF"))
    assert(msg(good.take(40)).contains("truncated"))
    val nonPcm = good.clone; nonPcm(20) = 3 // format tag 3 = IEEE float
    assert(msg(nonPcm).contains("PCM"))
    val overrun = good.clone
    // data chunk claims more bytes than the file holds
    overrun(40) = (overrun(40) + 64).toByte
    assert(msg(overrun).contains("overruns"))
  }

  test("BMP 24-bit roundtrip is pixel-exact incl. non-multiple-of-4 rows") {
    // width 5 → 15 row bytes → 1 pad byte per row
    val img = Codecs.decodeBmp24(
      Codecs.encodeBmp24(5, 3, (x, y) => (x << 16) | (y << 8) | (x + y)))
    assert(img.width == 5 && img.height == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(img.rgb(y * 5 + x) == ((x << 16) | (y << 8) | (x + y)))
  }

  test("BMP parser honors top-down row order (negative height)") {
    import java.nio.{ByteBuffer, ByteOrder}
    val bottomUp = Codecs.encodeBmp24(2, 2, (x, y) => (y * 2 + x) << 16)
    val buf = ByteBuffer.wrap(bottomUp.clone).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -2) // height := -2 (top-down)
    // rows in the file are (bottom row first); with top-down declared they
    // are read as-is, so the image flips vertically
    val flipped = Codecs.decodeBmp24(buf.array())
    val normal = Codecs.decodeBmp24(bottomUp)
    assert(flipped.rgb.toSeq == normal.rgb.grouped(2).toSeq.reverse.flatten)
  }

  test("BMP parser rejects malformed input loudly") {
    def msg(bytes: Array[Byte]): String =
      intercept[IllegalArgumentException](Codecs.decodeBmp24(bytes)).getMessage
    val good = Codecs.encodeBmp24(3, 3, (_, _) => 0)
    assert(msg(Array.fill[Byte](60)('x')).contains("BM"))
    assert(msg(good.take(50)).contains("truncated"))
    val bad16 = good.clone; bad16(28) = 16 // bpp 16
    assert(msg(bad16).contains("24-bit"))
    val rle = good.clone; rle(30) = 1 // BI_RLE8
    assert(msg(rle).contains("BI_RGB"))
    assert(msg(good.dropRight(4)).contains("overruns"))
  }

  test("repartitionBySize sizes from plan stats — runs NO job") {
    val spark = SparkTest.spark
    val media = graft.ext.Multimodal.mediaTable(
      Tables(spark, "/root/testdata/sf0.001", "documents"))
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = graft.ext.Multimodal.repartitionBySize(media, 1 << 20)
      assert(out.queryExecution.logical != null) // plan built, nothing ran
      Thread.sleep(200) // let any (unexpected) job-start events arrive
      assert(jobs == 0,
        s"sizing must come from plan statistics, not a data pass ($jobs jobs)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("resizeBmp: fits-in-box is identity; 2x downscale picks floor-mapped pixels") {
    import org.apache.spark.sql.functions.col
    import graft.ext.Multimodal
    val spark0 = SparkTest.spark
    import spark0.implicits._
    // 4x2 image with distinct channel values per pixel
    val src = Codecs.encodeBmp24(4, 2, (x, y) => (x << 16) | (y << 8) | (x + y))
    val df = Seq((1L, src)).toDF("doc_id", "media")
    // box larger than the image: payload must come back byte-identical
    val same = Multimodal.resizeBmp(df, 16, 16).collect().head.getAs[Array[Byte]](1)
    assert(java.util.Arrays.equals(same, src))
    // halve: output (x, y) samples source (2x, 2y)
    val half = Codecs.decodeBmp24(
      Multimodal.resizeBmp(df, 2, 1).collect().head.getAs[Array[Byte]](1))
    assert(half.width == 2 && half.height == 1)
    assert(half.rgb.toSeq == Seq((0 << 16) | 0, (2 << 16) | 2))
  }

  test("patchPixelFeatures sums exactly the full patches, drops edge partials") {
    import graft.ext.Multimodal
    val spark0 = SparkTest.spark
    import spark0.implicits._
    // 5x3 image, patch=2 -> grid 2x1; pixel value = r channel x+10y
    val src = Codecs.encodeBmp24(5, 3, (x, y) => (x + 10 * y) << 16)
    val df = Seq((7L, src)).toDF("doc_id", "media")
    val rows = Multimodal.patchPixelFeatures(df, patch = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSet
    // patch (0,0): pixels (0,0)(1,0)(0,1)(1,1) -> 0+1+10+11 = 22
    // patch (1,0): pixels (2,0)(3,0)(2,1)(3,1) -> 2+3+12+13 = 30
    assert(rows == Set((0, 0, 4, 22L), (1, 0, 4, 30L)))
  }

  test("decodeBmp24 rejects crafted dimensions loudly (no Int wrap)") {
    import java.nio.{ByteBuffer, ByteOrder}
    // valid 1x1 file, then forge width so width*3+3 wraps Int negative
    val base = Codecs.encodeBmp24(1, 1, (_, _) => 0)
    val buf = ByteBuffer.wrap(base.clone()).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(18, 715827883) // width field
    val e = intercept[IllegalArgumentException](Codecs.decodeBmp24(buf.array()))
    assert(e.getMessage.contains("exceed file size"))
    // forged pixel-data offset must also fail loudly
    val buf2 = ByteBuffer.wrap(base.clone()).order(ByteOrder.LITTLE_ENDIAN)
    buf2.putInt(10, -8) // dataOffset field
    val e2 = intercept[IllegalArgumentException](Codecs.decodeBmp24(buf2.array()))
    assert(e2.getMessage.contains("offset"))
  }

  test("decode operators skip NULL/empty payloads instead of crashing the job") {
    import graft.ext.Multimodal
    val spark0 = SparkTest.spark
    import spark0.implicits._
    val bmp = Codecs.encodeBmp24(4, 4, (x, y) => (x + y) << 16)
    val wav = Codecs.encodeWavPcm16(Array[Short](1, 2, 3), 8000)
    val df = Seq((1L, bmp), (2L, null.asInstanceOf[Array[Byte]]),
        (3L, Array.empty[Byte]))
      .toDF("doc_id", "media")
    assert(Multimodal.imageFeatures(df).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))
    assert(Multimodal.resizeBmp(df, 2, 2).select("doc_id")
      .as[Long].collect().toSeq == Seq(1L))
    assert(Multimodal.patchPixelFeatures(df, 2).select("doc_id")
      .as[Long].collect().distinct.toSeq == Seq(1L))
    val adf = Seq((1L, wav), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    assert(Multimodal.audioChunkFeatures(adf).select("doc_id")
      .as[Long].collect().distinct.toSeq == Seq(1L))
  }

  test("gzip roundtrip is byte-exact; multi-member archives concatenate; corrupt fails loudly") {
    val payload = ("the quick brown fox " * 50).getBytes("UTF-8")
    assert(java.util.Arrays.equals(Codecs.gunzip(Codecs.gzip(payload)), payload))
    // concatenated members — the shape web-crawl .gz archives ship
    val two = Codecs.gzip("hello ".getBytes("UTF-8")) ++
      Codecs.gzip("world".getBytes("UTF-8"))
    assert(new String(Codecs.gunzip(two), "UTF-8") == "hello world")
    val e = intercept[IllegalArgumentException](
      Codecs.gunzip("not gzip".getBytes("UTF-8")))
    assert(e.getMessage.contains("magic"))
    val truncated = Codecs.gzip(payload).dropRight(6)
    intercept[Exception](Codecs.gunzip(truncated))
  }

  test("PNG roundtrip via javax.imageio is pixel-exact; decodeImage dispatches by magic") {
    val px = (x: Int, y: Int) => ((x * 37 + y * 91) % 256 << 16) |
      ((x + y * 3) % 256 << 8) | ((x * y) % 256)
    val png = Codecs.encodePng(13, 7, px)
    // PNG magic, not BMP — the dispatch must route to ImageIO
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P'.toByte)
    val img = Codecs.decodeImage(png)
    assert(img.width == 13 && img.height == 7)
    for (y <- 0 until 7; x <- 0 until 13)
      assert(img.rgb(y * 13 + x) == px(x, y), s"pixel ($x,$y)")
    // BMP payloads take the byte-parser path and agree exactly
    val bmp = Codecs.encodeBmp24(13, 7, px)
    assert(java.util.Arrays.equals(Codecs.decodeImage(bmp).rgb, img.rgb))
  }

  test("JPEG decode preserves dimensions; lossy pixels stay near the source") {
    val px = (x: Int, y: Int) => (128 << 16) | (64 << 8) | 200 // uniform color
    val jpg = Codecs.encodeJpeg(16, 12, px)
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8) // JFIF magic
    val img = Codecs.decodeImage(jpg)
    assert(img.width == 16 && img.height == 12 && img.rgb.length == 192)
    // a uniform image survives DCT quantization to within a small epsilon
    img.rgb.foreach { p =>
      assert(math.abs(((p >> 16) & 0xFF) - 128) <= 8)
      assert(math.abs(((p >> 8) & 0xFF) - 64) <= 8)
      assert(math.abs((p & 0xFF) - 200) <= 8)
    }
  }

  test("decodeImage fails loudly on unknown magic (no silent null decode)") {
    val e = intercept[IllegalArgumentException](
      Codecs.decodeImage(Array[Byte]('R', 'I', 'F', 'F', 1, 2, 3, 4)))
    assert(e.getMessage.contains("no ImageIO reader"))
  }

  test("AVI raw-DIB roundtrip is frame- and pixel-exact; MJPEG frames decode via ImageIO") {
    val w = 13; val h = 5
    val px = (f: Int) => (x: Int, y: Int) =>
      ((x * 31 + f) % 256 << 16) | ((y * 17 + f) % 256 << 8) | ((x + y + f) % 256)
    val dibAvi = Codecs.encodeAvi(w, h, usecPerFrame = 40000, fourcc = "DIB ",
      frames = (0 until 3).map(f => Codecs.encodeDib24(w, h, px(f))))
    val v = Codecs.decodeAvi(dibAvi)
    assert(v.width == w && v.height == h && v.usecPerFrame == 40000)
    assert(v.fourcc == "DIB " && v.frames.length == 3)
    for (f <- 0 until 3) {
      val img = Codecs.decodeVideoFrame(v, f)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.rgb(y * w + x) == px(f)(x, y), s"frame $f pixel ($x,$y)")
    }
    // MJPEG: same container walk, per-frame JPEG decode — dims exact
    val mjpg = Codecs.encodeAvi(16, 8, 33333, "MJPG",
      (0 until 2).map(f => Codecs.encodeJpeg(16, 8, px(f))))
    val vm = Codecs.decodeAvi(mjpg)
    assert(vm.fourcc == "MJPG" && vm.frames.length == 2)
    val img0 = Codecs.decodeVideoFrame(vm, 0)
    assert(img0.width == 16 && img0.height == 8)
    // out-of-order container (movi LIST before hdrl — nonstandard but
    // parseable): the two-pass walk must still find every frame
    val bb = java.nio.ByteBuffer.wrap(dibAvi)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hdrlSize = bb.getInt(16) // LIST chunk at 12: id@12, size@16
    val hdrlEnd = 12 + 8 + hdrlSize + (hdrlSize & 1)
    val swapped = dibAvi.slice(0, 12) ++
      dibAvi.slice(hdrlEnd, dibAvi.length) ++ dibAvi.slice(12, hdrlEnd)
    val vs = Codecs.decodeAvi(swapped)
    assert(vs.frames.length == 3 && vs.width == w && vs.fourcc == "DIB ")
  }

  test("AVI parser rejects malformed input loudly") {
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeAvi("RIFFxxxxWAVEfmt and more padding".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("AVI"))
    val good = Codecs.encodeAvi(4, 4, 40000, "DIB ",
      Seq(Codecs.encodeDib24(4, 4, (_, _) => 0)))
    // truncate inside the movi list: the chunk overrun check must fire
    intercept[IllegalArgumentException](
      Codecs.decodeAvi(good.dropRight(10)))
  }

  test("GIF indexed-gray and TIFF RGB roundtrips are pixel-exact") {
    // 4x4 is the interlace regression case: the JDK GIF writer's default
    // progressive mode mis-round-trips heights < 8, so encodeGifGray
    // must write sequential rows
    for ((w, h) <- Seq((4, 4), (16, 10))) {
      val gray = (x: Int, y: Int) => (3 * x + 7 * y) % 256
      val img = Codecs.decodeImage(Codecs.encodeGifGray(w, h, gray))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w) {
        val g = gray(x, y)
        assert(img.rgb(y * w + x) == ((g << 16) | (g << 8) | g),
          s"gif ${w}x$h pixel ($x,$y)")
      }
    }
    val px = (x: Int, y: Int) =>
      ((x * 31) % 256 << 16) | ((y * 17) % 256 << 8) | ((x + y) % 256)
    val tiff = Codecs.decodeImage(Codecs.encodeTiff(9, 7, px))
    assert(tiff.width == 9 && tiff.height == 7)
    for (y <- 0 until 7; x <- 0 until 9)
      assert(tiff.rgb(y * 9 + x) == px(x, y), s"tiff pixel ($x,$y)")
  }

  test("MP4 JPEG-sample roundtrip: stbl arithmetic exact, sampled decode " +
       "via ImageIO; largesize mdat parses") {
    val w = 12; val h = 6
    val px = (f: Int) => (x: Int, y: Int) =>
      ((x * 31 + f) % 256 << 16) | ((y * 17 + f) % 256 << 8) | ((x + y + f) % 256)
    val samples = (0 until 4).map(f => Codecs.encodeJpeg(w, h, px(f)))
    val mp4 = Codecs.encodeMp4(w, h, timescale = 1000, sampleDelta = 40,
      fourcc = "jpeg", samples = samples)
    val v = Codecs.decodeMp4(mp4)
    assert(v.width == w && v.height == h && v.fourcc == "jpeg")
    assert(v.timescale == 1000 && v.sampleDelta == 40 && v.msPerFrame == 40)
    assert(v.numSamples == 4)
    // the sample table slices each sample back byte-identical to what
    // the muxer wrote into mdat
    for (f <- 0 until 4)
      assert(java.util.Arrays.equals(Codecs.mp4SampleBytes(v, f),
        samples(f).toArray), s"sample $f bytes")
    val img = Codecs.decodeMp4Frame(v, 2)
    assert(img.width == w && img.height == h && img.rgb.length == w * h)
    // 64-bit largesize form of mdat: size=1 marker + u64; offsets shift
    // by the 8 extra header bytes
    val buf = java.nio.ByteBuffer.wrap(mp4)
    val ftypSize = buf.getInt(0)
    val mdatSize = buf.getInt(ftypSize)
    val big = new java.io.ByteArrayOutputStream()
    big.write(mp4, 0, ftypSize)
    big.write(java.nio.ByteBuffer.allocate(16).putInt(1)
      .put("mdat".getBytes("US-ASCII")).putLong(mdatSize + 8L).array())
    big.write(mp4, ftypSize + 8, mdatSize - 8)
    val moovStart = ftypSize + mdatSize
    // rewrite stco's single chunk offset (+8) inside the copied moov
    val moov = java.util.Arrays.copyOfRange(mp4, moovStart, mp4.length)
    val stcoIdx = {
      def find(a: Array[Byte], s: String): Int = {
        val pat = s.getBytes("US-ASCII")
        (0 to a.length - pat.length).find(i =>
          pat.indices.forall(j => a(i + j) == pat(j))).get
      }
      find(moov, "stco")
    }
    val mb = java.nio.ByteBuffer.wrap(moov)
    mb.putInt(stcoIdx + 12, mb.getInt(stcoIdx + 12) + 8)
    big.write(moov)
    val vb = Codecs.decodeMp4(big.toByteArray)
    assert(vb.numSamples == 4 &&
      java.util.Arrays.equals(Codecs.mp4SampleBytes(vb, 3), samples(3).toArray),
      "largesize mdat must parse with shifted offsets")
    // malformed input fails loudly
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeMp4("this is not an iso-bmff file at all!".getBytes))
    assert(e1.getMessage.contains("MP4"))
    val e2 = intercept[IllegalArgumentException](
      Codecs.decodeMp4(java.util.Arrays.copyOfRange(mp4, 0, ftypSize + 12)))
    assert(e2.getMessage.contains("MP4"))
    // inter-frame codec: loud refusal, not a wrong decode
    val avc = Codecs.decodeMp4(Codecs.encodeMp4(w, h, 1000, 40, "avc1", samples))
    val e3 = intercept[IllegalArgumentException](Codecs.decodeMp4Frame(avc, 0))
    assert(e3.getMessage.contains("avc1"))
  }

  test("MP4 co64 offsets and multi-run stsc: chunk-run arithmetic maps " +
       "every sample across differing samples_per_chunk") {
    val w = 10; val h = 5
    val px = (f: Int) => (x: Int, y: Int) =>
      ((x * 13 + f) % 256 << 16) | ((y * 7 + f) % 256 << 8) | ((x * y + f) % 256)
    val samples = (0 until 4).map(f => Codecs.encodeJpeg(w, h, px(f)))
    // layout (1, 3): two chunks with DIFFERENT samples_per_chunk → two stsc
    // runs, so the decoder's lastIndexWhere run lookup must switch runs
    // mid-walk; co64 = true exercises the 64-bit offset branch
    val v1 = Codecs.decodeMp4(Codecs.encodeMp4(w, h, 1000, 40, "jpeg",
      samples, samplesPerChunk = Seq(1, 3), co64 = true))
    assert(v1.numSamples == 4)
    for (f <- 0 until 4)
      assert(java.util.Arrays.equals(Codecs.mp4SampleBytes(v1, f),
        samples(f).toArray), s"co64/two-run sample $f bytes")
    // layout (2, 1, 1): the trailing equal-count chunks COMPRESS into one
    // run (first_chunk=2 covers chunks 2 and 3) — the runIdx fallback walk
    // must reuse the last run for chunk 3
    val v2 = Codecs.decodeMp4(Codecs.encodeMp4(w, h, 1000, 40, "jpeg",
      samples, samplesPerChunk = Seq(2, 1, 1)))
    assert(v2.numSamples == 4)
    for (f <- 0 until 4)
      assert(java.util.Arrays.equals(Codecs.mp4SampleBytes(v2, f),
        samples(f).toArray), s"multi-chunk sample $f bytes")
    // decoded frames are real decodes, not just byte slices
    val img = Codecs.decodeMp4Frame(v1, 3)
    assert(img.width == w && img.height == h)
  }

  test("fragmented MP4 (moof/trun): DASH-style segments decode; " +
       "empty-stbl-without-fragments and WebM reject loudly") {
    val w = 8; val h = 4
    val px = (f: Int) => (x: Int, y: Int) =>
      ((x * 19 + f) % 256 << 16) | ((y * 29 + f) % 256 << 8) | ((x + 3 * y + f) % 256)
    val samples = (0 until 5).map(f => Codecs.encodeJpeg(w, h, px(f)))
    val fmp4 = Codecs.encodeFmp4(w, h, timescale = 1000, sampleDelta = 40,
      fourcc = "jpeg", samples = samples, samplesPerFragment = 2)
    val v = Codecs.decodeMp4(fmp4)
    assert(v.width == w && v.height == h && v.fourcc == "jpeg")
    assert(v.timescale == 1000 && v.sampleDelta == 40)
    assert(v.numSamples == 5, "3 fragments (2+2+1) must map all 5 samples")
    for (f <- 0 until 5)
      assert(java.util.Arrays.equals(Codecs.mp4SampleBytes(v, f),
        samples(f).toArray), s"fragment sample $f bytes")
    val img = Codecs.decodeMp4Frame(v, 4)
    assert(img.width == w && img.height == h && img.rgb.length == w * h)
    // a fragmented HEADER with its moof/mdat segments stripped (a bare DASH
    // init segment) names the failure precisely
    val moofStart = {
      def findBox(a: Array[Byte], tp: String): Int = {
        val pat = tp.getBytes("US-ASCII")
        (0 to a.length - 4).find(i =>
          pat.indices.forall(j => a(i + j) == pat(j))).get - 4
      }
      findBox(fmp4, "moof")
    }
    val init = java.util.Arrays.copyOfRange(fmp4, 0, moofStart)
    val e1 = intercept[IllegalArgumentException](Codecs.decodeMp4(init))
    assert(e1.getMessage.contains("moof"),
      s"init-segment rejection must name the missing fragments: ${e1.getMessage}")
    // WebM/Matroska: EBML magic gets a NAMED rejection, not a generic
    // box-walk failure
    val webm = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte) ++
      new Array[Byte](64)
    val e2 = intercept[IllegalArgumentException](Codecs.decodeMp4(webm))
    assert(e2.getMessage.contains("WebM"),
      s"EBML payload must be rejected by name: ${e2.getMessage}")
  }

  test("WebM EBML walk: header metadata round-trips; truncation, wrong " +
       "DocType and non-EBML payloads fail with named errors") {
    val bytes = Codecs.encodeWebm(640, 360, durationMs = 12345L)
    val m = Codecs.decodeWebmMeta(bytes)
    assert(m.codecId == "V_VP9" && m.width == 640 && m.height == 360)
    assert(m.durationMs == 12345L && m.timecodeScaleNs == 1000000L)
    // VINT boundary dimensions: sizes that need multi-byte uints and push
    // element sizes past one VINT septet
    val big = Codecs.decodeWebmMeta(
      Codecs.encodeWebm(3840, 2160, durationMs = 3600000L, codecId = "V_AV1"))
    assert(big.codecId == "V_AV1" && big.width == 3840 && big.height == 2160)
    assert(big.durationMs == 3600000L)
    // truncation mid-tree: named, not an index crash
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeWebmMeta(java.util.Arrays.copyOfRange(bytes, 0, 20)))
    assert(e1.getMessage.contains("WebM"), e1.getMessage)
    // not EBML at all
    val e2 = intercept[IllegalArgumentException](
      Codecs.decodeWebmMeta("RIFFxxxxWEBPVP8 ".getBytes("US-ASCII")))
    assert(e2.getMessage.contains("EBML"), e2.getMessage)
    // a Segment with no video track is named too
    val audioOnlyWebm = {
      // re-encode, then surgically flip TrackType 1 -> 2 (audio): the
      // element is ebml id 0x83, size 0x81, value 0x01
      val b = Codecs.encodeWebm(8, 8, 40L).clone()
      val i = (0 until b.length - 2).find(i =>
        (b(i) & 0xFF) == 0x83 && (b(i + 1) & 0xFF) == 0x81 &&
        (b(i + 2) & 0xFF) == 0x01).get
      b(i + 2) = 0x02
      b
    }
    val e3 = intercept[IllegalArgumentException](
      Codecs.decodeWebmMeta(audioOnlyWebm))
    assert(e3.getMessage.contains("video"), e3.getMessage)
  }

  test("MP3 frame-header walk: CBR timing exact; ID3v2/v1 tags skipped; " +
       "lost sync, mid-stream rate change and truncation fail loudly") {
    val bytes = Codecs.encodeMp3Cbr(44100, 128, nFrames = 38)
    val m = Codecs.decodeMp3Meta(bytes)
    assert(m.sampleRate == 44100 && m.nFrames == 38 && !m.vbr)
    assert(m.meanBitrateKbps == 128.0)
    // 38 frames * 1152 samples at 44100 Hz = 992.6... ms, floored in Long
    assert(m.durationMs == 38L * 1152000L / 44100L)
    // every (rate, kbps) pair the table synthesizes walks exactly
    for (rate <- Seq(44100, 48000, 32000); kbps <- Seq(96, 128, 192, 320)) {
      val mm = Codecs.decodeMp3Meta(Codecs.encodeMp3Cbr(rate, kbps, 7))
      assert(mm.sampleRate == rate && mm.nFrames == 7 &&
        mm.meanBitrateKbps == kbps.toDouble, s"($rate, $kbps)")
    }
    // ID3v2 prefix (synchsafe size) and ID3v1 trailer are skipped
    val id3v2 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 1, 5) ++
      new Array[Byte](128 + 5) // size = 1<<7 | 5 = 133 payload bytes
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val tagged = id3v2 ++ bytes ++ id3v1
    val mt = Codecs.decodeMp3Meta(tagged)
    assert(mt.nFrames == 38 && mt.sampleRate == 44100)
    // VBR: frames at two bitrates → mean between them, vbr flag set
    val vbr = Codecs.encodeMp3Cbr(44100, 96, 5) ++
      Codecs.encodeMp3Cbr(44100, 192, 5)
    val mv = Codecs.decodeMp3Meta(vbr)
    assert(mv.vbr && mv.nFrames == 10 && mv.meanBitrateKbps == 144.0)
    // lost sync: named error with the offset, no silent resync
    val bad = bytes.clone(); bad(0) = 0x00
    val e1 = intercept[IllegalArgumentException](Codecs.decodeMp3Meta(bad))
    assert(e1.getMessage.contains("sync"), e1.getMessage)
    // truncated final frame: named
    val e2 = intercept[IllegalArgumentException](Codecs.decodeMp3Meta(
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 10)))
    assert(e2.getMessage.contains("MP3"), e2.getMessage)
    // a mid-stream sample-rate change is corruption, not a feature
    val mixed = Codecs.encodeMp3Cbr(44100, 128, 3) ++
      Codecs.encodeMp3Cbr(48000, 128, 3)
    val e3 = intercept[IllegalArgumentException](Codecs.decodeMp3Meta(mixed))
    assert(e3.getMessage.contains("sample rate"), e3.getMessage)
  }

  test("permissive image decode quarantines corrupt payloads per-row") {
    val spark0 = SparkTest.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "x"), (7L, "y"), (14L, "z"))
      .toDF("doc_id", "text")
    val media = graft.ext.Multimodal.pngTable(docs)
      .withColumn("media",
        when(col("doc_id") % 7 === 0, encode(lit("junk"), "UTF-8"))
          .otherwise(col("media")))
    val out = graft.ext.Multimodal.imageFeaturesPermissive(media)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)), Option(r.getString(5)))).toMap
    assert(out(1L)._1 && out(1L)._2.contains(5) && out(1L)._3.isEmpty)
    assert(!out(7L)._1 && out(7L)._2.isEmpty &&
      out(7L)._3.contains("undecodable"))
    assert(!out(14L)._1)
  }

  test("NormalizeText: NFC composes combining marks and compatibility singletons") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextExpressions
    val spark0 = SparkTest.spark
    import spark0.implicits._
    val df = Seq("cafe\u0301 \u212B \ufb01").toDF("t")
    val nfc = df.select(TextExpressions.normalize(col("t"), "NFC"))
      .collect().head.getString(0)
    assert(nfc == "caf\u00e9 \u00c5 \ufb01") // e+acute -> é, angstrom -> Å, fi ligature kept
    val nfkc = df.select(TextExpressions.normalize(col("t"), "NFKC"))
      .collect().head.getString(0)
    assert(nfkc == "caf\u00e9 \u00c5 fi") // NFKC also folds the ligature
  }

  test("dHash is codec-invariant: the same pixels through BMP and PNG hash identically") {
    // the point of a perceptual hash \u2014 a re-encoded upload is the same
    // image; both containers are lossless so the hashes must be EQUAL
    import graft.ext.Multimodal
    val docs = Tables(SparkTest.spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    def hashes(media: org.apache.spark.sql.DataFrame) =
      Multimodal.imageDhash(media).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaBmp = hashes(Multimodal.bmpTable(docs))
    val viaPng = hashes(Multimodal.pngTable(docs))
    assert(viaBmp.size == 50 && viaBmp == viaPng)
    // and distinct noise images get distinct hashes (no degenerate bits)
    val noise = hashes(Multimodal.noiseBmpTable(docs))
    assert(noise.values.toSet.size == 50)
  }

  test("audio fingerprint is sample-rate-invariant: same samples relabeled at " +
       "another rate hash identically") {
    import graft.ext.Multimodal
    import org.apache.spark.sql.functions.col
    val spark = SparkTest.spark
    import spark.implicits._
    val samples = Array.tabulate(777)(i => ((i * 131) % 4001 - 2000).toShort)
    val media = Seq(
      (1L, Codecs.encodeWavPcm16(samples, 8000)),
      (2L, Codecs.encodeWavPcm16(samples, 44100))).toDF("doc_id", "media")
    val fp = Multimodal.audioFingerprint(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fp(1L) == fp(2L), "rate relabeling changed the fingerprint")
    // a genuinely different signal must not collide
    val other = Seq((3L, Codecs.encodeWavPcm16(
      Array.tabulate(777)(i => ((i * 37 + 5) % 4001 - 2000).toShort), 8000)))
      .toDF("doc_id", "media")
    val fp3 = Multimodal.audioFingerprint(other).collect().head.getLong(1)
    assert(fp3 != fp(1L))
  }
}

package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal column operators — real
  * decoders, not stubs, two tiers:
  *
  *  - hand-rolled byte-level parsers for RIFF/WAVE PCM audio and
  *    uncompressed 24-bit BMP — fully specified layouts whose decode an
  *    oracle can recompute closed-form, so they anchor the bit-exact
  *    correctness queries;
  *  - the JDK's own `javax.imageio` (java.desktop, pure Java, headless)
  *    for JPEG/PNG/GIF/TIFF — no native libraries involved, so the
  *    dominant crawl-scale image formats decode for real in any stock
  *    JVM. PNG is lossless, hence also closed-form checkable; JPEG decode
  *    is verified on its lossless properties (dimensions, pixel counts).
  *
  * WebP and compressed audio have no JDK decoder and stay opaque
  * ([[Multimodal.byteStats]]).
  *
  * The byte-level decoders validate magic numbers, walk the real
  * chunk/header structure, honor little-endian layout, BMP row padding
  * and bottom-up row order — the parts a hand-rolled parser usually gets
  * wrong — and throw `IllegalArgumentException` with a specific message
  * on malformed input (surfaced through the engine's error provenance
  * when run inside a wrangle).
  */
object Codecs {

  // ------------------------------------------------------------ gzip

  /** Gzip-compress a byte payload (java.util.zip — pure JVM). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val out = new java.util.zip.GZIPOutputStream(bos)
    out.write(bytes); out.close()
    bos.toByteArray
  }

  /** Decompress a gzip payload, including MULTI-MEMBER files (the shape
    * real web-crawl archives ship — concatenated gzip members —
    * GZIPInputStream handles member chaining itself). Fails loudly on a
    * bad magic or truncated stream. */
  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    require(bytes != null && bytes.length >= 2 &&
      (bytes(0) & 0xFF) == 0x1f && (bytes(1) & 0xFF) == 0x8b,
      "gzip: missing 1f8b magic")
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readAllBytes()
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(s"gzip: corrupt stream: ${e.getMessage}")
    } finally in.close()
  }

  // ------------------------------------------------------------- WAV

  /** Decoded PCM audio: interleaved samples widened to Int
    * (8-bit unsigned → 0..255, 16-bit signed → -32768..32767). */
  final case class WavAudio(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, samples: Array[Int])

  /** Encode 16-bit signed PCM as a canonical RIFF/WAVE file. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
                     channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Parse a RIFF/WAVE container: walks the chunk list (tolerating extra
    * chunks like LIST/INFO before or after `data`), requires PCM
    * (format tag 1) at 8 or 16 bits. */
  def decodeWav(bytes: Array[Byte]): WavAudio = {
    require(bytes != null && bytes.length >= 44, "WAV: truncated header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "WAV: missing RIFF magic")
    buf.getInt() // declared riff size; trust actual buffer instead
    require(fourCC() == "WAVE", "WAV: missing WAVE form type")
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Int] = null
    while (buf.remaining() >= 8) {
      val id = fourCC()
      val size = buf.getInt()
      require(size >= 0 && size <= buf.remaining(),
        s"WAV: chunk '$id' overruns file")
      val next = buf.position() + size + (size & 1) // chunks are word-aligned
      id match {
        case "fmt " =>
          require(size >= 16, "WAV: fmt chunk too small")
          val tag = buf.getShort()
          require(tag == 1, s"WAV: only PCM supported, got format tag $tag")
          channels = buf.getShort()
          rate = buf.getInt()
          buf.getInt()   // byte rate
          buf.getShort() // block align
          bits = buf.getShort()
          require(bits == 8 || bits == 16, s"WAV: unsupported bit depth $bits")
          require(channels > 0, "WAV: zero channels")
        case "data" =>
          require(bits > 0, "WAV: data chunk before fmt chunk")
          val n = if (bits == 16) size / 2 else size
          samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) = if (bits == 16) buf.getShort().toInt
                         else buf.get() & 0xFF
            i += 1
          }
        case _ => // skip LIST/INFO/fact/... chunks
      }
      buf.position(math.min(next, bytes.length))
    }
    require(samples != null, "WAV: no data chunk")
    WavAudio(rate, channels, bits, samples)
  }

  // ------------------------------------------------------------- BMP

  /** Decoded 24-bit image: `rgb(y * width + x)` packed 0xRRGGBB,
    * top-down regardless of the file's row order. */
  final case class BmpImage(width: Int, height: Int, rgb: Array[Int])

  /** Encode a 24-bit uncompressed bottom-up BMP (BITMAPINFOHEADER). */
  def encodeBmp24(width: Int, height: Int,
                  pixel: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val dataLen = rowBytes * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
    buf.putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(width).putInt(height) // positive height = bottom-up
    buf.putShort(1).putShort(24).putInt(0)      // planes, bpp, BI_RGB
    buf.putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        buf.put((p & 0xFF).toByte)         // B
        buf.put(((p >> 8) & 0xFF).toByte)  // G
        buf.put(((p >> 16) & 0xFF).toByte) // R
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Walk a 24-bit BGR DIB pixel grid (4-byte-padded rows) starting at
    * `dataOffset` — the shared kernel of [[decodeBmp24]] and the raw-DIB
    * AVI frame decoder (an uncompressed AVI frame IS a headerless DIB). */
  private def readDib24(bytes: Array[Byte], dataOffset: Int,
                        width: Int, height: Int, topDown: Boolean): Array[Int] = {
    // ALL size arithmetic in Long BEFORE any Int narrowing: a crafted
    // width near Int.Max would wrap `rowBytes.toInt` negative and slip
    // past the overrun check, crashing later with a raw array exception
    // (or a multi-GB allocation) instead of this loud contract failure.
    val rowBytesL = (width.toLong * 3 + 3) & ~3L
    require(width > 0 && height > 0, "DIB: non-positive dimensions")
    require(width.toLong * height <= Int.MaxValue &&
      rowBytesL * height <= bytes.length - dataOffset.toLong &&
      dataOffset >= 0,
      "DIB: declared dimensions exceed payload size")
    val rowBytes = rowBytesL.toInt
    val rgb = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var off = dataOffset + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val b = bytes(off) & 0xFF
        val g = bytes(off + 1) & 0xFF
        val r = bytes(off + 2) & 0xFF
        rgb(y * width + x) = (r << 16) | (g << 8) | b
        off += 3
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** Encode a headerless bottom-up 24-bit DIB frame (the payload of an
    * uncompressed AVI `00db` chunk). */
  def encodeDib24(width: Int, height: Int,
                  pixel: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val buf = ByteBuffer.allocate(rowBytes * height).order(ByteOrder.LITTLE_ENDIAN)
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = pixel(x, y)
        buf.put((p & 0xFF).toByte)
        buf.put(((p >> 8) & 0xFF).toByte)
        buf.put(((p >> 16) & 0xFF).toByte)
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a raw AVI DIB frame using the stream header's dimensions
    * (bounds-checked against the frame payload in [[readDib24]]). */
  def decodeDib24(frame: Array[Byte], width: Int, height: Int): BmpImage =
    BmpImage(width, height, readDib24(frame, 0, width, height, topDown = false))

  /** Parse an uncompressed 24-bit BMP: honors the declared pixel-data
    * offset, 4-byte row padding, and both bottom-up (height > 0) and
    * top-down (height < 0) row orders. */
  def decodeBmp24(bytes: Array[Byte]): BmpImage = {
    require(bytes != null && bytes.length >= 54, "BMP: truncated header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "BMP: missing BM magic")
    buf.getInt(); buf.getInt()
    val dataOffset = buf.getInt()
    val headerSize = buf.getInt()
    require(headerSize >= 40, s"BMP: unsupported header size $headerSize")
    val width = buf.getInt()
    val rawHeight = buf.getInt()
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    buf.getShort()
    val bpp = buf.getShort()
    require(bpp == 24, s"BMP: only 24-bit supported, got $bpp")
    val compression = buf.getInt()
    require(compression == 0, s"BMP: only BI_RGB supported, got $compression")
    require(width > 0 && height > 0, "BMP: non-positive dimensions")
    // Bound dims by what the file could physically hold BEFORE any size
    // arithmetic: a crafted width near Int.Max would wrap `width * 3 + 3`
    // negative and slip past the overrun check below, crashing later with
    // a raw array exception instead of this loud contract failure.
    require(width <= bytes.length / 3 + 1 && height <= bytes.length,
      "BMP: declared dimensions exceed file size")
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"BMP: bad pixel-data offset $dataOffset")
    val rowBytes = ((width.toLong * 3 + 3) & ~3L).toInt
    require(dataOffset + rowBytes.toLong * height <= bytes.length,
      "BMP: pixel data overruns file")
    BmpImage(width, height,
      readDib24(bytes, dataOffset, width, height, topDown))
  }

  // ------------------------------------------------------------- AVI

  /** Decoded AVI video: stream fourcc (`DIB ` = raw 24-bit frames,
    * `MJPG` = one JPEG per frame) and the undecoded frame payloads —
    * per-frame pixel decode is the caller's dispatch
    * ([[decodeVideoFrame]]), so sampling can skip frames without paying
    * their decode. */
  final case class AviVideo(width: Int, height: Int, usecPerFrame: Int,
                            fourcc: String, frames: Vector[Array[Byte]])

  private def fourCCBytes(s: String): Array[Byte] = {
    require(s.length == 4, s"AVI: fourcc must be 4 chars, got '$s'")
    s.getBytes("US-ASCII")
  }

  /** Encode a minimal valid AVI: RIFF/`AVI ` form, `hdrl` LIST with the
    * main (`avih`) and stream (`strh`/`strf`) headers, `movi` LIST with
    * one `00db`/`00dc` chunk per frame. `DIB ` payloads are headerless
    * bottom-up 24-bit DIBs ([[encodeDib24]]); `MJPG` payloads are whole
    * JPEG files ([[encodeJpeg]]). */
  def encodeAvi(width: Int, height: Int, usecPerFrame: Int, fourcc: String,
                frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1 // RIFF chunks are word-aligned
      val buf = ByteBuffer.allocate(8 + body.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put(fourCCBytes(id)).putInt(body.length).put(body)
      buf.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourCCBytes(kind) ++ body)
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usecPerFrame).putInt(0).putInt(0).putInt(0)
      b.putInt(frames.length).putInt(0).putInt(1).putInt(0)
      b.putInt(width).putInt(height)
      b.array() // 4 reserved ints stay zero
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put(fourCCBytes("vids")).put(fourCCBytes(fourcc))
      b.putInt(0).putShort(0).putShort(0).putInt(0)
      b.putInt(usecPerFrame) // scale
      b.putInt(1000000)      // rate: rate/scale = fps
      b.putInt(0).putInt(frames.length)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
      b.putShort(1).putShort(24)
      b.put(if (fourcc == "DIB ") Array[Byte](0, 0, 0, 0)
            else fourCCBytes(fourcc))
      b.array()
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameId = if (fourcc == "DIB ") "00db" else "00dc"
    val movi = list("movi",
      frames.iterator.flatMap(f => chunk(frameId, f)).toArray)
    chunk("RIFF", fourCCBytes("AVI ") ++ hdrl ++ movi)
  }

  /** Parse an AVI container: top-level RIFF walk, `hdrl` for dimensions /
    * frame period / stream fourcc, `movi` for the frame payloads
    * (`##db`/`##dc` chunks, nested `rec ` LISTs included). Tolerates and
    * skips unknown chunks (`idx1`, `JUNK`, vendor LISTs) like the WAV
    * parser does. */
  def decodeAvi(bytes: Array[Byte]): AviVideo = {
    require(bytes != null && bytes.length >= 24, "AVI: truncated header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(fourCC() == "RIFF", "AVI: missing RIFF magic")
    buf.getInt()
    require(fourCC() == "AVI ", "AVI: missing 'AVI ' form type")
    var width = -1; var height = -1; var usecPerFrame = -1
    var fourcc: String = null
    var streamIdx = 0        // strh chunks appear once per stream, in order
    var videoStream = ""     // the FIRST video stream's 2-digit chunk prefix
    val frames = Vector.newBuilder[Array[Byte]]
    // Two passes so an out-of-order container (movi LIST before hdrl —
    // nonstandard but parseable) still yields its frames: headers first,
    // then frame collection with the video stream's prefix known.
    def walk(end: Int, inMovi: Boolean, collectFrames: Boolean): Unit = {
      while (buf.position() + 8 <= end) {
        val id = fourCC()
        val size = buf.getInt()
        // Long arithmetic: a crafted size near Int.MaxValue must trip this
        // guard, not wrap negative and reach the frame-payload allocation
        // (same overflow discipline as readDib24's row math).
        require(size >= 0 && buf.position().toLong + size <= end,
          s"AVI: chunk '$id' overruns container")
        val next = (buf.position().toLong + size + (size & 1)).min(end.toLong).toInt
        id match {
          case "LIST" =>
            val kind = fourCC()
            walk(buf.position() + size - 4,
              inMovi || kind == "movi", // 'rec ' groups nest inside movi
              collectFrames)
          case "avih" if !collectFrames =>
            require(size >= 40, "AVI: avih too small")
            usecPerFrame = buf.getInt()
            buf.getInt(); buf.getInt(); buf.getInt(); buf.getInt()
            buf.getInt(); buf.getInt(); buf.getInt()
            width = buf.getInt(); height = buf.getInt()
          case "strh" if !collectFrames =>
            require(size >= 8, "AVI: strh too small")
            val kind = fourCC()
            val handler = fourCC()
            if (kind == "vids" && fourcc == null) {
              fourcc = handler
              videoStream = f"$streamIdx%02d"
            }
            streamIdx += 1
          // frames of OTHER streams (a second video, audio '##wb') must
          // not interleave into this stream's frame list
          case f if collectFrames && inMovi && f.length == 4 &&
              videoStream.nonEmpty && f.startsWith(videoStream) &&
              (f.endsWith("db") || f.endsWith("dc")) =>
            val payload = new Array[Byte](size)
            buf.get(payload)
            frames += payload
          case _ => // idx1 / JUNK / strf (dims already in avih) / audio
        }
        buf.position(math.min(next, end))
      }
    }
    val moviStart = buf.position()
    walk(bytes.length, inMovi = false, collectFrames = false)
    buf.position(moviStart)
    walk(bytes.length, inMovi = false, collectFrames = true)
    require(width > 0 && height > 0, "AVI: missing or invalid avih header")
    require(fourcc != null, "AVI: no video stream header")
    AviVideo(width, height, usecPerFrame, fourcc, frames.result())
  }

  /** Decode one AVI frame payload by the stream's fourcc: raw DIB frames
    * through the byte kernel, MJPEG (and any other ImageIO-decodable
    * per-frame codec) through [[decodeImage]]. */
  def decodeVideoFrame(video: AviVideo, idx: Int): BmpImage =
    video.fourcc match {
      case "DIB " => decodeDib24(video.frames(idx), video.width, video.height)
      case _      => decodeImage(video.frames(idx))
    }

  // ----------------------------------------------------- MP4 (ISO-BMFF)

  /** A parsed MP4 video track: dimensions, timing, the sample-entry
    * codec, and the sample TABLE (absolute byte ranges into the original
    * buffer) — frames are sliced on demand by [[mp4SampleBytes]], so
    * sampling every Nth frame of a long video never materializes the
    * unsampled payloads (the point of ISO-BMFF's `stbl`: the container
    * walk is table arithmetic, not a scan of `mdat`). */
  final case class Mp4Video(width: Int, height: Int, timescale: Long,
                            sampleDelta: Long, fourcc: String,
                            sampleOffsets: Array[Long],
                            sampleSizes: Array[Int],
                            bytes: Array[Byte]) {
    def numSamples: Int = sampleSizes.length
    def msPerFrame: Long =
      math.max(sampleDelta * 1000L / math.max(timescale, 1L), 1L)
  }

  /** Slice sample `idx`'s bytes out of `mdat` by the sample table. */
  def mp4SampleBytes(video: Mp4Video, idx: Int): Array[Byte] = {
    val off = video.sampleOffsets(idx)
    val len = video.sampleSizes(idx)
    require(off >= 0 && len >= 0 && off + len <= video.bytes.length,
      s"MP4: sample $idx range [$off, ${off + len}) outside file")
    java.util.Arrays.copyOfRange(video.bytes, off.toInt, (off + len).toInt)
  }

  /** Decode one MP4 sample by the track's sample-entry fourcc: per-frame
    * still-image codecs (`jpeg`/`mjpa`/`mjpb`/`png `) decode through the
    * existing ImageIO path; inter-frame codecs (avc1/hev1/vp09…) have no
    * pure-JVM decoder and fail LOUDLY here — route those payloads to
    * [[Multimodal.byteStats]] instead, like WebP. */
  def decodeMp4Frame(video: Mp4Video, idx: Int): BmpImage =
    video.fourcc match {
      case "jpeg" | "mjpa" | "mjpb" | "png " =>
        decodeImage(mp4SampleBytes(video, idx))
      case other => throw new IllegalArgumentException(
        s"MP4: no pure-JVM decoder for sample codec '$other' — " +
          "use byteStats for inter-frame codecs")
    }

  // --- ISO-BMFF muxer primitives shared by encodeMp4 / encodeFmp4 ---
  private def be(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray
  private def u32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()
  private def u64(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).putLong(v).array()
  private def u16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def isoBox(tp: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be(u32(8L + body.length), fourCCBytes(tp), body)
  }
  private def isoFull(tp: String, payload: Array[Byte]*): Array[Byte] =
    isoBox(tp, (u32(0) +: payload): _*) // version 0, flags 0
  private def isoFullF(tp: String, flags: Int, payload: Array[Byte]*): Array[Byte] =
    isoBox(tp, (u32(flags.toLong & 0xFFFFFF) +: payload): _*) // version 0
  private val identityMatrix = be(u32(0x10000), u32(0), u32(0), u32(0),
    u32(0x10000), u32(0), u32(0), u32(0), u32(0x40000000L))
  /** VisualSampleEntry: 8 header + 6 reserved + 2 dataref + 16
    * predefined/reserved + w/h + 72 dpi + reserved + frame_count +
    * 32-byte compressorname + depth + predefined(-1) = 86 bytes */
  private def visualSampleEntry(fourcc: String, width: Int, height: Int): Array[Byte] = {
    val entry = be(fourCCBytes(fourcc), new Array[Byte](6), u16(1),
      new Array[Byte](16), u16(width), u16(height),
      u32(0x480000), u32(0x480000), u32(0), u16(1),
      new Array[Byte](32), u16(24), u16(0xFFFF))
    be(u32(8L + entry.length), entry)
  }
  private def isoTrakBoxes(width: Int, height: Int, timescale: Long,
                           duration: Long, stbl: Array[Byte]): Array[Byte] = {
    val minf = isoBox("minf",
      isoFull("vmhd", new Array[Byte](8)), // flags should be 1; readers don't care
      isoBox("dinf", isoFull("dref", u32(1), be(u32(12), fourCCBytes("url "), u32(1)))),
      stbl)
    val mdia = isoBox("mdia",
      isoFull("mdhd", u32(0), u32(0), u32(timescale), u32(duration),
        u16(0x55c4), u16(0)),
      isoFull("hdlr", u32(0), fourCCBytes("vide"), new Array[Byte](12),
        Array[Byte](0)),
      minf)
    val tkhd = isoFull("tkhd", u32(0), u32(0), u32(1), u32(0), u32(duration),
      new Array[Byte](8), u16(0), u16(0), u16(0), u16(0), identityMatrix,
      u32(width.toLong << 16), u32(height.toLong << 16))
    isoBox("trak", tkhd, mdia)
  }
  private def isoMvhd(timescale: Long, duration: Long): Array[Byte] =
    isoFull("mvhd", u32(0), u32(0), u32(timescale), u32(duration),
      u32(0x10000), u16(0x100), u16(0), new Array[Byte](8),
      identityMatrix, new Array[Byte](24), u32(2))

  /** Encode a minimal valid ISO-BMFF MP4: `ftyp`, `mdat` holding the
    * concatenated samples, then `moov` with one video `trak` —
    * `tkhd` (dimensions), `mdhd` (timescale), `hdlr` (vide), and a full
    * `stbl` sample table (`stsd` visual sample entry with the given
    * codec fourcc, `stts` constant delta, `stsc` chunk runs, `stsz`
    * per-sample sizes, `stco`/`co64` absolute chunk offsets). `mdat`
    * precedes `moov` so the chunk offsets are known before the table is
    * written — the layout real muxers emit for the same reason.
    *
    * `samplesPerChunk` splits the samples into chunks (must sum to
    * `samples.length`; empty = one chunk) — consecutive equal counts
    * compress into one `stsc` run exactly as the spec prescribes, so a
    * layout like Seq(2,1,1) emits the multi-run table real muxers do.
    * `co64 = true` writes 64-bit chunk offsets instead of `stco`. */
  def encodeMp4(width: Int, height: Int, timescale: Long, sampleDelta: Long,
                fourcc: String, samples: Seq[Array[Byte]],
                samplesPerChunk: Seq[Int] = Nil,
                co64: Boolean = false): Array[Byte] = {
    val layout = if (samplesPerChunk.isEmpty) Seq(samples.length)
                 else samplesPerChunk
    require(layout.sum == samples.length && layout.forall(_ > 0),
      s"MP4: chunk layout $layout must partition ${samples.length} samples")
    val duration = sampleDelta * samples.length
    val ftyp = isoBox("ftyp", fourCCBytes("isom"), u32(0x200),
      fourCCBytes("isom"), fourCCBytes("iso2"))
    val mdat = isoBox("mdat", samples.flatten.toArray)
    val firstSampleOffset = ftyp.length + 8L // past mdat's own header
    // chunk byte offsets: cumulative sample bytes at each chunk boundary
    val chunkFirstSample = layout.scanLeft(0)(_ + _).init
    val chunkOffsets = chunkFirstSample.map(fs =>
      firstSampleOffset + samples.take(fs).map(_.length.toLong).sum)
    // stsc runs: RLE over samples-per-chunk, 1-based first_chunk
    val runs = layout.zipWithIndex.foldLeft(Vector.empty[(Int, Int)]) {
      case (acc, (spc, i)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc
        else acc :+ ((i + 1, spc))
    }
    val stbl = isoBox("stbl",
      isoFull("stsd", u32(1), visualSampleEntry(fourcc, width, height)),
      isoFull("stts", u32(1), u32(samples.length), u32(sampleDelta)),
      isoFull("stsc", u32(runs.length),
        be(runs.map { case (fc, spc) => be(u32(fc), u32(spc), u32(1)) }: _*)),
      isoFull("stsz", u32(0), u32(samples.length),
        be(samples.map(s => u32(s.length)): _*)),
      if (co64) isoFull("co64", u32(chunkOffsets.length),
        be(chunkOffsets.map(u64): _*))
      else isoFull("stco", u32(chunkOffsets.length),
        be(chunkOffsets.map(u32): _*)))
    val moov = isoBox("moov", isoMvhd(timescale, duration),
      isoTrakBoxes(width, height, timescale, duration, stbl))
    be(ftyp, mdat, moov)
  }

  /** Encode a fragmented (DASH-style) MP4: `ftyp`, a `moov` whose `stbl`
    * is EMPTY (zero-entry stts/stsc/stsz/stco) plus `mvex`/`trex` declaring
    * the movie fragmented, then one `moof`+`mdat` pair per fragment. Each
    * `moof` carries `mfhd` (sequence number) and one `traf` with `tfhd`
    * (default-base-is-moof + default-sample-duration) and a `trun` holding
    * the data offset and per-sample sizes — the exact layout DASH segment
    * muxers emit. */
  def encodeFmp4(width: Int, height: Int, timescale: Long, sampleDelta: Long,
                 fourcc: String, samples: Seq[Array[Byte]],
                 samplesPerFragment: Int): Array[Byte] = {
    require(samplesPerFragment > 0, "MP4: samplesPerFragment must be positive")
    val ftyp = isoBox("ftyp", fourCCBytes("iso5"), u32(0x200),
      fourCCBytes("iso5"), fourCCBytes("dash"))
    val emptyStbl = isoBox("stbl",
      isoFull("stsd", u32(1), visualSampleEntry(fourcc, width, height)),
      isoFull("stts", u32(0)),
      isoFull("stsc", u32(0)),
      isoFull("stsz", u32(0), u32(0)),
      isoFull("stco", u32(0)))
    val mvex = isoBox("mvex",
      // trex: track_ID=1, default_sample_description_index=1,
      // default duration/size/flags
      isoFull("trex", u32(1), u32(1), u32(sampleDelta), u32(0), u32(0)))
    val moov = isoBox("moov", isoMvhd(timescale, 0L),
      mvex, isoTrakBoxes(width, height, timescale, 0L, emptyStbl))
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    var decodeTime = 0L
    for ((frag, seq) <- samples.grouped(samplesPerFragment).zipWithIndex) {
      // tfhd: default-base-is-moof (0x020000) + default-sample-duration (0x08)
      val tfhd = isoFullF("tfhd", 0x020008, u32(1), u32(sampleDelta))
      val tfdt = isoFull("tfdt", u32(decodeTime))
      // trun: data-offset-present (0x01) + sample-size-present (0x200);
      // the offset is patched below once the moof size is known
      def trun(dataOff: Long) = isoFullF("trun", 0x201, u32(frag.length),
        u32(dataOff), be(frag.map(s => u32(s.length)): _*))
      def moofOf(dataOff: Long) = isoBox("moof",
        isoFull("mfhd", u32(seq + 1L)),
        isoBox("traf", tfhd, tfdt, trun(dataOff)))
      // data starts right after moof + mdat's 8-byte header, relative to
      // moof start (default-base-is-moof); size is offset-independent
      val moofSize = moofOf(0L).length
      out.write(moofOf(moofSize + 8L))
      out.write(isoBox("mdat", frag.flatten.toArray))
      decodeTime += sampleDelta.toLong * frag.length
    }
    out.toByteArray
  }

  /** Parse an ISO-BMFF MP4: box walk (32-bit and 64-bit `largesize`
    * forms), first `vide`-handler track wins; dimensions from its sample
    * entry (tkhd's 16.16 values as fallback), timing from `mdhd`+`stts`,
    * and the per-sample byte ranges reconstructed from
    * `stsc`×`stco`/`co64`×`stsz` exactly as the spec's chunk-run
    * arithmetic defines them. Unknown boxes skip (like the AVI walk);
    * all size arithmetic runs in Long against untrusted headers. */
  def decodeMp4(bytes: Array[Byte]): Mp4Video = {
    require(bytes != null && bytes.length >= 16, "MP4: truncated file")
    require(!(bytes(0) == 0x1A.toByte && bytes(1) == 0x45.toByte &&
              bytes(2) == 0xDF.toByte && bytes(3) == 0xA3.toByte),
      "MP4: EBML magic — WebM/Matroska container unsupported, route the " +
        "payload to byteStats")
    val buf = ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
    def typeAt(off: Long): String =
      new String(bytes, off.toInt + 4, 4, "US-ASCII")
    // (boxType, boxStart, payloadStart, payloadEnd) for each box in [start, end)
    def children(start: Long, end: Long): Seq[(String, Long, Long, Long)] = {
      val out = Seq.newBuilder[(String, Long, Long, Long)]
      var off = start
      while (off + 8 <= end) {
        val size32 = buf.getInt(off.toInt).toLong & 0xFFFFFFFFL
        val tp = typeAt(off)
        val (size, headerLen) =
          if (size32 == 1) {
            require(off + 16 <= end, s"MP4: truncated largesize box '$tp'")
            (buf.getLong(off.toInt + 8), 16L)
          } else if (size32 == 0) (end - off, 8L)
          else (size32, 8L)
        require(size >= headerLen && off + size <= end,
          s"MP4: box '$tp' overruns container")
        out += ((tp, off, off + headerLen, off + size))
        off += size
      }
      out.result()
    }
    def child(boxes: Seq[(String, Long, Long, Long)], tp: String): Option[(Long, Long)] =
      boxes.collectFirst { case (`tp`, _, s, e) => (s, e) }
    def u32At(off: Long): Long = buf.getInt(off.toInt).toLong & 0xFFFFFFFFL
    val topBoxes = children(0L, bytes.length.toLong)
    require(topBoxes.exists(_._1 == "ftyp") || typeAt(0) == "moov",
      "MP4: missing ftyp/moov — not ISO-BMFF")
    val (moovS, moovE) = child(topBoxes, "moov")
      .getOrElse(throw new IllegalArgumentException("MP4: no moov box"))
    val moovKids = children(moovS, moovE)
    val videoTrak = moovKids
      .collect { case ("trak", _, s, e) => children(s, e) }
      .find { trakKids =>
        child(trakKids, "mdia").exists { case (ms, me) =>
          child(children(ms, me), "hdlr").exists { case (hs, _) =>
            new String(bytes, hs.toInt + 8, 4, "US-ASCII") == "vide"
          }
        }
      }
      .getOrElse(throw new IllegalArgumentException("MP4: no video track"))
    // track_ID — fragments address their track by it (tkhd v0: +12, v1: +20)
    val trackId = child(videoTrak, "tkhd").map { case (s, _) =>
      val version = bytes(s.toInt) & 0xFF
      u32At(if (version == 1) s + 20 else s + 12)
    }.getOrElse(1L)
    val (mdiaS, mdiaE) = child(videoTrak, "mdia").get
    val mdiaKids = children(mdiaS, mdiaE)
    val timescale = child(mdiaKids, "mdhd").map { case (s, _) =>
      val version = bytes(s.toInt) & 0xFF
      // v0: creation/modification are u32 → timescale at +12; v1: u64s → +20
      u32At(if (version == 1) s + 20 else s + 12)
    }.getOrElse(throw new IllegalArgumentException("MP4: no mdhd box"))
    val (minfS, minfE) = child(mdiaKids, "minf")
      .getOrElse(throw new IllegalArgumentException("MP4: no minf box"))
    val (stblS, stblE) = child(children(minfS, minfE), "stbl")
      .getOrElse(throw new IllegalArgumentException("MP4: no stbl box"))
    val stbl = children(stblS, stblE)
    def table(tp: String): (Long, Long) = child(stbl, tp).getOrElse(
      throw new IllegalArgumentException(s"MP4: no $tp box"))
    // stsd: first visual sample entry → codec fourcc + exact dimensions
    val (stsdS, stsdE) = table("stsd")
    require(buf.getInt(stsdS.toInt + 4) >= 1, "MP4: empty stsd")
    val entryS = stsdS + 8
    require(entryS + 36 <= stsdE, "MP4: stsd entry truncated")
    val fourcc = typeAt(entryS)
    val width = buf.getShort(entryS.toInt + 32).toInt & 0xFFFF
    val height = buf.getShort(entryS.toInt + 34).toInt & 0xFFFF
    // stsz sample count decides the path: a zero-sample stbl next to
    // mvex/moof is a FRAGMENTED movie whose samples live in moof/trun
    val (stszS, stszE) = table("stsz")
    val constSize = u32At(stszS + 4)
    val nSamples = buf.getInt(stszS.toInt + 8)
    val mvex = child(moovKids, "mvex")
    val hasMoof = topBoxes.exists(_._1 == "moof")
    if (nSamples == 0 && (mvex.isDefined || hasMoof)) {
      require(hasMoof,
        "MP4: fragmented movie (mvex) with no moof fragments — nothing to decode")
      // trex: per-track defaults the fragments inherit
      val (trexDur, trexSize) = mvex.flatMap { case (s, e) =>
        children(s, e).collectFirst {
          case ("trex", _, ts, _) if u32At(ts + 4) == trackId =>
            (u32At(ts + 12), u32At(ts + 16))
        }
      }.getOrElse((0L, 0L))
      val offB = Array.newBuilder[Long]
      val szB = Array.newBuilder[Int]
      var firstDelta = 0L
      for ((tp, moofStart, moofPS, moofPE) <- topBoxes if tp == "moof") {
        for ((trafS, trafE) <- children(moofPS, moofPE)
               .collect { case ("traf", _, s, e) => (s, e) }) {
          val kids = children(trafS, trafE)
          val (tfhdS, _) = child(kids, "tfhd").getOrElse(
            throw new IllegalArgumentException("MP4: traf missing tfhd"))
          val tfFlags = buf.getInt(tfhdS.toInt) & 0xFFFFFF
          if (u32At(tfhdS + 4) == trackId) {
            var p = tfhdS + 8
            // base-data-offset-present beats default-base-is-moof; both
            // absent defaults to moof start for the first traf (spec 8.8.7)
            var base = moofStart
            if ((tfFlags & 0x01) != 0) { base = buf.getLong(p.toInt); p += 8 }
            if ((tfFlags & 0x02) != 0) p += 4 // sample-description-index
            var defDur = trexDur
            var defSize = trexSize
            if ((tfFlags & 0x08) != 0) { defDur = u32At(p); p += 4 }
            if ((tfFlags & 0x10) != 0) { defSize = u32At(p); p += 4 }
            // 0x20 default-sample-flags: skipped (no field to consume after)
            var running = base // truns without data-offset continue the last
            for ((trunS, _) <- kids.collect { case ("trun", _, s, e) => (s, e) }) {
              val trFlags = buf.getInt(trunS.toInt) & 0xFFFFFF
              val n = buf.getInt(trunS.toInt + 4)
              require(n >= 0, "MP4: trun sample count negative")
              var q = trunS + 8
              var off = running
              if ((trFlags & 0x01) != 0) {
                off = base + buf.getInt(q.toInt); q += 4 // SIGNED data offset
              }
              if ((trFlags & 0x04) != 0) q += 4 // first-sample-flags
              var i = 0
              while (i < n) {
                var dur = defDur
                var sz = defSize
                if ((trFlags & 0x100) != 0) { dur = u32At(q); q += 4 }
                if ((trFlags & 0x200) != 0) { sz = u32At(q); q += 4 }
                if ((trFlags & 0x400) != 0) q += 4 // sample-flags
                if ((trFlags & 0x800) != 0) q += 4 // composition offset
                require(sz > 0 && sz <= Int.MaxValue,
                  "MP4: fragment sample has no size (trun, tfhd and trex all silent)")
                require(off >= 0 && off + sz <= bytes.length,
                  s"MP4: fragment sample [$off, ${off + sz}) overruns file")
                if (firstDelta == 0L) firstDelta = dur
                offB += off
                szB += sz.toInt
                off += sz
                i += 1
              }
              running = off
            }
          }
        }
      }
      val sampleOffsets = offB.result()
      val sizes = szB.result()
      require(sampleOffsets.nonEmpty,
        "MP4: fragmented movie has no samples for the video track")
      return Mp4Video(width, height, timescale,
        if (firstDelta > 0) firstDelta else 1L, fourcc,
        sampleOffsets, sizes, bytes)
    }
    // --- progressive (non-fragmented) path ---
    // stts: constant frame period = the FIRST run's delta (variable
    // rate keeps frame 0's pacing, same contract as AVI usecPerFrame)
    val (sttsS, sttsE) = table("stts")
    require(buf.getInt(sttsS.toInt + 4) >= 1 && sttsS + 16 <= sttsE,
      "MP4: empty stts")
    val sampleDelta = u32At(sttsS + 12)
    // stsz: per-sample sizes (or one constant size)
    require(nSamples >= 0 && (constSize > 0 ||
        stszS + 12 + 4L * nSamples <= stszE), "MP4: stsz table truncated")
    val sizes = Array.tabulate(nSamples) { i =>
      val sz = if (constSize > 0) constSize else u32At(stszS + 12 + 4L * i)
      require(sz <= Int.MaxValue, s"MP4: sample $i size $sz unsupported")
      sz.toInt
    }
    // chunk offsets: stco (u32) or co64 (u64)
    val offsets: Array[Long] = child(stbl, "stco") match {
      case Some((s, e)) =>
        val n = buf.getInt(s.toInt + 4)
        require(n >= 0 && s + 8 + 4L * n <= e, "MP4: stco truncated")
        Array.tabulate(n)(i => u32At(s + 8 + 4L * i))
      case None =>
        val (s, e) = table("co64")
        val n = buf.getInt(s.toInt + 4)
        require(n >= 0 && s + 8 + 8L * n <= e, "MP4: co64 truncated")
        Array.tabulate(n)(i => buf.getLong((s + 8 + 8L * i).toInt))
    }
    // stsc: chunk runs → samples per chunk; walk runs accumulating each
    // sample's absolute offset (chunk base + preceding sizes in chunk)
    val (stscS, stscE) = table("stsc")
    val nRuns = buf.getInt(stscS.toInt + 4)
    require(nRuns >= 1 && stscS + 8 + 12L * nRuns <= stscE,
      "MP4: stsc truncated")
    val runs = Array.tabulate(nRuns) { i =>
      val base = (stscS + 8 + 12L * i).toInt
      (buf.getInt(base).toLong & 0xFFFFFFFFL,      // first_chunk (1-based)
       buf.getInt(base + 4).toLong & 0xFFFFFFFFL)  // samples_per_chunk
    }
    val sampleOffsets = new Array[Long](nSamples)
    var sample = 0
    var chunk = 0
    while (sample < nSamples && chunk < offsets.length) {
      val runIdx = runs.lastIndexWhere(_._1 <= chunk + 1)
      val perChunk = runs(math.max(runIdx, 0))._2.toInt
      var within = 0
      var off = offsets(chunk)
      while (within < perChunk && sample < nSamples) {
        sampleOffsets(sample) = off
        off += sizes(sample)
        sample += 1; within += 1
      }
      chunk += 1
    }
    require(sample == nSamples,
      s"MP4: sample table maps only $sample of $nSamples samples")
    Mp4Video(width, height, timescale, sampleDelta, fourcc,
      sampleOffsets, sizes, bytes)
  }

  // ----------------------------------------------- WebM (EBML/Matroska)

  /** Parsed WebM/Matroska header metadata. Frame payloads are VP8/VP9/AV1
    * — no pure-JVM decoder exists, so (like WebP) the honest surface is
    * the container metadata plus [[Multimodal.byteStats]] over the bytes:
    * codec id, exact dimensions, and duration from the EBML walk. */
  final case class WebmMeta(codecId: String, width: Int, height: Int,
                            durationMs: Long, timecodeScaleNs: Long)

  // EBML ids (with their length-marker bits, as they appear on the wire)
  private val EbmlHeader = 0x1A45DFA3L
  private val EbmlDocType = 0x4282L
  private val MkvSegment = 0x18538067L
  private val MkvInfo = 0x1549A966L
  private val MkvTimecodeScale = 0x2AD7B1L
  private val MkvDuration = 0x4489L
  private val MkvTracks = 0x1654AE6BL
  private val MkvTrackEntry = 0xAEL
  private val MkvTrackType = 0x83L
  private val MkvCodecId = 0x86L
  private val MkvVideo = 0xE0L
  private val MkvPixelWidth = 0xB0L
  private val MkvPixelHeight = 0xBAL

  /** An element id's on-wire bytes: the literal's minimal big-endian
    * form (ids carry their own length marker, unlike sizes). */
  private def ebmlIdBytes(id: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (id >>> (8 * n)) != 0) n += 1
    Array.tabulate[Byte](n)(i => ((id >>> (8 * (n - 1 - i))) & 0xFF).toByte)
  }

  /** A size VINT: marker bit in the first byte, 7 value bits per byte.
    * The all-ones pattern means "unknown size", so a value must not
    * collide with it — bump the length when it would. */
  private def ebmlSizeBytes(v: Long): Array[Byte] = {
    require(v >= 0, s"EBML: negative size $v")
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1
    val out = new Array[Byte](n)
    var x = v | (1L << (7 * n))
    var i = n - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>>= 8; i -= 1 }
    out
  }

  private def ebmlEl(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be(ebmlIdBytes(id), ebmlSizeBytes(body.length.toLong), body)
  }

  private def ebmlUint(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >>> (8 * n)) != 0) n += 1
    Array.tabulate[Byte](n)(i => ((v >>> (8 * (n - 1 - i))) & 0xFF).toByte)
  }

  /** Encode a minimal valid WebM: EBML header (DocType "webm"), then one
    * Segment with Info (TimecodeScale 1 ms, Duration) and Tracks holding
    * a single video TrackEntry (TrackType 1, CodecID, PixelWidth/Height).
    * No Clusters — this is the DASH-init-segment shape, which carries
    * everything the metadata walk reads; frame data would be opaque
    * VP8/VP9 anyway. */
  def encodeWebm(width: Int, height: Int, durationMs: Long,
                 codecId: String = "V_VP9"): Array[Byte] = {
    val header = ebmlEl(EbmlHeader,
      ebmlEl(0x4286L, ebmlUint(1)),  // EBMLVersion
      ebmlEl(0x42F7L, ebmlUint(1)),  // EBMLReadVersion
      ebmlEl(0x42F2L, ebmlUint(4)),  // EBMLMaxIDLength
      ebmlEl(0x42F3L, ebmlUint(8)),  // EBMLMaxSizeLength
      ebmlEl(EbmlDocType, "webm".getBytes("US-ASCII")),
      ebmlEl(0x4287L, ebmlUint(4)),  // DocTypeVersion
      ebmlEl(0x4285L, ebmlUint(2)))  // DocTypeReadVersion
    val info = ebmlEl(MkvInfo,
      ebmlEl(MkvTimecodeScale, ebmlUint(1000000L)), // 1 ms units
      ebmlEl(MkvDuration,
        ByteBuffer.allocate(8).putDouble(durationMs.toDouble).array()))
    val track = ebmlEl(MkvTrackEntry,
      ebmlEl(0xD7L, ebmlUint(1)),    // TrackNumber
      ebmlEl(0x73C5L, ebmlUint(1)),  // TrackUID
      ebmlEl(MkvTrackType, ebmlUint(1)), // 1 = video
      ebmlEl(MkvCodecId, codecId.getBytes("US-ASCII")),
      ebmlEl(MkvVideo,
        ebmlEl(MkvPixelWidth, ebmlUint(width)),
        ebmlEl(MkvPixelHeight, ebmlUint(height))))
    be(header, ebmlEl(MkvSegment, info, ebmlEl(MkvTracks, track)))
  }

  /** Walk a WebM/Matroska file's EBML tree and extract the video-track
    * metadata. Handles the unknown-size Segment real stream muxers emit
    * (size VINT all ones ⇒ element extends to end of file). All length
    * arithmetic in Long against untrusted headers; every malformed shape
    * fails with a named error. */
  def decodeWebmMeta(bytes: Array[Byte]): WebmMeta = {
    require(bytes != null && bytes.length >= 8, "WebM: truncated file")
    require(bytes(0) == 0x1A.toByte && bytes(1) == 0x45.toByte &&
        bytes(2) == 0xDF.toByte && bytes(3) == 0xA3.toByte,
      "WebM: missing EBML magic — not a Matroska container")
    // VINT length = leading-zero count of the first byte, plus one
    def vintLen(b: Byte): Int = {
      val u = b & 0xFF
      require(u != 0, "WebM: invalid VINT (zero lead byte)")
      var n = 1
      while ((u & (0x100 >> n)) == 0) n += 1
      n
    }
    def readId(off: Long): (Long, Int) = {
      require(off < bytes.length, "WebM: id past end of file")
      val n = vintLen(bytes(off.toInt))
      require(off + n <= bytes.length, "WebM: truncated element id")
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (bytes((off + i).toInt) & 0xFF); i += 1 }
      (v, n) // ids keep their marker bits — compared against literals
    }
    def readSize(off: Long): (Long, Int) = {
      require(off < bytes.length, "WebM: size past end of file")
      val n = vintLen(bytes(off.toInt))
      require(off + n <= bytes.length, "WebM: truncated element size")
      var v = (bytes(off.toInt) & 0xFF & (0xFF >>> n)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (bytes((off + i).toInt) & 0xFF); i += 1 }
      val unknown = v == (1L << (7 * n)) - 1
      (if (unknown) -1L else v, n)
    }
    // (id, payloadStart, payloadEnd) for each element in [start, end)
    def children(start: Long, end: Long): Seq[(Long, Long, Long)] = {
      val out = Seq.newBuilder[(Long, Long, Long)]
      var off = start
      while (off < end) {
        val (id, idLen) = readId(off)
        val (size, szLen) = readSize(off + idLen)
        val ps = off + idLen + szLen
        val pe = if (size < 0) end else ps + size
        require(pe <= end, f"WebM: element 0x$id%X overruns container")
        out += ((id, ps, pe))
        off = pe
      }
      out.result()
    }
    def uintAt(s: Long, e: Long): Long = {
      require(e - s <= 8, "WebM: oversized uint")
      var v = 0L
      var i = s
      while (i < e) { v = (v << 8) | (bytes(i.toInt) & 0xFF); i += 1 }
      v
    }
    val top = children(0L, bytes.length.toLong)
    val (_, hs, he) = top.find(_._1 == EbmlHeader).get // magic checked above
    val docType = children(hs, he).collectFirst {
      case (EbmlDocType, s, e) => new String(bytes, s.toInt, (e - s).toInt, "US-ASCII")
    }.getOrElse("matroska")
    require(docType == "webm" || docType == "matroska",
      s"WebM: unexpected DocType '$docType'")
    val (_, segS, segE) = top.find(_._1 == MkvSegment).getOrElse(
      throw new IllegalArgumentException("WebM: no Segment element"))
    val seg = children(segS, segE)
    val (tcScale, durationUnits) = seg.collectFirst {
      case (MkvInfo, s, e) =>
        val kids = children(s, e)
        val scale = kids.collectFirst {
          case (MkvTimecodeScale, ss, se) => uintAt(ss, se)
        }.getOrElse(1000000L) // spec default: 1 ms
        val dur = kids.collectFirst { case (MkvDuration, ss, se) =>
          require(se - ss == 4 || se - ss == 8, "WebM: Duration not a float")
          if (se - ss == 8) ByteBuffer.wrap(bytes, ss.toInt, 8).getDouble
          else ByteBuffer.wrap(bytes, ss.toInt, 4).getFloat.toDouble
        }.getOrElse(0.0)
        (scale, dur)
    }.getOrElse(throw new IllegalArgumentException("WebM: no Info element"))
    val videoEntry = seg.collectFirst { case (MkvTracks, s, e) =>
      children(s, e).collect { case (MkvTrackEntry, ts, te) => children(ts, te) }
        .find(_.exists { case (id, s2, e2) =>
          id == MkvTrackType && uintAt(s2, e2) == 1L })
    }.flatten.getOrElse(
      throw new IllegalArgumentException("WebM: no video TrackEntry"))
    val codecId = videoEntry.collectFirst { case (MkvCodecId, s, e) =>
      new String(bytes, s.toInt, (e - s).toInt, "US-ASCII")
    }.getOrElse(throw new IllegalArgumentException("WebM: video track has no CodecID"))
    val videoKids = videoEntry.collectFirst { case (MkvVideo, s, e) =>
      children(s, e)
    }.getOrElse(throw new IllegalArgumentException("WebM: video track has no Video element"))
    val width = videoKids.collectFirst { case (MkvPixelWidth, s, e) => uintAt(s, e) }
      .getOrElse(throw new IllegalArgumentException("WebM: no PixelWidth"))
    val height = videoKids.collectFirst { case (MkvPixelHeight, s, e) => uintAt(s, e) }
      .getOrElse(throw new IllegalArgumentException("WebM: no PixelHeight"))
    require(width > 0 && width <= Int.MaxValue &&
      height > 0 && height <= Int.MaxValue, "WebM: bad pixel dimensions")
    val durationMs = math.round(durationUnits * tcScale / 1e6)
    WebmMeta(codecId, width.toInt, height.toInt, durationMs, tcScale)
  }

  // ------------------------------------------------- MP3 (MPEG-1 audio)

  /** Parsed MP3 stream metadata from the frame-header walk — sample
    * rate, frame count, exact duration, mean bitrate, VBR flag. No audio
    * decode (no pure-JVM MP3 decoder exists); like WebM, the honest
    * surface is the container arithmetic: each MPEG-1 Layer III frame is
    * `144000·kbps/rate + padding` bytes and 1152 samples, so the walk is
    * O(frames) header reads, never a payload scan. */
  final case class Mp3Meta(sampleRate: Int, nFrames: Int, durationMs: Long,
                           meanBitrateKbps: Double, vbr: Boolean)

  // MPEG-1 Layer III side tables (ISO/IEC 11172-3): bitrate index → kbps
  // (0 = free, 15 = bad), sample-rate index → Hz (3 = reserved)
  private val Mp3BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3SampleRates = Array(44100, 48000, 32000)

  /** Encode a constant-bitrate MPEG-1 Layer III stream: `nFrames` frames
    * of the exact tabulated size, headers real, payload deterministic
    * filler (frame payloads would need a real psychoacoustic encoder —
    * irrelevant to the metadata walk, which never reads them). */
  def encodeMp3Cbr(sampleRate: Int, bitrateKbps: Int, nFrames: Int,
                   seed: Long = 0L): Array[Byte] = {
    val rateIdx = Mp3SampleRates.indexOf(sampleRate)
    val brIdx = Mp3BitrateKbps.indexOf(bitrateKbps)
    require(rateIdx >= 0, s"MP3: unsupported sample rate $sampleRate")
    require(brIdx >= 1, s"MP3: unsupported bitrate $bitrateKbps kbps")
    val frameLen = 144000 * bitrateKbps / sampleRate // padding bit 0
    val out = new Array[Byte](frameLen * nFrames)
    var f = 0
    while (f < nFrames) {
      val base = f * frameLen
      out(base) = 0xFF.toByte
      out(base + 1) = 0xFB.toByte // sync | MPEG-1 | Layer III | no CRC
      out(base + 2) = ((brIdx << 4) | (rateIdx << 2)).toByte
      out(base + 3) = 0x00 // stereo, no mode ext, no copyright bits
      var i = 4
      while (i < frameLen) {
        out(base + i) = ((seed + f * 131L + i * 7L) % 251L).toByte
        i += 1
      }
      f += 1
    }
    out
  }

  /** Walk an MP3 stream's frame headers. Skips a leading ID3v2 tag
    * (synchsafe size) and a trailing 128-byte ID3v1 "TAG" block; every
    * other byte must be frame-aligned — a lost sync fails loudly with
    * the offset rather than resyncing silently past corrupt data. */
  def decodeMp3Meta(bytes: Array[Byte]): Mp3Meta = {
    require(bytes != null && bytes.length >= 4, "MP3: truncated file")
    var pos = 0
    // ID3v2 prefix: "ID3" + version(2) + flags + 4-byte synchsafe size
    if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      require(bytes.length >= 10, "MP3: truncated ID3v2 header")
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      pos = 10 + size
      require(pos < bytes.length, "MP3: ID3v2 tag swallows the whole file")
    }
    // ID3v1 trailer: fixed 128 bytes at EOF starting "TAG"
    var end = bytes.length
    if (end - pos >= 128 && bytes(end - 128) == 'T' &&
        bytes(end - 127) == 'A' && bytes(end - 126) == 'G')
      end -= 128
    var nFrames = 0
    var sampleRate = 0
    var kbpsSum = 0L
    var kbpsFirst = -1
    var vbr = false
    while (pos < end) {
      require(pos + 4 <= end, s"MP3: truncated frame header at $pos")
      val b1 = bytes(pos) & 0xFF
      val b2 = bytes(pos + 1) & 0xFF
      require(b1 == 0xFF && (b2 & 0xE0) == 0xE0,
        s"MP3: lost frame sync at $pos")
      require((b2 >> 3 & 3) == 3 && (b2 >> 1 & 3) == 1,
        "MP3: only MPEG-1 Layer III supported")
      val b3 = bytes(pos + 2) & 0xFF
      val brIdx = b3 >> 4
      val rateIdx = b3 >> 2 & 3
      val padding = b3 >> 1 & 1
      require(brIdx >= 1 && brIdx <= 14, s"MP3: bad bitrate index $brIdx")
      require(rateIdx < 3, "MP3: reserved sample-rate index")
      val rate = Mp3SampleRates(rateIdx)
      require(sampleRate == 0 || rate == sampleRate,
        "MP3: sample rate changes mid-stream")
      sampleRate = rate
      val kbps = Mp3BitrateKbps(brIdx)
      if (kbpsFirst < 0) kbpsFirst = kbps else if (kbps != kbpsFirst) vbr = true
      kbpsSum += kbps
      val frameLen = 144000 * kbps / rate + padding
      require(frameLen > 4, "MP3: degenerate frame length")
      require(pos + frameLen <= end, s"MP3: frame at $pos overruns file")
      pos += frameLen
      nFrames += 1
    }
    require(nFrames > 0, "MP3: no frames")
    Mp3Meta(sampleRate, nFrames,
      nFrames.toLong * 1152000L / sampleRate,
      kbpsSum.toDouble / nFrames, vbr)
  }

  // --------------------------------------------------------- ImageIO

  /** Encode a pixel grid losslessly as PNG via the JDK's `javax.imageio`
    * (pure Java, headless — present in every `java.desktop` JVM). */
  def encodePng(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] =
    encodeImageIO(width, height, pixel, "png")

  /** Encode a pixel grid as baseline JPEG via `javax.imageio`. LOSSY:
    * round-tripped pixel values are approximations; only dimensions and
    * derived counts are exact. */
  def encodeJpeg(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] =
    encodeImageIO(width, height, pixel, "jpg")

  /** Encode a pixel grid losslessly as TIFF — the JDK bundles a TIFF
    * ImageIO plugin since Java 9, so the archival-scan format decodes
    * for real in any stock JVM. */
  def encodeTiff(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] =
    encodeImageIO(width, height, pixel, "tiff")

  /** Encode a GRAYSCALE pixel grid losslessly as GIF: the image is built
    * TYPE_BYTE_INDEXED over an explicit 256-entry gray palette, so the
    * writer's palette step is the identity and GIF's LZW (lossless)
    * round-trips every sample exactly — whereas an arbitrary RGB grid
    * would be quantized to 256 colors and stop being oracle-checkable.
    * `gray` returns 0..255; the decoded RGB is (g, g, g). */
  def encodeGifGray(width: Int, height: Int,
                    gray: (Int, Int) => Int): Array[Byte] = {
    val ramp = Array.tabulate[Byte](256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "image: no ImageIO writer for 'gif'")
    val writer = writers.next()
    // the JDK writer interlaces by default, and its own reader
    // de-interlaces heights < 8 incorrectly — write sequential rows
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val out = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(out)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  private def encodeImageIO(width: Int, height: Int,
                            pixel: (Int, Int) => Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache in executors
    require(javax.imageio.ImageIO.write(img, fmt, bos),
      s"image: no ImageIO writer for '$fmt'")
    bos.toByteArray
  }

  /** Decode ANY supported raster payload to the shared [[BmpImage]]
    * representation, dispatching on the magic bytes: BMP goes through the
    * oracle-exact byte parser above; JPEG/PNG/GIF/TIFF decode with the
    * JDK's `javax.imageio`. Fails loudly when no reader claims the
    * payload (e.g. webp) — opaque formats belong in
    * [[Multimodal.byteStats]], not here. */
  def decodeImage(bytes: Array[Byte]): BmpImage = {
    require(bytes != null && bytes.length >= 2, "image: truncated payload")
    if (bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte) decodeBmp24(bytes)
    else {
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "image: no ImageIO reader for payload magic " +
        f"0x${bytes(0) & 0xFF}%02x${bytes(1) & 0xFF}%02x")
      val w = img.getWidth; val h = img.getHeight
      val rgb = new Array[Int](w * h)
      img.getRGB(0, 0, w, h, rgb, 0, w)
      var i = 0
      while (i < rgb.length) { rgb(i) &= 0xFFFFFF; i += 1 } // drop alpha
      BmpImage(w, h, rgb)
    }
  }
}

package graft.ext

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal column operators — real
  * byte-level parsers, not stubs: RIFF/WAVE PCM audio and uncompressed
  * BMP images are fully implementable without native libraries, so the
  * decode stage of [[Multimodal]] can be exercised end-to-end on valid
  * payloads. Formats that genuinely need native codecs (jpeg/png/webp,
  * compressed audio) remain out of scope in this container and are
  * documented as such on the operators that mention them.
  *
  * Both decoders validate magic numbers, walk the real chunk/header
  * structure, honor little-endian layout, BMP row padding and bottom-up
  * row order — the parts a hand-rolled parser usually gets wrong — and
  * throw `IllegalArgumentException` with a specific message on malformed
  * input (surfaced through the engine's error provenance when run inside
  * a wrangle).
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
    BmpImage(width, height, rgb)
  }
}

package graft.multimodal

/** REAL byte-format codecs behind the [[Multimodal]] decode boundary
  * (VERDICT r09 #4): actual header parsing and payload decoding of two
  * self-contained formats a JVM can handle with no native libraries —
  * 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, padded
  * bottom-up BGR rows) and PCM-16 WAV (RIFF chunk walk, fmt + data).
  * Everything around them (partition-iterator batching, schema, shuffle
  * behavior) is unchanged — these slot into the same `mapPartitions`
  * boundary the stub decoder documents, proving the boundary against
  * real media bytes instead of a deterministic fake.
  *
  * Both decoders REJECT malformed input loudly (wrong magic, unsupported
  * bit depth / compression / audio format, truncated payload) — a lake
  * ingesting 100 TB of scraped media wants a classifiable decode error,
  * not a silent garbage feature vector.
  */
object Codecs {

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def putI32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  /** A decoded image: RGB8 pixels in TOP-DOWN row-major order (the
    * normalized orientation regardless of the file's row direction).
    */
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    /** (r, g, b) of pixel (x, y), y = 0 at the TOP. */
    def pixel(x: Int, y: Int): (Int, Int, Int) = {
      val i = (y * width + x) * 3
      ((rgb(i) & 0xFF, rgb(i + 1) & 0xFF, rgb(i + 2) & 0xFF))
    }
  }

  object Bmp {
    private val HeaderLen = 54 // 14-byte file header + 40-byte info header

    def rowStride(width: Int): Int = ((3 * width + 3) / 4) * 4

    def encodedLength(width: Int, height: Int): Int =
      HeaderLen + rowStride(width) * height

    /** Encode an RGB image as a 24-bit uncompressed bottom-up BMP —
      * `pixel(x, y)` returns (r, g, b) with y = 0 at the top.
      */
    def encode(width: Int, height: Int,
               pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      val stride = rowStride(width)
      val out = new Array[Byte](HeaderLen + stride * height)
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, out.length) // file size
      putI32(out, 10, HeaderLen) // pixel data offset
      putI32(out, 14, 40) // BITMAPINFOHEADER size
      putI32(out, 18, width)
      putI32(out, 22, height) // positive = bottom-up
      putU16(out, 26, 1) // planes
      putU16(out, 28, 24) // bits per pixel
      putI32(out, 30, 0) // BI_RGB, uncompressed
      putI32(out, 34, stride * height)
      putI32(out, 38, 2835); putI32(out, 42, 2835) // 72 DPI
      var y = 0
      while (y < height) {
        // file row 0 is the BOTTOM image row
        val base = HeaderLen + (height - 1 - y) * stride
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(x, y)
          out(base + 3 * x) = b.toByte // BGR on disk
          out(base + 3 * x + 1) = g.toByte
          out(base + 3 * x + 2) = r.toByte
          x += 1
        }
        y += 1
      }
      out
    }

    /** Parse a 24-bit uncompressed BMP (bottom-up or top-down) into
      * normalized top-down RGB. Throws IllegalArgumentException on
      * malformed or unsupported input.
      */
    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= HeaderLen, s"truncated BMP: ${bytes.length} bytes")
      require(bytes(0) == 'B' && bytes(1) == 'M', "bad BMP magic")
      val dataOffset = i32(bytes, 10)
      val infoSize = i32(bytes, 14)
      require(infoSize >= 40, s"unsupported BMP header size $infoSize")
      val width = i32(bytes, 18)
      val rawHeight = i32(bytes, 22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
      require(u16(bytes, 28) == 24, s"unsupported bit depth ${u16(bytes, 28)}")
      require(i32(bytes, 30) == 0, s"unsupported compression ${i32(bytes, 30)}")
      val stride = rowStride(width)
      // long arithmetic: an adversarial width/height pair overflows the
      // int product and would slip past the length check
      val need = dataOffset.toLong + stride.toLong * height.toLong
      require(dataOffset >= 0 && need <= bytes.length,
        s"truncated BMP payload: need $need, have ${bytes.length}")
      require(width.toLong * height.toLong * 3L <= Int.MaxValue,
        s"unreasonable BMP dimensions ${width}x$height")
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val fileRow = if (topDown) y else height - 1 - y
        val base = dataOffset + fileRow * stride
        var x = 0
        while (x < width) {
          val o = (y * width + x) * 3
          rgb(o) = bytes(base + 3 * x + 2) // R
          rgb(o + 1) = bytes(base + 3 * x + 1) // G
          rgb(o + 2) = bytes(base + 3 * x) // B
          x += 1
        }
        y += 1
      }
      Image(width, height, rgb)
    }
  }

  /** A decoded PCM-16 clip: interleaved samples, frame count =
    * samples.length / channels.
    */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }

  object Wav {
    def encodedLength(nFrames: Int, channels: Int): Int =
      44 + nFrames * channels * 2

    /** Encode interleaved PCM-16 samples as a canonical RIFF/WAVE file. */
    def encode(sampleRate: Int, channels: Int,
               samples: Array[Short]): Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"${samples.length} samples not divisible by $channels channels")
      val dataLen = samples.length * 2
      val out = new Array[Byte](44 + dataLen)
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + dataLen)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16) // fmt chunk length
      putU16(out, 20, 1) // PCM
      putU16(out, 22, channels)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * channels * 2) // byte rate
      putU16(out, 32, channels * 2) // block align
      putU16(out, 34, 16) // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, dataLen)
      var i = 0
      while (i < samples.length) {
        putU16(out, 44 + 2 * i, samples(i) & 0xFFFF)
        i += 1
      }
      out
    }

    /** Parse a PCM-16 WAV by WALKING the RIFF chunk list (fmt and data
      * may be separated by extension chunks in the wild — LIST, fact,
      * cue). Throws IllegalArgumentException on malformed/unsupported
      * input.
      */
    def decode(bytes: Array[Byte]): Audio = {
      require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
      require(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E', "bad RIFF/WAVE magic")
      var off = 12
      var sampleRate = -1
      var channels = -1
      var data: Array[Short] = null
      while (off + 8 <= bytes.length) {
        val id = new String(bytes, off, 4, "US-ASCII")
        val len = i32(bytes, off + 4)
        // long arithmetic (the Bmp.decode stance): a chunk declaring
        // len ≈ 2^31 would wrap the int sum past the bound check and
        // defeat the truncation guard
        require(len >= 0 && off.toLong + 8L + len <= bytes.length,
          s"truncated chunk '$id' at $off: declared $len")
        if (id == "fmt ") {
          require(len >= 16, s"short fmt chunk: $len")
          require(u16(bytes, off + 8) == 1,
            s"unsupported audio format ${u16(bytes, off + 8)} (PCM only)")
          channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12)
          require(u16(bytes, off + 22) == 16,
            s"unsupported bit depth ${u16(bytes, off + 22)}")
        } else if (id == "data") {
          require(len % 2 == 0, s"odd PCM-16 data length $len")
          data = new Array[Short](len / 2)
          var i = 0
          while (i < data.length) {
            data(i) = u16(bytes, off + 8 + 2 * i).toShort
            i += 1
          }
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      require(sampleRate > 0 && channels > 0, "missing fmt chunk")
      require(data != null, "missing data chunk")
      require(data.length % channels == 0,
        s"${data.length} samples not divisible by $channels channels")
      Audio(sampleRate, channels, data)
    }
  }
}

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

  /** Multi-member gzip — the Common Crawl archive framing (each WARC/WET
    * record is its own deflate member, so a reader can seek to a record
    * boundary and inflate just that record). Pure JDK (`java.util.zip`),
    * offline-safe; [[gunzipAll]] inflates EVERY member of a concatenated
    * stream (GZIPInputStream handles member boundaries natively).
    */
  object Gzip {
    /** One gzip member over `bytes` (deterministic: fixed default
      * deflate level, no timestamp — GZIPOutputStream writes MTIME 0).
      */
    def gzip(bytes: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(bytes); gz.finish(); gz.close()
      bos.toByteArray
    }

    /** Inflate ALL members of a (possibly multi-member) gzip stream into
      * one contiguous payload. Throws on malformed input (bad magic,
      * truncated member, CRC mismatch) — the loud-rejection codec stance.
      */
    def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
      val (out, clean) = inflate(bytes)
      if (!clean) throw new IllegalArgumentException(
        s"truncated or corrupt gzip stream (${out.length} bytes recovered)")
      out
    }

    /** TOLERANT inflate — the production front-door stance for scraped
      * archives, which routinely ship truncated tails: decode every
      * complete member plus whatever deflate output the broken tail
      * yields, and report cleanliness instead of throwing. A record cut
      * mid-body then surfaces as `len_ok = false` in the WET parse —
      * classified and observable, never a dead stream.
      */
    def gunzipAvailable(bytes: Array[Byte]): (Array[Byte], Boolean) =
      inflate(bytes)

    private def inflate(bytes: Array[Byte]): (Array[Byte], Boolean) = {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 3 + 64)
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 64 * 1024)
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
        (out.toByteArray, true)
      } catch {
        case _: java.io.EOFException | _: java.util.zip.ZipException =>
          (out.toByteArray, false)
      }
    }
  }

  /** Animated GIF89a (8-bit, global color table) — the MULTI-FRAME
    * container that makes frame demux REAL: full GIF-LZW codec
    * (variable-width codes 9→12 bits LSB-first, dictionary growth,
    * clear-code reset at 4096), sub-block framing, extension skipping,
    * and palette mapping. Interlace and local color tables are out of
    * scope and rejected loudly. The encoder exists for fixtures and is a
    * REAL LZW compressor (dictionary + width growth), so decoding a
    * planted file exercises every growth path, not just literals.
    */
  object Gif {

    /** One animation: shared dimensions, 256-entry RGB palette, and each
      * frame's 8-bit pixel indices (top-down row-major).
      */
    final case class Animation(width: Int, height: Int,
                               palette: Array[Byte], // 256 * 3 RGB
                               frames: Seq[Array[Byte]]) {
      /** Frame `f` as a decoded RGB [[Image]] via the palette. */
      def frame(f: Int): Image = {
        val idx = frames(f)
        val rgb = new Array[Byte](idx.length * 3)
        var i = 0
        while (i < idx.length) {
          val p = (idx(i) & 0xFF) * 3
          rgb(3 * i) = palette(p); rgb(3 * i + 1) = palette(p + 1)
          rgb(3 * i + 2) = palette(p + 2)
          i += 1
        }
        Image(width, height, rgb)
      }
    }

    /** 256-level grayscale palette (r = g = b = index) — the fixture
      * palette, chosen so oracle pixel sums read straight off indices.
      */
    def grayPalette: Array[Byte] = {
      val p = new Array[Byte](256 * 3)
      var i = 0
      while (i < 256) {
        p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte
        i += 1
      }
      p
    }

    // ---- GIF-LZW (min code size fixed at 8 — 256-color images) ----
    private val MinCode = 8
    private val Clear = 1 << MinCode // 256
    private val End = Clear + 1 // 257

    /** Compress 8-bit indices with real GIF-LZW: dictionary over
      * (prefix code, next byte), width grows 9→12 as codes are added,
      * CLEAR emitted when the table fills.
      */
    private[multimodal] def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(data.length)
      var bitBuf = 0L
      var bitCnt = 0
      var width = MinCode + 1
      def emit(code: Int): Unit = {
        bitBuf |= code.toLong << bitCnt
        bitCnt += width
        while (bitCnt >= 8) {
          out.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8
        }
      }
      var dict = new java.util.HashMap[Int, Int]() // (prefix<<8 | byte) -> code
      var next = End + 1
      emit(Clear)
      if (data.nonEmpty) {
        var cur = data(0) & 0xFF
        var i = 1
        while (i < data.length) {
          val k = data(i) & 0xFF
          val key = (cur << 8) | k
          if (dict.containsKey(key)) {
            cur = dict.get(key)
          } else {
            emit(cur)
            dict.put(key, next); next += 1
            // width grows when the NEXT code to assign no longer fits —
            // symmetric with the decoder's post-add check
            if (next - 1 == (1 << width) && width < 12) width += 1
            if (next == 4096) { // table full: reset
              emit(Clear)
              dict = new java.util.HashMap[Int, Int]()
              next = End + 1
              width = MinCode + 1
            }
            cur = k
          }
          i += 1
        }
        emit(cur)
      }
      emit(End)
      if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
      out.toByteArray
    }

    /** Inverse of [[lzwEncode]] — the real decoder loop incl. the
      * cur+cur(0) special case for a code equal to the next free slot.
      */
    private[multimodal] def lzwDecode(bytes: Array[Byte],
                                      expected: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(expected)
      var bitBuf = 0L
      var bitCnt = 0
      var pos = 0
      var width = MinCode + 1
      def read(): Int = {
        while (bitCnt < width && pos < bytes.length) {
          bitBuf |= (bytes(pos) & 0xFFL) << bitCnt; bitCnt += 8; pos += 1
        }
        if (bitCnt < width) return End // truncated: treat as end, length-checked below
        val c = (bitBuf & ((1L << width) - 1)).toInt
        bitBuf >>>= width; bitCnt -= width
        c
      }
      var dict = new Array[Array[Byte]](4096)
      var next = 0
      def reset(): Unit = {
        dict = new Array[Array[Byte]](4096)
        var i = 0
        while (i < Clear) { dict(i) = Array(i.toByte); i += 1 }
        next = End + 1
        width = MinCode + 1
      }
      reset()
      var prev: Array[Byte] = null
      var done = false
      while (!done) {
        val code = read()
        if (code == End) done = true
        else if (code == Clear) { reset(); prev = null }
        else {
          val entry =
            if (code < next && dict(code) != null) dict(code)
            else if (code == next && prev != null) prev :+ prev(0)
            else throw new IllegalArgumentException(
              s"bad LZW code $code (next=$next)")
          out.write(entry, 0, entry.length)
          if (prev != null && next < 4096) {
            dict(next) = prev :+ entry(0)
            next += 1
            if (next - 1 == (1 << width) - 1 && width < 12) width += 1
          }
          prev = entry
        }
      }
      require(out.size == expected,
        s"LZW payload decoded ${out.size} pixels, expected $expected")
      out.toByteArray
    }

    /** Encode frames of 8-bit indices as an animated GIF89a with the
      * given 256-entry palette, one Graphic Control Extension per frame.
      */
    /** The GIF87a 4-pass interlace row schedule: rows appear on the wire
      * in pass order — every 8th from 0, every 8th from 4, every 4th
      * from 2, every 2nd from 1. Returns wire position → screen row.
      */
    private[multimodal] def interlaceRows(height: Int): Array[Int] = {
      val order = Array.newBuilder[Int]
      Seq((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (start, step) =>
        var y = start
        while (y < height) { order += y; y += step }
      }
      order.result()
    }

    def encode(width: Int, height: Int, palette: Array[Byte],
               frames: Seq[Array[Byte]],
               interlaced: Boolean = false): Array[Byte] = {
      require(width > 0 && height > 0 && frames.nonEmpty,
        s"bad animation ${width}x$height, ${frames.length} frames")
      require(palette.length == 768, s"palette must be 256*3 bytes")
      frames.foreach(f => require(f.length == width * height,
        s"frame length ${f.length} != ${width * height}"))
      val out = new java.io.ByteArrayOutputStream(frames.length * width * height)
      def u16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("GIF89a".getBytes("US-ASCII"))
      u16(width); u16(height)
      out.write(0xF7) // GCT present, 8-bit resolution, 256 entries
      out.write(0) // background color
      out.write(0) // aspect
      out.write(palette, 0, 768)
      frames.foreach { f =>
        out.write(0x21); out.write(0xF9); out.write(4) // GCE
        out.write(0); u16(4); out.write(0); out.write(0) // no transparency, 40ms
        out.write(0x2C) // image descriptor
        u16(0); u16(0); u16(width); u16(height)
        out.write(if (interlaced) 0x40 else 0) // no local table; interlace flag
        out.write(MinCode)
        val wire =
          if (!interlaced) f
          else {
            // emit rows in pass order
            val rows = interlaceRows(height)
            val w = new Array[Byte](f.length)
            var p = 0
            while (p < rows.length) {
              System.arraycopy(f, rows(p) * width, w, p * width, width)
              p += 1
            }
            w
          }
        val z = lzwEncode(wire)
        var off = 0
        while (off < z.length) {
          val n = math.min(255, z.length - off)
          out.write(n); out.write(z, off, n); off += n
        }
        out.write(0) // block terminator
      }
      out.write(0x3B) // trailer
      out.toByteArray
    }

    /** Parse an animated GIF87a/89a: signature, screen descriptor, global
      * palette, extension skipping, per-frame LZW decode, and the 4-pass
      * interlace scatter when the image descriptor sets the flag
      * (lossless row reorder — the Adam7 stance). Throws
      * IllegalArgumentException on malformed or unsupported input
      * (local color tables, missing GCT, truncation).
      */
    def decode(bytes: Array[Byte]): Animation = {
      require(bytes.length >= 13, s"truncated GIF: ${bytes.length} bytes")
      val sig = new String(bytes, 0, 6, "US-ASCII")
      require(sig == "GIF89a" || sig == "GIF87a", s"bad GIF signature '$sig'")
      def u16(off: Int): Int = (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
      val width = u16(6)
      val height = u16(8)
      val packed = bytes(10) & 0xFF
      require((packed & 0x80) != 0, "GIF without a global color table unsupported")
      val gctSize = 2 << (packed & 7)
      require(13 + 3 * gctSize <= bytes.length, "truncated global color table")
      require(gctSize == 256, s"unsupported palette size $gctSize (8-bit only)")
      val palette = java.util.Arrays.copyOfRange(bytes, 13, 13 + 768)
      var off = 13 + 768
      val frames = Seq.newBuilder[Array[Byte]]
      var done = false
      while (!done) {
        require(off < bytes.length, "missing GIF trailer")
        (bytes(off) & 0xFF) match {
          case 0x3B => done = true
          case 0x21 => // extension: label + sub-blocks, skip whole
            off += 2
            require(off < bytes.length, "truncated GIF extension")
            while ((bytes(off) & 0xFF) != 0) {
              // the new off must stay readable: the loop re-reads bytes(off)
              require(off + 1 + (bytes(off) & 0xFF) < bytes.length,
                "truncated extension sub-block")
              off += 1 + (bytes(off) & 0xFF)
            }
            off += 1
          case 0x2C =>
            require(off + 11 <= bytes.length, "truncated image descriptor")
            val (l, t) = (u16(off + 1), u16(off + 3))
            val (fw, fh) = (u16(off + 5), u16(off + 7))
            val ipacked = bytes(off + 9) & 0xFF
            require((ipacked & 0x80) == 0, "local color tables unsupported")
            val interlaced = (ipacked & 0x40) != 0
            require(l == 0 && t == 0 && fw == width && fh == height,
              s"partial-frame GIF unsupported ($l,$t ${fw}x$fh)")
            val minCode = bytes(off + 10) & 0xFF
            require(minCode == MinCode, s"unsupported LZW min code $minCode")
            off += 11
            val z = new java.io.ByteArrayOutputStream(width * height)
            require(off < bytes.length, "truncated image sub-block")
            while ((bytes(off) & 0xFF) != 0) {
              val n = bytes(off) & 0xFF
              // strict: the new off itself must stay readable (terminator
              // or next sub-block length byte)
              require(off + 1 + n < bytes.length, "truncated image sub-block")
              z.write(bytes, off + 1, n)
              off += 1 + n
            }
            off += 1
            val idx = lzwDecode(z.toByteArray, width * height)
            frames +=
              (if (!interlaced) idx
               else {
                 // scatter the pass-ordered wire rows back onto the screen
                 val rows = interlaceRows(height)
                 val f = new Array[Byte](idx.length)
                 var p = 0
                 while (p < rows.length) {
                   System.arraycopy(idx, p * width, f, rows(p) * width, width)
                   p += 1
                 }
                 f
               })
          case b => throw new IllegalArgumentException(
            f"unknown GIF block 0x$b%02X at $off")
        }
      }
      val fs = frames.result()
      require(fs.nonEmpty, "GIF with no image frames")
      Animation(width, height, palette, fs)
    }
  }

  /** A decoded PCM-16 clip: interleaved samples, frame count =
    * samples.length / channels.
    */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }

  /** 8-bit-RGB PNG (color type 2), pure JVM: zlib via
    * `java.util.zip.Inflater`/`Deflater`, CRC-32 via `java.util.zip.CRC32`
    * — no native or third-party codec (VERDICT r11 #4). The encoder
    * exists for fixtures and deliberately cycles the scanline filter
    * (row y uses filter y % 5), so a decode fixture exercises ALL FIVE
    * reconstruction filters (None/Sub/Up/Average/Paeth); one wrong
    * predictor and the pixel sums the oracle recomputes mismatch.
    * Interlace, palettes, alpha, and non-8-bit depths are out of scope
    * and REJECTED loudly, like every unsupported branch in this file.
    */
  object Png {
    private val Signature = Array[Int](0x89, 0x50, 0x4E, 0x47,
      0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def beI32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
        ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

    private def putBeI32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = ((v >>> 24) & 0xFF).toByte; b(off + 1) = ((v >>> 16) & 0xFF).toByte
      b(off + 2) = ((v >>> 8) & 0xFF).toByte; b(off + 3) = (v & 0xFF).toByte
    }

    private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      putBeI32(out, 0, data.length)
      tpe.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32
      crc.update(out, 4, 4 + data.length)
      putBeI32(out, 8 + data.length, crc.getValue.toInt)
      out
    }

    /** a = left, b = above, c = upper-left (the PNG spec predictor). */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Adam7 pass geometry: (xStart, yStart, xStep, yStep) per pass. */
    private val Adam7: Array[(Int, Int, Int, Int)] = Array(
      (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

    /** Filter raw top-down RGB scanlines, filter type = y % 5 (every
      * decode exercises every predictor) — shared by the sequential and
      * Adam7 fixture encoders; each Adam7 pass filters independently
      * (the spec: the previous row is the previous row OF THE PASS).
      */
    private def filterScanlines(raw: Array[Byte], width: Int,
                                height: Int, bpp: Int = 3): Array[Byte] = {
      val stride = width * bpp
      val filtered = new Array[Byte](height * (1 + stride))
      var y = 0
      while (y < height) {
        val f = y % 5
        filtered(y * (1 + stride)) = f.toByte
        var i = 0
        while (i < stride) {
          val cur = raw(y * stride + i) & 0xFF
          val left = if (i >= bpp) raw(y * stride + i - bpp) & 0xFF else 0
          val up = if (y > 0) raw((y - 1) * stride + i) & 0xFF else 0
          val ul = if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xFF else 0
          val v = f match {
            case 0 => cur
            case 1 => cur - left
            case 2 => cur - up
            case 3 => cur - (left + up) / 2
            case 4 => cur - paeth(left, up, ul)
          }
          filtered(y * (1 + stride) + 1 + i) = (v & 0xFF).toByte
          i += 1
        }
        y += 1
      }
      filtered
    }

    /** Reconstruct `height` filtered scanlines of `width` RGB pixels
      * starting at `off` in the inflated stream — the five-predictor
      * walk shared by the sequential image and each Adam7 pass.
      */
    private def unfilterScanlines(filtered: Array[Byte], off: Int,
                                  width: Int, height: Int,
                                  bpp: Int = 3): Array[Byte] = {
      val stride = width * bpp
      val rgb = new Array[Byte](height * stride)
      var y = 0
      while (y < height) {
        val f = filtered(off + y * (1 + stride)) & 0xFF
        require(f <= 4, s"bad filter type $f on row $y")
        var i = 0
        while (i < stride) {
          val v = filtered(off + y * (1 + stride) + 1 + i) & 0xFF
          val left = if (i >= bpp) rgb(y * stride + i - bpp) & 0xFF else 0
          val up = if (y > 0) rgb((y - 1) * stride + i) & 0xFF else 0
          val ul = if (y > 0 && i >= bpp) rgb((y - 1) * stride + i - bpp) & 0xFF else 0
          val raw = f match {
            case 0 => v
            case 1 => v + left
            case 2 => v + up
            case 3 => v + (left + up) / 2
            case 4 => v + paeth(left, up, ul)
          }
          rgb(y * stride + i) = (raw & 0xFF).toByte
          i += 1
        }
        y += 1
      }
      rgb
    }

    private def deflate(data: Array[Byte]): Array[Byte] = {
      val deflater = new java.util.zip.Deflater
      deflater.setInput(data); deflater.finish()
      val zbuf = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
      val tmp = new Array[Byte](64 * 1024)
      while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      zbuf.toByteArray
    }

    /** Encode top-down RGB pixels as an ADAM7-INTERLACED RGB8 PNG — the
      * fixture generator for the interlaced decode path: the seven
      * reduced images extract on the spec grid, each pass filters
      * independently (y-within-pass % 5), empty passes contribute no
      * scanlines, and the concatenated passes deflate as one zlib
      * stream under IHDR interlace = 1.
      */
    def encodeAdam7(width: Int, height: Int,
                    pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      val parts = Adam7.map { case (x0, y0, dx, dy) =>
        val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
        val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
        if (pw == 0 || ph == 0) Array.emptyByteArray
        else {
          val raw = new Array[Byte](ph * pw * 3)
          var j = 0
          while (j < ph) {
            var i = 0
            while (i < pw) {
              val (r, g, b) = pixel(x0 + i * dx, y0 + j * dy)
              raw((j * pw + i) * 3) = r.toByte
              raw((j * pw + i) * 3 + 1) = g.toByte
              raw((j * pw + i) * 3 + 2) = b.toByte
              i += 1
            }
            j += 1
          }
          filterScanlines(raw, pw, ph)
        }
      }
      val ihdr = new Array[Byte](13)
      putBeI32(ihdr, 0, width); putBeI32(ihdr, 4, height)
      ihdr(8) = 8; ihdr(9) = 2; ihdr(12) = 1 // interlace: Adam7
      Signature ++ chunk("IHDR", ihdr) ++
        chunk("IDAT", deflate(parts.flatten)) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Encode 8-bit palette indices as an INDEXED-COLOR PNG (color type
      * 3, PLTE chunk) — the fixture generator for the palette decode
      * path common in web graphics. Scanlines carry 1-byte indices, so
      * the five filters run at bpp = 1 (filter = y % 5, as everywhere).
      */
    def encodePalette(width: Int, height: Int, palette: Array[Byte],
                      index: (Int, Int) => Int): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      require(palette.length == 768, "palette must be 256*3 bytes")
      val raw = new Array[Byte](height * width)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raw(y * width + x) = index(x, y).toByte
          x += 1
        }
        y += 1
      }
      val ihdr = new Array[Byte](13)
      putBeI32(ihdr, 0, width); putBeI32(ihdr, 4, height)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 3 // color type: indexed
      Signature ++ chunk("IHDR", ihdr) ++ chunk("PLTE", palette) ++
        chunk("IDAT", deflate(filterScanlines(raw, width, height, bpp = 1))) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Encode top-down RGB pixels as an RGB8 PNG, filter = y % 5. */
    def encode(width: Int, height: Int,
               pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      val stride = width * 3
      val raw = new Array[Byte](height * stride) // unfiltered scanlines
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val (r, g, b) = pixel(x, y)
          raw(y * stride + 3 * x) = r.toByte
          raw(y * stride + 3 * x + 1) = g.toByte
          raw(y * stride + 3 * x + 2) = b.toByte
          x += 1
        }
        y += 1
      }
      val ihdr = new Array[Byte](13)
      putBeI32(ihdr, 0, width); putBeI32(ihdr, 4, height)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 2 // color type: truecolor RGB
      // compression 0, filter 0, interlace 0 already zeroed
      Signature ++ chunk("IHDR", ihdr) ++
        chunk("IDAT", deflate(filterScanlines(raw, width, height))) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Parse an RGB8 or indexed-color PNG — sequential OR
      * Adam7-interlaced: chunk walk
      * with CRC verification, multi-IDAT zlib inflate, full five-filter
      * scanline reconstruction (per pass for Adam7, whose reduced
      * images filter independently), and the spec scatter back onto the
      * full grid. Output is top-down RGB (PNG's native order). Throws
      * IllegalArgumentException on malformed or unsupported input.
      */
    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= 8 + 25 + 12, s"truncated PNG: ${bytes.length} bytes")
      require(Signature.indices.forall(i => bytes(i) == Signature(i)),
        "bad PNG signature")
      var off = 8
      var width = -1
      var height = -1
      var interlaced = false
      var colorType = -1
      var plte: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream(bytes.length)
      var sawEnd = false
      while (off + 12 <= bytes.length && !sawEnd) {
        val len = beI32(bytes, off)
        require(len >= 0 && off.toLong + 12L + len <= bytes.length,
          s"truncated chunk at $off: declared $len")
        val tpe = new String(bytes, off + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32
        crc.update(bytes, off + 4, 4 + len)
        require(crc.getValue.toInt == beI32(bytes, off + 8 + len),
          s"CRC mismatch in chunk '$tpe'")
        tpe match {
          case "IHDR" =>
            require(len == 13, s"bad IHDR length $len")
            width = beI32(bytes, off + 8); height = beI32(bytes, off + 12)
            require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
            require(bytes(off + 16) == 8, s"unsupported bit depth ${bytes(off + 16)}")
            colorType = bytes(off + 17) & 0xFF
            require(colorType == 2 || colorType == 3,
              s"unsupported color type $colorType (truecolor/palette only)")
            require(bytes(off + 18) == 0 && bytes(off + 19) == 0,
              "unsupported compression/filter method")
            require(bytes(off + 20) == 0 || bytes(off + 20) == 1,
              s"unsupported interlace method ${bytes(off + 20)}")
            interlaced = bytes(off + 20) == 1
            require(width.toLong * height.toLong * 3L <= Int.MaxValue,
              s"unreasonable PNG dimensions ${width}x$height")
          case "PLTE" =>
            require(len > 0 && len % 3 == 0 && len <= 768, s"bad PLTE length $len")
            plte = java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
          case "IDAT" => idat.write(bytes, off + 8, len)
          case "IEND" => sawEnd = true
          case _ => // ancillary chunk: skip
        }
        off += 12 + len
      }
      require(width > 0, "missing IHDR chunk")
      require(sawEnd, "missing IEND chunk")
      // per-pass geometry: the sequential image is the one-pass case
      val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
        if (!interlaced) Seq((0, 0, 1, 1, width, height))
        else Adam7.toSeq.map { case (x0, y0, dx, dy) =>
          val pw = if (width > x0) (width - x0 + dx - 1) / dx else 0
          val ph = if (height > y0) (height - y0 + dy - 1) / dy else 0
          (x0, y0, dx, dy, pw, ph)
        }.filter(p => p._5 > 0 && p._6 > 0)
      require(colorType == 2 || plte != null, "palette PNG without PLTE")
      val bpp = if (colorType == 2) 3 else 1
      val total = passes.map { case (_, _, _, _, pw, ph) =>
        ph * (1 + pw * bpp)
      }.sum
      val filtered = new Array[Byte](total)
      val inflater = new java.util.zip.Inflater
      inflater.setInput(idat.toByteArray)
      var got = 0
      while (got < filtered.length && !inflater.finished()) {
        val n = inflater.inflate(filtered, got, filtered.length - got)
        // n == 0 while not finished is ALWAYS terminal here: exhausted
        // input (truncated stream) or a preset-dictionary request
        // (needsDictionary) — either way no further call can progress,
        // so failing only on needsInput would spin forever
        require(n > 0, "truncated or unsupported IDAT payload")
        got += n
      }
      inflater.end()
      require(got == filtered.length,
        s"short IDAT payload: got $got, need ${filtered.length}")
      val stride = width * 3
      val rgb = new Array[Byte](height * stride)
      var passOff = 0
      passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
        val sub = unfilterScanlines(filtered, passOff, pw, ph, bpp)
        passOff += ph * (1 + pw * bpp)
        var j = 0
        while (j < ph) {
          var i = 0
          while (i < pw) {
            val dst = (y0 + j * dy) * stride + (x0 + i * dx) * 3
            if (colorType == 2) {
              val src = (j * pw + i) * 3
              rgb(dst) = sub(src)
              rgb(dst + 1) = sub(src + 1)
              rgb(dst + 2) = sub(src + 2)
            } else {
              val pi = (sub(j * pw + i) & 0xFF) * 3
              require(pi + 2 < plte.length,
                s"palette index ${pi / 3} outside ${plte.length / 3}-entry PLTE")
              rgb(dst) = plte(pi)
              rgb(dst + 1) = plte(pi + 1)
              rgb(dst + 2) = plte(pi + 2)
            }
            i += 1
          }
          j += 1
        }
      }
      Image(width, height, rgb)
    }
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

    /** Encode interleaved UNSIGNED 8-bit PCM samples (0..255, the WAV
      * convention for 8-bit) — the fixture generator for the 8-bit
      * decode path common in older/archival corpora.
      */
    def encode8(sampleRate: Int, channels: Int,
                samples: Array[Int]): Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"${samples.length} samples not divisible by $channels channels")
      require(samples.forall(v => v >= 0 && v <= 255),
        "8-bit PCM samples must be unsigned bytes")
      val dataLen = samples.length
      val out = new Array[Byte](44 + dataLen + (dataLen & 1))
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + dataLen + (dataLen & 1))
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16)
      putU16(out, 20, 1) // PCM
      putU16(out, 22, channels)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * channels) // byte rate
      putU16(out, 32, channels) // block align
      putU16(out, 34, 8) // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, dataLen)
      var i = 0
      while (i < samples.length) { out(44 + i) = samples(i).toByte; i += 1 }
      out
    }

    /** The G.711 µ-law expansion (ITU-T G.711 §4.2, the classic Sun
      * `ulaw2linear` form): complement the code byte, rebuild the
      * 4-bit mantissa under the 3-bit exponent with the 0x84 bias, and
      * sign from the top bit — a pure integer function of the byte, so
      * a SQL oracle replays every expanded sample closed-form. Output
      * spans ±32124 on the 16-bit lattice.
      */
    def mulawExpand(b: Byte): Short = {
      val u = ~b & 0xFF
      val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
      (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
    }

    /** The G.711 A-law expansion (ITU-T G.711 §4.1): XOR the code byte
      * with 0x55, then segment 0 is linear (16·mantissa + 8), segment 1
      * adds the 0x108 bias, and segments 2–7 shift the biased mantissa
      * up — again pure integer math, SQL-replayable. Output spans
      * ±32256. Note A-law's sign convention is INVERTED relative to
      * µ-law: a set top bit means positive.
      */
    def alawExpand(b: Byte): Short = {
      val a = (b ^ 0x55) & 0xFF
      val seg = (a & 0x70) >> 4
      val t = seg match {
        case 0 => ((a & 0x0F) << 4) + 8
        case 1 => ((a & 0x0F) << 4) + 0x108
        case _ => (((a & 0x0F) << 4) + 0x108) << (seg - 1)
      }
      (if ((a & 0x80) != 0) t else -t).toShort
    }

    /** Encode raw G.711 code bytes (µ-law fmt 7 / A-law fmt 6) as a
      * RIFF/WAVE file — the fixture generator for the telephony/archival
      * decode paths. Code bytes pass through verbatim; expansion happens
      * at decode.
      */
    def encodeG711(sampleRate: Int, channels: Int, mulaw: Boolean,
                   codes: Array[Byte]): Array[Byte] = {
      require(channels > 0 && codes.length % channels == 0,
        s"${codes.length} samples not divisible by $channels channels")
      val dataLen = codes.length
      val out = new Array[Byte](44 + dataLen + (dataLen & 1))
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + dataLen + (dataLen & 1))
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16)
      putU16(out, 20, if (mulaw) 7 else 6) // WAVE_FORMAT_MULAW / _ALAW
      putU16(out, 22, channels)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * channels) // byte rate (1 byte/sample)
      putU16(out, 32, channels) // block align
      putU16(out, 34, 8) // bits per sample
      out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
      putI32(out, 40, dataLen)
      System.arraycopy(codes, 0, out, 44, dataLen)
      out
    }

    /** Encode interleaved IEEE-float32 samples (nominal full scale
      * [-1, 1]) as a WAVE_FORMAT_IEEE_FLOAT (fmt 3) file with the
      * conventional `fact` chunk — the DAW/export float format. The
      * fixture generator for the float decode path.
      */
    def encodeFloat(sampleRate: Int, channels: Int,
                    samples: Array[Float]): Array[Byte] = {
      require(channels > 0 && samples.length % channels == 0,
        s"${samples.length} samples not divisible by $channels channels")
      val dataLen = samples.length * 4
      val out = new Array[Byte](44 + 12 + dataLen) // header + fact + data
      out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
      putI32(out, 4, 36 + 12 + dataLen)
      out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
      out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
      putI32(out, 16, 16)
      putU16(out, 20, 3) // WAVE_FORMAT_IEEE_FLOAT
      putU16(out, 22, channels)
      putI32(out, 24, sampleRate)
      putI32(out, 28, sampleRate * channels * 4)
      putU16(out, 32, channels * 4)
      putU16(out, 34, 32)
      out(36) = 'f'; out(37) = 'a'; out(38) = 'c'; out(39) = 't'
      putI32(out, 40, 4)
      putI32(out, 44, samples.length / channels)
      out(48) = 'd'; out(49) = 'a'; out(50) = 't'; out(51) = 'a'
      putI32(out, 52, dataLen)
      var i = 0
      while (i < samples.length) {
        putI32(out, 56 + 4 * i, java.lang.Float.floatToIntBits(samples(i)))
        i += 1
      }
      out
    }

    /** Parse a PCM WAV (16-bit signed or 8-bit unsigned), an IEEE-float32
      * WAV (fmt 3, converted round(v·32767) onto the 16-bit lattice), or
      * a G.711 companded WAV (µ-law fmt 7 / A-law fmt 6) by WALKING the
      * RIFF chunk list (fmt and data may be separated by extension
      * chunks in the wild — LIST, fact, cue; fmt may even FOLLOW data,
      * so sample conversion defers until both are seen). 8-bit samples
      * widen to the 16-bit lattice as (v − 128) · 256; G.711 bytes
      * expand through [[mulawExpand]]/[[alawExpand]] — all exact, so the
      * oracle replays them closed-form. Throws IllegalArgumentException
      * on malformed/unsupported input.
      */
    def decode(bytes: Array[Byte]): Audio = {
      require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
      require(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
        bytes(10) == 'V' && bytes(11) == 'E', "bad RIFF/WAVE magic")
      var off = 12
      var sampleRate = -1
      var channels = -1
      var bits = -1
      var fmtCode = -1
      var dataOff = -1
      var dataLen = -1
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
          fmtCode = u16(bytes, off + 8)
          require(fmtCode == 1 || fmtCode == 3 || fmtCode == 6 || fmtCode == 7,
            s"unsupported audio format $fmtCode (PCM/float/A-law/µ-law only)")
          channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12)
          bits = u16(bytes, off + 22)
          if (fmtCode == 1)
            require(bits == 8 || bits == 16, s"unsupported bit depth $bits")
          else if (fmtCode == 3)
            require(bits == 32, s"IEEE-float WAV requires 32-bit, got $bits")
          else
            require(bits == 8, s"G.711 requires 8-bit codes, got $bits")
        } else if (id == "data") {
          dataOff = off + 8
          dataLen = len
        }
        off += 8 + len + (len & 1) // RIFF chunks are word-aligned
      }
      require(sampleRate > 0 && channels > 0, "missing fmt chunk")
      require(dataOff >= 0, "missing data chunk")
      val data =
        if (fmtCode == 1 && bits == 16) {
          require(dataLen % 2 == 0, s"odd PCM-16 data length $dataLen")
          val d = new Array[Short](dataLen / 2)
          var i = 0
          while (i < d.length) {
            d(i) = u16(bytes, dataOff + 2 * i).toShort
            i += 1
          }
          d
        } else if (fmtCode == 1) { // 8-bit PCM is unsigned; widen exactly onto the 16-bit lattice
          val d = new Array[Short](dataLen)
          var i = 0
          while (i < d.length) {
            d(i) = (((bytes(dataOff + i) & 0xFF) - 128) * 256).toShort
            i += 1
          }
          d
        } else if (fmtCode == 3) { // float32 → round onto the 16-bit lattice
          require(dataLen % 4 == 0, s"odd float32 data length $dataLen")
          val d = new Array[Short](dataLen / 4)
          var i = 0
          while (i < d.length) {
            val v = java.lang.Float.intBitsToFloat(i32(bytes, dataOff + 4 * i))
            val q = math.round(v.toDouble * 32767d)
            d(i) = math.max(-32768L, math.min(32767L, q)).toShort
            i += 1
          }
          d
        } else { // G.711 companded byte → 16-bit linear expansion
          val expand: Byte => Short =
            if (fmtCode == 7) mulawExpand else alawExpand
          val d = new Array[Short](dataLen)
          var i = 0
          while (i < d.length) {
            d(i) = expand(bytes(dataOff + i))
            i += 1
          }
          d
        }
      require(data.length % channels == 0,
        s"${data.length} samples not divisible by $channels channels")
      Audio(sampleRate, channels, data)
    }
  }

  /** A demuxed MJPEG video: container metadata plus each frame's raw
    * JPEG payload (MJPEG frames ARE standalone baseline JPEGs, so the
    * downstream image chain decodes them with [[Jpeg.decode]] verbatim).
    */
  final case class Video(width: Int, height: Int, usPerFrame: Int,
                         frames: IndexedSeq[Array[Byte]])

  /** Motion-JPEG in the RIFF/AVI container — the classic crawled-video
    * wrapper where every frame is an independent baseline JPEG. Pure JVM
    * byte walking in the [[Wav]] RIFF stance: the decoder WALKS the
    * chunk tree (hdrl → avih + strl/strh/strf for the metadata, movi for
    * the `00dc`/`00db` frame payloads), skips unknown chunks (JUNK,
    * idx1, INFO lists) by their declared lengths, validates every length
    * in long arithmetic before trusting it, and rejects anything that is
    * not single-stream `vids`/`MJPG` loudly. The encoder exists for
    * fixtures and writes the canonical layout (hdrl, movi, idx1).
    */
  object Avi {
    private def fourCC(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    private def putCC(out: java.io.ByteArrayOutputStream, cc: String): Unit = {
      require(cc.length == 4, s"fourCC must be 4 chars: '$cc'")
      var i = 0
      while (i < 4) { out.write(cc.charAt(i)); i += 1 }
    }

    private def putLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }

    private def putLe16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    }

    /** Encode MJPEG frames as a canonical RIFF/AVI: LIST hdrl (avih +
      * LIST strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)), LIST movi
      * of word-aligned `00dc` chunks, and a keyframe idx1 (every MJPEG
      * frame is a keyframe).
      */
    def encode(width: Int, height: Int, usPerFrame: Int,
               frames: Seq[Array[Byte]]): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
      require(usPerFrame > 0, s"bad frame interval $usPerFrame")
      require(frames.nonEmpty, "AVI needs at least one frame")
      val body = new java.io.ByteArrayOutputStream(4096)
      putCC(body, "AVI ")
      // LIST hdrl
      val hdrl = new java.io.ByteArrayOutputStream(256)
      putCC(hdrl, "hdrl")
      // avih: 56-byte main header
      putCC(hdrl, "avih"); putLe32(hdrl, 56)
      putLe32(hdrl, usPerFrame) // dwMicroSecPerFrame
      putLe32(hdrl, 0) // dwMaxBytesPerSec
      putLe32(hdrl, 0) // dwPaddingGranularity
      putLe32(hdrl, 0x10) // dwFlags: AVIF_HASINDEX
      putLe32(hdrl, frames.length) // dwTotalFrames
      putLe32(hdrl, 0) // dwInitialFrames
      putLe32(hdrl, 1) // dwStreams
      putLe32(hdrl, 0) // dwSuggestedBufferSize
      putLe32(hdrl, width); putLe32(hdrl, height)
      (0 until 4).foreach(_ => putLe32(hdrl, 0)) // dwReserved
      // LIST strl: strh + strf
      val strl = new java.io.ByteArrayOutputStream(160)
      putCC(strl, "strl")
      putCC(strl, "strh"); putLe32(strl, 56)
      putCC(strl, "vids"); putCC(strl, "MJPG")
      putLe32(strl, 0) // dwFlags
      putLe16(strl, 0); putLe16(strl, 0) // wPriority, wLanguage
      putLe32(strl, 0) // dwInitialFrames
      putLe32(strl, usPerFrame) // dwScale
      putLe32(strl, 1000000) // dwRate: fps = rate/scale
      putLe32(strl, 0) // dwStart
      putLe32(strl, frames.length) // dwLength
      putLe32(strl, 0) // dwSuggestedBufferSize
      putLe32(strl, -1) // dwQuality (default)
      putLe32(strl, 0) // dwSampleSize
      putLe16(strl, 0); putLe16(strl, 0) // rcFrame left, top
      putLe16(strl, width); putLe16(strl, height)
      putCC(strl, "strf"); putLe32(strl, 40)
      putLe32(strl, 40) // biSize
      putLe32(strl, width); putLe32(strl, height)
      putLe16(strl, 1); putLe16(strl, 24) // biPlanes, biBitCount
      putCC(strl, "MJPG") // biCompression
      (0 until 5).foreach(_ => putLe32(strl, 0)) // sizeImage .. clrImportant
      val strlBytes = strl.toByteArray
      putCC(hdrl, "LIST"); putLe32(hdrl, strlBytes.length)
      hdrl.write(strlBytes, 0, strlBytes.length)
      val hdrlBytes = hdrl.toByteArray
      putCC(body, "LIST"); putLe32(body, hdrlBytes.length)
      body.write(hdrlBytes, 0, hdrlBytes.length)
      // LIST movi + idx1 offsets (relative to the movi LIST 'movi' tag)
      val movi = new java.io.ByteArrayOutputStream(4096)
      putCC(movi, "movi")
      val offsets = new Array[Int](frames.length)
      var f = 0
      while (f < frames.length) {
        offsets(f) = movi.size() // offset of the '00dc' tag within movi data
        putCC(movi, "00dc"); putLe32(movi, frames(f).length)
        movi.write(frames(f), 0, frames(f).length)
        if ((frames(f).length & 1) == 1) movi.write(0) // word align
        f += 1
      }
      val moviBytes = movi.toByteArray
      putCC(body, "LIST"); putLe32(body, moviBytes.length)
      body.write(moviBytes, 0, moviBytes.length)
      putCC(body, "idx1"); putLe32(body, 16 * frames.length)
      f = 0
      while (f < frames.length) {
        putCC(body, "00dc")
        putLe32(body, 0x10) // AVIIF_KEYFRAME
        putLe32(body, offsets(f))
        putLe32(body, frames(f).length)
        f += 1
      }
      val bodyBytes = body.toByteArray
      val out = new java.io.ByteArrayOutputStream(bodyBytes.length + 8)
      putCC(out, "RIFF"); putLe32(out, bodyBytes.length)
      out.write(bodyBytes, 0, bodyBytes.length)
      out.toByteArray
    }

    /** Demux a single-stream MJPG AVI: returns the container metadata
      * and every frame's raw JPEG payload in stream order. Throws
      * IllegalArgumentException on malformed/unsupported input.
      */
    def decode(bytes: Array[Byte]): Video = {
      require(bytes.length >= 12, s"truncated AVI: ${bytes.length} bytes")
      require(fourCC(bytes, 0) == "RIFF" && fourCC(bytes, 8) == "AVI ",
        "bad RIFF/AVI magic")
      val riffLen = i32(bytes, 4)
      require(riffLen >= 4 && 8L + riffLen <= bytes.length,
        s"truncated RIFF body: declared $riffLen of ${bytes.length}")
      var width = -1
      var height = -1
      var usPerFrame = -1
      var totalFrames = -1
      var sawVids = false
      val frames = IndexedSeq.newBuilder[Array[Byte]]

      def walk(from: Int, to: Int, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = fourCC(bytes, off)
          val len = i32(bytes, off + 4)
          require(len >= 0 && off.toLong + 8L + len <= to,
            s"truncated chunk '$id' at $off: declared $len")
          if (id == "LIST") {
            require(len >= 4, s"short LIST at $off")
            val kind = fourCC(bytes, off + 8)
            // recurse into the structural lists; INFO etc. skip as opaque
            if (kind == "hdrl" || kind == "strl" || kind == "movi" ||
                kind == "rec ")
              walk(off + 12, off + 8 + len, inMovi || kind == "movi")
          } else if (id == "avih") {
            require(len >= 40, s"short avih: $len")
            usPerFrame = i32(bytes, off + 8)
            totalFrames = i32(bytes, off + 24)
            width = i32(bytes, off + 40)
            height = i32(bytes, off + 44)
          } else if (id == "strh") {
            require(len >= 8, s"short strh: $len")
            val fccType = fourCC(bytes, off + 8)
            if (fccType == "vids") {
              require(fourCC(bytes, off + 12) == "MJPG",
                s"unsupported codec ${fourCC(bytes, off + 12)} (MJPG only)")
              sawVids = true
            }
          } else if (inMovi && (id == "00dc" || id == "00db")) {
            frames += java.util.Arrays.copyOfRange(bytes, off + 8, off + 8 + len)
          }
          off += 8 + len + (len & 1) // RIFF chunks are word-aligned
        }
      }
      walk(12, 8 + riffLen, inMovi = false)
      require(width > 0 && height > 0 && usPerFrame > 0, "missing avih header")
      require(sawVids, "no vids stream header")
      val fs = frames.result()
      require(fs.nonEmpty, "AVI with no frame chunks")
      require(totalFrames == fs.length,
        s"avih declares $totalFrames frames, movi carries ${fs.length}")
      Video(width, height, usPerFrame, fs)
    }
  }
}

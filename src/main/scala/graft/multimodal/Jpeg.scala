package graft.multimodal

/** Baseline sequential JPEG (JFIF), pure JVM — the dominant crawled-image
  * format and the one codec gap after BMP/PNG/GIF/WAV (VERDICT r12 #1).
  *
  * Decoder scope: baseline DCT (SOF0), 8-bit samples, 1 or 3 components,
  * interleaved single scan, arbitrary Huffman/quantization tables read
  * from DHT/DQT (8- and 16-bit precision), restart markers (DRI/RSTn),
  * 0xFF00 byte unstuffing, any sampling factors up to 4 (4:4:4 / 4:2:2 /
  * 4:2:0 tested), box-replication chroma upsampling, JFIF YCbCr→RGB with
  * round-half-up + clamp. Progressive (SOF2), arithmetic coding,
  * 12-bit precision, and hierarchical modes are REJECTED loudly — the
  * classifiable-decode-error stance every codec in this package takes.
  *
  * Encoder scope: the fixture generator — entropy-codes CHOSEN quantized
  * coefficients (real Huffman coding, DC prediction, run-length AC with
  * ZRL/EOB, restart markers, byte stuffing) under the standard Annex K
  * tables. Driving the encoder from coefficients rather than pixels keeps
  * the whole pipeline integer-exact for the oracle: fixtures use only DCT
  * basis vectors (u, v ∈ {0, 4}) whose IDCT is exactly ±F/8 per sample, so
  * with q = 8 the decoded samples are closed-form integers a SQL oracle
  * recomputes analytically (the mm_decode_png stance, adapted to a lossy
  * container by making the loss exactly zero on the planted frequencies).
  *
  * The IDCT itself is the exact double-precision separable transform (no
  * integer approximation): on arbitrary images it matches the JDK's
  * independent ImageIO decoder within ±2 (JpegSpec pins this), and on the
  * planted basis-vector fixtures it is bit-exact by construction.
  */
object Jpeg {

  /** zigzag(k) = natural index (v*8 + u) of zigzag position k. */
  private[multimodal] val ZigZag: Array[Int] = {
    val zz = new Array[Int](64)
    var (u, v) = (0, 0)
    var k = 0
    while (k < 64) {
      zz(k) = v * 8 + u
      if (((u + v) & 1) == 0) { // moving up-right
        if (u == 7) v += 1 else if (v == 0) u += 1 else { u += 1; v -= 1 }
      } else { // moving down-left
        if (v == 7) u += 1 else if (u == 0) v += 1 else { u -= 1; v += 1 }
      }
      k += 1
    }
    zz
  }

  // ---- Annex K (ITU-T T.81) Huffman table specs, used by the encoder;
  // the decoder always builds its tables from the DHT segments it reads.
  private val DcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = (0 to 11).toArray
  private val DcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = (0 to 11).toArray
  private val AcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman ENCODER table: symbol → (code, length). */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    locally {
      var c = 0
      var vi = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          code(vals(vi)) = c
          len(vals(vi)) = l
          c += 1; vi += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }

  /** Canonical Huffman DECODER table (mincode/maxcode/valptr walk). */
  private[multimodal] final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17) // -1 = no codes of this length
    private val valPtr = new Array[Int](17)
    locally {
      var c = 0
      var vi = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { minCode(l) = 0; maxCode(l) = -1; valPtr(l) = 0 }
        else {
          valPtr(l) = vi
          minCode(l) = c
          c += bits(l - 1); vi += bits(l - 1)
          maxCode(l) = c - 1
        }
        c <<= 1
        l += 1
      }
      require(vi == vals.length, s"DHT counts/values mismatch: $vi vs ${vals.length}")
    }

    def decode(br: BitReader): Int = {
      var c = br.bit()
      var l = 1
      while (maxCode(l) < 0 || c > maxCode(l)) {
        l += 1
        require(l <= 16, "invalid Huffman code in entropy stream")
        c = (c << 1) | br.bit()
      }
      vals(valPtr(l) + c - minCode(l))
    }
  }

  /** MSB-first bit writer with JPEG 0xFF byte stuffing. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, nbits: Int): Unit = {
      var i = nbits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // stuff
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the current byte with 1-bits (the T.81 fill convention). */
    def flush(): Unit = while (n != 0) write(1, 1)
  }

  /** MSB-first bit reader with 0xFF00 unstuffing; any other marker inside
    * entropy data is a loud failure (RSTn is consumed explicitly by
    * [[expectRst]] at restart boundaries, never here).
    */
  private[multimodal] final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(pos < bytes.length, "truncated entropy stream")
        val b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          require(pos < bytes.length, "truncated entropy stream")
          val m = bytes(pos) & 0xFF
          require(m == 0x00,
            f"unexpected marker 0xFF$m%02X inside entropy data")
          pos += 1
        }
        acc = b; n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def receive(nbits: Int): Int = {
      var v = 0
      var i = 0
      while (i < nbits) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def expectRst(m: Int): Unit = {
      n = 0 // byte-align
      require(pos + 2 <= bytes.length, "truncated entropy stream at restart")
      require((bytes(pos) & 0xFF) == 0xFF && (bytes(pos + 1) & 0xFF) == 0xD0 + m,
        f"missing RST$m%d marker (got 0x${bytes(pos) & 0xFF}%02X${bytes(pos + 1) & 0xFF}%02X)")
      pos += 2
    }
  }

  /** T.81 F.2.2.1 EXTEND: map `v` (the `nbits` received bits) to its
    * signed coefficient value.
    */
  private[multimodal] def extend(v: Int, nbits: Int): Int =
    if (nbits == 0) 0
    else if (v < (1 << (nbits - 1))) v - (1 << nbits) + 1
    else v

  private def bitSize(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  // cosTab(x)(u) = C(u) * cos((2x+1) u π / 16), C(0) = 1/√2
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Exact double-precision separable 8×8 inverse DCT of a DEQUANTIZED
    * natural-order block, +128 level shift, round-half-up, clamp to
    * [0, 255]. On basis-vector blocks (u, v ∈ {0, 4}) the pre-rounding
    * value is an exact integer, so the output is closed-form.
    */
  private[multimodal] def idct(coef: Array[Int]): Array[Int] = {
    val tmp = new Array[Double](64) // tmp(v*8+x) = Σ_u cosTab(x)(u) F(v,u)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(x)(u) * coef(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += CosTab(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        val p = math.round(0.25 * s + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
    out
  }

  private def clamp255(v: Long): Int =
    if (v < 0) 0 else if (v > 255) 255 else v.toInt

  /** One frame component as parsed from SOF0. */
  private final case class Component(id: Int, h: Int, v: Int, qt: Int)

  // ------------------------------------------------------------------
  // Encoder (fixture generator)
  // ------------------------------------------------------------------

  private def seg(out: java.io.ByteArrayOutputStream, marker: Int,
                  payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  /** Entropy-code one block's QUANTIZED natural-order coefficients. */
  private def encodeBlock(bw: BitWriter, nat: Array[Int], pred: Int,
                          dc: HuffEnc, ac: HuffEnc): Int = {
    val zz = new Array[Int](64)
    var k = 0
    while (k < 64) { zz(k) = nat(ZigZag(k)); k += 1 }
    val diff = zz(0) - pred
    val dsz = bitSize(diff)
    bw.write(dc.code(dsz), dc.len(dsz))
    if (dsz > 0)
      bw.write(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
    var lastNz = 0
    k = 63
    while (k > 0 && lastNz == 0) { if (zz(k) != 0) lastNz = k; k -= 1 }
    var run = 0
    k = 1
    while (k <= lastNz) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { bw.write(ac.code(0xF0), ac.len(0xF0)); run -= 16 }
        val sz = bitSize(zz(k))
        val sym = (run << 4) | sz
        bw.write(ac.code(sym), ac.len(sym))
        bw.write(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (lastNz < 63) bw.write(ac.code(0x00), ac.len(0x00)) // EOB
    zz(0)
  }

  /** Encode a baseline JFIF JPEG from CHOSEN quantized coefficients.
    *
    * `coef(comp, bx, by)` returns the natural-order (v*8+u) QUANTIZED
    * 8×8 coefficient block for component `comp` (0 = Y, 1 = Cb, 2 = Cr)
    * at block coords (bx, by) in that component's MCU-padded grid —
    * edge-padding blocks are requested too. Component 0 uses quant
    * table `lumaQ`, 1–2 use `chromaQ` (both natural order, 1..255).
    * `chroma420` picks 2×2 luma sampling (4:2:0) vs 1×1 (4:4:4);
    * `restartInterval` > 0 emits DRI and RSTn markers every that many
    * MCUs with DC-predictor resets.
    */
  def encodeFromCoefficients(width: Int, height: Int, chroma420: Boolean,
                             lumaQ: Array[Int], chromaQ: Array[Int],
                             restartInterval: Int,
                             coef: (Int, Int, Int) => Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dimensions ${width}x$height")
    require(lumaQ.length == 64 && chromaQ.length == 64, "quant tables must be 64 entries")
    require((lumaQ ++ chromaQ).forall(q => q >= 1 && q <= 255),
      "8-bit quant values required")
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(0xFF); out.write(0xD8) // SOI
    // APP0 JFIF
    seg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT (zigzag order on the wire)
    def dqt(tq: Int, nat: Array[Int]): Unit = {
      val p = new Array[Byte](65)
      p(0) = tq.toByte
      var k = 0
      while (k < 64) { p(1 + k) = nat(ZigZag(k)).toByte; k += 1 }
      seg(out, 0xDB, p)
    }
    dqt(0, lumaQ); dqt(1, chromaQ)
    // SOF0
    val lumaHV = if (chroma420) 0x22 else 0x11
    seg(out, 0xC0, Array[Byte](8,
      ((height >> 8) & 0xFF).toByte, (height & 0xFF).toByte,
      ((width >> 8) & 0xFF).toByte, (width & 0xFF).toByte,
      3, 1, lumaHV.toByte, 0, 2, 0x11, 1, 3, 0x11, 1))
    // DHT × 4
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit =
      seg(out, 0xC4, (Array((tc << 4) | th) ++ bits ++ vals).map(_.toByte))
    dht(0, 0, DcLumaBits, DcLumaVals); dht(1, 0, AcLumaBits, AcLumaVals)
    dht(0, 1, DcChromaBits, DcChromaVals); dht(1, 1, AcChromaBits, AcChromaVals)
    if (restartInterval > 0)
      seg(out, 0xDD, Array[Byte](((restartInterval >> 8) & 0xFF).toByte,
        (restartInterval & 0xFF).toByte))
    // SOS
    seg(out, 0xDA, Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    // entropy-coded data
    val dcL = new HuffEnc(DcLumaBits, DcLumaVals)
    val acL = new HuffEnc(AcLumaBits, AcLumaVals)
    val dcC = new HuffEnc(DcChromaBits, DcChromaVals)
    val acC = new HuffEnc(AcChromaBits, AcChromaVals)
    val (lh, lv) = if (chroma420) (2, 2) else (1, 1)
    val mcuCols = (width + 8 * lh - 1) / (8 * lh)
    val mcuRows = (height + 8 * lv - 1) / (8 * lv)
    val bw = new BitWriter(out)
    val preds = new Array[Int](3)
    var mcu = 0
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xFF); out.write(0xD0 + ((mcu / restartInterval - 1) % 8))
          java.util.Arrays.fill(preds, 0)
        }
        var vv = 0
        while (vv < lv) {
          var hh = 0
          while (hh < lh) {
            preds(0) = encodeBlock(bw, coef(0, mx * lh + hh, my * lv + vv),
              preds(0), dcL, acL)
            hh += 1
          }
          vv += 1
        }
        preds(1) = encodeBlock(bw, coef(1, mx, my), preds(1), dcC, acC)
        preds(2) = encodeBlock(bw, coef(2, mx, my), preds(2), dcC, acC)
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Parse a baseline JFIF JPEG to top-down RGB (grayscale replicates the
    * luma channel). Throws IllegalArgumentException on malformed or
    * unsupported input.
    */
  def decode(bytes: Array[Byte]): Codecs.Image = {
    require(bytes.length >= 4, s"truncated JPEG: ${bytes.length} bytes")
    require((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8,
      "bad JPEG signature (missing SOI)")
    var pos = 2
    val quant = new Array[Array[Int]](4) // natural order, dequant-ready
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    var comps: Array[Component] = null
    var width = -1
    var height = -1
    var restartInterval = 0
    var scanComps: Array[(Int, Int)] = null // (dcTab, acTab) per component
    var sawSos = false

    def u16be(off: Int): Int = {
      require(off + 2 <= bytes.length, s"truncated segment at $off")
      ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    }

    while (!sawSos) {
      require(pos + 2 <= bytes.length, "truncated JPEG: missing SOS")
      require((bytes(pos) & 0xFF) == 0xFF,
        f"expected marker at $pos, got 0x${bytes(pos) & 0xFF}%02X")
      val marker = bytes(pos + 1) & 0xFF
      pos += 2
      marker match {
        case 0xD8 => throw new IllegalArgumentException("unexpected second SOI")
        case 0xD9 => throw new IllegalArgumentException("EOI before any scan")
        case 0x01 => throw new IllegalArgumentException("stray TEM marker")
        case m if m >= 0xD0 && m <= 0xD7 =>
          throw new IllegalArgumentException(f"stray RST marker 0x$m%02X")
        case _ =>
          val len = u16be(pos)
          require(len >= 2 && pos + len <= bytes.length,
            s"truncated segment 0x${marker.toHexString} at $pos")
          val end = pos + len
          var p = pos + 2
          marker match {
            case 0xDB => // DQT: one or more tables
              while (p < end) {
                val pq = (bytes(p) & 0xFF) >> 4
                val tq = bytes(p) & 0x0F
                require(pq <= 1, s"bad DQT precision $pq")
                require(tq < 4, s"bad DQT id $tq")
                // bound every fixed-size read by the DECLARED segment end —
                // a corrupt length must fail loudly, not consume the next
                // segment's bytes as table values (ADVICE r13)
                require(p + 1 + (if (pq == 0) 64 else 128) <= end,
                  "truncated DQT table")
                p += 1
                val t = new Array[Int](64)
                var k = 0
                while (k < 64) {
                  val v = if (pq == 0) { val x = bytes(p) & 0xFF; p += 1; x }
                    else { val x = u16be(p); p += 2; x }
                  require(v >= 1, "zero quantization value")
                  t(ZigZag(k)) = v
                  k += 1
                }
                quant(tq) = t
              }
            case 0xC4 => // DHT: one or more tables
              while (p < end) {
                val tc = (bytes(p) & 0xFF) >> 4
                val th = bytes(p) & 0x0F
                require(tc <= 1 && th < 4, s"bad DHT class/id $tc/$th")
                require(p + 17 <= end, "truncated DHT header")
                p += 1
                val bits = Array.tabulate(16)(i => bytes(p + i) & 0xFF)
                p += 16
                val n = bits.sum
                require(p + n <= end, "truncated DHT values")
                val vals = Array.tabulate(n)(i => bytes(p + i) & 0xFF)
                p += n
                val tab = new HuffDec(bits, vals)
                if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              }
            case 0xC0 => // SOF0 baseline
              require(comps == null, "multiple SOF segments")
              require(p + 6 <= end, "truncated SOF header")
              require((bytes(p) & 0xFF) == 8,
                s"unsupported sample precision ${bytes(p) & 0xFF}")
              height = u16be(p + 1); width = u16be(p + 3)
              require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
              val nc = bytes(p + 5) & 0xFF
              require(nc == 1 || nc == 3, s"unsupported component count $nc")
              require(p + 6 + 3 * nc == end, "SOF length/component mismatch")
              comps = Array.tabulate(nc) { i =>
                val o = p + 6 + 3 * i
                val c = Component(bytes(o) & 0xFF, (bytes(o + 1) & 0xFF) >> 4,
                  bytes(o + 1) & 0x0F, bytes(o + 2) & 0xFF)
                require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
                  s"bad sampling factors ${c.h}x${c.v}")
                require(c.qt < 4, s"bad quant table id ${c.qt}")
                c
              }
            case m if m == 0xC1 || m == 0xC2 || m == 0xC3 ||
                (m >= 0xC5 && m <= 0xC7) || (m >= 0xC9 && m <= 0xCB) ||
                (m >= 0xCD && m <= 0xCF) =>
              throw new IllegalArgumentException(
                f"unsupported SOF type 0x$m%02X (baseline sequential only)")
            case 0xDD =>
              require(end == p + 2, "DRI segment must be exactly 4 bytes")
              restartInterval = u16be(p)
            case 0xDA => // SOS
              require(comps != null, "SOS before SOF")
              require(p + 1 <= end, "truncated SOS header")
              val ns = bytes(p) & 0xFF
              require(ns == comps.length, s"scan components $ns != frame ${comps.length}")
              require(p + 4 + 2 * ns == end, "SOS length/component mismatch")
              scanComps = new Array[(Int, Int)](ns)
              var i = 0
              while (i < ns) {
                val cid = bytes(p + 1 + 2 * i) & 0xFF
                val ti = comps.indexWhere(_.id == cid)
                require(ti >= 0, s"scan references unknown component $cid")
                require(ti == i, "non-frame-order interleaved scan unsupported")
                val tt = bytes(p + 2 + 2 * i) & 0xFF
                scanComps(i) = ((tt >> 4, tt & 0x0F))
                i += 1
              }
              val ss = bytes(p + 1 + 2 * ns) & 0xFF
              val se = bytes(p + 2 + 2 * ns) & 0xFF
              val ahal = bytes(p + 3 + 2 * ns) & 0xFF
              require(ss == 0 && se == 63 && ahal == 0,
                s"non-baseline scan parameters $ss/$se/$ahal")
              sawSos = true
            case _ => // APPn / COM / other: skip
          }
          pos = end
      }
    }

    // entropy-coded scan
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
    val mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
    val planeW = comps.map(c => mcuCols * c.h * 8)
    val planes = comps.zipWithIndex.map { case (c, i) =>
      new Array[Int](planeW(i) * mcuRows * c.v * 8)
    }
    comps.zipWithIndex.foreach { case (c, i) =>
      require(quant(c.qt) != null, s"component $i references missing DQT ${c.qt}")
      require(dcTabs(scanComps(i)._1) != null, s"missing DC Huffman table ${scanComps(i)._1}")
      require(acTabs(scanComps(i)._2) != null, s"missing AC Huffman table ${scanComps(i)._2}")
    }
    val br = new BitReader(bytes, pos)
    val preds = new Array[Int](comps.length)
    val coefZ = new Array[Int](64)
    val nat = new Array[Int](64)
    var mcu = 0
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.expectRst((mcu / restartInterval - 1) % 8)
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val qt = quant(c.qt)
          val dc = dcTabs(scanComps(ci)._1)
          val ac = acTabs(scanComps(ci)._2)
          var vv = 0
          while (vv < c.v) {
            var hh = 0
            while (hh < c.h) {
              java.util.Arrays.fill(coefZ, 0)
              val dsz = dc.decode(br)
              require(dsz <= 15, s"bad DC size $dsz")
              preds(ci) += extend(br.receive(dsz), dsz)
              coefZ(0) = preds(ci)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = ac.decode(br)
                val r = rs >> 4
                val sz = rs & 0x0F
                if (sz == 0) {
                  if (r == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += r
                  require(k < 64, "AC coefficient index overflow")
                  coefZ(k) = extend(br.receive(sz), sz)
                  k += 1
                }
              }
              // qt is natural-order: index it through the SAME dezigzag
              // as the coefficient placement (a uniform fixture table
              // cannot see this; a real libjpeg table can)
              var j = 0
              while (j < 64) {
                val n = ZigZag(j)
                nat(n) = coefZ(j) * qt(n)
                j += 1
              }
              val px = idct(nat)
              val bx = (mx * c.h + hh) * 8
              val by = (my * c.v + vv) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  planes(ci)((by + y) * planeW(ci) + bx + x) = px(y * 8 + x)
                  x += 1
                }
                y += 1
              }
              hh += 1
            }
            vv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    // upsample (box replication) + color convert, cropping MCU padding
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        if (comps.length == 1) {
          val g = planes(0)(y * planeW(0) + x)
          rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
        } else {
          val yv = planes(0)((y * comps(0).v / vMax) * planeW(0) + x * comps(0).h / hMax)
          val cb = planes(1)((y * comps(1).v / vMax) * planeW(1) + x * comps(1).h / hMax) - 128
          val cr = planes(2)((y * comps(2).v / vMax) * planeW(2) + x * comps(2).h / hMax) - 128
          rgb(o) = clamp255(math.round(yv + 1.402 * cr)).toByte
          rgb(o + 1) = clamp255(math.round(yv - 0.344136 * cb - 0.714136 * cr)).toByte
          rgb(o + 2) = clamp255(math.round(yv + 1.772 * cb)).toByte
        }
        x += 1
      }
      y += 1
    }
    Codecs.Image(width, height, rgb)
  }
}

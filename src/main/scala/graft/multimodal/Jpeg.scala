package graft.multimodal

/** Baseline sequential + PROGRESSIVE JPEG (JFIF), pure JVM — the dominant
  * crawled-image format and the one codec gap after BMP/PNG/GIF/WAV
  * (VERDICT r12 #1; progressive is r13 #4 — the majority of large web
  * JPEGs are SOF2).
  *
  * Decoder scope: baseline DCT (SOF0) and progressive DCT (SOF2) — for
  * progressive, full T.81 Annex G.2 entropy decoding: spectral selection
  * (per-band AC scans, single-component, EOB runs), successive
  * approximation (DC and AC initial + refinement scans, point
  * transforms), interleaved DC scans, DHT/DQT redefinition between
  * scans, and restart markers resetting both DC predictors and the EOB
  * run. Both modes share one coefficient-buffer architecture: every scan
  * accumulates zigzag-ordered quantized coefficients per component
  * (baseline is the one-scan special case), then a single dequant + IDCT
  * pass assembles the planes. Also: 8-bit samples, 1 or 3 components,
  * arbitrary Huffman/quantization tables read from DHT/DQT (8- and
  * 16-bit precision), 0xFF00 byte unstuffing, any sampling factors up to
  * 4 (4:4:4 / 4:2:2 / 4:2:0 tested), box-replication chroma upsampling,
  * JFIF YCbCr→RGB with round-half-up + clamp. Arithmetic coding, 12-bit
  * precision, and hierarchical modes are REJECTED loudly — the
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

  // Universal two-length Huffman table for the progressive fixture
  // encoder: codes 0..127 at length 8, 128..255 at length 9 — every
  // (run, size) symbol codable (progressive needs EOBn symbols r<<4 that
  // Annex K's AC tables lack), never the all-ones code, trivially
  // canonical. Fixture efficiency is irrelevant; decode correctness
  // against arbitrary DHT tables is what the interop test pins.
  private val UniBits = Array(0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0)
  private val UniVals = (0 until 256).toArray

  /** Encode a PROGRESSIVE (SOF2) JFIF JPEG from the SAME chosen quantized
    * coefficients as [[encodeFromCoefficients]] — the fixture generator
    * for the progressive decoder (VERDICT r13 #4). The scan script
    * exercises every T.81 G.2 scan type: an interleaved DC first pass at
    * Al=1 (arithmetic-shift point transform), a DC refinement
    * (Ah=1→Al=0, one raw bit per block), then per component the spectral
    * bands 1–5 and 6–63, each as an Al=1 AC first pass (EOB runs, ZRL,
    * magnitude-shifted coefficients) followed by its Ah=1→Al=0 AC
    * refinement (newly-nonzero ±1 emissions with correction bits for
    * already-nonzero coefficients, including inside EOB runs). Decoding
    * this stream must land the EXACT planted coefficients — successive
    * approximation reconstructs integers losslessly once Al reaches 0 —
    * so the analytic basis-vector oracle carries over unchanged from the
    * baseline fixture.
    */
  def encodeProgressiveFromCoefficients(width: Int, height: Int,
                                        chroma420: Boolean,
                                        lumaQ: Array[Int], chromaQ: Array[Int],
                                        coef: (Int, Int, Int) => Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"bad dimensions ${width}x$height")
    require(lumaQ.length == 64 && chromaQ.length == 64, "quant tables must be 64 entries")
    require((lumaQ ++ chromaQ).forall(q => q >= 1 && q <= 255),
      "8-bit quant values required")
    val out = new java.io.ByteArrayOutputStream(4096)
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xE0, Array[Byte]('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    def dqt(tq: Int, nat: Array[Int]): Unit = {
      val p = new Array[Byte](65)
      p(0) = tq.toByte
      var k = 0
      while (k < 64) { p(1 + k) = nat(ZigZag(k)).toByte; k += 1 }
      seg(out, 0xDB, p)
    }
    dqt(0, lumaQ); dqt(1, chromaQ)
    val lumaHV = if (chroma420) 0x22 else 0x11
    seg(out, 0xC2, Array[Byte](8, // SOF2
      ((height >> 8) & 0xFF).toByte, (height & 0xFF).toByte,
      ((width >> 8) & 0xFF).toByte, (width & 0xFF).toByte,
      3, 1, lumaHV.toByte, 0, 2, 0x11, 1, 3, 0x11, 1))
    // ONE universal table serves every scan (DC id 0, AC id 0)
    seg(out, 0xC4, (Array(0x00) ++ UniBits ++ UniVals).map(_.toByte))
    seg(out, 0xC4, (Array(0x10) ++ UniBits ++ UniVals).map(_.toByte))
    val uni = new HuffEnc(UniBits, UniVals)
    val (lh, lv) = if (chroma420) (2, 2) else (1, 1)
    val hv = Array((lh, lv), (1, 1), (1, 1))
    val mcuCols = (width + 8 * lh - 1) / (8 * lh)
    val mcuRows = (height + 8 * lv - 1) / (8 * lv)
    def zzOf(comp: Int, bx: Int, by: Int): Array[Int] = {
      val natB = coef(comp, bx, by)
      val zz = new Array[Int](64)
      var k = 0
      while (k < 64) { zz(k) = natB(ZigZag(k)); k += 1 }
      zz
    }
    def sos(compIds: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      seg(out, 0xDA,
        (Array(compIds.length) ++
          compIds.flatMap(c => Array(c + 1, 0x00)) ++
          Array(ss, se, (ah << 4) | al)).map(_.toByte))
    def floorLog2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

    // ---- scan 1: DC first pass, interleaved, Al=1 (arithmetic shift)
    sos(Seq(0, 1, 2), 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      val preds = new Array[Int](3)
      var my = 0
      while (my < mcuRows) {
        var mx = 0
        while (mx < mcuCols) {
          var comp = 0
          while (comp < 3) {
            val (h, v) = hv(comp)
            var vv = 0
            while (vv < v) {
              var hh = 0
              while (hh < h) {
                val dc = zzOf(comp, mx * h + hh, my * v + vv)(0) >> 1
                val diff = dc - preds(comp)
                preds(comp) = dc
                val dsz = bitSize(diff)
                bw.write(uni.code(dsz), uni.len(dsz))
                if (dsz > 0)
                  bw.write(if (diff < 0) diff + (1 << dsz) - 1 else diff, dsz)
                hh += 1
              }
              vv += 1
            }
            comp += 1
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }
    // ---- scan 2: DC refinement, Ah=1, Al=0 — one raw bit per block
    sos(Seq(0, 1, 2), 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      var my = 0
      while (my < mcuRows) {
        var mx = 0
        while (mx < mcuCols) {
          var comp = 0
          while (comp < 3) {
            val (h, v) = hv(comp)
            var vv = 0
            while (vv < v) {
              var hh = 0
              while (hh < h) {
                bw.write(zzOf(comp, mx * h + hh, my * v + vv)(0) & 1, 1)
                hh += 1
              }
              vv += 1
            }
            comp += 1
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }
    // non-interleaved block grids (T.81: ceil(compDim/8), NOT MCU-padded)
    def grid(comp: Int): (Int, Int) = {
      val (h, v) = hv(comp)
      (((width * h + lh - 1) / lh + 7) / 8,
        ((height * v + lv - 1) / lv + 7) / 8)
    }
    // ---- per-component AC band scans
    def acFirst(comp: Int, b0: Int, b1: Int): Unit = { // Ah=0, Al=1
      sos(Seq(comp), b0, b1, 0, 1)
      val bw = new BitWriter(out)
      var eobrun = 0
      def flushEob(): Unit = if (eobrun > 0) {
        val nb = floorLog2(eobrun)
        bw.write(uni.code(nb << 4), uni.len(nb << 4))
        if (nb > 0) bw.write(eobrun - (1 << nb), nb)
        eobrun = 0
      }
      val (bwd, bhd) = grid(comp)
      var by = 0
      while (by < bhd) {
        var bx = 0
        while (bx < bwd) {
          val zz = zzOf(comp, bx, by)
          def pt(v: Int): Int = if (v < 0) -((-v) >> 1) else v >> 1
          var lastNz = b0 - 1
          var k = b0
          while (k <= b1) { if (pt(zz(k)) != 0) lastNz = k; k += 1 }
          if (lastNz < b0) {
            eobrun += 1
            if (eobrun == 0x7FFF) flushEob()
          } else {
            flushEob()
            var run = 0
            k = b0
            while (k <= lastNz) {
              val v = pt(zz(k))
              if (v == 0) run += 1
              else {
                while (run > 15) {
                  bw.write(uni.code(0xF0), uni.len(0xF0)); run -= 16
                }
                val sz = bitSize(v)
                bw.write(uni.code((run << 4) | sz), uni.len((run << 4) | sz))
                bw.write(if (v < 0) v + (1 << sz) - 1 else v, sz)
                run = 0
              }
              k += 1
            }
            if (lastNz < b1) eobrun += 1
          }
          bx += 1
        }
        by += 1
      }
      flushEob()
      bw.flush()
    }
    def acRefineScan(comp: Int, b0: Int, b1: Int): Unit = { // Ah=1, Al=0
      sos(Seq(comp), b0, b1, 1, 0)
      val bw = new BitWriter(out)
      var eobrun = 0
      val be = scala.collection.mutable.ArrayBuffer.empty[Int] // EOB-pending bits
      def flushEob(): Unit = if (eobrun > 0) {
        val nb = floorLog2(eobrun)
        bw.write(uni.code(nb << 4), uni.len(nb << 4))
        if (nb > 0) bw.write(eobrun - (1 << nb), nb)
        eobrun = 0
        be.foreach(b => bw.write(b, 1)); be.clear()
      }
      val (bwd, bhd) = grid(comp)
      var by = 0
      while (by < bhd) {
        var bx = 0
        while (bx < bwd) {
          val zz = zzOf(comp, bx, by)
          // Al=0: |v| == 1 is newly nonzero this scan, |v| > 1 already was
          var eobK = b0 - 1
          var k = b0
          while (k <= b1) { if (math.abs(zz(k)) == 1) eobK = k; k += 1 }
          var r = 0
          val brBits = scala.collection.mutable.ArrayBuffer.empty[Int]
          k = b0
          while (k <= b1) {
            val v = zz(k)
            val t = math.abs(v)
            if (t == 0) r += 1
            else {
              // ZRLs only when they cannot fold into the EOB run
              while (r > 15 && k <= eobK) {
                flushEob()
                bw.write(uni.code(0xF0), uni.len(0xF0)); r -= 16
                brBits.foreach(b => bw.write(b, 1)); brBits.clear()
              }
              if (t > 1) brBits += (t & 1) // correction bit only
              else {
                flushEob()
                bw.write(uni.code((r << 4) | 1), uni.len((r << 4) | 1))
                bw.write(if (v < 0) 0 else 1, 1)
                brBits.foreach(b => bw.write(b, 1)); brBits.clear()
                r = 0
              }
            }
            k += 1
          }
          if (r > 0 || brBits.nonEmpty) {
            eobrun += 1
            be ++= brBits
            if (eobrun == 0x7FFF || be.length > 900) flushEob()
          }
          bx += 1
        }
        by += 1
      }
      flushEob()
      bw.flush()
    }
    var comp = 0
    while (comp < 3) { acFirst(comp, 1, 5); acFirst(comp, 6, 63); comp += 1 }
    comp = 0
    while (comp < 3) {
      acRefineScan(comp, 1, 5); acRefineScan(comp, 6, 63); comp += 1
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Decoder
  // ------------------------------------------------------------------

  /** Parse a baseline or progressive JFIF JPEG to top-down RGB
    * (grayscale replicates the luma channel). Throws
    * IllegalArgumentException on malformed or unsupported input.
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
    var progressive = false
    var sawScan = false
    var eoi = false
    // per-component zigzag-ordered quantized coefficient stores on the
    // MCU-padded block grid; scans accumulate here, dequant+IDCT runs once
    var coefs: Array[Array[Int]] = null
    var blocksW: Array[Int] = null
    var blocksH: Array[Int] = null
    var hMax = 1
    var vMax = 1
    var mcuCols = 0
    var mcuRows = 0

    def u16be(off: Int): Int = {
      require(off + 2 <= bytes.length, s"truncated segment at $off")
      ((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)
    }

    while (!eoi) {
      require(pos + 2 <= bytes.length, "truncated JPEG: missing EOI")
      require((bytes(pos) & 0xFF) == 0xFF,
        f"expected marker at $pos, got 0x${bytes(pos) & 0xFF}%02X")
      val marker = bytes(pos + 1) & 0xFF
      pos += 2
      marker match {
        case 0xD8 => throw new IllegalArgumentException("unexpected second SOI")
        case 0xD9 =>
          if (!sawScan) throw new IllegalArgumentException("EOI before any scan")
          eoi = true
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
            case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
              progressive = marker == 0xC2
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
              hMax = comps.map(_.h).max
              vMax = comps.map(_.v).max
              mcuCols = (width + 8 * hMax - 1) / (8 * hMax)
              mcuRows = (height + 8 * vMax - 1) / (8 * vMax)
              blocksW = comps.map(c => mcuCols * c.h)
              blocksH = comps.map(c => mcuRows * c.v)
              coefs = comps.indices.toArray.map(i =>
                new Array[Int](blocksW(i) * blocksH(i) * 64))
            case m if m == 0xC1 || m == 0xC3 ||
                (m >= 0xC5 && m <= 0xC7) || (m >= 0xC9 && m <= 0xCB) ||
                (m >= 0xCD && m <= 0xCF) =>
              throw new IllegalArgumentException(
                f"unsupported SOF type 0x$m%02X (baseline + progressive only)")
            case 0xDD =>
              require(end == p + 2, "DRI segment must be exactly 4 bytes")
              restartInterval = u16be(p)
            case 0xDA => // SOS: parse the header, then decode the scan
              require(comps != null, "SOS before SOF")
              require(p + 1 <= end, "truncated SOS header")
              val ns = bytes(p) & 0xFF
              require(p + 4 + 2 * ns == end, "SOS length/component mismatch")
              if (!progressive)
                require(ns == comps.length,
                  s"scan components $ns != frame ${comps.length}")
              else require(ns >= 1 && ns <= comps.length,
                s"bad scan component count $ns")
              val scanCis = new Array[Int](ns)
              val dcSel = new Array[Int](ns)
              val acSel = new Array[Int](ns)
              var i = 0
              var prevTi = -1
              while (i < ns) {
                val cid = bytes(p + 1 + 2 * i) & 0xFF
                val ti = comps.indexWhere(_.id == cid)
                require(ti >= 0, s"scan references unknown component $cid")
                require(ti > prevTi, "non-frame-order interleaved scan unsupported")
                prevTi = ti
                val tt = bytes(p + 2 + 2 * i) & 0xFF
                scanCis(i) = ti
                dcSel(i) = tt >> 4
                acSel(i) = tt & 0x0F
                i += 1
              }
              val ss = bytes(p + 1 + 2 * ns) & 0xFF
              val se = bytes(p + 2 + 2 * ns) & 0xFF
              val ahal = bytes(p + 3 + 2 * ns) & 0xFF
              val ah = ahal >> 4
              val al = ahal & 0x0F
              if (!progressive)
                require(ss == 0 && se == 63 && ahal == 0,
                  s"non-baseline scan parameters $ss/$se/$ahal")
              else {
                if (ss == 0) require(se == 0,
                  s"progressive DC scan must have Se=0, got $se")
                else {
                  require(ns == 1, "progressive AC scan must be single-component")
                  require(se >= ss && se <= 63, s"bad spectral band $ss..$se")
                }
                require(ah == 0 || ah == al + 1,
                  s"bad successive approximation $ah/$al")
                require(al <= 13, s"bad point transform $al")
              }
              // table existence for exactly what this scan consumes: the
              // DC table only on a first DC pass (refinement reads raw
              // bits), the AC table on any scan touching an AC band
              i = 0
              while (i < ns) {
                if (ss == 0 && ah == 0)
                  require(dcTabs(dcSel(i)) != null,
                    s"missing DC Huffman table ${dcSel(i)}")
                if (se > 0)
                  require(acTabs(acSel(i)) != null,
                    s"missing AC Huffman table ${acSel(i)}")
                i += 1
              }
              pos = decodeScan(bytes, end, comps, coefs, blocksW,
                scanCis, dcSel.map(dcTabs), acSel.map(acTabs),
                ss, se, ah, al, restartInterval,
                mcuCols, mcuRows, hMax, vMax, width, height)
              sawScan = true
            case _ => // APPn / COM / other: skip
          }
          if (marker != 0xDA) pos = end
      }
    }

    // dequant + IDCT every block into the MCU-padded planes
    val planeW = comps.indices.map(i => blocksW(i) * 8).toArray
    val planes = comps.indices.map(i =>
      new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
    val nat = new Array[Int](64)
    var ci = 0
    while (ci < comps.length) {
      val qt = quant(comps(ci).qt)
      require(qt != null, s"component $ci references missing DQT ${comps(ci).qt}")
      val cz = coefs(ci)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val off = (by * blocksW(ci) + bx) * 64
          // qt is natural-order: index it through the SAME dezigzag as
          // the coefficient placement (a uniform fixture table cannot
          // see this; a real libjpeg table can)
          var j = 0
          while (j < 64) {
            val n = ZigZag(j)
            nat(n) = cz(off + j) * qt(n)
            j += 1
          }
          val px = idct(nat)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(ci)((by * 8 + y) * planeW(ci) + bx * 8 + x) = px(y * 8 + x)
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
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

  /** Decode ONE entropy-coded scan into the zigzag coefficient stores
    * and return the byte position just past its entropy data. Covers
    * the baseline full scan (Ss=0, Se=63, Ah=Al=0, interleaved) and
    * every progressive scan type of T.81 G.2: DC initial (the point
    * transform is an arithmetic shift) and DC refinement (one raw bit
    * per block), AC initial with EOB runs, and AC refinement (the
    * correction-bit walk — each already-nonzero coefficient in the band
    * consumes one bit even inside an EOB run). A scan with one
    * component is non-interleaved (its own ceil(dim/8) block grid, the
    * T.81 rule — baseline grayscale included); restart markers reset
    * the DC predictors AND the EOB run.
    */
  private def decodeScan(bytes: Array[Byte], startPos: Int,
                         comps: Array[Component], coefs: Array[Array[Int]],
                         blocksW: Array[Int], scanCis: Array[Int],
                         dcSel: Array[HuffDec], acSel: Array[HuffDec],
                         ss: Int, se: Int, ah: Int, al: Int,
                         restartInterval: Int, mcuCols: Int, mcuRows: Int,
                         hMax: Int, vMax: Int, width: Int, height: Int): Int = {
    val br = new BitReader(bytes, startPos)
    val preds = new Array[Int](scanCis.length)
    var eobrun = 0
    val k0 = math.max(ss, 1) // AC band start (baseline: 1, DC-only: none)

    def dcInitial(cz: Array[Int], off: Int, sci: Int): Unit = {
      val dsz = dcSel(sci).decode(br)
      require(dsz <= 15, s"bad DC size $dsz")
      preds(sci) += extend(br.receive(dsz), dsz)
      cz(off) = preds(sci) << al
    }

    def acInitial(cz: Array[Int], off: Int, sci: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val ac = acSel(sci)
      var k = k0
      while (k <= se) {
        val rs = ac.decode(br)
        val r = rs >> 4
        val sz = rs & 0x0F
        if (sz == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
            k = 64
          }
        } else {
          k += r
          require(k <= se, "AC coefficient index overflow")
          cz(off + k) = extend(br.receive(sz), sz) << al
          k += 1
        }
      }
    }

    def acRefine(cz: Array[Int], off: Int, sci: Int): Unit = {
      val ac = acSel(sci)
      val p1 = 1 << al
      val m1 = -(1 << al)
      var k = k0
      if (eobrun == 0) {
        var inBand = true
        while (k <= se && inBand) {
          val rs = ac.decode(br)
          var r = rs >> 4
          val sz = rs & 0x0F
          var newval = 0
          if (sz == 0) {
            if (r != 15) {
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              inBand = false // EOB: tail-refine below, eobrun covers it
            }
            // r == 15: ZRL — pass 16 zero-history positions below
          } else {
            require(sz == 1, s"bad refinement magnitude size $sz")
            newval = if (br.bit() == 1) p1 else m1
          }
          if (inBand) {
            var placed = false
            while (k <= se && !placed) {
              val c = cz(off + k)
              if (c != 0) {
                // one correction bit per already-nonzero coefficient
                if (br.bit() == 1 && (c & p1) == 0)
                  cz(off + k) = c + (if (c >= 0) p1 else m1)
                k += 1
              } else if (r == 0) placed = true
              else { r -= 1; k += 1 }
            }
            if (sz != 0) {
              require(k <= se, "refinement position overflow")
              cz(off + k) = newval
            }
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        // the rest of the band still carries one correction bit per
        // already-nonzero coefficient, EOB run or not
        while (k <= se) {
          val c = cz(off + k)
          if (c != 0) {
            if (br.bit() == 1 && (c & p1) == 0)
              cz(off + k) = c + (if (c >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }

    def decodeBlock(sci: Int, bx: Int, by: Int): Unit = {
      val ci = scanCis(sci)
      val cz = coefs(ci)
      val off = (by * blocksW(ci) + bx) * 64
      if (ss == 0) {
        if (ah == 0) dcInitial(cz, off, sci)
        else cz(off) |= br.bit() << al // DC refinement: one raw bit
      }
      if (se >= k0 && se > 0) {
        if (ah == 0) acInitial(cz, off, sci)
        else acRefine(cz, off, sci)
      }
    }

    var unit = 0 // MCUs (interleaved) or blocks (single-component)
    def maybeRestart(): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        br.expectRst((unit / restartInterval - 1) % 8)
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }

    if (scanCis.length > 1) { // interleaved MCU order
      var my = 0
      while (my < mcuRows) {
        var mx = 0
        while (mx < mcuCols) {
          maybeRestart()
          var sci = 0
          while (sci < scanCis.length) {
            val c = comps(scanCis(sci))
            var vv = 0
            while (vv < c.v) {
              var hh = 0
              while (hh < c.h) {
                decodeBlock(sci, mx * c.h + hh, my * c.v + vv)
                hh += 1
              }
              vv += 1
            }
            sci += 1
          }
          unit += 1
          mx += 1
        }
        my += 1
      }
    } else { // non-interleaved: the component's own ceil(dim/8) grid
      val c = comps(scanCis(0))
      val bw = ((width * c.h + hMax - 1) / hMax + 7) / 8
      val bh = ((height * c.v + vMax - 1) / vMax + 7) / 8
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          maybeRestart()
          decodeBlock(0, bx, by)
          unit += 1
          bx += 1
        }
        by += 1
      }
    }
    br.pos
  }
}

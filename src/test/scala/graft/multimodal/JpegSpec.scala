package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Jpeg: coefficient-exact fixture decode, restart markers, the ImageIO
  * cross-check (the JDK ships an independent JPEG codec — our decoder
  * must agree with it within IDCT rounding), and loud rejections.
  */
class JpegSpec extends AnyFunSuite {

  private val q8 = Array.fill(64)(8)
  private def zeros = new Array[Int](64)

  test("zigzag table matches the T.81 scan order landmarks") {
    val zz = Jpeg.ZigZag
    assert(zz(0) == 0) // (u=0,v=0)
    assert(zz(1) == 1) // (1,0) — first step right
    assert(zz(2) == 8) // (0,1)
    assert(zz(5) == 2) // (2,0)
    assert(zz(10) == 32) // (0,4)
    assert(zz(14) == 4) // (4,0)
    assert(zz(63) == 63)
    assert(zz.toSet == (0 until 64).toSet, "must be a permutation")
  }

  test("DC-only 4:2:0 image decodes to closed-form flat blocks") {
    // luma DC = 16 (q 8 → F = 128 → sample 128 + 16); chroma zero → gray
    val bytes = Jpeg.encodeFromCoefficients(16, 16, chroma420 = true,
      q8, q8, 0, (comp, _, _) => {
        val c = zeros
        if (comp == 0) c(0) = 16
        c
      })
    val img = Jpeg.decode(bytes)
    assert(img.width == 16 && img.height == 16)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(img.pixel(x, y) == ((144, 144, 144)), s"pixel ($x,$y)")
  }

  test("basis coefficient (4,0) produces the exact ±F/8 sign pattern") {
    // F(u=4,v=0) = 8 * 8 = 64 → contribution ±8 with sign +,-,-,+ per x%4
    val bytes = Jpeg.encodeFromCoefficients(8, 8, chroma420 = false,
      q8, q8, 0, (comp, _, _) => {
        val c = zeros
        if (comp == 0) { c(0) = 16; c(4) = 8 }
        c
      })
    val img = Jpeg.decode(bytes)
    for (y <- 0 until 8; x <- 0 until 8) {
      val sx = if (x % 4 == 0 || x % 4 == 3) 1 else -1
      assert(img.pixel(x, y)._1 == 144 + sx * 8, s"pixel ($x,$y)")
    }
  }

  test("chroma DC shifts colors through the exact JFIF conversion") {
    // Y = 128, Cb = 128 + 10, Cr = 128 - 6 (chroma q 8, DC coef ±)
    val bytes = Jpeg.encodeFromCoefficients(16, 16, chroma420 = true,
      q8, q8, 0, (comp, _, _) => {
        val c = zeros
        if (comp == 1) c(0) = 10
        if (comp == 2) c(0) = -6
        c
      })
    val img = Jpeg.decode(bytes)
    val r = math.round(128 + 1.402 * -6).toInt
    val g = math.round(128 - 0.344136 * 10 - 0.714136 * -6).toInt
    val b = math.round(128 + 1.772 * 10).toInt
    for (y <- 0 until 16; x <- 0 until 16)
      assert(img.pixel(x, y) == ((r, g, b)), s"pixel ($x,$y)")
  }

  test("restart markers with DC-predictor resets decode identically") {
    def coef(comp: Int, bx: Int, by: Int): Array[Int] = {
      val c = zeros
      c(0) = comp + 2 * bx - 3 * by
      if (comp == 0) c(4) = (bx + by) % 5 - 2
      c
    }
    // 4:4:4 → many 8×8 MCUs; DRI 2 exercises several RSTn values
    val plain = Jpeg.decode(Jpeg.encodeFromCoefficients(32, 24,
      chroma420 = false, q8, q8, 0, coef))
    val rst = Jpeg.decode(Jpeg.encodeFromCoefficients(32, 24,
      chroma420 = false, q8, q8, 2, coef))
    assert(plain.rgb.toSeq == rst.rgb.toSeq)
  }

  test("MCU padding crops away: non-multiple-of-8 dimensions") {
    val bytes = Jpeg.encodeFromCoefficients(12, 20, chroma420 = true,
      q8, q8, 0, (comp, bx, by) => {
        val c = zeros
        c(0) = comp * 4 + bx + by
        c
      })
    val img = Jpeg.decode(bytes)
    assert(img.width == 12 && img.height == 20)
    assert(img.rgb.length == 12 * 20 * 3)
  }

  test("ImageIO agrees with our decoder on 4:4:4 within IDCT rounding") {
    val rnd = new scala.util.Random(42)
    val bytes = Jpeg.encodeFromCoefficients(24, 16, chroma420 = false,
      q8, q8, 0, (_, _, _) => {
        val c = zeros
        c(0) = rnd.nextInt(21) - 10
        // a few small ACs at random natural positions
        for (_ <- 0 until 4) c(1 + rnd.nextInt(63)) = rnd.nextInt(7) - 3
        c
      })
    val ours = Jpeg.decode(bytes)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO must parse our encoder's output")
    assert(ref.getWidth == 24 && ref.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 24) {
      val p = ref.getRGB(x, y)
      val (r, g, b) = ours.pixel(x, y)
      assert(math.abs(((p >> 16) & 0xFF) - r) <= 2 &&
        math.abs(((p >> 8) & 0xFF) - g) <= 2 &&
        math.abs((p & 0xFF) - b) <= 2,
        s"pixel ($x,$y): imageio ${(p >> 16) & 0xFF},${(p >> 8) & 0xFF},${p & 0xFF} vs ours $r,$g,$b")
    }
  }

  test("our decoder reads a foreign (ImageIO-encoded) grayscale JPEG") {
    val w = 40
    val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    // smooth non-wrapping ramp: a sharp wrap edge would compare their
    // integer IDCT against our exact-double IDCT at its worst case
    for (y <- 0 until h; x <- 0 until w) {
      val g = 40 + 3 * x + 2 * y
      src.getRaster.setSample(x, y, 0, g)
    }
    val baos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(src, "jpg", baos))
    val bytes = baos.toByteArray
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val want = ref.getRaster.getSample(x, y, 0)
      val (r, g, b) = ours.pixel(x, y)
      assert(r == g && g == b, "grayscale must replicate channels")
      assert(math.abs(want - r) <= 2, s"pixel ($x,$y): imageio $want vs ours $r")
    }
  }

  test("our decoder reads a foreign color 4:2:0 JPEG (constant chroma)") {
    // gray-in-RGB content keeps chroma constant, so their fancy chroma
    // interpolation and our box replication agree; what's exercised is
    // the foreign 3-component 4:2:0 MCU layout + their quant/DHT tables
    val w = 32
    val h = 16
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 60 + 3 * x + 4 * y
      src.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val baos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(src, "jpg", baos))
    val bytes = baos.toByteArray
    val ours = Jpeg.decode(bytes)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ours.width == w && ours.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = ref.getRGB(x, y)
      val (r, g, b) = ours.pixel(x, y)
      assert(math.abs(((p >> 16) & 0xFF) - r) <= 3 &&
        math.abs(((p >> 8) & 0xFF) - g) <= 3 &&
        math.abs((p & 0xFF) - b) <= 3,
        s"pixel ($x,$y): imageio ${(p >> 16) & 0xFF},${(p >> 8) & 0xFF},${p & 0xFF} vs ours $r,$g,$b")
    }
  }

  test("rejects unsupported SOFs, truncation, garbage, and stray markers") {
    val good = Jpeg.encodeFromCoefficients(16, 16, chroma420 = true,
      q8, q8, 0, (_, _, _) => zeros)
    intercept[IllegalArgumentException](
      Jpeg.decode("not a jpeg".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](Jpeg.decode(good.take(20)))
    intercept[IllegalArgumentException](Jpeg.decode(good.dropRight(6)))
    val idx = good.indices.dropRight(1).find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0).get
    // flip SOF0 to SOF9 (arithmetic) — must classify as unsupported
    val arith = good.clone(); arith(idx + 1) = 0xC9.toByte
    val e = intercept[IllegalArgumentException](Jpeg.decode(arith))
    assert(e.getMessage.contains("SOF"), e.getMessage)
    // flip SOF0 to SOF2: a baseline full scan (Ss=0..63) is NOT a legal
    // progressive scan — classified, not an index escape
    val prog = good.clone(); prog(idx + 1) = 0xC2.toByte
    val e2 = intercept[IllegalArgumentException](Jpeg.decode(prog))
    assert(e2.getMessage.contains("progressive"), e2.getMessage)
    // a stray RST marker outside the entropy stream
    val stray = good.take(2) ++ Array(0xFF.toByte, 0xD3.toByte) ++ good.drop(2)
    intercept[IllegalArgumentException](Jpeg.decode(stray))
  }

  test("progressive roundtrip: SOF2 scans reconstruct the exact baseline pixels") {
    // the same planted coefficient field encoded both ways must decode
    // byte-identical: successive approximation is lossless at Al=0
    for (chroma420 <- Seq(false, true); (w, h) <- Seq((16, 16), (28, 20))) {
      val coef = (comp: Int, bx: Int, by: Int) => {
        val c = zeros
        if (comp == 0) {
          c(0) = (3 * bx + 5 * by) % 41 - 20
          c(4) = (bx + 7 * by) % 21 - 10
          c(32) = (11 * bx + by) % 15 - 7
          c(36) = (bx + by) % 9 - 4
        } else c(0) = ((if (comp == 1) 3 else 7) * bx + 5 * by) % 31 - 15
        c
      }
      val base = Jpeg.decode(
        Jpeg.encodeFromCoefficients(w, h, chroma420, q8, q8, 0, coef))
      val prog = Jpeg.decode(
        Jpeg.encodeProgressiveFromCoefficients(w, h, chroma420, q8, q8, coef))
      assert(prog.width == base.width && prog.height == base.height)
      assert(java.util.Arrays.equals(prog.rgb, base.rgb),
        s"progressive decode must equal baseline (chroma420=$chroma420, ${w}x$h)")
    }
  }

  test("progressive: wide coefficients exercise ZRL and long EOB runs") {
    // sparse large-k coefficients force ZRLs inside refinement scans and
    // EOB runs spanning many blocks in the 6..63 band
    val coef = (comp: Int, bx: Int, by: Int) => {
      val c = zeros
      if (comp == 0) {
        c(0) = (bx + by) % 11 - 5
        if ((bx + by) % 3 == 0) c(36) = (bx % 7) - 3 // most blocks EOB early
        if ((bx * by) % 5 == 0) c(4) = 1 // newly-nonzero in refinement
      }
      c
    }
    val base = Jpeg.decode(
      Jpeg.encodeFromCoefficients(48, 48, chroma420 = false, q8, q8, 0, coef))
    val prog = Jpeg.decode(
      Jpeg.encodeProgressiveFromCoefficients(48, 48, chroma420 = false,
        q8, q8, coef))
    assert(java.util.Arrays.equals(prog.rgb, base.rgb))
  }

  test("our decoder reads a foreign PROGRESSIVE (ImageIO-encoded) JPEG") {
    val w = 40
    val h = 24
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // gray-in-RGB ramp: constant chroma sidesteps upsampling-filter
    // differences; the progressive scan script is libjpeg's real one
    for (y <- 0 until h; x <- 0 until w) {
      val g = 40 + 3 * x + 2 * y
      src.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val baos = new java.io.ByteArrayOutputStream
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
    ios.close(); writer.dispose()
    val bytes = baos.toByteArray
    // confirm the fixture really is progressive (SOF2 present)
    assert(bytes.indices.dropRight(1).exists(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
      "ImageIO progressive output must carry SOF2")
    val ours = Jpeg.decode(bytes)
    assert(ours.width == w && ours.height == h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val want = (ref.getRGB(x, y) >> 8) & 0xFF
      val (_, g, _) = ours.pixel(x, y)
      assert(math.abs(want - g) <= 2, s"pixel ($x,$y): imageio $want vs ours $g")
    }
  }

  test("corrupt segment lengths fail as classified errors, not escapes") {
    // every walker must bound its reads by the DECLARED segment end
    // (ADVICE r13): shrinking a length field must raise the package's
    // IllegalArgumentException, never ArrayIndexOutOfBounds or a silent
    // read into the next segment
    val good = Jpeg.encodeFromCoefficients(16, 16, chroma420 = true,
      q8, q8, 0, (_, _, _) => zeros)
    def markerAt(m: Int): Int = good.indices.dropRight(1).find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == m).get
    for (m <- Seq(0xDB, 0xC4, 0xC0, 0xDA)) {
      val idx = markerAt(m)
      val bad = good.clone()
      // truncate the declared length to cut the segment's payload short
      bad(idx + 2) = 0; bad(idx + 3) = 5
      val e = intercept[IllegalArgumentException](Jpeg.decode(bad))
      assert(e.getMessage != null, f"marker 0x$m%02X")
    }
  }

  test("byte stuffing roundtrips: a coefficient pattern forcing 0xFF bytes") {
    // many high-entropy blocks make 0xFF bytes near-certain in the stream;
    // correctness = decode still lands the closed-form values
    val bytes = Jpeg.encodeFromCoefficients(64, 64, chroma420 = false,
      q8, q8, 0, (comp, bx, by) => {
        val c = zeros
        if (comp == 0) {
          c(0) = ((bx * 7 + by * 3) % 31) - 15
          c(4) = ((bx + by) % 11) - 5
          c(32) = ((bx * 3 + by) % 11) - 5
        }
        c
      })
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0x00),
      "fixture must actually exercise byte stuffing")
    val img = Jpeg.decode(bytes)
    for (y <- 0 until 64; x <- 0 until 64) {
      val (bx, by) = (x / 8, y / 8)
      val sx = if (x % 8 % 4 == 0 || x % 8 % 4 == 3) 1 else -1
      val sy = if (y % 8 % 4 == 0 || y % 8 % 4 == 3) 1 else -1
      val want = 128 + (((bx * 7 + by * 3) % 31) - 15) +
        sx * (((bx + by) % 11) - 5) + sy * (((bx * 3 + by) % 11) - 5)
      assert(img.pixel(x, y) == ((want, want, want)), s"pixel ($x,$y)")
    }
  }

  private def plainJpeg(w: Int = 16, h: Int = 16): Array[Byte] =
    Jpeg.encodeFromCoefficients(w, h, chroma420 = false, q8, q8,
      restartInterval = 0, (_, _, _) => zeros)

  test("EXIF round-trips in both byte orders; no-EXIF and mismatch flags work") {
    for (le <- Seq(true, false)) {
      val bytes = Exif.spliceApp1(plainJpeg(),
        Exif.encodeApp1(le, orientation = 6, pixelX = 16L, pixelY = 16L))
      val info = Exif.parse(bytes)
      assert(info.hasExif && info.orientation == 6 &&
        info.exifWidth == 16L && info.exifHeight == 16L &&
        info.width == 16 && info.height == 16 && !info.dimsMismatch,
        s"le=$le: $info")
      // the APP1-bearing stream must still pixel-decode
      assert(Jpeg.decode(bytes).width == 16)
    }
    val bare = Exif.parse(plainJpeg())
    assert(!bare.hasExif && bare.orientation == 0 && !bare.dimsMismatch)
    val lying = Exif.parse(Exif.spliceApp1(plainJpeg(),
      Exif.encodeApp1(littleEndian = true, 1, pixelX = 640L, pixelY = 480L)))
    assert(lying.dimsMismatch && lying.exifWidth == 640L && lying.width == 16)
  }

  test("EXIF: a hand-assembled big-endian TIFF wire layout parses exactly " +
    "(ADVICE-r14 stance: pin the wire, not the encoder's own assumptions)") {
    // Exif\0\0 + MM TIFF: IFD0 {Orientation=8 SHORT, ExifIFD->0x26},
    // ExifIFD {PixelX=300 SHORT (allowed type), PixelY=200 LONG}
    val tiff = Array[Int](
      'E', 'x', 'i', 'f', 0, 0,
      'M', 'M', 0, 42, 0, 0, 0, 8, // header, IFD0 at 8
      0, 2, // IFD0: 2 entries
      0x01, 0x12, 0, 3, 0, 0, 0, 1, 0, 8, 0, 0, // Orientation SHORT 8
      0x87, 0x69, 0, 4, 0, 0, 0, 1, 0, 0, 0, 0x26, // ExifIFD at 0x26=38
      0, 0, 0, 0, // no IFD1
      0, 2, // ExifIFD: 2 entries
      0xA0, 0x02, 0, 3, 0, 0, 0, 1, 0x01, 0x2C, 0, 0, // PixelX SHORT 300
      0xA0, 0x03, 0, 4, 0, 0, 0, 1, 0, 0, 0, 0xC8, // PixelY LONG 200
      0, 0, 0, 0).map(_.toByte)
    val info = Exif.parse(Exif.spliceApp1(plainJpeg(), tiff.drop(0)))
    assert(info.hasExif && info.orientation == 8 &&
      info.exifWidth == 300L && info.exifHeight == 200L, s"$info")
    assert(info.dimsMismatch)
  }

  test("EXIF: T.81 fill bytes before markers parse identically (ADVICE r15)") {
    val clean = Exif.spliceApp1(plainJpeg(),
      Exif.encodeApp1(littleEndian = true, orientation = 5, 16L, 16L))
    // one fill byte after SOI, two more before the next marker down-stream
    val filled = (clean.take(2) :+ 0xFF.toByte) ++ clean.drop(2)
    assert(Exif.parse(filled) == Exif.parse(clean),
      "a legal fill byte must not change the parse")
    val doubleFilled = (clean.take(2) ++ Array(0xFF.toByte, 0xFF.toByte)) ++
      clean.drop(2)
    assert(Exif.parse(doubleFilled) == Exif.parse(clean))
  }

  test("EXIF interop: ImageIO decodes our APP1-bearing JPEG; malformed TIFF rejects") {
    val bytes = Exif.spliceApp1(plainJpeg(24, 16),
      Exif.encodeApp1(littleEndian = false, 3, 24L, 16L))
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == 24 && ref.getHeight == 16,
      "a foreign decoder must tolerate the spliced APP1")
    // truncated TIFF body inside APP1 must reject loudly, not mis-read
    val app1 = Exif.encodeApp1(littleEndian = true, 1, 24L, 16L)
    intercept[IllegalArgumentException] {
      Exif.parse(Exif.spliceApp1(plainJpeg(24, 16), app1.take(20)))
    }
    intercept[IllegalArgumentException](Exif.parse(Array[Byte](1, 2, 3)))
  }
}

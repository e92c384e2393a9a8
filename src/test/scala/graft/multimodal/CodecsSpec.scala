package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real byte-format codecs: exact roundtrips (including row padding
  * and bottom-up storage), top-down BMPs, RIFF chunk walking past
  * extension chunks, and loud rejection of malformed/unsupported input.
  */
class CodecsSpec extends AnyFunSuite {

  test("BMP roundtrip is pixel-exact incl. padded odd widths") {
    // width 3 -> 9 data bytes padded to a 12-byte stride
    val px = (x: Int, y: Int) => (x * 50 + y, 255 - x * 10, (x + y * 3) % 256)
    val bytes = Codecs.Bmp.encode(3, 2, px)
    assert(bytes.length == Codecs.Bmp.encodedLength(3, 2))
    assert(bytes.length == 54 + 12 * 2)
    val img = Codecs.Bmp.decode(bytes)
    assert(img.width == 3 && img.height == 2)
    for (x <- 0 until 3; y <- 0 until 2)
      assert(img.pixel(x, y) == px(x, y), s"pixel ($x,$y)")
  }

  test("top-down BMP (negative height) normalizes to the same pixels") {
    val px = (x: Int, y: Int) => (10 * x, 20 * y, x + y)
    val up = Codecs.Bmp.encode(4, 3, px)
    // flip to top-down: negate height, reverse row order in place
    val down = up.clone()
    down(22) = (-3 & 0xFF).toByte; down(23) = 0xFF.toByte
    down(24) = 0xFF.toByte; down(25) = 0xFF.toByte
    val stride = Codecs.Bmp.rowStride(4)
    for (r <- 0 until 3)
      System.arraycopy(up, 54 + (2 - r) * stride, down, 54 + r * stride, stride)
    assert(Codecs.Bmp.decode(down).rgb.toSeq == Codecs.Bmp.decode(up).rgb.toSeq)
  }

  test("BMP rejects bad magic, bit depth, compression, truncation") {
    val good = Codecs.Bmp.encode(2, 2, (_, _) => (1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Codecs.Bmp.decode(badMagic))
    val bad8bit = good.clone(); bad8bit(28) = 8
    intercept[IllegalArgumentException](Codecs.Bmp.decode(bad8bit))
    val rle = good.clone(); rle(30) = 1
    intercept[IllegalArgumentException](Codecs.Bmp.decode(rle))
    intercept[IllegalArgumentException](Codecs.Bmp.decode(good.take(40)))
    intercept[IllegalArgumentException](Codecs.Bmp.decode(good.take(60)))
  }

  test("WAV roundtrip is sample-exact, mono and stereo") {
    for (ch <- 1 to 2) {
      val samples = Array.tabulate(30 * ch)(i => ((i * 997) % 65536 - 32768).toShort)
      val bytes = Codecs.Wav.encode(44100, ch, samples)
      assert(bytes.length == Codecs.Wav.encodedLength(30, ch))
      val audio = Codecs.Wav.decode(bytes)
      assert(audio.sampleRate == 44100 && audio.channels == ch)
      assert(audio.frames == 30)
      assert(audio.samples.toSeq == samples.toSeq)
    }
  }

  test("WAV 8-bit PCM widens exactly onto the 16-bit lattice") {
    // odd sample count exercises the RIFF word-alignment pad byte
    val samples = Array(0, 1, 127, 128, 129, 255, 64)
    val bytes = Codecs.Wav.encode8(8000, 1, samples)
    assert(bytes.length == 44 + 7 + 1, "odd data length pads to word align")
    val audio = Codecs.Wav.decode(bytes)
    assert(audio.sampleRate == 8000 && audio.channels == 1 && audio.frames == 7)
    assert(audio.samples.toSeq == samples.map(v => ((v - 128) * 256).toShort).toSeq)
    assert(audio.samples(0) == -32768 && audio.samples(3) == 0 &&
      audio.samples(5) == 32512)
    intercept[IllegalArgumentException](Codecs.Wav.encode8(8000, 1, Array(256)))
  }

  test("G.711 µ-law expansion matches the ITU landmark values") {
    // the classic table anchors: 0xFF -> 0, 0x7F -> -? (sign bit clear ->
    // negative in µ-law), 0x00 -> the most negative code
    assert(Codecs.Wav.mulawExpand(0xFF.toByte) == 0)
    assert(Codecs.Wav.mulawExpand(0x7F.toByte) == 0)
    assert(Codecs.Wav.mulawExpand(0x80.toByte) == 32124)
    assert(Codecs.Wav.mulawExpand(0x00.toByte) == -32124)
    // monotone within the negative half: greater code -> smaller magnitude
    assert(Codecs.Wav.mulawExpand(0x01.toByte) > Codecs.Wav.mulawExpand(0x00.toByte))
    val codes = Array.tabulate(16)(i => (i * 17).toByte)
    val audio = Codecs.Wav.decode(Codecs.Wav.encodeG711(8000, 2, mulaw = true, codes))
    assert(audio.sampleRate == 8000 && audio.channels == 2 && audio.frames == 8)
    assert(audio.samples.toSeq == codes.map(Codecs.Wav.mulawExpand).toSeq)
  }

  test("G.711 A-law expansion: XOR 0x55, inverted sign, segment shifts") {
    // landmark values from the G.711 tables: 0xD5 -> +8, 0x55 -> -8,
    // 0xAA (xor 0x55 = 0xFF) -> +32256, 0x2A -> -32256
    assert(Codecs.Wav.alawExpand(0xD5.toByte) == 8)
    assert(Codecs.Wav.alawExpand(0x55.toByte) == -8)
    assert(Codecs.Wav.alawExpand(0xAA.toByte) == 32256)
    assert(Codecs.Wav.alawExpand(0x2A.toByte) == -32256)
    // odd code count exercises the word-alignment pad
    val codes = Array.tabulate(7)(i => (i * 37 + 3).toByte)
    val bytes = Codecs.Wav.encodeG711(16000, 1, mulaw = false, codes)
    assert(bytes.length == 44 + 7 + 1, "odd data length pads to word align")
    val audio = Codecs.Wav.decode(bytes)
    assert(audio.sampleRate == 16000 && audio.channels == 1 && audio.frames == 7)
    assert(audio.samples.toSeq == codes.map(Codecs.Wav.alawExpand).toSeq)
    // G.711 with a 16-bit depth field is malformed
    val bad = bytes.clone(); bad(34) = 16
    intercept[IllegalArgumentException](Codecs.Wav.decode(bad))
  }

  test("WAV chunk walk skips extension chunks between fmt and data") {
    val samples = Array.tabulate(8)(i => (i * 100).toShort)
    val canonical = Codecs.Wav.encode(8000, 1, samples)
    // splice a 6-byte 'fact' chunk (odd-ish content, word-aligned) between
    // fmt (ends at 36) and data
    val fact = Array[Byte]('f', 'a', 'c', 't', 6, 0, 0, 0, 1, 2, 3, 4, 5, 6)
    val spliced = canonical.take(36) ++ fact ++ canonical.drop(36)
    // fix the RIFF size field
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xFF).toByte
    spliced(5) = ((riffLen >> 8) & 0xFF).toByte
    spliced(6) = ((riffLen >> 16) & 0xFF).toByte
    spliced(7) = ((riffLen >> 24) & 0xFF).toByte
    val audio = Codecs.Wav.decode(spliced)
    assert(audio.samples.toSeq == samples.toSeq)
  }

  test("interlaced GIF decodes index-identical to the sequential encoding") {
    // heights straddling the pass starts (1..10) exercise empty passes
    for (h <- Seq(1, 2, 3, 5, 8, 10)) {
      val w = 7
      val frames = Seq.tabulate(2)(f =>
        Array.tabulate(w * h)(i => ((i * 11 + f * 29) % 256).toByte))
      val seqBytes = Codecs.Gif.encode(w, h, Codecs.Gif.grayPalette, frames)
      val intBytes = Codecs.Gif.encode(w, h, Codecs.Gif.grayPalette, frames,
        interlaced = true)
      val a = Codecs.Gif.decode(seqBytes)
      val b = Codecs.Gif.decode(intBytes)
      (a.frames, b.frames).zipped.foreach { (x, y) =>
        assert(x.toSeq == y.toSeq, s"interlace mismatch at h=$h")
      }
    }
  }

  test("a foreign decoder (ImageIO) reads our interlaced GIF pixel-exactly " +
    "(ADVICE r14: pins the on-wire pass order, not round-trip self-consistency)") {
    // encode and decode share interlaceRows, so a wrong pass schedule
    // would survive every round-trip gate — only a decoder that did NOT
    // read our schedule can pin the wire layout. Odd dimensions exercise
    // all four passes; a distinct index per pixel makes any row
    // misplacement a hard mismatch.
    val (w, h) = (13, 11)
    val frame = Array.tabulate(w * h)(i => i.toByte) // 143 < 256: all distinct
    val bytes = Codecs.Gif.encode(w, h, Codecs.Gif.grayPalette, Seq(frame),
      interlaced = true)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == w && ref.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val want = frame(y * w + x) & 0xFF // grayPalette: r = g = b = index
      val got = ref.getRGB(x, y)
      assert(((got >> 16) & 0xFF, (got >> 8) & 0xFF, got & 0xFF) ==
        ((want, want, want)), s"ImageIO disagrees at ($x,$y)")
    }
  }

  test("palette PNG decodes through PLTE; missing PLTE rejected") {
    val pal = new Array[Byte](768)
    (0 until 256).foreach { i =>
      pal(3 * i) = (255 - i).toByte; pal(3 * i + 1) = i.toByte
      pal(3 * i + 2) = ((i * 2) % 256).toByte
    }
    val idx = (x: Int, y: Int) => (x * 31 + y * 17) % 256
    val bytes = Codecs.Png.encodePalette(9, 7, pal, idx)
    val img = Codecs.Png.decode(bytes)
    assert(img.width == 9 && img.height == 7)
    for (x <- 0 until 9; y <- 0 until 7) {
      val i = idx(x, y)
      assert(img.pixel(x, y) == ((255 - i, i, (i * 2) % 256)), s"pixel $x,$y")
    }
    // ImageIO cross-check: a foreign decoder reads the same pixels
    val jimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (x <- 0 until 9; y <- 0 until 7) {
      val rgb = jimg.getRGB(x, y)
      assert(((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) ==
        img.pixel(x, y), s"ImageIO disagrees at $x,$y")
    }
  }

  test("float32 WAV converts round(v*32767), clamps, and skips the fact chunk") {
    val samples = Array(0f, 0.5f, -0.5f, 1f, -1f, 2f, -2f,
      16000f / 32768f, -16000f / 32768f)
    // channels=3 divides 9
    val bytes = Codecs.Wav.encodeFloat(48000, 3, samples)
    val audio = Codecs.Wav.decode(bytes)
    assert(audio.sampleRate == 48000 && audio.channels == 3 && audio.frames == 3)
    // Math.round is half-toward-+inf: -16383.5 -> -16383; and the dyadic
    // k/32768 lands back on exactly k (16000 - 0.488 rounds up to 16000)
    assert(audio.samples.toSeq == Seq[Short](0, 16384, -16383, 32767, -32767,
      32767, -32768, 16000, -16000))
    // 16-bit depth under fmt 3 is malformed
    val bad = bytes.clone(); bad(34) = 16
    intercept[IllegalArgumentException](Codecs.Wav.decode(bad))
  }

  test("AVI roundtrip preserves frame payloads, order, and metadata") {
    // odd-length frames exercise the movi word-alignment pad
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7),
      Array.tabulate(33)(i => (i * 7).toByte))
    val bytes = Codecs.Avi.encode(320, 240, 33333, frames)
    val video = Codecs.Avi.decode(bytes)
    assert(video.width == 320 && video.height == 240 &&
      video.usPerFrame == 33333)
    assert(video.frames.length == 3)
    video.frames.zip(frames).foreach { case (got, want) =>
      assert(got.toSeq == want.toSeq)
    }
  }

  test("AVI rejects bad magic, non-MJPG codecs, frame-count mismatch") {
    val good = Codecs.Avi.encode(16, 16, 40000, Seq(Array[Byte](9, 9)))
    val badMagic = good.clone(); badMagic(9) = 'X'
    intercept[IllegalArgumentException](Codecs.Avi.decode(badMagic))
    // swap the strh fccHandler 'MJPG' -> 'XVID'
    val xvid = good.clone()
    val h = new String(xvid, "ISO-8859-1").indexOf("vids")
    assert(h > 0, "strh fccType not found")
    xvid(h + 4) = 'X'; xvid(h + 5) = 'V'; xvid(h + 6) = 'I'; xvid(h + 7) = 'D'
    intercept[IllegalArgumentException](Codecs.Avi.decode(xvid))
    intercept[IllegalArgumentException](Codecs.Avi.decode(good.take(40)))
    // declare 2 frames in avih while movi carries 1
    val mismatch = good.clone()
    val avih = new String(mismatch, "ISO-8859-1").indexOf("avih")
    mismatch(avih + 24) = 2
    intercept[IllegalArgumentException](Codecs.Avi.decode(mismatch))
  }

  test("WAV rejects bad magic, non-PCM, wrong depth, truncation") {
    val good = Codecs.Wav.encode(8000, 1, Array.tabulate(4)(_.toShort))
    val badMagic = good.clone(); badMagic(9) = 'X'
    intercept[IllegalArgumentException](Codecs.Wav.decode(badMagic))
    val float = good.clone(); float(20) = 3 // IEEE float format
    intercept[IllegalArgumentException](Codecs.Wav.decode(float))
    val depth24 = good.clone(); depth24(34) = 24 // 8/16 supported, 24 not
    intercept[IllegalArgumentException](Codecs.Wav.decode(depth24))
    intercept[IllegalArgumentException](Codecs.Wav.decode(good.take(30)))
    intercept[IllegalArgumentException](Codecs.Wav.decode(good.take(46)))
  }

  test("PNG roundtrip is pixel-exact through all five scanline filters") {
    // height 7 ≥ 5 → the encoder's y % 5 cycle uses None/Sub/Up/Average/
    // Paeth at least once; any wrong reconstruction corrupts pixels
    val px = (x: Int, y: Int) => ((x * 37 + y * 91) % 256,
      (255 - x * 13 + y * 7) % 256, (x * x + y * 3) % 256)
    val bytes = Codecs.Png.encode(5, 7, px)
    // signature + IHDR chunk present
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N')
    val img = Codecs.Png.decode(bytes)
    assert(img.width == 5 && img.height == 7)
    for (x <- 0 until 5; y <- 0 until 7)
      assert(img.pixel(x, y) == px(x, y), s"pixel ($x,$y)")
  }

  test("Adam7 PNG decodes pixel-identical to the sequential encoding") {
    val px = (x: Int, y: Int) => ((x * 37 + y * 91) % 256,
      (255 - x * 13 + y * 7) % 256, (x * x + y * 3) % 256)
    // sizes straddling the 8x8 pass grid: tiny (several passes empty),
    // non-multiples, and > one macro-tile
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 7), (8, 8), (13, 11), (20, 17))) {
      val seqImg = Codecs.Png.decode(Codecs.Png.encode(w, h, px))
      val adam = Codecs.Png.decode(Codecs.Png.encodeAdam7(w, h, px))
      assert(adam.width == w && adam.height == h)
      assert(java.util.Arrays.equals(adam.rgb, seqImg.rgb), s"${w}x$h")
    }
  }

  test("a foreign decoder (ImageIO) reads our Adam7 PNG pixel-exactly") {
    // PNG is lossless, so interop here is EXACT — a wrong pass geometry
    // or per-pass filter reset shows up as hard pixel mismatches
    val px = (x: Int, y: Int) =>
      ((x * 7 + y * 13) % 256, (x * 5 + y * 11) % 256, (x * 3 + y * 17) % 256)
    val bytes = Codecs.Png.encodeAdam7(19, 13, px)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth == 19 && ref.getHeight == 13)
    for (y <- 0 until 13; x <- 0 until 19) {
      val p = ref.getRGB(x, y)
      val want = px(x, y)
      assert(((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) == want,
        s"pixel ($x,$y)")
    }
  }

  test("PNG rejects bad signature, CRC corruption, unsupported shape, truncation") {
    val good = Codecs.Png.encode(4, 4, (x, y) => (x, y, x + y))
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](Codecs.Png.decode(badSig))
    // flip one IDAT payload byte → CRC must catch it
    val badCrc = good.clone(); badCrc(8 + 25 + 8 + 3) = (badCrc(8 + 25 + 8 + 3) ^ 0x7F).toByte
    intercept[IllegalArgumentException](Codecs.Png.decode(badCrc))
    // color type 6 (RGBA) unsupported — re-CRC the IHDR so the type check
    // is what trips, not the CRC
    val rgba = good.clone(); rgba(8 + 8 + 9) = 6
    val crc = new java.util.zip.CRC32
    crc.update(rgba, 8 + 4, 4 + 13)
    val cv = crc.getValue.toInt
    rgba(8 + 8 + 13) = ((cv >>> 24) & 0xFF).toByte
    rgba(8 + 8 + 14) = ((cv >>> 16) & 0xFF).toByte
    rgba(8 + 8 + 15) = ((cv >>> 8) & 0xFF).toByte
    rgba(8 + 8 + 16) = (cv & 0xFF).toByte
    intercept[IllegalArgumentException](Codecs.Png.decode(rgba))
    intercept[IllegalArgumentException](Codecs.Png.decode(good.take(30)))
    intercept[IllegalArgumentException](Codecs.Png.decode(good.dropRight(12)))
  }

  test("gzip multi-member stream inflates to the concatenated payload") {
    val a = "first member — ünïcode".getBytes("UTF-8")
    val b = "second".getBytes("UTF-8")
    val c = new Array[Byte](100000) // compressible bulk
    java.util.Arrays.fill(c, 'z'.toByte)
    val stream = Codecs.Gzip.gzip(a) ++ Codecs.Gzip.gzip(b) ++ Codecs.Gzip.gzip(c)
    assert(Codecs.Gzip.gunzipAll(stream).toSeq == (a ++ b ++ c).toSeq)
    // loud rejection of garbage
    intercept[Exception](Codecs.Gzip.gunzipAll("not gzip".getBytes("UTF-8")))
  }

  test("GIF-LZW roundtrip on data long enough to force code-width growth") {
    // > 1<<11 distinct transitions: width walks 9 -> 12 and the 4096
    // clear-reset path fires; pseudo-random but deterministic
    val data = Array.tabulate(60000)(i => ((i * 2654435761L >> 7) & 0xFF).toByte)
    val z = Codecs.Gif.lzwEncode(data)
    assert(z.length < data.length, "real LZW should compress this stream")
    assert(Codecs.Gif.lzwDecode(z, data.length).toSeq == data.toSeq)
    // degenerate all-same stream (maximal dictionary chains, KwKwK case)
    val flat = Array.fill(5000)(42.toByte)
    assert(Codecs.Gif.lzwDecode(Codecs.Gif.lzwEncode(flat), 5000).toSeq
      == flat.toSeq)
  }

  test("GIF roundtrip is index-exact across frames, palette mapped") {
    val pal = new Array[Byte](768)
    for (i <- 0 until 256) {
      pal(3 * i) = i.toByte; pal(3 * i + 1) = (255 - i).toByte
      pal(3 * i + 2) = ((i * 3) % 256).toByte
    }
    val frames = Seq.tabulate(3)(f =>
      Array.tabulate(5 * 4)(i => ((i * 11 + f * 29) % 256).toByte))
    val bytes = Codecs.Gif.encode(5, 4, pal, frames)
    assert(bytes.startsWith("GIF89a".getBytes("US-ASCII").toSeq))
    val anim = Codecs.Gif.decode(bytes)
    assert(anim.width == 5 && anim.height == 4 && anim.frames.length == 3)
    for (f <- 0 until 3)
      assert(anim.frames(f).toSeq == frames(f).toSeq, s"frame $f indices")
    // palette mapping: pixel (0,0) of frame 1 has index 29
    assert(anim.frame(1).pixel(0, 0) == ((29, 255 - 29, 87)))
  }

  test("GIF rejects bad signature, local tables, truncation") {
    val good = Codecs.Gif.encode(4, 4, Codecs.Gif.grayPalette,
      Seq(Array.tabulate(16)(_.toByte)))
    val badSig = good.clone(); badSig(0) = 'X'
    intercept[IllegalArgumentException](Codecs.Gif.decode(badSig))
    // image descriptor packed byte sits after 13 + 768 header+palette,
    // GCE (8 bytes), then 0x2C + 8 → offset of packed byte:
    val idOff = 13 + 768 + 8
    assert((good(idOff) & 0xFF) == 0x2C, "fixture layout")
    // the interlace flag is ACCEPTED since round 14 — flipping it on a
    // sequential stream just scrambles rows, it must not throw
    val interlaced = good.clone(); interlaced(idOff + 9) = 0x40.toByte
    assert(Codecs.Gif.decode(interlaced).frames.head.toSet ==
      Codecs.Gif.decode(good).frames.head.toSet, "same indices, reordered")
    val localTable = good.clone(); localTable(idOff + 9) = 0x80.toByte
    intercept[IllegalArgumentException](Codecs.Gif.decode(localTable))
    intercept[IllegalArgumentException](Codecs.Gif.decode(good.take(100)))
    intercept[IllegalArgumentException](Codecs.Gif.decode(good.dropRight(1)))
    // cuts INSIDE the extension and image-descriptor walks must classify
    // (IllegalArgumentException), not escape as ArrayIndexOutOfBounds
    val extOff = 13 + 768 // the GCE 0x21 label
    assert((good(extOff) & 0xFF) == 0x21, "fixture layout")
    for (cut <- Seq(extOff + 1, extOff + 2, extOff + 3, idOff + 5, idOff + 11,
        idOff + 12))
      intercept[IllegalArgumentException](Codecs.Gif.decode(good.take(cut)))
  }

  test("PNG preset-dictionary zlib stream is rejected, not spun on") {
    // an FDICT stream makes Inflater return 0 with needsDictionary=true
    // while needsInput stays false — the decode loop must fail loudly
    val good = Codecs.Png.encode(4, 4, (x, y) => (x, y, x + y))
    val deflater = new java.util.zip.Deflater
    deflater.setDictionary("warmup".getBytes("US-ASCII"))
    deflater.setInput(new Array[Byte](4 * (1 + 12))); deflater.finish()
    val buf = new Array[Byte](1024)
    val n = deflater.deflate(buf)
    deflater.end()
    val idat = java.util.Arrays.copyOf(buf, n)
    // rebuild: signature + original IHDR chunk + dict IDAT + IEND
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      out(0) = ((data.length >>> 24) & 0xFF).toByte
      out(1) = ((data.length >>> 16) & 0xFF).toByte
      out(2) = ((data.length >>> 8) & 0xFF).toByte
      out(3) = (data.length & 0xFF).toByte
      tpe.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32
      crc.update(out, 4, 4 + data.length)
      val cv = crc.getValue.toInt
      out(8 + data.length) = ((cv >>> 24) & 0xFF).toByte
      out(9 + data.length) = ((cv >>> 16) & 0xFF).toByte
      out(10 + data.length) = ((cv >>> 8) & 0xFF).toByte
      out(11 + data.length) = (cv & 0xFF).toByte
      out
    }
    val bytes = good.take(8 + 25) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
    intercept[IllegalArgumentException](Codecs.Png.decode(bytes))
  }

  test("real-codec feature extractors produce sane bucketed descriptors") {
    // an all-white image has mean intensity 1.0 in every bucket
    val white = MediaRecord(1L, "image/bmp",
      Codecs.Bmp.encode(8, 8, (_, _) => (255, 255, 255)))
    val f = Multimodal.decodeBmpFeatures(white, 4)
    assert(f.features.length == 4 && f.features.forall(v => math.abs(v - 1.0f) < 1e-6))
    // a constant-amplitude square wave has RMS |a|/32768 in every bucket
    val tone = MediaRecord(2L, "audio/wav",
      Codecs.Wav.encode(8000, 1, Array.fill(64)(16384.toShort)))
    val g = Multimodal.decodeWavFeatures(tone, 4)
    assert(g.features.length == 4 && g.features.forall(v => math.abs(v - 0.5f) < 1e-6))
  }
}

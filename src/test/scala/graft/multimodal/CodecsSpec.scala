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

  test("WAV rejects bad magic, non-PCM, wrong depth, truncation") {
    val good = Codecs.Wav.encode(8000, 1, Array.tabulate(4)(_.toShort))
    val badMagic = good.clone(); badMagic(9) = 'X'
    intercept[IllegalArgumentException](Codecs.Wav.decode(badMagic))
    val float = good.clone(); float(20) = 3 // IEEE float format
    intercept[IllegalArgumentException](Codecs.Wav.decode(float))
    val depth8 = good.clone(); depth8(34) = 8
    intercept[IllegalArgumentException](Codecs.Wav.decode(depth8))
    intercept[IllegalArgumentException](Codecs.Wav.decode(good.take(30)))
    intercept[IllegalArgumentException](Codecs.Wav.decode(good.take(46)))
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

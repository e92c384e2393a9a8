package graft.multimodal

import graft.SparkSpec

/** Multimodal plumbing: metadata pass, stub decoder shape and determinism,
  * partition behavior of the extraction boundary.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRecord(1L, "image/png", Array[Byte](0, 127, -1)),  // -1 = 0xFF
    MediaRecord(2L, "audio/wav", Array[Byte](10, 20)),
    MediaRecord(3L, "application/octet-stream", Array.empty[Byte])
  ).toDS()

  test("describe: byte length and digest without decoding") {
    val out = Multimodal.describe(media.toDF())
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(out(1L)._1 == 3 && out(2L)._1 == 2 && out(3L)._1 == 0)
    // sha256 of empty input is the well-known constant
    assert(out(3L)._2 ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("decodeStub: fixed dim, byte-profile values, empty-content safety") {
    val f = Multimodal.decodeStub(MediaRecord(1L, "image/png",
      Array[Byte](0, 127, -1)), dim = 5)
    assert(f.features.length == 5)
    // profile wraps over bytes: [0, 127, 255, 0, 127] / 255
    assert(f.features(0) == 0.0f)
    assert(f.features(1) == 127 / 255.0f)
    assert(f.features(2) == 1.0f)
    assert(f.features(3) == 0.0f)
    assert(f.n_bytes == 3)
    val empty = Multimodal.decodeStub(MediaRecord(3L, "x", Array.empty), dim = 4)
    assert(empty.features.toSeq == Seq(0.0f, 0.0f, 0.0f, 0.0f))
  }

  test("extractFeatures preserves partitioning and row count (mapInPandas shape)") {
    val ds = media.repartition(2)
    val out = Multimodal.extractFeatures(ds, dim = 8)
    assert(out.rdd.getNumPartitions == 2)
    assert(out.count() == 3L)
    assert(out.collect().forall(_.features.length == 8))
  }

  test("resizeStub decimates to the target size, passes small payloads through") {
    val big = MediaRecord(1L, "image/png", Array.tabulate(100)(_.toByte))
    val resized = Multimodal.resizeStub(big, targetBytes = 10)
    assert(resized.content.length == 10)
    assert(resized.content(0) == 0.toByte && resized.content(9) == 90.toByte)
    val small = MediaRecord(2L, "image/png", Array[Byte](1, 2))
    assert(Multimodal.resizeStub(small, 10).content.toSeq == Seq[Byte](1, 2))
  }

  test("sampleFrames fans out every Nth fixed-size frame executor-side") {
    val vid = Seq(MediaRecord(7L, "video/fake", Array.tabulate(10)(_.toByte))).toDS()
    val frames = Multimodal.sampleFrames(vid, frameBytes = 2, everyNth = 2)
      .collect().sortBy(_.media_id)
    // 5 frames of 2 bytes, keep frames 0, 2, 4
    assert(frames.length == 3)
    assert(frames.map(_.media_id).toSeq == Seq(700000L, 700002L, 700004L))
    assert(frames(1).content.toSeq == Seq[Byte](4, 5))
  }

  test("extraction is deterministic (safe to recompute on task retry)") {
    val a = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(media, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(a == b)
  }

  test("boxResize: exact k×k integer means, hand-computed") {
    // 4×2 image, k=2 → 2×1 output; block means floor-divide
    val img = Codecs.Image(4, 2, Array[Byte](
      10, 0, 0, 20, 0, 0, 100, 0, 0, (200 & 0xFF).toByte, 0, 0, // row 0
      30, 1, 0, 41, 1, 0, 50, 1, 0, 60, 1, 0)) // row 1
    val out = Multimodal.boxResize(img, 2)
    assert(out.width == 2 && out.height == 1)
    assert(out.pixel(0, 0) == (((10 + 20 + 30 + 41) / 4, 0, 0))) // floor(101/4)=25
    assert(out.pixel(1, 0) == (((100 + 200 + 50 + 60) / 4, 0, 0)))
    assert(out.pixel(0, 0)._2 == (0 + 0 + 1 + 1) / 4) // green floors to 0
    // k=1 is the identity
    assert(Multimodal.boxResize(img, 1).rgb.toSeq == img.rgb.toSeq)
    // non-divisible dimensions reject loudly
    intercept[IllegalArgumentException](Multimodal.boxResize(img, 3))
  }

  test("PNG → boxResize → stats chain is integer-exact end to end") {
    val px = (x: Int, y: Int) => ((x * 16) % 256, (y * 32) % 256, (x + y) % 256)
    val media = Seq(MediaRecord(1L, "image/png", Codecs.Png.encode(4, 4, px))).toDS()
    val r = Multimodal.resizePngStats(media, k = 2).head()
    assert(r.getAs[Long]("out_width") == 2L && r.getAs[Long]("out_height") == 2L)
    // red blocks: (0+16+0+16)/4=8, (32+48+32+48)/4=40 → per column, rows same
    assert(r.getAs[Long]("sum_r") == (8L + 40L) * 2)
    val full = Multimodal.pngStats(media).head()
    assert(full.getAs[Long]("width") == 4L && full.getAs[Long]("n_pixels") == 16L)
    assert(full.getAs[Long]("sum_r") == (0 + 16 + 32 + 48) * 4L)
  }

  test("phash chain on REAL resized pixels: identical payloads pair at 0") {
    def png(id: Long, seed: Long) = MediaRecord(id, "image/png",
      Codecs.Png.encode(16, 16, (x, y) => (
        ((x * 7 + y * 13 + seed * 31) % 256).toInt,
        ((x * 5 + y * 11 + seed * 17) % 256).toInt,
        ((x * 3 + y * 17 + seed * 7) % 256).toInt)))
    val media = (Seq.tabulate(20)(i => png(i.toLong, i.toLong)) ++
      Seq.tabulate(5)(i => png(i + 1000L, i.toLong))).toDS()
    val feats = Multimodal.extractFeaturesPngResized(media, k = 2, dim = 64).toDF()
    val pairs = Multimodal.phashNearDuplicates(feats, maxDist = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted twin must pair with its original at hamming 0
    for (i <- 0 until 5) assert(pairs.contains((i.toLong, i + 1000L)), s"twin $i")
  }

  test("augmentations: hand-checked flip, clockwise rotate90, center crop") {
    // 2x1: [A B] — flip swaps; CW rotate stacks A over B in a 1x2 frame
    val ab = Codecs.Image(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    assert(Multimodal.flipH(ab).rgb.toSeq == Seq[Byte](4, 5, 6, 1, 2, 3))
    val rot = Multimodal.rotate90(ab)
    assert(rot.width == 1 && rot.height == 2)
    assert(rot.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6),
      "clockwise: the left pixel of a horizontal pair ends on top")
    // 3x3 center crop to 1x1 keeps exactly the middle pixel
    val nine = Codecs.Image(3, 3, Array.tabulate[Byte](27)(i => i.toByte))
    val mid = Multimodal.cropCenter(nine, 1, 1)
    assert(mid.pixel(0, 0) == nine.pixel(1, 1))
    // double flip and 4x rotate are identity
    assert(Multimodal.flipH(Multimodal.flipH(nine)).rgb.toSeq == nine.rgb.toSeq)
    val r4 = (1 to 4).foldLeft(nine)((i, _) => Multimodal.rotate90(i))
    assert(r4.rgb.toSeq == nine.rgb.toSeq)
    intercept[IllegalArgumentException](Multimodal.cropCenter(nine, 4, 1))
  }

  test("exifRotate: all eight orientations place every pixel exactly; " +
    "inverses compose to identity") {
    // 2x1 [A B]: each orientation has a hand-checkable layout
    val ab = Codecs.Image(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    def px(img: Codecs.Image): Seq[Seq[Byte]] =
      img.rgb.toSeq.grouped(3).toSeq
    val (a, b) = (Seq[Byte](1, 2, 3), Seq[Byte](4, 5, 6))
    assert(px(Multimodal.exifRotate(ab, 1)) == Seq(a, b))
    assert(px(Multimodal.exifRotate(ab, 2)) == Seq(b, a), "mirror-H")
    assert(px(Multimodal.exifRotate(ab, 3)) == Seq(b, a), "rot180 of a row")
    assert(px(Multimodal.exifRotate(ab, 4)) == Seq(a, b), "mirror-V of a row")
    for (o <- 5 to 8) {
      val r = Multimodal.exifRotate(ab, o)
      assert(r.width == 1 && r.height == 2, s"o=$o must swap dims")
    }
    assert(px(Multimodal.exifRotate(ab, 5)) == Seq(a, b), "transpose")
    assert(px(Multimodal.exifRotate(ab, 6)) == Seq(a, b), "rot90 CW: left on top")
    assert(px(Multimodal.exifRotate(ab, 7)) == Seq(b, a), "transverse")
    assert(px(Multimodal.exifRotate(ab, 8)) == Seq(b, a), "rot270 CW: right on top")
    // orientation 6 agrees with the existing rotate90; 3 with double flip
    val nine = Codecs.Image(3, 2, Array.tabulate[Byte](18)(i => i.toByte))
    assert(Multimodal.exifRotate(nine, 6).rgb.toSeq ==
      Multimodal.rotate90(nine).rgb.toSeq)
    // inverse pairs: 6 then 8, 5 then 5, 2 then 2, 3 then 3 — identity
    for ((o, inv) <- Seq(6 -> 8, 8 -> 6, 5 -> 5, 7 -> 7, 2 -> 2, 3 -> 3, 4 -> 4))
      assert(Multimodal.exifRotate(Multimodal.exifRotate(nine, o), inv)
        .rgb.toSeq == nine.rgb.toSeq, s"$o then $inv must be identity")
    intercept[IllegalArgumentException](Multimodal.exifRotate(nine, 0))
    intercept[IllegalArgumentException](Multimodal.exifRotate(nine, 9))
  }

  test("decimateAudio: exact per-channel truncated means, incl. negative sums") {
    // stereo, 4 frames, k=2 → 2 frames; interleaved [L0,R0,L1,R1,...]
    val audio = Codecs.Audio(8000, 2,
      Array[Short](10, -3, 21, -4, 100, 7, -101, 8))
    val out = Multimodal.decimateAudio(audio, 2)
    assert(out.sampleRate == 4000 && out.channels == 2 && out.frames == 2)
    // L: (10+21)/2 = 15, R: (-3 + -4)/2 = -3 (truncation toward zero,
    // matching DuckDB's //), then L: (100 + -101)/2 = 0, R: (7+8)/2 = 7
    assert(out.samples.toSeq == Seq[Short](15, -3, 0, 7))
    intercept[IllegalArgumentException](Multimodal.decimateAudio(audio, 3))
  }

  test("resampleRational: hand-computed linear interpolation at L/M = 2/3") {
    // mono ramp [0,6,12,18,24] at 48 kHz → 32 kHz: out frames
    // (4·2)//3 + 1 = 3; t=1 sits at p=1.5 → (6+12)/2 = 9
    val audio = Codecs.Audio(48000, 1, Array[Short](0, 6, 12, 18, 24))
    val out = Multimodal.resampleRational(audio, 2, 3)
    assert(out.sampleRate == 32000 && out.channels == 1 && out.frames == 3)
    assert(out.samples.toSeq == Seq[Short](0, 9, 18))
  }

  test("resampleRational: constant signals survive exactly, incl. negative") {
    val audio = Codecs.Audio(44100, 2, Array.fill[Short](441 * 2)(-7))
    val out = Multimodal.resampleRational(audio, 160, 441)
    assert(out.sampleRate == 16000 && out.frames == (440 * 160) / 441 + 1)
    assert(out.samples.forall(_ == -7), "interpolating a constant is exact")
    // non-integral output rate rejected loudly
    intercept[IllegalArgumentException](
      Multimodal.resampleRational(Codecs.Audio(8000, 1, Array[Short](1, 2)), 1, 3))
  }

  test("resampleRational: 44.1 kHz stereo → 16 kHz matches brute replay") {
    val samples = Array.tabulate[Short](100 * 2)(i => ((i * 37) % 200 - 100).toShort)
    val audio = Codecs.Audio(44100, 2, samples)
    val out = Multimodal.resampleRational(audio, 160, 441)
    assert(out.sampleRate == 16000)
    for (t <- 0 until out.frames; c <- 0 until 2) {
      val num = t * 441
      val i = num / 160
      val r = num % 160
      val want =
        if (r == 0) samples(i * 2 + c).toInt
        else (samples(i * 2 + c) * (160 - r) + samples((i + 1) * 2 + c) * r) / 160
      assert(out.samples(t * 2 + c) == want, s"frame $t channel $c")
    }
  }

  test("decimateAudio: non-tiling frame counts mean the final short window") {
    // 5 frames, k=2: two full windows + a 1-frame tail, SAME mean filter
    // throughout (ADVICE r13 — never a silent switch to sample picking)
    val audio = Codecs.Audio(8000, 1, Array[Short](10, 20, 30, 40, 50))
    val out = Multimodal.decimateAudio(audio, 2)
    assert(out.sampleRate == 4000 && out.frames == 3)
    assert(out.samples.toSeq == Seq[Short](15, 35, 50))
  }

  test("firFilter: hand-computed binomial smoothing with replicate edges") {
    val audio = Codecs.Audio(8000, 1, Array[Short](0, 100, -100, 3))
    val out = Multimodal.firFilter(audio, Array(1, 2, 1))
    // y0 = (0+0+100)/4 = 25 (left edge replicates x0)
    // y1 = (0+200-100)/4 = 25; y2 = (100-200+3)/4 = -24 (toward zero)
    // y3 = (-100+6+3)/4 = -22 (right edge replicates x3)
    assert(out.samples.toSeq == Seq[Short](25, 25, -24, -22))
    assert(out.sampleRate == 8000 && out.channels == 1)
    // stereo: channels filter independently
    val st = Multimodal.firFilter(
      Codecs.Audio(8000, 2, Array[Short](0, 8, 100, -8, 0, 8)), Array(1, 2, 1))
    // R channel [8,-8,8]: y0 = (8+16-8)/4 = 4, y1 = (8-16+8)/4 = 0,
    // y2 = (-8+16+8)/4 = 4
    assert(st.samples.toSeq == Seq[Short](25, 4, 50, 0, 25, 4))
  }

  test("dctPhash64: identical pixels equal, brightness shift invariant") {
    def img(shift: Int, noise: Boolean) = Codecs.Png.decode(
      Codecs.Png.encode(64, 64, (x, y) => {
        val n = if (noise && x == 40 && y == 40) 120 else 0
        def c(v: Int) = math.min(255, math.max(0, v))
        (c((x * 7 + y * 13) % 200 + shift + n),
          c((x * 5 + y * 11) % 200 + shift + n),
          c((x * 3 + y * 17) % 200 + shift + n))
      }))
    val base = Multimodal.dctPhash64(img(0, noise = false))
    assert(Multimodal.dctPhash64(img(0, noise = false)) == base,
      "identical pixels must hash identically")
    // +20 brightness moves only the DC coefficient — the AC block and
    // its median shift by nothing, so the classic pHash is invariant
    assert(Multimodal.dctPhash64(img(20, noise = false)) == base,
      "pHash must be brightness-invariant")
    // one perturbed pixel flips at most a few low-frequency bits
    val noisy = Multimodal.dctPhash64(img(0, noise = true))
    assert(java.lang.Long.bitCount(base ^ noisy) <= 8,
      "a single-pixel change must stay within a few bits")
    intercept[IllegalArgumentException](
      Multimodal.dctPhash64(Codecs.Image(16, 16, new Array[Byte](16 * 16 * 3))))
  }

  test("sampleFramesGif: real demux keeps every Nth frame as a BMP record") {
    val frames = Seq.tabulate(5)(f =>
      Array.tabulate(4 * 3)(i => ((i + f * 50) % 256).toByte))
    val gif = MediaRecord(7L, "image/gif",
      Codecs.Gif.encode(4, 3, Codecs.Gif.grayPalette, frames))
    val out = Multimodal.sampleFramesGif(Seq(gif).toDS(), everyNth = 2)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(700000L, 700002L, 700004L))
    // each kept record is a real BMP whose pixels are the frame's grays
    val img = Codecs.Bmp.decode(out(1).content) // frame 2
    assert(img.width == 4 && img.height == 3)
    assert(img.pixel(1, 0) == ((101, 101, 101))) // index 1 + 2*50
  }

  test("phash: hand-computed average-hash bits") {
    // mean 0.5 -> bits set where feature > 0.5: positions 2 and 4
    val feats = Seq((1L, Seq(0.0f, 1.0f, 0.0f, 1.0f))).toDF("media_id", "features")
    val out = Multimodal.phash(feats).collect().head
    assert(out.getLong(1) == ((1L << 1) | (1L << 3)))
    // constant vector: nothing is ABOVE the mean -> hash 0
    val flat = Seq((2L, Seq(0.25f, 0.25f, 0.25f))).toDF("media_id", "features")
    assert(Multimodal.phash(flat).collect().head.getLong(1) == 0L)
  }

  test("phashNearDuplicates: identical payloads pair at 0, a flipped bit at 1") {
    val base = Seq.tabulate(64)(i => if (i % 3 == 0) 0.9f else 0.1f)
    val flipped = base.updated(5, 0.9f) // one extra above-mean bit
    val feats = Seq(
      (1L, base), (2L, base), (3L, flipped)
    ).toDF("media_id", "features")
    val strict = Multimodal.phashNearDuplicates(feats, maxDist = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(strict == Set((1L, 2L, 0)))
    val loose = Multimodal.phashNearDuplicates(feats, maxDist = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("audioSpectrogramFixed: hand-computed impulse and DC cases, stereo " +
    "channel separation, tail-frame drop (VERDICT r15 #5)") {
    val scale = 1L << 20
    // twiddle table sanity: bin 0 is all-scale (cos 0 = 1 exactly), j=0
    // column is scale for every bin, magnitudes stay near the lattice
    val (cosT, sinT) = Multimodal.spectralTwiddle(32, 17, scale)
    assert(cosT(0).forall(_ == scale) && sinT(0).forall(_ == 0L))
    assert((0 until 17).forall(k => cosT(k)(0) == scale && sinT(k)(0) == 0L))
    assert(cosT.flatten.forall(v => math.abs(v) <= scale + 256) &&
      sinT.flatten.forall(v => math.abs(v) <= scale + 256),
      "recurrence drift must stay within a couple hundred ulps of the " +
        "2^20 lattice (measured max ~140 over a 32-sample frame)")
    // impulse at n = 0: X_k = A·cos_k(0) = A·scale for EVERY bin, so
    // power = A² everywhere — by hand
    val impulse = Array.tabulate(32)(n => if (n == 0) 100 else 0).map(_.toShort)
    val mono = Seq(MediaRecord(1L, "audio/wav",
      Codecs.Wav.encode(8000, 1, impulse))).toDS()
    val impOut = Multimodal.audioSpectrogramFixed(mono).collect()
      .map(r => (r.getLong(3), r.getLong(4)))
    assert(impOut.length == 17 && impOut.forall(_._2 == 10000L),
      s"impulse power must be A² in every bin: ${impOut.toSeq}")
    // constant 7: bin 0 is (32·7)² = 50176 by hand; AC bins ~ 0 (full-
    // period cosine sums cancel up to recurrence drift)
    val const = Array.fill(32)(7.toShort)
    val dcOut = Multimodal.audioSpectrogramFixed(
      Seq(MediaRecord(2L, "audio/wav", Codecs.Wav.encode(8000, 1, const))).toDS())
      .collect().map(r => (r.getLong(3), r.getLong(4))).toMap
    assert(dcOut(0L) == 50176L, s"DC bin: ${dcOut(0L)}")
    assert((1 until 17).forall(k => dcOut(k.toLong) < 100L),
      s"AC bins of a constant signal must be ~0: $dcOut")
    // stereo: interleaved impulses of different amplitude stay separated
    val stereo = new Array[Short](64)
    stereo(0) = 3 // channel 0, n = 0
    stereo(1) = 5 // channel 1, n = 0
    val stOut = Multimodal.audioSpectrogramFixed(
      Seq(MediaRecord(3L, "audio/wav", Codecs.Wav.encode(8000, 2, stereo))).toDS())
      .collect().map(r => ((r.getLong(1), r.getLong(3)), r.getLong(4))).toMap
    assert((0 until 17).forall(k => stOut((0L, k.toLong)) == 9L &&
      stOut((1L, k.toLong)) == 25L), s"per-channel powers: $stOut")
    // 40 mono samples = one full frame + a dropped tail
    val tail = Multimodal.audioSpectrogramFixed(
      Seq(MediaRecord(4L, "audio/wav",
        Codecs.Wav.encode(8000, 1, new Array[Short](40)))).toDS()).collect()
    assert(tail.map(_.getLong(2)).distinct.toSeq == Seq(0L),
      "the incomplete tail frame must drop")
    intercept[IllegalArgumentException](
      Multimodal.audioSpectrogramFixed(mono, bins = 18))
  }

  test("audioFilterbankFixed: hand-computed triangle weights pool the " +
    "impulse spectrum; guards reject bad centers") {
    // impulse A=100 → power = 10000 in EVERY bin, so each band energy is
    // 10000·Σw(b,k). Default centers (0,1,2,4,7,11,16), weightScale 1024:
    //   band 0 (0,1,2):  w(1)=1024                       → Σ = 1024
    //   band 1 (1,2,4):  w(2)=1024, w(3)=(4-3)·1024/2=512 → Σ = 1536
    // (both fully by hand; the remaining bands replay the same formula)
    val impulse = Array.tabulate(32)(n => if (n == 0) 100 else 0).map(_.toShort)
    val spectro = Multimodal.audioSpectrogramFixed(
      Seq(MediaRecord(1L, "audio/wav",
        Codecs.Wav.encode(8000, 1, impulse))).toDS())
    val out = Multimodal.audioFilterbankFixed(spectro).collect()
      .map(r => (r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) == 10000L * 1024L, s"band 0: ${out(0L)}")
    assert(out(1L) == 10000L * 1536L, s"band 1: ${out(1L)}")
    val expected = {
      val centers = Seq(0, 1, 2, 4, 7, 11, 16)
      (1 until centers.size - 1).map { b =>
        val (l, c, r) = (centers(b - 1), centers(b), centers(b + 1))
        (l to r).map(k => if (k <= c) (k - l).toLong * 1024 / (c - l)
                          else (r - k).toLong * 1024 / (r - c)).sum * 10000L
      }
    }
    assert((0 until 5).forall(b => out(b.toLong) == expected(b)),
      s"every band pools the flat impulse spectrum: $out vs $expected")
    intercept[IllegalArgumentException](
      Multimodal.audioFilterbankFixed(spectro, centers = Seq(3, 1, 2)))
    intercept[IllegalArgumentException](
      Multimodal.audioFilterbankFixed(spectro, centers = Seq(1, 2)))
  }

  test("audioCepstraFixed: the fixed-point log2 curve lands hand-computed " +
    "rungs and the integer DCT pools it; guards reject bad shapes") {
    // hand-computed log2fix (mant 20, fracBits 6), loge = msb·64 + frac:
    //   energy 0 → e1=1:        msb=0, m=2^20, no rung ≤ m   → 0
    //   energy 1 → e1=2:        msb=1, m=2^20                → 64
    //   energy 2 → e1=3:        msb=1, m=3·2^19, log2(1.5)=0.58496 →
    //                           frac=⌊64·0.58496⌋=37         → 101
    //   energy 3 → e1=4:        msb=2, m=2^20                → 128
    //   energy 2^30−1 → e1=2^30: msb=30, exact power          → 1920
    val fb = Seq(
      (1L, 0L, 0L, 0L, 0L),
      (1L, 0L, 0L, 1L, 1L),
      (1L, 0L, 0L, 2L, 2L),
      (1L, 0L, 0L, 3L, 3L),
      (1L, 0L, 0L, 4L, (1L << 30) - 1L))
      .toDF("media_id", "channel", "frame_idx", "band", "energy")
    val out = Multimodal.audioCepstraFixed(fb).collect()
      .map(r => (r.getLong(3), r.getLong(4))).toMap
    val loges = Seq(0L, 64L, 101L, 128L, 1920L)
    // coef 0 weights are floor(cos(0)·1024) = 1024 for every band — the
    // c0 log-energy sum, fully by hand
    assert(out(0L) == 1024L * loges.sum, s"c0: $out")
    // the other coefficients replay the seed table over the same curve
    for (u <- 1 until 4) {
      val want = loges.zipWithIndex.map { case (lg, b) =>
        lg * Multimodal.cepstralDctSeed(5, u, b, 1024L)
      }.sum
      assert(out(u.toLong) == want, s"c$u: got ${out(u.toLong)} want $want")
    }
    // randomized parity against a direct Scala replay of the spec'd
    // integer formula (shift ≡ div-by-power-of-two on positives)
    def logFix(e: Long): Long = {
      val e1 = e + 1
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(e1)
      val m = if (msb >= 20) e1 >> (msb - 20) else e1 << (20 - msb)
      msb * 64L + (1 until 64).count(f =>
        m >= Multimodal.log2Threshold(f, 6))
    }
    val rnd = new scala.util.Random(7)
    val energies = Seq.tabulate(8, 5)((f, b) =>
      if ((f + b) % 3 == 0) rnd.nextLong(1L << 55) else rnd.nextLong(2000))
    val fb2 = (for { f <- 0 until 8; b <- 0 until 5 }
      yield (9L, 0L, f.toLong, b.toLong, energies(f)(b)))
      .toDF("media_id", "channel", "frame_idx", "band", "energy")
    val got = Multimodal.audioCepstraFixed(fb2).collect()
      .map(r => ((r.getLong(2), r.getLong(3)), r.getLong(4))).toMap
    for { f <- 0 until 8; u <- 0 until 4 } {
      val want = (0 until 5).map(b =>
        logFix(energies(f)(b)) * Multimodal.cepstralDctSeed(5, u, b, 1024L)).sum
      assert(got((f.toLong, u.toLong)) == want, s"frame $f coef $u")
    }
    intercept[IllegalArgumentException](
      Multimodal.audioCepstraFixed(fb, nCoefs = 6))
    intercept[IllegalArgumentException](
      Multimodal.audioCepstraFixed(fb, nBands = 1))
  }

  test("audioDeltaFixed: hand-computed regression with repeat-edge " +
    "padding; negative sums truncate toward zero") {
    // c = [10, 20, 40, 30, 0], d_t = (Σ n·(c_{t+n}−c_{t−n})) div 10,
    // edges clamp: d_0 = (20−10) + 2·(40−10) = 70 → 7;
    // d_1 = (40−10)+2·(30−10) = 70 → 7; d_2 = 10−20 = −10 → −1;
    // d_3 = −40−40 = −80 → −8; d_4 = −30−80 = −110 → −11
    val feats = Seq(10L, 20L, 40L, 30L, 0L).zipWithIndex.map {
      case (c, t) => (1L, 0L, t.toLong, 0L, c)
    }.toDF("media_id", "channel", "frame_idx", "coef", "cepstrum")
    val out = Multimodal.audioDeltaFixed(feats).collect()
      .map(r => (r.getLong(2), r.getLong(4))).toMap
    assert(out == Map(0L -> 7L, 1L -> 7L, 2L -> -1L, 3L -> -8L, 4L -> -11L),
      s"hand-computed deltas: $out")
    // −5 div 10 must be 0 (toward zero — Spark div ≡ DuckDB //), not
    // floor's −1: c = [0, 5, 0] → d_2 = (c_2−c_1) + 2·(c_2−c_0) = −5
    // (both +offsets clamp to the last frame)
    val tz = Seq(0L, 5L, 0L).zipWithIndex.map {
      case (c, t) => (2L, 0L, t.toLong, 0L, c)
    }.toDF("media_id", "channel", "frame_idx", "coef", "cepstrum")
    val tzOut = Multimodal.audioDeltaFixed(tz).collect()
      .map(r => (r.getLong(2), r.getLong(4))).toMap
    assert(tzOut(2L) == 0L, s"truncation toward zero (floor would be -1): $tzOut")
    // a single-frame clip clamps every partner to itself: delta 0
    val one = Seq((3L, 0L, 0L, 0L, 77L))
      .toDF("media_id", "channel", "frame_idx", "coef", "cepstrum")
    assert(Multimodal.audioDeltaFixed(one).collect().head.getLong(4) == 0L)
    intercept[IllegalArgumentException](Multimodal.audioDeltaFixed(one, n = 0))
  }

  test("exifMetaTolerant: malformed records flag instead of aborting the " +
    "pass; clean records answer exactly like the strict walk (ADVICE r15)") {
    val q8 = Array.fill(64)(8)
    val good = Jpeg.encodeFromCoefficients(16, 16, chroma420 = false, q8, q8,
      restartInterval = 0, (_, _, _) => new Array[Int](64))
    val withExif = Exif.spliceApp1(good,
      Exif.encodeApp1(littleEndian = false, orientation = 6, 16L, 16L))
    val corpus = Seq(
      MediaRecord(1L, "image/jpeg", withExif),
      MediaRecord(2L, "image/jpeg", withExif.take(8)),       // truncated
      MediaRecord(3L, "image/jpeg", Array[Byte](1, 2, 3)),   // not a JPEG
      MediaRecord(4L, "image/jpeg", good)                    // clean, no EXIF
    ).toDS()
    // the strict pass aborts on the corrupt records…
    intercept[org.apache.spark.SparkException] {
      Exif.exifMeta(corpus).collect()
    }
    // …the tolerant pass completes and flags exactly them
    val out = Exif.exifMetaTolerant(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getBoolean(8) && out(3L).getBoolean(8), "malformed flagged")
    assert(out(2L).getLong(2) == 0L && !out(2L).getBoolean(1),
      "malformed rows carry zeroed fields")
    assert(!out(1L).getBoolean(8) && out(1L).getBoolean(1) &&
      out(1L).getLong(2) == 6L && !out(1L).getBoolean(7),
      "clean EXIF record parses exactly")
    assert(!out(4L).getBoolean(8) && !out(4L).getBoolean(1) &&
      out(4L).getLong(5) == 16L, "clean bare record parses exactly")
  }
}

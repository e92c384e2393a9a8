package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. The decode libraries
  * (image/audio codecs) are NOT part of the engine — media stays an opaque
  * `binary` column end-to-end and decoding happens behind [[Multimodal]]'s
  * stubbed decoder boundary, so the Spark-side plumbing (schema,
  * partitioning, batch shape) is real while the codec is pluggable.
  */
case class MediaRecord(media_id: Long, media_type: String, content: Array[Byte])

/** A decoded feature row — what a real decoder would emit per media
  * object (fixed-width feature vector + basic dimensions).
  */
case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
                         features: Array[Float])

/** Multimodal-column operators for training-data pipelines.
  *
  * Media is modeled as `binary` columns with metadata, sourced either from
  * the binaryFile format (one file = one row, like the reference's S3
  * objects) or packed into parquet. Feature extraction runs per partition
  * over an iterator of records — the Scala analogue of `mapInPandas`
  * (batched rows in, batched rows out, executor-side, no driver
  * involvement) and the documented last-resort boundary (builder prompt:
  * stub the codec, keep the plumbing real).
  */
object Multimodal {

  /** Ingest a directory of files as media records (binaryFile source:
    * path/length/content), media_type inferred from the extension —
    * the path-routing predicate family (P11) applied to media.
    */
  def ingest(spark: org.apache.spark.sql.SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob).select(
      xxhash64(col("path")).as("media_id"),
      when(col("path").endsWith(".png"), "image/png")
        .when(col("path").endsWith(".jpg"), "image/jpeg")
        .when(col("path").endsWith(".wav"), "audio/wav")
        .otherwise("application/octet-stream").as("media_type"),
      col("content"))

  /** Typed metadata for a media frame without decoding: byte length and
    * content digest. Pure codegen'd expressions — this is the cheap pass
    * that runs over 100 TB before any decode is scheduled.
    */
  def describe(media: DataFrame, idCol: String = "media_id",
               contentCol: String = "content",
               mediaTypeCol: String = "media_type"): DataFrame =
    media.select(col(idCol), col(mediaTypeCol),
      length(col(contentCol)).as("n_bytes"),
      sha2(col(contentCol), 256).as("content_sha"))

  /** STUB DECODER — deterministic fake. A real deployment swaps this one
    * function for a codec call (libjpeg/ffmpeg/…); everything around it
    * (partition-iterator batching, schema, shuffle behavior) is the real
    * production shape. The fake "features" are a seeded, length-normalized
    * byte profile so tests can assert exact values.
    */
  def decodeStub(rec: MediaRecord, dim: Int): MediaFeatures = {
    val bytes = rec.content
    val features = Array.tabulate(dim) { i =>
      if (bytes.isEmpty) 0.0f
      else (bytes(i % bytes.length) & 0xFF) / 255.0f
    }
    MediaFeatures(rec.media_id, rec.media_type, bytes.length, features)
  }

  /** STUB RESIZE — deterministic fake standing in for an image resampler:
    * byte-decimates the payload to `targetBytes` (uniform stride). A real
    * codec replaces the body; the signature (record in, smaller record
    * out) and the executor-side call pattern are the production shape.
    */
  def resizeStub(rec: MediaRecord, targetBytes: Int): MediaRecord = {
    val bytes = rec.content
    if (bytes.length <= targetBytes) rec
    else {
      val stride = bytes.length.toDouble / targetBytes
      val out = Array.tabulate(targetBytes)(i => bytes((i * stride).toInt))
      rec.copy(content = out)
    }
  }

  /** STUB FRAME SAMPLER — deterministic fake for video frame extraction:
    * splits the payload into fixed-size "frames" and keeps every
    * `everyNth`. One input record → many frame records (the flatMap shape
    * a real demuxer has).
    */
  def frameSampleStub(rec: MediaRecord, frameBytes: Int,
                      everyNth: Int): Seq[MediaRecord] =
    rec.content.grouped(frameBytes).zipWithIndex
      .collect { case (frame, i) if i % everyNth == 0 =>
        MediaRecord(rec.media_id * 100000L + i, rec.media_type, frame)
      }.toSeq

  /** Frame sampling over a media Dataset: per-partition flatMap through
    * the stub demuxer — record fan-out happens executor-side, partition
    * count preserved.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int,
                   everyNth: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(frameSampleStub(_, frameBytes, everyNth)))
  }

  /** Feature extraction over a media Dataset: per-partition iterator
    * mapping (the mapInPandas shape — records stream through the decoder
    * executor-side, one partition per task, nothing collects). Partition
    * count is preserved; co-partitioning with a downstream join key is the
    * caller's `repartition` decision.
    */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub(_, dim)))
  }

  /** REAL-codec feature extraction (VERDICT r09 #4): the same
    * per-partition iterator boundary as [[extractFeatures]], but the
    * decode step is [[Codecs.Bmp]] actually parsing BMP headers, row
    * padding, and bottom-up BGR pixel order. Features are the mean pixel
    * intensity per `dim` equal pixel-index buckets — a real (if simple)
    * image descriptor computed from genuinely decoded pixels.
    */
  def decodeBmpFeatures(rec: MediaRecord, dim: Int): MediaFeatures = {
    val img = Codecs.Bmp.decode(rec.content)
    val n = img.width * img.height
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      val o = i * 3
      sums(b) += ((img.rgb(o) & 0xFF) + (img.rgb(o + 1) & 0xFF) +
        (img.rgb(o + 2) & 0xFF)) / (3.0 * 255.0)
      counts(b) += 1
      i += 1
    }
    val feats = Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0.0f else (sums(j) / counts(j)).toFloat)
    MediaFeatures(rec.media_id, rec.media_type, rec.content.length, feats)
  }

  /** [[decodeBmpFeatures]]'s audio twin: [[Codecs.Wav]] walks the RIFF
    * chunks and decodes PCM-16; features are per-bucket RMS amplitude.
    */
  def decodeWavFeatures(rec: MediaRecord, dim: Int): MediaFeatures = {
    val audio = Codecs.Wav.decode(rec.content)
    val n = audio.samples.length
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      val s = audio.samples(i) / 32768.0
      sums(b) += s * s
      counts(b) += 1
      i += 1
    }
    val feats = Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0.0f else math.sqrt(sums(j) / counts(j)).toFloat)
    MediaFeatures(rec.media_id, rec.media_type, rec.content.length, feats)
  }

  /** [[extractFeatures]] with the REAL BMP decoder behind the boundary. */
  def extractFeaturesBmp(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeBmpFeatures(_, dim)))
  }

  /** [[extractFeatures]] with the REAL WAV decoder behind the boundary. */
  def extractFeaturesWav(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeWavFeatures(_, dim)))
  }

  /** Integer-exact stats of REAL-decoded BMPs — dimensions straight from
    * the parsed header, per-channel pixel sums from the decoded payload.
    * Executor-side per-partition decode (the mapInPandas shape); every
    * column is integral so the whole decode path sits under the DuckDB
    * hash compare (the mm_decode_bmp oracle replays the pixel formulas
    * analytically — one wrong byte offset, stride, or row direction in
    * the parser and the sums mismatch).
    */
  def bmpStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Codecs.Bmp.decode(rec.content)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
        sb += img.rgb(i + 2) & 0xFF
        i += 3
      }
      (rec.media_id, img.width.toLong, img.height.toLong,
        rec.content.length.toLong, sr, sg, sb)
    }).toDF("media_id", "width", "height", "n_bytes", "sum_r", "sum_g", "sum_b")
  }

  /** Horizontal mirror — `out(x, y) = in(w−1−x, y)`. Integer-exact pixel
    * permutation, the standard train-time augmentation.
    */
  def flipH(img: Codecs.Image): Codecs.Image = {
    val out = new Array[Byte](img.rgb.length)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val src = (y * img.width + (img.width - 1 - x)) * 3
        val dst = (y * img.width + x) * 3
        out(dst) = img.rgb(src); out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Codecs.Image(img.width, img.height, out)
  }

  /** Clockwise 90° rotation — output is height×width,
    * `out(x, y) = in(y, h−1−x)`.
    */
  def rotate90(img: Codecs.Image): Codecs.Image = {
    val (w2, h2) = (img.height, img.width)
    val out = new Array[Byte](img.rgb.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((img.height - 1 - x) * img.width + y) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.rgb(src); out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Codecs.Image(w2, h2, out)
  }

  /** Center crop to `cw × ch` — offsets floor((dim − crop) / 2), the
    * deterministic eval-time crop (train-time random crops are this with
    * a seeded offset).
    */
  def cropCenter(img: Codecs.Image, cw: Int, ch: Int): Codecs.Image = {
    require(cw >= 1 && ch >= 1 && cw <= img.width && ch <= img.height,
      s"crop ${cw}x$ch exceeds ${img.width}x${img.height}")
    val ox = (img.width - cw) / 2
    val oy = (img.height - ch) / 2
    val out = new Array[Byte](cw * ch * 3)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        val src = ((y + oy) * img.width + x + ox) * 3
        val dst = (y * cw + x) * 3
        out(dst) = img.rgb(src); out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Codecs.Image(cw, ch, out)
  }

  /** Apply an EXIF orientation (1–8) — the DISPLAY transform the
    * [[Exif]] metadata demands before any pixel-consuming stage sees the
    * image (a model trained on un-rotated portrait crawls learns sideways
    * faces): one integer coordinate remap per destination pixel, the
    * inverse maps of the EXIF 2.3 orientation table. 1 identity,
    * 2 mirror-H, 3 rotate 180, 4 mirror-V, 5 transpose, 6 rotate 90 CW,
    * 7 transverse, 8 rotate 270 CW. Orientations 5–8 swap dimensions.
    */
  def exifRotate(img: Codecs.Image, orientation: Int): Codecs.Image = {
    require(orientation >= 1 && orientation <= 8,
      s"EXIF orientation must be 1..8, got $orientation")
    if (orientation == 1) return img
    val (ww, hh) = (img.width, img.height)
    val swap = orientation >= 5
    val (w2, h2) = if (swap) (hh, ww) else (ww, hh)
    val out = new Array[Byte](img.rgb.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val (sx, sy) = orientation match {
          case 2 => (ww - 1 - x, y)
          case 3 => (ww - 1 - x, hh - 1 - y)
          case 4 => (x, hh - 1 - y)
          case 5 => (y, x)
          case 6 => (y, hh - 1 - x)
          case 7 => (ww - 1 - y, hh - 1 - x)
          case _ => (ww - 1 - y, x) // 8
        }
        val src = (sy * ww + sx) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.rgb(src); out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Codecs.Image(w2, h2, out)
  }

  /** [[exifRotate]] over a media dataset with the orientation taken from
    * the record id schedule `media_id % 8 + 1` (all eight transforms
    * exercised), reporting the [[augmentStats]] position-weighted channel
    * sums — plain sums are permutation-invariant and would pass a rotate
    * that did nothing; the weights pin every pixel to its destination.
    */
  def exifRotateStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val orientation = (rec.media_id % 8 + 1).toInt
      val img = exifRotate(Codecs.Bmp.decode(rec.content), orientation)
      var (wr, wg, wb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.width * img.height) {
        val w = (i + 1).toLong
        wr += (img.rgb(3 * i) & 0xFF) * w
        wg += (img.rgb(3 * i + 1) & 0xFF) * w
        wb += (img.rgb(3 * i + 2) & 0xFF) * w
        i += 1
      }
      (rec.media_id, orientation.toLong, img.width.toLong, img.height.toLong,
        wr, wg, wb)
    }).toDF("media_id", "orientation", "width", "height",
      "wsum_r", "wsum_g", "wsum_b")
  }

  /** Deterministic augmentation stats over BMP payloads: per record, op =
    * media_id % 3 (0 flip, 1 rotate90, 2 center-crop by 2 px each side),
    * reporting dimensions and POSITION-WEIGHTED channel sums
    * `Σ v(x,y) · (y·W' + x + 1)` — plain sums are permutation-invariant
    * and would pass a flip that did nothing; the weighted sums pin every
    * pixel to its destination coordinate, so the oracle catches any
    * misplacement.
    */
  def augmentStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img0 = Codecs.Bmp.decode(rec.content)
      val op = (rec.media_id % 3).toInt
      val img = op match {
        case 0 => flipH(img0)
        case 1 => rotate90(img0)
        case _ => cropCenter(img0, img0.width - 2, img0.height - 2)
      }
      var (wr, wg, wb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.width * img.height) {
        val w = (i + 1).toLong
        wr += (img.rgb(3 * i) & 0xFF) * w
        wg += (img.rgb(3 * i + 1) & 0xFF) * w
        wb += (img.rgb(3 * i + 2) & 0xFF) * w
        i += 1
      }
      (rec.media_id, op.toLong, img.width.toLong, img.height.toLong,
        wr, wg, wb)
    }).toDF("media_id", "op", "width", "height", "wsum_r", "wsum_g", "wsum_b")
  }

  /** [[bmpStats]]'s audio twin: header fields + the exact sample sum of
    * the decoded PCM payload.
    */
  def wavStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val audio = Codecs.Wav.decode(rec.content)
      var s = 0L
      var i = 0
      while (i < audio.samples.length) { s += audio.samples(i); i += 1 }
      (rec.media_id, audio.sampleRate.toLong, audio.channels.toLong,
        audio.frames.toLong, rec.content.length.toLong, s)
    }).toDF("media_id", "sample_rate", "channels", "n_frames", "n_bytes",
      "sum_samples")
  }

  /** EXACT integer box-filter downsample — the real resampler replacing
    * `resizeStub` (VERDICT r11 #4): each output pixel is the integer
    * mean (floor) of its k×k source block, per channel. Requiring k to
    * divide both dimensions keeps every block full, so the arithmetic is
    * closed-form integer — `floor(Σ block / k²)` — and a SQL oracle can
    * recompute every output pixel analytically. (A production resampler
    * adds fractional-block edge handling and interpolation modes; the
    * exact-mean core is what the correctness gate can pin.)
    */
  def boxResize(img: Codecs.Image, k: Int): Codecs.Image = {
    require(k >= 1, s"box filter needs k >= 1, got $k")
    require(img.width % k == 0 && img.height % k == 0,
      s"box filter k=$k must divide ${img.width}x${img.height}")
    val (w2, h2) = (img.width / k, img.height / k)
    val out = new Array[Byte](w2 * h2 * 3)
    var yy = 0
    while (yy < h2) {
      var xx = 0
      while (xx < w2) {
        var c = 0
        while (c < 3) {
          var s = 0
          var dy = 0
          while (dy < k) {
            var dx = 0
            while (dx < k) {
              s += img.rgb(((yy * k + dy) * img.width + (xx * k + dx)) * 3 + c) & 0xFF
              dx += 1
            }
            dy += 1
          }
          out((yy * w2 + xx) * 3 + c) = (s / (k * k)).toByte
          c += 1
        }
        xx += 1
      }
      yy += 1
    }
    Codecs.Image(w2, h2, out)
  }

  /** EXACT integer audio decimation — [[boxResize]]'s audio twin: each
    * output frame is the per-channel integer mean of `k` consecutive
    * input frames (truncating division, matching DuckDB's `//`, which
    * rounds toward zero on negative sums), and
    * the sample rate divides by `k` (`k | sampleRate` required). A
    * non-tiling frame count keeps the SAME filter: the final window is
    * the mean over however many frames remain — one algorithm for every
    * clip length, never a silent switch to sample picking (ADVICE r13).
    * (A production resampler adds fractional-rate interpolation and an
    * anti-aliasing filter; the exact decimation core is what the
    * correctness gate can pin.)
    */
  def decimateAudio(audio: Codecs.Audio, k: Int): Codecs.Audio = {
    require(k >= 1, s"decimation needs k >= 1, got $k")
    require(audio.sampleRate % k == 0,
      s"k=$k must divide rate=${audio.sampleRate}")
    val ch = audio.channels
    val outFrames = (audio.frames + k - 1) / k
    val out = new Array[Short](outFrames * ch)
    var t = 0
    while (t < outFrames) {
      val win = math.min(k, audio.frames - t * k) // final window may be short
      var c = 0
      while (c < ch) {
        var s = 0L
        var j = 0
        while (j < win) { s += audio.samples((t * k + j) * ch + c); j += 1 }
        out(t * ch + c) = (s / win).toShort
        c += 1
      }
      t += 1
    }
    Codecs.Audio(audio.sampleRate / k, ch, out)
  }

  /** Rational L/M resampling (VERDICT r12 #3 — 44.1 kHz → 16 kHz is
    * L/M = 160/441): output frame `t` sits at input position
    * p = t·M/L, reconstructed by integer-exact LINEAR interpolation
    * between the two neighboring input frames —
    * `(s[i]·(L−r) + s[i+1]·r) / L` with i = (t·M)/L, r = (t·M) mod L,
    * truncating division (matching DuckDB's `//`, toward zero on
    * negative numerators). Output length ((frames−1)·L)/M + 1 covers
    * exactly the input's time span; the output rate rate·L/M must be
    * integral. (A production resampler uses a windowed-sinc polyphase
    * filter bank; first-order interpolation is the integer-exact core
    * the correctness gate can pin, the [[decimateAudio]] stance.)
    */
  def resampleRational(audio: Codecs.Audio, l: Int, m: Int): Codecs.Audio = {
    require(l >= 1 && m >= 1, s"resample needs L, M >= 1, got $l/$m")
    require((audio.sampleRate.toLong * l) % m == 0,
      s"output rate ${audio.sampleRate}*$l/$m is not integral")
    require(audio.frames >= 1, "empty clip")
    val ch = audio.channels
    val outFrames = ((audio.frames - 1).toLong * l / m).toInt + 1
    val out = new Array[Short](outFrames * ch)
    var t = 0
    while (t < outFrames) {
      val num = t.toLong * m
      val i = (num / l).toInt
      val r = (num % l).toInt
      var c = 0
      while (c < ch) {
        val a = audio.samples(i * ch + c).toLong
        out(t * ch + c) =
          if (r == 0) a.toShort
          else ((a * (l - r) + audio.samples((i + 1) * ch + c).toLong * r) / l).toShort
        c += 1
      }
      t += 1
    }
    Codecs.Audio((audio.sampleRate.toLong * l / m).toInt, ch, out)
  }

  /** The real audio chain with the RATIONAL resampler in the middle —
    * WAV decode → [[resampleRational]] → integer stats. Closed-form end
    * to end, so the oracle recomputes every interpolated output sample.
    */
  def resampleRationalWavStats(media: Dataset[MediaRecord], l: Int,
                               m: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val audio = resampleRational(Codecs.Wav.decode(rec.content), l, m)
      var s = 0L
      var i = 0
      while (i < audio.samples.length) { s += audio.samples(i); i += 1 }
      (rec.media_id, audio.sampleRate.toLong, audio.channels.toLong,
        audio.frames.toLong, s)
    }).toDF("media_id", "out_rate", "channels", "out_frames", "sum_samples")
  }

  /** The real audio chain — WAV decode → exact [[decimateAudio]] →
    * integer stats of the RESAMPLED clip. Every column integral, so the
    * oracle recomputes the decimated samples analytically frame by frame.
    */
  def resampleWavStats(media: Dataset[MediaRecord], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val audio = decimateAudio(Codecs.Wav.decode(rec.content), k)
      var s = 0L
      var i = 0
      while (i < audio.samples.length) { s += audio.samples(i); i += 1 }
      (rec.media_id, audio.sampleRate.toLong, audio.channels.toLong,
        audio.frames.toLong, s)
    }).toDF("media_id", "out_rate", "channels", "out_frames", "sum_samples")
  }

  /** [[bmpStats]]'s PNG twin: dimensions from the parsed IHDR,
    * per-channel pixel sums from the fully reconstructed (inflated +
    * unfiltered) payload. `n_pixels` replaces the BMP's `n_bytes` — a
    * deflate stream's length is not closed-form, pixel count is. One
    * wrong filter predictor (Sub/Up/Average/Paeth), CRC, or zlib
    * boundary and the sums mismatch.
    */
  def pngStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Codecs.Png.decode(rec.content)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
        sb += img.rgb(i + 2) & 0xFF
        i += 3
      }
      (rec.media_id, img.width.toLong, img.height.toLong,
        img.width.toLong * img.height, sr, sg, sb)
    }).toDF("media_id", "width", "height", "n_pixels", "sum_r", "sum_g", "sum_b")
  }

  /** The real image chain end to end — PNG decode → exact [[boxResize]]
    * → per-channel sums of the RESIZED pixels. Every stage is
    * integer-exact, so the oracle recomputes the downsampled image
    * analytically (per-block floor-mean, then the sums).
    */
  def resizePngStats(media: Dataset[MediaRecord], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img = boxResize(Codecs.Png.decode(rec.content), k)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
        sb += img.rgb(i + 2) & 0xFF
        i += 3
      }
      (rec.media_id, img.width.toLong, img.height.toLong, sr, sg, sb)
    }).toDF("media_id", "out_width", "out_height", "sum_r", "sum_g", "sum_b")
  }

  /** [[decodeBmpFeatures]] with the real PNG decoder and the real
    * resampler in front: decode, [[boxResize]], then the bucketed
    * mean-intensity descriptor — the chain the phash dedup runs on REAL
    * RESIZED pixels (identical payloads still decode+resize to identical
    * features, the mm_phash invariant).
    */
  def decodePngResizedFeatures(rec: MediaRecord, k: Int, dim: Int): MediaFeatures = {
    val img = boxResize(Codecs.Png.decode(rec.content), k)
    val n = img.width * img.height
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      val o = i * 3
      sums(b) += ((img.rgb(o) & 0xFF) + (img.rgb(o + 1) & 0xFF) +
        (img.rgb(o + 2) & 0xFF)) / (3.0 * 255.0)
      counts(b) += 1
      i += 1
    }
    val feats = Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0.0f else (sums(j) / counts(j)).toFloat)
    MediaFeatures(rec.media_id, rec.media_type, rec.content.length, feats)
  }

  /** [[extractFeatures]] with PNG decode + real resize behind the boundary. */
  def extractFeaturesPngResized(media: Dataset[MediaRecord], k: Int,
                                dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodePngResizedFeatures(_, k, dim)))
  }

  /** [[pngStats]]'s JPEG twin: dimensions from the parsed SOF0,
    * per-channel pixel sums from the fully reconstructed (Huffman →
    * dequant → IDCT → upsample → YCbCr→RGB) payload. On the planted
    * basis-vector fixtures every decoded sample is a closed-form integer
    * (Jpeg.scala header), so the lossy container sits under the exact
    * DuckDB hash compare like the lossless ones.
    */
  def jpegStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Jpeg.decode(rec.content)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
        sb += img.rgb(i + 2) & 0xFF
        i += 3
      }
      (rec.media_id, img.width.toLong, img.height.toLong,
        img.width.toLong * img.height, sr, sg, sb)
    }).toDF("media_id", "width", "height", "n_pixels", "sum_r", "sum_g", "sum_b")
  }

  /** [[decodePngResizedFeatures]]'s JPEG twin: real JPEG decode, then the
    * bucketed mean-intensity descriptor — the phash dedup chain on
    * genuinely decoded JPEG pixels (identical payloads decode to
    * identical pixels, the mm_phash invariant).
    */
  def decodeJpegFeatures(rec: MediaRecord, dim: Int): MediaFeatures = {
    val img = Jpeg.decode(rec.content)
    val n = img.width * img.height
    val sums = new Array[Double](dim)
    val counts = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      val o = i * 3
      sums(b) += ((img.rgb(o) & 0xFF) + (img.rgb(o + 1) & 0xFF) +
        (img.rgb(o + 2) & 0xFF)) / (3.0 * 255.0)
      counts(b) += 1
      i += 1
    }
    val feats = Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0.0f else (sums(j) / counts(j)).toFloat)
    MediaFeatures(rec.media_id, rec.media_type, rec.content.length, feats)
  }

  /** [[extractFeatures]] with the REAL JPEG decoder behind the boundary. */
  def extractFeaturesJpeg(media: Dataset[MediaRecord],
                          dim: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeJpegFeatures(_, dim)))
  }

  /** Per-frame integer stats of a REAL-decoded animated GIF — one row
    * per frame: dimensions and frame count from the parsed container,
    * per-channel pixel sums through the palette. One record in → many
    * rows out (the demuxer flatMap shape), all executor-side.
    */
  def gifFrameStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val anim = Codecs.Gif.decode(rec.content)
      anim.frames.indices.map { f =>
        val img = anim.frame(f)
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < img.rgb.length) {
          sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
          sb += img.rgb(i + 2) & 0xFF
          i += 3
        }
        (rec.media_id, f.toLong, anim.width.toLong, anim.height.toLong,
          anim.frames.length.toLong, sr, sg, sb)
      }
    }).toDF("media_id", "frame_idx", "width", "height", "n_frames",
      "sum_r", "sum_g", "sum_b")
  }

  /** The REAL frame sampler replacing [[frameSampleStub]] (the last
    * stubbed multimodal path): demux an animated GIF with the real
    * codec, keep every `everyNth` frame, and re-encode each kept frame
    * as a standalone BMP record — so the existing image chain (decode →
    * resize → phash) runs on demuxed frames unchanged. Same flatMap
    * fan-out and `media_id * 100000 + frame` id scheme as the stub.
    */
  def sampleFramesGif(media: Dataset[MediaRecord],
                      everyNth: Int): Dataset[MediaRecord] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val anim = Codecs.Gif.decode(rec.content)
      anim.frames.indices.collect { case f if f % everyNth == 0 =>
        val img = anim.frame(f)
        MediaRecord(rec.media_id * 100000L + f, "image/bmp",
          Codecs.Bmp.encode(img.width, img.height, (x, y) => img.pixel(x, y)))
      }
    })
  }

  /** Per-frame integer stats of a REAL-demuxed MJPEG/AVI video — one row
    * per frame: container metadata (dimensions, frame count, frame
    * interval) from the parsed RIFF headers, per-channel pixel sums from
    * the full JPEG decode of each frame payload. The [[gifFrameStats]]
    * flatMap shape with the video container in front and the real JPEG
    * codec behind.
    */
  def aviFrameStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val video = Codecs.Avi.decode(rec.content)
      video.frames.indices.map { f =>
        val img = Jpeg.decode(video.frames(f))
        require(img.width == video.width && img.height == video.height,
          s"frame $f is ${img.width}x${img.height}, container says " +
            s"${video.width}x${video.height}")
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < img.rgb.length) {
          sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
          sb += img.rgb(i + 2) & 0xFF
          i += 3
        }
        (rec.media_id, f.toLong, video.width.toLong, video.height.toLong,
          video.frames.length.toLong, video.usPerFrame.toLong, sr, sg, sb)
      }
    }).toDF("media_id", "frame_idx", "width", "height", "n_frames",
      "us_per_frame", "sum_r", "sum_g", "sum_b")
  }

  /** The video-frame sampler ([[sampleFramesGif]]'s MJPEG twin): demux
    * an AVI, keep every `everyNth` frame, and re-emit each kept frame's
    * raw payload as a standalone JPEG record — MJPEG frames ARE baseline
    * JPEGs, so this is a pure byte slice, no transcode. Same
    * `media_id * 100000 + frame` id scheme as the GIF sampler.
    */
  def sampleFramesAvi(media: Dataset[MediaRecord],
                      everyNth: Int): Dataset[MediaRecord] = {
    require(everyNth >= 1, s"everyNth must be >= 1, got $everyNth")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val video = Codecs.Avi.decode(rec.content)
      video.frames.indices.collect { case f if f % everyNth == 0 =>
        MediaRecord(rec.media_id * 100000L + f, "image/jpeg", video.frames(f))
      }
    })
  }

  /** Integer bilinear ×2 UPSCALE with edge clamp — the augmentation-side
    * complement of [[boxResize]]'s exact downscale: even output pixels
    * copy their source, odd columns/rows take the truncated 2-tap mean
    * of the clamped horizontal/vertical neighbors, and the odd/odd
    * corner takes the truncated 4-tap mean. Pure integer arithmetic →
    * every output pixel is closed-form in the source formulas.
    */
  def upscale2(img: Codecs.Image): Codecs.Image = {
    val (w, h) = (img.width, img.height)
    val out = new Array[Byte](4 * w * h * 3)
    def src(x: Int, y: Int, c: Int): Int =
      img.rgb((y * w + x) * 3 + c) & 0xFF
    var yy = 0
    while (yy < 2 * h) {
      val y = yy / 2
      val y2 = math.min(y + 1, h - 1)
      var xx = 0
      while (xx < 2 * w) {
        val x = xx / 2
        val x2 = math.min(x + 1, w - 1)
        val o = (yy * 2 * w + xx) * 3
        var c = 0
        while (c < 3) {
          out(o + c) = (
            if (xx % 2 == 0 && yy % 2 == 0) src(x, y, c)
            else if (yy % 2 == 0) (src(x, y, c) + src(x2, y, c)) / 2
            else if (xx % 2 == 0) (src(x, y, c) + src(x, y2, c)) / 2
            else (src(x, y, c) + src(x2, y, c) +
              src(x, y2, c) + src(x2, y2, c)) / 4).toByte
          c += 1
        }
        xx += 1
      }
      yy += 1
    }
    Codecs.Image(2 * w, 2 * h, out)
  }

  /** [[upscale2]] through the real PNG decode, reported as dimensions +
    * per-channel output sums (the bmpStats convention — averaging makes
    * sums tap-placement-sensitive, unlike pure permutations).
    */
  def upscale2Stats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img = upscale2(Codecs.Png.decode(rec.content))
      var (sr, sg, sb) = (0L, 0L, 0L)
      var i = 0
      while (i < img.rgb.length) {
        sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF
        sb += img.rgb(i + 2) & 0xFF
        i += 3
      }
      (rec.media_id, img.width.toLong, img.height.toLong, sr, sg, sb)
    }).toDF("media_id", "width", "height", "sum_r", "sum_g", "sum_b")
  }

  /** Grayscale histogram equalization — the classic integer contrast
    * normalization ahead of visual feature extraction: gray =
    * (r + g + b) / 3 truncated, 256-bin histogram, cumulative cdf, and
    * the textbook remap floor((cdf(v) − cdfMin) · 255 / (n − cdfMin))
    * where cdfMin is the first nonzero cdf value (a flat image maps to
    * 0). Every step is integer arithmetic on decoded pixels, so the
    * whole normalization — histogram, cdf, remap, output sum — replays
    * in SQL. One decode + one 256-int array per image, executor-side.
    */
  def histogramEqualizeStats(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Codecs.Png.decode(rec.content)
      val n = img.width * img.height
      val hist = new Array[Long](256)
      var i = 0
      while (i < n) {
        val o = i * 3
        hist(((img.rgb(o) & 0xFF) + (img.rgb(o + 1) & 0xFF) +
          (img.rgb(o + 2) & 0xFF)) / 3) += 1
        i += 1
      }
      var cdfMin = 0L
      var seen = false
      val map = new Array[Long](256)
      var cdf = 0L
      var levels = 0L
      var v = 0
      while (v < 256) {
        if (hist(v) > 0) {
          levels += 1
          cdf += hist(v)
          if (!seen) { cdfMin = cdf; seen = true }
          map(v) =
            if (n > cdfMin) (cdf - cdfMin) * 255L / (n - cdfMin) else 0L
        }
        v += 1
      }
      var sumEq = 0L
      v = 0
      while (v < 256) { sumEq += hist(v) * map(v); v += 1 }
      (rec.media_id, n.toLong, levels, sumEq)
    }).toDF("media_id", "n_pixels", "n_levels", "sum_eq")
  }

  /** Integer-exact audio autocorrelation — the periodicity/pitch feature
    * under every classic voiced-speech detector: per clip and lag ℓ,
    * R(ℓ) = Σ_c Σ_t s[t,c]·s[t+ℓ,c] over the decoded PCM frames (lag 0
    * is the signal energy). Products of 16-bit samples summed in 64-bit
    * are EXACT and order-free, so — unlike any float spectral feature —
    * the whole feature table replays closed-form in SQL. One row per
    * (clip, lag), flatMap fan-out like the frame demuxers.
    */
  def audioAutocorrStats(media: Dataset[MediaRecord],
                         lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 0), s"bad lags $lags")
    import media.sparkSession.implicits._
    val lagArr = lags.toArray
    media.mapPartitions(_.flatMap { rec =>
      val audio = Codecs.Wav.decode(rec.content)
      val ch = audio.channels
      val frames = audio.frames
      lagArr.iterator.map { lag =>
        var r = 0L
        var c = 0
        while (c < ch) {
          var t = 0
          while (t + lag < frames) {
            r += audio.samples(t * ch + c).toLong *
              audio.samples((t + lag) * ch + c)
            t += 1
          }
          c += 1
        }
        (rec.media_id, lag.toLong, frames.toLong, ch.toLong, r)
      }
    }).toDF("media_id", "lag", "n_frames", "channels", "autocorr")
  }

  /** Scaled-long DFT twiddle tables for [[audioSpectrogramFixed]] —
    * `cos(n·2πk/N)·scale` (and sin) on the integer lattice via the
    * Chebyshev recurrence
    * `c_{n+1} = (2·c_1·c_n) / scale − c_{n−1}` (TRUNCATING division —
    * Scala's `/` ≡ Spark's `div` ≡ DuckDB's `//` on integers, toward
    * zero) from the single per-bin seed
    * `c_1 = floor(cos(2πk/N)·scale)` (sin likewise). ONE transcendental
    * evaluation per bin, everything after it exact integer arithmetic —
    * so the SQL oracle replays the ENTIRE table from the same
    * interpolated seeds with a recursive CTE (the kmeansCellsFixed
    * arithmetic stance). The recurrence drifts from true cosine by a few
    * low-order bits over a 32-sample frame — immaterial for a
    * spectral-energy FEATURE, and the price of bit-exact replay.
    */
  private[multimodal] def spectralTwiddle(n: Int, bins: Int, scale: Long)
      : (Array[Array[Long]], Array[Array[Long]]) = {
    val cosT = Array.ofDim[Long](bins, n)
    val sinT = Array.ofDim[Long](bins, n)
    var k = 0
    while (k < bins) {
      val (c1, s1) = spectralSeed(n, k, scale)
      cosT(k)(0) = scale
      sinT(k)(0) = 0L
      if (n > 1) { cosT(k)(1) = c1; sinT(k)(1) = s1 }
      var j = 2
      while (j < n) {
        cosT(k)(j) = 2L * c1 * cosT(k)(j - 1) / scale - cosT(k)(j - 2)
        sinT(k)(j) = 2L * c1 * sinT(k)(j - 1) / scale - sinT(k)(j - 2)
        j += 1
      }
      k += 1
    }
    (cosT, sinT)
  }

  /** The per-bin twiddle seeds — `floor(cos(2πk/N)·scale)` and the sin
    * twin: the one place a transcendental runs. Exposed so the oracle
    * builder interpolates the EXACT seeds the engine recurred from.
    */
  private[graft] def spectralSeed(n: Int, k: Int, scale: Long): (Long, Long) =
    (math.floor(math.cos(2 * math.Pi * k / n) * scale).toLong,
      math.floor(math.sin(2 * math.Pi * k / n) * scale).toLong)

  /** Fixed-point SPECTROGRAM over decoded PCM (VERDICT r15 #5 — the
    * standard ASR-prep curation signal the integer family lacked):
    * per channel, non-overlapping `frame`-sample windows (the
    * incomplete tail frame drops, standard framing), and per bin
    * k < `bins` the spectral energy
    * `(Σ s·cos_k / scale)² + (Σ s·sin_k / scale)²` (truncating
    * division again) against the
    * [[spectralTwiddle]] scaled-long tables. 16-bit samples × 2²⁰
    * twiddles over ≤ 2⁵-sample frames keep every sum under 2⁴¹ and
    * every power under 2⁴² — exact, order-free, and therefore
    * replayable bin-for-bin in SQL, unlike any float FFT. One row per
    * (clip, channel, frame, bin) — the flatMap fan-out of the frame
    * demuxers; no shuffle anywhere.
    */
  def audioSpectrogramFixed(media: Dataset[MediaRecord], frame: Int = 32,
                            bins: Int = 17,
                            scale: Long = 1L << 20): DataFrame = {
    require(frame >= 2 && frame <= 4096, s"bad frame $frame")
    require(bins >= 1 && bins <= frame / 2 + 1,
      s"bins $bins must lie in [1, frame/2 + 1]")
    require(scale > 0, s"bad scale $scale")
    import media.sparkSession.implicits._
    val (cosT, sinT) = spectralTwiddle(frame, bins, scale)
    media.mapPartitions(_.flatMap { rec =>
      val audio = Codecs.Wav.decode(rec.content)
      val ch = audio.channels
      val nFrames = audio.frames / frame
      for {
        c <- (0 until ch).iterator
        f <- (0 until nFrames).iterator
        k <- (0 until bins).iterator
      } yield {
        var xr = 0L
        var xi = 0L
        var n = 0
        while (n < frame) {
          val s = audio.samples((f * frame + n) * ch + c).toLong
          xr += s * cosT(k)(n)
          xi += s * sinT(k)(n)
          n += 1
        }
        val a = xr / scale
        val b = xi / scale
        (rec.media_id, c.toLong, f.toLong, k.toLong, a * a + b * b)
      }
    }).toDF("media_id", "channel", "frame_idx", "bin", "power")
  }

  /** Integer triangular FILTERBANK over [[audioSpectrogramFixed]] bins —
    * the mel-filterbank shape ASR pipelines pool spectra with: given
    * `centers` (warped-frequency band centers, geometric-ish by
    * default), band b spans (centers(b−1), centers(b), centers(b+1))
    * with the classic triangle weights, here on the integer lattice:
    * `w(k) = (k−l)·weightScale / (c−l)` rising and
    * `(r−k)·weightScale / (r−c)` falling (truncating division — the
    * [[spectralTwiddle]] arithmetic stance), so band energies
    * `Σ_k w(k)·power(k)` replay bit-exact in SQL. Pure relational plan:
    * one broadcast join against the ≤ |bins|·|bands| literal weight
    * table + one hash aggregation — no per-row lambdas, no shuffle of
    * anything body-sized. Zero-weight band endpoints are dropped from
    * the table so the join fans out only to contributing bins.
    */
  def audioFilterbankFixed(spectro: DataFrame,
                           centers: Seq[Int] = Seq(0, 1, 2, 4, 7, 11, 16),
                           weightScale: Long = 1024L): DataFrame = {
    require(centers.size >= 3, s"need >= 3 centers, got ${centers.size}")
    require(centers == centers.sorted && centers.distinct.size == centers.size,
      s"centers must be strictly ascending: $centers")
    require(weightScale > 0, s"bad weightScale $weightScale")
    val spark = spectro.sparkSession
    import spark.implicits._
    val weights = (1 until centers.size - 1).flatMap { b =>
      val (l, c, r) = (centers(b - 1), centers(b), centers(b + 1))
      (l to r).map { k =>
        val w =
          if (k <= c) (k - l).toLong * weightScale / (c - l)
          else (r - k).toLong * weightScale / (r - c)
        ((b - 1).toLong, k.toLong, w)
      }
    }.filter(_._3 > 0L)
    val wdf = weights.toDF("band", "bin", "w")
    spectro.join(broadcast(wdf), "bin")
      .groupBy(col("media_id"), col("channel"), col("frame_idx"), col("band"))
      .agg(sum(col("power") * col("w")).as("energy"))
  }

  /** The intra-octave log2 threshold ladder for [[audioCepstraFixed]] —
    * `T_f = ceil(2^(20 + f/2^fracBits))`: a normalized mantissa
    * m ∈ [2^20, 2^21) has fractional log2 bucket
    * `frac = #{f ≥ 1 : m ≥ T_f}`. One transcendental per LITERAL table
    * entry (2^fracBits rows), interpolated identically by the oracle
    * builder — the [[spectralSeed]] stance: no per-row libm call ever
    * runs in either engine.
    */
  private[graft] def log2Threshold(f: Int, fracBits: Int): Long =
    math.ceil(math.pow(2.0, 20.0 + f.toDouble / (1L << fracBits))).toLong

  /** DCT-II twiddle seed for [[audioCepstraFixed]]:
    * `floor(cos(π·u·(2b+1)/(2·nBands))·scale)` — one transcendental per
    * (coef, band) literal table entry, oracle-interpolated verbatim.
    */
  private[graft] def cepstralDctSeed(nBands: Int, u: Int, b: Int,
                                     scale: Long): Long =
    math.floor(math.cos(math.Pi * u * (2 * b + 1) / (2.0 * nBands)) * scale)
      .toLong

  /** Integer MFCC-class CEPSTRA over [[audioFilterbankFixed]] bands
    * (VERDICT r16 #5 — the last leg of the classic ASR front end:
    * spectrogram → filterbank → log compression → DCT across bands):
    * per (clip, channel, frame, coef),
    * `cepstrum = Σ_b log2fix(energy_b + 1) · w(coef, b)`.
    *
    * log2fix is a fixed-point base-2 log on the integer lattice:
    * `msb = ⌊log2(e)⌋` counted by 62 power-of-two comparisons, the
    * mantissa normalized to [2^20, 2^21) by one literal-shift CASE, and
    * the fractional part read off the [[log2Threshold]] ladder —
    * `log2fix = msb·2^fracBits + #{f ≥ 1 : m ≥ T_f}`. Every per-row
    * operation is integer compare/shift/divide (truncating — Scala `/`
    * ≡ Spark `div` ≡ DuckDB `//` on positives), so the whole curve
    * replays verbatim in SQL with zero engine-vs-oracle libm drift. The
    * ladder rides a ≤ 2^fracBits-row BROADCAST range join + count
    * instead of a chained per-bit recurrence: a 6-deep self-referencing
    * projection chain would collapse into a ~6^6-node expression
    * (the BPE CollapseProject lesson), while the join form keeps the
    * plan linear and the fan-out bounded by the literal table.
    *
    * The DCT is Σ_b log2fix·[[cepstralDctSeed]] — exact integer against
    * the nCoefs·nBands literal twiddle table (25 entries at the
    * defaults; coef 0 is the log-energy sum, the MFCC c0 convention).
    * Plan shape mirrors the filterbank: closed-form projection → two
    * broadcast joins against literal tables → hash aggregations;
    * nothing body-sized shuffles, no per-row lambdas anywhere.
    */
  def audioCepstraFixed(filterbank: DataFrame, nBands: Int = 5,
                        nCoefs: Int = 4, fracBits: Int = 6,
                        dctScale: Long = 1024L): DataFrame = {
    require(nBands >= 2, s"bad nBands $nBands")
    require(nCoefs >= 1 && nCoefs <= nBands, s"bad nCoefs $nCoefs")
    require(fracBits >= 1 && fracBits <= 12, s"bad fracBits $fracBits")
    require(dctScale > 0, s"bad dctScale $dctScale")
    val spark = filterbank.sparkSession
    import spark.implicits._
    val msb = (1 to 62).map(i =>
      when(col("__e1") >= lit(1L << i), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val norm = filterbank
      .withColumn("__e1", col("energy") + lit(1L))
      .withColumn("__msb", msb)
      .withColumn("__m", expr(
        "CASE WHEN __msb >= 20 THEN __e1 div shiftleft(CAST(1 AS BIGINT), CAST(__msb - 20 AS INT)) " +
          "ELSE __e1 * shiftleft(CAST(1 AS BIGINT), CAST(20 - __msb AS INT)) END"))
    val ladder = (1 until (1 << fracBits))
      .map(f => (f.toLong, log2Threshold(f, fracBits)))
      .toDF("f", "t")
    // inner join keeps every key: msb alone carries frac = 0 rows, so
    // the ladder join is LEFT outer with the count of matched rungs
    val lg = norm
      .join(broadcast(ladder), col("__m") >= col("t"), "left")
      .groupBy(col("media_id"), col("channel"), col("frame_idx"), col("band"))
      .agg((max(col("__msb")) * lit(1L << fracBits) +
        count(col("f"))).as("__loge"))
    val wts = for { u <- 0 until nCoefs; b <- 0 until nBands }
      yield (u.toLong, b.toLong, cepstralDctSeed(nBands, u, b, dctScale))
    val wdf = wts.toDF("band_coef", "band", "w")
    lg.join(broadcast(wdf), "band")
      .groupBy(col("media_id"), col("channel"), col("frame_idx"),
        col("band_coef"))
      .agg(sum(col("__loge") * col("w")).as("cepstrum"))
      .withColumnRenamed("band_coef", "coef")
  }

  /** Integer DELTA features over [[audioCepstraFixed]] (or any
    * per-frame integer feature at (media_id, channel, frame_idx, coef,
    * value) grain) — the temporal-derivative half of the classic
    * MFCC+Δ+ΔΔ ASR feature stack: the standard regression
    * `d_t = Σ_{n=1..N} n·(c_{t+n} − c_{t−n}) div (2·Σ n²)` with
    * repeat-edge padding (t±n clamps to [0, T−1], the textbook
    * convention). Truncating integer division again (Scala `/` ≡ Spark
    * `div` ≡ DuckDB `//` toward zero — including on the NEGATIVE
    * numerators deltas produce), so the whole feature replays verbatim
    * in SQL. Δ of Δ is ΔΔ — apply twice.
    *
    * Plan shape: per-(clip, channel, coef) max-frame window, a literal
    * 2N-row offset fan-out (explode — no join), ONE self equi-join on
    * the clamped partner frame, one hash aggregation. Everything keys
    * on the feature grain — no cartesian, no global window, nothing
    * funnels.
    */
  def audioDeltaFixed(features: DataFrame, n: Int = 2,
                      valueCol: String = "cepstrum"): DataFrame = {
    require(n >= 1 && n <= 8, s"bad delta half-width $n")
    val denom = 2L * (1 to n).map(i => i.toLong * i).sum
    val offsets = array((-n to n).filter(_ != 0).map(o => lit(o.toLong)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id"), col("channel"), col("coef"))
    val src = features.select(col("media_id"), col("channel"),
      col("frame_idx").as("__j"), col("coef"), col(valueCol).as("__cj"))
    features
      .withColumn("__maxf", max(col("frame_idx")).over(w))
      .select(col("media_id"), col("channel"), col("frame_idx"), col("coef"),
        col("__maxf"), explode(offsets).as("__o"))
      .withColumn("__j",
        least(greatest(col("frame_idx") + col("__o"), lit(0L)), col("__maxf")))
      .join(src, Seq("media_id", "channel", "coef", "__j"))
      .groupBy(col("media_id"), col("channel"), col("frame_idx"), col("coef"))
      .agg(expr(s"sum(__o * __cj) div $denom").as("delta"))
  }

  /** The CLASSIC DCT perceptual hash (pHash proper — the average-hash
    * family's [[phash]] stays for feature vectors): grayscale the
    * decoded image, exact box-resize to 32×32, 2-D DCT, keep the 8×8
    * lowest-frequency block, threshold each coefficient at the block's
    * median (DC excluded from the median — it is pure brightness), pack
    * 64 bits. Identical pixels hash identically (the planted-truth
    * invariant); near-identical images land within small Hamming
    * distance, which [[graft.operators.Dedup.hammingBandPairs]] banding
    * then finds without an all-pairs join.
    */
  def dctPhash64(img: Codecs.Image): Long = {
    require(img.width == img.height && img.width >= 32 && img.width % 32 == 0,
      s"dctPhash needs a square 32k-sided image, got ${img.width}x${img.height}")
    val small = boxResize(img, img.width / 32)
    val g = new Array[Double](32 * 32)
    var i = 0
    while (i < 32 * 32) {
      g(i) = ((small.rgb(3 * i) & 0xFF) + (small.rgb(3 * i + 1) & 0xFF) +
        (small.rgb(3 * i + 2) & 0xFF)) / 3.0
      i += 1
    }
    // separable 32-point DCT-II of the top-left 8 frequencies only
    def cos32(x: Int, u: Int): Double = math.cos((2 * x + 1) * u * math.Pi / 64.0)
    val tmp = new Array[Double](8 * 32) // tmp(u)(y) = Σ_x g(y, x) cos(x, u)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 32) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += g(y * 32 + x) * cos32(x, u); x += 1 }
        tmp(u * 32 + y) = s
        y += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 32) { s += tmp(u * 32 + y) * cos32(y, v); y += 1 }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = coef.zipWithIndex.filter(_._2 != 0).map(_._1).sorted
    val median = ac(31) // the true median of the 63 AC values (ADVICE r13)
    var sig = 0L
    i = 0
    while (i < 64) {
      if (i != 0 && coef(i) > median) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** [[dctPhash64]] over PNG payloads as a per-partition decode pass —
    * `(media_id, phash)`, ready for the shared Hamming banding.
    */
  def dctPhashPng(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(rec =>
      (rec.media_id, dctPhash64(Codecs.Png.decode(rec.content)))))
      .toDF("media_id", "phash")
  }

  /** Integer-exact FIR filter over PCM frames — the anti-aliasing step a
    * production resampler runs before decimation, reduced to its
    * closed-form core: per channel,
    * `y[t] = (Σ_i kernel(i) · x[clamp(t + i − center)]) / Σ kernel`
    * with an integer kernel (e.g. [1, 2, 1] — the binomial low-pass),
    * replicate padding at the edges, truncating division (DuckDB's `//`).
    * Composing [[firFilter]] → [[decimateAudio]] gives anti-aliased
    * integer decimation, every sample SQL-replayable.
    */
  def firFilter(audio: Codecs.Audio, kernel: Array[Int]): Codecs.Audio = {
    require(kernel.nonEmpty && kernel.sum > 0, "kernel must have positive mass")
    val ch = audio.channels
    val n = audio.frames
    val c = kernel.length / 2
    val ksum = kernel.sum
    val out = new Array[Short](n * ch)
    var t = 0
    while (t < n) {
      var cc = 0
      while (cc < ch) {
        var s = 0L
        var i = 0
        while (i < kernel.length) {
          val src = math.min(n - 1, math.max(0, t + i - c))
          s += kernel(i).toLong * audio.samples(src * ch + cc)
          i += 1
        }
        out(t * ch + cc) = (s / ksum).toShort
        cc += 1
      }
      t += 1
    }
    Codecs.Audio(audio.sampleRate, ch, out)
  }

  /** The anti-aliased audio chain — WAV decode → [[firFilter]] (binomial
    * [1,2,1]) → exact [[decimateAudio]] → integer stats, every stage
    * closed-form for the oracle.
    */
  def filteredResampleWavStats(media: Dataset[MediaRecord], k: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { rec =>
      val audio = decimateAudio(
        firFilter(Codecs.Wav.decode(rec.content), Array(1, 2, 1)), k)
      var s = 0L
      var i = 0
      while (i < audio.samples.length) { s += audio.samples(i); i += 1 }
      (rec.media_id, audio.sampleRate.toLong, audio.channels.toLong,
        audio.frames.toLong, s)
    }).toDF("media_id", "out_rate", "channels", "out_frames", "sum_samples")
  }

  /** Perceptual-hash signature over a decoded feature vector — the
    * classic average-hash construction (each bit = is feature i above
    * the vector's own mean?), the image-dedup fingerprint pHash-family
    * tools compute from DCT/average intensities. Here it runs over
    * [[extractFeatures]]' output, so the codec stays behind the stub
    * boundary while the hashing is a pure codegen'd expression: one
    * fixed left-to-right mean fold + up to 64 threshold bits packed into
    * a long. Identical payloads decode to identical features and hence
    * identical hashes — the structural invariant mm_phash_dups pins.
    */
  def phash(features: DataFrame, idCol: String = "media_id",
            featCol: String = "features"): DataFrame = {
    val f = transform(col(featCol), x => x.cast("double"))
    val n = size(col(featCol))
    val mean = aggregate(f, lit(0.0), (a, x) => a + x) / n.cast("double")
    val sig = (0 until 64).map(j =>
      when(n > j && element_at(col("__f"), j + 1) > col("__mean"),
        shiftleft(lit(1L), j)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    features
      .withColumn("__f", f).withColumn("__mean", mean)
      .select(col(idCol), sig.as("phash"))
  }

  /** Near-duplicate media pairs by perceptual hash: [[phash]] signatures
    * through the SAME Hamming banding + capped self-join as the text
    * SimHash family ([[graft.operators.Dedup.hammingBandPairs]]) —
    * banded equi-join, never all-pairs. `(id_a, id_b, hamming ≤ maxDist)`.
    */
  def phashNearDuplicates(features: DataFrame, idCol: String = "media_id",
                          featCol: String = "features", maxDist: Int = 3,
                          maxBucket: Int = 10000): DataFrame =
    graft.operators.Dedup.hammingBandPairs(
      phash(features, idCol, featCol), idCol, "phash", maxDist, maxBucket)
}

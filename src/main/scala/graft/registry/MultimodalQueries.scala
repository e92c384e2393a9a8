package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.operators.{Dedup, Grouping, LanguageModel, Pack, Passages, Sampling, SetJoin, Similarity, Skew, Upsert}
import graft.functions.Text
import graft.pipeline.Pipeline
import graft.sources.{Tables, TestdataAdapter}
import graft.transform.Kpis
import graft.validate.{Rules, TableRules}
import graft.EntryFixtures._
import graft.EntryOracles._

/** The Multimodal slice of the SparkEntry registry — binary media columns and the real codecs.
  * Entries are verbatim from the pre-split SparkEntry (VERDICT r11 #8);
  * SparkEntry merges every slice into the driver-contract maps.
  */
private[graft] object MultimodalQueries {

  /** The planted JPEG coefficient field mm_decode_jpeg / mm_decode_jpeg_prog
    * share — basis vectors u, v ∈ {0, 4} only, so the decoded samples are
    * the closed-form integers the shared SQL oracle recomputes.
    */
  private def jpegFixtureCoef(id: Long)(comp: Int, bx: Int, by: Int): Array[Int] = {
    val c = new Array[Int](64)
    if (comp == 0) {
      c(0) = ((id + 3 * bx + 5 * by) % 61 - 30).toInt
      c(4) = ((2 * id + bx + 7 * by) % 21 - 10).toInt
      c(32) = ((3 * id + 11 * bx + by) % 21 - 10).toInt
      c(36) = ((5 * id + bx + by) % 9 - 4).toInt
    } else if (comp == 1)
      c(0) = ((id + 3 * bx + 5 * by) % 31 - 15).toInt
    else
      c(0) = ((2 * id + 7 * bx + by) % 31 - 15).toInt
    c
  }

  /** The mm_exif planted fixture: a decodable JPEG with an APP1/TIFF IFD
    * spliced after SOI per the modulo schedule (both byte orders, every
    * 5th declaring a wrong width, every 7th with no EXIF). Shared with
    * the tolerant twin so the two corpora cannot drift.
    */
  private def exifFixture(id: Long): graft.multimodal.MediaRecord = {
    val q8 = Array.fill(64)(8)
    val qc = Array.fill(64)(8); qc(0) = 16
    val w = (12 + 4 * (id % 5)).toInt
    val h = (12 + 4 * ((id * 3) % 4)).toInt
    val base = graft.multimodal.Jpeg.encodeFromCoefficients(w, h,
      chroma420 = id % 2 == 0, q8, qc, restartInterval = 0,
      jpegFixtureCoef(id))
    val content =
      if (id % 7 == 0) base
      else graft.multimodal.Exif.spliceApp1(base,
        graft.multimodal.Exif.encodeApp1(
          littleEndian = id % 2 == 0,
          orientation = (id % 8 + 1).toInt,
          pixelX = if (id % 5 == 0) w + 1L else w.toLong,
          pixelY = h.toLong))
    graft.multimodal.MediaRecord(id, "image/jpeg", content)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // ---- multimodal columns (§7.5: opaque binary + typed metadata) ----
    "mm_describe" -> ((s, dir) =>
      graft.multimodal.Multimodal.describe(
        Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          lit("text/plain").as("media_type"),
          col("text").cast("binary").as("content")))),
    // The stub decoder is deterministic (feature i = byte[i % len] / 255f),
    // so the whole mapPartitions decode boundary is oracle-checkable: the
    // first feature, scaled back to its byte, must equal the first byte of
    // the content — which DuckDB reads as ascii(text) on this all-ASCII
    // corpus. (The raw float survives the 255× round-trip exactly for all
    // 256 byte values; the rounded float itself doesn't, e.g. byte 80.)
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
        .as[graft.multimodal.MediaRecord]
      graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double") * 255d, 0)
            .cast("integer").as("f0_byte"))
    }),
    // REAL-codec decode (multimodal/Codecs.scala — VERDICT r09 #4): 512
    // synthetic 24-bit BMPs built executor-side from closed-form pixel
    // formulas, encoded by the real encoder (padded bottom-up BGR rows)
    // and re-parsed by the real decoder; the oracle recomputes dimensions,
    // exact file length (header + stride padding), and per-channel pixel
    // SUMS analytically — one wrong byte offset, stride, or row direction
    // anywhere in the codec and the integer sums mismatch.
    "mm_decode_bmp" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/bmp",
          graft.multimodal.Codecs.Bmp.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.bmpStats(media)
    }),
    // Real-codec pixels through the media-dedup chain: 100 base BMPs plus
    // pixel-IDENTICAL twins of ids < 30 at +1e6; real decode → bucketed
    // descriptors → average-hash → Hamming banding. Identical payloads
    // decode to identical features and hence identical hashes, so every
    // planted twin MUST pair at hamming 0 regardless of descriptor
    // quality — the mm_phash_dups structural oracle, now with the real
    // codec (not the stub) behind the boundary.
    "mm_phash_real" -> ((s, dir) => {
      import s.implicits._
      def img(id: Long, seed: Long) = graft.multimodal.MediaRecord(id,
        "image/bmp", graft.multimodal.Codecs.Bmp.encode(16, 16, (x, y) => (
          ((x * 7 + y * 13 + seed * 31) % 256).toInt,
          ((x * 5 + y * 11 + seed * 17) % 256).toInt,
          ((x * 3 + y * 17 + seed * 7) % 256).toInt)))
      val media = s.range(100).map(id => img(id, id))
        .union(s.range(30).map(id => img(id + PlantedOffset, id)))
      val feats = graft.multimodal.Multimodal
        .extractFeaturesBmp(media, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      s.range(30).toDF("media_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
            .select(col("id_a").as("media_id"), lit(true).as("found")),
          Seq("media_id"), "left")
        .select(col("media_id"), coalesce(col("found"), lit(false)).as("found"))
    }),
    // Deterministic AUGMENTATION through the real codec (flip /
    // rotate90 / center-crop by media_id % 3): position-WEIGHTED channel
    // sums pin every pixel to its destination coordinate — a plain sum
    // is permutation-invariant and would pass a no-op flip.
    "mm_augment" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/bmp",
          graft.multimodal.Codecs.Bmp.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.augmentStats(media)
    }),
    // EXIF orientation APPLIED (the display transform mm_exif's metadata
    // demands): all eight orientations over the id schedule, position-
    // weighted sums so a misplaced pixel hash-mismatches.
    "mm_exif_rotate" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/bmp",
          graft.multimodal.Codecs.Bmp.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.exifRotateStats(media)
    }),
    // ... and the audio twin: PCM-16 WAVs through the RIFF chunk walk,
    // with the exact interleaved-sample sum replayed by the oracle.
    "mm_decode_wav" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nSamples = (64 + id % 33).toInt * channels
        val samples = Array.tabulate(nSamples)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.wavStats(media)
    }),
    // 8-bit PCM WAVs (the archival-corpus format): unsigned bytes widen
    // exactly onto the 16-bit lattice as (v − 128)·256 — the oracle
    // recomputes every widened sample from the planted byte formula.
    "mm_decode_wav8" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nSamples = (64 + id % 33).toInt * channels
        val samples = Array.tabulate(nSamples)(i =>
          ((i * 31 + 7 * id) % 256).toInt)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode8(rate, channels, samples))
      }
      graft.multimodal.Multimodal.wavStats(media)
    }),
    // G.711 µ-LAW WAVs (the telephony/call-center corpus format, WAVE
    // fmt 7): each code byte expands through the ITU-T §4.2 integer
    // formula — complement, biased mantissa-shift, sign — so the oracle
    // recomputes every expanded 16-bit sample from the planted byte.
    "mm_decode_mulaw" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nSamples = (64 + id % 33).toInt * channels
        val codes = Array.tabulate(nSamples)(i =>
          ((i * 31 + 7 * id) % 256).toByte)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encodeG711(rate, channels,
            mulaw = true, codes))
      }
      graft.multimodal.Multimodal.wavStats(media)
    }),
    // ...and the A-LAW twin (fmt 6, the E1-world convention): XOR 0x55,
    // segment-0 linear / biased-shift expansion, INVERTED sign bit.
    "mm_decode_alaw" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nSamples = (64 + id % 33).toInt * channels
        val codes = Array.tabulate(nSamples)(i =>
          ((i * 31 + 7 * id) % 256).toByte)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encodeG711(rate, channels,
            mulaw = false, codes))
      }
      graft.multimodal.Multimodal.wavStats(media)
    }),
    // Integer bilinear ×2 UPSCALE on real-decoded PNG pixels: even taps
    // copy, odd taps truncated 2-/4-means with edge clamp; the oracle
    // recomputes every output pixel from the planted source formulas.
    "mm_resize_up2" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.upscale2Stats(media)
    }),
    // Histogram EQUALIZATION on real-decoded PNG pixels: 256-bin gray
    // histogram → cdf → the textbook integer remap; the oracle rebuilds
    // the histogram, cdf, and remap from the planted pixel formulas and
    // must match the equalized sum bit-for-bit.
    "mm_histogram_eq" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.histogramEqualizeStats(media)
    }),
    // IEEE-FLOAT32 WAVs (fmt 3 — the DAW/export format): planted dyadic
    // floats k/32768 (exactly representable) convert round(v·32767)
    // back to exactly k on the 16-bit lattice, so the decode chain —
    // fact-chunk skip included — replays closed-form.
    "mm_decode_wavf" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nSamples = (64 + id % 33).toInt * channels
        val samples = Array.tabulate(nSamples)(i =>
          (((i * 31 + 7 * id) % 32001 - 16000).toFloat / 32768f))
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encodeFloat(rate, channels, samples))
      }
      graft.multimodal.Multimodal.wavStats(media)
    }),
    // Integer-exact audio autocorrelation (Multimodal.audioAutocorrStats):
    // per clip and lag, Σ s[t,c]·s[t+ℓ,c] — the voiced-speech periodicity
    // feature, 64-bit exact and order-free, so the SQL oracle recomputes
    // every product from the planted sample formula (lag 0 = energy).
    "mm_audio_autocorr" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (64 + id % 33).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.audioAutocorrStats(media, Seq(0, 1, 2, 4))
    }),
    // Fixed-point SPECTROGRAM (VERDICT r15 #5 — the ASR-prep spectral
    // signal): per (channel, 32-sample frame, bin) energy against
    // scaled-long DFT twiddles built by the integer Chebyshev recurrence
    // from one floor(cos·2^20) seed per bin. The oracle interpolates the
    // SAME seeds and replays the recurrence (recursive CTE), the framing,
    // and every bin's (xr//S)² + (xi//S)² — closed form end to end.
    "mm_audio_spectral" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (64 + id % 33).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.audioSpectrogramFixed(media)
    }),
    // ...and the triangular FILTERBANK pooled over those bins (the
    // mel-filterbank shape): integer triangle weights from the default
    // geometric-ish centers, one broadcast weight join + one hash agg —
    // band energies replay bit-exact from the same spectral CTE chain.
    "mm_audio_filterbank" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (64 + id % 33).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.audioFilterbankFixed(
        graft.multimodal.Multimodal.audioSpectrogramFixed(media))
    }),
    // ...and the MFCC-class CEPSTRA over those bands (VERDICT r16 #5 —
    // the last leg of the classic ASR front end): fixed-point log2 of
    // each band energy (msb comparisons + the interpolated intra-octave
    // threshold ladder) pooled through the integer DCT-II twiddle table
    // — the whole log→DCT curve replays rung for rung in DuckDB.
    "mm_audio_cepstra" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (64 + id % 33).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.audioCepstraFixed(
        graft.multimodal.Multimodal.audioFilterbankFixed(
          graft.multimodal.Multimodal.audioSpectrogramFixed(media)))
    }),
    // ...and the DELTA features over those cepstra (MFCC+Δ, the
    // temporal-derivative regression with repeat-edge padding and
    // truncating division) — one offset fan-out + one self equi-join on
    // the clamped partner frame, replayed verbatim from the shared
    // cepstra chain.
    "mm_audio_delta" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (64 + id % 33).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.audioDeltaFixed(
        graft.multimodal.Multimodal.audioCepstraFixed(
          graft.multimodal.Multimodal.audioFilterbankFixed(
            graft.multimodal.Multimodal.audioSpectrogramFixed(media))))
    }),
    // The real AUDIO chain — WAV decode → exact ÷4 decimation
    // (per-channel truncated mean of 4 consecutive frames, matching
    // DuckDB's //) → stats of the RESAMPLED clip. Closed-form
    // integers end to end, so the oracle recomputes every decimated
    // sample frame by frame.
    "mm_resample_wav" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (4 * (16 + id % 9)).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.resampleWavStats(media, k = 4)
    }),

    // The FRACTIONAL audio chain (VERDICT r12 #3): PCM-16 at 44.1 kHz →
    // rational 160/441 resample → 16 kHz, every output sample the
    // integer-exact linear interpolation (s[i]·(L−r) + s[i+1]·r) // L at
    // i = (t·441)//160, r = (t·441) % 160 — recomputed sample by sample
    // in the oracle. This closes the integer-only gap in decimateAudio:
    // 44100 → 16000 has no integer factor.
    "mm_resample_rational" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val nFrames = (200 + id % 50).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(44100, channels, samples))
      }
      graft.multimodal.Multimodal.resampleRationalWavStats(media, l = 160, m = 441)
    }),

    // The ANTI-ALIASED audio chain: WAV decode → integer FIR low-pass
    // (binomial [1,2,1], replicate edges, truncating division) → exact
    // ÷4 decimation → stats; every filtered and decimated sample
    // recomputed analytically in the oracle.
    "mm_resample_filtered" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (4 * (16 + id % 9)).toInt
        val samples = Array.tabulate(nFrames * channels)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.filteredResampleWavStats(media, k = 4)
    }),
    // CLASSIC DCT pHash (the published perceptual hash, not the
    // average-hash stub family): PNG decode → box-resize to 32×32 →
    // 2-D DCT → 8×8 low block thresholded at the AC median → 64 bits →
    // the shared Hamming banding. Pixel-identical twins MUST pair at 0.
    "mm_phash_dct" -> ((s, dir) => {
      import s.implicits._
      def img(id: Long, seed: Long) = graft.multimodal.MediaRecord(id,
        "image/png", graft.multimodal.Codecs.Png.encode(64, 64, (x, y) => (
          ((x * 7 + y * 13 + seed * 31) % 256).toInt,
          ((x * 5 + y * 11 + seed * 17) % 256).toInt,
          ((x * 3 + y * 17 + seed * 7) % 256).toInt)))
      val media = s.range(100).map(id => img(id, id))
        .union(s.range(30).map(id => img(id + PlantedOffset, id)))
      val sigs = graft.multimodal.Multimodal.dctPhashPng(media)
      val pairs = graft.operators.Dedup.hammingBandPairs(sigs, "media_id",
        "phash", maxDist = 0)
      s.range(30).toDF("media_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
            .select(col("id_a").as("media_id"), lit(true).as("found")),
          Seq("media_id"), "left")
        .select(col("media_id"), coalesce(col("found"), lit(false)).as("found"))
    }),

    // REAL animated-GIF demux (Codecs.Gif — the multi-frame container
    // that retires the frame stub): full GIF-LZW (variable-width codes,
    // dictionary growth, clear reset) + sub-block framing + extension
    // skipping; 256 planted animations from closed-form per-frame index
    // formulas over the gray palette, so the oracle recomputes every
    // frame's pixel sums analytically — one wrong LZW code width or
    // palette offset and the hashes split.
    "mm_decode_gif" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val w = (8 + id % 5).toInt
        val h = (6 + id % 4).toInt
        val nf = (2 + id % 3).toInt
        val frames = Seq.tabulate(nf) { f =>
          Array.tabulate(w * h) { i =>
            val (x, y) = (i % w, i / w)
            ((x * 7 + y * 13 + f * 29 + id) % 256).toByte
          }
        }
        graft.multimodal.MediaRecord(id, "image/gif",
          graft.multimodal.Codecs.Gif.encode(w, h,
            graft.multimodal.Codecs.Gif.grayPalette, frames))
      }
      graft.multimodal.Multimodal.gifFrameStats(media)
    }),
    // ...and the REAL frame sampler through the downstream image chain:
    // demux every 2nd frame of each animation, re-encode as standalone
    // BMPs (the frameSampleStub contract, now with real codecs on both
    // sides), and run the oracle-verified bmpStats over the output.
    "mm_frames_real" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val w = (8 + id % 5).toInt
        val h = (6 + id % 4).toInt
        val nf = (2 + id % 3).toInt
        val frames = Seq.tabulate(nf) { f =>
          Array.tabulate(w * h) { i =>
            val (x, y) = (i % w, i / w)
            ((x * 7 + y * 13 + f * 29 + id) % 256).toByte
          }
        }
        graft.multimodal.MediaRecord(id, "image/gif",
          graft.multimodal.Codecs.Gif.encode(w, h,
            graft.multimodal.Codecs.Gif.grayPalette, frames))
      }
      graft.multimodal.Multimodal.bmpStats(
        graft.multimodal.Multimodal.sampleFramesGif(media, everyNth = 2))
    }),

    // Real PNG decode (Codecs.Png — VERDICT r11 #4): 512 RGB8 PNGs from
    // closed-form pixel formulas, zlib-deflated with the scanline filter
    // CYCLING y % 5, so every image exercises all five reconstruction
    // filters (None/Sub/Up/Average/Paeth); the oracle recomputes
    // dimensions and per-channel pixel sums analytically. (A deflate
    // stream's length is not closed-form, so n_pixels stands where the
    // BMP twin pins n_bytes.)
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.pngStats(media)
    }),
    // The ADAM7-INTERLACED twin: the same gradient pixels through
    // Codecs.Png.encodeAdam7 (seven independently filtered reduced
    // images, spec scatter) — interlacing is lossless, so the decoded
    // pixels and the analytic oracle are identical to mm_decode_png's.
    "mm_decode_png_adam7" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encodeAdam7(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.pngStats(media)
    }),
    // The real image chain end to end (VERDICT r11 #4: resizeStub
    // replaced): PNG decode → EXACT 2×2 integer box resize → stats.
    // Every output pixel is floor(Σ block / 4), closed-form integer, so
    // the oracle recomputes the downsampled image block by block — a
    // wrong filter predictor, stride, or mean and the sums split.
    "mm_resize_real" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val w = (2 * (4 + id % 5)).toInt
        val h = (2 * (3 + id % 4)).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.resizePngStats(media, k = 2)
    }),
    // mm_phash_real's chain with the REAL RESAMPLER in the middle: PNG
    // decode → 2×2 box resize → bucketed descriptor → average-hash →
    // Hamming banding. Pixel-identical payloads resize to identical
    // pixels, so every planted twin must pair at hamming 0.
    "mm_phash_resized" -> ((s, dir) => {
      import s.implicits._
      def img(id: Long, seed: Long) = graft.multimodal.MediaRecord(id,
        "image/png", graft.multimodal.Codecs.Png.encode(16, 16, (x, y) => (
          ((x * 7 + y * 13 + seed * 31) % 256).toInt,
          ((x * 5 + y * 11 + seed * 17) % 256).toInt,
          ((x * 3 + y * 17 + seed * 7) % 256).toInt)))
      val media = s.range(100).map(id => img(id, id))
        .union(s.range(30).map(id => img(id + PlantedOffset, id)))
      val feats = graft.multimodal.Multimodal
        .extractFeaturesPngResized(media, k = 2, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      s.range(30).toDF("media_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
            .select(col("id_a").as("media_id"), lit(true).as("found")),
          Seq("media_id"), "left")
        .select(col("media_id"), coalesce(col("found"), lit(false)).as("found"))
    }),

    // Real baseline JPEG decode (multimodal/Jpeg.scala — VERDICT r12 #1,
    // the dominant crawled-image format): 256 JPEGs entropy-coded from
    // CHOSEN quantized coefficients on the exact-rational DCT basis
    // (u, v ∈ {0, 4} → IDCT contribution exactly ±F/8), q = 8 luma /
    // DC = 16 chroma, alternating 4:2:0 and 4:4:4 subsampling, restart
    // markers every 2 MCUs on id % 4 == 0 — so the full pipeline
    // (Huffman → dequant → dezigzag → IDCT → upsample → YCbCr→RGB) lands
    // closed-form integer pixels the oracle recomputes analytically.
    // Interop with a REAL foreign codec is pinned separately by JpegSpec
    // (the JDK's ImageIO decoder agrees within IDCT rounding both ways).
    "mm_decode_jpeg" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val q8 = Array.fill(64)(8)
        val qc = Array.fill(64)(8); qc(0) = 16
        val w = (12 + 4 * (id % 5)).toInt
        val h = (12 + 4 * ((id * 3) % 4)).toInt
        graft.multimodal.MediaRecord(id, "image/jpeg",
          graft.multimodal.Jpeg.encodeFromCoefficients(w, h,
            chroma420 = id % 2 == 0, q8, qc,
            restartInterval = if (id % 4 == 0) 2 else 0,
            jpegFixtureCoef(id)))
      }
      graft.multimodal.Multimodal.jpegStats(media)
    }),
    // APP1/EXIF metadata walk (VERDICT r14 #6): JPEGs with a PLANTED TIFF
    // IFD spliced after SOI — both byte orders (even ids II, odd MM), a
    // modulo orientation schedule, every 5th image DECLARING a wrong
    // width (the re-encode tell the mismatch flag exists for), every 7th
    // carrying no EXIF at all. No pixel decode anywhere — the closed-form
    // oracle replays the plant schedule.
    "mm_exif" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Exif.exifMeta(s.range(256).map(id => exifFixture(id)))
    }),
    // The TOLERANT twin (ADVICE r15): the same planted corpus with every
    // 11th-mod-3 record truncated mid-header (a real crawl's corrupt
    // bytes) and every 11th-mod-5 record carrying a T.81 fill byte
    // before its first marker (legal padding real encoders emit). The
    // pass must complete, flag exactly the truncated records malformed
    // with zeroed fields, and parse the fill-padded ones identically —
    // all replayed by the closed-form plant schedule.
    "mm_exif_tolerant" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val rec = exifFixture(id)
        if (id % 11 == 3)
          graft.multimodal.MediaRecord(id, "image/jpeg", rec.content.take(8))
        else if (id % 11 == 5)
          graft.multimodal.MediaRecord(id, "image/jpeg",
            rec.content.take(2) ++ Array(0xFF.toByte) ++ rec.content.drop(2))
        else rec
      }
      graft.multimodal.Exif.exifMetaTolerant(media)
    }),
    // The PROGRESSIVE twin (VERDICT r13 #4): the SAME planted coefficient
    // field encoded as SOF2 — interleaved DC first pass + refinement,
    // per-component spectral bands 1–5 / 6–63 each with an Al=1 first
    // pass and an Ah=1 refinement (EOB runs, ZRLs, correction bits).
    // Successive approximation reconstructs the integers losslessly once
    // Al reaches 0, so the decoded pixels — and the analytic oracle —
    // are byte-identical to the baseline query's.
    "mm_decode_jpeg_prog" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val q8 = Array.fill(64)(8)
        val qc = Array.fill(64)(8); qc(0) = 16
        val w = (12 + 4 * (id % 5)).toInt
        val h = (12 + 4 * ((id * 3) % 4)).toInt
        graft.multimodal.MediaRecord(id, "image/jpeg",
          graft.multimodal.Jpeg.encodeProgressiveFromCoefficients(w, h,
            chroma420 = id % 2 == 0, q8, qc, jpegFixtureCoef(id)))
      }
      graft.multimodal.Multimodal.jpegStats(media)
    }),
    // REAL VIDEO demux (Codecs.Avi — MJPEG in the RIFF/AVI container):
    // 128 planted clips, every frame an independent baseline JPEG from
    // the shared coefficient field at effective id 5·id + 29·f; the full
    // chain — RIFF chunk-tree walk → avih/strh/strf validation → 00dc
    // payload slice → Jpeg.decode — lands on the same analytic pixel
    // oracle as mm_decode_jpeg, extended per frame. One wrong chunk
    // offset, frame order, or header field and the hashes split.
    "mm_decode_avi" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(128).map { id =>
        val q8 = Array.fill(64)(8)
        val qc = Array.fill(64)(8); qc(0) = 16
        val w = (12 + 4 * (id % 5)).toInt
        val h = (12 + 4 * ((id * 3) % 4)).toInt
        val nf = (2 + id % 3).toInt
        val frames = Seq.tabulate(nf) { f =>
          graft.multimodal.Jpeg.encodeFromCoefficients(w, h,
            chroma420 = id % 2 == 0, q8, qc, restartInterval = 0,
            jpegFixtureCoef(5 * id + 29 * f))
        }
        graft.multimodal.MediaRecord(id, "video/avi",
          graft.multimodal.Codecs.Avi.encode(w, h,
            usPerFrame = (33333 + (id % 2) * 6667).toInt, frames))
      }
      graft.multimodal.Multimodal.aviFrameStats(media)
    }),
    // ...and the VIDEO frame sampler (the training-data op: sample every
    // k-th frame of each clip into standalone images): demux → keep
    // f % 2 = 0 → the payloads ARE baseline JPEGs, so jpegStats runs on
    // them verbatim — no transcode between container and image chain.
    "mm_video_sample" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(128).map { id =>
        val q8 = Array.fill(64)(8)
        val qc = Array.fill(64)(8); qc(0) = 16
        val w = (12 + 4 * (id % 5)).toInt
        val h = (12 + 4 * ((id * 3) % 4)).toInt
        val nf = (2 + id % 3).toInt
        val frames = Seq.tabulate(nf) { f =>
          graft.multimodal.Jpeg.encodeFromCoefficients(w, h,
            chroma420 = id % 2 == 0, q8, qc, restartInterval = 0,
            jpegFixtureCoef(5 * id + 29 * f))
        }
        graft.multimodal.MediaRecord(id, "video/avi",
          graft.multimodal.Codecs.Avi.encode(w, h,
            usPerFrame = (33333 + (id % 2) * 6667).toInt, frames))
      }
      graft.multimodal.Multimodal.jpegStats(
        graft.multimodal.Multimodal.sampleFramesAvi(media, everyNth = 2))
    }),
    // INTERLACED GIF (the 4-pass row schedule — GIF's Adam7): the same
    // planted animations as mm_decode_gif encoded with the interlace
    // flag; the reorder is lossless, so the decoded frames — and the
    // analytic oracle — are identical to the sequential query's.
    "mm_decode_gif_interlaced" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val w = (8 + id % 5).toInt
        val h = (6 + id % 4).toInt
        val nf = (2 + id % 3).toInt
        val frames = Seq.tabulate(nf) { f =>
          Array.tabulate(w * h) { i =>
            val (x, y) = (i % w, i / w)
            ((x * 7 + y * 13 + f * 29 + id) % 256).toByte
          }
        }
        graft.multimodal.MediaRecord(id, "image/gif",
          graft.multimodal.Codecs.Gif.encode(w, h,
            graft.multimodal.Codecs.Gif.grayPalette, frames,
            interlaced = true))
      }
      graft.multimodal.Multimodal.gifFrameStats(media)
    }),
    // INDEXED-COLOR PNG (color type 3 + PLTE — the web-graphics format):
    // closed-form palette entries looked up by closed-form indices, the
    // scanline filters running at bpp = 1; the oracle composes the two
    // formulas analytically per pixel.
    "mm_decode_png_palette" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        val pal = new Array[Byte](768)
        var i = 0
        while (i < 256) {
          pal(3 * i) = ((i * 3 + 7) % 256).toByte
          pal(3 * i + 1) = ((i * 5 + 11) % 256).toByte
          pal(3 * i + 2) = ((i * 7 + 13) % 256).toByte
          i += 1
        }
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encodePalette(w, h, pal,
            (x, y) => ((x * 7 + y * 13 + id) % 256).toInt))
      }
      graft.multimodal.Multimodal.pngStats(media)
    }),
    // VIDEO near-dup, end to end: 60 planted clips (3 frames each), ids
    // < 20 duplicated at +PlantedOffset with coefficient-identical
    // frames; AVI demux → frame sample → JPEG decode → bucketed
    // features → average-hash → Hamming banding. Identical payloads
    // hash identically, so all 60 planted FRAME pairs (clip twin ×
    // frame) must pair at distance 0 — the re-upload/mirror detection
    // chain with the video container in front.
    "mm_video_phash_dups" -> ((s, dir) => {
      import s.implicits._
      def clip(id: Long, seed: Long) = {
        val q8 = Array.fill(64)(8)
        val qc = Array.fill(64)(8); qc(0) = 16
        val frames = Seq.tabulate(3) { f =>
          graft.multimodal.Jpeg.encodeFromCoefficients(16, 16,
            chroma420 = true, q8, qc, 0, (comp, bx, by) => {
              val c = new Array[Int](64)
              val sf = seed * 5 + f * 13
              if (comp == 0) {
                c(0) = ((sf * 31 + bx + 2 * by) % 41 - 20).toInt
                c(4) = ((sf * 17 + bx) % 9 - 4).toInt
              } else c(0) =
                ((sf * (if (comp == 1) 7 else 11) + bx + by) % 21 - 10).toInt
              c
            })
        }
        graft.multimodal.MediaRecord(id, "video/avi",
          graft.multimodal.Codecs.Avi.encode(16, 16, 40000, frames))
      }
      val media = s.range(60).map(id => clip(id, id))
        .union(s.range(20).map(id => clip(id + PlantedOffset, id)))
      val frames = graft.multimodal.Multimodal.sampleFramesAvi(media, everyNth = 1)
      val feats = graft.multimodal.Multimodal
        .extractFeaturesJpeg(frames, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal.phashNearDuplicates(feats, maxDist = 0)
      val expected = s.range(20).toDF("clip")
        .select(col("clip"), explode(array(lit(0L), lit(1L), lit(2L))).as("f"))
        .select((col("clip") * 100000 + col("f")).as("frame_id"))
      expected
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset * 100000L)
            .select(col("id_a").as("frame_id"), lit(true).as("found")),
          Seq("frame_id"), "left")
        .select(col("frame_id"), coalesce(col("found"), lit(false)).as("found"))
    }),
    // mm_phash_real's chain with the JPEG decoder behind the boundary:
    // coefficient-identical JPEGs decode to identical pixels, so every
    // planted twin must pair at hamming 0.
    "mm_phash_jpeg" -> ((s, dir) => {
      import s.implicits._
      def img(id: Long, seed: Long) = {
        val q8 = Array.fill(64)(8)
        val qc = Array.fill(64)(8); qc(0) = 16
        graft.multimodal.MediaRecord(id, "image/jpeg",
          graft.multimodal.Jpeg.encodeFromCoefficients(16, 16,
            chroma420 = true, q8, qc, 0, (comp, bx, by) => {
              val c = new Array[Int](64)
              if (comp == 0) {
                c(0) = ((seed * 31 + bx + 2 * by) % 41 - 20).toInt
                c(4) = ((seed * 17 + bx) % 9 - 4).toInt
              } else c(0) =
                ((seed * (if (comp == 1) 7 else 11) + bx + by) % 21 - 10).toInt
              c
            }))
      }
      val media = s.range(100).map(id => img(id, id))
        .union(s.range(30).map(id => img(id + PlantedOffset, id)))
      val feats = graft.multimodal.Multimodal
        .extractFeaturesJpeg(media, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      s.range(30).toDF("media_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
            .select(col("id_a").as("media_id"), lit(true).as("found")),
          Seq("media_id"), "left")
        .select(col("media_id"), coalesce(col("found"), lit(false)).as("found"))
    }),

    // Perceptual-hash media dedup (Multimodal.phash + the shared Hamming
    // banding): planted byte-identical payloads decode (stub) to
    // identical features, hence identical average-hash bits — every
    // planted pair MUST surface at hamming 0 regardless of how crude the
    // stub decode is. Codec stays stubbed; hashing and banding are the
    // production expressions.
    "mm_phash_dups" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.unionByName(
        exactCopy(docs.filter(col("doc_id") < 50), PlantedOffset))
      val media = planted.select(col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
        .as[graft.multimodal.MediaRecord]
      val feats = graft.multimodal.Multimodal
        .extractFeatures(media, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      val base = docs.filter(col("doc_id") < 50).select(col("doc_id"))
      base.join(pairs, base("doc_id") === pairs("id_a") &&
          pairs("id_b") === base("doc_id") + PlantedOffset, "left_semi")
        .select(col("doc_id"), lit(true).as("found"))
    }),

    // Frame sampling through the stub demuxer (fixed-size frames, every
    // 2nd kept): deterministic record fan-out, so frame ids and sizes are
    // DuckDB-replicable — the flatMap decode boundary under the oracle.
    "mm_frames" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
        .as[graft.multimodal.MediaRecord]
      graft.multimodal.Multimodal.sampleFrames(media, frameBytes = 32, everyNth = 2)
        .toDF()
        .select(col("media_id").as("frame_id"),
          length(col("content")).as("n_bytes"))
    }))

  /** The shared mm_decode_jpeg / mm_decode_jpeg_prog replay: the
    * planted basis-vector coefficients reconstruct losslessly in both
    * modes, so one analytic pixel statement answers both queries.
    */
  private val sqlDecodeJpeg: String =
"""WITH dims AS (SELECT id, 12 + 4*(id % 5) AS w, 12 + 4*((id*3) % 4) AS h,
                              (id % 2 = 0) AS sub
                       FROM (SELECT unnest(range(0, 256)) AS id)),
         px AS (
           SELECT id, w, h,
             128 + ((id + 3*(x//8) + 5*(y//8)) % 61 - 30)
                 + (CASE WHEN (x%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * ((2*id + (x//8) + 7*(y//8)) % 21 - 10)
                 + (CASE WHEN (y%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * ((3*id + 11*(x//8) + (y//8)) % 21 - 10)
                 + (CASE WHEN (x%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * (CASE WHEN (y%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * ((5*id + (x//8) + (y//8)) % 9 - 4) AS yv,
             2 * ((id + 3*(CASE WHEN sub THEN x//16 ELSE x//8 END)
                      + 5*(CASE WHEN sub THEN y//16 ELSE y//8 END)) % 31 - 15) AS cbv,
             2 * ((2*id + 7*(CASE WHEN sub THEN x//16 ELSE x//8 END)
                       + (CASE WHEN sub THEN y//16 ELSE y//8 END)) % 31 - 15) AS crv
           FROM dims, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y))
         SELECT id AS media_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(w * h AS BIGINT) AS n_pixels,
                CAST(SUM(greatest(0, least(255, round(yv + 1.402 * crv)))) AS BIGINT) AS sum_r,
                CAST(SUM(greatest(0, least(255, round(yv - 0.344136 * cbv - 0.714136 * crv)))) AS BIGINT) AS sum_g,
                CAST(SUM(greatest(0, least(255, round(yv + 1.772 * cbv)))) AS BIGINT) AS sum_b
         FROM px GROUP BY 1, 2, 3, 4"""

  /** The shared per-frame pixel CTEs for the AVI queries: the
    * mm_decode_jpeg analytic reconstruction at effective id e = 5·id +
    * 29·f, one frame dimension deeper. `frameFilter` restricts which
    * frames survive (the sampler keeps f % 2 = 0).
    */
  private def sqlAviPixels(frameFilter: String): String =
s"""WITH dims AS (SELECT id, 12 + 4*(id % 5) AS w, 12 + 4*((id*3) % 4) AS h,
                              2 + id % 3 AS nf, (id % 2 = 0) AS sub,
                              33333 + (id % 2) * 6667 AS uspf
                       FROM (SELECT unnest(range(0, 128)) AS id)),
         fr AS (SELECT id, w, h, nf, sub, uspf, f, 5*id + 29*f AS e
                FROM dims, unnest(range(0, nf)) AS uf(f)
                WHERE $frameFilter),
         px AS (
           SELECT id, f, w, h, nf, uspf,
             128 + ((e + 3*(x//8) + 5*(y//8)) % 61 - 30)
                 + (CASE WHEN (x%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * ((2*e + (x//8) + 7*(y//8)) % 21 - 10)
                 + (CASE WHEN (y%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * ((3*e + 11*(x//8) + (y//8)) % 21 - 10)
                 + (CASE WHEN (x%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * (CASE WHEN (y%8)%4 IN (0,3) THEN 1 ELSE -1 END)
                   * ((5*e + (x//8) + (y//8)) % 9 - 4) AS yv,
             2 * ((e + 3*(CASE WHEN sub THEN x//16 ELSE x//8 END)
                      + 5*(CASE WHEN sub THEN y//16 ELSE y//8 END)) % 31 - 15) AS cbv,
             2 * ((2*e + 7*(CASE WHEN sub THEN x//16 ELSE x//8 END)
                       + (CASE WHEN sub THEN y//16 ELSE y//8 END)) % 31 - 15) AS crv
           FROM fr, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y))"""

  /** The shared mm_decode_png / mm_decode_png_adam7 replay —
    * interlacing is lossless, one analytic statement answers both.
    */
  private val sqlDecodePng: String =
    """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                       FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(w * h AS BIGINT) AS n_pixels,
                CAST(SUM((x * 7 + y * 13 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 5 + y * 11 + 2 * id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 3 + y * 17 + 3 * id) % 256) AS BIGINT) AS sum_b
         FROM dims, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4"""

  /** The shared spectral CTE chain for mm_audio_spectral and
    * mm_audio_filterbank: the engine's twiddle SEEDS interpolated
    * verbatim, the Chebyshev recurrence replayed by a recursive CTE
    * (Scala / ≡ DuckDB // — both truncate toward zero on integers),
    * framing over the planted sample formula, per-bin complex sums, and
    * the squared scaled magnitudes as `pw(id, c, f, k, power)`.
    */
  private lazy val sqlSpectralPower: String = {
    val scale = 1L << 20
    val seeds = (0 until 17).map { k =>
      val (c1, s1) = graft.multimodal.Multimodal.spectralSeed(32, k, scale)
      s"($k, $c1, $s1)"
    }.mkString(", ")
    s"""WITH RECURSIVE
       seeds AS (SELECT k, CAST(c1 AS BIGINT) AS c1, CAST(s1 AS BIGINT) AS s1
                 FROM (VALUES $seeds) v(k, c1, s1)),
       tw(k, j, cc, cp, sc, sp) AS (
         SELECT k, 1, c1, CAST($scale AS BIGINT), s1, CAST(0 AS BIGINT)
         FROM seeds
         UNION ALL
         SELECT t.k, t.j + 1,
                (2 * s.c1 * t.cc) // $scale - t.cp, t.cc,
                (2 * s.c1 * t.sc) // $scale - t.sp, t.sc
         FROM tw t JOIN seeds s ON s.k = t.k WHERE t.j < 31),
       tww AS (SELECT k, 0 AS j, CAST($scale AS BIGINT) AS c,
                      CAST(0 AS BIGINT) AS s FROM seeds
               UNION ALL SELECT k, j, cc, sc FROM tw),
       clips AS (SELECT id, 1 + id % 2 AS ch, (64 + id % 33) // 32 AS nf
                 FROM range(256) t(id)),
       px AS (SELECT cl.id, c, f, n,
                (((f * 32 + n) * cl.ch + c) * 31 + 7 * cl.id) % 65536
                  - 32768 AS sv
              FROM clips cl,
                   unnest(range(0, cl.ch)) AS uc(c),
                   unnest(range(0, cl.nf)) AS uf(f),
                   unnest(range(0, 32)) AS un(n)),
       xb AS (SELECT p.id, p.c, p.f, w.k,
                SUM(p.sv * w.c) AS xr, SUM(p.sv * w.s) AS xi
              FROM px p JOIN tww w ON w.j = p.n
              GROUP BY 1, 2, 3, 4),
       pw AS (SELECT id, c, f, k,
                (xr // $scale) * (xr // $scale)
                  + (xi // $scale) * (xi // $scale) AS power
              FROM xb)"""
  }


  /** The filterbank CTE chain — [[sqlSpectralPower]] plus the engine's
    * center-sequence triangle weights and the weighted band sums, ending
    * in `fb(id, channel, f, band, energy)`. Shared verbatim by
    * mm_audio_filterbank and mm_audio_cepstra.
    */
  private lazy val sqlFilterbankEnergy: String = {
    val centers = Seq(0, 1, 2, 4, 7, 11, 16)
    val triples = (1 until centers.size - 1).map(b =>
      s"(${b - 1}, ${centers(b - 1)}, ${centers(b)}, ${centers(b + 1)})")
      .mkString(", ")
    s"""$sqlSpectralPower,
       bands AS (SELECT band, CAST(l AS BIGINT) AS l, CAST(c AS BIGINT) AS c,
                        CAST(r AS BIGINT) AS r
                 FROM (VALUES $triples) v(band, l, c, r)),
       wts AS (SELECT band, k AS bin,
                 CASE WHEN k <= c THEN ((k - l) * 1024) // (c - l)
                      ELSE ((r - k) * 1024) // (r - c) END AS w
               FROM bands, unnest(range(l, r + 1)) AS uk(k)),
       fb AS (SELECT p.id, p.c AS channel, p.f, w.band,
                SUM(p.power * w.w) AS energy
              FROM pw p JOIN wts w ON w.bin = p.k AND w.w > 0
              GROUP BY 1, 2, 3, 4)"""
  }

  /** The cepstra CTE chain — [[sqlFilterbankEnergy]] plus the
    * fixed-point log2 curve (msb comparisons, the mantissa-normalizing
    * CASE, the interpolated threshold ladder) and the integer DCT,
    * ending in `cp(id, channel, f, coef, cepstrum)`. Shared verbatim by
    * mm_audio_cepstra and mm_audio_delta.
    */
  private lazy val sqlCepstra: String = {
    val ladder = (1 until 64).map(f =>
      s"($f, ${graft.multimodal.Multimodal.log2Threshold(f, 6)})")
      .mkString(", ")
    val dct = (for { u <- 0 until 4; b <- 0 until 5 } yield
      s"($u, $b, ${graft.multimodal.Multimodal.cepstralDctSeed(5, u, b, 1024L)})")
      .mkString(", ")
    s"""$sqlFilterbankEnergy,
       e1 AS (SELECT id, channel, f, band, energy + 1 AS e1 FROM fb),
       ms AS (SELECT *, list_sum([CASE WHEN e1 >= (CAST(1 AS BIGINT) << i)
                                       THEN 1 ELSE 0 END
                                  FOR i IN range(1, 63)]) AS msb FROM e1),
       nm AS (SELECT *, CASE WHEN msb >= 20
                  THEN e1 // (CAST(1 AS BIGINT) << CAST(msb - 20 AS INTEGER))
                  ELSE e1 * (CAST(1 AS BIGINT) << CAST(20 - msb AS INTEGER))
                END AS m FROM ms),
       th AS (SELECT f AS rung, CAST(t AS BIGINT) AS t
              FROM (VALUES $ladder) v(f, t)),
       lg AS (SELECT id, channel, f, band,
                MAX(msb) * 64 + COUNT(th.rung) AS loge
              FROM nm LEFT JOIN th ON nm.m >= th.t
              GROUP BY 1, 2, 3, 4),
       dw AS (SELECT coef, band, CAST(w AS BIGINT) AS w
              FROM (VALUES $dct) v(coef, band, w)),
       cp AS (SELECT id, channel, f, coef, SUM(loge * w) AS cepstrum
              FROM lg JOIN dw USING (band)
              GROUP BY 1, 2, 3, 4)"""
  }

  val oracleSql: Map[String, String] = Map(

    "mm_describe" ->
      """SELECT doc_id AS media_id, 'text/plain' AS media_type,
                CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
                sha256(text) AS content_sha
         FROM documents""",
    "mm_frames" ->
      """WITH d AS (SELECT doc_id, CAST(text AS BLOB) AS b FROM documents),
         f AS (SELECT doc_id, octet_length(b) AS len,
                      unnest(generate_series(0, CAST(ceil(octet_length(b) / 32.0) AS INTEGER) - 1)) AS i
               FROM d)
         SELECT doc_id * 100000 + i AS frame_id,
                CAST(least(32, len - i * 32) AS INTEGER) AS n_bytes
         FROM f WHERE i % 2 = 0""",
    "mm_features" ->
      """SELECT doc_id AS media_id,
                CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
                CAST(ascii(text) AS INTEGER) AS f0_byte
         FROM documents""",
    // planted-payload truth: byte-identical media must pair at hamming 0
    "mm_phash_dups" ->
      "SELECT doc_id, true AS found FROM documents WHERE doc_id < 50",
    // real-codec BMP: dimensions, exact padded file length, and
    // per-channel pixel sums recomputed analytically from the generator
    // formulas — the encode→parse roundtrip must land every byte
    "mm_decode_bmp" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                       FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
                CAST(SUM((x * 7 + y * 13 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 5 + y * 11 + 2 * id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 3 + y * 17 + 3 * id) % 256) AS BIGINT) AS sum_b
         FROM dims, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4""",
    // planted-payload truth through the REAL codec: pixel-identical BMPs
    // must pair at hamming 0
    "mm_phash_real" ->
      """SELECT id AS media_id, true AS found
         FROM (SELECT unnest(range(0, 30)) AS id)""",
    // real-codec WAV: fmt-chunk fields + the exact interleaved PCM-16
    // sample sum
    "mm_decode_wav" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(44 + frames * ch * 2 AS BIGINT) AS n_bytes,
                CAST(SUM((i * 31 + 7 * id) % 65536 - 32768) AS BIGINT) AS sum_samples
         FROM clips, unnest(range(0, frames * ch)) AS ui(i)
         GROUP BY 1, 2, 3, 4, 5""",
    // 8-bit PCM: unsigned planted bytes widened (v − 128)·256, the
    // word-aligned RIFF padding in the byte count
    "mm_decode_wav8" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(44 + frames * ch + (frames * ch) % 2 AS BIGINT) AS n_bytes,
                CAST(SUM(((i * 31 + 7 * id) % 256 - 128) * 256) AS BIGINT) AS sum_samples
         FROM clips, unnest(range(0, frames * ch)) AS ui(i)
         GROUP BY 1, 2, 3, 4, 5""",
    // every upscaled tap (copy / 2-mean / 4-mean, edge-clamped)
    // recomputed from the planted source formulas
    "mm_resize_up2" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                         FROM (SELECT unnest(range(0, 512)) AS id)),
          o AS (SELECT id, w, h, xx, yy, xx//2 AS sx, yy//2 AS sy,
                   LEAST(xx//2 + 1, w - 1) AS sx2, LEAST(yy//2 + 1, h - 1) AS sy2
                FROM dims, unnest(range(0, 2*w)) AS ux(xx), unnest(range(0, 2*h)) AS uy(yy))
          SELECT id AS media_id, CAST(2*w AS BIGINT) AS width, CAST(2*h AS BIGINT) AS height,
                 CAST(SUM(CASE WHEN xx%2=0 AND yy%2=0 THEN ((sx)*7+(sy)*13+id)%256
                WHEN yy%2=0 THEN (((sx)*7+(sy)*13+id)%256 + ((sx2)*7+(sy)*13+id)%256)//2
                WHEN xx%2=0 THEN (((sx)*7+(sy)*13+id)%256 + ((sx)*7+(sy2)*13+id)%256)//2
                ELSE (((sx)*7+(sy)*13+id)%256 + ((sx2)*7+(sy)*13+id)%256 + ((sx)*7+(sy2)*13+id)%256 + ((sx2)*7+(sy2)*13+id)%256)//4 END) AS BIGINT) AS sum_r,
                 CAST(SUM(CASE WHEN xx%2=0 AND yy%2=0 THEN ((sx)*5+(sy)*11+2*id)%256
                WHEN yy%2=0 THEN (((sx)*5+(sy)*11+2*id)%256 + ((sx2)*5+(sy)*11+2*id)%256)//2
                WHEN xx%2=0 THEN (((sx)*5+(sy)*11+2*id)%256 + ((sx)*5+(sy2)*11+2*id)%256)//2
                ELSE (((sx)*5+(sy)*11+2*id)%256 + ((sx2)*5+(sy)*11+2*id)%256 + ((sx)*5+(sy2)*11+2*id)%256 + ((sx2)*5+(sy2)*11+2*id)%256)//4 END) AS BIGINT) AS sum_g,
                 CAST(SUM(CASE WHEN xx%2=0 AND yy%2=0 THEN ((sx)*3+(sy)*17+3*id)%256
                WHEN yy%2=0 THEN (((sx)*3+(sy)*17+3*id)%256 + ((sx2)*3+(sy)*17+3*id)%256)//2
                WHEN xx%2=0 THEN (((sx)*3+(sy)*17+3*id)%256 + ((sx)*3+(sy2)*17+3*id)%256)//2
                ELSE (((sx)*3+(sy)*17+3*id)%256 + ((sx2)*3+(sy)*17+3*id)%256 + ((sx)*3+(sy2)*17+3*id)%256 + ((sx2)*3+(sy2)*17+3*id)%256)//4 END) AS BIGINT) AS sum_b
          FROM o GROUP BY 1, 2, 3""",
    // histogram, cdf, and the integer remap rebuilt from the planted
    // pixel formulas
    "mm_histogram_eq" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                FROM (SELECT unnest(range(0, 512)) AS id)),
         px AS (SELECT id, w, h,
                  ((x*7+y*13+id)%256 + (x*5+y*11+2*id)%256
                   + (x*3+y*17+3*id)%256) // 3 AS gray
                FROM dims, unnest(range(0, w)) AS ux(x),
                     unnest(range(0, h)) AS uy(y)),
         hist AS (SELECT id, w, h, gray, COUNT(*) AS c FROM px GROUP BY 1,2,3,4),
         cdf AS (SELECT id, w, h, gray, c,
                   SUM(c) OVER (PARTITION BY id ORDER BY gray) AS cdf FROM hist),
         st AS (SELECT id, MIN(cdf) AS cdfmin, MAX(cdf) AS n FROM cdf GROUP BY id),
         eq AS (SELECT c.id, c.w, c.h, c.c,
                  CASE WHEN s.n > s.cdfmin
                       THEN (c.cdf - s.cdfmin) * 255 // (s.n - s.cdfmin)
                       ELSE 0 END AS v
                FROM cdf c JOIN st s ON c.id = s.id)
         SELECT id AS media_id, CAST(w*h AS BIGINT) AS n_pixels,
                CAST(COUNT(*) AS BIGINT) AS n_levels,
                CAST(SUM(c * v) AS BIGINT) AS sum_eq
         FROM eq GROUP BY 1, 2""",
    // dyadic floats k/32768 round back to exactly k; fact chunk + 4-byte
    // samples in the byte count
    "mm_decode_wavf" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(44 + 12 + frames * ch * 4 AS BIGINT) AS n_bytes,
                CAST(SUM((i * 31 + 7 * id) % 32001 - 16000) AS BIGINT) AS sum_samples
         FROM clips, unnest(range(0, frames * ch)) AS ui(i)
         GROUP BY 1, 2, 3, 4, 5""",
    // every lag's product sum recomputed from the planted sample formula
    // the spectrogram: the engine's twiddle SEEDS interpolated verbatim,
    // the Chebyshev recurrence replayed by a recursive CTE (Scala / ≡
    // DuckDB // — both truncate toward zero on integers), then framing,
    // per-bin sums, and the squared scaled magnitudes
    "mm_audio_spectral" ->
      s"""$sqlSpectralPower
         SELECT id AS media_id, CAST(c AS BIGINT) AS channel,
                CAST(f AS BIGINT) AS frame_idx, CAST(k AS BIGINT) AS bin,
                CAST(power AS BIGINT) AS power
         FROM pw""",
    // the filterbank: band triples interpolated from the engine's center
    // sequence, the integer triangle weights replayed with truncating //,
    // zero-weight endpoints dropped, then the weighted band sums
    "mm_audio_filterbank" ->
      s"""$sqlFilterbankEnergy
         SELECT id AS media_id, CAST(channel AS BIGINT) AS channel,
                CAST(f AS BIGINT) AS frame_idx, CAST(band AS BIGINT) AS band,
                CAST(energy AS BIGINT) AS energy
         FROM fb""",
    // the cepstra: the fixed-point log2 curve replayed rung for rung
    // (msb by power comparisons, the mantissa-normalizing CASE with
    // truncating //, the interpolated ceil(2^(20+f/64)) ladder literals)
    // and the integer DCT against the interpolated floor(cos·1024)
    // twiddle table — closed form end to end, no libm call at row grain
    // in either engine
    "mm_audio_cepstra" ->
      s"""$sqlCepstra
         SELECT id AS media_id, CAST(channel AS BIGINT) AS channel,
                CAST(f AS BIGINT) AS frame_idx, CAST(coef AS BIGINT) AS coef,
                CAST(cepstrum AS BIGINT) AS cepstrum
         FROM cp""",
    // the delta features: repeat-edge clamped partner frames, the ±n
    // offset fan-out, the n-weighted sum and the truncating //10 — the
    // regression replays verbatim over the shared cepstra chain
    // (DuckDB // truncates toward zero like Spark div, NEGATIVE
    // numerators included — the r16 floorDiv lesson)
    "mm_audio_delta" ->
      s"""$sqlCepstra,
         mf AS (SELECT id, channel, coef, MAX(f) AS maxf
                FROM cp GROUP BY 1, 2, 3),
         ex AS (SELECT cp.id, cp.channel, cp.f, cp.coef, o,
                  least(greatest(cp.f + o, 0), mf.maxf) AS j
                FROM cp
                JOIN mf ON mf.id = cp.id AND mf.channel = cp.channel
                       AND mf.coef = cp.coef,
                     unnest([-2, -1, 1, 2]) AS uo(o)),
         dl AS (SELECT ex.id, ex.channel, ex.f, ex.coef,
                  SUM(ex.o * c2.cepstrum) // 10 AS delta
                FROM ex JOIN cp c2
                  ON c2.id = ex.id AND c2.channel = ex.channel
                 AND c2.coef = ex.coef AND c2.f = ex.j
                GROUP BY 1, 2, 3, 4)
         SELECT id AS media_id, CAST(channel AS BIGINT) AS channel,
                CAST(f AS BIGINT) AS frame_idx, CAST(coef AS BIGINT) AS coef,
                CAST(delta AS BIGINT) AS delta
         FROM dl""",
    "mm_audio_autocorr" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch, 64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 256)) AS id)),
         lg AS (SELECT id, ch, frames, lag
                FROM clips, unnest([0, 1, 2, 4]) AS ul(lag)),
         pr AS (SELECT id, ch, frames, lag,
                  ((t * ch + c) * 31 + 7 * id) % 65536 - 32768 AS a,
                  (((t + lag) * ch + c) * 31 + 7 * id) % 65536 - 32768 AS b
                FROM lg, unnest(range(0, frames)) AS ut(t),
                     unnest(range(0, ch)) AS uc(c)
                WHERE t + lag < frames)
         SELECT id AS media_id, CAST(lag AS BIGINT) AS lag,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(ch AS BIGINT) AS channels,
                CAST(SUM(a * b) AS BIGINT) AS autocorr
         FROM pr GROUP BY 1, 2, 3, 4""",
    // G.711 µ-law: the ITU expansion replayed on the planted code byte —
    // u = ~b, t = (8·mant + 132) << exp, sample = ±(t − 132)
    "mm_decode_mulaw" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 512)) AS id)),
         ex AS (SELECT id, ch, rate, frames,
                  255 - ((i * 31 + 7 * id) % 256) AS u
                FROM clips, unnest(range(0, frames * ch)) AS ui(i)),
         sm AS (SELECT id, ch, rate, frames,
                  CASE WHEN u >= 128
                       THEN 132 - (((u % 16) * 8 + 132) << ((u // 16) % 8))
                       ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
                  END AS v
                FROM ex)
         SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(44 + frames * ch + (frames * ch) % 2 AS BIGINT) AS n_bytes,
                CAST(SUM(v) AS BIGINT) AS sum_samples
         FROM sm GROUP BY 1, 2, 3, 4, 5""",
    // G.711 A-law: n = b XOR 0x55; seg 0 linear, seg 1 biased, seg ≥ 2
    // shifted; set top bit = POSITIVE (inverted vs µ-law)
    "mm_decode_alaw" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 512)) AS id)),
         ex AS (SELECT id, ch, rate, frames,
                  xor((i * 31 + 7 * id) % 256, 85) AS a
                FROM clips, unnest(range(0, frames * ch)) AS ui(i)),
         mg AS (SELECT id, ch, rate, frames, a,
                  CASE (a // 16) % 8
                    WHEN 0 THEN (a % 16) * 16 + 8
                    WHEN 1 THEN (a % 16) * 16 + 264
                    ELSE ((a % 16) * 16 + 264) << ((a // 16) % 8 - 1)
                  END AS t
                FROM ex)
         SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(44 + frames * ch + (frames * ch) % 2 AS BIGINT) AS n_bytes,
                CAST(SUM(CASE WHEN a >= 128 THEN t ELSE -t END) AS BIGINT) AS sum_samples
         FROM mg GROUP BY 1, 2, 3, 4, 5""",
    // real GIF demux: every frame's gray pixel sums recomputed from the
    // planted index formulas (palette r = g = b = index)
    "mm_decode_gif" ->
      """WITH dims AS (SELECT id, 8 + id % 5 AS w, 6 + id % 4 AS h,
                              2 + id % 3 AS nf
                       FROM (SELECT unnest(range(0, 256)) AS id))
         SELECT id AS media_id, CAST(f AS BIGINT) AS frame_idx,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_b
         FROM dims, unnest(range(0, nf)) AS uf(f),
              unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4, 5""",
    // lossless 4-pass row reorder: identical frames, identical oracle
    "mm_decode_gif_interlaced" ->
      """WITH dims AS (SELECT id, 8 + id % 5 AS w, 6 + id % 4 AS h,
                              2 + id % 3 AS nf
                       FROM (SELECT unnest(range(0, 256)) AS id))
         SELECT id AS media_id, CAST(f AS BIGINT) AS frame_idx,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_b
         FROM dims, unnest(range(0, nf)) AS uf(f),
              unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4, 5""",
    // demux -> keep every 2nd frame -> re-encode BMP -> bmpStats: the
    // kept frames' ids, padded BMP lengths, and pixel sums closed-form
    "mm_frames_real" ->
      """WITH dims AS (SELECT id, 8 + id % 5 AS w, 6 + id % 4 AS h,
                              2 + id % 3 AS nf
                       FROM (SELECT unnest(range(0, 256)) AS id)),
         kept AS (SELECT id, w, h, f
                  FROM dims, unnest(range(0, nf)) AS uf(f) WHERE f % 2 = 0)
         SELECT CAST(id * 100000 + f AS BIGINT) AS media_id,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 7 + y * 13 + f * 29 + id) % 256) AS BIGINT) AS sum_b
         FROM kept, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4""",
    // decode -> exact /4 decimation -> stats: every decimated sample is
    // the truncated mean over 4 frames per channel, recomputed analytically
    "mm_resample_wav" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               4 * (16 + id % 9) AS frames
                        FROM (SELECT unnest(range(0, 256)) AS id)),
         dec AS (SELECT id, ch, rate, frames // 4 AS out_frames, t, c,
                   SUM((((4 * t + j) * ch + c) * 31 + 7 * id) % 65536 - 32768) // 4 AS v
                 FROM clips,
                      unnest(range(0, frames // 4)) AS ut(t),
                      unnest(range(0, ch)) AS uc(c),
                      unnest(range(0, 4)) AS uj(j)
                 GROUP BY 1, 2, 3, 4, 5, 6)
         SELECT id AS media_id, CAST(rate // 4 AS BIGINT) AS out_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(out_frames AS BIGINT) AS out_frames,
                CAST(SUM(v) AS BIGINT) AS sum_samples
         FROM dec GROUP BY 1, 2, 3, 4""",
    // decode → rational 160/441 resample → stats: every output sample is
    // the truncating linear interpolation between its two input frames,
    // recomputed analytically (i = (t·441)//160, r = (t·441) % 160)
    "mm_resample_rational" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch, 200 + id % 50 AS frames
                        FROM (SELECT unnest(range(0, 256)) AS id)),
         outs AS (SELECT id, ch, frames,
                         ((frames - 1) * 160) // 441 + 1 AS outf FROM clips),
         samp AS (SELECT id, ch, outf, t, c,
                         (t * 441) // 160 AS i, (t * 441) % 160 AS r
                  FROM outs, unnest(range(0, outf)) AS ut(t),
                       unnest(range(0, ch)) AS uc(c)),
         vals AS (SELECT id, ch, outf, t, c,
             CASE WHEN r = 0
               THEN ((i * ch + c) * 31 + 7 * id) % 65536 - 32768
               ELSE ((((i * ch + c) * 31 + 7 * id) % 65536 - 32768) * (160 - r)
                   + ((((i + 1) * ch + c) * 31 + 7 * id) % 65536 - 32768) * r) // 160
             END AS v
           FROM samp)
         SELECT id AS media_id, CAST(16000 AS BIGINT) AS out_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(outf AS BIGINT) AS out_frames,
                CAST(SUM(v) AS BIGINT) AS sum_samples
         FROM vals GROUP BY 1, 2, 3, 4""",
    // decode → binomial FIR (replicate edges, // 4) → ÷4 decimation →
    // stats: the filtered samples then the decimated means, all replayed
    "mm_resample_filtered" -> {
      def x(frame: String) =
        s"((($frame * ch + c) * 31 + 7 * id) % 65536 - 32768)"
      s"""WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                                8000 + (id % 3) * 4000 AS rate,
                                4 * (16 + id % 9) AS frames
                         FROM (SELECT unnest(range(0, 256)) AS id)),
         fir AS (SELECT id, ch, rate, frames, t, c,
             (${x("greatest(t - 1, 0)")}
              + 2 * ${x("t")}
              + ${x("least(t + 1, frames - 1)")}) // 4 AS y
           FROM clips, unnest(range(0, frames)) AS ut(t),
                unnest(range(0, ch)) AS uc(c)),
         dec AS (SELECT id, ch, rate, frames // 4 AS outf, t // 4 AS sq, c,
                        SUM(y) // 4 AS z
                 FROM fir GROUP BY 1, 2, 3, 4, 5, 6)
         SELECT id AS media_id, CAST(rate // 4 AS BIGINT) AS out_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(outf AS BIGINT) AS out_frames,
                CAST(SUM(z) AS BIGINT) AS sum_samples
         FROM dec GROUP BY 1, 2, 3, 4"""
    },
    // planted-payload truth through the classic DCT pHash: identical
    // pixels hash identically, so every twin pairs at hamming 0
    "mm_phash_dct" ->
      """SELECT id AS media_id, true AS found
         FROM (SELECT unnest(range(0, 30)) AS id)""",
    // real-codec JPEG: the planted coefficients live only on the
    // exact-rational DCT basis, so every decoded sample is
    // 128 + c00 ± c40 ± c04 ± c44 (signs from the cos((2t+1)π/4)
    // pattern: + at t%4 ∈ {0,3}, − otherwise), chroma is DC-only
    // (Cb/Cr = 128 + 2·coef under the DC=16 quant step), and the JFIF
    // color conversion is replayed with the same double constants and
    // rounding — the full lossy pipeline under an exact hash compare
    "mm_decode_jpeg" -> sqlDecodeJpeg,
    // all eight inverse coordinate maps replayed over the planted pixel
    // formulas at destination grain
    "mm_exif_rotate" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h,
                  id % 8 + 1 AS o
                FROM (SELECT unnest(range(0, 512)) AS id)),
         d2 AS (SELECT id, w, h, o,
                  CASE WHEN o >= 5 THEN h ELSE w END AS w2,
                  CASE WHEN o >= 5 THEN w ELSE h END AS h2 FROM dims),
         px AS (SELECT id, w, h, o, w2, h2, p, p % w2 AS x, p // w2 AS y
                FROM d2, unnest(range(0, w2 * h2)) AS up(p)),
         src AS (SELECT id, o, w2, h2, p,
                   CASE o WHEN 1 THEN x WHEN 2 THEN w-1-x WHEN 3 THEN w-1-x
                          WHEN 4 THEN x WHEN 5 THEN y WHEN 6 THEN y
                          WHEN 7 THEN w-1-y ELSE w-1-y END AS sx,
                   CASE o WHEN 1 THEN y WHEN 2 THEN y WHEN 3 THEN h-1-y
                          WHEN 4 THEN h-1-y WHEN 5 THEN x WHEN 6 THEN h-1-x
                          WHEN 7 THEN h-1-x ELSE x END AS sy
                 FROM px)
         SELECT id AS media_id, CAST(o AS BIGINT) AS orientation,
                CAST(w2 AS BIGINT) AS width, CAST(h2 AS BIGINT) AS height,
                CAST(SUM(((sx * 7 + sy * 13 + id) % 256) * (p + 1)) AS BIGINT) AS wsum_r,
                CAST(SUM(((sx * 5 + sy * 11 + 2 * id) % 256) * (p + 1)) AS BIGINT) AS wsum_g,
                CAST(SUM(((sx * 3 + sy * 17 + 3 * id) % 256) * (p + 1)) AS BIGINT) AS wsum_b
         FROM src GROUP BY 1, 2, 3, 4""",
    // the plant schedule replayed closed-form (no-EXIF beats wrong-dims
    // when both fire: %7 docs never get an APP1)
    "mm_exif" ->
      """SELECT id AS media_id,
           (id % 7 != 0) AS has_exif,
           CAST(CASE WHEN id % 7 = 0 THEN 0 ELSE id % 8 + 1 END AS BIGINT) AS orientation,
           CAST(CASE WHEN id % 7 = 0 THEN 0
                     WHEN id % 5 = 0 THEN 12 + 4 * (id % 5) + 1
                     ELSE 12 + 4 * (id % 5) END AS BIGINT) AS exif_width,
           CAST(CASE WHEN id % 7 = 0 THEN 0 ELSE 12 + 4 * ((id * 3) % 4) END AS BIGINT) AS exif_height,
           CAST(12 + 4 * (id % 5) AS BIGINT) AS width,
           CAST(12 + 4 * ((id * 3) % 4) AS BIGINT) AS height,
           (id % 7 != 0 AND id % 5 = 0) AS dims_mismatch
         FROM range(256) t(id)""",
    // the tolerant twin: truncated records (id % 11 = 3) flag malformed
    // with zeroed fields, fill-byte-padded ones (id % 11 = 5) parse
    // exactly like their clean originals
    "mm_exif_tolerant" ->
      """SELECT id AS media_id,
           (id % 11 != 3 AND id % 7 != 0) AS has_exif,
           CAST(CASE WHEN id % 11 = 3 OR id % 7 = 0 THEN 0
                     ELSE id % 8 + 1 END AS BIGINT) AS orientation,
           CAST(CASE WHEN id % 11 = 3 OR id % 7 = 0 THEN 0
                     WHEN id % 5 = 0 THEN 12 + 4 * (id % 5) + 1
                     ELSE 12 + 4 * (id % 5) END AS BIGINT) AS exif_width,
           CAST(CASE WHEN id % 11 = 3 OR id % 7 = 0 THEN 0
                     ELSE 12 + 4 * ((id * 3) % 4) END AS BIGINT) AS exif_height,
           CAST(CASE WHEN id % 11 = 3 THEN 0
                     ELSE 12 + 4 * (id % 5) END AS BIGINT) AS width,
           CAST(CASE WHEN id % 11 = 3 THEN 0
                     ELSE 12 + 4 * ((id * 3) % 4) END AS BIGINT) AS height,
           (id % 11 != 3 AND id % 7 != 0 AND id % 5 = 0) AS dims_mismatch,
           (id % 11 = 3) AS malformed
         FROM range(256) t(id)""",
    // progressive decode of the identical coefficients → the identical
    // analytic pixels (successive approximation is lossless at Al=0)
    "mm_decode_jpeg_prog" -> sqlDecodeJpeg,
    // AVI demux: container metadata + every frame's analytic pixel sums
    // at effective id 5·id + 29·f
    "mm_decode_avi" ->
      s"""${sqlAviPixels("true")}
         SELECT id AS media_id, CAST(f AS BIGINT) AS frame_idx,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                CAST(nf AS BIGINT) AS n_frames,
                CAST(uspf AS BIGINT) AS us_per_frame,
                CAST(SUM(greatest(0, least(255, round(yv + 1.402 * crv)))) AS BIGINT) AS sum_r,
                CAST(SUM(greatest(0, least(255, round(yv - 0.344136 * cbv - 0.714136 * crv)))) AS BIGINT) AS sum_g,
                CAST(SUM(greatest(0, least(255, round(yv + 1.772 * cbv)))) AS BIGINT) AS sum_b
         FROM px GROUP BY 1, 2, 3, 4, 5, 6""",
    // demux → keep every 2nd frame → jpegStats on the raw payloads: the
    // kept frames' ids and pixel sums, closed-form
    "mm_video_sample" ->
      s"""${sqlAviPixels("f % 2 = 0")}
         SELECT CAST(id * 100000 + f AS BIGINT) AS media_id,
                CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                CAST(w * h AS BIGINT) AS n_pixels,
                CAST(SUM(greatest(0, least(255, round(yv + 1.402 * crv)))) AS BIGINT) AS sum_r,
                CAST(SUM(greatest(0, least(255, round(yv - 0.344136 * cbv - 0.714136 * crv)))) AS BIGINT) AS sum_g,
                CAST(SUM(greatest(0, least(255, round(yv + 1.772 * cbv)))) AS BIGINT) AS sum_b
         FROM px GROUP BY 1, 2, 3, 4""",
    // planted-payload truth through the real JPEG decode: coefficient-
    // identical JPEGs must pair at hamming 0
    "mm_phash_jpeg" ->
      """SELECT id AS media_id, true AS found
         FROM (SELECT unnest(range(0, 30)) AS id)""",
    // planted-payload truth through the whole video chain: every twin
    // clip's every frame must pair at hamming 0
    "mm_video_phash_dups" ->
      """SELECT clip * 100000 + f AS frame_id, true AS found
         FROM (SELECT unnest(range(0, 20)) AS clip),
              (SELECT unnest(range(0, 3)) AS f)""",
    // real-codec PNG: dimensions + per-channel pixel sums recomputed
    // analytically — the zlib inflate and all five scanline filters must
    // land every byte (n_pixels replaces n_bytes: deflate length is not
    // closed-form)
    "mm_decode_png" -> sqlDecodePng,
    "mm_decode_png_adam7" -> sqlDecodePng,
    // palette lookup composed with the index formula, per channel
    "mm_decode_png_palette" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                       FROM (SELECT unnest(range(0, 512)) AS id)),
         px AS (SELECT id, w, h, (x * 7 + y * 13 + id) % 256 AS pi
                FROM dims, unnest(range(0, w)) AS ux(x),
                     unnest(range(0, h)) AS uy(y))
         SELECT id AS media_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(w * h AS BIGINT) AS n_pixels,
                CAST(SUM((pi * 3 + 7) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((pi * 5 + 11) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((pi * 7 + 13) % 256) AS BIGINT) AS sum_b
         FROM px GROUP BY 1, 2, 3, 4""",
    // augmentation: the transformed pixel formula recomputed at every
    // OUTPUT coordinate with its position weight (flip reads w−1−x,
    // rotate90 reads (y, h−1−x) into an h×w frame, crop shifts by +1)
    "mm_augment" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                       FROM (SELECT unnest(range(0, 512)) AS id)),
         f AS (SELECT id, 0 AS op, w AS ow, h AS oh,
             SUM((((w-1-x) * 7 + y * 13 + id) % 256) * (y * w + x + 1)) AS wr,
             SUM((((w-1-x) * 5 + y * 11 + 2*id) % 256) * (y * w + x + 1)) AS wg,
             SUM((((w-1-x) * 3 + y * 17 + 3*id) % 256) * (y * w + x + 1)) AS wb
           FROM dims, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
           WHERE id % 3 = 0 GROUP BY 1, 2, 3, 4),
         r AS (SELECT id, 1 AS op, h AS ow, w AS oh,
             SUM(((y * 7 + (h-1-x) * 13 + id) % 256) * (y * h + x + 1)) AS wr,
             SUM(((y * 5 + (h-1-x) * 11 + 2*id) % 256) * (y * h + x + 1)) AS wg,
             SUM(((y * 3 + (h-1-x) * 17 + 3*id) % 256) * (y * h + x + 1)) AS wb
           FROM dims, unnest(range(0, h)) AS ux(x), unnest(range(0, w)) AS uy(y)
           WHERE id % 3 = 1 GROUP BY 1, 2, 3, 4),
         c AS (SELECT id, 2 AS op, w - 2 AS ow, h - 2 AS oh,
             SUM((((x+1) * 7 + (y+1) * 13 + id) % 256) * (y * (w-2) + x + 1)) AS wr,
             SUM((((x+1) * 5 + (y+1) * 11 + 2*id) % 256) * (y * (w-2) + x + 1)) AS wg,
             SUM((((x+1) * 3 + (y+1) * 17 + 3*id) % 256) * (y * (w-2) + x + 1)) AS wb
           FROM dims, unnest(range(0, w - 2)) AS ux(x), unnest(range(0, h - 2)) AS uy(y)
           WHERE id % 3 = 2 GROUP BY 1, 2, 3, 4)
         SELECT id AS media_id, CAST(op AS BIGINT) AS op,
                CAST(ow AS BIGINT) AS width, CAST(oh AS BIGINT) AS height,
                CAST(wr AS BIGINT) AS wsum_r, CAST(wg AS BIGINT) AS wsum_g,
                CAST(wb AS BIGINT) AS wsum_b
         FROM (SELECT * FROM f UNION ALL SELECT * FROM r
               UNION ALL SELECT * FROM c)""",
    // decode → exact 2×2 box resize → stats: every output pixel is
    // floor(block sum / 4), recomputed block by block
    "mm_resize_real" ->
      """WITH dims AS (SELECT id, 2 * (4 + id % 5) AS w, 2 * (3 + id % 4) AS h
                       FROM (SELECT unnest(range(0, 256)) AS id)),
         blocks AS (SELECT id, w, h, bx, by,
             SUM(((2 * bx + dx) * 7 + (2 * by + dy) * 13 + id) % 256) // 4 AS pr,
             SUM(((2 * bx + dx) * 5 + (2 * by + dy) * 11 + 2 * id) % 256) // 4 AS pg,
             SUM(((2 * bx + dx) * 3 + (2 * by + dy) * 17 + 3 * id) % 256) // 4 AS pb
           FROM dims, unnest(range(0, w // 2)) AS ubx(bx),
                unnest(range(0, h // 2)) AS uby(by),
                unnest(range(0, 2)) AS udx(dx), unnest(range(0, 2)) AS udy(dy)
           GROUP BY 1, 2, 3, 4, 5)
         SELECT id AS media_id, CAST(w // 2 AS BIGINT) AS out_width,
                CAST(h // 2 AS BIGINT) AS out_height,
                CAST(SUM(pr) AS BIGINT) AS sum_r,
                CAST(SUM(pg) AS BIGINT) AS sum_g,
                CAST(SUM(pb) AS BIGINT) AS sum_b
         FROM blocks GROUP BY 1, 2, 3""",
    // planted-payload truth through decode + REAL resize: pixel-identical
    // PNGs must still pair at hamming 0
    "mm_phash_resized" ->
      """SELECT id AS media_id, true AS found
         FROM (SELECT unnest(range(0, 30)) AS id)""")
}

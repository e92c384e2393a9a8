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
}

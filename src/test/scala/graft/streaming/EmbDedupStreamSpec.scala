package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming embedding dedup: bucket-state pairing semantics, cross-batch
  * drops through the registry, sign-pattern blocking, hot-bucket cap, and
  * replay idempotence of the batch-keyed sink.
  */
class EmbDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // orthogonal unit-ish vectors (cos 0) and an exact copy helper
  private def axis(i: Int, dim: Int = 8): Seq[Double] =
    Seq.tabulate(dim)(d => if (d == i) 1.0 else 0.0)

  private def drain(batches: Seq[Seq[(Long, Seq[Double])]],
                    threshold: Double = 0.99,
                    maxBucket: Int = 10000): Set[Long] = {
    implicit val ctx = spark.sqlContext
    val (work, cp) = (tmp("graft_eds_work"), tmp("graft_eds_cp"))
    val input = MemoryStream[(Long, Seq[Double])]
    val q = EmbDedupStream.writer(input.toDF().toDF("vec_id", "emb"),
      "vec_id", "emb", work, cp, threshold = threshold, maxBucket = maxBucket)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    EmbDedupStream.survivors(spark, work).select("vec_id")
      .as[Long].collect().toSet
  }

  test("a cross-batch exact copy is dropped regardless of arrival order") {
    val v = Seq(0.3, -0.2, 0.9, 0.1, -0.5, 0.4, 0.2, -0.1)
    val w = axis(1) // different sign pattern -> different bucket
    assert(drain(Seq(Seq(1L -> v, 9L -> w), Seq(2L -> v))) == Set(1L, 9L))
    assert(drain(Seq(Seq(2L -> v), Seq(1L -> v, 9L -> w))) == Set(2L, 9L))
  }

  test("within one batch the smaller id wins; orthogonal vectors all survive") {
    val v = Seq(0.5, 0.5, -0.5, 0.5, 0.0, 0.0, 0.0, 0.0)
    // axis vectors share the bucket only if their sign patterns match;
    // axis(0) and axis(1) have different single positive dims -> distinct
    assert(drain(Seq(Seq(3L -> v, 1L -> v, 2L -> axis(0), 4L -> axis(1))))
      == Set(1L, 2L, 4L))
  }

  test("same bucket, sub-threshold cosine keeps both; a scaled copy drops") {
    // identical sign pattern {dims 0,1 positive}, cos = 0.8 < 0.99
    val x = Seq(1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val y = Seq(0.5, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    assert(drain(Seq(Seq(1L -> x, 2L -> y))) == Set(1L, 2L))
    // a scaled copy shares the pattern at cosine exactly 1 -> dropped
    val scaled = x.map(_ * 0.6)
    assert(drain(Seq(Seq(1L -> x), Seq(2L -> scaled))) == Set(1L))
  }

  test("hot bucket caps state: over-cap arrivals survive unpaired") {
    // 4 identical vectors, cap 2: ids 1,2 pair (2 dropped), 3 and 4 flow
    // through uncapped buckets unrecorded -> kept
    val v = Seq(0.7, 0.1, 0.2, 0.3, 0.0, 0.0, 0.0, 0.0)
    val kept = drain(Seq(Seq(1L -> v, 2L -> v, 3L -> v, 4L -> v)),
      maxBucket = 2)
    // id 1 enters, id 2 pairs with 1 (dropped), bucket full at [1, 2]:
    // ids 3, 4 emit with no partners -> kept
    assert(kept == Set(1L, 3L, 4L))
  }

  test("an over-cap vector redelivered in a later batch is not written twice") {
    implicit val ctx = spark.sqlContext
    val (work, cp) = (tmp("graft_eds_rd"), tmp("graft_eds_rdcp"))
    val v = Seq(0.7, 0.1, 0.2, 0.3, 0.0, 0.0, 0.0, 0.0)
    val input = MemoryStream[(Long, Seq[Double])]
    val q = EmbDedupStream.writer(input.toDF().toDF("vec_id", "emb"),
      "vec_id", "emb", work, cp, threshold = 0.99, maxBucket = 1)
      .start()
    try {
      input.addData(1L -> v); q.processAllAvailable() // records id 1
      input.addData(2L -> v); q.processAllAvailable() // over-cap: unrecorded
      input.addData(2L -> v); q.processAllAvailable() // at-least-once replay
    } finally q.stop()
    val rows = EmbDedupStream.survivors(spark, work)
      .select("vec_id").as[Long].collect().toSeq.sorted
    assert(rows == Seq(1L, 2L)) // id 2 exactly once despite the redelivery
  }

  test("replayed batch overwrites its own partition (idempotent sink)") {
    val v = Seq(0.3, -0.2, 0.9, 0.1, -0.5, 0.4, 0.2, -0.1)
    val work = tmp("graft_eds_rp")
    val cand = Seq((1L, v, Seq.empty[Long]), (2L, v, Seq(1L)))
      .toDF("vec_id", "vec", "partners")
    EmbDedupStream.verifyAndAppend(work, 0.99)(cand, 7L)
    EmbDedupStream.verifyAndAppend(work, 0.99)(cand, 7L) // replay
    val kept = EmbDedupStream.survivors(spark, work)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("compact folds registry/clean; survivors and cross-batch dedup unchanged") {
    val v = Seq(0.3, -0.2, 0.9, 0.1, -0.5, 0.4, 0.2, -0.1)
    val w = axis(1)
    val work = tmp("graft_eds_cmp")
    def batchOf(rows: (Long, Seq[Double], Seq[Long])*) =
      rows.toSeq.toDF("vec_id", "vec", "partners")
    EmbDedupStream.verifyAndAppend(work, 0.99)(batchOf((1L, v, Nil)), 0L)
    EmbDedupStream.verifyAndAppend(work, 0.99)(batchOf((9L, w, Nil)), 1L)
    val before = EmbDedupStream.survivors(spark, work)
      .select("vec_id").as[Long].collect().toSet
    assert(before == Set(1L, 9L))
    EmbDedupStream.compact(spark, work, upToBatch = 2L)
    assert(EmbDedupStream.survivors(spark, work)
      .select("vec_id").as[Long].collect().toSet == before)
    def dirs(sub: String) =
      new java.io.File(s"$work/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).toSet
    assert(dirs("registry") == Set("batch=-1") && dirs("clean") == Set("batch=-1"))
    // the folded registry still guards a later redelivery of vec 1
    EmbDedupStream.verifyAndAppend(work, 0.99)(batchOf((1L, v, Nil)), 2L)
    assert(EmbDedupStream.survivors(spark, work)
      .select("vec_id").as[Long].collect().toSet == before,
      "redelivered vec must stay deduped by the compacted registry")
    // a near-dup of a FOLDED registry vector still verifies and drops
    EmbDedupStream.verifyAndAppend(work, 0.99)(
      batchOf((5L, v.map(_ * 0.7), Seq(1L))), 3L)
    assert(EmbDedupStream.survivors(spark, work)
      .select("vec_id").as[Long].collect().toSet == before)
  }
}

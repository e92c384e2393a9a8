package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** ST3/ST6/ST2/ST7 — the stateful completeness join under out-of-order
  * arrival and re-delivery (SURVEY.md §5.4), via MemoryStream.
  */
class CompletenessStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(name: String)(feed: MemoryStream[PartEvent] => Unit)
      : Seq[CompletedGroup] = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[PartEvent]
    val query = Completeness.stream(input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed(input)
      query.processAllAvailable()
      spark.table(name).as[CompletedGroup].collect().toSeq
    } finally query.stop()
  }

  test("emits only when order + items + all referenced products arrived, any order") {
    val out = runStream("c_order") { in =>
      // products and items first, order header LAST — out-of-order
      in.addData(PartEvent("o1", Completeness.KindProduct, Some("p1")))
      in.addData(PartEvent("o1", Completeness.KindItem, Some("p1")))
      in.addData(PartEvent("o1", Completeness.KindItem, Some("p2")))
      in.addData(PartEvent("o1", Completeness.KindProduct, Some("p2")))
      in.addData(PartEvent("o1", Completeness.KindOrder, None))
    }
    assert(out == Seq(CompletedGroup("o1", Seq("p1", "p2"))))
  }

  test("does not emit while a referenced product is still missing (waits forever)") {
    val out = runStream("c_incomplete") { in =>
      in.addData(PartEvent("o2", Completeness.KindOrder, None))
      in.addData(PartEvent("o2", Completeness.KindItem, Some("p1")))
      in.addData(PartEvent("o2", Completeness.KindItem, Some("p2")))
      in.addData(PartEvent("o2", Completeness.KindProduct, Some("p1"))) // p2 missing
    }
    assert(out.isEmpty)
  }

  test("re-delivered events never produce a second emission (emit-once)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[PartEvent]
    val query = Completeness.stream(input.toDS())
      .writeStream.format("memory").queryName("c_redeliver").outputMode("append").start()
    try {
      val events = Seq(
        PartEvent("o3", Completeness.KindOrder, None),
        PartEvent("o3", Completeness.KindItem, Some("p1")),
        PartEvent("o3", Completeness.KindProduct, Some("p1")))
      input.addData(events)
      query.processAllAvailable()
      input.addData(events) // at-least-once source re-delivers everything
      query.processAllAvailable()
      val out = spark.table("c_redeliver").as[CompletedGroup].collect().toSeq
      assert(out == Seq(CompletedGroup("o3", Seq("p1"))))
    } finally query.stop()
  }

  test("dedupStream drops re-delivered keys across micro-batches (ST2)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[PartEvent]
    val deduped = StreamingPipeline.dedupStream(
      input.toDS().toDF(), Seq("orderId", "kind", "productId"))
    val q = deduped.writeStream.format("memory").queryName("dd_out")
      .outputMode("append").start()
    try {
      val e = PartEvent("o1", Completeness.KindItem, Some("p1"))
      input.addData(e)
      q.processAllAvailable()
      input.addData(e) // re-delivery in a later batch
      input.addData(PartEvent("o1", Completeness.KindItem, Some("p2")))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 2L) // e passed once, p2 once
    } finally q.stop()
  }

  // The expiry path is tested through TestGroupState (the public harness
  // for state-transition functions): a streaming query with
  // ProcessingTimeTimeout re-triggers batches continuously by design,
  // which makes wall-clock end-to-end expiry tests spin/flake — the
  // engine's timeout FIRING is Spark's contract; ours is the transition.
  test("with a stale timeout, a timed-out group is removed without emitting (ST6 opt-out)") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // an incomplete group accumulated earlier…
    val accumulated = GroupProgress(hasOrder = true, wanted = Set("p1"),
      present = Set.empty, emitted = false)
    // …whose deadline has fired: the engine invokes update with no events
    // and hasTimedOut = true
    val timedOut = TestGroupState.create[GroupProgress](
      Optional.of(accumulated), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    val out = Completeness.update(200L)("ox", Iterator.empty, timedOut)
    assert(out.isEmpty)          // expires silently — no emission
    assert(timedOut.isRemoved)   // state reclaimed (the 100 TB bound)

    // a live update under the same config re-arms the deadline every batch
    val live = TestGroupState.create[GroupProgress](
      Optional.empty[GroupProgress], GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = false)
    val out2 = Completeness.update(200L)("oy",
      Iterator(PartEvent("oy", Completeness.KindOrder, None)), live)
    assert(out2.isEmpty && live.exists)
    assert(live.getTimeoutTimestampMs.get() == 1200L) // batch time + staleMs
  }

  test("expiry of an EMITTED group is two-phase: tombstone first, so replay cannot re-emit") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    // phase 1: an emitted group times out → collapses to a tombstone, not removed
    val emitted = GroupProgress(hasOrder = true, wanted = Set("p1"),
      present = Set("p1"), emitted = true)
    val s1 = TestGroupState.create[GroupProgress](
      Optional.of(emitted), GroupStateTimeout.ProcessingTimeTimeout,
      1000L, Optional.empty[Long], hasTimedOut = true)
    assert(Completeness.update(200L)("oz", Iterator.empty, s1).isEmpty)
    assert(s1.exists, "emitted group must leave a tombstone, not vanish")
    assert(s1.get.emitted && s1.get.wanted.isEmpty && s1.get.present.isEmpty)

    // replay of the full event set onto the tombstone: folds onto
    // emitted=true and stays silent — the emit-once invariant under
    // re-delivery that outright removal would break
    val s2 = TestGroupState.create[GroupProgress](
      Optional.of(s1.get), GroupStateTimeout.ProcessingTimeTimeout,
      2000L, Optional.empty[Long], hasTimedOut = false)
    val replay = Iterator(
      PartEvent("oz", Completeness.KindOrder, None),
      PartEvent("oz", Completeness.KindItem, Some("p1")),
      PartEvent("oz", Completeness.KindProduct, Some("p1")))
    assert(Completeness.update(200L)("oz", replay, s2).isEmpty)

    // phase 2: a tombstone whose own window also expires is removed for good
    val s3 = TestGroupState.create[GroupProgress](
      Optional.of(GroupProgress(hasOrder = false, Set.empty, Set.empty,
        emitted = true)),
      GroupStateTimeout.ProcessingTimeTimeout,
      3000L, Optional.empty[Long], hasTimedOut = true)
    assert(Completeness.update(200L)("oz", Iterator.empty, s3).isEmpty)
    assert(s3.isRemoved, "expired tombstone must be reclaimed")
  }

  test("with no timeout (default), the same idle group still completes late (ST6)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[PartEvent]
    val query = Completeness.stream(input.toDS())
      .writeStream.format("memory").queryName("c_noexpire").outputMode("append").start()
    try {
      input.addData(PartEvent("oy", Completeness.KindOrder, None),
        PartEvent("oy", Completeness.KindItem, Some("p1")))
      query.processAllAvailable()
      Thread.sleep(300)
      input.addData(PartEvent("oy", Completeness.KindProduct, Some("p1")))
      query.processAllAvailable()
      assert(spark.table("c_noexpire").as[CompletedGroup].collect().toSeq ==
        Seq(CompletedGroup("oy", Seq("p1"))))
    } finally query.stop()
  }

  test("independent orders complete independently") {
    val out = runStream("c_multi") { in =>
      in.addData(
        PartEvent("a", Completeness.KindOrder, None),
        PartEvent("a", Completeness.KindItem, Some("p1")),
        PartEvent("a", Completeness.KindProduct, Some("p1")),
        PartEvent("b", Completeness.KindOrder, None),
        PartEvent("b", Completeness.KindItem, Some("p9"))) // b incomplete
    }
    assert(out == Seq(CompletedGroup("a", Seq("p1"))))
  }
}

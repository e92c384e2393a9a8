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

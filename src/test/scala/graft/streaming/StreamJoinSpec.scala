package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

case class Click(ck: String, clickTs: Timestamp, page: String)
case class Buy(bk: String, buyTs: Timestamp, amount: Double)
case class TsEvent(id: String, ts: Timestamp, payload: String)

/** Stream-stream time-bounded join and watermark-bounded streaming dedup —
  * the two state-store operators whose eviction behavior distinguishes a
  * 100 TB stream from the reference's never-pruned manifest.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("click→buy pairs join within tolerance, across micro-batches") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = StreamJoin.within(
      clicks.toDF(), "ck", "clickTs",
      buys.toDF(), "bk", "buyTs",
      watermark = "10 minutes", tolerance = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      clicks.addData(Click("u1", t("2026-01-01 10:00:00"), "home"))
      q.processAllAvailable()
      // the matching buy arrives a BATCH LATER — the click must still be
      // buffered in the join state
      buys.addData(Buy("u1", t("2026-01-01 10:30:00"), 9.99))
      // outside tolerance (2h after the click): no match
      buys.addData(Buy("u1", t("2026-01-01 12:00:00"), 1.00))
      // no click for this user: no match
      buys.addData(Buy("u2", t("2026-01-01 10:15:00"), 5.00))
      q.processAllAvailable()
      val out = spark.table("ss_join")
        .select("ck", "page", "amount").as[(String, String, Double)]
        .collect().toSeq
      assert(out == Seq(("u1", "home", 9.99)))
    } finally q.stop()
  }

  test("a buy BEFORE its click never joins (range is one-sided)") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = StreamJoin.within(
      clicks.toDF(), "ck", "clickTs",
      buys.toDF(), "bk", "buyTs",
      watermark = "10 minutes", tolerance = "1 hour")
    val q = joined.writeStream.format("memory").queryName("ss_join_pre")
      .outputMode("append").start()
    try {
      buys.addData(Buy("u1", t("2026-01-01 09:30:00"), 3.50))
      clicks.addData(Click("u1", t("2026-01-01 10:00:00"), "home"))
      q.processAllAvailable()
      assert(spark.table("ss_join_pre").count() == 0L)
    } finally q.stop()
  }

  test("dedupStreamBounded drops dups within the watermark window") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val deduped = StreamingPipeline.dedupStreamBounded(
      input.toDF(), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    try {
      input.addData(TsEvent("a", t("2026-01-01 10:00:00"), "first"))
      q.processAllAvailable()
      // re-delivery 30s later, well inside the 10-minute window → dropped
      input.addData(TsEvent("a", t("2026-01-01 10:00:30"), "dup"))
      input.addData(TsEvent("b", t("2026-01-01 10:01:00"), "other"))
      q.processAllAvailable()
      val out = spark.table("ddw_out").as[TsEvent].collect()
      assert(out.length == 2)
      assert(out.map(_.id).sorted.toSeq == Seq("a", "b"))
      assert(out.find(_.id == "a").get.payload == "first")
    } finally q.stop()
  }

  test("dedupStreamBounded EVICTS state once the watermark passes (bounded, unlike dedupStream)") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[TsEvent]
    val deduped = StreamingPipeline.dedupStreamBounded(
      input.toDF(), Seq("id"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("ddw_evict")
      .outputMode("append").start()
    try {
      input.addData(TsEvent("a", t("2026-01-01 10:00:00"), "first"))
      q.processAllAvailable()
      // push the watermark to 10:50 (11:00 − 10min): far past a's expiry
      input.addData(TsEvent("z", t("2026-01-01 11:00:00"), "advance"))
      q.processAllAvailable()
      // same key again with a fresh event time: its old state is gone, so
      // it is emitted again — the observable proof the store was pruned
      input.addData(TsEvent("a", t("2026-01-01 11:05:00"), "reappears"))
      q.processAllAvailable()
      val as = spark.table("ddw_evict").as[TsEvent].collect().filter(_.id == "a")
      assert(as.map(_.payload).sorted.toSeq == Seq("first", "reappears"))
    } finally q.stop()
  }
}

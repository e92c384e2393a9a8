package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Scd

/** Streaming SCD2 maintenance: batch parity with the batch build,
  * cross-batch run closing under an upsert-keyed sink, straggler and
  * replay handling, intra-batch disorder.
  */
class Scd2StreamSpec extends SparkSpec {
  import spark.implicits._

  private val logRows = Seq(
    (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
    (2L, 1L, "X"), (2L, 2L, "X"))

  private def runsToTuples(rows: Seq[ScdRun]) =
    rows.map(r => (r.key, r.effective_from, r.effective_to.getOrElse(-1L),
      r.is_current, r.payload)).sortBy(t => (t._1, t._2))

  test("batch execution reproduces Scd.buildType2 exactly") {
    val events = logRows.map { case (k, v, p) => ScdEvent(k, v, p) }.toDS()
    val got = runsToTuples(Scd2Stream.runs(events).collect().toSeq)
    val want = Scd.buildType2(
        logRows.toDF("k", "v", "status"), Seq("k"), "v")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
        r.getString(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(got == want)
  }

  test("intra-batch disorder is sorted away") {
    val shuffled = Seq(ScdEvent(1L, 3L, "B"), ScdEvent(1L, 1L, "A"),
      ScdEvent(1L, 4L, "A"), ScdEvent(1L, 2L, "A")).toDS()
    val got = runsToTuples(Scd2Stream.runs(shuffled).collect().toSeq)
    assert(got == Seq((1L, 1L, 3L, false, "A"), (1L, 3L, 4L, false, "B"),
      (1L, 4L, -1L, true, "A")))
  }

  test("cross-batch closing converges under a (key, effective_from) upsert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[ScdEvent]
    val q = Scd2Stream.runs(in.toDS()).writeStream
      .format("memory").queryName("scd2_stream")
      .outputMode("update").start()
    try {
      in.addData(ScdEvent(1L, 1L, "A"), ScdEvent(1L, 2L, "A"))
      q.processAllAvailable()
      in.addData(ScdEvent(1L, 3L, "B")) // closes the A run
      q.processAllAvailable()
      in.addData(ScdEvent(1L, 2L, "Z")) // straggler: already-closed region
      q.processAllAvailable()
      val emissions = spark.table("scd2_stream").as[ScdRun].collect().toSeq
      // last-wins by (key, effective_from) — what an upsert sink stores
      val converged = emissions.zipWithIndex
        .groupBy(e => (e._1.key, e._1.effective_from))
        .map { case (_, es) => es.maxBy(_._2)._1 }.toSeq
      assert(runsToTuples(converged) ==
        Seq((1L, 1L, 3L, false, "A"), (1L, 3L, -1L, true, "B")))
      // the straggler emitted nothing: batch 3 added no rows
      assert(emissions.size == 3) // open(A) + closed(A) + open(B)
    } finally q.stop()
  }

  test("replaying processed versions is a no-op (at-least-once safe)") {
    val events = Seq(ScdEvent(1L, 1L, "A"), ScdEvent(1L, 2L, "B")).toDS()
    val once = runsToTuples(Scd2Stream.runs(events).collect().toSeq)
    // batch mode re-run == replay of the same data; streaming replay of
    // version <= openFrom takes the straggler branch (covered above)
    val twice = runsToTuples(Scd2Stream.runs(events).collect().toSeq)
    assert(once == twice)
  }
}

package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** Ordered funnel: in-order completion, out-of-order events never
  * advance, strictly-after semantics, monotone step counts, guards.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  // u1 completes A→B→C in order; u2 has C BEFORE B (never reaches C);
  // u3 only A; u4's B is at exactly A's time (strictly-after: no B)
  private val events = Seq(
    (1L, "A", ts(1000)), (1L, "B", ts(2000)), (1L, "C", ts(3000)),
    (2L, "A", ts(1000)), (2L, "C", ts(1500)), (2L, "B", ts(2000)),
    (3L, "A", ts(1000)),
    (4L, "A", ts(1000)), (4L, "B", ts(1000))
  ).toDF("user_id", "event_type", "ts")

  test("in-order completion advances; out-of-order and same-instant do not") {
    val times = Funnel.funnelTimes(events, "user_id", "event_type", "ts",
        Seq("A", "B", "C"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(times == Seq(
      (1L, 1, 1000000L), (1L, 2, 2000000L), (1L, 3, 3000000L),
      (2L, 1, 1000000L), (2L, 2, 2000000L), // C at 1500 < B: not reached
      (3L, 1, 1000000L),
      (4L, 1, 1000000L))) // B at A's instant: strictly-after excludes it
  }

  test("report counts are monotone non-increasing") {
    val rep = Funnel.report(events, "user_id", "event_type", "ts",
        Seq("A", "B", "C"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1).toSeq
    assert(rep == Seq(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("report emits a zero row for a step nobody reached") {
    val rep = Funnel.report(events, "user_id", "event_type", "ts",
        Seq("A", "B", "C", "NEVER"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).sortBy(_._1).toSeq
    assert(rep == Seq(1 -> 4L, 2 -> 2L, 3 -> 1L, 4 -> 0L))
  }

  test("a user's later retry after an out-of-order event still advances") {
    val retry = Seq(
      (9L, "A", ts(1000)), (9L, "C", ts(1500)), (9L, "B", ts(2000)),
      (9L, "C", ts(2500)) // second C, now after B
    ).toDF("user_id", "event_type", "ts")
    val steps = Funnel.funnelTimes(retry, "user_id", "event_type", "ts",
        Seq("A", "B", "C"))
      .collect().map(r => r.getInt(1) -> r.getLong(3)).sortBy(_._1).toSeq
    assert(steps == Seq(1 -> 1000000L, 2 -> 2000000L, 3 -> 2500000L))
  }

  test("cohortRetention: Monday-aligned cohorts, exact week offsets") {
    // 2024-01-01 is a Monday. u1 active weeks 0 and 2; u2 joins week 1.
    def day(d: String) = Timestamp.valueOf(s"$d 12:00:00")
    val ev = Seq(
      (1L, day("2024-01-02")), (1L, day("2024-01-03")), // week 0, one wk row
      (1L, day("2024-01-16")),                          // week 2
      (2L, day("2024-01-10"))                           // cohort week 1
    ).toDF("user_id", "ts")
    val got = Funnel.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("guards reject empty and duplicate step lists") {
    intercept[IllegalArgumentException] {
      Funnel.funnelTimes(events, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelTimes(events, "user_id", "event_type", "ts", Seq("A", "A"))
    }
  }
}

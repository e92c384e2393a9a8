package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec

/** Tumbling and session event-time windows vs hand-computed expectations. */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling windows align to the epoch grid and sum exactly") {
    val events = Seq(
      ("click", ts("2024-01-01 10:05:00"), 1.10),
      ("click", ts("2024-01-01 10:55:00"), 2.20),
      ("click", ts("2024-01-01 11:01:00"), 4.40),
      ("view", ts("2024-01-01 10:30:00"), 8.80)
    ).toDF("event_type", "ts", "value")
    val out = Windows.tumbling(events, "ts", "event_type", "1 hour", "value")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet
    assert(out == Set(
      ("click", "2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", 2L, 3.3),
      ("click", "2024-01-01 11:00:00.0", "2024-01-01 12:00:00.0", 1L, 4.4),
      ("view", "2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0", 1L, 8.8)))
  }

  test("sliding windows place each event in width/slide overlapping windows") {
    val events = Seq(("click", ts("2024-01-01 10:40:00"))).toDF("event_type", "ts")
    val out = Windows.sliding(events, "ts", "event_type", "1 hour", "30 minutes")
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3))).toSet
    // 10:40 falls in [10:00, 11:00) and [10:30, 11:30)
    assert(out == Set(("2024-01-01 10:00:00.0", 1L), ("2024-01-01 10:30:00.0", 1L)))
  }

  test("session windows split on gaps >= the inactivity threshold") {
    val events = Seq(
      // user A: 3 events, gaps 10 min and 29 min → ONE session
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:10:00")),
      (1L, ts("2024-01-01 10:39:00")),
      // then a 31-min gap → new session
      (1L, ts("2024-01-01 11:10:00")),
      // user B: single event
      (2L, ts("2024-01-01 09:00:00"))
    ).toDF("user_id", "ts")
    val out = Windows.sessionize(events, "ts", "user_id", "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:00.0", "2024-01-01 11:09:00.0", 3L), // end = last + gap
      (1L, "2024-01-01 11:10:00.0", "2024-01-01 11:40:00.0", 1L),
      (2L, "2024-01-01 09:00:00.0", "2024-01-01 09:30:00.0", 1L)))
  }
}

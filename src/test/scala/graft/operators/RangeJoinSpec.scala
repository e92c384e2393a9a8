package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Bucketized interval join: agrees with the naive inequality join, emits
  * each matching pair exactly once even when intervals span many buckets,
  * and both interval ends are inclusive.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val Hour = 3600L * 1000000L

  private val events = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u1", ts("2024-01-01 23:30:00")),
    (4L, "u2", ts("2024-01-01 10:30:00")),
    (5L, "u3", ts("2024-01-01 10:30:00"))   // key with no intervals
  ).toDF("event_id", "user_id", "ts")

  private val intervals = Seq(
    // spans 11 hour-buckets: pairs must still appear exactly once
    ("u1", 100L, ts("2024-01-01 09:00:00"), ts("2024-01-01 20:00:00")),
    ("u1", 101L, ts("2024-01-01 12:00:00"), ts("2024-01-01 13:00:00")), // start == event 2's ts
    ("u2", 102L, ts("2024-01-01 00:00:00"), ts("2024-01-01 10:30:00"))  // end == event 4's ts
  ).toDF("w_user", "iv_id", "w_start", "w_end")

  private lazy val out = RangeJoin.intervalJoin(events, "user_id", "ts",
      intervals, "w_user", "w_start", "w_end", bucketMicros = Hour)
    .select("event_id", "iv_id").collect()
    .map(r => (r.getLong(0), r.getLong(1)))

  test("matches the naive inequality join exactly (no dups across spanned buckets)") {
    val naive = events.join(intervals,
        col("user_id") === col("w_user") &&
          col("ts") >= col("w_start") && col("ts") <= col("w_end"))
      .select("event_id", "iv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == naive.sorted.toSeq)
    assert(out.length == out.distinct.length) // exactly-once per pair
  }

  test("both interval ends are inclusive; unmatched keys and times drop out") {
    val set = out.toSet
    assert(set((2L, 100L)) && set((2L, 101L))) // start boundary inclusive
    assert(set((4L, 102L)))                    // end boundary inclusive
    assert(!out.exists(_._1 == 3L))            // 23:30 after every u1 interval...
    assert(!out.exists(_._1 == 5L))            // u3 has no intervals
  }

  test("inverted intervals (end < start) are dropped, not exploded into garbage") {
    val bad = Seq(("u1", 200L, ts("2024-01-01 20:00:00"), ts("2024-01-01 09:00:00")))
      .toDF("w_user", "iv_id", "w_start", "w_end")
    val joined = RangeJoin.intervalJoin(events, "user_id", "ts",
      bad, "w_user", "w_start", "w_end", bucketMicros = Hour)
    assert(joined.count() == 0L) // same result as the naive join, no waste
  }

  test("an interval spanning more than maxBucketsPerInterval fails loudly (corrupt-row guard)") {
    val corrupt = Seq(("u1", 201L, ts("2024-01-01 09:00:00"), ts("9999-12-31 00:00:00")))
      .toDF("w_user", "iv_id", "w_start", "w_end")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(events, "user_id", "ts",
        corrupt, "w_user", "w_start", "w_end", bucketMicros = Hour,
        maxBucketsPerInterval = 1000L).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("intervalJoin")),
      s"guard message missing from: $e")
  }
}

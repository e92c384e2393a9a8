package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** As-of join semantics: latest version ≤ event time, exact-time inclusion,
  * deterministic tiebreaks, no-match nulls, row-consistent carried struct.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, "u1", ts("2024-01-10 12:00:00")),
    (2L, "u1", ts("2024-01-20 12:00:00")),
    (3L, "u1", ts("2024-01-05 00:00:00")), // before any version
    (4L, "u2", ts("2024-01-15 00:00:00")), // exactly at a version's time
    (5L, "u3", ts("2024-01-15 00:00:00"))  // key with no versions at all
  ).toDF("event_id", "user_id", "ts")

  private val versions = Seq(
    ("u1", ts("2024-01-08 00:00:00"), 1L, Some("a")),
    ("u1", ts("2024-01-15 00:00:00"), 2L, Some("b")),
    ("u2", ts("2024-01-15 00:00:00"), 3L, None),       // carried field null
    ("u2", ts("2024-01-15 00:00:00"), 4L, Some("d"))   // same time: tiebreak
  ).toDF("key", "vts", "version", "payload")

  private lazy val out = AsOf.asofJoin(
    events, "user_id", "ts", versions, "key", "vts", "version",
    Seq("version", "payload"))
    .collect()
    .map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
    .toMap

  test("each left row sees the latest version at or before its timestamp") {
    assert(out(1L) == ((Some(1L), Some("a")))) // between v1 and v2
    assert(out(2L) == ((Some(2L), Some("b")))) // after both → latest
  }

  test("a left row before any version gets nulls") {
    assert(out(3L) == ((None, None)))
    assert(out(5L) == ((None, None))) // key with no right rows at all
  }

  test("exact-timestamp versions match, and the greatest tiebreak wins the tie") {
    // u2 has two versions AT the event's exact time: version 4 (greater
    // tiebreak) must win, and its carried fields must come from ITS row
    // (payload "d"), not mix with version 3's null payload
    assert(out(4L) == ((Some(4L), Some("d"))))
  }

  test("every left row survives (left-outer semantics), nothing duplicated") {
    assert(out.size == 5)
  }

  private lazy val fwd = AsOf.asofJoinForward(
    events, "user_id", "ts", versions, "key", "vts", "version",
    Seq("version", "payload"))
    .collect()
    .map(r => r.getLong(0) ->
      (Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
    .toMap

  test("forward: each left row sees the earliest version at or after its timestamp") {
    assert(fwd(1L) == ((Some(2L), Some("b")))) // next version after Jan 10
    assert(fwd(3L) == ((Some(1L), Some("a")))) // before all → first version
  }

  test("forward: a left row after every version gets nulls") {
    assert(fwd(2L) == ((None, None)))          // Jan 20, both versions past
    assert(fwd(5L) == ((None, None)))          // key with no right rows
  }

  test("forward: exact-time versions match and the SMALLEST tiebreak wins") {
    assert(fwd(4L) == ((Some(3L), None)))      // v3 < v4, payload from v3
  }

  test("forward: a null left timestamp matches nothing (NULL >= anything is no match)") {
    val l = Seq((1L, Some("u1"), Option.empty[Timestamp]),
      (2L, Some("u1"), Some(ts("2024-01-01 00:00:00"))))
      .toDF("event_id", "user_id", "ts")
    val o = AsOf.asofJoinForward(l, "user_id", "ts", versions, "key", "vts",
      "version", Seq("version", "payload")).collect()
      .map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(o(1L).isEmpty, "null-ts left row must not match any version")
    assert(o(2L).contains(1L)) // sanity: a real ts still matches forward
  }

  test("null keys never match each other (SQL join semantics)") {
    val l = Seq((1L, Option.empty[String], ts("2024-01-10 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((Option.empty[String], ts("2024-01-01 00:00:00"), 1L, "x"))
      .toDF("key", "vts", "version", "payload")
    val o = AsOf.asofJoin(l, "user_id", "ts", r, "key", "vts", "version",
      Seq("version", "payload")).collect()
    assert(o.length == 1 && o(0).isNullAt(3) && o(0).isNullAt(4))
  }
}

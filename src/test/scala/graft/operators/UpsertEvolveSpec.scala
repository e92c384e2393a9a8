package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution on MERGE — the Delta autoMerge semantics of the
  * reference's write path (transform.py:331-339): new columns union in,
  * target-only columns survive, type conflicts reject loudly.
  */
class UpsertEvolveSpec extends SparkSpec {
  import spark.implicits._

  test("update-only column appends; target rows read null; matched rows take u") {
    val t = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val u = Seq((2L, "y2", 20L), (3L, "z", 30L)).toDF("k", "v", "extra")
    val out = Upsert.upsertEvolve(t, u, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "v", "extra"),
      "new column appends after the target schema")
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(m(1L) == (("x", None)), "unmatched target row: kept value, null new col")
    assert(m(2L) == (("y2", Some(20L))), "matched row: update-all + new col")
    assert(m(3L) == (("z", Some(30L))), "inserted row carries the new col")
  }

  test("target-only column keeps its value; inserted rows read null") {
    val t = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("k", "v", "old")
    val u = Seq((2L, "y2"), (3L, "z")).toDF("k", "v")
    val out = Upsert.upsertEvolve(t, u, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "v", "old"))
    val m = out.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), Option(r.get(2))))).toMap
    assert(m(1L) == (("x", Some(1.5))))
    assert(m(2L) == (("y2", Some(2.5))), "matched row KEEPS a source-missing column")
    assert(m(3L) == (("z", None)), "inserted row never had the old column")
  }

  test("a shared column with conflicting types rejects loudly") {
    val t = Seq((1L, "x")).toDF("k", "v")
    val u = Seq((1L, 5L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertEvolve(t, u, Seq("k"))
    }
    assert(e.getMessage.contains("v"), s"message must name the column: ${e.getMessage}")
    assert(e.getMessage.contains("string") && e.getMessage.contains("bigint"))
  }

  test("identical schemas degrade to plain upsert semantics") {
    val t = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val u = Seq((2L, "y2"), (3L, "z")).toDF("k", "v")
    val strict = Upsert.upsert(t, u, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val evolved = Upsert.upsertEvolve(t, u, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(strict == evolved)
  }
}

package graft.operators

import graft.SparkSpec

/** Keyed table diff: all three change labels, null-value changed-ness,
  * keys-only degeneration, identical-table emptiness, and the schema
  * guard.
  */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq(
    (1L, "x", 10), (2L, "y", 20), (3L, "z", 30), (4L, null.asInstanceOf[String], 40)
  ).toDF("k", "s", "v")

  test("added / removed / changed / unchanged classify correctly") {
    val b = Seq(
      (1L, "x", 10),    // unchanged — must not appear
      (2L, "y", 99),    // changed value
      (4L, "now", 40),  // changed: null -> non-null
      (5L, "new", 50)   // added; 3 is removed
    ).toDF("k", "s", "v")
    val got = Diff.diff(a, b, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("identical tables diff to empty") {
    assert(Diff.diff(a, a, Seq("k")).count() == 0L)
  }

  test("a keys-only schema degenerates to added/removed detection") {
    val x = Seq(1L, 2L).toDF("k")
    val y = Seq(2L, 3L).toDF("k")
    val got = Diff.diff(x, y, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "removed"), (3L, "added")))
  }

  test("mismatched schemas are rejected clearly") {
    val e = intercept[IllegalArgumentException] {
      Diff.diff(a, a.withColumnRenamed("v", "w"), Seq("k"))
    }
    assert(e.getMessage.contains("schemas must match"))
  }
}

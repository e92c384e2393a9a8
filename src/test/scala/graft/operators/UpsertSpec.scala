package graft.operators

import graft.SparkSpec

/** S7/J2 MERGE semantics: update-all / insert-all / keep-unmatched
  * (reference transform.py:331-336).
  */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Double)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  test("matched keys take the update row entirely (whenMatchedUpdateAll)") {
    val target = Seq((1L, "old", 1.0), (2L, "keep", 2.0)).toDF("k", "name", "v")
    val updates = Seq((1L, "new", 10.0)).toDF("k", "name", "v")
    assert(rows(Upsert.upsert(target, updates, Seq("k"))) ==
      Set((1L, "new", 10.0), (2L, "keep", 2.0)))
  }

  test("unmatched update keys are inserted (whenNotMatchedInsertAll)") {
    val target = Seq((1L, "a", 1.0)).toDF("k", "name", "v")
    val updates = Seq((9L, "ins", 9.0)).toDF("k", "name", "v")
    assert(rows(Upsert.upsert(target, updates, Seq("k"))) ==
      Set((1L, "a", 1.0), (9L, "ins", 9.0)))
  }

  test("an update row with a null non-key value still wins over the target") {
    val target = Seq((1L, Some("old"), 1.0)).toDF("k", "name", "v")
    val updates = Seq((1L, Option.empty[String], 5.0)).toDF("k", "name", "v")
    val out = Upsert.upsert(target, updates, Seq("k")).collect()
    assert(out.length == 1 && out(0).isNullAt(1) && out(0).getDouble(2) == 5.0)
  }

  test("composite keys match as a tuple") {
    val target = Seq((1L, "x", 1.0), (1L, "y", 2.0)).toDF("k1", "k2", "v")
    val updates = Seq((1L, "y", 20.0)).toDF("k1", "k2", "v")
    val out = Upsert.upsert(target, updates, Seq("k1", "k2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(out == Set((1L, "x", 1.0), (1L, "y", 20.0)))
  }

  test("dedupLastWins keeps the highest tiebreaker per key") {
    val batch = Seq((1L, 1, "first"), (1L, 3, "last"), (1L, 2, "mid"),
      (2L, 1, "only")).toDF("k", "seq", "tag")
    val out = Upsert.dedupLastWins(batch, Seq("k"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((1L, "last"), (2L, "only")))
  }
}

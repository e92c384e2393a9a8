package graft.operators

import graft.SparkSpec

/** Salted join must be result-identical to the plain equi-join while
  * spreading each key across numSalts composite keys.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join, including duplicate fact keys") {
    // heavy skew: 100 rows of one key, a few of others
    val facts = ((1 to 100).map(i => (1L, s"row$i")) ++ Seq((2L, "x"), (3L, "y")))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "warm")).toDF("dk", "name") // 3L unmatched
    val plain = facts.join(dim, facts("k") === dim("dk")).drop("dk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSorted
    val salted = Skew.saltedJoin(facts, dim, "k", "dk", numSalts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSorted
    assert(salted == plain)
    assert(salted.length == 101) // 100 hot + 1 warm, no duplication or loss
  }

  test("saltedJoin keeps the fact key when both sides name the key identically") {
    val facts = Seq((1L, "a"), (2L, "b")).toDF("k", "payload")
    val dim = Seq((1L, "hot")).toDF("k", "name")
    val out = Skew.saltedJoin(facts, dim, "k", "k", numSalts = 2)
    assert(out.columns.toSeq == Seq("k", "payload", "name"))
    assert(out.collect().map(r => (r.getLong(0), r.getString(2))).toSeq == Seq((1L, "hot")))
  }

  implicit class SortedOps(a: Array[(Long, String, String)]) {
    def toSorted: Seq[(Long, String, String)] = a.toSeq.sorted
  }
}

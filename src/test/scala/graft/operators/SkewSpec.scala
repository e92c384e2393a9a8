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

  test("skewReport: counts, shares, and mean-relative load on a known key mix") {
    // key a: 6 rows, b: 3, c: 1 → total 10, 3 keys, mean load 10/3
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val got = Skew.skewReport(df, "k", topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 2)
    assert(got(0) == ("a", 6L, 60.0, 1.8))  // 6/10, 6/(10/3)
    assert(got(1) == ("b", 3L, 30.0, 0.9))
  }

  implicit class SortedOps(a: Array[(Long, String, String)]) {
    def toSorted: Seq[(Long, String, String)] = a.toSeq.sorted
  }
}

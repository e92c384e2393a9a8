package graft.operators

import graft.SparkSpec

/** Exact set-similarity self-join: threshold-edge acceptance and full
  * agreement with a driver-side brute-force closure on randomized
  * corpora (the prefix filter must be lossless AND produce no
  * sub-threshold extras).
  */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], t100: Int): Set[(Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      isect = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if 100 * isect >= t100 * uni
    } yield (ia, ib, isect, uni)).toSet
  }

  private def run(docs: Seq[(Long, String)], t100: Int): Set[(Long, Long, Long, Long)] =
    SetJoin.jaccardSelfJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("threshold edge: exactly-at-threshold pairs accepted, below rejected") {
    val docs = Seq(
      (1L, "a b c d"),       // J(1,2) = 4/5 = 0.80 — exactly at t
      (2L, "a b c d e"),
      (3L, "a b c x y"),     // J(2,3) = 3/7 — below
      (4L, "a b c d"))       // J(1,4) = 1.0
    val out = run(docs, 80)
    assert(out == brute(docs, 80))
    assert(out.contains((1L, 2L, 4L, 5L)))
    assert(out.contains((1L, 4L, 4L, 4L)))
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("identical and empty documents behave (output-sensitive worst case)") {
    val docs = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y z"), (4L, ""), (5L, "  "))
    val out = run(docs, 50)
    assert(out == Set((1L, 2L, 3L, 3L), (1L, 3L, 3L, 3L), (2L, 3L, 3L, 3L)))
  }

  test("agrees with the brute-force closure on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    for (t100 <- Seq(30, 60, 85)) {
      val docs = (0L until 60L).map { i =>
        val n = 3 + rnd.nextInt(10)
        (i, Seq.fill(n)(s"w${rnd.nextInt(25)}").mkString(" "))
      }
      assert(run(docs, t100) == brute(docs, t100), s"mismatch at t=$t100")
    }
  }

  test("reported jaccard is the rounded exact ratio") {
    val docs = Seq((1L, "a b c"), (2L, "a b c d e f"))   // 3/6 = 0.5
    val row = SetJoin.jaccardSelfJoin(docs.toDF("doc_id", "text"),
      "doc_id", "text", 50).collect().head
    assert(row.getDouble(4) == 0.5)
  }
}

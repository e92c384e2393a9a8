package graft.operators

import graft.SparkSpec

/** Fixed-point PageRank: hand-computed two-iteration star, dangling
  * leak, partition-layout determinism, and parameter guards.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // symmetric star centered on 1: 1↔2, 1↔3
  private val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
    .toDF("src", "dst")

  private def ranks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

  test("two iterations match the hand-computed fixed-point arithmetic") {
    // scale 1000, keep 150; iter1: center 150+85*2000 div 100 = 1850,
    // leaves 150+85*500 div 100 = 575; iter2: center
    // 150+85*1150 div 100 = 1127, leaves 150+85*925 div 100 = 936
    assert(ranks(Graph.pageRankFixed(star, "src", "dst", 1, 1000L)) ==
      Seq((1L, 1850L), (2L, 575L), (3L, 575L)))
    assert(ranks(Graph.pageRankFixed(star, "src", "dst", 2, 1000L)) ==
      Seq((1L, 1127L), (2L, 936L), (3L, 936L)))
  }

  test("a dangling sink absorbs rank it never redistributes") {
    // 1 → 2 only: node 2 has no out-edges, its inflow leaks next round
    val chain = Seq((1L, 2L)).toDF("src", "dst")
    val r = ranks(Graph.pageRankFixed(chain, "src", "dst", 2, 1000L))
    // iter1: n1 = 150 (no inflow), n2 = 150 + 850 = 1000
    // iter2: n1 = 150, n2 = 150 + 85*150 div 100 = 277
    assert(r == Seq((1L, 150L), (2L, 277L)))
  }

  test("result is independent of the input partition layout") {
    val a = ranks(Graph.pageRankFixed(star, "src", "dst", 3, 1000L))
    val b = ranks(Graph.pageRankFixed(star.repartition(7), "src", "dst", 3, 1000L))
    assert(a == b)
  }

  test("guards: iteration count and scale divisibility") {
    intercept[IllegalArgumentException] {
      Graph.pageRankFixed(star, "src", "dst", 0, 1000L)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankFixed(star, "src", "dst", 1, 999L)
    }
  }
}

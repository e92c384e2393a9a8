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

  test("kCore: hand-built graph peels to exactly the k-core") {
    // K4 on {1,2,3,4} + a tail 4-5-6 + an isolated edge 7-8
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (7L, 8L)
    ).toDF("src", "dst")
    val core3 = Graph.kCore(edges, "src", "dst", k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Dedup.clearCaches()
    // only the K4 survives k=3; in-core degrees are the clique's own
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=2: K4 still in; the tail and isolated edge peel (degree 1 ends)
    val core2 = Graph.kCore(edges, "src", "dst", k = 2).collect()
      .map(_.getLong(0)).toSet
    graft.operators.Dedup.clearCaches()
    assert(core2 == Set(1L, 2L, 3L, 4L))
    // k high enough: empty core, empty typed result
    val core9 = Graph.kCore(edges, "src", "dst", k = 9)
    assert(core9.count() == 0L)
    graft.operators.Dedup.clearCaches()
  }

  test("kCore: cascading peel needs multiple rounds; duplicates/self-loops ignored") {
    // chain 1-2-3-4-5: k=2 peels ends first, then everything — takes
    // several rounds, must still converge to empty
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    assert(Graph.kCore(chain, "src", "dst", k = 2).count() == 0L)
    graft.operators.Dedup.clearCaches()
    // a triangle with noisy input: duplicate edges, both directions,
    // self-loops — degree must mean DISTINCT neighbors
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L)).toDF("src", "dst")
    val got = Graph.kCore(noisy, "src", "dst", k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Dedup.clearCaches()
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
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

package graft.operators

import graft.SparkSpec

/** Triangle counting: hand graphs (clique, star, square), exactly-once
  * counting under duplicate/reversed/self-loop edges, and brute-force
  * agreement on random graphs.
  */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2))
    val counts = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val vec = und.toVector
    for {
      i <- vec.indices; j <- (i + 1) until vec.size
      (a, b) = vec(i); (c, d) = vec(j)
      shared = Seq(a, b).intersect(Seq(c, d))
      if shared.size == 1
      others = (Seq(a, b) ++ Seq(c, d)).filterNot(_ == shared.head)
      if others.size == 2 && und.contains((others.min, others.max)) &&
        others.min != others.max
    } {
      // each triangle found 3 times (once per wedge pair) — divide later
      (Seq(shared.head) ++ others).foreach(n => counts(n) += 1)
    }
    nodes.map(n => n -> counts(n) / 3).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Grouping.triangleCounts(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: four triangles, every node in three of them") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("star and square are triangle-free but report every node with 0") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(run(star) == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(square).values.forall(_ == 0L))
  }

  test("duplicate, reversed, and self-loop edges do not inflate counts") {
    val tri = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (1L, 1L), (2L, 2L))
    assert(run(tri) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("agrees with the brute-force model on random graphs incl. a hub") {
    val rnd = new scala.util.Random(7)
    val random = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    // skewed hub: node 0 connected to everyone (the "last reducer" shape)
    val hub = (1L to 39L).map(i => (0L, i))
    for (edges <- Seq(random, random ++ hub))
      assert(run(edges) == brute(edges))
  }
}

package graft.functions

import graft.SparkSpec

/** Misra–Gries frequent-items sketch: the two guarantees (heavy-item
  * membership, error band) under adversarial order and arbitrary
  * partitioning, plus the merge-shrink unit behavior.
  */
class FrequentItemsSpec extends SparkSpec {
  import spark.implicits._

  // 3 heavy items (>N/k for k=10 → >10% of 300) drowned in 200 distinct
  // light items; interleaved so decrements constantly fire
  private val heavy = Seq("aaa" -> 60, "bbb" -> 40, "ccc" -> 35)
  private val items: Seq[String] = {
    val h = heavy.flatMap { case (t, n) => Seq.fill(n)(t) }
    val light = (0 until 165).map(i => s"light_$i")
    new scala.util.Random(11L).shuffle(h ++ light)
  }
  private val n = items.size
  private val k = 10

  test("every item above N/k is in the summary, inside the error band") {
    val summary = items.toDS()
      .select(FrequentItems.sketch(k).name("s"))
      .collect()(0)
    assert(summary.size <= k - 1)
    heavy.foreach { case (t, exact) =>
      assert(exact > n / k, s"test setup: $t must be heavy")
      val est = summary.get(t)
      assert(est.isDefined, s"heavy item $t missing from $summary")
      assert(est.get <= exact && est.get >= exact - n / k - 1,
        s"$t estimate ${est.get} outside [${exact - n / k - 1}, $exact]")
    }
  }

  test("the guarantee survives arbitrary partitioning (mergeable summary)") {
    for (parts <- Seq(1, 4, 16)) {
      val summary = items.toDS().repartition(parts)
        .select(FrequentItems.sketch(k).name("s"))
        .collect()(0)
      heavy.foreach { case (t, _) =>
        assert(summary.contains(t), s"$t lost at $parts partitions: $summary")
      }
      assert(summary.size <= k - 1)
    }
  }

  test("merge shrinks to k-1 counters by subtracting the k-th largest") {
    val x = Map("a" -> 10L, "b" -> 5L, "c" -> 3L)
    val y = Map("d" -> 4L, "e" -> 2L)
    val merged = FrequentItems.mergeSummaries(x, y, k = 4)
    // union has 5 counters; 4th largest is 3 → subtract 3, drop ≤0
    assert(merged == Map("a" -> 7L, "b" -> 2L, "d" -> 1L))
  }

  test("reduce never exceeds k-1 counters; a repeated key outlasts the decrement") {
    // x,x,y then z: the full summary {x:2,y:1} decrements by 1 (z absorbed,
    // y dropped) — exactly the classic MG step
    val b = Seq("x", "x", "y", "z").foldLeft(Map.empty[String, Long])(
      (acc, i) => FrequentItems.add(acc, i, 1L, k = 3))
    assert(b == Map("x" -> 1L), s"unexpected summary: $b")
  }
}

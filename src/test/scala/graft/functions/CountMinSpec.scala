package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch: never undercounts, ε·N overcount band on a crafted
  * stream, merge-order determinism, and zero-count probes.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val stream = (1 to 2000).map(i => s"item${i % 50}") ++
    Seq.fill(500)("hot")

  test("estimates never undercount and stay within eps*N of exact") {
    val df = stream.toDF("v")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = stream.size
    val probes = Seq("hot", "item0", "item49", "never_seen")
    val est = CountMin.pointEstimates(df, "v", probes, eps = 0.01)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      val ex = exact.getOrElse(p, 0L)
      assert(est(p) >= ex, s"$p undercounted: ${est(p)} < $ex")
      assert(est(p) <= ex + (n * 0.01).toLong + 1,
        s"$p overcounted past eps*N: ${est(p)} vs $ex")
    }
  }

  test("sketch is identical under any partitioning (commutative merge)") {
    val a = CountMin.pointEstimates(stream.toDF("v"), "v", Seq("hot", "item7"))
      .collect().map(_.toSeq).toSet
    val b = CountMin.pointEstimates(stream.toDF("v").repartition(23), "v",
      Seq("hot", "item7")).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}

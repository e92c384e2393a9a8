package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking.ntileExact must reproduce the NTILE window bit-for-bit — bucket
  * sizes, remainder placement, tie-breaking — while never funneling the
  * frame through one partition (the plan side is locked in PlanAuditSpec).
  */
class RankingSpec extends SparkSpec {

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("decile",
      ntile(k).over(Window.orderBy(col("v").desc, col("id"))))

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "decile").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap

  test("ntileExact equals the NTILE window for sizes that exercise the remainder") {
    import spark.implicits._
    // 97 % 10 = 7: the first 7 buckets get one extra row — the exact case
    // a floor-only formula gets wrong
    for (n <- Seq(1, 9, 10, 97, 1000); k <- Seq(3, 10)) {
      val df = (1L to n.toLong).map(i => (i, (i * 7919 % 1000).toDouble))
        .toDF("id", "v")
      val expected = pairs(viaWindow(df, k))
      val got = pairs(Ranking.ntileExact(df, k, Seq(col("v").desc, col("id")), "decile"))
      assert(got == expected, s"ntileExact diverged from NTILE at n=$n k=$k")
    }
    graft.operators.Dedup.clearCaches()
  }

  test("ntileExact ties break identically to the window's total order") {
    import spark.implicits._
    // heavy ties on v: the id tiebreaker must decide buckets on both paths
    val df = (1L to 50L).map(i => (i, (i % 3).toDouble)).toDF("id", "v")
    assert(pairs(Ranking.ntileExact(df, 10, Seq(col("v").desc, col("id")), "decile"))
      == pairs(viaWindow(df, 10)))
    graft.operators.Dedup.clearCaches()
  }

  test("ntileExact on an empty frame returns empty instead of dividing by zero") {
    import spark.implicits._
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    assert(Ranking.ntileExact(df, 10, Seq(col("v").desc, col("id")), "decile")
      .count() == 0L)
    graft.operators.Dedup.clearCaches()
  }

  test("quantilesCont equals percentile() bit-for-bit across group sizes, ties, nulls") {
    import spark.implicits._
    // groups: size 1, size 2, a tied group, a bigger group, and nulls
    val rows =
      Seq(("one", Some(5.0))) ++
        Seq(("two", Some(1.0)), ("two", Some(2.0))) ++
        (1 to 9).map(_ => ("tied", Some(3.0))) ++
        (1 to 97).map(i => ("big", Some((i * 7919 % 101).toDouble))) ++
        Seq(("big", None), ("two", None)) ++  // percentile ignores nulls
        Seq(("allnull", None), ("allnull", None)) ++ // NULL quantiles, row kept
        Seq((null: String, Some(4.0)), (null: String, Some(6.0))) // null KEY group
    val df = rows.toDF("g", "v")
    def key(r: org.apache.spark.sql.Row): String =
      Option(r.getString(0)).getOrElse("<null>")
    def vals(r: org.apache.spark.sql.Row): Seq[Option[Double]] =
      (1 to 5).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    val expected = df.groupBy(col("g"))
      .agg(expr("percentile(v, array(0.0, 0.25, 0.5, 0.9, 1.0))").as("ps"))
      .select(col("g") +: (0 until 5).map(i => col("ps").getItem(i)): _*)
      .collect().map(r => key(r) -> vals(r)).toMap
    val got = Ranking.quantilesCont(df, "g", "v",
      Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 0.9 -> "p90", 1.0 -> "p100"))
      .collect().map(r => key(r) -> vals(r)).toMap
    assert(got.keySet == expected.keySet,
      s"group sets differ: ${got.keySet} vs ${expected.keySet}")
    got.foreach { case (g, ps) =>
      assert(ps == expected(g), s"group $g: $ps != ${expected(g)}")
    }
    assert(got("allnull").forall(_.isEmpty),
      "an all-null group must surface with NULL quantiles, not vanish")
    graft.operators.Dedup.clearCaches()
  }

  test("quantilesCont scales to 1e5 groups with distributed bookkeeping (VERDICT r06 #7)") {
    import spark.implicits._
    // 100k groups × 3 deterministic values: the old driver-side
    // offset/target collect would ship ~100k×partitions rows through the
    // driver; the distributed form keeps it all in DataFrames. Spot-check
    // a sample of groups bit-for-bit against percentile().
    val df = (0L until 300000L)
      .map(i => (i % 100000L, ((i * 7919) % 1000).toDouble))
      .toDF("g", "v")
    val got = Ranking.quantilesCont(df, "g", "v", Seq(0.5 -> "p50"))
    assert(got.count() == 100000L)
    val sample = got.filter(col("g") % 9973L === 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = df.filter(col("g") % 9973L === 0L).groupBy(col("g"))
      .agg(expr("percentile(v, 0.5)").as("p50"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sample == expected, "sampled groups diverged from percentile()")
    graft.operators.Dedup.clearCaches()
  }

  test("quantilesCont handles infinities at integral positions like percentile()") {
    import spark.implicits._
    // p0/p100 are ALWAYS integral positions: the higher==lower case must
    // return the value itself, never 1*Inf + 0*Inf = NaN (code-review r6)
    val df = Seq(("g", 1.0), ("g", Double.PositiveInfinity),
      ("h", Double.NegativeInfinity), ("h", 2.0), ("h", 3.0))
      .toDF("g", "v")
    val expected = df.groupBy(col("g"))
      .agg(expr("percentile(v, array(0.0, 0.5, 1.0))").as("ps"))
      .select(col("g") +: (0 until 3).map(i => col("ps").getItem(i)): _*)
      .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
    val got = Ranking.quantilesCont(df, "g", "v",
      Seq(0.0 -> "p0", 0.5 -> "p50", 1.0 -> "p100"))
      .collect().map(r => r.getString(0) -> (1 to 3).map(r.getDouble)).toMap
    assert(got == expected, s"$got != $expected")
    assert(got("g")(2).isPosInfinity && got("h")(0).isNegInfinity)
    graft.operators.Dedup.clearCaches()
  }

  test("percentRank equals the PERCENT_RANK window incl. singleton and ties") {
    import spark.implicits._
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (n <- Seq(1, 2, 97, 500)) {
      // v has heavy ties (mod 5) — the unique id tiebreaker makes the
      // order total, so RANK == ROW_NUMBER and the window twin agrees
      val df = (1L to n.toLong).map(i => (i, (i % 5).toDouble)).toDF("id", "v")
      val expected = df.withColumn("pr",
          percent_rank().over(Window.orderBy(col("v").desc, col("id"))))
        .collect().map(r => r.getLong(0) -> r6(r.getDouble(2))).toMap
      val got = Ranking.percentRank(df, Seq(col("v").desc, col("id")), "pr")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got == expected, s"percentRank diverged at n=$n")
    }
    graft.operators.Dedup.clearCaches()
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Profiling passes: hand-computed histogram buckets, over-range
  * clamping, and the drift report's outer-join semantics (one-sided
  * buckets report 0 on the other side).
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("histogram buckets, edges, and over-range clamp") {
    val vals = Seq(0.0, 5.0, 9.9, 10.0, 25.0, 999.0).toDF("x")
    val got = Profiling.histogram(vals, col("x"), 10.0, 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // 999 clamps into bucket 2 alongside 25
    assert(got == Seq((0L, 0.0, 10.0, 3L), (1L, 10.0, 20.0, 1L),
      (2L, 20.0, 30.0, 2L)))
  }

  test("drift reports one-sided buckets as zero and exact deltas") {
    val before = Seq(1.0, 1.0, 15.0).toDF("x")
    val after = Seq(1.0, 25.0).toDF("x")
    val got = Profiling.histogramDrift(before, after, col("x"), 10.0, 3)
      .select("bucket", "n_before", "n_after", "delta")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 2L, 1L, -1L), (1L, 1L, 0L, -1L), (2L, 0L, 1L, 1L)))
  }

  test("tableProfile: one row per column with exact counts and native-typed extremes") {
    val df = Seq((1L, Some(10.5), "b"), (2L, None, "a"), (9L, Some(2.5), "c"))
      .toDF("k", "v", "s")
    val got = Profiling.tableProfile(df, Seq("k", "v", "s"))
      .select("column_name", "n_rows", "n_nulls", "min_value", "max_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4))).sortBy(_._1).toSeq
    // numeric min of v is 2.5 (native), not the lexicographic "10.5"
    assert(got == Seq(("k", 3L, 0L, "1", "9"), ("s", 3L, 0L, "a", "c"),
      ("v", 3L, 1L, "2.5", "10.5")))
  }

  test("tableProfile's approx_distinct stays within 5% of exact on real data") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val prof = Profiling.tableProfile(orders, Seq("o_orderkey", "o_orderstatus"))
      .select("column_name", "approx_distinct")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactKey = orders.select(countDistinct(col("o_orderkey"))).collect()(0).getLong(0)
    val exactStatus = orders.select(countDistinct(col("o_orderstatus"))).collect()(0).getLong(0)
    assert(math.abs(prof("o_orderkey") - exactKey).toDouble / exactKey <= 0.05)
    assert(math.abs(prof("o_orderstatus") - exactStatus).toDouble / exactStatus <= 0.05)
  }

  test("histogram excludes nulls and clamps negatives into bucket 0") {
    val vals = Seq(Some(-25.0), Some(5.0), None, Some(999.0)).toDF("x")
    val got = Profiling.histogram(vals, col("x"), 10.0, 3)
      .select("bucket", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // null vanishes; -25 clamps to bucket 0 (not -3); 999 to bucket 2
    assert(got == Seq((0L, 2L), (2L, 1L)))
  }

  test("histogram rejects bad shape parameters") {
    val vals = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException] {
      Profiling.histogram(vals, col("x"), 0.0, 3)
    }
    intercept[IllegalArgumentException] {
      Profiling.histogram(vals, col("x"), 10.0, 0)
    }
  }

  test("equiDepthHistogram: quartile edges on 1..8, two rows per bucket, edge ties go low") {
    val vals = (1 to 8).map(_.toDouble).toDF("x")
    val got = Profiling.equiDepthHistogram(vals, col("x"), 4)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // interpolated quartiles of 1..8: positions (N−1)·q = 1.75/3.5/5.25
    // → edges 1, 2.75, 4.5, 6.25, 8; each bucket catches exactly 2 values
    assert(got == Seq((0, 1.0, 2.75, 2L), (1, 2.75, 4.5, 2L),
      (2, 4.5, 6.25, 2L), (3, 6.25, 8.0, 2L)))
  }

  test("equiDepthHistogram: single bucket spans min..max; nulls excluded") {
    val vals = Seq(Some(3.0), None, Some(9.0)).toDF("x")
    val got = Profiling.equiDepthHistogram(vals, col("x"), 1)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0, 3.0, 9.0, 2L)))
  }

  test("ksDrift: hand-computed supremum, identical zero, disjoint one") {
    import org.apache.spark.sql.functions.col
    def df(vs: Double*) = vs.map(Tuple1(_)).toDF("v")
    // before {1,2,3} vs after {2,3,4}: max gap at v=1 -> |3-0|/9 = 1/3
    val r = Profiling.ksDrift(df(1, 2, 3), df(2, 3, 4), col("v")).collect().head
    graft.operators.Dedup.clearCaches()
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getDouble(2) == 0.333333)
    // identical distributions: D = 0
    val same = Profiling.ksDrift(df(5, 6, 6), df(6, 5, 6), col("v"))
      .collect().head
    graft.operators.Dedup.clearCaches()
    assert(same.getDouble(2) == 0.0)
    // disjoint supports: D = 1
    val far = Profiling.ksDrift(df(1, 2), df(10, 11), col("v")).collect().head
    graft.operators.Dedup.clearCaches()
    assert(far.getDouble(2) == 1.0)
  }

  test("ksDriftFromCounts agrees with ksDrift on expanded rows") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    val as = Seq.fill(40)(rnd.nextInt(8).toDouble)
    val bs = Seq.fill(55)(rnd.nextInt(8).toDouble + (rnd.nextInt(3) - 1))
    val raw = Profiling.ksDrift(as.map(Tuple1(_)).toDF("v"),
      bs.map(Tuple1(_)).toDF("v"), col("v")).collect().head
    graft.operators.Dedup.clearCaches()
    def counts(vs: Seq[Double]) =
      vs.groupBy(identity).map { case (v, o) => (v, o.size.toLong) }
        .toSeq.toDF("v", "cnt")
    val fromCounts = Profiling.ksDriftFromCounts(
      counts(as), counts(bs), "v", "cnt").collect().head
    graft.operators.Dedup.clearCaches()
    assert((raw.getLong(0), raw.getLong(1), raw.getDouble(2)) ==
      ((fromCounts.getLong(0), fromCounts.getLong(1), fromCounts.getDouble(2))))
  }

  test("ksDrift: an empty side reports NULL, nulls excluded, layout free") {
    import org.apache.spark.sql.functions.col
    val a = Seq(Some(1.0), Some(2.0), None).map(Tuple1(_)).toDF("v")
    val empty = Seq.empty[Tuple1[Double]].toDF("v")
    val r = Profiling.ksDrift(a, empty, col("v")).collect().head
    graft.operators.Dedup.clearCaches()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2))
    val b = Seq(2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val x = Profiling.ksDrift(a, b, col("v")).collect().head.getDouble(2)
    graft.operators.Dedup.clearCaches()
    val y = Profiling.ksDrift(a.repartition(5), b.repartition(3), col("v"))
      .collect().head.getDouble(2)
    graft.operators.Dedup.clearCaches()
    assert(x == y)
  }

  test("dfDrift: document frequency counts docs once, drift sign follows the shift") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "cat cat cat dog"), (2L, "cat fish"), (3L, "cat dog"))
      .toDF("doc_id", "text")
    val b = Seq((4L, "dog fish"), (5L, "dog bird"), (6L, "dog bird fish"))
      .toDF("doc_id", "text")
    val out = Profiling.dfDrift(a, b, "doc_id", "text", minDf = 2, k = 10)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("df_a"), r.getAs[Long]("df_b"),
          r.getAs[Double]("drift"))).toMap
    // "cat cat cat" counts ONE doc; cat: 3 vs 0, dog: 2 vs 3
    assert(out("cat")._1 == 3L && out("cat")._2 == 0L)
    assert(out("dog") == ((2L, 3L,
      math.BigDecimal(math.log((3.0 * 5.0) / (4.0 * 5.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out("cat")._3 > 0 && out("bird")._3 < 0)
    // minDf = 2 keeps fish (1+2) but a term seen once total is out
    assert(out.contains("fish"))
  }

  test("dfDrift: top-k slices by |drift| with term tiebreak") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "x y z w")).toDF("doc_id", "text")
    val b = Seq((2L, "x y z w")).toDF("doc_id", "text")
    // all four terms have identical drift — the k=2 slice must be the
    // lexicographically first two
    val terms = Profiling.dfDrift(a, b, "doc_id", "text", minDf = 2, k = 2)
      .collect().map(_.getAs[String]("term")).toSeq
    assert(terms == Seq("w", "x"))
  }

  test("kAnonymity flags under-populated quasi-identifier groups") {
    val df = (Seq.fill(5)(("en", "s0")) ++ Seq.fill(2)(("en", "s1")) ++
      Seq.fill(3)(("fr", "s0"))).toDF("lang", "source")
    val out = Profiling.kAnonymity(df, Seq("lang", "source"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Boolean]("anonymous"))).toMap
    assert(out(("en", "s0")) == ((5L, true)))
    assert(out(("en", "s1")) == ((2L, false)))
    assert(out(("fr", "s0")) == ((3L, true)))
  }

  test("lDiversity flags k-large groups with too few sensitive values") {
    // "en" is populous but every row shares ONE source — k-anonymous yet
    // NOT diverse, the leak l-diversity exists to catch
    val df = (Seq.fill(6)(("en", "s0")) ++
      Seq(("fr", "s0"), ("fr", "s1"), ("fr", "s2"))).toDF("lang", "source")
    val out = Profiling.lDiversity(df, Seq("lang"), "source", l = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_sensitive"),
          r.getAs[Boolean]("diverse"))).toMap
    assert(out("en") == ((6L, 1L, false)))
    assert(out("fr") == ((3L, 3L, true)))
    intercept[IllegalArgumentException](
      Profiling.lDiversity(df, Seq.empty, "source", 2L))
  }
}

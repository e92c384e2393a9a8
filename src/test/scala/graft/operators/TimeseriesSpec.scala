package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

/** Time-weighted averaging: hand-computed weighting, single-sample
  * exclusion, tie neutrality, layout independence.
  */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("durations weight values; the last sample carries no weight") {
    // key 1: v=10 for 1s, v=20 for 3s, v=99 (last, unweighted)
    // tw = (10*1 + 20*3) / 4 = 17.5
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(1000), 20.0), (1L, ts(4000), 99.0),
      (2L, ts(0), 5.0) // single sample: excluded
    ).toDF("k", "ts", "value")
    val got = Timeseries.timeWeightedAvg(ev, "k", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 17.5, 4000000L)))
  }

  test("tied timestamps contribute zero duration, any order") {
    // two samples at t=1000 with different values: whichever leads, its
    // dt is 0 — the result cannot depend on tie order
    val ev = Seq(
      (1L, ts(0), 10.0), (1L, ts(1000), 50.0), (1L, ts(1000), 70.0),
      (1L, ts(2000), 0.0)
    ).toDF("k", "ts", "value")
    // 10*1s + 50*0 + 70*1s over 2s = 40.0  (v-ordered tie: 50 first)
    val a = Timeseries.timeWeightedAvg(ev, "k", "ts", "value")
      .collect()(0).getDouble(1)
    val b = Timeseries.timeWeightedAvg(ev.repartition(7), "k", "ts", "value")
      .collect()(0).getDouble(1)
    assert(a == 40.0 && b == 40.0)
  }

  test("resampleLocf: regular grid, forward fill, on-sample grid points") {
    // samples at 0s(=10), 3s(=30); grid step 1s → 0,1,2,3 filled 10,10,10,30
    val ev = Seq((1L, ts(0), 10.0), (1L, ts(3000), 30.0))
      .toDF("k", "ts", "value")
    val got = Timeseries.resampleLocf(ev, "k", "ts", "value", 1000000L)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 10.0), (1000000L, 10.0), (2000000L, 10.0),
      (3000000L, 30.0)))
  }

  test("resampleLocf: tied samples collapse to max; layout independent") {
    val ev = Seq((1L, ts(0), 10.0), (1L, ts(0), 20.0), (1L, ts(2000), 5.0))
      .toDF("k", "ts", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Timeseries.resampleLocf(df, "k", "ts", "value", 1000000L)
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val want = Seq((0L, 20.0), (1000000L, 20.0), (2000000L, 5.0))
    assert(run(ev) == want && run(ev.repartition(7)) == want)
  }

  test("null-valued samples are excluded from the timeline, not weighted past") {
    val ev = Seq((1L, ts(0), Some(10.0)), (1L, ts(1000), None),
      (1L, ts(2000), Some(30.0)), (1L, ts(3000), Some(0.0)))
      .toDF("k", "ts", "value")
    // null sample vanishes: 10 holds 2s, 30 holds 1s → (20+30)/3
    val tw = Timeseries.timeWeightedAvg(ev, "k", "ts", "value")
      .collect()(0).getDouble(1)
    assert(tw == math.rint(50.0 / 3 * 1e6) / 1e6)
    val rs = Timeseries.resampleLocf(ev, "k", "ts", "value", 1000000L)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(rs == Seq((0L, 10.0), (1000000L, 10.0), (2000000L, 30.0),
      (3000000L, 0.0)))
  }

  test("an empty frame and all-singleton keys yield no rows") {
    val ev = Seq((1L, ts(0), 1.0), (2L, ts(5), 2.0)).toDF("k", "ts", "value")
    assert(Timeseries.timeWeightedAvg(ev, "k", "ts", "value").count() == 0L)
  }

  test("ewma: hand-computed recurrence, alpha respected, nulls excluded") {
    val ev = Seq(
      (1L, ts(0), Some(10.0)), (1L, ts(1000), Some(20.0)),
      (1L, ts(2000), Some(30.0)),
      (2L, ts(0), Some(7.0)),
      (3L, ts(0), None: Option[Double])
    ).toDF("k", "ts", "value")
    val got = Timeseries.ewma(ev, "k", "ts", "value", alpha = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // s1=10, s2=.5*20+.5*10=15, s3=.5*30+.5*15=22.5
    assert(got(1L) == ((3L, 22.5)))
    assert(got(2L) == ((1L, 7.0))) // single sample: ewma = x1
    assert(!got.contains(3L)) // all-null key yields no row
  }

  test("ewma: order comes from time, not arrival; layout independent") {
    val ev = Seq(
      (1L, ts(2000), 30.0), (1L, ts(0), 10.0), (1L, ts(1000), 20.0)
    ).toDF("k", "ts", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Timeseries.ewma(df, "k", "ts", "value", alpha = 0.5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run(ev) == Seq((1L, 22.5)))
    assert(run(ev.repartition(7)) == Seq((1L, 22.5)))
  }

  test("resampleLinear: hand-computed interpolation, exact on-sample points") {
    // samples 0s(=10), 4s(=30); grid 1s → 10, 15, 20, 25, 30
    val ev = Seq((1L, ts(0), 10.0), (1L, ts(4000), 30.0))
      .toDF("k", "ts", "value")
    val got = Timeseries.resampleLinear(ev, "k", "ts", "value", 1000000L)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 10.0), (1000000L, 15.0), (2000000L, 20.0),
      (3000000L, 25.0), (4000000L, 30.0)))
  }

  test("resampleLinear: brackets pick the NEAREST samples, ties collapse, layout free") {
    // samples 0s(=10), 2s(=20), 3s(=14): the 1s point interpolates
    // 0s→2s (value 15), never 0s→3s; tied samples at 2s collapse to max
    val ev = Seq((1L, ts(0), 10.0), (1L, ts(2000), 20.0),
      (1L, ts(2000), 7.0), (1L, ts(3000), 14.0)).toDF("k", "ts", "value")
    def run(df: org.apache.spark.sql.DataFrame) =
      Timeseries.resampleLinear(df, "k", "ts", "value", 1000000L)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val want = Seq((0L, 10.0), (1000000L, 15.0), (2000000L, 20.0),
      (3000000L, 14.0))
    assert(run(ev) == want && run(ev.repartition(5)) == want)
  }
}

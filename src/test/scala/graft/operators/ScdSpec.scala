package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SCD Type-2 history build: hand-computed runs, null-payload
  * transitions, single-row and constant histories, null order rows,
  * partition-layout independence, and the point-in-time lookup.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  // key 1: A, A, B, A → three runs (only CONSECUTIVE repeats collapse);
  // key 2: constant → one current run.
  private val log = Seq(
    (1L, 1L, "A"), (1L, 2L, "A"), (1L, 3L, "B"), (1L, 4L, "A"),
    (2L, 1L, "X"), (2L, 2L, "X")
  ).toDF("k", "v", "status")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "effective_from", "effective_to", "is_current", "status")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("consecutive identical payloads collapse; re-appearing values reopen") {
    assert(rows(Scd.buildType2(log, Seq("k"), "v")) == Seq(
      (1L, 1L, 3L, false, "A"),
      (1L, 3L, 4L, false, "B"),
      (1L, 4L, -1L, true, "A"),
      (2L, 1L, -1L, true, "X")))
  }

  test("null -> value is a change; null -> null collapses") {
    val l = Seq((1L, 1L, None), (1L, 2L, None), (1L, 3L, Some("A")))
      .toDF("k", "v", "status")
    val got = Scd.buildType2(l, Seq("k"), "v")
      .select("effective_from", "effective_to", "status")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 3L, null), (3L, -1L, "A")))
  }

  test("rows with a null order value are dropped") {
    val l = Seq((1L, Some(1L), "A"), (1L, None, "B"), (1L, Some(2L), "C"))
      .toDF("k", "v", "status")
    val got = Scd.buildType2(l, Seq("k"), "v")
      .select("status").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("A", "C"))
  }

  test("result is independent of the input partition layout") {
    val a = rows(Scd.buildType2(log, Seq("k"), "v"))
    val b = rows(Scd.buildType2(log.repartition(7), Seq("k"), "v"))
    assert(a == b)
  }

  test("every order value lands inside exactly one interval of its key") {
    val scd = Scd.buildType2(log, Seq("k"), "v")
    log.select("k", "v").collect().foreach { r =>
      val hits = scd.filter(col("k") === r.getLong(0) &&
        col("effective_from") <= r.getLong(1) &&
        (col("effective_to").isNull || lit(r.getLong(1)) < col("effective_to")))
      assert(hits.count() == 1L, s"row $r")
    }
  }

  test("asOf returns the one run covering the probe time") {
    val scd = Scd.buildType2(log, Seq("k"), "v")
    val at3 = Scd.asOf(scd, lit(3L)).select("k", "status")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(at3 == Seq((1L, "B"), (2L, "X")))
    // before any history for the key → no row
    assert(Scd.asOf(scd, lit(0L)).count() == 0L)
  }

  test("buildType2 rejects a key/order overlap and missing columns") {
    intercept[IllegalArgumentException] {
      Scd.buildType2(log, Seq("v"), "v")
    }
    intercept[IllegalArgumentException] {
      Scd.buildType2(log, Seq("nope"), "v")
    }
  }

  test("enrichAsOf joins each fact to the run valid at its time") {
    val scd = Scd.buildType2(log, Seq("k"), "v")
    val facts = Seq((1L, 10L, 1L), (1L, 11L, 3L), (1L, 12L, 9L),
      (2L, 13L, 1L), (3L, 14L, 5L)).toDF("k", "fact_id", "t")
    val got = Scd.enrichAsOf(facts, scd, Seq("k"), "t")
      .select("fact_id", "status")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1))).sortBy(_._1).toSeq
    // t=1 → A's first run, t=3 → B, t=9 → current A, unknown key → null
    assert(got == Seq((10L, "A"), (11L, "B"), (12L, "A"), (13L, "X"), (14L, null)))
  }

  test("enrichAsOf preserves fact multiplicity (disjoint intervals, no blowup)") {
    val scd = Scd.buildType2(log, Seq("k"), "v")
    val facts = Seq((1L, 2L), (1L, 2L), (1L, 99L)).toDF("k", "t")
    assert(Scd.enrichAsOf(facts, scd, Seq("k"), "t").count() == 3L)
  }

  test("enrichAsOf rejects fact/payload column collisions") {
    val scd = Scd.buildType2(log, Seq("k"), "v")
    val facts = Seq((1L, 2L, "x")).toDF("k", "t", "status")
    intercept[IllegalArgumentException] {
      Scd.enrichAsOf(facts, scd, Seq("k"), "t")
    }
  }

  test("enrichAsOf enriches a STREAMING fact source against the static dimension") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val scd = Scd.buildType2(log, Seq("k"), "v")
    val in = MemoryStream[(Long, Long, Long)]
    in.addData((1L, 10L, 1L), (1L, 11L, 3L))
    in.addData((2L, 12L, 5L))
    val enriched = Scd.enrichAsOf(
      in.toDF().toDF("k", "fact_id", "t"), scd, Seq("k"), "t")
    val q = enriched.writeStream.format("memory")
      .queryName("scd_enrich_stream")
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally q.stop()
    val got = spark.table("scd_enrich_stream")
      .select("fact_id", "status")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((10L, "A"), (11L, "B"), (12L, "X")))
  }
}

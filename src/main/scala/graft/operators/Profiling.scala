package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling passes — the monitoring reads that run before (and
  * between) quality gates at 100 TB: equi-width histograms and the
  * drift report between two relations' histograms (typically two
  * versions of one table via the stores' `versionAsOf`). Counts are
  * integer-exact and the bucket arithmetic is a single floor/clamp an
  * external engine replicates term by term, so the whole family
  * hash-compares.
  */
object Profiling {

  /** Equi-width histogram of `value`: `nBuckets` buckets of `width`
    * starting at 0, over-range values clamped into the last bucket.
    * Fixed bounds, not a data-dependent min/max pass — a two-pass form
    * divides by a float range that drifts across engines, and at scale
    * it costs a second full read. One map-side-combined aggregation on
    * ≤ `nBuckets` keys.
    */
  def histogram(df: DataFrame, value: Column, width: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && width > 0, "histogram needs nBuckets >= 1, width > 0")
    df.select(least(lit(nBuckets - 1L),
        floor(value.cast("double") / width)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        ((col("bucket") + 1) * width).as("hi"), col("n"))
  }

  /** Histogram drift between `before` and `after` on the same `value`
    * expression: per-bucket counts from both sides full-outer-joined on
    * the bucket id (a bucket present on one side only reports 0 on the
    * other), with the integer delta. Two bounded aggregations plus a
    * ≤ `nBuckets`-row join — the shape of the report is O(buckets)
    * regardless of table size, which is what a per-commit monitoring
    * hook needs.
    */
  def histogramDrift(before: DataFrame, after: DataFrame, value: Column,
                     width: Double, nBuckets: Int): DataFrame = {
    val h0 = histogram(before, value, width, nBuckets)
      .select(col("bucket"), col("n").as("n_before"))
    val h1 = histogram(after, value, width, nBuckets)
      .select(col("bucket"), col("n").as("n_after"))
    h0.join(h1, Seq("bucket"), "full_outer")
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        ((col("bucket") + 1) * width).as("hi"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .withColumn("delta", col("n_after") - col("n_before"))
  }
}

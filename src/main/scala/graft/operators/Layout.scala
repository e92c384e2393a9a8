package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — the multi-dimensional file-skipping
  * organization for large parquet lakes: interleave the bits of several
  * bounded dimension keys into one sort key, range-partition and sort on
  * it, and every resulting file covers a small HYPERCUBE of the key
  * space instead of a thin slice of one dimension. Min/max footer stats
  * then prune scans on ANY of the interleaved dimensions, not just the
  * leading sort column — the layout a 100 TB table wants when queries
  * filter on more than one key.
  *
  * The z-value is a statically-unrolled bitwise expression
  * (shift/and/or only — codegen'd, ANSI-safe, no UDF, no lambda), and
  * its arithmetic is simple enough for an external engine to replicate
  * term by term, which is exactly what the s_zorder oracle does.
  */
object Layout {

  /** The Morton interleave of `cols`, `bits` low bits each (values are
    * masked to `bits` bits first, so out-of-range inputs degrade to
    * deterministic wraparound rather than corrupt interleaves; inputs
    * are expected non-negative). Bit b of column i lands at position
    * b·k + i of the result. k·bits must fit a long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "zValue needs at least one column")
    require(bits >= 1 && k * bits <= 63,
      s"$k columns x $bits bits must fit a positive long")
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      b <- 0 until bits
      (c, i) <- masked.zipWithIndex
    } yield shiftleft(
      shiftrightunsigned(c, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Lay `df` out in z-order over `zcols`: one range exchange on the
    * z-value (distributed sampling picks balanced boundaries) plus
    * spillable in-partition sorts — the standard write-side layout pass,
    * same cost class as any global sort, no single-partition stage.
    * Write the result with a file-per-partition sink and min/max pruning
    * works on every interleaved dimension.
    */
  def zorder(df: DataFrame, zcols: Seq[Column], bits: Int,
             numPartitions: Int = 0): DataFrame = {
    val z = zValue(zcols, bits)
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, z)
      else df.repartitionByRange(z)
    ranged.sortWithinPartitions(z)
  }

  /** Per-file column statistics for the parquet table at `path` — the
    * data-skipping index that turns a clustered layout (z-order, range
    * partition) into skipped I/O: one row per file with row/null counts
    * and min/max per stat column. One distributed aggregation, map-side
    * combined, keyed by file (≤ one output row per file — the same
    * cardinality a manifest store tracks). Collect it once at write
    * time and persist it next to the table; [[skippingRead]] prunes
    * scans against it.
    */
  def fileStats(spark: org.apache.spark.sql.SparkSession, path: String,
                statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "fileStats needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c => Seq(
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        count(lit(1)).minus(count(col(c))).as(s"${c}_nulls")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read the parquet table at `path` keeping only the files whose
    * [min, max] footer range for `column` (per `stats`, a [[fileStats]]
    * frame) can contain a value in [lo, hi], then re-apply the exact
    * predicate. A file whose stats are all-null holds no non-null
    * values of `column`, and a range predicate never matches NULL — so
    * skipping it is exact, not approximate. The matching file list is
    * collected on the driver: it is bounded by the FILE count (what a
    * table format's manifest read does), never by rows.
    */
  def skippingRead(spark: org.apache.spark.sql.SparkSession, path: String,
                   stats: DataFrame, column: String,
                   lo: Column, hi: Column): DataFrame = {
    val files = stats
      .filter(col(s"${column}_max") >= lo && col(s"${column}_min") <= hi)
      .select(col("file")).collect().map(_.getString(0))
    val exact = col(column) >= lo && col(column) <= hi
    if (files.isEmpty) {
      val schema = spark.read.parquet(path).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(files: _*).filter(exact)
  }
}

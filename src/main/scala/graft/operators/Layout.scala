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
  /** Small-file compaction — the table-maintenance pass every streaming
    * or incremental writer eventually owes its readers: micro-batch
    * sinks and per-partition upserts leave thousands of KB-grade files,
    * and at 100 TB the scan's task-scheduling and footer-read overhead
    * ends up dominating actual I/O. Bin-packs the table's files into
    * ~`targetBytes` output files and rewrites once:
    *
    *  1. PLAN on the driver from the file LISTING only — names + sizes,
    *     O(files) metadata, the manifest-read class, never rows. Bins
    *     are first-fit-decreasing over (size DESC, name) — a published
    *     2-approximation, and deterministic because the order is total.
    *  2. REWRITE in one distributed pass: rows join to their file's bin
    *     id through a broadcast (file → bin) frame keyed by
    *     `input_file_name()`, then a hash repartition on the bin id
    *     writes one file per non-empty partition. A hash collision
    *     between bins merges them into one larger output file — the
    *     file COUNT bound (≤ bins ≤ ⌈total/target⌉ + files-larger-
    *     than-target) holds regardless, and compaction's contract is
    *     fewer-larger files, not exact sizes.
    *
    * Contents are untouched (same rows, snappy parquet) — the s_compact
    * oracle reads the compacted table back against the source SQL.
    *
    * @return the bin count planned (output file count is ≤ this)
    */
  /** (file URI, size) for every input file of the parquet table — the
    * shared O(files) driver listing behind [[compact]] and [[optimize]]
    * (code-review r7f: one helper, one RPC pattern).
    */
  private def fileSizes(spark: org.apache.spark.sql.SparkSession,
                        path: String): Seq[(String, Long)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(path).inputFiles.toSeq
      .map(f => f -> fs.getFileStatus(new Path(new java.net.URI(f))).getLen)
  }

  /** Self-overwrite guard shared by [[compact]]/[[optimize]]: raw string
    * inequality would let a trailing slash or a `file://` scheme variant
    * of the SAME location through, and `overwrite` would then delete the
    * input mid-read (code-review r7g) — compare fully-qualified paths.
    */
  private def requireDistinctPaths(spark: org.apache.spark.sql.SparkSession,
                                   path: String, outPath: String,
                                   op: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String) = {
      val hp = new Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    require(qualified(outPath) != qualified(path),
      s"$op cannot overwrite the table it is reading: $path")
  }

  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              outPath: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"compact needs a positive target, got $targetBytes")
    requireDistinctPaths(spark, path, outPath, "compact")
    val files = fileSizes(spark, path)
    require(files.nonEmpty, s"compact: no input files under $path")
    // first-fit-decreasing over a total order -> deterministic plan
    val bins = scala.collection.mutable.ArrayBuffer[(Long, Int)]() // (free, id)
    val assign = files.sortBy { case (f, len) => (-len, f) }.map { case (f, len) =>
      bins.indexWhere(_._1 >= len) match {
        case -1 =>
          bins += ((targetBytes - len) -> bins.size)
          f -> (bins.size - 1)
        case i =>
          val (free, id) = bins(i)
          bins(i) = (free - len) -> id
          f -> id
      }
    }
    val plan = spark.createDataFrame(assign).toDF("__file", "__bin")
    // LEFT join + loud failure, not inner: if input_file_name() ever
    // disagreed with inputFiles' URI form, an inner join would silently
    // DROP those rows from the compacted table
    spark.read.parquet(path)
      .withColumn("__file", input_file_name())
      .join(broadcast(plan), Seq("__file"), "left")
      .withColumn("__bin", when(col("__bin").isNull,
          raise_error(concat(lit("compact: unplanned input file "), col("__file"))))
        .otherwise(col("__bin")))
      .repartition(bins.size, col("__bin"))
      .drop("__file", "__bin")
      .write.mode("overwrite").parquet(outPath)
    bins.size
  }

  /** Table OPTIMIZE — the periodic maintenance pass a lake table owes
    * its readers (the Delta `OPTIMIZE … ZORDER BY` shape): ONE rewrite
    * that simultaneously compacts small files and clusters rows, then
    * returns the file-stats skipping index of the result. Compaction
    * falls out of the z-order exchange itself: the output partition
    * count is ⌈total bytes / targetBytes⌉ (total from the file LISTING
    * — O(files) driver metadata, the [[compact]] planning class), so the
    * range exchange that buys multi-dimension file skipping ALSO merges
    * the small files — no second pass, no separate bin-packing join.
    * Rows are untouched; the s_optimize oracle reads the rewritten
    * table back against the source.
    */
  def optimize(spark: org.apache.spark.sql.SparkSession, path: String,
               outPath: String, zcols: Seq[String], bits: Int,
               targetBytes: Long, statCols: Seq[String]): DataFrame = {
    require(targetBytes > 0, s"optimize needs a positive target, got $targetBytes")
    require(zcols.nonEmpty, "optimize needs at least one z-order column")
    requireDistinctPaths(spark, path, outPath, "optimize")
    val total = fileSizes(spark, path).map(_._2).sum
    val parts = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    zorder(spark.read.parquet(path), zcols.map(col), bits, parts)
      .write.mode("overwrite").parquet(outPath)
    fileStats(spark, outPath, statCols)
  }

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

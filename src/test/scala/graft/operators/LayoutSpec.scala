package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout: hand-computed Morton codes, out-of-range masking, the
  * hypercube-locality property that makes min/max pruning work on every
  * interleaved dimension, and disjoint partition z-ranges after the
  * layout pass.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches hand-computed Morton codes") {
    // x=3 (011), y=5 (101), 3 bits: bit0 x->1, y->2; bit1 x->4, y->0;
    // bit2 x->0, y->32  =>  z = 39
    val df = Seq((3L, 5L)).toDF("x", "y")
    val z = df.select(Layout.zValue(Seq(col("x"), col("y")), 3)).collect()(0).getLong(0)
    assert(z == 39L)
    // one column degenerates to the identity on its masked bits
    val one = Seq(6L).toDF("x")
      .select(Layout.zValue(Seq(col("x")), 3)).collect()(0).getLong(0)
    assert(one == 6L)
  }

  test("zValue masks out-of-range values to their low bits") {
    val df = Seq((1027L, 5L), (3L, 5L)).toDF("x", "y") // 1027 = 1024 + 3
    val z = df.select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) == z(1))
  }

  test("zValue rejects interleaves that overflow a long") {
    intercept[IllegalArgumentException] {
      Layout.zValue(Seq(col("x"), col("y")), 32)
    }
  }

  test("consecutive z-ranges cover square tiles, not thin slices") {
    // the full 32x32 grid: each block of 64 consecutive z-values is
    // exactly an 8x8 tile, so BOTH dimensions' spans stay 8 — a
    // single-dimension sort would give y-spans of 32 (thin slices)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val spans = grid
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 5))
      .withColumn("block", expr("z div 64"))
      .groupBy("block")
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"))
      .collect()
    assert(spans.length == 16)
    assert(spans.forall(r => r.getAs[Long]("xs") == 7L && r.getAs[Long]("ys") == 7L),
      "every 64-cell z-block must be an 8x8 tile")
  }

  test("zorder produces disjoint per-partition z-ranges") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val laid = Layout.zorder(grid, Seq(col("x"), col("y")), 5, numPartitions = 8)
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 5))
      .withColumn("pid", spark_partition_id())
    val ranges = laid.groupBy("pid")
      .agg(min("z").as("lo"), max("z").as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    assert(ranges.length > 1, "the range exchange must produce several partitions")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"partition z-ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }

  // ---- file-stats data skipping ----

  private def writeRanged(n: Int, parts: Int): String = {
    val dir = graft.util.Scratch.dir("graft_skip")
    (0 until n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(parts, col("k")).write.mode("overwrite").parquet(dir)
    dir
  }

  test("fileStats reports per-file min/max/null counts") {
    val dir = graft.util.Scratch.dir("graft_skip_stats")
    Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None))
      .toDF("k", "t").coalesce(1).write.mode("overwrite").parquet(dir)
    val st = Layout.fileStats(spark, dir, Seq("t")).collect()
    assert(st.length == 1)
    assert(st(0).getAs[Long]("n_rows") == 3L)
    assert(st(0).getAs[Long]("t_min") == 10L)
    assert(st(0).getAs[Long]("t_max") == 20L)
    assert(st(0).getAs[Long]("t_nulls") == 1L)
  }

  test("skippingRead returns exactly the full-scan filter rows while pruning files") {
    val dir = writeRanged(1000, 10)
    val stats = Layout.fileStats(spark, dir, Seq("k"))
    assert(stats.count() == 10L)
    val got = Layout.skippingRead(spark, dir, stats, "k", lit(150L), lit(249L))
    // a 100-wide range over range-partitioned files touches ~2 of 10
    val touched = got.select(input_file_name()).distinct().count()
    assert(touched <= 3L, s"expected <=3 files read, got $touched")
    val want = spark.read.parquet(dir)
      .filter(col("k").between(150L, 249L))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val gotSet = got.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(gotSet == want && want.size == 100)
  }

  test("skippingRead with no matching file is empty but keeps the schema") {
    val dir = writeRanged(100, 4)
    val stats = Layout.fileStats(spark, dir, Seq("k"))
    val got = Layout.skippingRead(spark, dir, stats, "k", lit(5000L), lit(6000L))
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("k", "v"))
  }

  test("z-order + stats skip on the SECOND interleaved dimension too") {
    // 32x32 grid z-ordered into 16 files = sixteen 8x8 tiles: a y-slice
    // of height 8 intersects only the 4 tiles of its y-band — pruning
    // on y, which a plain sort by x could never give
    val dir = graft.util.Scratch.dir("graft_skip_z")
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    Layout.zorder(grid, Seq(col("x"), col("y")), 5, numPartitions = 16)
      .write.mode("overwrite").parquet(dir)
    val stats = Layout.fileStats(spark, dir, Seq("y"))
    assert(stats.count() == 16L)
    val got = Layout.skippingRead(spark, dir, stats, "y", lit(8L), lit(15L))
    val touched = got.select(input_file_name()).distinct().count()
    assert(touched <= 4L, s"y-band should touch <=4 of 16 z-tiles, got $touched")
    assert(got.count() == 32L * 8L)
  }

  test("an all-null file is skipped exactly: range predicates never match NULL") {
    val dir = graft.util.Scratch.dir("graft_skip_null")
    Seq[(Long, Option[Long])]((1L, None), (2L, None)).toDF("k", "t")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val stats = Layout.fileStats(spark, dir, Seq("t"))
    val got = Layout.skippingRead(spark, dir, stats, "t", lit(0L), lit(100L))
    assert(got.count() == 0L)
  }

  private def parquetFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq.map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))

  test("compact collapses scattered small files and preserves every row") {
    val in = graft.util.Scratch.dir("graft_compact_scatter")
    val out = graft.util.Scratch.dir("graft_compact_merged")
    val df = (1L to 5000L).map(i => (i, s"v$i")).toDF("k", "v")
    df.repartition(40).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size == 40)
    val bins = Layout.compact(spark, in, out, targetBytes = 512L * 1024 * 1024)
    assert(bins == 1, s"everything fits one huge bin, planned $bins")
    assert(parquetFiles(out).size == 1)
    val got = spark.read.parquet(out).collect().map(_.toSeq).toSet
    assert(got == df.collect().map(_.toSeq).toSet)
  }

  test("compact gives an oversized file its own bin instead of losing it") {
    val in = graft.util.Scratch.dir("graft_compact_big")
    val out = graft.util.Scratch.dir("graft_compact_bigout")
    (1L to 2000L).map(i => (i, "x" * 50)).toDF("k", "v")
      .repartition(4).write.mode("overwrite").parquet(in)
    // target far below any file size -> every file is "oversized"
    val bins = Layout.compact(spark, in, out, targetBytes = 1L)
    assert(bins == 4)
    assert(spark.read.parquet(out).count() == 2000L)
  }

  test("optimize compacts AND clusters in one rewrite, returning the skip index") {
    val in = graft.util.Scratch.dir("graft_opt_scatter")
    val out = graft.util.Scratch.dir("graft_opt_done")
    val df = (0L until 4000L).map(i => (i % 64, i / 64, s"r$i"))
      .toDF("x", "y", "v")
    df.repartition(40).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size == 40)
    val stats = Layout.optimize(spark, in, out, zcols = Seq("x", "y"),
      bits = 8, targetBytes = 512L * 1024 * 1024, statCols = Seq("x"))
    // one huge target bin -> one output file; rows preserved exactly
    assert(parquetFiles(out).size == 1)
    assert(spark.read.parquet(out).collect().map(_.toSeq).toSet ==
      df.collect().map(_.toSeq).toSet)
    // the returned index covers that file with exact x bounds
    val s = stats.collect()
    assert(s.length == 1 && s.head.getAs[Long]("n_rows") == 4000L)
    assert(s.head.getAs[Long]("x_min") == 0L && s.head.getAs[Long]("x_max") == 63L)
  }

  test("optimize with a small target splits into clustered multi-file output") {
    val in = graft.util.Scratch.dir("graft_opt_multi")
    val out = graft.util.Scratch.dir("graft_opt_multiout")
    (0L until 8000L).map(i => (i % 256, (i * 7) % 256, i))
      .toDF("x", "y", "id")
      .repartition(8).write.mode("overwrite").parquet(in)
    val inBytes = new java.io.File(in).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
    val target = inBytes / 4
    Layout.optimize(spark, in, out, zcols = Seq("x", "y"), bits = 8,
      targetBytes = target, statCols = Seq("x", "y"))
    val outFiles = parquetFiles(out)
    // ~4 planned partitions (range exchange may leave some empty)
    assert(outFiles.nonEmpty && outFiles.size <= 5,
      s"expected <= 5 clustered files, got ${outFiles.size}")
    assert(spark.read.parquet(out).count() == 8000L)
  }
}

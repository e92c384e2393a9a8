package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Tooling (driver-style, like graft.Profile): time individual registered
  * queries under the bench protocol — one untimed warm-up, then the MIN of
  * `runs` timed passes with the cache cleared before each — without paying
  * for the whole headline set. Backs the per-query work loops and the
  * cross-SF scaling table (docs/SCALING.md).
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <runs> <query> [query ...]
  *        (query "ALL" = the full SparkEntry.headline set)
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names =
      if (args.drop(2).sameElements(Array("ALL"))) graft.SparkEntry.headline
      else args.drop(2).toSeq
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/region.parquet").count() // session warm-up
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      val best = (1 to runs).map { _ =>
        spark.catalog.clearCache(); once()
      }.min
      println(f"[timequery] $name%-32s $best%8.3f s")
    }
    spark.stop()
  }
}

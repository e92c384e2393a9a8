package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[qtime] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = EntryFixtures.docsWithPlantedDups(spark, sfDir)
    docs.count()
    t("probe") {
      !docs.groupBy(sha2(col("text"), 256).as("__dig"))
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1L).isEmpty
    }
    spark.catalog.clearCache(); graft.util.Caches.clear()
    t("nearDup collapse=false") {
      graft.operators.Dedup.nearDuplicates(docs, "doc_id", "text", 0.5,
        collapseExact = false).count()
    }
    spark.catalog.clearCache(); graft.util.Caches.clear()
    t("nearDup collapse=true(probe)") {
      graft.operators.Dedup.nearDuplicates(docs, "doc_id", "text", 0.5).count()
    }
    spark.catalog.clearCache(); graft.util.Caches.clear()
    t("dedup_near_valid full") {
      SparkEntry.queries("dedup_near_valid")(spark, sfDir).count()
    }
    spark.stop()
  }
}

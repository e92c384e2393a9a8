package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Stage-level profiler for the near-dup pipeline (tooling, driver-run). */
object Profile {
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
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = SparkEntry.docsWithPlantedDups(spark, sfDir)
    docs.count() // warm
    t("docs.count")(docs.count())
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
    t("minhash.count")(sigs.count())
    val banded = Dedup.bandSignatures(sigs, "doc_id", 16, 4)
    t("bands.count")(banded.count())
    val bp = banded.persist()
    bp.count()
    val cands = Dedup.lshCandidates(bp, "doc_id")
    t("candidates.count")(cands.count())
    val jac = Dedup.jaccardVerify(cands, docs, "doc_id", "text")
    t("jaccard.count")(jac.count())
    t("full nearDuplicates")(
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}

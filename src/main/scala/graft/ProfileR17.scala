package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Round-17 stage-level decomposition of the bench's top-cost queries
  * (tooling, guide §1: measure first — isolate which stage of each
  * expensive query actually carries the time before touching anything).
  * `runMain graft.ProfileR17 [sfDir] [section ...]`
  */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections =
      if (args.length > 1) args.drop(1).toSet else Set("spans", "train", "wet", "contained")
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p17] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    spark.read.parquet(s"$sfDir/region.parquet").count() // session warm-up

    if (sections("spans")) {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val planted = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      planted.count()
      val grams = planted
        .filter(length(col("text")) >= 50)
        .select(col("doc_id"),
          explode(sequence(lit(0), length(col("text")) - 50)).as("pi"),
          col("text"))
        .select(col("doc_id"), col("pi").cast("long").as("p"),
          md5(expr(s"substring(text, pi + 1, 50)")).as("g"))
      for (i <- 1 to 2) {
        t(s"spans: gram pass alone #$i")(grams.count())
        t(s"spans: dup-digest agg #$i")(
          grams.groupBy(col("g")).agg(count(lit(1)).as("occ"))
            .filter(col("occ") >= 2).count())
        t(s"spans: full query #$i")(
          Dedup.duplicatedSpans(planted, "doc_id", "text", gramLen = 50).count())
      }
    }

    if (sections("train")) {
      val labeled = EntryFixtures.qualityLabeled(spark, sfDir)
      labeled.count()
      for (i <- 1 to 2) {
        t(s"qtrain: features pass #$i")(
          graft.operators.Classify.features(labeled, "doc_id", "text", 1 << 16).count())
        val model = t(s"qtrain: train 15 iters #$i")(
          graft.operators.Classify.train(labeled, "doc_id", "text", "label",
            dim = 1 << 16, iters = 15, lr = 0.8))
        t(s"qtrain: score #$i")(
          graft.operators.Classify.score(labeled, "doc_id", "text", model).count())
      }
      val langs = Seq("de", "en", "es", "fr")
      val markers = langs.map(l =>
        (graft.functions.Text.stopwords(l).mkString(" ") + " ") * 3)
      val markerCol = element_at(
        array(markers.map(lit): _*), (col("doc_id") % 4).cast("int") + 1)
      val langCol = element_at(
        array(langs.map(lit): _*), (col("doc_id") % 4).cast("int") + 1)
      val lab2 = Tables.documents(spark, sfDir).select(col("doc_id"),
        concat(col("text"), lit(" "), markerCol).as("text"),
        langCol.as("lang"))
      for (i <- 1 to 2) {
        val m = t(s"langid: train #$i")(
          graft.operators.LangId.train(lab2, "doc_id", "text", "lang",
            dim = 1 << 12, n = 3))
        t(s"langid: predict #$i")(
          graft.operators.LangId.predict(lab2, "doc_id", "text", m).count())
      }
    }

    if (sections("wet")) {
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      for (i <- 1 to 2) {
        val blobs = graft.operators.Crawl
          .plantWetBytes(docs, "doc_id", "text", gzipRecords = true)
          .unionByName(graft.operators.Crawl
            .plantWetBytes(docs.filter(col("doc_id") % 8 === 0), "doc_id",
              "text", files = 1, gzipRecords = true)
            .select(lit(8L).as("file_id"), col("content")))
        t(s"wetgz: plant once (count) #$i")(blobs.count())
        t(s"wetgz: staging loop as-is #$i") {
          val stage = graft.util.Scratch.dir("p17_stage")
          (0L to 8L).foreach { j =>
            blobs.filter(col("file_id") === j).coalesce(1)
              .write.mode("overwrite").parquet(s"$stage/f$j")
          }
        }
        t(s"wetgz: staging via persist #$i") {
          val stage = graft.util.Scratch.dir("p17_stageP")
          val b = blobs.persist()
          (0L to 8L).foreach { j =>
            b.filter(col("file_id") === j).coalesce(1)
              .write.mode("overwrite").parquet(s"$stage/f$j")
          }
          b.unpersist()
        }
        t(s"wetgz: full query #$i")(
          SparkEntry.queries("st_wet_ingest_gz")(spark, sfDir).count())
      }
    }

    if (sections("contained")) {
      val q = SparkEntry.queries("dedup_contained_recall")
      for (i <- 1 to 2) t(s"contained: full #$i")(q(spark, sfDir).count())
    }
    spark.stop()
  }
}

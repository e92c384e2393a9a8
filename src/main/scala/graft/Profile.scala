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
    val docs = EntryFixtures.docsWithPlantedDups(spark, sfDir)
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

    // A/B (interleaved, one JVM — bench-protocol rule): lazy candidate
    // pairs (the verify joins plan the self-join subtree twice) vs an
    // eager persist+count of the pair list before the verify joins.
    // MEASURED (r5, sf0.1, quiet box): eager is ~1.7× SLOWER (2.5/1.8 s
    // lazy vs 4.2/3.3 s eager) — ReuseExchange already dedups the twice-
    // planned self-join, and persisting the pair list (large at low
    // thresholds) pays real materialization. Keep candidates lazy.
    def runA(): Long = {
      spark.catalog.clearCache()
      Dedup.nearDuplicates(docs, "doc_id", "text", 0.5).count()
    }
    def runB(): Long = {
      spark.catalog.clearCache()
      val s = Dedup.minhashSignatures(docs, "doc_id", "text", 16)
      val b = Dedup.bandSignatures(s, "doc_id", 16, 4)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val c = Dedup.lshCandidates(b, "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      c.count()
      Dedup.jaccardVerify(c, docs, "doc_id", "text")
        .filter(col("jaccard") >= 0.5).count()
    }
    for (i <- 1 to 2) {
      t(s"AB lazy cands #$i")(runA())
      t(s"AB eager cands #$i")(runB())
    }

    // A/B (VERDICT r05 #8): a1's plan — direct partial agg on
    // (category, order_date) above the broadcast dim join, vs
    // pre-aggregating per (product_id, order_date) BELOW it (the
    // item→category map is N:1 so the decimal partial sums commute).
    // Note the grain asymmetry: (product_id, date) is a STRICTLY FINER
    // grouping than (category, date), so the pre-agg shuffles more groups
    // and only wins if shrinking the broadcast-join input outweighs that.
    // MEASURED (r6, sf0.1, quiet box, 3 interleaved rounds): direct wins
    // ~1.8× (MINs 0.40 s vs 0.77 s) — the broadcast join is ~free per row
    // while the pre-agg pays a second, finer-grained exchange. a1 keeps
    // the direct plan.
    val adapter = graft.sources.TestdataAdapter
    val (ords, its, prods) = (adapter.orders(spark, sfDir),
      adapter.orderItems(spark, sfDir), adapter.products(spark, sfDir))
    def runCatDirect(): Long =
      graft.transform.Kpis.categoryKpis(
        graft.transform.Kpis.enrich(ords, its, prods)).count()
    def runCatPreAgg(): Long = {
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      val joined = ords.withColumn("order_date", to_date(col("created_at")))
        .join(its, "order_id")
      val pre = joined.groupBy(col("product_id"), col("order_date")).agg(
        sum(col("sale_price").cast(dec)).as("rev"),
        count(col("sale_price")).as("priced"),
        count(lit(1)).as("n"),
        sum(when(col("is_returned"), 1L).otherwise(0L)).as("ret"))
      pre.join(broadcast(prods), pre("product_id") === prods("id"))
        .groupBy(col("category"), col("order_date")).agg(
          sum(col("rev")).cast("double").as("daily_revenue"),
          (sum(col("rev")).cast("double") / sum(col("priced"))).as("avg_order_value"),
          (sum(col("ret")).cast("double") / sum(col("n"))).as("avg_return_rate"))
        .count()
    }
    for (i <- 1 to 3) {
      t(s"AB a1 direct #$i")(runCatDirect())
      t(s"AB a1 pre-agg #$i")(runCatPreAgg())
    }
    spark.stop()
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Crawl

/** Streaming crawl FRONTIER maintenance — sitemaps arrive as files
  * (publishers re-publish them continually), each trigger parses its
  * urlsets and appends the batch's per-URL freshness view; the frontier
  * READ resolves the LATEST lastmod per URL across everything drained.
  * Unlike the first-seen registries (WetStream, CurateStream), frontier
  * state is update-mode by nature: a later sitemap carrying a NEWER
  * lastmod must win, so the store keeps per-batch observation rows and
  * the read takes max(lastmod) — order-independent, hence trivially
  * exactly-once under overwrite-by-batch-id.
  *
  * Redelivery: a replayed batch rewrites its own partition byte-equal;
  * a cross-batch redelivery of the SAME sitemap adds rows with the same
  * (loc, lastmod), which change neither max(lastmod) nor the
  * `n_updates` count (distinct lastmods per URL — the freshness-churn
  * observability signal, immune to duplicate delivery by construction).
  *
  * Scale shape: per-trigger cost is O(batch) — a stateless parse plus
  * one per-batch (domain, loc) aggregation; the frontier read is one
  * max/countDistinct aggregation over the compacted store, columnar-
  * pruned to three string columns. [[compact]] folds per-trigger dirs
  * under the shared [[Compaction]] contract with a collapsing fold
  * (distinct rows — duplicates only ever re-state the same
  * observation).
  */
object FrontierStream {

  /** The FILE schema of frontier observation rows (batch id lives in
    * the dir name).
    */
  private[streaming] val EntrySchema =
    "domain STRING, loc STRING, lastmod STRING"

  /** One micro-batch of raw sitemap blobs `(domain, sitemap_xml)` →
    * parsed, per-URL-collapsed, appended.
    */
  private[streaming] def ingestBatch(workDir: String)
                                    (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    Crawl.sitemapParse(batch)
      // within one batch the same sitemap file can only state one
      // lastmod per loc, but two files for the same domain could —
      // collapse to the batch's freshest view
      .groupBy(col("domain"), col("loc"))
      .agg(max(col("lastmod")).as("lastmod"))
      .write.mode("overwrite").parquet(s"$workDir/frontier/batch=$batchId")
  }

  /** The streaming leg; the caller picks the trigger and starts it. */
  def writer(sitemaps: DataFrame, workDir: String,
             checkpointDir: String): DataStreamWriter[Row] =
    sitemaps.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(ingestBatch(workDir) _)

  /** The frontier: per URL, the freshest lastmod seen and how many
    * DISTINCT lastmods were ever observed (freshness churn; duplicate
    * deliveries cannot inflate it).
    */
  def frontier(spark: SparkSession, workDir: String): DataFrame =
    Compaction.readLive(spark, s"$workDir/frontier", EntrySchema)
      .groupBy(col("domain"), col("loc"))
      .agg(max(col("lastmod")).as("lastmod"),
        countDistinct(col("lastmod")).as("n_updates"))

  /** The refetch queue against a fetch log — [[frontier]] through
    * [[graft.operators.Crawl.recrawlPlan]]: unseen fetch, stale
    * refetch, fresh skip.
    */
  def refetchQueue(spark: SparkSession, workDir: String,
                   fetchLog: DataFrame): DataFrame =
    Crawl.recrawlPlan(
      frontier(spark, workDir).select("loc", "lastmod"), fetchLog)

  /** Fold the per-trigger observation dirs; distinct rows are the
    * correct collapse (a duplicate observation re-states the same
    * fact), and both frontier outputs are invariant under it.
    */
  def compact(spark: SparkSession, workDir: String, upToBatch: Long): Unit =
    Compaction.compactDir(spark, s"$workDir/frontier", EntrySchema, upToBatch,
      Compaction.distinctFold(Seq("domain", "loc", "lastmod")))

  private[streaming] val LogSchema = "loc STRING, fetched_at STRING"

  /** The CRAWL-LOOP CLOSURE (VERDICT r13 #8): each micro-batch is one
    * crawl EPOCH — the arriving sitemap wave updates the frontier, the
    * epoch's refetch queue is decided against the fetch log accumulated
    * by the PREVIOUS epochs ([[graft.operators.Crawl.recrawlPlan]]:
    * unseen fetch, stale refetch, fresh skip), and the decided fetches
    * append to the log under this epoch's `fetchDates(batchId)` stamp —
    * so the NEXT wave's staleness is measured against what this one
    * fetched. Multi-epoch recrawl is thereby a fixpoint loop over two
    * stores, not a one-shot plan.
    *
    * Exactly-once: the decision reads frontier dirs ≤ batchId and log
    * dirs < batchId only, and writes its own `fetchlog/batch=N`
    * overwrite-by-batch-id — a replayed epoch sees the identical store
    * state and rewrites the identical decisions; a crash between the
    * two writes leaves a frontier batch whose decisions regenerate on
    * replay. Per-epoch cost is O(frontier) for the recrawl join (the
    * refetch decision is a latest-wins aggregation + one left join),
    * O(batch) for the parse.
    */
  private[streaming] def loopBatch(workDir: String,
                                   fetchDates: Long => String)
                                  (batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    ingestBatch(workDir)(batch, batchId)
    val front = spark.read.schema(s"$EntrySchema, batch LONG")
      .option("ignoreMissingFiles", "true")
      .parquet(s"$workDir/frontier")
      .filter(col("batch") <= batchId) // crash-replay: ignore later dirs
      .groupBy(col("domain"), col("loc"))
      .agg(max(col("lastmod")).as("lastmod"))
    val logRoot = new org.apache.hadoop.fs.Path(s"$workDir/fetchlog")
    val fs = logRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fetched =
      if (fs.exists(logRoot))
        spark.read.schema(s"$LogSchema, batch LONG")
          .option("ignoreMissingFiles", "true")
          .parquet(logRoot.toString)
          .filter(col("batch") < batchId) // this epoch decides fresh
          .groupBy(col("loc")).agg(max(col("fetched_at")).as("fetched_at"))
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType.fromDDL(LogSchema))
    Crawl.recrawlPlan(front.select("loc", "lastmod"), fetched)
      .filter(col("refetch"))
      .select(col("loc"), lit(fetchDates(batchId)).as("fetched_at"))
      .write.mode("overwrite").parquet(s"$workDir/fetchlog/batch=$batchId")
  }

  /** The crawl-loop streaming leg; the caller picks the trigger. */
  def loopWriter(sitemaps: DataFrame, workDir: String, checkpointDir: String,
                 fetchDates: Long => String): DataStreamWriter[Row] =
    sitemaps.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(loopBatch(workDir, fetchDates) _)

  /** The drained loop's report: per URL, the frontier's freshest view
    * (lastmod, distinct-lastmod churn) joined to the fetch history
    * (how many epochs fetched it, and when last). On the planted waves
    * every frontier update is exactly one later refetch, so
    * `n_updates = n_fetches` — the closed form st_recrawl_loop pins.
    */
  def loopReport(spark: SparkSession, workDir: String): DataFrame = {
    val log = spark.read.schema(s"$LogSchema, batch LONG")
      .option("ignoreMissingFiles", "true")
      .parquet(s"$workDir/fetchlog")
      .groupBy(col("loc"))
      .agg(count(lit(1)).as("n_fetches"),
        max(col("fetched_at")).as("last_fetched_at"))
    frontier(spark, workDir).join(log, Seq("loc"))
      .select(col("domain"), col("loc"), col("lastmod"), col("n_updates"),
        col("n_fetches"), col("last_fetched_at"))
  }
}

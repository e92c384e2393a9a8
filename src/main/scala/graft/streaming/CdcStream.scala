package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming content-defined-chunk dedup: each arriving micro-batch of
  * documents is chunked by the SAME windowed-polynomial Gear cut the
  * batch query runs ([[Dedup.cdcChunks]] is the whole per-batch
  * computation — batch/stream parity by construction), its chunk digests
  * probed against the md5 REGISTRY of every prior batch, and a per-doc
  * report (total chunks, registry-duplicated chunks) committed alongside
  * the registry update. The ingest-side dedup accounting a crawl
  * pipeline runs before paying storage for re-crawled content.
  *
  * Semantics pinned by the oracle: a chunk is `dup` iff its digest first
  * appeared in an EARLIER batch — intra-batch repeats both count as new
  * (they land in the registry together). That makes the drained report a
  * pure function of (corpus, batch assignment), replayable in SQL.
  *
  * Idempotence: both sinks are per-batch partition dirs overwritten by
  * batch id, and the registry probe EXCLUDES the current batch's
  * partition (the PassageStream recipe), so an at-least-once redelivery
  * recomputes the identical report instead of self-colliding with its
  * own half-written digests.
  *
  * Scale contract: chunking is a pure map (no shuffle); the probe
  * shuffles 32-hex digests only — text never leaves the chunking
  * executor; the registry scan is columnar-pruned to one string column.
  * A deployment outgrowing the scan composes the Bloom prefilter or
  * compacts partitions exactly as PassageStream.compactRegistry does.
  */
object CdcStream {

  /** The registry's committed schema (the PassageStream pinned-schema
    * stance: reads must never infer over a half-written first batch).
    */
  private[streaming] val RegistrySchema = "chunk_md5 STRING, batch LONG"

  /** foreachBatch sink: chunk the batch, report per-doc dup counts
    * against the prior-batch registry, commit report + registry update
    * (both overwrite-by-batch).
    */
  def chunkAndRegister(workDir: String, window: Int = 16, mask: Int = 64)
                      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val regRoot = new Path(s"$workDir/registry")
    val fs = regRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    batch.persist()
    try {
      // two consumers (report + registry update) read the chunk frame
      val chunks = Dedup.cdcChunks(batch, "doc_id", "text", window, mask)
        .persist()
      try {
        val registry =
          if (fs.exists(regRoot))
            spark.read.schema(RegistrySchema)
              .option("ignoreMissingFiles", "true")
              .parquet(regRoot.toString)
              .filter(col("batch") =!= batchId)
              .select("chunk_md5").distinct()
          else
            spark.range(0).select(col("id").cast("string").as("chunk_md5"))
        val report = chunks
          .join(registry.withColumn("__dup", lit(1)), Seq("chunk_md5"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(coalesce(col("__dup"), lit(0))).cast("long").as("n_dup"))
        report.write.mode("overwrite")
          .parquet(s"$workDir/report/batch=$batchId")
        chunks.select("chunk_md5").distinct().write.mode("overwrite")
          .parquet(s"$workDir/registry/batch=$batchId")
      } finally chunks.unpersist()
    } finally batch.unpersist()
  }

  /** The committed report schema (data columns only — the batch id
    * lives in the dir name, like the registry).
    */
  private[streaming] val ReportSchema =
    "doc_id LONG, n_chunks LONG, n_dup LONG"

  /** The per-doc dedup report across all drained batches — marker-aware
    * ([[Compaction.readLive]]): report rows are NOT duplicate-tolerant
    * (a crash between a fold's publish and its deletes would double
    * every absorbed row under a plain root glob), so the read excludes
    * absorbed dirs by the blob's marker.
    */
  def readReport(spark: SparkSession, workDir: String): DataFrame =
    Compaction.readLive(spark, s"$workDir/report", ReportSchema)
      .select(col("doc_id"), col("n_chunks"), col("n_dup"))

  /** Fold the chunk registry's per-trigger partition dirs into one blob
    * (VERDICT r14 #4 — the shared crash-safe [[Compaction.compactDir]]
    * protocol the other five streams already run; previously this stream
    * only documented it). Distinct on `chunk_md5` is the correct fold: a
    * digest re-stated across batches is the same fact, and the probe in
    * [[chunkAndRegister]] distincts anyway — so dedup decisions are
    * invariant under the fold, and the blob's negative batch id can never
    * collide with a live trigger's current-batch exclusion filter. Run
    * between triggers with `upToBatch` = the checkpoint-committed
    * boundary (a redelivered uncommitted batch must still find its own
    * partition excluded, not absorbed).
    */
  def compact(spark: SparkSession, workDir: String, upToBatch: Long): Unit = {
    Compaction.compactDir(spark, s"$workDir/registry", "chunk_md5 STRING",
      upToBatch, Compaction.distinctFold(Seq("chunk_md5")))
    // report rows are per (doc, batch) facts — the identity fold (a plain
    // union) is the correct collapse; readReport's marker-aware read
    // keeps a crashed fold from double-counting
    Compaction.compactDir(spark, s"$workDir/report", ReportSchema, upToBatch)
  }
}

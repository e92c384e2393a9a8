package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** One arriving document: id + body + event time (the streaming corpus
  * record; also the StreamBench/CorpusStreamSpec input shape).
  */
case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)

/** Streaming corpus preparation — the batch `pipeline_corpus_prep` chain
  * (exact dedup → language ID → quality gate → per-language stats) running
  * continuously over documents as they arrive.
  *
  * Stage shapes, 100 TB form:
  *  - dedup: `dropDuplicatesWithinWatermark` keyed on the sha2 digest of
  *    the body — state stores one 64-hex key per distinct document seen
  *    within the watermark window, never the body, and evicts at the
  *    watermark (the batch operator's digest-not-bodies rule, carried to
  *    the state store);
  *  - annotation: pure codegen'd expressions (Text.stats/langId/
  *    bpeTokenCount), stateless, fuse into one projection;
  *  - rollup: cumulative update-mode aggregation on the language key —
  *    state is O(languages), the smallest key space in the pipeline.
  *
  * Exact-once note: dedup-by-content upstream makes the count stream
  * idempotent under source re-delivery within the watermark; pair with a
  * keyed upsert sink (StreamingPipeline.upsertBatch) for end-to-end
  * exactly-once, same as the KPI pipeline.
  */
object CorpusStream {

  /** Annotated, deduped, quality-passing documents (append-safe: stateless
    * past the dedup). Input needs `idCol`, `textCol`, and event-time
    * `tsCol`.
    */
  def prepared(docs: DataFrame, idCol: String, textCol: String,
               tsCol: String, watermark: String): DataFrame = {
    val deduped = docs
      .withColumn("__content_sha", sha2(col(textCol), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_sha")
      .drop("__content_sha")
    // the SAME annotation chain as the batch pipeline_corpus_prep query
    Text.analyzed(deduped, textCol).filter(col("quality_ok"))
  }

  /** Cumulative per-language corpus stats over [[prepared]] — update-mode
    * aggregation (changed languages re-emit per micro-batch).
    */
  def langStats(prepared: DataFrame): DataFrame =
    prepared.groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"))

  /** The corpus-prep chain with NEAR-duplicate dropping (VERDICT r05 #1):
    * [[prepared]]'s exact-hash dedup + quality gate feeding the
    * incremental MinHash/LSH leg ([[NearDupStream]]) — exact dups die in
    * the watermarked state store, near-dups in the banded candidate state
    * + registry verify. Survivors accumulate under `workDir/clean`.
    */
  def nearDedupedWriter(docs: DataFrame, idCol: String, textCol: String,
                        tsCol: String, watermark: String,
                        workDir: String, checkpointDir: String,
                        threshold: Double = 0.8, k: Int = 16, bands: Int = 4,
                        shingleN: Int = 3, maxBucket: Int = 10000)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    NearDupStream.writer(prepared(docs, idCol, textCol, tsCol, watermark),
      idCol, textCol, workDir, checkpointDir, threshold, k, bands,
      shingleN, maxBucket)
}

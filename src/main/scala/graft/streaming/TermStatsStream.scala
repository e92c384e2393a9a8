package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Incremental corpus term statistics — the streaming twin of the batch
  * TF/DF frames behind t_term_stats (the retrieval/TF-IDF input): as
  * documents ARRIVE, maintain per-term document frequencies and
  * per-(doc, term) term frequencies as update-mode streaming
  * aggregations drained into the snapshot-isolated upsert store. Both
  * transforms are the SAME function applied to a batch or a streaming
  * frame — batch/stream parity by construction, the Text.analyzed
  * stance — and the drained stores answer the batch query's DuckDB
  * oracle VERBATIM.
  *
  * State shape: [[dfCounts]] chains a stateful distinct on
  * (term, doc_id) into the per-term count — for a corpus stream the
  * dedup state IS the inverted-index key set, O(distinct pairs), the
  * product being built rather than overhead (a bounded-horizon
  * deployment would swap in dropDuplicatesWithinWatermark, the
  * StreamingPipeline dedup convention, trading late re-counts for
  * eviction). [[tfCounts]] keys on (doc_id, term) — update-mode rows
  * are cumulative counts for keys touched by the batch, so the
  * last-wins keyed upsert store converges to the exact totals.
  */
object TermStatsStream {

  /** Per-term document frequency over lowercased whitespace tokens.
    * Works on a batch OR streaming frame.
    */
  def dfCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(Text.tokens(lower(col("text")))).as("term"))
      .dropDuplicates("term", "doc_id")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** Per-(doc, term) term frequency for documents with id < `maxDocId`
    * (the t_term_stats slice). Works on a batch OR streaming frame.
    */
  def tfCounts(docs: DataFrame, maxDocId: Long): DataFrame =
    docs.filter(col("doc_id") < maxDocId)
      .select(col("doc_id"),
        explode(Text.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Term-association statistics over the document corpus — pointwise
  * mutual information (PMI, Church & Hanks 1990) between terms that
  * co-occur in the same document. The corpus-curation read: which term
  * pairs travel together far more often than chance — collocation
  * discovery, topic drift probes, and the feature-correlation report a
  * mixture-design pass runs before reweighting sources.
  *
  * Scale shape: everything runs at DISTINCT (doc, term) grain — the
  * explode is deduplicated before any join, so a term repeated 1000×
  * in one document costs one row. Pair generation is the only
  * quadratic step and is bounded two ways before it runs:
  * stopword-grade terms (df > maxDf) and hapax noise (df < minDf) are
  * dropped WHOLE by a count-first document-frequency pass (the
  * invertedIndex stance), and each document then contributes pairs
  * only among its `perDocCap` RAREST surviving terms (df ASC, term —
  * the ssjoin prefix-filter ordering, deterministic across engines),
  * so the self-join emits at most cap²/2 rows per document no matter
  * how long the document is. The pair self-join keys on doc_id — one
  * exchange of the capped term list, never a cartesian. Doc count and
  * per-term dfs join back as dimension-grade tables.
  *
  * Determinism (the DuckDB-oracle contract): counts are exact
  * integers end-to-end; the only float is the single
  * `ln((co·D)/(df1·df2))` per surviving pair, rounded to 6 — the
  * bm25TopK stance. The top-k orders by the ROUNDED score with a full
  * (w1, w2) tie-break.
  */
object Association {

  /** Top-`k` co-occurring term pairs by PMI. Output:
    * `(w1, w2, co_df, df1, df2, pmi)` with w1 < w2,
    * `co_df` = documents containing both terms (each pair counted once
    * per document), `df1`/`df2` = per-term document frequencies over
    * the SAME corpus, and
    * `pmi = ln(co_df · n_docs / (df1 · df2))` rounded to 6. Pairs seen
    * in fewer than `minPair` documents are dropped (PMI is noise at
    * tiny counts — the standard practice the paper itself flags).
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
               minDf: Long = 2, maxDf: Long = Long.MaxValue,
               perDocCap: Int = 32, minPair: Long = 5,
               k: Int = 100): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"bad df band [$minDf, $maxDf]")
    require(perDocCap >= 2, s"perDocCap must allow at least one pair, got $perDocCap")
    require(k > 0, s"pmiPairs needs a positive k, got $k")
    val dt = docs.select(col(idCol).as("__id"),
        explode(Text.tokens(lower(col(textCol)))).as("__term"))
      .distinct()
    val dfT = dt.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val vocab = dfT.filter(col("__df") >= minDf && col("__df") <= maxDf)
    // each doc keeps its `perDocCap` rarest surviving terms — the pair
    // bound; (df ASC, term) makes the kept slice engine-independent
    val capped = dt.join(vocab, Seq("__term"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id")).orderBy(col("__df").asc, col("__term").asc)))
      .filter(col("__rn") <= perDocCap)
      .select(col("__id"), col("__term"))
    val a = capped.select(col("__id"), col("__term").as("w1"))
    val b = capped.select(col("__id"), col("__term").as("w2"))
    val pairs = a.join(b, Seq("__id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("co_df"))
      .filter(col("co_df") >= minPair)
    val nDocs = docs.agg(count(lit(1)).as("__ndocs"))
    val scored = pairs
      .join(vocab.select(col("__term").as("w1"), col("__df").as("df1")), Seq("w1"))
      .join(vocab.select(col("__term").as("w2"), col("__df").as("df2")), Seq("w2"))
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("co_df"), col("df1"), col("df2"),
        round(log((col("co_df") * col("__ndocs")).cast("double") /
          (col("df1") * col("df2")).cast("double")), 6).as("pmi"))
    // TakeOrderedAndProject — k rows through the driver-side limit only
    scored.orderBy(col("pmi").desc, col("w1"), col("w2")).limit(k)
  }
}

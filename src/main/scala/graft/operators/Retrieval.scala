package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Ranked term retrieval over the document corpus — the curation-side
  * "find the documents about X" primitive (BM25, the Lucene/Okapi
  * scoring the reference's search tooling would reach for).
  *
  * Scale shape: the token explode is filtered to the QUERY terms before
  * any aggregation (an `isin` over a handful of literals — predicate on
  * the exploded stream, no full TF materialization), document lengths
  * are one `size()` projection, the per-term document frequencies and
  * the corpus stats are dimension-sized broadcasts, and the final top-k
  * is a TakeOrdered over per-document scores — no global sort of the
  * corpus, no driver-side scoring.
  *
  * Determinism (the DuckDB-oracle contract): every arithmetic step is a
  * fixed IEEE expression — exact integer tf/df/len/N, `avgdl` as an
  * exact long sum divided once, and the per-term score parts added in
  * the FIXED query-term order via a pivot (a `sum()` over the parts
  * would re-associate the doubles nondeterministically). Scores are
  * rounded to 6 decimals, and the ranking orders by the ROUNDED score
  * (tie-broken by id) so a last-ulp `ln` divergence between engines
  * cannot flip ranks.
  */
object Retrieval {

  /** Top-`k` documents for `terms` by BM25, as (rank, id, score).
    * Documents matching no term (score 0) are excluded.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    require(k > 0, s"bm25TopK needs a positive k, got $k")
    val base = docs.select(col(idCol).as("__id"),
      Text.tokens(lower(col(textCol))).as("__toks"))
    val lens = base.select(col("__id"), size(col("__toks")).cast("long").as("__len"))
    val tf = base.select(col("__id"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(terms: _*))
      .groupBy(col("__id"), col("__term")).agg(count(lit(1)).as("__tf"))
    val stats = lens.agg(count(lit(1)).as("__n"),
      (sum(col("__len")).cast("double") / count(lit(1))).as("__avgdl"))
    val dfT = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    // one fixed expression per (doc, term); every operator ordering below
    // is mirrored verbatim by the oracle SQL
    val idf = log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1)
    val part = idf * (col("__tf") * lit(k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__len") / col("__avgdl")))
    val parts = tf.join(broadcast(dfT), "__term")
      .join(lens, "__id")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__term"), part.as("__part"))
    // fixed-order addition of the per-term parts (terms order)
    val pivoted = parts.groupBy(col("__id"))
      .pivot("__term", terms).agg(first(col("__part")))
    val score: Column = terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduce(_ + _)
    val scored = pivoted.select(col("__id"), round(score, 6).as("score"))
      .filter(col("score") > 0)
    val top = scored.orderBy(col("score").desc, col("__id")).limit(k)
    // rank assignment runs over at most k rows — the single-partition
    // window is bounded by k, never by the corpus
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("__id"))))
      .select(col("rank"), col("__id").as(idCol), col("score"))
  }

  /** Top-`k` documents for `terms` by TF-IDF COSINE — the vector-space
    * scorer beside [[bm25TopK]]'s probabilistic one. Unlike BM25 it
    * normalizes by the FULL document vector norm (every term's tf·idf,
    * not just the query's), so long documents stuffed with off-query
    * terms rank lower: one extra O(total tokens) tf aggregation and a
    * vocabulary-grain df join, both term-hash exchanges.
    *
    * Determinism: idf = ln(N/df) per term; the per-document norm is a
    * term-SORTED left fold of the squared weights (the foldLogProbs /
    * DuckDB list_reduce contract — a sum() would re-associate), the dot
    * product adds per-term parts in the FIXED query-term order via the
    * pivot, the query norm folds idf² in the same fixed order, and the
    * ranking orders by the 6-rounded score, id-tiebroken.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "tfidfTopK needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    require(k > 0, s"tfidfTopK needs a positive k, got $k")
    val base = docs.select(col(idCol).as("__id"),
      Text.tokens(lower(col(textCol))).as("__toks"))
    val tfAll = base.select(col("__id"), explode(col("__toks")).as("__term"))
      .groupBy(col("__id"), col("__term")).agg(count(lit(1)).as("__tf"))
    val stats = base.agg(count(lit(1)).as("__n"))
    val dfAll = tfAll.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val idf = log(col("__n").cast("double") / col("__df"))
    val weighted = tfAll.join(dfAll, "__term")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__term"),
        (col("__tf") * idf).as("__w"), idf.as("__idf"))
    val norms = weighted.groupBy(col("__id")).agg(
      sqrt(aggregate(
        sort_array(collect_list(struct(col("__term"),
          (col("__w") * col("__w")).as("__w2")))),
        lit(0.0), (acc, x) => acc + x.getField("__w2"))).as("__dnorm"))
    // query-term idf (absent terms contribute nothing, to norm or dot)
    val qidf = dfAll.filter(col("__term").isin(terms: _*))
      .crossJoin(broadcast(stats))
      .select(col("__term"), idf.as("__qidf"))
    val qnormRow = qidf.groupBy()
      .pivot("__term", terms).agg(first(col("__qidf") * col("__qidf")))
    val qnorm: Column = sqrt(terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduce(_ + _))
    val parts = weighted.filter(col("__term").isin(terms: _*))
      .select(col("__id"), col("__term"), (col("__w") * col("__idf")).as("__part"))
    val pivoted = parts.groupBy(col("__id"))
      .pivot("__term", terms).agg(first(col("__part")))
    val dot: Column = terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
      .reduce(_ + _)
    val scored = pivoted.select(col("__id"), dot.as("__dot"))
      .join(norms, "__id")
      .crossJoin(broadcast(qnormRow.select(qnorm.as("__qnorm"))))
      // degenerate corpus guard (ADVICE r08): if every query term occurs in
      // ALL documents, idf=0 makes qnorm=0 and dot=0, and 0/0=NaN — which
      // Spark orders ABOVE every double, so NaN "scores" would pass the >0
      // filter and occupy the top-k. Zero-norm vectors have no cosine;
      // exclude them before the division.
      .filter(col("__qnorm") > 0 && col("__dnorm") > 0)
      .select(col("__id"),
        round(col("__dot") / (col("__qnorm") * col("__dnorm")), 6).as("score"))
      .filter(col("score") > 0)
    val top = scored.orderBy(col("score").desc, col("__id")).limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("__id"))))
      .select(col("rank"), col("__id").as(idCol), col("score"))
  }

  /** Inverted-index build: one row per surviving term with its document
    * frequency, total term frequency, and the doc_id-sorted posting
    * list serialized as `"id:tf,id:tf,…"` (a flat string — exactly
    * comparable across engines, unlike nested struct arrays). Terms
    * with df > `maxDf` are dropped WHOLE, and the cap is enforced by a
    * COUNT-FIRST pass before any posting list is collected — a
    * stopword's postings would otherwise materialize most of the corpus
    * in one aggregation buffer before being discarded (the fuzzyPairs
    * bounded-buffer stance), and index pruning of stopword-grade terms
    * is standard retrieval practice anyway. Both aggregations share the
    * term-hash exchange.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDf: Long): DataFrame = {
    require(maxDf >= 1, s"invertedIndex needs maxDf >= 1, got $maxDf")
    val tf = docs.select(col(idCol).as("__id"),
        explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term"), col("__id")).agg(count(lit(1)).as("__tf"))
      .repartition(col("term"))
    val kept = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
      .select(col("term"))
    tf.join(kept, Seq("term"), "left_semi")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("total_tf"),
        array_join(transform(
          array_sort(collect_list(struct(col("__id"), col("__tf")))),
          p => concat(p.getField("__id").cast("string"), lit(":"),
            p.getField("__tf").cast("string"))), ",").as("postings"))
  }

  /** Reciprocal-rank fusion (Cormack–Clarke–Buettcher) — the standard
    * hybrid-search merge of a lexical and a vector retrieval leg:
    * `rrf = Σ_legs 1/(kRrf + rank)`, a missing leg contributing 0.
    * Rank-based, so the legs' incomparable score scales (BM25 vs cosine)
    * never meet. Inputs are `(idCol, rank)` frames (any leg the suite
    * retrieves: [[bm25TopK]], [[tfidfTopK]],
    * [[graft.operators.Similarity.bruteForceTopK]]/ivfTopK); output is
    * the fused top-`k` as `(rank, idCol, rrf_score, rank_a, rank_b)`.
    *
    * Determinism: each reciprocal is ONE IEEE division, the two-term sum
    * is fixed-order (leg A then leg B), ranking orders by the 6-rounded
    * score with id tiebreak. Scale shape: both legs are top-k-bounded by
    * their retrievers, so the full-outer join and the final window are
    * metadata-grade regardless of corpus size.
    */
  def rrfFuse(legA: DataFrame, legB: DataFrame, idCol: String, k: Int,
              kRrf: Int = 60): DataFrame = {
    require(k > 0 && kRrf > 0, s"need positive k/kRrf: $k/$kRrf")
    val a = legA.select(col(idCol), col("rank").as("rank_a"))
    val b = legB.select(col(idCol), col("rank").as("rank_b"))
    val fused = a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol), col("rank_a"), col("rank_b"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("rank_a")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(kRrf) + col("rank_b")), lit(0.0)),
          6).as("rrf_score"))
    fused.orderBy(col("rrf_score").desc, col(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, col(idCol))))
      .select(col("rank"), col(idCol), col("rrf_score"),
        col("rank_a"), col("rank_b"))
  }
}

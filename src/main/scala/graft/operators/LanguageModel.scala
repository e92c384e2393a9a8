package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Statistical language-model scoring — the CCNet-style quality signal a
  * pretraining curation pipeline runs over every document (score each doc
  * under a reference LM, then keep/bucket by perplexity), and the
  * DSIR-style importance weight (log-likelihood ratio between a target
  * and a source model) that data-selection pipelines rank by. Both are
  * public published methods (CCNet: Wenzek et al. 2020; DSIR: Xie et al.
  * 2023); the models here are add-one-smoothed unigram models computed
  * entirely in Spark SQL expressions — no UDFs, no driver-side model
  * object, the "LM" is a counts DataFrame.
  *
  * Scale shape: one token explode per corpus pass feeding a map-side
  * combined count aggregation (the model); scoring joins per-document
  * term frequencies to the counts table on the term hash and folds
  * per-document sums with one more hash aggregation. Nothing is
  * collected; the corpus-level scalars (total tokens, vocab size) ride a
  * broadcast of a 1-row frame. Per-document state is O(distinct terms of
  * that document) inside one aggregation buffer — bounded by document
  * length, the repetitionStats stance.
  *
  * Determinism (the DuckDB-oracle contract): per-(doc, term) log
  * contributions are single fixed IEEE expressions (exact-integer-valued
  * doubles divided once, one `ln`), and the per-document total is a LEFT
  * FOLD over the term-sorted contribution list (`aggregate` over
  * `sort_array(collect_list(...))` here, `list_reduce` over
  * `list(... ORDER BY term)` in DuckDB) — never a `sum()`, whose
  * re-association order is engine- and partition-dependent. Residual
  * cross-engine divergence is the last-ulp `ln` difference per term
  * (~1e-16 relative), orders of magnitude inside the round(…, 6)
  * reporting precision — the Retrieval.bm25TopK stance.
  */
object LanguageModel {

  /** Unigram counts of the lowercased whitespace tokens of `textCol`. */
  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Text.tokens(lower(col(textCol)))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))

  /** Per-document (id, term, tf) at distinct-term grain. */
  private def docTf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"),
        explode(Text.tokens(lower(col(textCol)))).as("__w"))
      .groupBy(col("__id"), col("__w")).agg(count(lit(1)).as("__tf"))

  /** Term-sorted left fold of `lpCol` per `__id` (see object scaladoc). */
  private def foldLogProbs(contribs: DataFrame): DataFrame =
    contribs.groupBy(col("__id")).agg(
      sum(col("__tf")).as("__ntok"),
      aggregate(
        sort_array(collect_list(struct(col("__w"), col("__lp")))),
        lit(0.0),
        (acc, x) => acc + x.getField("__lp")).as("__sum"))

  /** Score every document of `docs` under an add-one-smoothed unigram LM
    * trained on `train`: p(w) = (c(w) + 1) / (N + V) with N = total
    * training tokens and V = training vocabulary size (unseen scoring
    * tokens get the c = 0 floor). Output one row per document:
    * `(idCol, n_tokens, avg_logprob, ppl)` with
    * avg_logprob = Σ tf·ln p(w) / n_tokens and ppl = exp(−avg_logprob),
    * both rounded to 6; token-less documents keep NULL scores.
    */
  def unigramScore(train: DataFrame, docs: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val counts = tokenCounts(train, textCol)
    val stats = counts.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    val contribs = docTf(docs, idCol, textCol)
      .join(counts, Seq("__w"), "left")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__w"), col("__tf"),
        (col("__tf").cast("double") *
          log((coalesce(col("__c"), lit(0L)) + 1L).cast("double") /
            (col("__n") + col("__v")).cast("double"))).as("__lp"))
    docs.select(col(idCol))
      .join(foldLogProbs(contribs).withColumnRenamed("__id", idCol),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__ntok"), lit(0L)).as("n_tokens"),
        round(col("__sum") / col("__ntok"), 6).as("avg_logprob"),
        round(exp(-(col("__sum") / col("__ntok"))), 6).as("ppl"))
  }

  /** DSIR-style importance weight per document: the log-likelihood ratio
    * Σ tf·(ln p_target(w) − ln p_source(w)) between two add-one-smoothed
    * unigram models, both smoothed over the SHARED vocabulary V =
    * |vocab(target) ∪ vocab(source)| so the two distributions are
    * comparable. Positive weight → the document looks more like `target`
    * than `source`; data selection keeps the top mass. Output:
    * `(idCol, n_tokens, log_weight)` (round 6; token-less docs NULL).
    */
  def dsirWeights(target: DataFrame, source: DataFrame, docs: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val ct = tokenCounts(target, textCol).withColumnRenamed("__c", "__ct")
    val cs = tokenCounts(source, textCol).withColumnRenamed("__c", "__cs")
    // full-outer vocab union: V and both models' counts in one table
    val vocab = ct.join(cs, Seq("__w"), "full_outer")
      .select(col("__w"), coalesce(col("__ct"), lit(0L)).as("__ct"),
        coalesce(col("__cs"), lit(0L)).as("__cs"))
    val stats = vocab.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cs")).as("__ns"), count(lit(1)).as("__v"))
    val contribs = docTf(docs, idCol, textCol)
      .join(vocab, Seq("__w"), "left")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__w"), col("__tf"),
        (col("__tf").cast("double") *
          (log((coalesce(col("__ct"), lit(0L)) + 1L).cast("double") /
            (col("__nt") + col("__v")).cast("double")) -
           log((coalesce(col("__cs"), lit(0L)) + 1L).cast("double") /
            (col("__ns") + col("__v")).cast("double")))).as("__lp"))
    docs.select(col(idCol))
      .join(foldLogProbs(contribs).withColumnRenamed("__id", idCol),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__ntok"), lit(0L)).as("n_tokens"),
        round(col("__sum"), 6).as("log_weight"))
  }

  /** Per-document (id, w1, w2, tf) at distinct-BIGRAM grain: consecutive
    * token pairs of the lowercased whitespace stream. The pair list is
    * built by zipping the token array against its own 1-shift
    * (`slice`+`zip_with`) — per-row work linear in document length, no
    * self-join, no positional explode.
    */
  private def bigramPairs(textCol: String) = {
    val ts = Text.tokens(lower(col(textCol)))
    val n1 = greatest(size(ts) - 1, lit(0))
    zip_with(slice(ts, lit(1), n1), slice(ts, lit(2), n1),
      (a, b) => struct(a.as("w1"), b.as("w2")))
  }

  private def docBigramTf(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"),
        explode(bigramPairs(textCol)).as("__bg"))
      .groupBy(col("__id"), col("__bg.w1").as("__w1"),
        col("__bg.w2").as("__w2"))
      .agg(count(lit(1)).as("__tf"))

  /** Corpus-wide bigram counts — no id column required on the training
    * frame (the [[tokenCounts]] contract), and ONE map-side-combined
    * aggregation instead of per-document counts re-aggregated
    * (code-review r7f).
    */
  private def bigramCounts(train: DataFrame, textCol: String): DataFrame =
    train.select(explode(bigramPairs(textCol)).as("__bg"))
      .groupBy(col("__bg.w1").as("__w1"), col("__bg.w2").as("__w2"))
      .agg(count(lit(1)).as("__c2"))

  /** Score every document under a BIGRAM model with Stupid Backoff
    * (Brants et al., EMNLP 2007 — "Large Language Models in Machine
    * Translation", the web-scale scoring scheme that replaces discounted
    * smoothing with a fixed backoff multiplier precisely because it
    * needs no held-out tuning at corpus scale):
    *
    *   S(w2 | w1) = c2(w1 w2) / c1(w1)            if c2(w1 w2) > 0
    *              = α · (c1(w2) + 1) / (N + V)     otherwise
    *
    * with α = 0.4 (the paper's constant) and the backoff terminal
    * add-one-smoothed (the [[unigramScore]] floor) so unseen words keep
    * a finite score. Each document is scored over its n−1 bigram
    * positions: `(idCol, n_bigrams, avg_logprob, ppl)`, rounded to 6;
    * documents with fewer than 2 tokens keep NULL scores.
    *
    * Scale shape: the model is two count DataFrames (bigrams + unigrams)
    * from map-side-combined aggregations — never a driver-side object;
    * scoring joins per-document distinct-bigram frequencies to both
    * count tables (hash joins on the pair / the predecessor token) and
    * folds one hash aggregation per document. Corpus scalars (N, V) ride
    * a 1-row broadcast. Determinism: one fixed IEEE expression per
    * distinct bigram, summed as a (w1, w2)-sorted LEFT FOLD — the
    * [[foldLogProbs]] / DuckDB `list_reduce` contract.
    */
  def bigramScore(train: DataFrame, docs: DataFrame,
                  idCol: String, textCol: String,
                  alpha: Double = 0.4): DataFrame = {
    val c2 = bigramCounts(train, textCol)
    val c1 = tokenCounts(train, textCol)
    val stats = c1.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    val contribs = docBigramTf(docs, idCol, textCol)
      .join(c2, Seq("__w1", "__w2"), "left")
      .join(c1.select(col("__w").as("__w1"), col("__c").as("__cp")),
        Seq("__w1"), "left")
      .join(c1.select(col("__w").as("__w2"), col("__c").as("__cw")),
        Seq("__w2"), "left")
      .crossJoin(broadcast(stats))
      .select(col("__id"),
        // fold key: the sorted struct must lead with (w1, w2) so the
        // engine-side sort_array and the oracle's ORDER BY w1, w2 agree
        struct(col("__w1"), col("__w2")).as("__w"),
        col("__tf"),
        (col("__tf").cast("double") *
          log(when(col("__c2").isNotNull,
              col("__c2").cast("double") / col("__cp").cast("double"))
            .otherwise(lit(alpha) *
              (coalesce(col("__cw"), lit(0L)) + 1L).cast("double") /
              (col("__n") + col("__v")).cast("double")))).as("__lp"))
    docs.select(col(idCol))
      .join(foldLogProbs(contribs).withColumnRenamed("__id", idCol),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__ntok"), lit(0L)).as("n_bigrams"),
        round(col("__sum") / col("__ntok"), 6).as("avg_logprob"),
        round(exp(-(col("__sum") / col("__ntok"))), 6).as("ppl"))
  }

  /** CCNet's head/middle/tail perplexity bucketing: score with
    * [[unigramScore]], then exact NTILE (no single-partition funnel —
    * [[Ranking.ntileExact]]) over descending avg_logprob, so bucket 1 is
    * the most-natural (lowest-perplexity) slice. Token-less documents are
    * excluded (their perplexity is undefined).
    */
  def perplexityBuckets(train: DataFrame, docs: DataFrame,
                        idCol: String, textCol: String,
                        buckets: Int = 3): DataFrame =
    Ranking.ntileExact(
      unigramScore(train, docs, idCol, textCol).filter(col("n_tokens") > 0),
      buckets, Seq(col("avg_logprob").desc, col(idCol)), "ppl_bucket")
}

package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unigram-LM scoring: hand-computed smoothed log-probs, OOV floor,
  * DSIR ratio math, CCNet bucket composition, and partition-order
  * invariance of the fixed-order fold.
  */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def byId(rows: Array[Row]): Map[Long, Row] =
    rows.map(r => r.getLong(0) -> r).toMap

  test("unigramScore: hand-computed add-one math, OOV floor, empty doc") {
    val train = Seq((100L, "a a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "")).toDF("doc_id", "text")
    val out = byId(LanguageModel.unigramScore(train, docs, "doc_id", "text").collect())
    // N=3, V=2: p(a)=3/5, p(b)=2/5, p(unseen)=1/5
    val (pa, pb, po) = (math.log(3.0 / 5), math.log(2.0 / 5), math.log(1.0 / 5))
    assert(out(1L).getLong(1) == 2L)
    assert(out(1L).getDouble(2) == r6((pa + pb) / 2))
    assert(out(1L).getDouble(3) == r6(math.exp(-(pa + pb) / 2)))
    assert(out(2L).getDouble(2) == r6((pa + po) / 2)) // c is OOV -> floor
    assert(out(3L).getLong(1) == 0L) // token-less doc kept, NULL scores
    assert(out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("dsirWeights: log-likelihood ratio under shared-vocab smoothing") {
    val target = Seq((100L, "a a")).toDF("doc_id", "text")
    val source = Seq((200L, "a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val out = byId(
      LanguageModel.dsirWeights(target, source, docs, "doc_id", "text").collect())
    // V=2 (union), Nt=2, Ns=2: pt(a)=3/4 pt(b)=1/4; ps(a)=ps(b)=2/4
    val expected = (math.log(3.0 / 4) - math.log(2.0 / 4)) +
      (math.log(1.0 / 4) - math.log(2.0 / 4))
    assert(out(1L).getDouble(2) == r6(expected))
    assert(out(2L).isNullAt(2))
  }

  test("perplexityBuckets: NTILE(3) over descending avg_logprob, empties dropped") {
    // train == docs -> higher-frequency tokens score higher; craft six
    // docs with strictly distinct average log-probs plus one empty doc
    val docs = Seq(
      (1L, "a a a a"), (2L, "a a a b"), (3L, "a a b b"),
      (4L, "a b b c"), (5L, "b c c d"), (6L, "d d e e"), (7L, "")
    ).toDF("doc_id", "text")
    val out = LanguageModel.perplexityBuckets(docs, docs, "doc_id", "text")
      .select("doc_id", "avg_logprob", "ppl_bucket").collect()
    assert(out.length == 6) // the empty doc is excluded
    val byBucket = out.sortBy(r => (-r.getDouble(1), r.getLong(0)))
      .map(_.getInt(2)).toSeq
    assert(byBucket == Seq(1, 1, 2, 2, 3, 3))
  }

  test("bigramScore: hand-computed stupid backoff, unseen pair + unseen word") {
    // train bigrams: (a,a) x1, (a,b) x1; unigrams: a x2, b x1 -> N=3, V=2
    val train = Seq((100L, "a a b")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a a b"),  // both bigrams seen
      (2L, "b a"),    // (b,a) unseen -> backoff to alpha * (c(a)+1)/(N+V)
      (3L, "a z"),    // (a,z) unseen, z OOV -> alpha * (0+1)/(N+V)
      (4L, "a"),      // single token: no bigrams -> NULL scores
      (5L, "")
    ).toDF("doc_id", "text")
    val out = byId(LanguageModel.bigramScore(train, docs, "doc_id", "text").collect())
    // S(a|a) = 1/2, S(b|a) = 1/2
    assert(out(1L).getLong(1) == 2L)
    assert(out(1L).getDouble(2) == r6((math.log(0.5) + math.log(0.5)) / 2))
    // S(a|b) backs off: 0.4 * (2+1)/(3+2)
    assert(out(2L).getDouble(2) == r6(math.log(0.4 * 3.0 / 5)))
    // S(z|a) backs off to the OOV floor: 0.4 * 1/(3+2)
    assert(out(3L).getDouble(2) == r6(math.log(0.4 / 5)))
    assert(out(3L).getDouble(3) == r6(math.exp(-math.log(0.4 / 5))))
    assert(out(4L).getLong(1) == 0L && out(4L).isNullAt(2))
    assert(out(5L).getLong(1) == 0L && out(5L).isNullAt(2))
  }

  test("bigramScore: seen-bigram branch beats backoff for repeated pairs") {
    // "x y" repeated heavily: S(y|x) = c2/c1(x) must reflect multiplicity
    val train = Seq((100L, "x y x y x y x z")).toDF("doc_id", "text")
    // c2(x,y)=3, c1(x)=4 -> S(y|x)=3/4
    val docs = Seq((1L, "x y")).toDF("doc_id", "text")
    val out = byId(LanguageModel.bigramScore(train, docs, "doc_id", "text").collect())
    assert(out(1L).getLong(1) == 1L)
    assert(out(1L).getDouble(2) == r6(math.log(3.0 / 4)))
  }

  test("scores are invariant to input partitioning (fixed-order fold)") {
    val docs = (0L until 40L)
      .map(i => (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 2} shared"))
      .toDF("doc_id", "text")
    val a = LanguageModel.unigramScore(docs, docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = LanguageModel.unigramScore(docs.repartition(13), docs.repartition(7),
      "doc_id", "text").collect().map(_.toSeq).toSet
    assert(a == b)
    val ba = LanguageModel.bigramScore(docs, docs, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val bb = LanguageModel.bigramScore(docs.repartition(13), docs.repartition(7),
      "doc_id", "text").collect().map(_.toSeq).toSet
    assert(ba == bb)
  }
}

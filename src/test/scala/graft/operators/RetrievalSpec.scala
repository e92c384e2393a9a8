package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** BM25 ranked retrieval: hand-computed scores on a tiny corpus (same
  * IEEE ops in the test as in the operator), rank ordering, tf
  * monotonicity, no-match exclusion, k bound, and argument guards.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // corpus: doc 1 has the term twice, doc 2 once, doc 3 not at all.
  // All docs are 4 tokens long, so avgdl = 4 and the length
  // normalization cancels out of the ORDER (not the values).
  private val docs = Seq(
    (1L, "apple apple pear plum"),
    (2L, "apple pear plum kiwi"),
    (3L, "melon grape kiwi fig"))
    .toDF("doc_id", "text")

  private def bm25(tf: Long, df: Long, n: Long, len: Long, avgdl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1) * (tf * (k1 + 1)) /
      (tf + k1 * (1 - b + b * len / avgdl))

  test("scores match the closed form and rank by tf; no-match docs excluded") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("apple"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val expect = Seq(
      (1, 1L, math.rint(bm25(2, 2, 3, 4, 4.0) * 1e6) / 1e6),
      (2, 2L, math.rint(bm25(1, 2, 3, 4, 4.0) * 1e6) / 1e6))
    assert(got.toSeq == expect,
      s"got ${got.toSeq}, expected $expect (doc 3 must be absent)")
  }

  test("multi-term scores add per-term parts; ties break by id; k bounds output") {
    // both docs 1 and 2 contain pear+plum with identical tf and length →
    // identical scores; rank must tie-break by doc id
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("pear", "plum"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    assert(got(0)._3 == got(1)._3, "equal tf and length must score equally")
    val p = math.rint((bm25(1, 2, 3, 4, 4.0) + bm25(1, 2, 3, 4, 4.0)) * 1e6) / 1e6
    assert(got(0)._3 == p, s"two-term score must be the fixed-order sum, got ${got(0)._3} != $p")
    // k = 1 truncates to the top document only
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", Seq("apple"), k = 1)
      .collect().map(_.getLong(1)).toSeq == Seq(1L))
  }

  test("rrfFuse: overlap ranks first, missing legs contribute zero, id ties") {
    val legA = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val legB = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")
    val out = Retrieval.rrfFuse(legA, legB, "doc_id", k = 4)
      .orderBy("rank").collect()
    def r(x: Int) = 1.0 / (60 + x)
    def round6(x: Double) = // Spark round() is HALF_UP BigDecimal
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // 20: ranks (2,1) -> r2+r1; 10: (1,3) -> r1+r3; 40: r2 beats 30: r3
    assert(out.map(_.getLong(1)).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(out(0).getDouble(2) == round6(r(2) + r(1)))
    assert(out(1).getDouble(2) == round6(r(1) + r(3)))
    assert(out(2).getDouble(2) == round6(r(2)), "single-leg doc scores one reciprocal")
    assert(out(2).get(3) == null, "missing leg rank stays null in the report")
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    // equal scores tie-break by id: two docs each only rank-1 in one leg
    val tie = Retrieval.rrfFuse(
      Seq((7L, 1)).toDF("doc_id", "rank"),
      Seq((3L, 1)).toDF("doc_id", "rank"), "doc_id", k = 2)
      .orderBy("rank").collect()
    assert(tie.map(_.getLong(1)).toSeq == Seq(3L, 7L))
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(legA, legB, "doc_id", k = 0))
  }

  test("argument guards reject empty/duplicate terms and bad k") {
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq.empty, 5))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq("a", "a"), 5))
    intercept[IllegalArgumentException](
      Retrieval.bm25TopK(docs, "doc_id", "text", Seq("a"), 0))
  }

  test("invertedIndex: sorted flat postings, exact df/tf, df cap drops whole terms") {
    import spark.implicits._
    val corpus = Seq(
      (3L, "apple apple pear"), (1L, "apple kiwi"), (2L, "pear apple kiwi"))
      .toDF("doc_id", "text")
    val idx = Retrieval.invertedIndex(corpus, "doc_id", "text", maxDf = 2L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // apple df=3 > cap → dropped whole, not truncated
    assert(!idx.contains("apple"))
    assert(idx("pear") == ((2L, 2L, "2:1,3:1")))
    assert(idx("kiwi") == ((2L, 2L, "1:1,2:1")))
  }

  test("invertedIndex postings are doc-sorted regardless of partition layout") {
    import spark.implicits._
    val corpus = (1 to 50).map(i => (i.toLong, "zzz common"))
      .toDF("doc_id", "text").repartition(11)
    val idx = Retrieval.invertedIndex(corpus, "doc_id", "text", maxDf = 100L)
      .filter(col("term") === "zzz").collect()(0).getString(3)
    assert(idx == (1 to 50).map(i => s"$i:1").mkString(","))
  }

  test("tfidf cosine matches the closed form and the full norm demotes stuffed docs") {
    // docs 1 and 2 both contain 'apple' once, but doc 2 carries extra
    // off-query weight -> larger norm -> lower cosine; doc 3 excluded
    val corpus = Seq(
      (1L, "apple pear"),
      (2L, "apple pear rare1 rare2 rare3 rare4"),
      (3L, "melon grape"))
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfTopK(corpus, "doc_id", "text", Seq("apple"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    def idf(df: Long): Double = math.log(3.0 / df)
    def norm(dfs: Seq[Long]): Double =
      math.sqrt(dfs.map(d => idf(d) * idf(d)).sum)
    val qn = idf(2) // sqrt(idf_apple^2)
    def cos(dfs: Seq[Long]): Double =
      math.rint(idf(2) * idf(2) / (qn * norm(dfs)) * 1e6) / 1e6
    // doc 1 terms: apple(df2) pear(df2); doc 2: apple pear + 4 df-1 terms
    val expect = Seq(
      (1, 1L, cos(Seq(2L, 2L))),
      (2, 2L, cos(Seq(2L, 2L, 1L, 1L, 1L, 1L))))
    assert(got.toSeq == expect, s"got ${got.toSeq}, expected $expect")
  }

  test("tfidf ranks by tf when norms agree; absent query terms contribute nothing") {
    val corpus = Seq(
      (1L, "apple apple pear plum"),
      (2L, "apple pear plum kiwi"),
      (3L, "melon grape kiwi fig"))
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfTopK(corpus, "doc_id", "text",
      Seq("apple", "nosuchterm"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(got.map(_._2).toSeq == Seq(1L, 2L), got.mkString(","))
  }
}

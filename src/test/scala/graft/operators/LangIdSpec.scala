package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LangId: trained NB separates planted languages, integer scoring is
  * run-to-run deterministic, and the model stays dim×langs-bounded.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val langs = Seq("de", "en", "es", "fr")

  private def corpus = {
    val base = Seq(
      "alpha beta gamma delta epsilon zeta common page text",
      "numbers 1 2 3 and symbols ! ? shared across every doc",
      "the quick brown fox jumps over the lazy dog boilerplate")
    (0 until 48).map { i =>
      val lang = langs(i % 4)
      val marker = (graft.functions.Text.stopwords(lang).mkString(" ") + " ") * 3
      (i.toLong, base(i % 3) + " " + marker, lang)
    }.toDF("doc_id", "text", "lang")
  }

  test("NB reproduces the planted labels exactly over shared base text") {
    val docs = corpus
    val model = LangId.train(docs, "doc_id", "text", "lang", dim = 1 << 12)
    val preds = LangId.predict(docs, "doc_id", "text", model).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds.size == 48)
    for (i <- 0 until 48)
      assert(preds(i.toLong) == langs(i % 4), s"doc $i")
  }

  test("integer scoring is deterministic across repeated runs") {
    val docs = corpus
    val m1 = LangId.train(docs, "doc_id", "text", "lang", dim = 1 << 12)
    val m2 = LangId.train(docs, "doc_id", "text", "lang", dim = 1 << 12)
    assert(m1.priors == m2.priors && m1.defaults == m2.defaults &&
      m1.deltas.toSet == m2.deltas.toSet,
      "integer-count training must be bit-stable")
    val p1 = LangId.predict(docs, "doc_id", "text", m1).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val p2 = LangId.predict(docs.repartition(7), "doc_id", "text", m2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(p1 == p2, "scaled-long scores are partitioning-invariant")
  }

  test("model size is bounded by dim x langs, never the corpus") {
    val model = LangId.train(corpus, "doc_id", "text", "lang", dim = 64)
    assert(model.deltas.size <= 64 * 4)
    assert(model.priors.keySet == langs.toSet)
  }

  test("features: exact char-trigram counts, short text yields itself") {
    val docs = Seq((1L, "abcd"), (2L, "x")).toDF("doc_id", "text")
    val f = LangId.features(docs, "doc_id", "text", dim = 1 << 20, n = 3)
      .groupBy("doc_id").agg(sum("cnt").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f(1L) == 2L, "'abcd' slides to 'abc','bcd'")
    assert(f(2L) == 1L, "shorter-than-n text is its own single gram")
  }
}

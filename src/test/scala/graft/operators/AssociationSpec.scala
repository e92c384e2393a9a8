package graft.operators

import graft.SparkSpec

/** PMI pair mining: hand-computed scores, df banding, the per-doc
  * rarest-term cap, minPair pruning, and layout independence.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("pmiPairs: hand-computed PMI over a crafted corpus") {
    // 4 docs; (a,b) together in 2, a in 3, b in 2; c rides with a once
    val docs = Seq(
      (1L, "a b x1"), (2L, "a b x2"), (3L, "a c x3"), (4L, "d d x4")
    ).toDF("doc_id", "text")
    val out = Association.pmiPairs(docs, "doc_id", "text",
      minDf = 1, maxDf = 100, perDocCap = 8, minPair = 2, k = 10).collect()
    // only (a,b) survives minPair=2: pmi = ln(2*4 / (3*2))
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) == ("a", "b"))
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == r6(math.log(8.0 / 6.0)))
  }

  test("pmiPairs: df band drops stopword-grade and hapax terms whole") {
    // 's' in every doc (df 4 > maxDf 3); 'h' in one (df 1 < minDf 2)
    val docs = Seq(
      (1L, "s a b h"), (2L, "s a b"), (3L, "s a b"), (4L, "s z")
    ).toDF("doc_id", "text")
    val out = Association.pmiPairs(docs, "doc_id", "text",
      minDf = 2, maxDf = 3, perDocCap = 8, minPair = 2, k = 10).collect()
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("a", "b"))) // nothing pairs with s or h
  }

  test("pmiPairs: per-doc cap keeps the RAREST terms (df ASC, term)") {
    // doc 1 has 3 vocab terms; cap 2 keeps the two rarest: r1 (df 2)
    // and r2 (df 2) — the df-3 term 'cmn' is cut, so (cmn, r1) never
    // forms even though they co-occur twice elsewhere uncapped
    val docs = Seq(
      (1L, "cmn r1 r2"), (2L, "cmn r1"), (3L, "cmn r2"), (4L, "cmn x")
    ).toDF("doc_id", "text")
    val capped = Association.pmiPairs(docs, "doc_id", "text",
      minDf = 1, maxDf = 100, perDocCap = 2, minPair = 2, k = 10).collect()
    // with the cap, (cmn, r1) co-occurs only in doc 2 -> below minPair
    assert(!capped.map(r => (r.getString(0), r.getString(1)))
      .contains(("cmn", "r1")))
    val uncapped = Association.pmiPairs(docs, "doc_id", "text",
      minDf = 1, maxDf = 100, perDocCap = 8, minPair = 2, k = 10).collect()
    assert(uncapped.map(r => (r.getString(0), r.getString(1)))
      .contains(("cmn", "r1")))
  }

  test("pmiPairs: repeated terms count once per document") {
    val docs = Seq(
      (1L, "a a a b b"), (2L, "a b"), (3L, "a q"), (4L, "b q")
    ).toDF("doc_id", "text")
    val out = Association.pmiPairs(docs, "doc_id", "text",
      minDf = 1, maxDf = 100, perDocCap = 8, minPair = 2, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(out(("a", "b")) == 2L) // not inflated by doc 1's repeats
  }

  test("pmiPairs: invariant to input partitioning") {
    val docs = (0L until 60L)
      .map(i => (i, s"t${i % 7} t${i % 5} t${i % 3} t${i % 2}"))
      .toDF("doc_id", "text")
    val a = Association.pmiPairs(docs, "doc_id", "text",
      minDf = 2, maxDf = 100, perDocCap = 4, minPair = 3, k = 50)
      .collect().map(_.toSeq).toSet
    val b = Association.pmiPairs(docs.repartition(13), "doc_id", "text",
      minDf = 2, maxDf = 100, perDocCap = 4, minPair = 3, k = 50)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }
}

package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSpec

/** LineCuration: hand-computed C4 line gates, order-preserving line dedup,
  * Gopher rule arithmetic, and the planted-page structure the oracles
  * replay.
  */
class LineCurationSpec extends SparkSpec {
  import spark.implicits._

  private def c4(text: String): Row =
    LineCuration.c4Clean(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()

  test("c4Clean keeps terminal-punctuation lines with enough words") {
    val page = Seq(
      "this is a good full sentence.",   // kept
      "short one.",                      // < 5 words
      "no terminal punctuation on this line at all", // no punct
      "this line has six words total!",  // kept (bang counts)
      "we must beware the javascript snippet here.", // poisoned
      "a quoted ending with five words\"" // kept (quote counts)
    ).mkString("\n")
    val r = c4(page)
    assert(r.getAs[String]("clean_text") == Seq(
      "this is a good full sentence.",
      "this line has six words total!",
      "a quoted ending with five words\"").mkString("\n"))
    assert(r.getAs[Long]("n_lines") == 6 && r.getAs[Long]("n_kept") == 3)
    assert(r.getAs[Boolean]("doc_kept"))
  }

  test("c4Clean page gates: lorem ipsum, curly brace, min kept lines") {
    val good = "this is a good full sentence."
    assert(!c4(Seq(good, good, good, "plus some Lorem Ipsum filler.")
      .mkString("\n")).getAs[Boolean]("doc_kept"))
    assert(!c4(Seq(good, good, good, "var x = { a: 1 }")
      .mkString("\n")).getAs[Boolean]("doc_kept"))
    assert(!c4(Seq(good, good).mkString("\n")).getAs[Boolean]("doc_kept"))
    assert(c4(Seq(good, good, good).mkString("\n")).getAs[Boolean]("doc_kept"))
  }

  test("c4Clean with every line dropped emits an empty clean_text") {
    val r = c4("nothing here ends right")
    assert(r.getAs[String]("clean_text") == "" && r.getAs[Long]("n_kept") == 0)
  }

  private def dedup(text: String): Row =
    LineCuration.dedupLines(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()

  test("dedupLines keeps first occurrences in order") {
    val r = dedup("a\nb\na\nc\nb\na")
    assert(r.getAs[String]("clean_text") == "a\nb\nc")
    assert(r.getAs[Long]("n_lines") == 6 &&
      r.getAs[Long]("n_dups_removed") == 3)
  }

  test("dedupLines is identity on unique lines and collapses pure repeats") {
    assert(dedup("x\ny\nz").getAs[String]("clean_text") == "x\ny\nz")
    assert(dedup("x\ny\nz").getAs[Long]("n_dups_removed") == 0)
    val rep = dedup("x\nx\nx")
    assert(rep.getAs[String]("clean_text") == "x" &&
      rep.getAs[Long]("n_dups_removed") == 2)
  }

  private def gopher(text: String): Row =
    LineCuration.gopherReport(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").head()

  test("gopherReport signal arithmetic is exact") {
    val r = gopher("the cat and dog run far")
    assert(r.getAs[Long]("n_words") == 6)
    assert(r.getAs[Double]("mean_word_len") == 3.0)
    assert(r.getAs[Long]("n_stop_present") == 2) // the, and
    assert(!r.getAs[Boolean]("r_word_count")) // 6 < 50
    assert(r.getAs[Boolean]("r_mean_len") && r.getAs[Boolean]("r_stop"))
    assert(!r.getAs[Boolean]("gopher_ok"))
  }

  test("gopherReport symbol and line-shape fractions") {
    val r = gopher("a # b ... c")
    // one '#', one '...', 5 words
    assert(r.getAs[Double]("symbol_ratio") == 0.4)
    assert(!r.getAs[Boolean]("r_symbol"))
    val b = gopher("- a b\n- c d\ne f...")
    assert(b.getAs[Double]("bullet_line_frac") == 0.666667)
    assert(b.getAs[Double]("ellipsis_line_frac") == 0.333333)
    assert(b.getAs[Boolean]("r_bullet") && !b.getAs[Boolean]("r_ellipsis"))
  }

  test("gopherReport passes a document built to pass") {
    // 50+ natural words with stopwords, letters, no symbols, no bullets
    val words = (1 to 60).map(i => if (i % 7 == 0) "the"
      else if (i % 11 == 0) "and" else s"word$i")
    val r = gopher(words.grouped(8).map(_.mkString(" ")).mkString("\n"))
    assert(r.getAs[Boolean]("gopher_ok"))
  }

  test("plantPages builds the documented deterministic structure") {
    val page = LineCuration.plantPages(
      Seq((0L, "w1 w2 w3 w4 w5 w6 w7")).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, String)].head()._2
    // doc 0 hits every modulo plant: bullet+symbol+ellipsis on line 0,
    // all three poison lines, and the even-id duplicate tail
    assert(page == Seq(
      "- w1 w2 w3 w4 w5 w6 #...",
      "w7",
      "this line has javascript inside it.",
      "and this page mentions lorem ipsum.",
      "{ a curly brace config line.",
      "- w1 w2 w3 w4 w5 w6 #...",
      "w7").mkString("\n"))
  }

  test("plantPages drops token-empty documents (oracle symmetry)") {
    assert(LineCuration.plantPages(
      Seq((1L, "  "), (2L, "ok")).toDF("doc_id", "text"),
      "doc_id", "text").count() == 1)
  }

  test("gateFunnel: first-fail attribution, sequential n_in, removal fractions") {
    import org.apache.spark.sql.functions._
    // 6 docs: a fails g0; b fails g0 AND g1 (counts against g0 only);
    // c fails g1; d fails g2; e, f pass everything
    val docs = Seq(
      ("a", false, true, true), ("b", false, false, true),
      ("c", true, false, true), ("d", true, true, false),
      ("e", true, true, true), ("f", true, true, true)
    ).toDF("id", "p0", "p1", "p2")
    val out = LineCuration.gateFunnel(docs,
      Seq("g0" -> col("p0"), "g1" -> col("p1"), "g2" -> col("p2")))
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_in"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_out"), r.getAs[Double]("removal_frac"))).toMap
    assert(out("g0") == ((6L, 2L, 4L, 0.333333)))
    assert(out("g1") == ((4L, 1L, 3L, 0.25)))
    assert(out("g2") == ((3L, 1L, 2L, 0.333333)))
  }

  test("gateFunnel: a stage that removes everything leaves later stages at zero n_in") {
    import org.apache.spark.sql.functions._
    val docs = Seq(("a", false), ("b", false)).toDF("id", "p0")
    val out = LineCuration.gateFunnel(docs,
      Seq("kill" -> col("p0"), "after" -> lit(true)))
      .collect().map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("n_in"), r.getAs[Long]("n_removed"))).toMap
    assert(out("kill") == ((2L, 2L)))
    assert(out("after") == ((0L, 0L)))
    val afterRow = LineCuration.gateFunnel(docs,
      Seq("kill" -> col("p0"), "after" -> lit(true)))
      .filter(col("stage") === "after").head()
    assert(afterRow.isNullAt(afterRow.fieldIndex("removal_frac")))
  }

  test("blocklistGate: token-grain contiguous match — substrings don't hit, " +
    "phrases must be contiguous, case folds, every occurrence counts") {
    val docs = Seq(
      (1L, "a perfectly classic document about glass"), // substring 'ass' ≠ token
      (2L, "this page says BAD WORD twice: bad word"), // case + 2 occurrences
      (3L, "bad content here and a word there"), // phrase tokens present, not adjacent
      (4L, "badword fused is a different token"), // no token-boundary match
      (5L, "spam"), // single-token phrase, whole page
      (6L, "") // empty page
    ).toDF("doc_id", "text")
    val out = LineCuration.blocklistGate(docs, "doc_id", "text",
        Seq("Bad Word", "ass", "spam"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((0L, false)), s"substring must not match: ${out(1L)}")
    assert(out(2L) == ((2L, true)), s"case-folded phrase twice: ${out(2L)}")
    assert(out(3L) == ((0L, false)), s"non-contiguous tokens must not match: ${out(3L)}")
    assert(out(4L) == ((0L, false)), s"fused token must not match: ${out(4L)}")
    assert(out(5L) == ((1L, true)))
    assert(out(6L) == ((0L, false)))
    intercept[IllegalArgumentException] {
      LineCuration.blocklistGate(docs, "doc_id", "text", Seq("  "))
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece: greedy longest-match-first, ## continuations, the [UNK]
  * collapse, and the vocab doubling contract.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("segmentWord: longest match wins at every position") {
    val starts = Set("un", "unaff", "a", "u", "n", "f", "b", "l", "e")
    val conts = starts ++ Set("able", "ffable")
    // greedy takes "unaff" (len 5) over "un", then "##able" over singles
    assert(WordPiece.segmentWord("unaffable", starts, conts, 6)
      == Some(Seq("unaff", "##able")))
    // at pos 0 only the START set applies: "able" is continuation-only
    assert(WordPiece.segmentWord("able", starts, conts, 6)
      == Some(Seq("a", "##b", "##l", "##e")))
    // unmatchable char → None (the [UNK] path)
    assert(WordPiece.segmentWord("un¤x", starts, conts, 6).isEmpty)
  }

  test("vocab doubles every piece into a ## continuation form") {
    val docs = Seq("aba aba cad").toDF("text")
    val v = WordPiece.vocab(docs, "text", maxPieceLen = 3, topK = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // singles always present, both forms, same weight
    assert(v("a") == v("##a") && v("a") == 2L * 2 + 1) // 2 per "aba" ×2 + 1 in "cad"
    assert(v.keySet.filter(_.startsWith("##")).map(_.drop(2))
      == v.keySet.filterNot(_.startsWith("##")))
  }

  test("segment: corpus grain, counts, pieces, and the planted UNK") {
    val docs = Seq("the cat", "the cathode").toDF("text")
    val pieces = WordPiece.vocabList(docs, "text", maxPieceLen = 6, topK = 16)
    val out = WordPiece.segment(
        docs.select(concat(col("text"), lit(" ¤¤")).as("text")),
        "text", pieces, maxPieceLen = 6)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getString(2), r.getInt(3), r.getBoolean(4))).toMap
    assert(out("the")._1 == 2L && !out("the")._4)
    assert(out("¤¤") == ((2L, "[UNK]", 1, true)))
    // every non-UNK word reassembles from its pieces
    out.filterNot(_._2._4).foreach { case (w, (_, ps, np, _)) =>
      val parts = ps.split(" ")
      assert(parts.length == np)
      assert(parts.map(_.stripPrefix("##")).mkString("") == w, s"reassembly of $w")
      assert(!parts.head.startsWith("##") &&
        parts.tail.forall(_.startsWith("##")), s"prefix discipline of $w")
    }
  }
}

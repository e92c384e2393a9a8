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

  test("train: likelihood argmax with exact tie-break, hand-computed") {
    // corpus: aa ×2, ab ×1 → syms aa:[a,##a], ab:[a,##b]
    // freqs a:3 ##a:2 ##b:1; pairs (a,##a):2 score 2/6, (a,##b):1 score
    // 1/3 — EXACTLY tied doubles → lexicographic pick (a,##a)
    val docs = Seq("aa aa ab").toDF("text")
    val m = WordPiece.train(docs, "text", nMerges = 2).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(m(1) == (("a", "##a", 2L, 3L, 2L)))
    // gen1: aa:[aa], ab:[a,##b] → only pair (a,##b) cnt 1, freqs 1/1
    assert(m(2) == (("a", "##b", 1L, 1L, 1L)))
  }

  test("train: likelihood scoring beats raw frequency (the BPE divergence)") {
    // xy ×5 → pair (x,##y) cnt 5, score 5/(5·5) = 0.2
    // qz ×2 → pair (q,##z) cnt 2, score 2/(2·2) = 0.5
    // raw-count BPE would merge (x,##y); WordPiece must merge (q,##z)
    val docs = Seq(Array.fill(5)("xy").mkString(" ") + " qz qz").toDF("text")
    val first = WordPiece.train(docs, "text", nMerges = 1).collect().head
    assert(first.getString(1) == "q" && first.getString(2) == "##z")
    assert(first.getLong(3) == 2L && first.getLong(4) == 2L && first.getLong(5) == 2L)
  }

  test("train: merged continuations keep their ## role across rounds") {
    // "abc" ×4: merges inside the continuation tail must produce
    // ##-marked merged symbols (##b + ##c → ##bc), never plain ones
    val docs = Seq(Array.fill(4)("abc").mkString(" ") + " b c bb").toDF("text")
    val rows = WordPiece.train(docs, "text", nMerges = 3).collect()
    rows.foreach { r =>
      assert(r.getString(2).startsWith("##"), s"rhs role: ${r.getString(2)}")
    }
    // exhaustion: a corpus of single chars runs dry without error
    val dry = WordPiece.train(Seq("a b c a").toDF("text"), "text", nMerges = 3)
    assert(dry.count() == 0L)
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

package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unigram-LM tokenizer training/segmentation vs hand-computed
  * expectations (Kudo 2018 semantics; reference has no tokenizer — this
  * is the LLM-pipeline extension surface).
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("wordCounts lowercases and counts at distinct-word grain") {
    val out = Unigram.wordCounts(docs("Ab ab CD", "ab"), "text")
      .as[(String, Long)].collect().toMap
    assert(out == Map("ab" -> 3L, "cd" -> 1L))
  }

  test("seedVocab: weighted substrings top-k plus unconditional singles") {
    // corpus: "abc" ×2, "ab" ×1 → multi-piece weights:
    //   ab: 2(from abc)+1 = 3, bc: 2, abc: 2
    val d = docs("abc abc", "ab")
    val out = Unigram.seedVocab(d, "text", maxPieceLen = 3, seedSize = 2)
      .as[(String, Long)].collect().toMap
    // top-2 multi by (weight desc, piece asc): ab(3), abc(2) — bc(2)
    // loses the tie to abc lexicographically
    assert(out == Map("ab" -> 3L, "abc" -> 2L,
      "a" -> 3L, "b" -> 3L, "c" -> 2L))
  }

  test("seedVocab singles bypass the top-k even at seedSize 1") {
    val out = Unigram.seedVocab(docs("xy xy"), "text",
      maxPieceLen = 2, seedSize = 1).as[(String, Long)].collect().toMap
    assert(out.keySet == Set("xy", "x", "y"))
  }

  test("train: EM log-likelihood trace is non-decreasing pre-prune and " +
    "the final table is a normalized distribution") {
    val d = docs("aa ab aa ba", "aa aa ab", "bb aa")
    val m = Unigram.train(d, "text", vocabSize = 4, maxPieceLen = 2,
      seedSize = 4, emIters = 4)
    assert(m.llTrace.length == 5) // 4 EM passes + post-prune fixup pass
    val pre = m.llTrace.take(4)
    pre.zip(pre.tail).foreach { case (a, b) =>
      assert(b >= a - 1e-6 * math.abs(a), s"LL dipped: $a -> $b") }
    assert(math.abs(m.logp.values.map(math.exp).sum - 1.0) < 1e-9)
    // "aa" dominates the corpus — EM must keep it more probable than the
    // rarer bigrams it competes with
    assert(m.logp("aa") > m.logp("ab"))
  }

  test("train: single chars are immune to pruning (coverage)") {
    // vocabSize 2 < number of single chars (a, b): pruning keeps ZERO
    // multi-char pieces yet every single survives
    val m = Unigram.train(docs("aa ab ba bb aa"), "text", vocabSize = 2,
      maxPieceLen = 2, seedSize = 8, emIters = 2)
    assert(m.logp.keySet == Set("a", "b"))
  }

  test("train: vocabulary bound holds with room for multi pieces") {
    val m = Unigram.train(docs("aa ab ba bb ab aa"), "text", vocabSize = 3,
      maxPieceLen = 2, seedSize = 8, emIters = 2)
    val singles = m.logp.keySet.filter(_.length == 1)
    assert(singles == Set("a", "b"))
    assert(m.logp.size <= 3)
    assert(m.logp.keySet.count(_.length > 1) <= 1)
  }

  test("segmentWords: picks the higher-scoring path and drops " +
    "uncoverable words") {
    // table: a, b singles + "ab" whose score beats a+b (89 > 2*3? no —
    // log(89) > log(2)+log(3)=log(6): yes)
    val table = Map("a" -> math.log(2.0), "b" -> math.log(3.0),
      "ab" -> math.log(89.0))
    val words = Seq("ab", "aab", "ba", "axb").toDF("word")
    val out = Unigram.segmentWords(words, "word", table, maxPieceLen = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    // "axb": x is uncoverable → dropped entirely
    assert(out.keySet == Set("ab", "aab", "ba"))
    assert(out("ab") == (("ab", 1L)))        // log89 > log2+log3
    assert(out("aab") == (("a|ab", 2L)))     // a+ab beats a+a+b and ... aa absent
    assert(out("ba") == (("b|a", 2L)))       // no "ba" piece → singles
  }

  test("segmentWords score is the rounded left-fold of piece log-probs") {
    val table = Map("a" -> math.log(2.0), "ab" -> math.log(89.0))
    val out = Unigram.segmentWords(Seq("aab").toDF("word"), "word",
      table, maxPieceLen = 2).collect().head
    val expect = BigDecimal(math.log(2.0) + math.log(89.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(3) == expect)
  }

  test("segmentWords tie-break prefers fewer pieces, then lex path") {
    // engineered tie: "aa" piece scores exactly a+a (log4 = 2*log2)
    val table = Map("a" -> math.log(2.0), "aa" -> math.log(4.0))
    val out = Unigram.segmentWords(Seq("aa").toDF("word"), "word",
      table, maxPieceLen = 2).collect().head
    assert(out.getString(1) == "aa" && out.getLong(2) == 1L)
  }
}

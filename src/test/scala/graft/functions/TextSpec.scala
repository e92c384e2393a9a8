package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Text analysis: tokenization/shingle edges, stats math, BPE-ish counting,
  * language ID per script/stopword family, fingerprint properties.
  */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect()(0).getAs[T](0)

  test("tokens: empty, multi-space, and tab/newline-edged strings tokenize cleanly") {
    val df = Seq("", "  ", "a  b   c", "\tfoo\nbar ", "\n\t").toDF("t")
    val out = df.select(Text.tokens(col("t"))).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq())
    assert(out(1) == Seq())
    assert(out(2) == Seq("a", "b", "c"))
    assert(out(3) == Seq("foo", "bar")) // no phantom "" from leading \t
    assert(out(4) == Seq())
  }

  test("shingles: shorter-than-n documents yield one whole-document shingle") {
    val df = Seq("a b c d", "a b", "").toDF("t")
    val out = df.select(Text.shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
    assert(out(2) == Seq(""))
  }

  test("stats: hand-computed ratios on a crafted doc") {
    val df = Seq("Hello, world!!").toDF("t") // 14 chars, 3 punct, 2 tokens
    val stats = Text.stats(col("t")).toMap
    assert(one[Long](df.select(stats("n_tokens"))) == 2L)
    assert(one[Long](df.select(stats("n_chars_measured"))) == 14L)
    // tokens "Hello," (6) + "world!!" (7) → mean 6.5
    assert(one[Double](df.select(stats("mean_token_len"))) == 6.5)
    assert(one[Double](df.select(stats("punct_ratio"))) == math.rint(3.0 / 14 * 1e6) / 1e6)
  }

  test("stopword_ratio counts English function words") {
    val df = Seq("the cat is on the mat").toDF("t") // the, is, on, the → 4/6
    val stats = Text.stats(col("t")).toMap
    assert(one[Double](df.select(stats("stopword_ratio"))) == math.rint(4.0 / 6 * 1e6) / 1e6)
  }

  test("qualityOk applies the keep/drop band thresholds") {
    import org.apache.spark.sql.functions.lit
    def q(n: Long, mtl: Double, pr: Double, sr: Double): Boolean =
      spark.range(1).select(Text.qualityOk(lit(n), lit(mtl), lit(pr), lit(sr)))
        .collect()(0).getBoolean(0)
    assert(q(100, 5.0, 0.05, 0.4))        // healthy prose
    assert(!q(3, 5.0, 0.05, 0.4))         // too short
    assert(!q(100, 25.0, 0.05, 0.4))      // degenerate long "words"
    assert(!q(100, 5.0, 0.5, 0.4))        // punctuation soup
    assert(!q(100, 5.0, 0.05, 0.0))       // no function words
  }

  test("bpeTokenCount splits letter/digit/punct runs with leading spaces") {
    val df = Seq("hello world 123", "a1!b").toDF("t")
    val out = df.select(Text.bpeTokenCount(col("t"))).collect().map(_.getLong(0))
    assert(out(0) == 3L) // "hello", " world", " 123"
    assert(out(1) == 4L) // "a", "1", "!", "b"
  }

  test("langId: stopword argmax for latin scripts, script detection for CJK") {
    val cases = Seq(
      "the cat sat on the mat and it was good" -> "en",
      "der hund ist nicht auf dem sofa und auch nicht im garten" -> "de",
      "el perro es grande y no come en la casa" -> "es",
      "le chien est dans le jardin pour une heure" -> "fr",
      "これは日本語のテキストです" -> "ja",   // kana present (+ han) → ja, not zh
      "한국어 텍스트입니다" -> "ko",
      "这是中文文本没有假名" -> "zh",          // han only → zh
      "zzz qqq xxx" -> "und"
    )
    val out = cases.map(_._1).toDF("t")
      .select(Text.langId(col("t"))).collect().map(_.getString(0))
    cases.zip(out).foreach { case ((text, want), got) =>
      assert(got == want, s"langId('$text') = $got, want $want")
    }
  }

  test("fingerprint is deterministic and order-sensitive") {
    val df = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha", "")
      .toDF("t")
    val fp = df.select(Text.fingerprint(col("t"))).collect().map(_.getLong(0))
    assert(fp(0) == fp(1))
    assert(fp(0) != fp(2))
    assert(fp(3) == 0L)
  }
}

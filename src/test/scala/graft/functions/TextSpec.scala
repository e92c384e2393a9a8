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

  test("repetitionStats: hand-computed line and 2-gram fractions") {
    // lines: "a b a b" (7 ch), "c d" ×2 (3 ch) → 3 lines, 1 dup,
    // line chars 13, dup chars 3. tokens a b a b c d c d → 2-grams
    // {a b:2, b a:1, b c:1, c d:2, d c:1}; top ties at c=2 → the
    // lexicographically larger "c d"; text len 15.
    val df = Seq(1L -> "a b a b\nc d\nc d").toDF("doc_id", "t")
    val r = Text.repetitionStats(df, "doc_id", "t").collect()(0)
    assert(r.getAs[Long]("n_lines") == 3L)
    assert(r.getAs[Double]("dup_line_frac") == math.rint(1.0 / 3 * 1e6) / 1e6)
    assert(r.getAs[Double]("dup_line_char_frac") == math.rint(3.0 / 13 * 1e6) / 1e6)
    assert(r.getAs[String]("top_ngram") == "c d")
    assert(r.getAs[Double]("top_ngram_char_frac") == 0.4) // 2*3/15
    assert(r.getAs[Double]("dup_ngram_frac") == math.rint(12.0 / 21 * 1e6) / 1e6)
  }

  test("repetitionStats: degenerate docs (empty, single token) stay defined") {
    val df = Seq(1L -> "", 2L -> "word").toDF("doc_id", "t")
    val rows = Text.repetitionStats(df, "doc_id", "t")
      .orderBy("doc_id").collect()
    // empty: one zero-length line, one empty gram — every frac 0, no NPE
    assert(rows(0).getAs[Long]("n_lines") == 1L)
    assert(rows(0).getAs[Double]("dup_line_frac") == 0.0)
    assert(rows(0).getAs[Double]("dup_line_char_frac") == 0.0)
    assert(rows(0).getAs[Double]("dup_ngram_frac") == 0.0)
    // single token: its whole-token "2-gram" covers the document
    assert(rows(1).getAs[String]("top_ngram") == "word")
    assert(rows(1).getAs[Double]("top_ngram_char_frac") == 1.0)
  }

  test("repetitionStats: a doubled document is flagged by construction") {
    val base = "alpha beta gamma delta epsilon zeta"
    val df = Seq(1L -> base, 2L -> (base + "\n" + base)).toDF("doc_id", "t")
    val byId = Text.repetitionStats(df, "doc_id", "t")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("dup_line_frac") == 0.0)
    assert(byId(2L).getAs[Double]("dup_line_frac") == 0.5)
    assert(byId(2L).getAs[Double]("dup_line_char_frac") == 0.5)
    // doubling duplicates every 2-gram except the single junction gram
    // ("zeta alpha"): dup mass 2·(10+10+11+13+12) = 112 of 122 total
    assert(byId(2L).getAs[Double]("dup_ngram_frac") == math.rint(112.0 / 122 * 1e6) / 1e6)
    assert(byId(1L).getAs[Double]("dup_ngram_frac") == 0.0)
  }

  test("chunk: overlapping windows, short tail, exact offsets") {
    // len 10, size 4, stride 3 → starts 1, 4, 7, 10 (last two run short)
    val df = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val got = Text.chunk(df, "doc_id", "text", 4, 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((0L, 1L, "abcd"), (1L, 4L, "defg"),
      (2L, 7L, "ghij"), (3L, 10L, "j")))
  }

  test("chunk: stride == size partitions without overlap; empty docs vanish") {
    val df = Seq((1L, "abcdef"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Text.chunk(df, "doc_id", "text", 3, 3)
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "abc"), (1L, "def")))
    // reconstruction: non-overlapping chunks concatenate to the original
    assert(got.filter(_._1 == 1L).map(_._2).mkString == "abcdef")
  }

  test("chunk rejects non-positive size or stride") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { Text.chunk(df, "doc_id", "text", 0, 3) }
    intercept[IllegalArgumentException] { Text.chunk(df, "doc_id", "text", 3, 0) }
  }

  test("bpePairCounts: word-frequency-weighted adjacent char pairs, case-folded") {
    // vocab after lower(): aab:2, ab:1, x:1 (single chars contribute no pair)
    val df = Seq((1L, "aab AB x"), (2L, "Aab")).toDF("doc_id", "text")
    val got = Text.bpePairCounts(df, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // pairs: aab → aa(×2), ab(×2); ab → ab(×1)  ⇒ ab:3, aa:2
    assert(got == Seq(("ab", 3L), ("aa", 2L)))
  }

  test("bpePairCounts: topN truncates on (count desc, pair asc)") {
    val df = Seq((1L, "ab ab bc cd")).toDF("doc_id", "text")
    val got = Text.bpePairCounts(df, "text", topN = 2)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("ab", "bc")) // bc before cd on the pair tiebreak
  }

  test("bpeTrainMerges/bpeSegment: hand-computed greedy merge sequence") {
    // vocab: low×2, lower×1, newest×2
    // pairs: (l,o)=3 (o,w)=3 (w,e)=3 (e,r)=1 (n,e)=2 (e,w)=2 (e,s)=2 (s,t)=2
    // tie at 3 → lexicographic → (l,o); then (lo,w)=3 beats (w,e)=3 on
    // lhs 'lo' < 'w'; then the 2-tie resolves to (e,s)
    val docs = Seq((1L, "low low lower"), (2L, "newest newest"))
      .toDF("doc_id", "text")
    val merges = Text.bpeTrainMerges(docs, "text", nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(merges == Seq((1, "l", "o", 3L), (2, "lo", "w", 3L), (3, "e", "s", 2L)))
    val seg = Text.bpeSegment(docs, "text", nMerges = 3).collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getInt(3)))).toMap
    graft.operators.Dedup.clearCaches()
    assert(seg("low") == (("low", 1)))
    assert(seg("lower") == (("low e r", 3)))
    assert(seg("newest") == (("n e w es t", 5)))
  }

  test("bpeTrainMerges: runs merge leftmost-greedy; loop stops when pairs run dry") {
    // 'aaa' + merge (a,a) must give [aa, a], then (aa, a) merges next
    val docs = Seq((1L, "aaa aaa bb")).toDF("doc_id", "text")
    val merges = Text.bpeTrainMerges(docs, "text", nMerges = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(merges == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L), (3, "b", "b", 1L)))
    // a vocabulary that exhausts its pairs early yields fewer rows
    val short = Text.bpeTrainMerges(Seq((1L, "ab")).toDF("doc_id", "text"),
      "text", nMerges = 5).collect()
    assert(short.map(r => (r.getString(1), r.getString(2))).toSeq == Seq(("a", "b")))
  }

  test("bpeEncode: applying trained merges reproduces bpeSegment; new words encode") {
    val docs = Seq((1L, "low low lower"), (2L, "newest newest"))
      .toDF("doc_id", "text")
    val merges = Text.bpeTrainMerges(docs, "text", nMerges = 3).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    // encode(training corpus) must equal segment(training corpus) verbatim
    val seg = Text.bpeSegment(docs, "text", nMerges = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    graft.operators.Dedup.clearCaches()
    val enc = Text.bpeEncode(docs, "text", merges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getInt(3))).toSet
    assert(enc == seg)
    // unseen words encode under the same rank-ordered greedy application:
    // merges are (l,o), (lo,w), (e,s) — "slow" → [s, low], "best" → [b, es, t]
    val nw = Text.bpeEncode(Seq((1L, "slow best")).toDF("doc_id", "text"),
        "text", merges).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(nw("slow") == "s low")
    assert(nw("best") == "b es t")
  }

  test("fertilityReport: exact per-source sums and ratio arithmetic") {
    val docs = Seq(
      (1L, "src0", "hello world"),           // 11 chars, 2 words, 2 pieces
      (2L, "src0", "ab1 cd"),                // 6 chars, 2 words; "ab","1"," cd" → 3 pieces
      (3L, "src1", "x-y")                    // 3 chars, 1 word; "x","-","y" → 3 pieces
    ).toDF("doc_id", "source", "text")
    val out = Text.fertilityReport(docs, "source").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(out("src0") == ((2L, 17L, 4L, 5L, 1.25, 3.4)))
    assert(out("src1") == ((1L, 3L, 1L, 3L, 3.0, 1.0)))
  }

  test("fertilityReport: an empty document counts zero words and pieces") {
    val docs = Seq((1L, "s", ""), (2L, "s", "one two")).toDF("doc_id", "source", "text")
    val r = Text.fertilityReport(docs, "source").collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(3) == 2L && r.getLong(4) == 2L)
  }

  test("tokenEntropy: uniform two-term doc hits ln 2, ratio 1; constant doc hits 0") {
    val docs = Seq((1L, "a a b b"), (2L, "a a a")).toDF("doc_id", "text")
    val out = Text.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val u = out(1L)
    assert(u.getAs[Long]("n_toks") == 4L && u.getAs[Long]("n_vocab") == 2L)
    assert(u.getAs[Double]("entropy") == 0.693147)      // round(ln 2, 6)
    assert(u.getAs[Double]("entropy_ratio") == 1.0)
    val c = out(2L)
    assert(c.getAs[Double]("entropy") == 0.0)
    assert(c.isNullAt(c.fieldIndex("entropy_ratio")))   // vocab 1: undefined
  }

  test("tokenEntropy: skew lowers entropy at equal length/vocab; case folds") {
    val docs = Seq((1L, "a a a B"), (2L, "a a b b")).toDF("doc_id", "text")
    val out = Text.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy")).toMap
    assert(out(1L) < out(2L))
    assert(out(1L) == 0.562335) // round(ln4 - (3 ln3)/4, 6)
  }

  test("zipfFit matches the independently computed least-squares closed form") {
    // term w_r appears 2^(8-r) times → ranks 1..4 with distinct counts
    val words = (1 to 4).flatMap(r => Seq.fill(1 << (8 - r))(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = Text.zipfFit(docs, "text", topK = 4).head()
    assert(row.getAs[Long]("n_terms") == 4L)
    // closed form: x_i = ln i, y_i = ln 2^(8-i); slope computed offline
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = (1 to 4).map(i => math.log((1 << (8 - i)).toDouble))
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(row.getAs[Double]("slope") - b) < 1e-5)
    assert(math.abs(row.getAs[Double]("intercept") - (sy - b * sx) / n) < 1e-5)
  }

  test("zipfFit: fewer distinct terms than topK uses what exists") {
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val row = Text.zipfFit(docs, "text", topK = 64).head()
    assert(row.getAs[Long]("n_terms") == 3L)
    assert(row.getAs[Double]("slope") < 0.0) // frequencies decay
  }
}

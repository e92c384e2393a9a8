package graft

import org.apache.spark.sql.SparkSession

/** Pure-SQL usability of the engine (VERDICT r04 #8): a session with
  * GraftExtensions runs the docs/SQL.md recipes — scalar/vector functions
  * straight from SQL, whole operators through one temp-view registration.
  * Each SQL result is asserted against the DataFrame-API twin, so the two
  * surfaces cannot drift.
  */
class SqlSurfaceSpec extends SparkSpec {

  /** A sibling session sharing the test SparkContext, with the extensions
    * installed via the builder API (the spark.sql.extensions conf is
    * static per-context, so only withExtensions can inject here — same
    * trick as DotProductSpec).
    */
  private lazy val sqlSession: SparkSession = {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("vector functions from SQL match the DataFrame twins") {
    val r = sqlSession.sql(
      """SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS same,
                graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS orth,
                graft_norm(array(3.0d, 4.0d)) AS n""").collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 5.0)
  }

  test("text functions from SQL: tokens, shingles, lang id, bpe count, fingerprint") {
    val r = sqlSession.sql(
      """SELECT graft_tokens('the quick fox') AS toks,
                graft_shingles('a b c d', 3) AS sh,
                graft_lang_id('the cat sat on the mat and it was good') AS lang,
                graft_bpe_token_count('hello world 42!') AS bpe,
                graft_fingerprint('a b') AS fp,
                graft_fingerprint('b a') AS fp_swapped""").collect()(0)
    assert(r.getSeq[String](0) == Seq("the", "quick", "fox"))
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getString(2) == "en")
    assert(r.getLong(3) == 4L) // "hello", " world", " 42", "!"
    assert(r.getLong(4) != r.getLong(5), "fingerprint must be order-sensitive")
  }

  test("normalization functions from SQL: graft_nfc and graft_clean_text") {
    val r = sqlSession.sql(
      """SELECT graft_nfc('Café') AS composed,
                graft_clean_text('  a  b\r\nc  ') AS cleaned""").collect()(0)
    assert(r.getString(0) == "Café")
    assert(r.getString(1) == "a b\nc")
  }

  test("SQL twins equal the DataFrame-API composition on a real column") {
    import org.apache.spark.sql.functions.col
    val s = sqlSession
    import s.implicits._
    val docs = Seq((1L, "the quick brown fox"), (2L, ""), (3L, "der und das ist"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlspec_docs")
    val viaSql = s.sql(
      """SELECT doc_id, graft_lang_id(text) AS lang, graft_bpe_token_count(text) AS bpe
         FROM sqlspec_docs""").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaDf = docs.select(col("doc_id"),
        graft.functions.Text.langId(col("text")).as("lang"),
        graft.functions.Text.bpeTokenCount(col("text")).as("bpe"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaSql == viaDf)
  }

  test("whole-operator recipe: near-dup pairs registered once, consumed from pure SQL") {
    val s = sqlSession
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river today"),
      (3L, "completely different content about catalyst optimizer rules")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlspec_corpus")
    graft.operators.Dedup
      .nearDuplicates(s.table("sqlspec_corpus"), "doc_id", "text", threshold = 0.5)
      .createOrReplaceTempView("sqlspec_pairs")
    val kept = s.sql(
      """SELECT d.doc_id FROM sqlspec_corpus d
         LEFT ANTI JOIN sqlspec_pairs p ON d.doc_id = p.id_b
         ORDER BY d.doc_id""").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L)) // 2 dropped as the dup of 1
    graft.operators.Dedup.clearCaches(blocking = true)
  }

  test("graft_minhash/graft_band_sigs equal the batch signature operators from pure SQL") {
    val s = sqlSession
    import s.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs today"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlspec_sig_docs")
    val viaSql = s.sql(
      """SELECT doc_id, bs.band AS band, bs.sig AS sig FROM (
           SELECT doc_id,
                  explode(graft_band_sigs(
                    graft_minhash(graft_tokens(text), 16, 3), 16, 4)) AS bs
           FROM sqlspec_sig_docs)""").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaBatch = graft.operators.Dedup.bandSignatures(
      graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 16),
      "doc_id", 16, 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaSql == viaBatch,
      "SQL-surface signatures diverged from the batch operators")
  }

  test("graft_window_hashes equals windowOccurrences from pure SQL") {
    val s = sqlSession
    import s.implicits._
    val docs = Seq((1L, Some("a b c d e f g")), (2L, Some("a b c d")),
      (3L, Some("x y")), (4L, Some("")), (5L, Option.empty[String]))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlspec_win_docs")
    val viaSql = s.sql(
      """SELECT doc_id, pos + 1 AS pos, col AS win_hash FROM (
           SELECT doc_id,
                  posexplode(graft_window_hashes(graft_tokens(text), 4))
           FROM sqlspec_win_docs)""").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSet
    val viaBatch = graft.operators.Passages
      .windowOccurrences(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql == viaBatch,
      "SQL-surface window hashes diverged from the batch operator")
    assert(viaBatch.exists(_._1 == 1L) && !viaBatch.exists(_._1 == 3L))
    // null text -> EMPTY array (not NULL), per the documented contract
    val nullRow = s.sql(
      """SELECT size(graft_window_hashes(graft_tokens(text), 4))
         FROM sqlspec_win_docs WHERE doc_id = 5""").collect().head
    assert(!nullRow.isNullAt(0) && nullRow.getInt(0) == 0)
  }

  test("graft_delete_variants equals the fuzzy-join blocking expression from pure SQL") {
    val s = sqlSession
    val got = s.sql("SELECT graft_delete_variants('abc', 64)")
      .collect()(0).getSeq[String](0).toSet
    assert(got == Set("abc", "bc", "ac", "ab"))
    assert(s.sql("SELECT graft_delete_variants('', 64)")
      .collect()(0).getSeq[String](0) == Seq(""),
      "empty key must not hit the descending-sequence trap from SQL either")
  }

  test("graft_shingles width: foldable expressions allowed, column refs rejected clearly") {
    // foldable arithmetic constant-folds to 3 and works
    val ok = sqlSession.sql("SELECT graft_shingles('a b c d', 1 + 2)")
      .collect()(0).getSeq[String](0)
    assert(ok == Seq("a b c", "b c d"))
    // a column reference cannot be a shingle width — clear message, no crash
    val s = sqlSession
    import s.implicits._
    Seq((1, 2)).toDF("id", "w").createOrReplaceTempView("sqlspec_w")
    val e = intercept[Exception] {
      s.sql("SELECT graft_shingles('a b c', w) FROM sqlspec_w").collect()
    }
    assert(e.getMessage.contains("literal"), s"unexpected error: ${e.getMessage}")
  }
}

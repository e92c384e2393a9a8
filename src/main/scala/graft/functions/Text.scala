package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, n-gram
  * shingles, quality stats, language ID, fingerprinting. All built-in
  * expressions (codegen'd where Spark supports it) — no UDFs, so every
  * operator whole-stage-compiles and distributes trivially.
  */
object Text {

  /** Whitespace tokens of a text column (empty text → empty array, not
    * array("")). No lambda: after stripping edge whitespace (regexp, not
    * trim — trim() removes only ASCII spaces, so "\tfoo" would yield a
    * phantom "" first token; code-review r3 finding), `\s+` splitting can
    * only emit an empty token for the empty string itself, so a
    * conditional replaces the interpreted filter HOF and the whole
    * expression stays codegen'd.
    */
  def tokens(text: Column): Column = {
    val t = regexp_replace(text, "^\\s+|\\s+$", "")
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array column.
    *
    * Pass a bound attribute (a projected `tokens(...)` column), not the
    * `tokens(text)` expression inline: higher-order lambdas are interpreted,
    * so an inline token expression would re-split the document once per
    * shingle position — O(tokens²) per doc (profiled 4.9 s → 0.6 s on the
    * sf0.1 near-dup corpus). Catalyst's CollapseProject keeps the
    * materializing projection because the array is referenced more than
    * once.
    */
  def shinglesFromTokens(ts: Column, n: Int): Column = {
    val count = greatest(size(ts) - (n - 1), lit(1))
    transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(ts, i + 1, lit(n))))
  }

  /** Word n-gram shingles as space-joined strings; documents shorter than n
    * tokens yield their whole token string as the single shingle.
    * Convenience form — hot paths should project `tokens` first and call
    * [[shinglesFromTokens]] (see its scaladoc).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** A small multilingual stopword table for language ID / quality scoring
    * (public common function words; the heuristic is ours).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
      "for", "on", "with", "as", "was", "at", "by", "this", "are", "be"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "von", "zu", "den", "dem", "auf", "für", "im", "sich", "auch"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
      "es", "no", "por", "con", "para", "del", "se", "su"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "est",
      "dans", "que", "pour", "qui", "sur", "pas", "au", "du", "ce")
  )

  /** Count of tokens that belong to `words` (with multiplicity). */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Quality-scoring stats per document: token/char counts, mean token
    * length, punctuation ratio, stopword ratio, and a composite quality flag
    * (the usual pretraining heuristics: not too short, words not too long,
    * not punctuation soup, some function words).
    */
  def stats(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    val nTokens = size(ts)
    val nChars = length(text)
    val punct = length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", ""))
    val stopEn = stopwordCount(ts, stopwords("en"))
    Seq(
      "n_tokens" -> nTokens.cast("long"),
      "n_chars_measured" -> nChars.cast("long"),
      "mean_token_len" -> round(
        when(nTokens > 0, (length(concat_ws("", ts)).cast("double")) / nTokens)
          .otherwise(lit(0.0)), 6),
      "punct_ratio" -> round(
        when(nChars > 0, punct.cast("double") / nChars).otherwise(lit(0.0)), 6),
      "stopword_ratio" -> round(
        when(nTokens > 0, stopEn.cast("double") / nTokens).otherwise(lit(0.0)), 6)
    )
  }

  /** Composite quality flag — the usual pretraining keep/drop heuristics
    * over [[stats]] columns: enough-but-not-degenerate token count, word
    * lengths in a natural-language band, not punctuation soup, and at
    * least some function words. Thresholds are the common public defaults
    * (Gopher-style rules); tune per corpus.
    */
  def qualityOk(nTokens: Column, meanTokenLen: Column, punctRatio: Column,
                stopwordRatio: Column): Column =
    nTokens >= 5 && nTokens <= 1000000 &&
      meanTokenLen >= 2 && meanTokenLen <= 15 &&
      punctRatio < 0.3 &&
      stopwordRatio > 0.01

  /** BPE-ish subword count: pieces matched by a GPT-2-style pretokenizer
    * regex (letters / digits / other runs, optional leading space).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"), lit(0)))
      .cast("long")

  /** Fixed-size sliding-window chunking — the context-window splitter a
    * training/RAG pipeline runs over every document: chunks of `size`
    * characters starting every `stride` characters (stride < size ⇒
    * overlapping windows, stride == size ⇒ a partition, the last chunk
    * may run short). A codegen'd `sequence` + `explode` + positional
    * `substr` — no UDF, no per-row lambda; output is one shuffle-free
    * projection whose row count is ceil(len/stride) per document.
    * Empty/null documents produce no chunks (filtered BEFORE the
    * sequence: Spark's `sequence(0, -1)` would infer step -1, not
    * emptiness). Offsets are 1-based to match SQL `substr`.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1,
      s"chunk needs size >= 1 and stride >= 1, got size=$size stride=$stride")
    docs.select(col(idCol), col(textCol).as("__t"))
      .filter(length(col("__t")) > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0L), floor((length(col("__t")) - 1) / stride).cast("long"))))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * stride + 1).as("chunk_start"),
        col("__t").substr((col("chunk_id") * stride + 1).cast("int"),
          lit(size)).as("chunk_text"))
  }

  /** Language ID: script detection first (kana → ja before han → zh, since
    * Japanese text mixes kanji with kana; hangul → ko), then argmax of
    * per-language stopword hit counts; below `minHits` hits → "und"
    * (undetermined). One pass, pure expressions.
    */
  def langId(text: Column, minHits: Int = 1): Column = {
    val ts = tokens(lower(text))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordCount(ts, words).as("hits"), lit(lang).as("lang"))
    }
    // array_max on struct orders by first field (hits) then lang — ties
    // break deterministically toward the lexicographically larger lang.
    val best = array_max(array(scored: _*))
    when(text.rlike("[\\u3040-\\u30ff]"), lit("ja"))
      .when(text.rlike("[\\uac00-\\ud7af]"), lit("ko"))
      .when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best.getField("hits") >= minHits, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Rolling document fingerprint over tokens:
    * acc = rotl(acc, 5) XOR xxhash64(token) — bitwise-only (a wrapping
    * polynomial hash would trip Spark 4's default ANSI overflow checks).
    * Order-sensitive, deterministic, one fold per row.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      shiftleft(acc, 5).bitwiseOR(shiftrightunsigned(acc, 59))
        .bitwiseXOR(xxhash64(t)))

  /** [[fingerprint]]'s engine-PORTABLE twin (VERDICT r12 #7 follow-on):
    * the same rotate-and-xor rolling fold, but over the md5-derived
    * 60-bit token hash and rotating WITHIN 60 bits — every intermediate
    * stays a non-negative < 2^60 long, so the fold replays in SQL with
    * plain `& << >> xor` (no unsigned-shift semantics to match across
    * engines). xxhash64 stays the throughput default; this one sits
    * under the full t_fingerprint oracle.
    */
  def fingerprintPortable(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      shiftleft(acc.bitwiseAND(lit((1L << 55) - 1)), 5)
        .bitwiseOR(shiftright(acc, 55))
        .bitwiseXOR(conv(substring(md5(t), 1, 15), 16, 10).cast("long")))

  /** Repetition stats per document — the MassiveText/Gopher-style
    * repetition quality signals, computed with shuffles instead of
    * per-row array lambdas (interpreted HOFs are the shinglesFromTokens
    * trap; two HashAggregates with map-side partial combine distribute
    * trivially and never hold more than one (doc, line/gram) group per
    * buffer):
    *
    *  - `n_lines`, `dup_line_frac` — fraction of `\n`-lines that are
    *    exact duplicates of an earlier line (occurrences beyond the first
    *    of each distinct line, over all lines);
    *  - `dup_line_char_frac` — same numerator weighted by line length,
    *    over total line characters;
    *  - `top_ngram`, `top_ngram_char_frac` — the most frequent word
    *    n-gram (ties broken toward the lexicographically larger gram, so
    *    the answer is deterministic) and the fraction of document
    *    characters its occurrences cover (count × gram length / chars —
    *    the standard product form; overlapping occurrences count fully);
    *  - `dup_ngram_frac` — the n-gram occurrence mass (count × length)
    *    sitting in grams that appear ≥ 2 times, over all n-gram mass.
    *    Bounded [0, 1] by construction, unlike the raw
    *    duplicated-chars-over-chars form, which overlap can push past 1.
    *
    * All ratios round(…, 6) with plain division (IEEE-deterministic, the
    * oracle-compare convention). Documents shorter than n tokens
    * contribute their whole token string as the single gram
    * ([[shinglesFromTokens]] semantics).
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 2): DataFrame = {
    val id = col(idCol)
    val safeFrac = (num: Column, den: Column) =>
      round(when(den > 0, num.cast("double") / den).otherwise(lit(0.0)), 6)
    val lineStats = docs
      .select(id, explode(split(col(textCol), "\n")).as("__line"))
      .groupBy(id, col("__line"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(id).agg(
        sum(col("__c")).as("__n_lines"),
        sum(col("__c") - 1).as("__dup_lines"),
        sum(col("__c") * length(col("__line"))).as("__line_chars"),
        sum((col("__c") - 1) * length(col("__line"))).as("__dup_line_chars"))
    val gramStats = docs
      .select(id, tokens(col(textCol)).as("__toks"))
      .select(id, explode(shinglesFromTokens(col("__toks"), n)).as("__gram"))
      .groupBy(id, col("__gram"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(id).agg(
        max(struct(col("__c").as("c"), col("__gram").as("g"))).as("__top"),
        sum(col("__c") * length(col("__gram"))).as("__gram_mass"),
        sum(when(col("__c") >= 2, col("__c") * length(col("__gram")))
          .otherwise(lit(0L))).as("__dup_gram_mass"))
    docs.select(id, length(col(textCol)).as("__n_chars"))
      .join(lineStats, Seq(idCol))
      .join(gramStats, Seq(idCol))
      .select(id,
        col("__n_lines").as("n_lines"),
        safeFrac(col("__dup_lines"), col("__n_lines")).as("dup_line_frac"),
        safeFrac(col("__dup_line_chars"), col("__line_chars"))
          .as("dup_line_char_frac"),
        col("__top.g").as("top_ngram"),
        safeFrac(col("__top.c") * length(col("__top.g")), col("__n_chars"))
          .as("top_ngram_char_frac"),
        safeFrac(col("__dup_gram_mass"), col("__gram_mass"))
          .as("dup_ngram_frac"))
  }

  /** BPE merge-pair counting — the inner step of byte-pair-encoding
    * tokenizer training at corpus scale: count adjacent CHARACTER pairs
    * across the corpus, weighted by word frequency. Runs at DISTINCT-WORD
    * grain (the classic trick: after the one corpus pass that builds the
    * word-frequency vocabulary, pair expansion touches each unique word
    * once — vocabulary size grows sublinearly in corpus size, so the
    * expensive explode is corpus-size-independent). The top pair is the
    * merge a BPE trainer would pick next; `topN` returns the candidate
    * list ordered (count desc, pair asc). Two hash aggregations, one
    * TakeOrdered — no windows, no single-partition stage.
    */
  def bpePairCounts(docs: DataFrame, textCol: String,
                    topN: Int = 30): DataFrame = {
    val vocab = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
    vocab.filter(length(col("w")) >= 2)
      .select(col("w"), col("wn"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("wn"))
      .groupBy(col("pair")).agg(sum(col("wn")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topN)
  }

  /** The shared BPE greedy-merge loop behind [[bpeTrainMerges]] /
    * [[bpeSegment]] — byte-pair-encoding tokenizer TRAINING (Sennrich
    * et al., ACL 2016: start from characters, repeatedly merge the
    * highest-frequency adjacent symbol pair), run entirely at
    * DISTINCT-WORD grain: the corpus explode collapses to (word, count)
    * once, and every subsequent pass touches the vocabulary, not token
    * occurrences — the [[bpePairCounts]] scale stance, now with the
    * merge-apply step that completes the training loop.
    *
    * Per merge: ONE Spark job — the map-side-combined pair aggregation
    * with its LIMIT-1 argmax collect (one row of driver METADATA — the
    * kmeans-centroid class). The merge applies per-word as an `aggregate`
    * fold, greedily leftmost-non-overlapping ("aaa" + (a,a) → [aa, a] —
    * the reference behavior). Ties break (count DESC, left, right) so
    * engines agree; pair counting is integer-exact, so the DuckDB oracle
    * replays the loop unrolled — every intermediate merge decision of the
    * oracle depth, and [[bpeTrainMerges]] at ANY depth answers the same
    * prefix.
    *
    * LINEAGE TRUNCATION (the r10 rework that makes ≥256-merge
    * vocabulary-scale training practical): each generation is a fold
    * PROJECT over the previous one, and chaining those plans makes the
    * optimizer's project-collapse inline every fold into its successor —
    * the fold references its input array ~6×, so the collapsed expression
    * grows 6^depth and the argmax's planning time DOUBLES per merge
    * (measured: 0.3 s at depth 8, 13 s at depth 16, OOM near 30; caching
    * each generation does not help because substitution happens after the
    * Dataset chain is already deep). The fix is the iterative-algorithm
    * idiom (ALS/GraphFrames): `localCheckpoint(eager = false)` each
    * generation, which rebases the plan on the materialized RDD —
    * planning cost is then CONSTANT per merge, and the lazy checkpoint
    * materializes as a side effect of the next argmax job, keeping the
    * loop at one job per merge. The superseded generation's blocks are
    * dropped explicitly once its successor has materialized. Local
    * checkpoints trade fault-tolerance for speed (an executor loss mid-
    * loop fails the job — acceptable for a training artifact build, and
    * `spark.checkpoint.dir`-based reliable checkpoints are the swap-in if
    * a deployment needs resumability).
    */
  /** Initial symbol sequence of a word at CHARACTER grain (the classic
    * Sennrich starting alphabet).
    */
  private val charSyms: Column = transform(sequence(lit(1), length(col("w"))),
    i => col("w").substr(i, lit(1)))

  /** Initial symbol sequence at BYTE grain: the word's UTF-8 bytes as
    * uppercase hex pairs ("é" → ["C3", "A9"]). The base alphabet is then
    * at most 256 symbols and COVERS EVERY POSSIBLE INPUT — the GPT-2
    * byte-level guarantee of zero OOV on arbitrary text. Hex-pair
    * strings (not raw bytes) keep the merge loop's symbol algebra plain
    * string concat, replayable verbatim by the oracle
    * (`regexp_extract_all(hex(encode(w)), '[0-9A-F]{2}')` both sides).
    */
  private val byteSyms: Column = regexp_extract_all(
    hex(encode(col("w"), "UTF-8")), lit("[0-9A-F]{2}"), lit(0))

  // test hooks: BpeDriverParitySpec drives bpeLoop on both symbol grains
  private[graft] def charSymsForTest: Column = charSyms
  private[graft] def byteSymsForTest: Column = byteSyms

  /** Max collected vocabulary size for [[bpeLoopLocal]]'s driver fast
    * path. BPE trains at DISTINCT-WORD grain, and real tokenizer vocab
    * slices are bounded (tokenizer trainers hold them in memory as a
    * matter of course); past the cap — web-scale junk vocabularies —
    * the distributed one-job-per-merge loop runs unchanged.
    */
  private[graft] val BpeDriverVocabCap = 1 << 16

  /** Spark's string ordering is UTF8 BINARY (unsigned byte comparison),
    * which differs from java.lang.String's UTF-16 ordering above the BMP —
    * the driver loop's tie-break must match the distributed argmax's
    * `orderBy(l, r)` exactly or a tied merge decision drifts.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** The training fold verbatim (leftmost-non-overlapping greedy merge) —
    * shared semantics with the `aggregate` expression in the distributed
    * loop and the executor-side fold in [[bpeEncode]].
    */
  private def bpeMergeWord(syms: Array[String], l: String, r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (out.nonEmpty && out.last == l && syms(j) == r)
        out(out.length - 1) = l + r
      else out += syms(j)
      j += 1
    }
    out.toArray
  }

  /** The greedy merge loop run entirely on the driver over a collected
    * vocabulary (r18, guide §1.2 "the distributed algorithm" / the
    * bounded-driver-shortcut stance of Grouping.connectedComponentsAuto):
    * each distributed merge is ONE Spark job over a vocabulary-sized
    * frame — pure scheduling overhead at tokenizer-training depth
    * (measured: the sf0.1 vocabulary is TINY and 256 merges cost 72 s,
    * ~0.27 s/job of fixed overhead). Here pair counts update
    * incrementally (only words containing the merged pair recount), the
    * argmax tie-breaks (count DESC, l, r) on UTF-8 bytes exactly like the
    * distributed orderBy, and the fold is [[bpeMergeWord]] — decisions
    * are integer-exact either way, so the two paths are bit-identical
    * (BpeDriverParitySpec drives both on tie- and overlap-heavy
    * fixtures).
    */
  private def bpeLoopLocal(vocab: Array[(String, Long, Array[String])],
                           nMerges: Int)
      : (Seq[(Int, String, String, Long)], Array[(String, Long, Array[String])]) = {
    import scala.collection.mutable
    val syms = vocab.map(_._3)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.LinkedHashSet[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      val wn = vocab(wi)._2
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = counts.getOrElse(p, 0L) + sign * wn
        if (c == 0L) counts.remove(p) else counts.update(p, c)
        if (sign > 0L) occ.getOrElseUpdate(p, mutable.LinkedHashSet.empty) += wi
        j += 1
      }
    }
    vocab.indices.foreach(addWord(_, 1L))
    val merges = mutable.ListBuffer.empty[(Int, String, String, Long)]
    var m = 1
    var dry = false
    while (m <= nMerges && !dry) {
      if (counts.isEmpty) dry = true
      else {
        var bl: String = null
        var br: String = null
        var bc = Long.MinValue
        counts.foreach { case ((l, r), c) =>
          if (bl == null || c > bc ||
            (c == bc && (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))) {
            bl = l; br = r; bc = c
          }
        }
        merges += ((m, bl, br, bc))
        // only words that ever contributed this pair can change; a stale
        // index (the word no longer holds the adjacency) nets to zero
        // because its current contributions are subtracted and re-added
        val affected = occ.remove((bl, br)).fold(Array.empty[Int])(_.toArray)
        affected.foreach { wi =>
          addWord(wi, -1L)
          syms(wi) = bpeMergeWord(syms(wi), bl, br)
          addWord(wi, 1L)
        }
        m += 1
      }
    }
    (merges.toList,
      vocab.indices.map(i => (vocab(i)._1, vocab(i)._2, syms(i))).toArray)
  }

  private[graft] def bpeLoop(docs: DataFrame, textCol: String, nMerges: Int,
                      symInit: Column = charSyms,
                      driverCap: Int = BpeDriverVocabCap)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"bpeLoop needs at least one merge, got $nMerges")
    val spark = docs.sparkSession
    val vocabDf = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .select(col("w"), col("wn"), symInit.as("syms"))
    if (driverCap > 0) {
      // persisted around the cap probe so a past-cap corpus hands the
      // already-computed vocabulary to the distributed loop instead of
      // re-running the corpus aggregation (the connectedComponentsAuto
      // probe recipe)
      val cached = vocabDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val probe = cached.limit(driverCap + 1).collect()
      if (probe.length <= driverCap) {
        try {
          val vocab = probe.map(r =>
            (r.getString(0), r.getLong(1), r.getSeq[String](2).toArray))
          val (ms, fin) = bpeLoopLocal(vocab, nMerges)
          import spark.implicits._
          val finDf = spark.createDataset(
              fin.toSeq.map(t => (t._1, t._2, t._3.toSeq)))
            .toDF("w", "wn", "syms")
          return (ms, finDf)
        } finally cached.unpersist()
      }
      try bpeLoopDistributed(cached.localCheckpoint(false), nMerges)
      finally cached.unpersist()
    } else
      bpeLoopDistributed(vocabDf.localCheckpoint(false), nMerges)
  }

  private def bpeLoopDistributed(init: DataFrame, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var words = init
    // the checkpointed RDD backing the PREVIOUS generation: its blocks can
    // drop only after a job has materialized the current generation
    var prevRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var dry = false // pair supply exhausted: stop launching count jobs
    for (m <- 1 to nMerges if !dry) {
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val best = words.select(col("wn"),
          explode(zip_with(slice(col("syms"), lit(1), n1),
            slice(col("syms"), lit(2), n1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wn")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      // the argmax job materialized `words`' checkpoint — the generation
      // that produced it can release its blocks now
      prevRdd.foreach(_.unpersist(false))
      prevRdd = None
      if (best.isEmpty) dry = true
      else {
        val (l, r, cnt) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += ((m, l, r, cnt))
        // greedy leftmost fold: the merged symbol (l||r) differs from l,
        // so a fresh merge never chains into the next element — exactly
        // the non-overlapping reference semantics
        val folded = aggregate(
          slice(col("syms"), lit(2), n1),
          slice(col("syms"), lit(1), lit(1)),
          (acc, x) => when(
              element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x))))
        prevRdd = backingRdd(words)
        words = words.select(col("w"), col("wn"), folded.as("syms"))
          .localCheckpoint(false)
      }
    }
    // the final generation may still be lazy; callers that READ it
    // (bpeSegment) need it materialized before its parent's blocks drop
    if (prevRdd.isDefined) { words.count(); prevRdd.foreach(_.unpersist(false)) }
    (merges.toList, words)
  }

  /** The learned merge table: `(merge_rank, lhs, rhs, pair_count)` for
    * the first `nMerges` greedy merges — the artifact a BPE trainer
    * ships (apply ranks in order to tokenize new text).
    */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
                     nMerges: Int = 3): DataFrame = {
    val (merges, words) = bpeLoop(docs, textCol, nMerges)
    // the merge table is driver metadata; the final vocabulary generation
    // is not needed — release its checkpoint blocks now
    words.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** The vocabulary segmented under the learned merges: one row per
    * distinct word with its occurrence count, the piece sequence
    * (space-joined — flat strings compare exactly across engines), and
    * the piece count. This is the trained tokenizer APPLIED to the
    * training vocabulary; new text tokenizes by replaying the same
    * merges in rank order.
    */
  def bpeSegment(docs: DataFrame, textCol: String,
                 nMerges: Int = 3): DataFrame = {
    val (_, words) = bpeLoop(docs, textCol, nMerges)
    // `words` is checkpoint-backed (not cache-backed) since the r10
    // lineage-truncation rework: retain is a no-op for it, and its blocks
    // are released by the ContextCleaner once the returned frame is
    // unreferenced (vocabulary-grain blocks — a few MB per run)
    graft.util.Caches.retain(words)
    words.select(col("w").as("word"), col("wn").as("n_occurrences"),
      array_join(col("syms"), " ").as("pieces"),
      size(col("syms")).as("n_pieces"))
  }

  /** The trained tokenizer's ENCODE path: apply a learned merge table
    * ([[bpeTrainMerges]]' `(lhs, rhs)` pairs IN RANK ORDER) to arbitrary
    * NEW text — the call a shipped BPE tokenizer serves. Runs at
    * distinct-word grain like training (one corpus explode collapses to
    * the vocabulary; the fact table never carries symbol arrays), then
    * applies the merges per word executor-side with the merge table
    * BROADCAST (a 32k–100k-row artifact — kilobytes; the per-word loop
    * is genuine imperative per-row logic, the sanctioned mapPartitions
    * case). Each merge applies with EXACTLY the training fold's
    * leftmost-non-overlapping accumulator semantics, so encoding the
    * training corpus reproduces [[bpeSegment]] verbatim and the DuckDB
    * oracle replays the application fold by fold.
    * Output matches bpeSegment's shape:
    * `(word, n_occurrences, pieces, n_pieces)`.
    */
  def bpeEncode(docs: DataFrame, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (w, wn) =>
          var syms: Array[String] = w.map(_.toString).toArray
          var i = 0
          while (i < ms.length) {
            val (l, r) = ms(i)
            // the training fold verbatim: append, or fuse with the
            // accumulator's last element when it is `l` and this is `r`
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (out.nonEmpty && out.last == l && syms(j) == r)
                out(out.length - 1) = l + r
              else out += syms(j)
              j += 1
            }
            syms = out.toArray
            i += 1
          }
          (w, wn, syms.mkString(" "), syms.length)
        }
      }
      .toDF("word", "n_occurrences", "pieces", "n_pieces")
  }

  /** BYTE-LEVEL BPE training (VERDICT r11 #5) — the GPT-2-family variant
    * production tokenizers actually ship: the same greedy merge loop
    * ([[bpeLoop]], one job per merge, lineage-truncated), started from
    * UTF-8 BYTES instead of characters, so the base vocabulary is ≤256
    * symbols and NO input can ever be out-of-vocabulary. Symbols are
    * uppercase hex pairs; a merged symbol is the concatenation of its
    * parts' hex, so any piece decodes back to exact bytes
    * (`unhex` → UTF-8). Output shape matches [[bpeTrainMerges]].
    */
  def bpeTrainMergesBytes(docs: DataFrame, textCol: String,
                          nMerges: Int = 3): DataFrame = {
    val (merges, words) = bpeLoop(docs, textCol, nMerges, byteSyms)
    words.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF("merge_rank", "lhs", "rhs", "pair_count")
  }

  /** [[bpeSegment]] at byte grain: the vocabulary under the learned
    * byte-level merges, pieces space-joined hex. `word_rt` is the word
    * RECONSTRUCTED from its pieces (hex → bytes → UTF-8) — the lossless
    * round-trip column: equal to `word` for every row, by construction
    * of the byte alphabet (the property BpeBytesSpec pins on arbitrary
    * Unicode and the t_bpe_bytes_segment oracle hash-checks corpus-wide).
    */
  def bpeSegmentBytes(docs: DataFrame, textCol: String,
                      nMerges: Int = 3): DataFrame = {
    val (_, words) = bpeLoop(docs, textCol, nMerges, byteSyms)
    graft.util.Caches.retain(words)
    words.select(col("w").as("word"), col("wn").as("n_occurrences"),
      array_join(col("syms"), " ").as("pieces"),
      size(col("syms")).as("n_pieces"),
      decode(unhex(concat_ws("", col("syms"))), "UTF-8").as("word_rt"))
  }

  /** [[bpeEncode]] at byte grain — the shipped byte-level tokenizer
    * serving NEW text: initial symbols are the word's UTF-8 bytes as hex
    * pairs, then the broadcast merge table applies with the training
    * fold's leftmost-non-overlapping semantics. Because the base
    * alphabet covers every byte, arbitrary Unicode input encodes with
    * ZERO OOV and decodes losslessly (piece hex → bytes → string).
    */
  def bpeEncodeBytes(docs: DataFrame, textCol: String,
                     merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray)
    docs.select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val ms = bc.value
        it.map { case (w, wn) =>
          var syms: Array[String] =
            w.getBytes("UTF-8").map(b => f"${b & 0xFF}%02X")
          var i = 0
          while (i < ms.length) {
            val (l, r) = ms(i)
            val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (out.nonEmpty && out.last == l && syms(j) == r)
                out(out.length - 1) = l + r
              else out += syms(j)
              j += 1
            }
            syms = out.toArray
            i += 1
          }
          (w, wn, syms.mkString(" "), syms.length)
        }
      }
      .toDF("word", "n_occurrences", "pieces", "n_pieces")
  }

  /** Deterministic PROSE corpus — each document's tokens grouped into
    * 6-word sentences terminated by a (doc, position)-scheduled `.`/`!`/
    * `?` — the fixture [[sentenceSplit]] runs the driver oracle on
    * (the [[graft.operators.LineCuration.plantPages]] recipe at
    * sentence grain).
    */
  def plantProse(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val ts = col("__ts")
    val sents = transform(
      sequence(lit(0L), floor((size(ts) + 5) / 6).cast("long") - 1),
      i => concat(
        concat_ws(" ", slice(ts, (i * 6 + 1).cast("int"), lit(6))),
        element_at(array(lit("."), lit("!"), lit("?")),
          ((id + i) % 3 + 1).cast("int"))))
    docs.select(id, tokens(lower(col(textCol))).as("__ts"))
      .filter(size(ts) > 0)
      .select(id, array_join(sents, " ").as("prose"))
  }

  /** SENTENCE segmentation — the grain between lines and documents that
    * sentence-level dedup, citation alignment, and context chunking run
    * on: mark every run of sentence-ending punctuation followed by
    * whitespace, split at the marks, index the pieces. The deterministic
    * core of a sentence splitter (abbreviation and decimal guards are
    * corpus-tuned lexicon layers ON TOP of this rewrite); RE2-portable
    * patterns, so the oracle replays every piece verbatim. One
    * projection + one explode, shuffle-free.
    */
  def sentenceSplit(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val marked = regexp_replace(col(textCol), "([.!?]+)\\s+", "$1\u0001")
    docs.select(col(idCol),
        posexplode(split(marked, "\u0001")).as(Seq("sent_idx", "sentence")))
      .filter(length(col("sentence")) > 0)
      .select(col(idCol), col("sent_idx").cast("long").as("sent_idx"),
        col("sentence"),
        size(tokens(col("sentence"))).cast("long").as("n_tokens"))
  }

  /** SENTENCE-BUDGET context chunking — the RAG-ingestion packer one
    * grain above [[sentenceSplit]]: sentences pack greedily in document
    * order into chunks of at most `budget` tokens; a sentence that would
    * overflow starts the next chunk, and a single over-budget sentence
    * still gets its own chunk (never split mid-sentence — the whole
    * point over char-window chunking is that retrieval units stay
    * well-formed). Returns one row per chunk:
    * `(idCol, chunk_id, n_sentences, n_tokens, chunk_text)`.
    *
    * The greedy reset is a SEQUENTIAL fold, not a cumsum, so it runs as
    * one higher-order `aggregate` over each document's ordered
    * token-count array (per-document arrays — curated-document grain,
    * the t_chunks stance) with a struct accumulator; the oracle replays
    * the identical fold as a recursive CTE. One doc-partitioned window
    * (contiguous sequence numbers), one per-doc aggregation, one chunk
    * aggregation — no corpus-wide window anywhere.
    */
  def chunkBySentences(docs: DataFrame, idCol: String, textCol: String,
                       budget: Long): DataFrame = {
    require(budget >= 1, s"chunk budget must be positive, got $budget")
    import org.apache.spark.sql.expressions.Window
    val sents = sentenceSplit(docs, idCol, textCol)
      .withColumn("__seq", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("sent_idx"))))
    val perDoc = sents.groupBy(col(idCol)).agg(
      array_sort(collect_list(struct(col("__seq"), col("sentence"),
        col("n_tokens")))).as("__ss"))
    val cnts = transform(col("__ss"), s => s.getField("n_tokens"))
    // greedy fold: (chunk ids so far, tokens in the open chunk, chunk id)
    val ids = aggregate(
      cnts,
      struct(lit(Array.empty[Int]).as("ids"), lit(0L).as("cur"),
        lit(0).as("cid")),
      (acc, c) => {
        val over = acc.getField("cur") + c > budget &&
          acc.getField("cur") > lit(0L)
        struct(
          concat(acc.getField("ids"), array(
            when(over, acc.getField("cid") + 1)
              .otherwise(acc.getField("cid")))).as("ids"),
          when(over, c).otherwise(acc.getField("cur") + c).as("cur"),
          when(over, acc.getField("cid") + 1)
            .otherwise(acc.getField("cid")).as("cid"))
      },
      acc => acc.getField("ids"))
    perDoc
      .select(col(idCol), explode(zip_with(col("__ss"), ids,
        (s, cid) => struct(cid.as("chunk_id"), s.getField("__seq").as("seq"),
          s.getField("sentence").as("sentence"),
          s.getField("n_tokens").as("n_tokens")))).as("z"))
      .groupBy(col(idCol), col("z.chunk_id").as("chunk_id"))
      .agg(count(lit(1)).as("n_sentences"),
        sum(col("z.n_tokens")).as("n_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("z.seq"), col("z.sentence")))),
          p => p.getField("sentence")), " ").as("chunk_text"))
  }

  /** Tokenizer FERTILITY report — the per-source compression table a
    * tokenizer evaluation publishes (pieces per word, chars per piece):
    * how many whitespace words and BPE-regex pieces each source costs,
    * and the ratios that say which sources tokenize efficiently (prose ≈
    * 1.1–1.3 pieces/word; code, URLs, and numeric tables fragment far
    * harder and burn context budget). Both tokenizations here are the
    * deterministic codegen'd counters ([[tokens]], [[bpeTokenCount]]) —
    * no trained state, so the whole report replays exactly in SQL.
    *
    * Scale shape: one narrow scan (two regex counters + a length per
    * row) into a map-side-combinable O(sources) aggregation — no joins,
    * no windows; the 100 TB cost is the scan it shares with any other
    * full-corpus statistic. Ratios divide exact integer sums (grouped
    * AFTER the shuffle), so combine order cannot move a digit.
    */
  def fertilityReport(docs: DataFrame, srcCol: String,
                      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .select(col(srcCol),
        length(t).cast("long").as("__chars"),
        size(tokens(t)).cast("long").as("__words"),
        bpeTokenCount(t).as("__pieces"))
      .groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("chars"),
        sum(col("__words")).as("words"),
        sum(col("__pieces")).as("bpe_pieces"))
      .select(col(srcCol), col("n_docs"), col("chars"), col("words"),
        col("bpe_pieces"),
        round(col("bpe_pieces").cast("double") / col("words"), 6)
          .as("pieces_per_word"),
        round(col("chars").cast("double") / col("bpe_pieces"), 6)
          .as("chars_per_piece"))
  }

  /** THE curation annotation chain — [[stats]] columns, the composite
    * `quality_ok` flag, `lang_pred`, and `bpe_tokens` attached in one
    * stacked projection (pure codegen'd expressions, no shuffle). Batch
    * (`pipeline_corpus_prep`) and streaming (`CorpusStream.prepared`) run
    * THIS method, not private copies, so a threshold or column change
    * cannot silently break batch/stream parity.
    */
  def analyzed(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    stats(t).foldLeft(docs) { case (df, (name, c)) => df.withColumn(name, c) }
      .withColumn("quality_ok", qualityOk(col("n_tokens"),
        col("mean_token_len"), col("punct_ratio"), col("stopword_ratio")))
      .withColumn("lang_pred", langId(t))
      .withColumn("bpe_tokens", bpeTokenCount(t))
  }

  /** Per-document Shannon token entropy — the repetitiveness signal
    * lexical-diversity ratios miss (a document repeating ten words
    * equally often has high TTR at short lengths but low entropy):
    * `H = ln(n) − (Σ c·ln c)/n` over per-term counts `c`, plus the
    * ln(vocab)-normalized ratio in [0, 1] (null when vocab = 1 — a
    * one-term document has no distribution to normalize).
    *
    * The Σ c·ln c term is the [[foldLogProbs]] determinism contract: a
    * left fold over the TERM-SORTED count list (`aggregate` over
    * `sort_array(collect_list(...))` here, `list_reduce` over
    * `list(... ORDER BY term)` in the oracle), so the IEEE addition
    * order is pinned and the compare stays bit-exact. Two hash
    * exchanges ((doc, term) counts, then doc) — the t_lm grain.
    */
  /** Zipf fit over the corpus head — the corpus-health statistic
    * (natural text sits near slope −1; a slope collapsing toward 0 means
    * boilerplate/template flooding, a cliff below −1.5 means a
    * degenerate vocabulary): least-squares `ln(freq) = a + b·ln(rank)`
    * over the `topK` most frequent terms.
    *
    * The term count is one hash aggregation; the top-k slice is a
    * TakeOrdered (never a global sort), and the regression runs over
    * that K-row slice only — the ranking window and the four Σ folds are
    * K-bounded metadata, not corpus-sized data. Every Σ folds over the
    * rank-sorted value list ([[foldLogProbs]] contract) and the
    * slope/intercept expression trees match the oracle's token for
    * token, so the doubles hash-compare bit-exact.
    */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int = 64): DataFrame = {
    require(topK >= 2, s"zipfFit needs topK >= 2, got $topK")
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(explode(tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topK)
    val ranked = tf
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("term")))
          .cast("long"))
      .withColumn("x", log(col("rank").cast("double")))
      .withColumn("y", log(col("cnt").cast("double")))
      .withColumn("xy", col("x") * col("y"))
      .withColumn("xx", col("x") * col("x"))
    def fold(c: String) = aggregate(
      sort_array(collect_list(struct(col("rank"), col(c).as("v")))),
      lit(0.0), (acc, e) => acc + e("v"))
    val sums = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      fold("x").as("sx"), fold("y").as("sy"),
      fold("xy").as("sxy"), fold("xx").as("sxx"))
    sums
      .withColumn("b", (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx")))
      .select(col("n").cast("long").as("n_terms"),
        round(col("b"), 6).as("slope"),
        round((col("sy") - col("b") * col("sx")) / col("n"), 6).as("intercept"))
  }

  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("__term"))
      .groupBy(col(idCol), col("__term")).agg(count(lit(1)).as("__cnt"))
    counts.groupBy(col(idCol)).agg(
        sum(col("__cnt")).as("n_toks"),
        count(lit(1)).as("n_vocab"),
        aggregate(
          sort_array(collect_list(struct(col("__term"), col("__cnt")))),
          lit(0.0),
          (acc, x) => acc + x("__cnt").cast("double") *
            log(x("__cnt").cast("double"))).as("__s"))
      .select(col(idCol), col("n_toks"), col("n_vocab"),
        round(log(col("n_toks").cast("double")) -
          col("__s") / col("n_toks").cast("double"), 6).as("entropy"),
        when(col("n_vocab") > 1,
          round((log(col("n_toks").cast("double")) -
            col("__s") / col("n_toks").cast("double")) /
            log(col("n_vocab").cast("double")), 6)).as("entropy_ratio"))
  }
}

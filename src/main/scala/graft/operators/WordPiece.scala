package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** WordPiece — the THIRD tokenizer family beside BPE and unigram-LM
  * (Schuster & Nakajima 2012; the BERT tokenizer): segmentation is
  * greedy LONGEST-MATCH-FIRST against a fixed vocabulary, continuation
  * pieces carry a `##` prefix, and a word containing any unmatchable
  * position collapses to the single `[UNK]` token.
  *
  * The vocabulary here is the deterministic corpus build (top-K
  * multi-char substrings by occurrence weight + every single character,
  * each in start AND continuation form — the [[Unigram.seedVocab]]
  * counting pass, which the driver oracle already replays verbatim), so
  * both the build and the greedy walk are integer/string-exact and the
  * DuckDB twin can follow the same chain position by position.
  *
  * Scale shape: the vocabulary is artifact-sized (top-K + alphabet) and
  * BROADCAST; segmentation runs at DISTINCT-WORD grain (one corpus
  * explode collapses to the vocabulary — the bpeEncode stance) with the
  * greedy loop executor-side per word — genuine imperative per-row
  * logic, the sanctioned mapPartitions tier. No shuffle beyond the one
  * word-count aggregation.
  */
object WordPiece {

  /** The deterministic vocabulary: top-K multi-char substrings (length
    * 2..maxPieceLen) by corpus weight, ordered (weight DESC, piece) like
    * the unigram seed, plus every single character — each emitted in
    * start form (`piece`) and continuation form (`##piece`) with the
    * same weight.
    */
  def vocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
            topK: Int = 128): DataFrame = {
    // the counting pass IS Unigram.seedVocab (one definition, one oracle
    // contract); WordPiece only adds the ##-continuation doubling
    val base = Unigram.seedVocab(docs, textCol, maxPieceLen, topK)
    base.unionByName(base.select(
      concat(lit("##"), col("piece")).as("piece"), col("weight")))
  }

  /** Greedy longest-match-first segmentation of one word against the
    * start/continuation piece sets; None ⇒ the word is `[UNK]`.
    */
  private[operators] def segmentWord(w: String, starts: Set[String],
                                     conts: Set[String],
                                     maxPieceLen: Int): Option[Seq[String]] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val set = if (pos == 0) starts else conts
      var len = math.min(maxPieceLen, w.length - pos)
      var hit = -1
      while (hit < 0 && len >= 1) {
        if (set.contains(w.substring(pos, pos + len))) hit = len
        else len -= 1
      }
      if (hit < 0) return None
      out += (if (pos == 0) "" else "##") + w.substring(pos, pos + hit)
      pos += hit
    }
    Some(out.result())
  }

  /** The corpus vocabulary segmented under a broadcast WordPiece
    * vocabulary given as a `##`-MARKED string list (the BERT vocab-file
    * convention): entries starting with `##` are continuations, the rest
    * starts. The marker is a CONVENTION, not content — a start piece
    * whose text natively begins with `##` is not expressible in this
    * encoding (it would be misfiled as a continuation; ADVICE r12), so
    * the only detectable collision (`####…`, a doubled native-`##`
    * piece) is rejected loudly. Corpus-built vocabularies should use
    * [[segmentTyped]] + [[vocabSets]], which never round-trip through
    * the marker.
    */
  def segment(docs: DataFrame, textCol: String, vocabulary: Seq[String],
              maxPieceLen: Int = 6): DataFrame = {
    require(!vocabulary.exists(_.startsWith("####")),
      "ambiguous '####…' vocabulary entry: a piece natively starting " +
        "with '##' cannot be string-encoded — use segmentTyped")
    segmentTyped(docs, textCol,
      vocabulary.filterNot(_.startsWith("##")).toSet,
      vocabulary.filter(_.startsWith("##")).map(_.drop(2)).toSet,
      maxPieceLen)
  }

  /** [[segment]] with the start/continuation sets carried EXPLICITLY
    * (raw piece text, no `##` marker anywhere) — the unambiguous form:
    * `(word, n_occurrences, pieces, n_pieces, has_unk)`, pieces
    * space-joined (`[UNK]` alone when any position fails to match),
    * continuation pieces `##`-prefixed in the OUTPUT display only,
    * longest match taken at every step.
    */
  def segmentTyped(docs: DataFrame, textCol: String, starts: Set[String],
                   conts: Set[String], maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast((starts, conts))
    docs.select(explode(Text.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val (st, ct) = bc.value
        it.map { case (w, wn) =>
          segmentWord(w, st, ct, maxPieceLen) match {
            case Some(ps) => (w, wn, ps.mkString(" "), ps.length, false)
            case None => (w, wn, "[UNK]", 1, true)
          }
        }
      }
      .toDF("word", "n_occurrences", "pieces", "n_pieces", "has_unk")
  }

  /** LIKELIHOOD-scored WordPiece training (VERDICT r12 #4 — the published
    * algorithm, not the frequency seed): the BPE-style greedy merge loop
    * where each step merges the adjacent symbol pair maximizing the
    * likelihood gain score
    *
    *   score(l, r) = freq(l·r) / (freq(l) · freq(r))
    *
    * (Schuster & Nakajima 2012; the argmax of the unigram-LM likelihood
    * increase when the pair becomes one unit). Words initialize as
    * [c0, ##c1, ##c2, …] — the `##` marker makes start and continuation
    * ROLES distinct vocabulary symbols, so the frequency tables separate
    * them exactly as BERT's vocab does; merging (l, r) yields
    * l + r-without-## (a continuation pair keeps its leading ##).
    *
    * Output is the merge table `(merge_rank, lhs, rhs, pair_count,
    * freq_l, freq_r)` — integer evidence for every decision, so the
    * DuckDB oracle replays each argmax (the t_bpe_train unrolled-decision
    * pattern) including the score division, which both engines compute
    * on identical IEEE doubles.
    *
    * Scale shape: per merge, one symbol-frequency aggregate + one pair
    * aggregate over the vocabulary (distinct-word grain), a broadcast
    * join of the two vocab-bounded counts, and a 1-row argmax collect;
    * generations fold under localCheckpoint (the Text.bpeLoop lineage-
    * truncation discipline — chained Projects would explode in
    * CollapseProject).
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int = 3): DataFrame = {
    require(nMerges >= 1, s"train needs at least one merge, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    val init = transform(sequence(lit(1), length(col("w"))),
      i => when(i === lit(1), col("w").substr(i, lit(1)))
        .otherwise(concat(lit("##"), col("w").substr(i, lit(1)))))
    var words = docs.select(explode(Text.tokens(lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wn"))
      .select(col("w"), col("wn"), init.as("syms"))
      .localCheckpoint(false)
    var prevRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val merges = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long, Long, Long)]
    var dry = false
    for (m <- 1 to nMerges if !dry) {
      val n1 = greatest(size(col("syms")) - 1, lit(0))
      val freq = words.select(col("wn"), explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("wn")).as("f"))
      val pairs = words.select(col("wn"),
          explode(zip_with(slice(col("syms"), lit(1), n1),
            slice(col("syms"), lit(2), n1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wn")).as("cnt"))
      val best = pairs
        .join(broadcast(freq.select(col("sym").as("l"), col("f").as("fl"))), Seq("l"))
        .join(broadcast(freq.select(col("sym").as("r"), col("f").as("fr"))), Seq("r"))
        .orderBy((col("cnt").cast("double") / (col("fl") * col("fr"))).desc,
          col("l"), col("r"))
        .limit(1).collect()
      prevRdd.foreach(_.unpersist(false))
      prevRdd = None
      if (best.isEmpty) dry = true
      else {
        val row = best.head
        val (l, r) = (row.getAs[String]("l"), row.getAs[String]("r"))
        require(r.startsWith("##") && r.length > 2,
          s"continuation symbol '$r' is not ##-marked — corpus tokens " +
            "containing '#' are outside this trainer's string encoding")
        merges += ((m, l, r, row.getAs[Long]("cnt"),
          row.getAs[Long]("fl"), row.getAs[Long]("fr")))
        val merged = l + r.drop(2)
        val folded = aggregate(
          slice(col("syms"), lit(2), n1),
          slice(col("syms"), lit(1), lit(1)),
          (acc, x) => when(
              element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
            .otherwise(concat(acc, array(x))))
        prevRdd = backingRdd(words)
        words = words.select(col("w"), col("wn"), folded.as("syms"))
          .localCheckpoint(false)
      }
    }
    if (prevRdd.isDefined) { words.count(); prevRdd.foreach(_.unpersist(false)) }
    backingRdd(words).foreach(_.unpersist(false))
    merges.toList.toDF("merge_rank", "lhs", "rhs", "pair_count", "freq_l", "freq_r")
  }

  /** [[vocab]] collected to a driver-side piece list (vocabulary-bounded
    * metadata — topK + alphabet rows, the kmeans-centroid class).
    */
  def vocabList(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
                topK: Int = 128): Seq[String] =
    vocab(docs, textCol, maxPieceLen, topK)
      .select("piece").collect().map(_.getString(0)).toSeq

  /** The corpus-built start/continuation sets for [[segmentTyped]],
    * taken STRAIGHT from the base counting pass (every base piece in
    * both roles, the [[vocab]] doubling) — no `##` string round-trip,
    * so a corpus token natively containing `##` stays unambiguous.
    */
  def vocabSets(docs: DataFrame, textCol: String, maxPieceLen: Int = 6,
                topK: Int = 128): (Set[String], Set[String]) = {
    val base = Unigram.seedVocab(docs, textCol, maxPieceLen, topK)
      .select("piece").collect().map(_.getString(0)).toSet
    (base, base)
  }
}

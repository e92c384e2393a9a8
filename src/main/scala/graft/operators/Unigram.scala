package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Unigram-LM (SentencePiece-style) tokenizer training — the other half of
  * the tokenizer family beside greedy BPE (Text.bpeLoop): Kudo 2018
  * ("Subword Regularization", public), trained by EM over the segmentation
  * lattice and decoded by Viterbi.
  *
  * Distribution shape (the 100 TB story):
  *  - everything trains at DISTINCT-WORD grain — the fact table never
  *    carries lattices; a 100 TB corpus has a vocabulary-bounded distinct
  *    word set (the BPE precedent);
  *  - the piece table is driver-held and BROADCAST per EM iteration
  *    (bounded by `seedSize`, the Classify-weights precedent: ≤ a few
  *    thousand rows of metadata, never data);
  *  - each EM iteration is ONE job: per-word forward–backward runs
  *    executor-side in `mapPartitions` (per-word DP is imperative lattice
  *    math — the preference ladder's tier (d), used because no built-in
  *    expresses forward–backward), expected counts aggregate by piece
  *    (map-side combine), one vocabulary-bounded collect;
  *  - the log-likelihood rides the same collect under a reserved key
  *    (the Classify BiasFeat trick), so convergence reporting costs no
  *    extra action.
  *
  * Determinism: per-word DP sums floats in a fixed left-to-right order;
  * cross-word aggregation order is NOT fixed, so trained probabilities are
  * reproducible only to float-association noise — which is why the
  * training output is registered rows-only with a derived-invariant twin
  * (t_unigram_train_valid), while [[seedVocab]] (integer counting) and
  * [[segmentWords]] under a FIXED table (exhaustive-path replay) carry
  * exact DuckDB oracles.
  */
object Unigram {

  /** Reserved key the per-word log-likelihood contribution rides under in
    * the expected-count aggregation (never a real piece: pieces are
    * non-empty substrings).
    */
  private val LlKey = ""

  /** Distinct lowercase words with corpus counts. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(Text.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Seed-candidate vocabulary: every substring of length 2..maxPieceLen
    * of every distinct word, weighted by the word's corpus count
    * (multiplicity within a word counts — the substring HOF emits every
    * position), the top `seedSize` by (weight desc, piece asc), UNIONED
    * with every single character (each tokenizer char must stay
    * segmentable, so single chars bypass the top-k). Pure integer
    * counting — exactly SQL-replicable.
    */
  def seedVocab(docs: DataFrame, textCol: String,
                maxPieceLen: Int = 8, seedSize: Int = 512): DataFrame = {
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    val words = wordCounts(docs, textCol)
    // substrings at distinct-word grain: for each length L in 2..max, every
    // start position — the too-short case guards with when(), never with a
    // shrunken sequence() upper bound (sequence(1, 0) DESCENDS, the
    // Text.chunk trap)
    val emptyArr = array().cast("array<string>")
    val subs = flatten(transform(
      sequence(lit(2), lit(maxPieceLen)),
      L => when(length(col("word")) >= L,
        transform(sequence(lit(1), length(col("word")) - L + 1),
          i => substring(col("word"), i, L))).otherwise(emptyArr)))
    val multi = words
      .select(explode(subs).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("weight"))
      .orderBy(col("weight").desc, col("piece"))
      .limit(seedSize)
    val singles = words
      .select(explode(transform(
        sequence(lit(1), length(col("word"))),
        i => substring(col("word"), i, lit(1)))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("weight"))
    // a single char may also sit in the multi top-k only if maxPieceLen
    // made it so (it cannot — L ≥ 2), so the union is disjoint by length
    multi.unionByName(singles)
  }

  /** Per-word expected piece counts (forward–backward over the
    * segmentation lattice) + the word's log-likelihood contribution under
    * [[LlKey]]. Log-space throughout; words with an uncoverable character
    * contribute nothing (cannot happen while all single chars stay in the
    * table).
    */
  private def expectedCounts(word: String, cnt: Long,
                             logp: collection.Map[String, Double],
                             maxPieceLen: Int): Iterator[(String, Double)] = {
    val n = word.length
    val NegInf = Double.NegativeInfinity
    def lse(a: Double, b: Double): Double =
      if (a == NegInf) b else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val alpha = Array.fill(n + 1)(NegInf); alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val lp = logp.getOrElse(word.substring(i, j), NegInf)
        if (lp != NegInf && alpha(i) != NegInf)
          alpha(j) = lse(alpha(j), alpha(i) + lp)
        i += 1
      }
      j += 1
    }
    if (alpha(n) == NegInf) return Iterator.empty
    val beta = Array.fill(n + 1)(NegInf); beta(n) = 0.0
    var i = n - 1
    while (i >= 0) {
      var jj = math.min(n, i + maxPieceLen)
      while (jj > i) {
        val lp = logp.getOrElse(word.substring(i, jj), NegInf)
        if (lp != NegInf && beta(jj) != NegInf)
          beta(i) = lse(beta(i), beta(jj) + lp)
        jj -= 1
      }
      i -= 1
    }
    val out = collection.mutable.HashMap.empty[String, Double]
    i = 0
    while (i < n) {
      var jj = i + 1
      val hi = math.min(n, i + maxPieceLen)
      while (jj <= hi) {
        val piece = word.substring(i, jj)
        val lp = logp.getOrElse(piece, NegInf)
        if (lp != NegInf && alpha(i) != NegInf && beta(jj) != NegInf) {
          val gamma = math.exp(alpha(i) + lp + beta(jj) - alpha(n))
          out(piece) = out.getOrElse(piece, 0.0) + gamma * cnt
        }
        jj += 1
      }
      i += 1
    }
    Iterator.single(LlKey -> alpha(n) * cnt) ++ out.iterator
  }

  /** The trained model: piece → log probability, plus the per-iteration
    * corpus log-likelihood trace (EM guarantees it non-decreasing up to
    * float-association noise — the derived-invariant twin checks it with
    * a 1e-6 relative slack).
    */
  final case class UnigramModel(logp: Map[String, Double],
                                llTrace: Seq[Double], maxPieceLen: Int)

  /** EM training: seed → `emIters` full EM passes → prune to `vocabSize`
    * by probability (single chars immune — coverage) → renormalize → one
    * final EM pass so the returned probabilities are a fixed point of the
    * returned vocabulary.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 128,
            maxPieceLen: Int = 8, seedSize: Int = 512,
            emIters: Int = 3): UnigramModel = {
    require(emIters >= 1 && vocabSize >= 1 && seedSize >= vocabSize,
      s"need emIters>=1, seedSize >= vocabSize, got $emIters/$seedSize/$vocabSize")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs, textCol).as[(String, Long)].persist()
    try {
      val seed = seedVocab(docs, textCol, maxPieceLen, seedSize)
        .as[(String, Long)].collect()
      val total = seed.map(_._2.toDouble).sum
      var logp: Map[String, Double] =
        seed.map { case (p, w) => p -> math.log(w / total) }.toMap
      val singles = logp.keySet.filter(_.length == 1)
      val ll = collection.mutable.ArrayBuffer.empty[Double]

      def emPass(cur: Map[String, Double]): (Map[String, Double], Double) = {
        val bc = spark.sparkContext.broadcast(cur)
        val agg = words.mapPartitions { it =>
          val table = bc.value
          it.flatMap { case (w, c) => expectedCounts(w, c, table, maxPieceLen) }
        }.toDF("piece", "g")
          .groupBy("piece").agg(sum(col("g")).as("g"))
          .as[(String, Double)].collect()
        bc.destroy()
        val llNow = agg.collectFirst { case (LlKey, v) => v }.getOrElse(0.0)
        val counts = agg.filter(_._1 != LlKey).toMap
        // coverage floor: a single char EM starved must stay segmentable
        val floored = counts ++ singles.filterNot(counts.contains)
          .map(_ -> 1e-9).toMap
        val z = floored.values.sum
        (floored.map { case (p, g) => p -> math.log(g / z) }, llNow)
      }

      for (_ <- 1 to emIters) {
        val (next, llNow) = emPass(logp)
        ll += llNow
        logp = next
      }
      // prune: keep top (vocabSize − singles) multi-char pieces by prob
      // (piece asc tie-break), singles always survive
      val multiKeep = logp.toSeq.filter(_._1.length > 1)
        .sortBy { case (p, lp) => (-lp, p) }
        .take(math.max(0, vocabSize - singles.size)).map(_._1).toSet
      val keptRaw = logp.filter { case (p, _) =>
        p.length == 1 || multiKeep(p) }
      val zk = keptRaw.values.map(math.exp).sum
      logp = keptRaw.map { case (p, lp) => p -> (lp - math.log(zk)) }
      val (fin, llFin) = emPass(logp)
      ll += llFin
      UnigramModel(fin, ll.toSeq, maxPieceLen)
    } finally words.unpersist()
  }

  /** Viterbi segmentation of distinct words under a FIXED piece table:
    * best-scoring segmentation (sum of piece log-probs, fixed
    * left-to-right addition order so an exhaustive-path oracle reproduces
    * the doubles bit-for-bit); ties broken toward fewer pieces, then the
    * lexicographically smaller joined path (with prime-log planted tables
    * ties cannot occur — unique prime factorization — the tie-break is a
    * belt). Words with an uncoverable character are dropped (no lattice
    * path), mirroring the oracle's inner join.
    *
    * Output: (word, pieces "a|bc", n_pieces, score round 6).
    */
  def segmentWords(words: DataFrame, wordCol: String,
                   logp: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(logp)
    words.select(col(wordCol).cast("string")).as[String]
      .mapPartitions { it =>
        val table = bc.value
        it.flatMap { w =>
          val n = w.length
          // best(j) = (score, nPieces, path) reaching prefix length j
          val best = Array.fill[(Double, Int, String)](n + 1)(null)
          best(0) = (0.0, 0, "")
          var j = 1
          while (j <= n) {
            var i = math.max(0, j - maxPieceLen)
            while (i < j) {
              if (best(i) != null) {
                table.get(w.substring(i, j)).foreach { lp =>
                  val (s0, c0, p0) = best(i)
                  val cand = (s0 + lp, c0 + 1,
                    if (p0.isEmpty) w.substring(i, j)
                    else p0 + "|" + w.substring(i, j))
                  val cur = best(j)
                  if (cur == null || cand._1 > cur._1 ||
                    (cand._1 == cur._1 && (cand._2 < cur._2 ||
                      (cand._2 == cur._2 && cand._3 < cur._3))))
                    best(j) = cand
                }
              }
              i += 1
            }
            j += 1
          }
          Option(best(n)).map { case (s, c, p) => (w, p, c.toLong, s) }
        }
      }.toDF("word", "pieces", "n_pieces", "score")
      .withColumn("score", round(col("score"), 6))
  }
}

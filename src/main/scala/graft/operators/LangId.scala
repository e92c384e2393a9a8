package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRAINED language identification (VERDICT r13 #7): multinomial Naive
  * Bayes over hashed character n-grams — the fastText-style langid shape
  * (reference pipelines ship trained char-n-gram models; the heuristic
  * stopword scorer in [[graft.functions.Text.langId]] stays as the
  * zero-training fallback).
  *
  * The g_pagerank scaled-long stance makes the whole thing
  * engine-replayable where it matters: gram counts are exact integers,
  * the model's log-probabilities are computed ONCE on the driver from
  * those integer counts and frozen as scaled longs
  * (`floor(ln(p) · 2^20)`), and scoring is pure integer arithmetic —
  * `prior + Σ_g count_g · w_{g,L}` — so a prediction is bit-identical
  * across partitionings, run orders, and reruns. (The oracle surface is
  * the planted-truth prediction, the t_quality_train stance; the scaled
  * weights exist so the prediction cannot drift by FP summation order.)
  *
  * Scale contract (the Classify.scala shape): the feature frame is
  * (doc, feat, count) rows — O(total chars) like every shingle pass —
  * and the model is bounded by `dim × |langs|` rows, NEVER by the
  * corpus. Training is one aggregation + one dim-bounded collect;
  * scoring is one gram pass — broadcast delta join, one doc-grain hash
  * aggregation, a per-row argmax. Nothing data-proportional touches the
  * driver.
  */
object LangId {

  /** A trained model, all integer-scaled: per-language priors and
    * unseen-gram defaults (scaled ln), and the sparse per-(feat, lang)
    * weight DELTAS vs the default — so scoring needs only the grams a
    * language actually saw: score_L = prior_L + total·default_L +
    * Σ_seen count·delta. `langs` is sorted; its index is the
    * deterministic tie-break (lower index wins a score tie).
    */
  case class NbModel(langs: Seq[String], priors: Map[String, Long],
                     defaults: Map[String, Long],
                     deltas: Seq[(Long, String, Long)],
                     dim: Int, n: Int, scale: Long)

  /** Hashed char-n-gram counts: one row per (doc, feature) with the
    * exact integer count. Grams slide over the lowercased text; a text
    * shorter than `n` yields its whole self as the single gram (the
    * shingle convention).
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
               dim: Int, n: Int): DataFrame = {
    require(dim > 0 && n > 0, s"need positive dim/n: $dim/$n")
    gramRows(docs, idCol, textCol, dim, n)
      .groupBy(col(idCol), col("feat"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** One row per gram INSTANCE: `(idCol, feat)` — the shared front half
    * of training and scoring, which both aggregate straight from it
    * (their single shuffle) instead of through a per-(doc, feat) count.
    */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
                       dim: Int, n: Int): DataFrame = {
    // Two lessons live here (both measured on the sf0.1 corpus, 24 s →
    // ~2 s): (1) the Text.shinglesFromTokens contract — the char array
    // must be a BOUND attribute before the gram lambda reads it, or
    // CollapseProject inlines the split once per gram position; (2) no
    // positional substr on strings — UTF8String.substring walks bytes to
    // the start offset, so sliding substr(i, n) is O(len²) PER DOCUMENT.
    // Splitting to a char array once makes each gram an O(n) slice, the
    // token-shingle shape exactly. The key rides the gram pass as an
    // arbitrary column (r17): training keys by the LABEL directly, so
    // no gram-instance row ever has to join back to a label table.
    val grams = transform(
      sequence(lit(1), greatest(size(col("__cs")) - (n - 1), lit(1))),
      i => concat_ws("", slice(col("__cs"), i, lit(n))))
    docs
      .select(col(idCol), split(lower(col(textCol)), "").as("__cs"))
      .select(col(idCol), explode(grams).as("__g"))
      .select(col(idCol), pmod(xxhash64(col("__g")), lit(dim.toLong)).as("feat"))
  }

  /** Train multinomial NB with Laplace smoothing on documents labeled
    * with a language code in `labelCol`. One feature aggregation, one
    * dim×langs-bounded collect, all probability math on integer counts:
    * `P(g|L) = (c_{g,L} + 1) / (total_L + dim)`, `P(L) = docs_L / docs`.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 1 << 12, n: Int = 3,
            scale: Long = 1L << 20): LangId.NbModel = {
    require(scale > 0, s"scale must be positive, got $scale")
    val labels = docs.select(col(idCol), col(labelCol).as("__lang"))
    // per-(lang, feat) integer gram counts — bounded by dim × |langs|.
    // The label KEYS the gram pass directly (r17, guide §2.4): the gram
    // instances previously joined the label table on idCol — a full
    // shuffle of O(total chars) gram rows by id plus the join itself,
    // when the label is a column of the very frame the grams explode
    // from. Carrying it through leaves ONE map-side-combinable
    // aggregation whose shuffle is bounded by dim × |langs| × partitions,
    // never by corpus size. Counts are identical: each gram instance
    // pairs with exactly its own document's label either way.
    val counts = gramRows(docs, labelCol, textCol, dim, n)
      .groupBy(col(labelCol).as("__lang"), col("feat"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docCounts = labels.groupBy(col("__lang"))
      .agg(count(lit(1)).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = docCounts.keys.toSeq.sorted
    val totalDocs = docCounts.values.sum.toDouble
    val totals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    def w(x: Double): Long = math.floor(math.log(x) * scale).toLong
    val priors = langs.map(l => l -> w(docCounts(l) / totalDocs)).toMap
    val defaults = langs.map { l =>
      l -> w(1.0 / (totals.getOrElse(l, 0L) + dim).toDouble)
    }.toMap
    val deltas = counts.map { case (l, f, c) =>
      (f, l, w((c + 1).toDouble / (totals(l) + dim).toDouble) - defaults(l))
    }.toSeq
    NbModel(langs, priors, defaults, deltas, dim, n, scale)
  }

  /** Predict each document's language: `(idCol, lang_pred)`. Integer
    * scoring end to end in ONE gram pass: instances join the broadcast
    * per-feat delta table (ONE row per feature with a per-language
    * array — no per-language row blow-up), a single doc-grain hash
    * aggregation sums each language's delta column plus the gram total,
    * and the priors/defaults — driver-held model constants — fold in as
    * literals. The argmax is a per-row array_max over |langs| structs
    * (ties to the lower language index), so nothing shuffles at language
    * grain and nothing aggregates twice.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nL = model.langs.size
    val langIdx = model.langs.zipWithIndex.toMap
    val wide = model.deltas.groupBy(_._1).map { case (f, rows) =>
      val arr = new Array[Long](nL)
      rows.foreach { case (_, l, dw) => arr(langIdx(l)) = dw }
      (f, arr.toSeq)
    }.toSeq.toDF("feat", "__dw")
    val sumCols = (0 until nL).map(i => sum(col("cnt") *
      coalesce(element_at(col("__dw"), i + 1), lit(0L))).as(s"__s$i")) :+
      sum(col("cnt")).as("__tot")
    val sums = gramRows(docs, idCol, textCol, model.dim, model.n)
      .withColumn("cnt", lit(1L))
      .join(broadcast(wide), Seq("feat"), "left")
      .groupBy(col(idCol))
      .agg(sumCols.head, sumCols.tail: _*)
    val cands = array(model.langs.zipWithIndex.map { case (l, i) =>
      struct(
        (lit(model.priors(l)) + col("__tot") * lit(model.defaults(l)) +
          col(s"__s$i")).as("score"),
        lit(-i).as("negidx"), lit(l).as("lang"))
    }: _*)
    // array_max on structs orders by (score, negidx, lang): max score,
    // ties to the LOWER language index — the Text.langId convention
    sums.select(col(idCol), array_max(cands).getField("lang").as("lang_pred"))
  }
}

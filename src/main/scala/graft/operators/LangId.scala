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
  * scoring is one broadcast join + two doc-grain aggregations. Nothing
  * data-proportional touches the driver.
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
                     dim: Int, n: Int, scale: Long) {
    def langTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      langs.zipWithIndex.map { case (l, i) =>
        (l, i, priors(l), defaults(l))
      }.toDF("__lang", "__idx", "__prior", "__default")
    }
    def deltaTable(spark: SparkSession): DataFrame = {
      import spark.implicits._
      deltas.toDF("feat", "__lang", "__dw")
    }
  }

  /** Hashed char-n-gram counts: one row per (doc, feature) with the
    * exact integer count. Grams slide over the lowercased text; a text
    * shorter than `n` yields its whole self as the single gram (the
    * shingle convention).
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
               dim: Int, n: Int): DataFrame = {
    require(dim > 0 && n > 0, s"need positive dim/n: $dim/$n")
    val t = lower(col(textCol))
    val grams = transform(
      sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n)))
    docs
      .select(col(idCol), explode(grams).as("__g"))
      .select(col(idCol), pmod(xxhash64(col("__g")), lit(dim.toLong)).as("feat"))
      .groupBy(col(idCol), col("feat"))
      .agg(count(lit(1)).as("cnt"))
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
    // per-(lang, feat) integer gram counts — bounded by dim × |langs|
    val counts = features(docs, idCol, textCol, dim, n)
      .join(labels, idCol)
      .groupBy(col("__lang"), col("feat"))
      .agg(sum(col("cnt")).as("c"))
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
    * scoring end to end — one broadcast model join, two doc-grain
    * aggregations; ties break to the lower language index.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    val fs = features(docs, idCol, textCol, model.dim, model.n)
    val totals = fs.groupBy(col(idCol)).agg(sum(col("cnt")).as("__tot"))
    // |langs|-row broadcast against the doc-grain totals (the
    // scalar-stats crossJoin pattern, just |langs| rows instead of 1)
    val base = totals.crossJoin(broadcast(model.langTable(spark)))
      .select(col(idCol), col("__lang"), col("__idx"),
        (col("__prior") + col("__tot") * col("__default")).as("__base"))
    val sparse = fs.join(broadcast(model.deltaTable(spark)), Seq("feat"))
      .groupBy(col(idCol), col("__lang"))
      .agg(sum(col("cnt") * col("__dw")).as("__sp"))
    base.join(sparse, Seq(idCol, "__lang"), "left")
      .select(col(idCol), col("__lang"), col("__idx"),
        (col("__base") + coalesce(col("__sp"), lit(0L))).as("__score"))
      .groupBy(col(idCol))
      .agg(max_by(col("__lang"), struct(col("__score"), -col("__idx")))
        .as("lang_pred"))
  }
}

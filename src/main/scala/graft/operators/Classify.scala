package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Trainable text-quality classifier: logistic regression over hashed
  * bag-of-words features, trained by full-batch gradient descent expressed
  * entirely in DataFrame operations — the fastText-style linear quality
  * filter of LLM corpus curation (classify pages as high/low quality, keep
  * the high side), with no MLlib dependency and no UDFs.
  *
  * Scale contract: the feature frame is (doc, feat, x) rows — O(total
  * tokens) like every shingle pass in this repo — and the model is bounded
  * by the hash dimension (`dim` rows), NEVER by the corpus. Each descent
  * iteration is: one broadcast join (weights → features; the weight table
  * is ≤ dim rows, always the broadcast side), one doc-grain aggregation
  * (margins), one feat-grain aggregation (gradients, bounded by dim).
  * The driver holds only the weight vector (≤ dim entries) — the same
  * bounded-metadata collect as the k-means centroid loop in
  * [[Similarity.kmeansCells]]. Iteration count is a constant; nothing in
  * the loop grows with corpus size except the two keyed shuffles, which
  * is the irreducible cost of full-batch GD.
  *
  * Determinism note: float summation order inside the aggregations is not
  * fixed, so trained weights can differ in final ulps across layouts; the
  * intended oracle surface is the thresholded PREDICTION on separable (or
  * margin-comfortable) data, not the raw weights.
  */
object Classify {

  /** A trained model: hashed-feature weights (≤ dim entries) + bias.
    * Driver-side by design — the model is broadcast into scoring joins.
    */
  case class LogRegModel(weights: Map[Long, Double], bias: Double) {
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      weights.toSeq.toDF("feat", "w")
    }
  }

  /** Hashed term-frequency features: one row per (doc, feature) with
    * x = count(token) / len(doc). Tokens are lowercased; feat =
    * xxhash64(token) mod dim (non-negative). O(total tokens) rows into
    * one two-key aggregation.
    */
  def features(docs: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame = {
    require(dim > 0, s"feature dimension must be positive, got $dim")
    docs
      .select(col(idCol), Text.tokens(lower(col(textCol))).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__len"),
        explode(col("__toks")).as("__tok"))
      .select(col(idCol), col("__len"),
        pmod(xxhash64(col("__tok")), lit(dim.toLong)).as("feat"))
      .groupBy(col(idCol), col("feat"))
      .agg((count(lit(1)).cast("double") / first(col("__len"))).as("x"))
  }

  /** Train by full-batch gradient descent on documents labeled 0/1 in
    * `labelCol`. Empty documents contribute no features and train the
    * bias only. Returns the bounded-size model.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 1 << 16, iters: Int = 40,
            lr: Double = 0.5, l2: Double = 0.0): LogRegModel = {
    require(iters > 0, s"need at least one iteration, got $iters")
    val spark = docs.sparkSession
    val labels = docs.select(col(idCol),
      col(labelCol).cast("double").as("__y"))
    val feats = features(docs, idCol, textCol, dim).persist()
    try {
      val n = labels.count().toDouble
      var weights = Map.empty[Long, Double]
      var bias = 0.0
      for (_ <- 1 to iters) {
        val wDf = if (weights.isEmpty) null else {
          import spark.implicits._
          weights.toSeq.toDF("feat", "__w")
        }
        val joined =
          if (wDf == null) feats.withColumn("__w", lit(0.0))
          else feats.join(broadcast(wDf), Seq("feat"), "left")
            .withColumn("__w", coalesce(col("__w"), lit(0.0)))
        // margins + per-doc error: err = sigmoid(margin) − y. LEFT join
        // from labels so feature-less (empty) docs still contribute their
        // error to the bias gradient.
        val margins = joined
          .groupBy(col(idCol))
          .agg(sum(col("x") * col("__w")).as("__m"))
        val errs = labels.join(margins, Seq(idCol), "left")
          .select(col(idCol),
            (lit(1.0) / (lit(1.0) +
              exp(-(coalesce(col("__m"), lit(0.0)) + bias))) - col("__y"))
              .as("__err"))
        // feature gradients (bounded by dim) + bias gradient, one pass
        val grads = feats.join(errs, idCol)
          .groupBy(col("feat"))
          .agg(sum(col("x") * col("__err")).as("__g"))
          .collect()
          .map(r => r.getLong(0) -> r.getDouble(1))
        // docs with no features still push the bias through their error
        val biasGrad = errs.agg(sum(col("__err"))).head().getDouble(0) / n
        weights = grads.map { case (f, g) =>
          val w = weights.getOrElse(f, 0.0)
          f -> (w - lr * (g / n + l2 * w))
        }.toMap ++ (weights -- grads.map(_._1)) // untouched feats keep w
        bias -= lr * biasGrad
      }
      LogRegModel(weights, bias)
    } finally feats.unpersist()
  }

  /** Score documents with a trained model: (idCol, score, predicted) where
    * score is the sigmoid probability and predicted = margin > 0. The
    * model is the broadcast side; scoring is one broadcast join + one
    * doc-grain aggregation regardless of corpus size. Empty documents
    * score sigmoid(bias).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: LogRegModel, dim: Int = 1 << 16): DataFrame = {
    val spark = docs.sparkSession
    val wDf = model.toDF(spark).withColumnRenamed("w", "__w")
    val margins = features(docs, idCol, textCol, dim)
      .join(broadcast(wDf), Seq("feat"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("x") * coalesce(col("__w"), lit(0.0))).as("__m"))
    docs.select(col(idCol)).join(margins, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("__m"), lit(0.0)) + model.bias).as("__margin"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-col("__margin")))).as("score"),
        (col("__margin") > 0).as("predicted"))
  }
}

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
  * by the hash dimension (`dim` rows), NEVER by the corpus. The frame is
  * label-attached and hash-partitioned by doc id ONCE at persist time, so
  * each descent iteration is: one broadcast join (weights → features; the
  * weight table is ≤ dim rows, always the broadcast side), one
  * exchange-free doc-grain aggregation (margins), one exchange-free
  * co-partitioned hash join (errors back onto features), and one
  * feat-grain aggregation whose shuffle is bounded by dim — the corpus
  * crosses the network exactly once per training run, not once per
  * iteration.
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

  /** A trained model: hashed-feature weights (≤ dim entries) + bias +
    * the hash dimension it was trained under. `dim` rides the model
    * (ADVICE r08): scoring hashes tokens with the SAME modulus or the
    * features land in different buckets and predictions are silently
    * wrong — so [[score]] takes it from here, not as a free parameter.
    * Driver-side by design — the model is broadcast into scoring joins.
    */
  case class LogRegModel(weights: Map[Long, Double], bias: Double, dim: Int) {
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

  /** The bias rides the gradient loop as a constant feature under this
    * reserved (never hash-produced, pmod is non-negative) key — one
    * collect per iteration covers weights AND bias.
    */
  private val BiasFeat = -1L

  /** Train by full-batch gradient descent on documents labeled 0/1 in
    * `labelCol`. Every document (empty ones included) carries an implicit
    * constant bias feature, so each iteration is exactly ONE driver
    * action: broadcast-join the (≤ dim)-row weight table, aggregate
    * per-doc margins, aggregate per-feature gradients, collect the
    * dim-bounded gradient vector. Returns the bounded-size model.
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 1 << 16, iters: Int = 40,
            lr: Double = 0.5, l2: Double = 0.0): LogRegModel = {
    require(iters > 0, s"need at least one iteration, got $iters")
    val spark = docs.sparkSession
    val labels = docs.select(col(idCol),
      col(labelCol).cast("double").as("__y"))
    // The label attaches ONCE here and the frame co-partitions by doc id
    // BEFORE the persist (r17, guide §2.4): the loop below used to join
    // the label table and shuffle the token-grain feature frame by doc id
    // inside EVERY iteration (margin agg + gradient join were each a full
    // exchange) — with 15 iterations that was ~45 corpus-sized exchanges
    // per training run. With hashpartitioning(idCol) cached, the per-doc
    // margin aggregation and the feats⨝errs gradient join are both
    // exchange-free (errs is born partitioned by idCol from the margin
    // agg), so the only per-iteration shuffle left is the dim-bounded
    // gradient aggregation. Arithmetic is unchanged — same margins, same
    // errors, same gradient sums.
    val feats = features(docs, idCol, textCol, dim)
      .unionByName(labels.select(col(idCol), lit(BiasFeat).as("feat"),
        lit(1.0).as("x")))
      .join(labels, Seq(idCol))
      .repartition(col(idCol))
      .persist()
    try {
      val n = labels.count().toDouble
      var weights = Map.empty[Long, Double]
      for (_ <- 1 to iters) {
        val joined =
          if (weights.isEmpty) feats.withColumn("__w", lit(0.0))
          else {
            import spark.implicits._
            feats.join(broadcast(weights.toSeq.toDF("feat", "__w")),
              Seq("feat"), "left")
              .withColumn("__w", coalesce(col("__w"), lit(0.0)))
          }
        // per-doc error: err = sigmoid(margin) − y; the bias feature is in
        // the margin sum like any other weight (__y is constant per doc,
        // so first() is deterministic)
        val errs = joined
          .groupBy(col(idCol))
          .agg(sum(col("x") * col("__w")).as("__m"),
            first(col("__y")).as("__y"))
          .select(col(idCol),
            (lit(1.0) / (lit(1.0) + exp(-col("__m"))) - col("__y"))
              .as("__err"))
        // feature gradients (bounded by dim+1), ONE collect; the BiasFeat
        // row's gradient is Σerr because its x is the constant 1. The
        // shuffle_hash hint keeps the co-partitioned join sort-free
        // (sort-merge would re-sort the cached frame every iteration).
        val grads = feats.join(errs.hint("shuffle_hash"), Seq(idCol))
          .groupBy(col("feat"))
          .agg(sum(col("x") * col("__err")).as("__g"))
          .collect()
          .map(r => r.getLong(0) -> r.getDouble(1))
        weights = grads.map { case (f, g) =>
          val w = weights.getOrElse(f, 0.0)
          val reg = if (f == BiasFeat) 0.0 else l2 * w // no decay on bias
          f -> (w - lr * (g / n + reg))
        }.toMap ++ (weights -- grads.map(_._1)) // untouched feats keep w
      }
      LogRegModel(weights - BiasFeat, weights.getOrElse(BiasFeat, 0.0), dim)
    } finally feats.unpersist()
  }

  /** Score documents with a trained model: (idCol, score, predicted) where
    * score is the sigmoid probability and predicted = margin > 0. The
    * model is the broadcast side; scoring is one broadcast join + one
    * doc-grain aggregation regardless of corpus size. Empty documents
    * score sigmoid(bias). The hash dimension comes from the model itself —
    * a caller cannot re-bucket the features out from under the weights.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: LogRegModel): DataFrame = {
    val spark = docs.sparkSession
    val wDf = model.toDF(spark).withColumnRenamed("w", "__w")
    val margins = features(docs, idCol, textCol, model.dim)
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

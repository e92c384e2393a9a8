package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hashed-bag-of-words logistic regression: separable data converges to
  * perfect classification, loss decreases, scoring handles unseen tokens
  * and empty docs, and the scoring plan broadcasts the model side.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int): Seq[(Long, String, Int)] =
    (0L until n.toLong).map { i =>
      val filler = Seq.tabulate(6)(j => s"w${(i + j) % 17}").mkString(" ")
      val label = (i % 2).toInt
      val marker = if (label == 1) "goodtok goodtok" else "badtok badtok"
      (i, s"$filler $marker", label)
    }

  test("separable corpus trains to perfect classification") {
    val docs = corpus(80).toDF("doc_id", "text", "label")
    val m = Classify.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 40, lr = 0.8)
    val out = Classify.score(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert((0L until 80L).forall(i => out(i) == (i % 2 == 1)))
  }

  test("training loss decreases over iterations") {
    val docs = corpus(60).toDF("doc_id", "text", "label")
    def loss(iters: Int): Double = {
      val m = Classify.train(docs, "doc_id", "text", "label",
        dim = 1 << 12, iters = iters, lr = 0.5)
      val s = Classify.score(docs, "doc_id", "text", m)
        .join(docs.select(col("doc_id"), col("label").cast("double").as("y")),
          "doc_id")
        .select(
          when(col("y") === 1.0, -log(col("score")))
            .otherwise(-log(lit(1.0) - col("score"))).as("l"))
      s.agg(avg(col("l"))).head().getDouble(0)
    }
    val l1 = loss(2)
    val l2 = loss(20)
    assert(l2 < l1, s"loss did not decrease: $l1 -> $l2")
  }

  test("unseen tokens score neutrally; empty docs score sigmoid(bias)") {
    val docs = corpus(40).toDF("doc_id", "text", "label")
    val m = Classify.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 20, lr = 0.5)
    val fresh = Seq((100L, "zzz yyy xxx unseen tokens only"), (101L, ""))
      .toDF("doc_id", "text")
    val out = Classify.score(fresh, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sigBias = 1.0 / (1.0 + math.exp(-m.bias))
    assert(math.abs(out(101L) - sigBias) < 1e-12)
    assert(out(100L) > 0.0 && out(100L) < 1.0)
  }

  test("l2 regularization shrinks weights") {
    val docs = corpus(40).toDF("doc_id", "text", "label")
    val m0 = Classify.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 15, lr = 0.5, l2 = 0.0)
    val mR = Classify.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 15, lr = 0.5, l2 = 0.5)
    val n0 = math.sqrt(m0.weights.values.map(w => w * w).sum)
    val nR = math.sqrt(mR.weights.values.map(w => w * w).sum)
    assert(nR < n0, s"l2 did not shrink the weight norm: $n0 -> $nR")
  }

  test("model stays bounded by the hash dimension") {
    val docs = corpus(50).toDF("doc_id", "text", "label")
    val dim = 32
    val m = Classify.train(docs, "doc_id", "text", "label",
      dim = dim, iters = 5, lr = 0.5)
    assert(m.weights.keys.forall(f => f >= 0 && f < dim))
    assert(m.weights.size <= dim)
  }

  test("scoring plan broadcasts the model and has no cartesian product") {
    val docs = corpus(30).toDF("doc_id", "text", "label")
    val m = Classify.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 2, lr = 0.5)
    val plan = Classify.score(docs, "doc_id", "text", m)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("result is independent of partitioning layout") {
    val docs = corpus(60).toDF("doc_id", "text", "label")
    val m1 = Classify.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 10, lr = 0.5)
    val m2 = Classify.train(docs.repartition(7), "doc_id", "text", "label",
      dim = 1 << 12, iters = 10, lr = 0.5)
    val p1 = Classify.score(docs, "doc_id", "text", m1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val p2 = Classify.score(docs, "doc_id", "text", m2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(p1 == p2)
  }
}

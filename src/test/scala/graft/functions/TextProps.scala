package graft.functions

import org.apache.spark.sql.functions.{col, size}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec
import graft.operators.Dedup

/** Invariants of the text operators on generated documents. */
object TextProps extends Properties("Text") {

  private lazy val spark = SparkSpec.session

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "y9", "¿qué?")
  private val doc: Gen[String] = Gen.listOf(word).map(_.mkString(" "))

  property("shingle count = max(tokens - n + 1, 1)") = forAll(doc) { d =>
    import spark.implicits._
    val row = Seq(d).toDF("text")
      .select(size(Text.tokens(col("text"))).as("nt"),
        size(Text.shingles(col("text"), 3)).as("ns"))
      .collect()(0)
    row.getInt(1) == math.max(row.getInt(0) - 2, 1)
  }

  property("jaccard is symmetric and within [0, 1]") = forAll(doc, doc) { (a, b) =>
    import spark.implicits._
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    def j(pair: (Long, Long)) = {
      val pairs = Seq(pair).toDF("id_a", "id_b")
      Dedup.jaccardVerify(pairs, docs, "doc_id", "text").collect()(0).getDouble(2)
    }
    val fwd = j((1L, 2L)); val rev = j((2L, 1L))
    fwd == rev && fwd >= 0.0 && fwd <= 1.0
  }

  property("identical documents have jaccard 1") = forAll(doc) { d =>
    import spark.implicits._
    val docs = Seq((1L, d), (2L, d)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
      .collect()(0).getDouble(2) == 1.0
  }
}

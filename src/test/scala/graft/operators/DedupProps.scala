package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Model-checked invariants of the exact-dedup family: `exact` (digest
  * summary) and `keepCanonical` (surviving rows) against the obvious
  * in-memory model (group by text, keep min id).
  */
object DedupProps extends Properties("Dedup") {

  private lazy val spark = SparkSpec.session

  // small alphabet of short texts forces plenty of genuine duplicates
  private val docs: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("", "a", "b c", "a b c", "d e f g", "b c"))

  private def df(texts: List[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def model(texts: List[String]): Map[String, (Long, Long)] =
    texts.zipWithIndex.groupBy(_._1).map { case (t, hits) =>
      t -> (hits.map(_._2.toLong).min, hits.size.toLong) // (keep_id, dup_count)
    }

  property("keepCanonical = group by text, keep the min id") =
    forAll(docs) { texts =>
      val kept = Dedup.keepCanonical(df(texts), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = model(texts).map { case (t, (id, _)) => (id, t) }.toSet
      kept == want
    }

  property("exact's (keep_id, dup_count) matches the model; counts sum to input size") =
    forAll(docs) { texts =>
      val got = Dedup.exact(df(texts), "doc_id", "text")
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      val want = model(texts).values.toSet
      got == want && got.toSeq.map(_._2).sum == texts.size.toLong
    }

  property("keepCanonical is idempotent") =
    forAll(docs) { texts =>
      val once = Dedup.keepCanonical(df(texts), "doc_id", "text")
      val twice = Dedup.keepCanonical(once, "doc_id", "text")
      once.collect().toSet == twice.collect().toSet
    }
}

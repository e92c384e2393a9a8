package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Algebraic invariants of the set-algebra joins. */
object GroupingProps extends Properties("Grouping") {

  private lazy val spark = SparkSpec.session

  private val keys: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 15L))

  private def df(ks: List[Long]) = {
    import spark.implicits._
    ks.zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
  }
  private def keyDf(ks: List[Long]) = {
    import spark.implicits._
    ks.toDF("k")
  }
  private def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  property("semi ∪ anti partitions the left side exactly") =
    forAll(keys, keys) { (l, r) =>
      val left = df(l); val right = keyDf(r)
      val semi = rows(Grouping.semi(left, right, "k"))
      val anti = rows(Grouping.anti(left, right, "k"))
      semi.intersect(anti).isEmpty && (semi ++ anti) == rows(left)
    }

  property("semi keeps exactly the keys present on the right") =
    forAll(keys, keys) { (l, r) =>
      val got = rows(Grouping.semi(df(l), keyDf(r), "k")).map(_._1)
      val want = l.toSet.intersect(r.toSet)
      got == want || (got.isEmpty && want.isEmpty)
    }

  property("allValuesPresent with a complete dim keeps every key") =
    forAll(keys) { l =>
      val facts = df(l).toDF("k", "v")
      val dim = facts.select("v").distinct()
      val got = Grouping.allValuesPresent(facts, "k", "v", dim, "v")
        .collect().map(_.getLong(0)).toSet
      got == l.toSet
    }
}

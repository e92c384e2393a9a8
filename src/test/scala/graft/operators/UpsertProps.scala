package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck properties for the upsert operator (SURVEY.md §5.3):
  * applying the same batch twice equals applying it once, and the result
  * agrees with a driver-side last-writer-wins reference model.
  */
object UpsertProps extends Properties("Upsert") {

  private lazy val spark = SparkSpec.session

  private val kv: Gen[(Long, Int)] =
    for (k <- Gen.choose(0L, 12L); v <- Gen.choose(-100, 100)) yield (k, v)
  // key-unique row sets (the operator's documented precondition; dup keys
  // go through dedupLastWins first)
  private val rowSet: Gen[List[(Long, Int)]] =
    Gen.listOf(kv).map(_.groupBy(_._1).map(_._2.head).toList)

  private def df(rows: List[(Long, Int)]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }
  private def toMap(d: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    d.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  property("idempotent: upsert(upsert(t,b),b) == upsert(t,b)") =
    forAll(rowSet, rowSet) { (t, b) =>
      val once = Upsert.upsert(df(t), df(b), Seq("k"))
      val twice = Upsert.upsert(once, df(b), Seq("k"))
      toMap(once) == toMap(twice)
    }

  property("matches the map-merge reference model (updates win)") =
    forAll(rowSet, rowSet) { (t, b) =>
      toMap(Upsert.upsert(df(t), df(b), Seq("k"))) == (t.toMap ++ b.toMap)
    }

  property("evolve degenerates to upsert on identical schemas") =
    forAll(rowSet, rowSet) { (t, b) =>
      toMap(Upsert.upsertEvolve(df(t), df(b), Seq("k"))) == (t.toMap ++ b.toMap)
    }

  property("evolve: new column == b's value on b-keys, null exactly on t-only keys") =
    forAll(rowSet, rowSet) { (t, b) =>
      import spark.implicits._
      val u = b.map { case (k, v) => (k, v, v * 7L) }.toDF("k", "v", "extra")
      val out = Upsert.upsertEvolve(df(t), u, Seq("k")).collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), Option(r.get(2))))).toMap
      val bm = b.toMap
      val tm = t.toMap
      out.keySet == (tm ++ bm).keySet &&
        out.forall { case (k, (v, extra)) =>
          bm.get(k) match {
            case Some(bv) => v == bv && extra.contains(bv * 7L)
            case None => v == tm(k) && extra.isEmpty
          }
        }
    }

  property("evolve keeps a target-only column through an update (matched rows too)") =
    forAll(rowSet, rowSet) { (t, b) =>
      import spark.implicits._
      val tw = t.map { case (k, v) => (k, v, s"o$k") }.toDF("k", "v", "old")
      val out = Upsert.upsertEvolve(tw, df(b), Seq("k")).collect()
        .map(r => r.getLong(0) -> Option(r.get(2))).toMap
      val tm = t.toMap
      out.forall { case (k, old) =>
        if (tm.contains(k)) old.contains(s"o$k") else old.isEmpty
      }
    }
}

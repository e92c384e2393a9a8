package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck properties for the as-of join: the union-and-window
  * implementation must agree with the naive per-row reference model
  * (filter versions ≤ ts, take max by (ts, tiebreak)) on arbitrary data,
  * including exact-time collisions and duplicate version timestamps.
  */
object AsOfProps extends Properties("AsOf") {

  private lazy val spark = SparkSpec.session

  // tiny domains force collisions: few keys, few timestamps
  private val leftRow: Gen[(Long, Long, Long)] = for {
    id <- Gen.choose(0L, 1000000L)
    key <- Gen.choose(0L, 3L)
    ts <- Gen.choose(0L, 8L)
  } yield (id, key, ts)
  private val rightRow: Gen[(Long, Long, Long, Long)] = for {
    key <- Gen.choose(0L, 3L)
    ts <- Gen.choose(0L, 8L)
    tie <- Gen.choose(0L, 5L)
    payload <- Gen.choose(-100L, 100L)
  } yield (key, ts, tie, payload)

  private val leftRows = Gen.listOf(leftRow).map(_.distinctBy(_._1))
  // (key, ts, tie) must identify a version for the model to be well-defined
  private val rightRows = Gen.listOf(rightRow).map(_.distinctBy(t => (t._1, t._2, t._3)))

  property("union-window asof == per-row max-version reference model") =
    forAll(leftRows, rightRows) { (ls, rs) =>
      import spark.implicits._
      val left = ls.toDF("event_id", "k", "ts")
      val right = rs.toDF("k", "vts", "tie", "payload")
      val out = AsOf.asofJoin(left, "k", "ts", right, "k", "vts", "tie",
        Seq("tie", "payload"))
        .collect()
        .map(r => r.getLong(0) ->
          (Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long])))
        .toMap
      val model = ls.map { case (id, k, ts) =>
        val vs = rs.filter(v => v._1 == k && v._2 <= ts)
        val best = if (vs.isEmpty) None
          else Some(vs.maxBy(v => (v._2, v._3)))
        id -> (best.map(_._3), best.map(_._4))
      }.toMap
      out == model
    }
}

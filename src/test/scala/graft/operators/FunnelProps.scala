package graft.operators

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck properties for the ordered funnel: the chained filtered
  * aggregations must agree with a per-user fold over the time-sorted
  * event list (advance on the first event of the next step strictly
  * after the current reach time), on arbitrary event soups with dense
  * time collisions.
  */
object FunnelProps extends Properties("Funnel") {

  private lazy val spark = SparkSpec.session
  private val steps = Seq("A", "B", "C")

  private val eventGen: Gen[(Long, String, Long)] = for {
    u <- Gen.choose(0L, 4L)
    tp <- Gen.oneOf("A", "B", "C", "X") // X = noise type
    tMs <- Gen.choose(0L, 10L)
  } yield (u, tp, tMs)

  private def model(evs: List[(Long, String, Long)])
      : Map[Long, Seq[(Int, Long)]] =
    evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(_._3)
      val reached = Seq.newBuilder[(Int, Long)]
      var prev = Option.empty[Long]
      steps.zipWithIndex.foreach { case (st, i) =>
        val hit = sorted.collectFirst {
          case (_, tp, t) if tp == st && prev.forall(t > _) &&
            (i == 0 || prev.isDefined) => t
        }
        // step 0 needs no predecessor; later steps need the previous hit
        val ok = if (i == 0) hit else if (prev.isDefined) hit else None
        ok.foreach { t => reached += ((i + 1, t * 1000L)); prev = Some(t) }
        if (ok.isEmpty) prev = if (i == 0) None else None
      }
      u -> reached.result()
    }

  property("chained aggregations == per-user sorted fold") =
    forAll(Gen.listOf(eventGen)) { evs =>
      import spark.implicits._
      val df = evs.map { case (u, tp, t) => (u, tp, new Timestamp(t)) }
        .toDF("user_id", "event_type", "ts")
      val got = Funnel.funnelTimes(df, "user_id", "event_type", "ts", steps)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
        .groupBy(_._1).view
        .mapValues(_.map(x => (x._2, x._3)).sortBy(_._1).toSeq).toMap
      val want = model(evs).filter(_._2.nonEmpty)
      got == want
    }

  property("reach counts are monotone non-increasing over steps") =
    forAll(Gen.listOf(eventGen)) { evs =>
      val m = model(evs)
      val counts = (1 to steps.size).map(i => m.values.count(_.exists(_._1 == i)))
      counts.zip(counts.drop(1)).forall { case (a, b) => a >= b }
    }
}

package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

/** Model-checked Misra–Gries guarantees over random streams and random
  * stream splits (pure fold/merge — no Spark session, so hundreds of
  * cases are cheap): heavy-item membership and the error band must hold
  * for EVERY input order and EVERY partitioning, which is exactly what
  * the distributed partial-aggregation relies on.
  */
object FrequentItemsProps extends Properties("FrequentItems") {

  private val k = 8
  // small alphabet so heavy items actually occur
  private val streamGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf((0 until 12).map(i => s"i$i")))

  private def summarize(items: Seq[String]): Map[String, Long] =
    items.foldLeft(Map.empty[String, Long])(
      (acc, i) => FrequentItems.add(acc, i, 1L, k))

  private def guaranteesHold(items: Seq[String],
                             summary: Map[String, Long]): Prop = {
    val n = items.size
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sizeOk = summary.size <= k - 1
    val bandOk = summary.forall { case (t, est) =>
      val ex = exact.getOrElse(t, 0L)
      est <= ex && est >= ex - n / k - 1
    }
    val heavyOk = exact.forall { case (t, ex) =>
      ex <= n.toLong / k || summary.contains(t)
    }
    (sizeOk :| s"summary too big: $summary") &&
      (bandOk :| s"estimate outside band: $summary vs $exact") &&
      (heavyOk :| s"heavy item missing: $summary vs $exact (n=$n)")
  }

  property("fold: heavy membership + error band for every order") =
    forAll(streamGen) { items => guaranteesHold(items, summarize(items)) }

  property("merge: guarantees survive any split point") =
    forAll(streamGen, Gen.choose(0, 100)) { (items, cutPct) =>
      val cut = items.size * cutPct / 100
      val (l, r) = items.splitAt(cut)
      val merged = FrequentItems.mergeSummaries(summarize(l), summarize(r), k)
      guaranteesHold(items, merged)
    }

  property("merge: never exceeds k-1 counters and never overestimates") =
    forAll(streamGen, streamGen) { (a, b) =>
      val merged = FrequentItems.mergeSummaries(summarize(a), summarize(b), k)
      val exact = (a ++ b).groupBy(identity).view.mapValues(_.size.toLong).toMap
      (merged.size <= k - 1) &&
        merged.forall { case (t, est) => est <= exact.getOrElse(t, 0L) }
    }
}

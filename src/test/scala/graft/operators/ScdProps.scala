package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck properties for the SCD2 family: the window-based batch
  * build and the streaming maintenance operator must both agree with a
  * straightforward in-memory fold of the sorted change log, on
  * arbitrary logs — few keys and versions force dense histories, null
  * payloads included.
  */
object ScdProps extends Properties("Scd") {

  private lazy val spark = SparkSpec.session

  // (key, version, payload): version distinct per key (the contract);
  // payloads from a tiny alphabet with nulls so runs form and break
  private val logGen: Gen[List[(Long, Long, String)]] = Gen.listOf(for {
    k <- Gen.choose(0L, 3L)
    v <- Gen.choose(0L, 12L)
    p <- Gen.oneOf("A", "B", "C", null)
  } yield (k, v, p)).map(_.distinctBy(t => (t._1, t._2)))

  /** The definitional model: sort each key's log, collapse consecutive
    * equal payloads, span effective_to from the next run.
    */
  private def model(log: List[(Long, Long, String)])
      : Set[(Long, Long, Option[Long], Boolean, String)] =
    log.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      val runs = sorted.foldLeft(List.empty[(Long, String)]) {
        case (acc, (_, v, p)) =>
          if (acc.nonEmpty && acc.head._2 == p) acc else (v, p) :: acc
      }.reverse
      runs.zipAll(runs.drop(1).map(r => Option(r._1)), null, None).map {
        case ((from, p), to) => (k, from, to, to.isEmpty, p)
      }
    }.toSet

  property("buildType2 == the sorted-fold reference model") =
    forAll(logGen) { log =>
      import spark.implicits._
      val got = Scd.buildType2(log.toDF("k", "v", "p"), Seq("k"), "v")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getBoolean(3), r.getString(4))).toSet
      got == model(log)
    }

  property("Scd2Stream batch execution == the same model") =
    forAll(logGen) { log =>
      import spark.implicits._
      val events = log.map { case (k, v, p) =>
        graft.streaming.ScdEvent(k, v, if (p == null) "∅" else p) }.toDS()
      val got = graft.streaming.Scd2Stream.runs(events)
        .collect().map(r => (r.key, r.effective_from, r.effective_to,
          r.is_current, if (r.payload == "∅") null else r.payload)).toSet
      val want = model(log)
      got == want
    }

  property("every (key, version) is covered by exactly one interval") =
    forAll(logGen) { log =>
      val intervals = model(log)
      log.forall { case (k, v, _) =>
        intervals.count { case (ik, from, to, _, _) =>
          ik == k && from <= v && to.forall(v < _)
        } == 1
      }
    }
}

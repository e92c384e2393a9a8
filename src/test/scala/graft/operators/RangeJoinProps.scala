package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** ScalaCheck property: the bucketized interval join equals the naive
  * inequality join on arbitrary data — intervals of any span (including
  * zero-length and bucket-straddling), duplicate timestamps, keys with no
  * intervals — and never emits a pair twice.
  */
object RangeJoinProps extends Properties("RangeJoin") {

  private lazy val spark = SparkSpec.session
  private val Base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private val BucketMicros = 3600L * 1000000L // 1 hour

  private def ts(offsetMin: Long) = new Timestamp(Base + offsetMin * 60000L)

  // few keys / small time domain → dense collisions and boundary hits
  private val eventGen = for {
    id <- Gen.choose(0L, 1000000L)
    key <- Gen.choose(0L, 2L)
    m <- Gen.choose(0L, 300L)
  } yield (id, key, m)
  private val intervalGen = for {
    id <- Gen.choose(0L, 1000000L)
    key <- Gen.choose(0L, 2L)
    start <- Gen.choose(0L, 300L)
    span <- Gen.choose(0L, 150L) // 0 to 2.5 bucket widths
  } yield (id, key, start, start + span)

  private val eventsGen = Gen.listOf(eventGen).map(_.distinctBy(_._1))
  private val intervalsGen = Gen.listOf(intervalGen).map(_.distinctBy(_._1))

  property("bucketized == naive inequality join, each pair exactly once") =
    forAll(eventsGen, intervalsGen) { (es, ivs) =>
      import spark.implicits._
      val left = es.map { case (id, k, m) => (id, k, ts(m)) }
        .toDF("event_id", "k", "ts")
      val right = ivs.map { case (id, k, a, b) => (id, k, ts(a), ts(b)) }
        .toDF("iv_id", "w_k", "w_start", "w_end")
      val got = RangeJoin.intervalJoin(left, "k", "ts",
          right, "w_k", "w_start", "w_end", BucketMicros)
        .select("event_id", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = for {
        (eid, k, m) <- es
        (ivId, wk, a, b) <- ivs
        if wk == k && m >= a && m <= b
      } yield (eid, ivId)
      got.sorted == want.sorted && got.length == got.distinct.length
    }
}

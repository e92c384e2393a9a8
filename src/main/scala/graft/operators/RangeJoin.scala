package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (range) join — rows of `left` matched to every
  * `right` interval containing their timestamp, per key.
  *
  * The naive predicate `lKey = rKey AND ts BETWEEN start AND end` has no
  * equi-conjunct on time, so Spark plans the time part as a post-join
  * filter: fine when the key is selective, quadratic per key when it isn't
  * (every event of a hot key × every interval of that key). The bucketized
  * form restores a proper equi-join: each left row hashes to the ONE
  * coarse time bucket its timestamp falls in, each interval explodes into
  * the (few) buckets it overlaps, and the join runs on
  * (key, bucket) — so the shuffle co-locates only temporally-plausible
  * pairs and the exact BETWEEN filters inside the join. A (row, interval)
  * pair can only meet in the row's single bucket, so the output needs no
  * dedup. Interval explosion is bounded by span/bucketMicros — pick the
  * bucket near the typical interval length (explosion factor ~2).
  */
object RangeJoin {

  /** `left` (lKey, lTs timestamp, payload…) × `right` (rKey, rStart, rEnd
    * timestamps, payload…): inner join on key equality and
    * rStart ≤ lTs ≤ rEnd (inclusive, microsecond precision). Returns all
    * columns of both inputs. `bucketMicros` is the coarse bucket width.
    */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
                   right: DataFrame, rKey: String, rStart: String, rEnd: String,
                   bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    val lb = left.withColumn("__bucket",
      floor(unix_micros(col(lTs)) / bucketMicros))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(unix_micros(col(rStart)) / bucketMicros),
        floor(unix_micros(col(rEnd)) / bucketMicros))))
    lb.join(rb,
        lb(lKey) === rb(rKey) &&
          lb("__bucket") === rb("__bucket") &&
          lb(lTs) >= rb(rStart) && lb(lTs) <= rb(rEnd))
      .drop("__bucket")
  }
}

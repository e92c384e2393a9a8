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
    *
    * Malformed intervals are handled before the explode, where they would
    * otherwise do damage: an INVERTED interval (rEnd < rStart) can match
    * nothing, so it is dropped (the naive BETWEEN join produces the same
    * empty result, just after shuffling garbage); an interval spanning more
    * than `maxBucketsPerInterval` buckets fails the job loudly — one corrupt
    * year-9999 row would otherwise materialize tens of millions of bucket
    * ids (hundreds of MB from a single row) and OOM an executor with no
    * hint of which row did it.
    */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String,
                   right: DataFrame, rKey: String, rStart: String, rEnd: String,
                   bucketMicros: Long,
                   maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive, got $bucketMicros")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val lb = left.withColumn("__bucket",
      floor(unix_micros(col(lTs)) / bucketMicros))
    val b0 = floor(unix_micros(col(rStart)) / bucketMicros)
    val b1 = floor(unix_micros(col(rEnd)) / bucketMicros)
    // the guard rides INSIDE the sequence's stop argument (assert_true
    // yields null on success) so column pruning can never drop it while
    // keeping the explode
    val guardedStop = when(
      assert_true(b1 - b0 < lit(maxBucketsPerInterval),
        concat(lit("intervalJoin: interval spans "), b1 - b0 + lit(1),
          lit(s" buckets (> $maxBucketsPerInterval); raise bucketMicros/" +
            "maxBucketsPerInterval or clean the interval data"))).isNull,
      b1)
    val rb = right.filter(col(rEnd) >= col(rStart))
      .withColumn("__bucket", explode(sequence(b0, guardedStop)))
    lb.join(rb,
        lb(lKey) === rb(rKey) &&
          lb("__bucket") === rb("__bucket") &&
          lb(lTs) >= rb(rStart) && lb(lTs) <= rb(rEnd))
      .drop("__bucket")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Irregular time-series reads — metrics sampled whenever an event
  * happens, not on a clock. The mean of raw samples over-weights busy
  * periods; the TIME-WEIGHTED mean holds each sample until the next
  * one and weights it by that duration.
  *
  * Determinism (the oracle contract): timestamps become integer epoch
  * micros, values become DECIMAL(18,2) (the a10_outliers convention —
  * double→decimal casts agree across engines), so every value·duration
  * product and both sums are EXACT decimal/integer arithmetic; the one
  * IEEE operation is the final division, rounded to 6. The window
  * orders by (time, value) — a bare time order would leave tied
  * samples' durations nondeterministically paired.
  */
object Timeseries {

  /** Per-key time-weighted average of `valueCol` over the key's event
    * timeline: Σ(vᵢ·dtᵢ)/Σ(dtᵢ) with dtᵢ the micros until the next
    * sample (the last sample carries no weight — its duration is
    * unknown). Keys with a single sample (no spanned time) are
    * excluded. One key shuffle: the lead window and the aggregation
    * share the exchange; tied timestamps contribute zero duration, so
    * their order cannot affect the result.
    */
  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__v"))
    events.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__t"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .withColumn("__dt", lead(col("__t"), 1).over(w) - col("__t"))
      .filter(col("__dt").isNotNull)
      .groupBy(col("__k"))
      .agg(sum(col("__v") * col("__dt")).as("__num"),
        sum(col("__dt")).as("__den"))
      .filter(col("__den") > 0)
      .select(col("__k").as(keyCol),
        round(col("__num").cast("double") / col("__den"), 6).as("tw_avg"),
        col("__den").cast("long").as("span_micros"))
  }
}

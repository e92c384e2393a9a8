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

  /** Resample each key's irregular series onto a regular grid
    * (`stepMicros` apart, from the key's first to last sample) with
    * last-observation-carried-forward fill — the gap-filling read that
    * turns event streams into fixed-interval series. The j8_asof
    * stance: grid points and samples UNION into one frame, one key
    * shuffle, and a running `last(ignoreNulls)` window fills forward —
    * no per-grid-point join, no range-join expansion. Samples sort
    * before grid points at the same instant (a grid point ON a sample
    * takes it), and tied samples are pre-collapsed to their max value
    * so the fill is deterministic in any engine. Grid size per key is
    * span/step — the caller picks the step; the grid frame derives
    * from the O(keys) bounds aggregate, not the raw events.
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"resampleLocf needs a positive step, got $stepMicros")
    val e = events.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__t"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      // a null sample is not an observation: the ignoreNulls fill would
      // skip PAST it to an older value while an as-of read would stop
      // on it — exclude it from the timeline on both sides
      .filter(col("__v").isNotNull && col("__t").isNotNull)
      .groupBy(col("__k"), col("__t")).agg(max(col("__v")).as("__v"))
    val grid = e.groupBy(col("__k"))
      .agg(min(col("__t")).as("__t0"), max(col("__t")).as("__t1"))
      .select(col("__k"),
        explode(sequence(col("__t0"), col("__t1"), lit(stepMicros))).as("__t"))
    val union = e.select(col("__k"), col("__t"), lit(0).as("__g"), col("__v"))
      .unionByName(grid.select(col("__k"), col("__t"), lit(1).as("__g"),
        lit(null).cast("decimal(18,2)").as("__v")))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    union.withColumn("__fill", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__g") === 1)
      .select(col("__k").as(keyCol), col("__t").as("grid_micros"),
        // decimal held exactness through the fill; double out (the same
        // nearest-double bits in any engine) for plain downstream math
        col("__fill").cast("double").as(valueCol))
  }

  /** [[resampleLocf]]'s linear-interpolation sibling: each grid point
    * takes v₀ + (v₁ − v₀)·(t − t₀)/(t₁ − t₀) between its surrounding
    * samples (exactly v₀ when the grid point sits ON a sample). Same
    * union-one-shuffle shape — BOTH bracketing samples come from running
    * `last(ignoreNulls)` windows over the same key exchange, the
    * previous one ascending, the next one descending; no per-grid-point
    * join. The grid derives from each key's own [first, last] span, so
    * both brackets always exist. Times/values stay integer-micros /
    * DECIMAL until one fixed IEEE interpolation chain (identical input
    * bits in any engine), rounded to 6.
    *
    * The bracket time and value ride separate `when(g = 0, …)` columns
    * filled by the same window — they go non-null on exactly the same
    * rows, so the (t₀, v₀) pair can never mix two samples.
    */
  def resampleLinear(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, s"resampleLinear needs a positive step, got $stepMicros")
    val e = events.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__t"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .filter(col("__v").isNotNull && col("__t").isNotNull)
      .groupBy(col("__k"), col("__t")).agg(max(col("__v")).as("__v"))
    val grid = e.groupBy(col("__k"))
      .agg(min(col("__t")).as("__t0"), max(col("__t")).as("__t1"))
      .select(col("__k"),
        explode(sequence(col("__t0"), col("__t1"), lit(stepMicros))).as("__t"))
    val union = e.select(col("__k"), col("__t"), lit(0).as("__g"), col("__v"))
      .unionByName(grid.select(col("__k"), col("__t"), lit(1).as("__g"),
        lit(null).cast("decimal(18,2)").as("__v")))
    val fwd = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__g"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(col("__k"))
      .orderBy(col("__t").desc, col("__g").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sampleT = when(col("__g") === 0, col("__t"))
    val sampleV = when(col("__g") === 0, col("__v"))
    val bracketed = union
      .withColumn("__pt", last(sampleT, ignoreNulls = true).over(fwd))
      .withColumn("__pv", last(sampleV, ignoreNulls = true).over(fwd))
      .withColumn("__nt", last(sampleT, ignoreNulls = true).over(bwd))
      .withColumn("__nv", last(sampleV, ignoreNulls = true).over(bwd))
      .filter(col("__g") === 1)
    val v0 = col("__pv").cast("double")
    val v1 = col("__nv").cast("double")
    val frac = (col("__t") - col("__pt")).cast("double") /
      (col("__nt") - col("__pt")).cast("double")
    bracketed.select(col("__k").as(keyCol), col("__t").as("grid_micros"),
      round(when(col("__t") === col("__pt"), v0)
        .otherwise(v0 + (v1 - v0) * frac), 6).as(valueCol))
  }

  /** Per-key time-weighted average of `valueCol` over the key's event
    * timeline: Σ(vᵢ·dtᵢ)/Σ(dtᵢ) with dtᵢ the micros until the next
    * sample (the last sample carries no weight — its duration is
    * unknown). Keys with a single sample (no spanned time) are
    * excluded. One key shuffle: the lead window and the aggregation
    * share the exchange; tied timestamps contribute zero duration, so
    * their order cannot affect the result.
    */
  /** Exponentially weighted moving average per key — the classic
    * smoothing/trend signal (Hunter 1986; the pandas `ewm` recurrence):
    * s₁ = x₁, sₙ = α·xₙ + (1−α)·sₙ₋₁ over the time-ordered samples;
    * the final sₙ is the key's smoothed level. The recurrence is
    * inherently sequential per key, so it runs as ONE time-ordered LEFT
    * FOLD inside a single aggregation buffer (`aggregate` over
    * `sort_array(collect_list(...))` — the LanguageModel determinism
    * contract): per-key state is O(that key's series), the
    * repetitionStats bounded-buffer stance, and there is exactly one
    * key-hash exchange. Values pass through DECIMAL(18,2) (the suite's
    * value convention) and then one fixed IEEE chain
    * `α·x + (1−α)·s` per step — engine-replayable term by term; null
    * values/timestamps hold no slot (the [[timeWeightedAvg]] rule).
    * Output: `(keyCol, n_samples, ewma)` with ewma rounded to 6.
    */
  def ewma(events: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, alpha: Double = 0.3): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"ewma needs alpha in (0, 1], got $alpha")
    val beta = 1.0 - alpha
    val g = events.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__t"),
        col(valueCol).cast("decimal(18,2)").cast("double").as("__v"))
      .filter(col("__v").isNotNull && col("__t").isNotNull)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n_samples"),
        sort_array(collect_list(struct(col("__t"), col("__v")))).as("__s"))
    g.select(col("__k").as(keyCol), col("n_samples"),
      round(aggregate(
          slice(col("__s"), lit(2), greatest(size(col("__s")) - 1, lit(0))),
          element_at(col("__s"), 1),
          (acc, x) => struct(x.getField("__t").as("__t"),
            (lit(alpha) * x.getField("__v") +
              lit(beta) * acc.getField("__v")).as("__v")))
        .getField("__v"), 6).as("ewma"))
  }

  def timeWeightedAvg(events: DataFrame, keyCol: String, tsCol: String,
                      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__v"))
    events.select(col(keyCol).as("__k"),
        unix_micros(col(tsCol)).as("__t"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      // a null sample holds no value to weight — and engines disagree
      // on where NULL sorts in the tie-break order (Spark nulls-first,
      // SQL nulls-last), so it must not occupy a timeline slot either
      // (code-review r7)
      .filter(col("__v").isNotNull && col("__t").isNotNull)
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

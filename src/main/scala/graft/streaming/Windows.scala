package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing over the event stream (SURVEY.md §2.6: the
  * reference's only "window" is calendar-day grouping; these are the
  * streaming-native generalizations flagged as §7.5 extensions —
  * tumbling windows and session windows with an inactivity gap).
  *
  * Both operators work identically on batch and streaming DataFrames
  * (session_window/window are Catalyst expressions); in streaming they
  * compose with `withWatermark` on the caller's side for state cleanup —
  * the reference never expires state (glue_job.py:96-104), so the
  * watermark is opt-in here too.
  */
object Windows {

  /** Tumbling event-time windows: count + exact-decimal value sum per
    * (key, window). One hash aggregation; the window expression is a
    * projection, so partial aggregation still happens map-side.
    */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
               width: String, valueCol: String): DataFrame =
    events.groupBy(col(keyCol), window(col(tsCol), width))
      .agg(count(lit(1)).as("n_events"),
        graft.transform.Kpis.moneySum(col(valueCol)).as("total_value"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"), col("total_value"))

  /** Sliding event-time windows: width/slide overlap means each event
    * lands in width/slide windows (the window expression generates them —
    * a bounded explode, factor 2 for 1h/30m). Same partial-aggregation
    * shape as [[tumbling]].
    */
  def sliding(events: DataFrame, tsCol: String, keyCol: String,
              width: String, slide: String): DataFrame =
    events.groupBy(col(keyCol), window(col(tsCol), width, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"))

  /** Session windows: events of one key belong to one session while the
    * gap between consecutive events stays under `gap`. Spark's
    * session_window merges partial sessions across partitions (shuffle on
    * (key, overlapping-window), then merge) — no driver-side gaps-and-
    * islands pass. Session end = last event + gap, per session_window
    * semantics.
    */
  def sessionize(events: DataFrame, tsCol: String, keyCol: String,
                 gap: String): DataFrame =
    events.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Watermarked streaming variant of [[sessionize]] — bounds state for
    * unbounded streams (the §7.5 improvement over the reference's
    * never-expiring manifest).
    */
  def sessionizeStream(events: DataFrame, tsCol: String, keyCol: String,
                       gap: String, watermark: String): DataFrame =
    sessionize(events.withWatermark(tsCol, watermark), tsCol, keyCol, gap)

}

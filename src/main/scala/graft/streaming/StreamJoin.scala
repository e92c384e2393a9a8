package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

/** Stream-stream equi-join with an event-time tolerance window.
  *
  * The reference correlates its two live feeds (order stream ↔ product
  * stream) by buffering both sides in an unbounded DynamoDB-backed manifest
  * and joining per trigger (reference transform.py:329-360 joins whatever
  * has arrived so far; state never expires). Structured Streaming expresses
  * the same correlation natively: watermark both inputs, join on the key
  * plus a time-range predicate, and the engine buffers each side in the
  * state store ONLY until the watermark proves no counterpart can still
  * arrive — bounded state, no manifest, exactly-once across restarts via
  * the checkpoint.
  *
  * Scale shape: the join shuffles both streams on the equi-key (one
  * Exchange per side, same as a batch sort-merge join) and the range
  * predicate is evaluated post-match, so state per key is bounded by
  * rows-per-key within the tolerance window. No broadcast is possible for
  * a stream-stream join — partition-parallel state is the scalable layout.
  */
object StreamJoin {

  /** Inner-join `left` and `right` streams on `leftKey = rightKey`, keeping
    * pairs where the right event lands within `[leftTs, leftTs + tolerance]`
    * (a click→purchase funnel shape). Column names must be disjoint between
    * the two sides (rename upstream) so the SQL predicate is unambiguous.
    *
    * Both sides get the same `watermark` delay; the time-range condition is
    * what lets the engine compute each side's state-eviction bound
    * (left rows expire at watermark − tolerance, right rows at watermark).
    */
  def within(left: DataFrame, leftKey: String, leftTs: String,
             right: DataFrame, rightKey: String, rightTs: String,
             watermark: String, tolerance: String): DataFrame =
    // Column API, not a spliced SQL string: column names stay data (a
    // reserved word or a name with spaces resolves fine); only the
    // interval literal is interpolated
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"interval $tolerance"))
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change-log arrival for a Type-2 dimension key: `version` orders
  * the key's history (a CDC sequence number, a line number), `payload`
  * is the dimension value serialized to one string by the caller (pack
  * columns with a separator; unpack after — keeps the state row O(1)
  * and the operator schema-free).
  */
case class ScdEvent(key: Long, version: Long, payload: String)

/** Streaming state per key: the one OPEN run (no effective_to yet). */
case class ScdOpenRun(openFrom: Long, openPayload: String)

/** An emitted validity interval. `effective_to == None` marks the open
  * (current) run; a later batch that closes it re-emits the same
  * (key, effective_from) with the bound set, so an upsert sink keyed on
  * (key, effective_from) converges to exactly the batch
  * [[graft.operators.Scd.buildType2]] table.
  */
case class ScdRun(key: Long, effective_from: Long, effective_to: Option[Long],
                  is_current: Boolean, payload: String)

/** Incremental SCD Type-2 maintenance — the streaming form of
  * [[graft.operators.Scd.buildType2]]: a keyed `flatMapGroupsWithState`
  * holding ONLY each key's open run (O(keys) state, independent of
  * history length — closed intervals live in the sink, not the state
  * store). Batch execution over a full log reproduces the batch build
  * exactly, which is how st_scd2_history answers e_scd2_history's
  * oracle SQL verbatim.
  *
  * Ordering contract: arrivals are sorted by `version` inside each
  * trigger, so intra-batch disorder is free; an arrival older than the
  * open run's start (a cross-batch straggler, or a replay of a
  * processed version) is IGNORED — CDC appends are monotone per key,
  * and replay-idempotence is exactly what an at-least-once source
  * needs. Rewriting already-closed history requires the batch build.
  */
object Scd2Stream {

  private[streaming] def update(key: Long, events: Iterator[ScdEvent],
                                state: GroupState[ScdOpenRun]): Iterator[ScdRun] = {
    val sorted = events.toSeq.sortBy(_.version)
    var open = state.getOption
    var dirty = false
    val out = Seq.newBuilder[ScdRun]
    sorted.foreach { e =>
      open match {
        case None =>
          open = Some(ScdOpenRun(e.version, e.payload)); dirty = true
        case Some(o) if e.version <= o.openFrom => () // straggler / replay
        case Some(o) if e.payload == o.openPayload => () // run continues
        case Some(o) =>
          out += ScdRun(key, o.openFrom, Some(e.version),
            is_current = false, o.openPayload)
          open = Some(ScdOpenRun(e.version, e.payload)); dirty = true
      }
    }
    if (dirty) open.foreach { o =>
      out += ScdRun(key, o.openFrom, None, is_current = true, o.openPayload)
      state.update(o)
    }
    out.result().iterator
  }

  /** The operator — works on both streaming and batch Datasets (batch
    * parity with `Scd.buildType2` is ScdStreamSpec-pinned). Update
    * output mode: a closed run re-emits its key's earlier row.
    */
  def runs(events: Dataset[ScdEvent]): Dataset[ScdRun] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
  }
}

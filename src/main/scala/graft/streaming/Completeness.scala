package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One arrival of one part of an order group — the distilled form of the
  * reference's per-file manifest updates (reference
  * src/glue_scripts/glue_job.py:124-144 extracts order/product ids per
  * landed file; 96-104 accumulates them in the pending manifest).
  * `kind` is one of [[Completeness.KindOrder]] / KindItem / KindProduct.
  */
case class PartEvent(orderId: String, kind: String, productId: Option[String])

/** Per-order accumulation state — the manifest entry for one order
  * (glue_job.py:96-104: pending id lists + completed set).
  */
case class GroupProgress(hasOrder: Boolean, wanted: Set[String],
                         present: Set[String], emitted: Boolean)

/** An order group that became referentially complete (glue_job.py:221-256:
  * order row present ∧ items present ∧ every referenced product present).
  */
case class CompletedGroup(orderId: String, productIds: Seq[String])

/** ST3/ST6 — the stateful completeness join: wait, per order, until all of
  * its parts have arrived, in any order, then emit the group exactly once.
  *
  * The reference implements this as driver-side set algebra over a JSON
  * manifest re-read on every file arrival (glue_job.py:221-256); here it is
  * a keyed `flatMapGroupsWithState` over an unbounded event stream — state
  * lives in the streaming state store, partitioned by order_id, so 100 TB of
  * arrivals shard across executors instead of one JSON document.
  *
  * Semantics kept from the reference:
  *  - no watermark, no timeout: a group waits indefinitely
  *    (GroupStateTimeout.NoTimeout — the pending lists never expire,
  *    glue_job.py:96-104);
  *  - emit-once: once fired, a group never re-fires even if its events are
  *    re-delivered (the completed_order_ids set, glue_job.py:228);
  *  - out-of-order tolerant: items before order, products before items.
  */
object Completeness {
  val KindOrder = "order"
  val KindItem = "item"
  val KindProduct = "product"

  /** State transition for one micro-batch worth of events of one order.
    * With `staleMs > 0` the group's processing-time timeout is re-armed on
    * every update, and a group whose deadline fires (no new events for
    * `staleMs`) is expired — the SURVEY §7.5 improvement over the
    * reference's never-expiring pending lists.
    *
    * Expiry is two-phase to preserve emit-once under re-delivery: a group
    * that never emitted is removed outright, but an EMITTED group first
    * collapses to a compact tombstone (emitted flag only, sets dropped) for
    * one more staleMs window — so an at-least-once source replaying the
    * group's events inside that window folds onto emitted=true and stays
    * silent, instead of rebuilding from scratch and double-emitting into an
    * append sink. Only after a second idle window is the tombstone removed;
    * re-delivery later than 2×staleMs is the documented horizon where
    * emit-once hands over to the sink's keyed idempotency (KvSink upserts
    * by key, so even then the duplicate row converges).
    */
  def update(staleMs: Long)(orderId: String, events: Iterator[PartEvent],
             state: GroupState[GroupProgress]): Iterator[CompletedGroup] = {
    if (state.hasTimedOut) {
      val st = state.getOption
      if (st.exists(s => s.emitted && s.wanted.nonEmpty)) {
        // emitted group: keep a set-free tombstone one more window so a
        // replay cannot re-emit; O(1) state instead of O(products)
        state.update(GroupProgress(hasOrder = false, Set.empty, Set.empty,
          emitted = true))
        state.setTimeoutDuration(staleMs)
      } else {
        state.remove() // never-emitted group or expired tombstone: drop
      }
      return Iterator.empty
    }
    val st0 = state.getOption.getOrElse(
      GroupProgress(hasOrder = false, Set.empty, Set.empty, emitted = false))
    val st = events.foldLeft(st0) { (s, e) =>
      e.kind match {
        case KindOrder   => s.copy(hasOrder = true)
        case KindItem    => s.copy(wanted = s.wanted ++ e.productId)
        case KindProduct => s.copy(present = s.present ++ e.productId)
        case _           => s
      }
    }
    val complete = st.hasOrder && st.wanted.nonEmpty && st.wanted.subsetOf(st.present)
    val out =
      if (complete && !st.emitted) {
        state.update(st.copy(emitted = true))
        Iterator.single(CompletedGroup(orderId, st.wanted.toSeq.sorted))
      } else {
        state.update(st)
        Iterator.empty
      }
    if (staleMs > 0) state.setTimeoutDuration(staleMs)
    out
  }

  /** The streaming operator: works on both streaming and batch Datasets
    * (batch parity with [[graft.operators.Grouping.completeGroups]]).
    *
    * `staleMs = 0` (default) keeps the reference's semantics: a group waits
    * forever (NoTimeout, glue_job.py:96-104). `staleMs > 0` bounds state:
    * a group seeing no events for that long is expired and removed —
    * unbounded pending state is the one thing the reference's manifest
    * never reclaims, and at 100 TB of arrivals it must be.
    */
  def stream(events: Dataset[PartEvent], staleMs: Long = 0L): Dataset[CompletedGroup] = {
    import events.sparkSession.implicits._
    val timeout =
      if (staleMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.orderId)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(update(staleMs))
  }
}

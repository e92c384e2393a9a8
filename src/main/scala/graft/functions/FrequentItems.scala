package graft.functions

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Spark [[Aggregator]] — the
  * bounded-memory heavy-hitters operator (Misra & Gries, "Finding repeated
  * elements", 1982; the mergeable-summaries form follows Agarwal et al.,
  * "Mergeable Summaries", PODS '12). An exact term-frequency top-k over
  * 100 TB of tokens shuffles the full distinct-term set; this summary
  * keeps AT MOST k-1 counters per partition, merges associatively
  * (ObjectHashAggregate partial + final, map-side combined like any
  * built-in sketch), and guarantees:
  *
  *  - every item with true frequency > N/k IS in the final summary;
  *  - each estimate satisfies  true - N/k  ≤  est  ≤  true.
  *
  * Which NON-heavy items survive (and their exact estimates) depends on
  * encounter order, so the deterministic—and oracled—contract is the
  * guaranteed part: heavy-item membership plus the error band
  * (t_frequent_terms pins both; the tolerance-oracle pattern).
  */
object FrequentItems {

  /** Fold one item into a summary of ≤ k-1 counters: increment if
    * present, insert if there is room, otherwise decrement ALL counters
    * (dropping zeros) — the classic MG step, O(k) only on the ≤ N/k
    * decrement events, amortized O(1).
    */
  private[functions] def add(b: Map[String, Long], item: String, w: Long,
                             k: Int): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + w)
      case None if b.size < k - 1 => b.updated(item, w)
      case None =>
        val dec = math.min(w, b.values.min)
        val rem = w - dec
        val shrunk = b.flatMap { case (t, c) =>
          if (c > dec) Some(t -> (c - dec)) else None
        }
        if (rem > 0) add(shrunk, item, rem, k) else shrunk
    }

  /** Merge two summaries: add counts, then shrink back to k-1 counters by
    * subtracting the k-th largest count from every counter (Agarwal et
    * al.'s merge — keeps both guarantees).
    */
  private[functions] def mergeSummaries(x: Map[String, Long],
                                        y: Map[String, Long],
                                        k: Int): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (sum.size <= k - 1) sum
    else {
      val kth = sum.values.toSeq.sorted(Ordering[Long].reverse)(k - 1)
      sum.flatMap { case (t, c) => if (c > kth) Some(t -> (c - kth)) else None }
    }
  }

  class Sketch(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"frequent-items sketch needs k >= 2, got $k")
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
      add(b, item, 1L, k)
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      mergeSummaries(x, y, k)
    override def finish(r: Map[String, Long]): Map[String, Long] = r
    // ExpressionEncoder, not kryo: the summary surfaces as a real
    // map<string,bigint> column (explodable in the query), and the
    // partial-aggregation buffer stays a catalyst value
    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The sketch as a TypedColumn over a Dataset[String] of items. */
  def sketch(k: Int): TypedColumn[String, Map[String, Long]] =
    new Sketch(k).toColumn
}

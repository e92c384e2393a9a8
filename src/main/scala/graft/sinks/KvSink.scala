package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** A key-value store client the sink writes through. Implementations must be
  * serializable (they ship to executors). The put must be idempotent by key
  * — the retry loop re-sends whole chunks (the reference's DynamoDB
  * batch_writer has the same contract, transform.py:226-257).
  */
trait KvWriter extends Serializable {
  /** Write one chunk of items; throw to trigger a retry. */
  def putBatch(items: Seq[Map[String, String]]): Unit
}

/** S8 — distributed chunked KV batch-write sink with bounded retries.
  *
  * Reference: containers/transformation/transform.py:226-257 collects KPI
  * rows to the driver and batch-writes chunks of 25 to DynamoDB with ≤3
  * retries and exponential backoff. Here the write runs on the executors
  * (`foreachPartition` — no driver collect, the reference's one real scale
  * bug, transform.py:376,390), with the same chunk/retry/backoff semantics
  * per partition.
  */
object KvSink {

  /** Write every row of `df` through `writer` in chunks of `chunkSize`,
    * retrying each failed chunk up to `maxRetries` times with exponential
    * backoff. Row → Map[column → string] mirrors the reference's
    * Decimal/str item conversion (transform.py:378-400); nulls are dropped
    * from the item like DynamoDB omits absent attributes.
    *
    * Pass `keyCol` when the writer is keyed: a null key value then fails
    * fast with a clear message instead of surfacing as a
    * NoSuchElementException deep inside an executor retry loop after the
    * null column was dropped from the item (ADVICE r03).
    */
  def write(df: DataFrame, writer: KvWriter, chunkSize: Int = 25,
            maxRetries: Int = 3, baseBackoffMs: Long = 100L,
            keyCol: Option[String] = None): Unit = {
    val cols = df.columns
    keyCol.foreach(k => require(cols.contains(k),
      s"key column '$k' is not in the frame (columns: ${cols.mkString(", ")})"))
    df.foreachPartition { rows: Iterator[Row] =>
      rows.map { r =>
        keyCol.foreach(k => require(r.getAs[Any](k) != null,
          s"null value in key column '$k' — keyed KV writes need a non-null key: $r"))
        cols.flatMap { c =>
          Option(r.getAs[Any](c)).map(v => c -> v.toString)
        }.toMap
      }.grouped(chunkSize).foreach { chunk =>
        // writer faults are presumed transient service errors (the
        // reference retries any DynamoDB error, transform.py:379-387)
        graft.util.Retry.withBackoff(maxRetries, baseBackoffMs,
          retryable = graft.util.Retry.always) {
          writer.putBatch(chunk)
        }
      }
    }
  }
}

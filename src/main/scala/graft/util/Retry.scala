package graft.util

/** Bounded retry with exponential backoff — the application-level retry the
  * reference wraps around its object-store reads (reference
  * containers/validation/validate.py:84-104: a decorator retrying S3 calls
  * with exponential sleep; SURVEY.md §4 "application-level retries").
  *
  * Serializable by construction (object method, no captured state), so the
  * same utility runs driver-side around source metadata reads and
  * executor-side inside sink partitions (KvSink).
  */
object Retry {

  /** Default retryable predicate: transient I/O only — an IOException or
    * TimeoutException anywhere in the (bounded) cause chain. Deterministic
    * failures (missing path, schema mismatch — Spark's AnalysisException)
    * fail immediately instead of burning maxRetries sleeps and repeated
    * metadata round-trips on an error that cannot heal, mirroring the
    * reference decorator's S3-error-specific scope (validate.py:84-104).
    */
  val transientIO: Throwable => Boolean = { e =>
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).exists {
      case _: java.io.IOException | _: java.util.concurrent.TimeoutException => true
      case _ => false
    }
  }

  /** Retry every exception — for sinks whose writer errors are presumed
    * transient service faults (the reference retries any DynamoDB error the
    * same way, transform.py:379-387).
    */
  val always: Throwable => Boolean = _ => true

  /** Run `f`, retrying up to `maxRetries` times after failures `retryable`
    * accepts, sleeping `baseBackoffMs << attempt` between tries
    * (100 → 200 → 400 …). Non-retryable failures, and the last failure once
    * retries are exhausted, are rethrown unchanged. `sleep` is injectable
    * for tests.
    */
  def withBackoff[T](maxRetries: Int = 3, baseBackoffMs: Long = 100L,
                     sleep: Long => Unit = Thread.sleep,
                     retryable: Throwable => Boolean = transientIO)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries || !retryable(e)) throw e
          sleep(baseBackoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

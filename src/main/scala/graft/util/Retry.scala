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

  /** Run `f`, retrying up to `maxRetries` times after failures, sleeping
    * `baseBackoffMs << attempt` between tries (100 → 200 → 400 …). The last
    * failure is rethrown unchanged once retries are exhausted. `sleep` is
    * injectable for tests.
    */
  def withBackoff[T](maxRetries: Int = 3, baseBackoffMs: Long = 100L,
                     sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt > maxRetries) throw e
          sleep(baseBackoffMs << (attempt - 1))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

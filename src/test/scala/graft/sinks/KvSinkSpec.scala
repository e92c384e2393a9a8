package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.SparkException
import graft.SparkSpec

/** In-memory KV store backing the sink tests. Static state is visible to
  * executor threads because local-mode tests share one JVM.
  */
object TestKv {
  val store = new ConcurrentHashMap[String, Map[String, String]]()
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
  val failuresToInject = new AtomicInteger(0)
  val attempts = new AtomicInteger(0)

  def reset(failures: Int = 0): Unit = {
    store.clear(); batchSizes.clear()
    failuresToInject.set(failures); attempts.set(0)
  }

  class Writer(keyCol: String) extends KvWriter {
    def putBatch(items: Seq[Map[String, String]]): Unit = {
      attempts.incrementAndGet()
      if (failuresToInject.getAndDecrement() > 0)
        throw new RuntimeException("injected transient failure")
      failuresToInject.updateAndGet(n => math.max(n, 0))
      batchSizes.add(items.size)
      items.foreach(i => store.put(i(keyCol), i))
    }
  }
}

/** S8 — chunking, bounded retry with backoff, failure propagation, and
  * keyed idempotency (reference transform.py:226-257 semantics).
  */
class KvSinkSpec extends SparkSpec {
  import spark.implicits._

  private def df60 = (1 to 60).map(i => (i.toString, s"v$i")).toDF("k", "v").coalesce(1)

  test("writes in chunks of 25 and lands every row") {
    TestKv.reset()
    KvSink.write(df60, new TestKv.Writer("k"), chunkSize = 25, baseBackoffMs = 1)
    assert(TestKv.store.size() == 60)
    assert(TestKv.store.get("17") == Map("k" -> "17", "v" -> "v17"))
    import scala.jdk.CollectionConverters._
    assert(TestKv.batchSizes.asScala.toSeq.sorted == Seq(10, 25, 25))
  }

  test("transient failures are retried until success") {
    TestKv.reset(failures = 2)
    KvSink.write(df60, new TestKv.Writer("k"), chunkSize = 25,
      maxRetries = 3, baseBackoffMs = 1)
    assert(TestKv.store.size() == 60)
    assert(TestKv.attempts.get() == 5) // 2 failed + 3 successful chunks
  }

  test("exhausted retries fail the job and surface the cause") {
    TestKv.reset(failures = 100)
    val e = intercept[SparkException] {
      KvSink.write(df60, new TestKv.Writer("k"), chunkSize = 25,
        maxRetries = 2, baseBackoffMs = 1)
    }
    assert(e.getMessage.contains("injected transient failure") ||
      Option(e.getCause).exists(_.getMessage.contains("injected transient failure")))
  }

  test("a null key value fails fast with a clear message when keyCol is declared") {
    TestKv.reset()
    val df = Seq((Some("a"), "1"), (None, "2")).toDF("k", "v")
    val e = intercept[SparkException] {
      KvSink.write(df, new TestKv.Writer("k"), baseBackoffMs = 1,
        keyCol = Some("k"))
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("null value in key column 'k'"))
    // an absent key column is caught on the driver, before any job runs
    val e2 = intercept[IllegalArgumentException] {
      KvSink.write(df, new TestKv.Writer("k"), keyCol = Some("missing"))
    }
    assert(e2.getMessage.contains("'missing' is not in the frame"))
  }

  test("nulls are dropped from items; re-running is idempotent by key") {
    TestKv.reset()
    val df = Seq(("a", Some("1")), ("b", None)).toDF("k", "v")
    KvSink.write(df, new TestKv.Writer("k"), baseBackoffMs = 1)
    assert(TestKv.store.get("b") == Map("k" -> "b")) // null v omitted
    val before = new java.util.HashMap(TestKv.store)
    KvSink.write(df, new TestKv.Writer("k"), baseBackoffMs = 1)
    assert(TestKv.store == before)
  }
}

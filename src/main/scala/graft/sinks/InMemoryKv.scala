package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** In-process key-value store — the local stand-in for the reference's
  * DynamoDB tables (transform.py:41-42: keyed KPI stores). Executors in
  * local mode share the JVM, so a static map observes every partition's
  * writes; on a real cluster this class would be replaced by a client to an
  * actual KV service behind the same [[KvWriter]] interface.
  */
object InMemoryKv {
  private val store = new ConcurrentHashMap[String, Map[String, String]]()

  def clear(): Unit = store.clear()

  def snapshot: Seq[Map[String, String]] = store.values.asScala.toSeq

  /** A writer keyed by `keyCol`; puts are idempotent by key. */
  def writer(keyCol: String): KvWriter = new KvWriter {
    def putBatch(items: Seq[Map[String, String]]): Unit =
      items.foreach(i => store.put(i(keyCol), i))
  }
}

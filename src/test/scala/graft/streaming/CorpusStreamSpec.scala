package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming corpus prep: content dedup across micro-batches, quality
  * gating, and cumulative per-language stats in update mode.
  */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val goodEn =
    "the quick brown fox jumps over the lazy dog and it was a good day for this"
  private val goodEn2 =
    "it is a truth universally acknowledged that a reader in want of the text must be in search of this"
  private val junk = "!!! ??? ### $$$ %%%" // punctuation soup: quality gate drops

  test("cross-batch content dups collapse; junk is gated; per-language stats accumulate") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val out = CorpusStream.langStats(CorpusStream.prepared(
      input.toDF(), "doc_id", "text", "ts", watermark = "1 hour"))
    val q = out.writeStream.format("memory").queryName("corpus_stats")
      .outputMode("update").start()
    try {
      input.addData(DocEvent(1L, goodEn, t("2026-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: an exact content copy under a DIFFERENT id (dropped by
      // content dedup), junk (dropped by the quality gate), a new good doc
      input.addData(
        DocEvent(2L, goodEn, t("2026-01-01 10:05:00")),
        DocEvent(3L, junk, t("2026-01-01 10:06:00")),
        DocEvent(4L, goodEn2, t("2026-01-01 10:07:00")))
      q.processAllAvailable()
      // update mode re-emits the changed row per batch; counts are
      // monotonic, so max-per-key is the latest regardless of row order
      val rows = spark.table("corpus_stats")
        .select("lang_pred", "n_docs").as[(String, Long)].collect()
      val latest = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
      assert(latest == Map("en" -> 2L)) // docs 1 and 4; dup 2 and junk 3 excluded
    } finally q.stop()
  }

  test("prepared keeps the full annotated row for downstream sinks") {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val q = CorpusStream.prepared(input.toDF(), "doc_id", "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("corpus_rows")
      .outputMode("append").start()
    try {
      input.addData(DocEvent(1L, goodEn, t("2026-01-01 10:00:00")))
      q.processAllAvailable()
      val row = spark.table("corpus_rows").collect().head
      val schema = spark.table("corpus_rows").columns.toSet
      assert(Set("doc_id", "text", "ts", "n_tokens", "lang_pred",
        "bpe_tokens", "quality_ok" // quality_ok is filtered, not projected
      ).subsetOf(schema + "quality_ok"))
      assert(row.getAs[String]("lang_pred") == "en")
      assert(row.getAs[Long]("n_tokens") > 5L)
    } finally q.stop()
  }
}

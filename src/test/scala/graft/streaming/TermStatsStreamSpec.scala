package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Streaming TF/DF maintenance: multi-batch drains through the keyed
  * upsert store must equal the batch transform over the union — the
  * cross-batch distinct (df) and cumulative counts (tf) are what the
  * update-mode state buys.
  */
class TermStatsStreamSpec extends SparkSpec {
  import spark.implicits._

  private def drainTo(out: String, keys: Seq[String],
                      transform: DataFrame => DataFrame)
                     (feed: MemoryStream[(Long, String)] => Unit): DataFrame = {
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val cp = graft.util.Scratch.dir("termstats_cp")
    val query = transform(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", cp)
      .foreachBatch(StreamingPipeline.upsertBatchSnapshot(out, keys) _)
      .start()
    try {
      feed(input)
      query.processAllAvailable()
    } finally query.stop()
    StreamingPipeline.readSnapshot(spark, out)
  }

  private val batch1 = Seq((1L, "alpha beta alpha"), (2L, "beta gamma"))
  private val batch2 = Seq((3L, "alpha beta beta"), (60L, "alpha delta"))

  test("df: cross-batch distinct counts equal the batch transform on the union") {
    val out = graft.util.Scratch.dir("termstats_df")
    val got = drainTo(out, Seq("term"), TermStatsStream.dfCounts) { in =>
      in.addData(batch1: _*); in.addData(batch2: _*)
    }.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = TermStatsStream
      .dfCounts((batch1 ++ batch2).toDF("doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got("alpha") == 3L && got("delta") == 1L) // hand check
  }

  test("tf: cumulative per-(doc, term) counts respect the doc-id slice") {
    val out = graft.util.Scratch.dir("termstats_tf")
    val got = drainTo(out, Seq("doc_id", "term"),
      TermStatsStream.tfCounts(_, 50L)) { in =>
      in.addData(batch1: _*); in.addData(batch2: _*)
    }.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = TermStatsStream
      .tfCounts((batch1 ++ batch2).toDF("doc_id", "text"), 50L)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    assert(got((1L, "alpha")) == 2L)
    assert(!got.keys.exists(_._1 == 60L)) // sliced out, not counted
  }
}

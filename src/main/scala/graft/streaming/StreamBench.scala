package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming micro-benchmark (VERDICT r03 #4): ST1–ST7 had correctness
  * coverage but no recorded throughput. Drives the stateful completeness
  * join end-to-end — MemoryStream source → flatMapGroupsWithState →
  * foreachBatch keyed upsert sink — and reports events/second, so the
  * per-round bench JSON carries a streaming number alongside the batch
  * queries.
  */
object StreamBench {

  /** Drain `nOrders` synthetic order groups (1 header + `itemsPer` item +
    * `itemsPer` product arrivals each) with an AvailableNow trigger into a
    * temp-dir upsert table. Returns (events drained, wall seconds for the
    * streaming query). Deterministic input; every group completes, so the
    * sink sees all `nOrders` rows.
    */
  def completenessThroughput(spark: SparkSession, nOrders: Int,
                             itemsPer: Int): (Long, Double) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = MemoryStream[PartEvent]
    val events = (0 until nOrders).flatMap { o =>
      val id = s"o$o"
      PartEvent(id, Completeness.KindOrder, None) +:
        (0 until itemsPer).flatMap(i => Seq(
          PartEvent(id, Completeness.KindItem, Some(s"p$i")),
          PartEvent(id, Completeness.KindProduct, Some(s"p$i"))))
    }
    input.addData(events)
    val target = graft.util.Scratch.dir("graft_sbench_tgt")
    val checkpoint = graft.util.Scratch.dir("graft_sbench_cp")
    val t0 = System.nanoTime()
    val q = Completeness.stream(input.toDS()).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(StreamingPipeline.upsertBatch(target, Seq("orderId")) _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    (events.size.toLong, secs)
  }

  /** Drain `nDocs` synthetic documents (every third a content duplicate)
    * through the full streaming corpus-prep chain — content dedup →
    * annotation → quality gate → update-mode language rollup — into a
    * memory sink. Returns (docs drained, wall seconds). The deterministic
    * generator mixes doc lengths so the tokenizer/regex work is realistic
    * rather than constant-folded.
    */
  def corpusPrepThroughput(spark: SparkSession, nDocs: Int): (Long, Double) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "and", "it", "was", "a", "good", "day", "for", "this",
      "stream", "of", "documents", "to", "be", "scored", "in", "order")
    val input = MemoryStream[DocEvent]
    val docs = (0 until nDocs).map { i =>
      val base = if (i % 3 == 2) i - 1 else i // every 3rd duplicates its predecessor
      val n = 20 + (base * 7) % 60
      val text = (0 until n).map(j => words((base + j * 13) % words.length))
        .mkString(" ")
      DocEvent(i.toLong, text,
        new java.sql.Timestamp(1700000000000L + i * 1000L))
    }
    input.addData(docs)
    val checkpoint = graft.util.Scratch.dir("graft_cbench_cp")
    val t0 = System.nanoTime()
    val q = CorpusStream.langStats(CorpusStream.prepared(
        input.toDF(), "doc_id", "text", "ts", watermark = "1 hour"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName("corpus_bench")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    (nDocs.toLong, secs)
  }
}

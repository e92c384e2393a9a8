package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Streaming micro-benchmark (VERDICT r03 #4): ST1–ST7 had correctness
  * coverage but no recorded throughput. Drives the stateful completeness
  * join end-to-end — file-arrival source → flatMapGroupsWithState →
  * foreachBatch keyed upsert sink — and reports events/second, so the
  * per-round bench JSON carries a streaming number alongside the batch
  * queries.
  *
  * The synthetic input is staged as parquet and streamed through the FILE
  * source (ST1, the production surface), not a MemoryStream: MemoryStream
  * serializes its whole backlog into every task binary (BENCH_r04 logged
  * 13.7 MiB task-broadcast warnings for the 50k-doc corpus — a harness
  * artifact that throttled the reported docs/s; VERDICT r04 #6). Staging
  * happens before the clock starts; the timed window covers exactly the
  * streaming query.
  */
object StreamBench {

  /** Stage a dataset as one parquet directory the file source will ingest
    * (written before timing starts, spread over enough files that the
    * stream's first batch parallelizes).
    */
  private def stage[T](ds: Dataset[T], prefix: String, files: Int): String = {
    val dir = graft.util.Scratch.dir(prefix)
    ds.repartition(files).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Drain `nOrders` synthetic order groups (1 header + `itemsPer` item +
    * `itemsPer` product arrivals each) with an AvailableNow trigger into a
    * temp-dir upsert table. Returns (events drained, wall seconds for the
    * streaming query). Deterministic input; every group completes, so the
    * sink sees all `nOrders` rows.
    */
  def completenessThroughput(spark: SparkSession, nOrders: Int,
                             itemsPer: Int): (Long, Double) = {
    import spark.implicits._
    val events = spark.range(nOrders).flatMap { o =>
      val id = s"o$o"
      PartEvent(id, Completeness.KindOrder, None) +:
        (0 until itemsPer).flatMap(i => Seq(
          PartEvent(id, Completeness.KindItem, Some(s"p$i")),
          PartEvent(id, Completeness.KindProduct, Some(s"p$i"))))
    }
    val nEvents = nOrders.toLong * (1 + 2 * itemsPer)
    val inDir = stage(events, "graft_sbench_in", 32)
    val input = spark.readStream.schema(events.schema).parquet(inDir).as[PartEvent]
    val target = graft.util.Scratch.dir("graft_sbench_tgt")
    val checkpoint = graft.util.Scratch.dir("graft_sbench_cp")
    val t0 = System.nanoTime()
    val q = Completeness.stream(input).toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(StreamingPipeline.upsertBatch(target, Seq("orderId")) _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    (nEvents, secs)
  }

  /** Drain `nDocs` synthetic documents through the FULL streaming
    * curation DAG (CurateStream: per-trigger registry-dedup gate +
    * whole-corpus refit + atomic artifact commit) across several
    * file-source triggers. Returns (docs drained, wall seconds for the
    * streaming query) — the round-10 headline surface's throughput
    * number, beside the corpus-prep and completeness legs.
    */
  def curateThroughput(spark: SparkSession, nDocs: Int): (Long, Double) = {
    import spark.implicits._
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "and", "it", "was", "a", "good", "day", "for", "this",
      "stream", "of", "documents", "to", "be", "scored", "in", "order")
    val docs = spark.range(nDocs).map { id =>
      val i: Long = id
      val base: Long = if (i % 3 == 2) i - 1 else i // every 3rd duplicates
      val n = (20 + (base * 7) % 60).toInt
      val text = (0 until n).map(j => words(((base + j * 13) % words.length).toInt))
        .mkString(" ")
      (i, s"d${i % 4}", text)
    }.toDF("doc_id", "domain", "text")
    val inDir = stage(docs, "graft_curbench_in", 32)
    val cfg = CurateConfig(langKeep = Seq("en"), pplCutoff = 1e6,
      budget = 1000000L, weights = Seq("d0" -> 0.25, "d1" -> 0.25,
        "d2" -> 0.25, "d3" -> 0.25), seqBudget = 256L)
    val work = graft.util.Scratch.dir("graft_curbench_work")
    val checkpoint = graft.util.Scratch.dir("graft_curbench_cp")
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 8).parquet(inDir)
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch(CurateStream.curateBatch(work, cfg) _)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    (nDocs.toLong, secs)
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
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "and", "it", "was", "a", "good", "day", "for", "this",
      "stream", "of", "documents", "to", "be", "scored", "in", "order")
    val docs = spark.range(nDocs).map { id =>
      val i: Long = id
      val base: Long = if (i % 3 == 2) i - 1 else i // every 3rd duplicates its predecessor
      val n = (20 + (base * 7) % 60).toInt
      val text = (0 until n).map(j => words(((base + j * 13) % words.length).toInt))
        .mkString(" ")
      DocEvent(i, text, new java.sql.Timestamp(1700000000000L + i * 1000L))
    }
    val inDir = stage(docs, "graft_cbench_in", 32)
    val input = spark.readStream.schema(docs.schema).parquet(inDir)
    val checkpoint = graft.util.Scratch.dir("graft_cbench_cp")
    val t0 = System.nanoTime()
    val q = CorpusStream.langStats(CorpusStream.prepared(
        input, "doc_id", "text", "ts", watermark = "1 hour"))
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

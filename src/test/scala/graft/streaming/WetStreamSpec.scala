package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Crawl

/** WetStream: cross-batch first-seen URI dedup, sighting counts,
  * intra-batch canonical pick, and same-batch replay idempotence.
  */
class WetStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = graft.util.Scratch.dir(p)

  test("drain: first file wins a refetched uri; sightings count both") {
    val docs = Seq((0L, "alpha body"), (1L, "beta body"), (2L, "gamma body"))
      .toDF("doc_id", "text")
    // f0 carries all three; f1 refetches doc 0 and 2 under the same uris
    val blobs = Crawl.plantWet(docs, "doc_id", "text", files = 1)
      .select(lit(0L).as("file_id"), col("wet"))
      .unionByName(
        Crawl.plantWet(docs.filter(col("doc_id") =!= 1L), "doc_id", "text",
          files = 1).select(lit(1L).as("file_id"), col("wet")))
    val stage = tmp("wetspec_in")
    (0L to 1L).foreach { i =>
      val sub = s"$stage/f$i"
      blobs.filter(col("file_id") === i).coalesce(1)
        .write.mode("overwrite").parquet(sub)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(sub))
        .iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(1800000000000L + i * 60000L)))
    }
    val (work, cp) = (tmp("wetspec_work"), tmp("wetspec_cp"))
    val schema = spark.read.parquet(s"$stage/f0").schema
    val q = WetStream.writer(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$stage/f*"),
        work, cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val recs = WetStream.records(spark, work).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("file_id"), r.getAs[String]("body"),
          r.getAs[Boolean]("len_ok"))).toMap
    assert(recs.keySet == Set(0L, 1L, 2L))
    assert(recs(0L) == ((0L, "alpha body", true)), "refetch must not displace f0's parse")
    assert(recs(2L) == ((0L, "gamma body", true)))
    val seen = WetStream.sightings(spark, work).collect()
      .map(r => r.getAs[String]("uri") -> r.getAs[Long]("n_seen")).toMap
    assert(seen("https://example.com/d/0") == 2L)
    assert(seen("https://example.com/d/1") == 1L)
    assert(seen("https://example.com/d/2") == 2L)
  }

  test("ingestBatch: intra-batch collision resolves to min file_id; replay is byte-equal") {
    val docs = Seq((5L, "five body")).toDF("doc_id", "text")
    // one BATCH holding two files that both carry doc 5's record
    val batch = Crawl.plantWet(docs, "doc_id", "text", files = 1)
      .select(lit(3L).as("file_id"), col("wet"))
      .unionByName(Crawl.plantWet(docs, "doc_id", "text", files = 1)
        .select(lit(2L).as("file_id"), col("wet")))
    val work = tmp("wetspec_unit")
    WetStream.ingestBatch(work, Crawl.wetParse(_, "file_id", "wet"))(batch, 0L)
    val first = WetStream.records(spark, work).collect()
    assert(first.length == 1 && first(0).getAs[Long]("file_id") == 2L)
    // same-batch redelivery: the batch-0 registry partition must not
    // shadow its own replay — the rewrite recomputes the same row
    WetStream.ingestBatch(work, Crawl.wetParse(_, "file_id", "wet"))(batch, 0L)
    val again = WetStream.records(spark, work).collect()
    assert(again.length == 1 && again(0).getAs[Long]("file_id") == 2L)
    // a later batch redelivering the uri commits nothing new
    WetStream.ingestBatch(work, Crawl.wetParse(_, "file_id", "wet"))(batch, 1L)
    assert(WetStream.records(spark, work).count() == 1L)
    // 2 sightings in batch 0 (its replay overwrote, not doubled) + 2 in
    // batch 1
    assert(WetStream.sightings(spark, work).head().getAs[Long]("n_seen") == 4L)
  }

  test("ingestBatch: an intact redelivery supersedes a truncated first sighting") {
    val work = tmp("wetspec_trunc")
    val parse = Crawl.wetParse(_: org.apache.spark.sql.DataFrame, "file_id", "wet")
    // batch 0: doc 9 arrives CUT — body shorter than the declared length
    val cut = Seq((0L, "WARC/1.0\nWARC-Target-URI: https://example.com/d/9\n" +
      "Content-Length: 100\n\nshort")).toDF("file_id", "wet")
    WetStream.ingestBatch(work, parse)(cut, 0L)
    val first = WetStream.records(spark, work).collect()
    assert(first.length == 1 && !first(0).getAs[Boolean]("len_ok"))
    // batch 1: the SAME truncated archive redelivered — blocked (a
    // truncated registration blocks other truncated copies)
    WetStream.ingestBatch(work, parse)(cut.withColumn("file_id", lit(1L)), 1L)
    assert(WetStream.records(spark, work).count() == 1L)
    // batch 2: the INTACT record arrives — it must supersede the cut one
    val intact = Crawl.plantWet(Seq((9L, "whole body")).toDF("doc_id", "text"),
      "doc_id", "text", files = 1).select(lit(2L).as("file_id"), col("wet"))
    WetStream.ingestBatch(work, parse)(intact, 2L)
    val resolved = WetStream.records(spark, work).collect()
    assert(resolved.length == 1, "per-uri resolution must pick one row")
    assert(resolved(0).getAs[Boolean]("len_ok") &&
      resolved(0).getAs[String]("body") == "whole body" &&
      resolved(0).getAs[Long]("file_id") == 2L,
      "the intact redelivery must win over the truncated first sighting")
    // batch 3: a second intact copy — now first-seen-wins is final
    WetStream.ingestBatch(work, parse)(
      intact.withColumn("file_id", lit(3L)), 3L)
    val after = WetStream.records(spark, work).collect()
    assert(after.length == 1 && after(0).getAs[Long]("file_id") == 2L)
    // compaction must preserve the resolution (registry folds keep len_ok)
    WetStream.compact(spark, work, upToBatch = 4L)
    val folded = WetStream.records(spark, work).collect()
    assert(folded.length == 1 && folded(0).getAs[Long]("file_id") == 2L &&
      folded(0).getAs[Boolean]("len_ok"))
    WetStream.ingestBatch(work, parse)(
      intact.withColumn("file_id", lit(4L)), 4L)
    assert(WetStream.records(spark, work).count() == 1L,
      "the folded complete registration must still block redeliveries")
  }

  test("ingestBatch: an empty batch commits nothing") {
    val work = tmp("wetspec_empty")
    val empty = Seq.empty[(Long, String)].toDF("file_id", "wet")
    WetStream.ingestBatch(work, Crawl.wetParse(_, "file_id", "wet"))(empty, 0L)
    assert(WetStream.records(spark, work).count() == 0L)
  }

  test("gz drain: multi-member .wet.gz blobs parse, dedup, and count identically") {
    val docs = Seq((0L, "gz alpha"), (1L, "gz béta — non-ASCII"), (2L, "gz gamma"))
      .toDF("doc_id", "text")
    val blobs = Crawl.plantWetBytes(docs, "doc_id", "text", files = 1,
        gzipRecords = true)
      .select(lit(0L).as("file_id"), col("content"))
      .unionByName(Crawl.plantWetBytes(docs.filter(col("doc_id") === 0L),
        "doc_id", "text", files = 1, gzipRecords = true)
        .select(lit(1L).as("file_id"), col("content")))
    val stage = tmp("wetgz_in")
    (0L to 1L).foreach { i =>
      val sub = s"$stage/f$i"
      blobs.filter(col("file_id") === i).coalesce(1)
        .write.mode("overwrite").parquet(sub)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(java.nio.file.Paths.get(sub))
        .iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(1800000000000L + i * 60000L)))
    }
    val (work, cp) = (tmp("wetgz_work"), tmp("wetgz_cp"))
    val schema = spark.read.parquet(s"$stage/f0").schema
    val q = WetStream.writerGz(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$stage/f*"),
        work, cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val recs = WetStream.records(spark, work).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("file_id"), r.getAs[String]("body"),
          r.getAs[Long]("declared_len"), r.getAs[Boolean]("len_ok"))).toMap
    assert(recs.keySet == Set(0L, 1L, 2L))
    assert(recs(0L) == ((0L, "gz alpha", 8L, true)), "refetch must not displace f0")
    // byte framing: the non-ASCII body declares its UTF-8 BYTE count
    val bodyBytes = "gz béta — non-ASCII".getBytes("UTF-8").length.toLong
    assert(recs(1L) == ((0L, "gz béta — non-ASCII", bodyBytes, true)))
    val seen = WetStream.sightings(spark, work).collect()
      .map(r => r.getAs[String]("uri") -> r.getAs[Long]("n_seen")).toMap
    assert(seen("https://example.com/d/0") == 2L)
    assert(seen("https://example.com/d/1") == 1L)
  }

  test("compact folds registry/seen/records; reads answer the same after") {
    val work = tmp("wetspec_compact")
    def batchOf(fileId: Long, docs: Seq[(Long, String)]) =
      Crawl.plantWet(docs.toDF("doc_id", "text"), "doc_id", "text", files = 1)
        .select(lit(fileId).as("file_id"), col("wet"))
    val parse = Crawl.wetParse(_: org.apache.spark.sql.DataFrame, "file_id", "wet")
    WetStream.ingestBatch(work, parse)(batchOf(0L, Seq(0L -> "a", 1L -> "b")), 0L)
    WetStream.ingestBatch(work, parse)(batchOf(1L, Seq(0L -> "a", 2L -> "c")), 1L)
    WetStream.ingestBatch(work, parse)(batchOf(2L, Seq(2L -> "c", 3L -> "d")), 2L)
    def snapshot() = (
      WetStream.records(spark, work).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("file_id"),
          r.getAs[String]("body"))).toSet,
      WetStream.sightings(spark, work).collect()
        .map(r => (r.getAs[String]("uri"), r.getAs[Long]("n_seen"))).toSet)
    val before = snapshot()
    assert(before._1 == Set((0L, 0L, "a"), (1L, 0L, "b"), (2L, 1L, "c"),
      (3L, 2L, "d")))
    // checkpoint committed past batches 0 and 1 → fold them, keep batch 2
    WetStream.compact(spark, work, upToBatch = 2L)
    assert(snapshot() == before, "compaction must not change any answer")
    def dirs(sub: String) =
      new java.io.File(s"$work/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).toSet
    assert(dirs("records") == Set("batch=-1", "batch=2"))
    assert(dirs("seen") == Set("batch=-1", "batch=2"))
    assert(dirs("registry") == Set("batch=-1", "batch=2"))
    // a later batch still dedups against the folded registry
    WetStream.ingestBatch(work, parse)(batchOf(3L, Seq(0L -> "a", 4L -> "e")), 3L)
    val after = snapshot()
    assert(after._1 == before._1 + ((4L, 3L, "e")),
      "refetched uri 0 must stay deduped by the compacted registry")
    assert(after._2.toMap.apply("https://example.com/d/0") == 3L)
    // idempotent: a second fold over everything still answers the same
    WetStream.compact(spark, work, upToBatch = 4L)
    assert(snapshot() == after)
  }
}

package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** The incremental MinHash/LSH near-dup leg (VERDICT r05 #1): per-row
  * signature parity with the batch operators, first-arrival-wins dropping
  * across micro-batches in either order, chain transitivity through the
  * registry, hot-bucket capping, idempotent re-delivery, and survivor
  * equivalence with the batch Dedup.dropNearDuplicates on a planted corpus.
  */
class NearDupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Docs with zero pairwise overlap: every token is unique to its doc. */
  private def uniqueDoc(i: Long): String =
    (0 until 9).map(w => s"tok${i}w$w").mkString(" ")

  private val marker = " near dup marker"

  test("minhashExpr/bandStructsExpr produce the batch operators' exact signatures") {
    val docs = Seq((1L, uniqueDoc(1)), (2L, uniqueDoc(2) + marker), (3L, ""))
      .toDF("doc_id", "text")
    val k = 16
    val batchBands = Dedup.bandSignatures(
      Dedup.minhashSignatures(docs, "doc_id", "text", k), "doc_id", k, 4)
      .select("doc_id", "band", "sig").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val perRow = docs
      .select(col("doc_id"), graft.functions.Text.tokens(col("text")).as("__toks"))
      .select(col("doc_id"), Dedup.minhashExpr(col("__toks"), k).as("__mh"))
      .select(col("doc_id"), explode(Dedup.bandStructsExpr(col("__mh"), k, 4)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(perRow == batchBands,
      "per-row signature expressions diverged from the batch explode+agg form")
  }

  /** bands = k (r = 1) everywhere in this spec: a pair collides when ANY
    * minhash agrees, the same recall-guarantee banding the planted batch
    * oracles use (dedup_near_recall) — with the default 4×4 banding a
    * 0.7-Jaccard planted pair only bands together with p ≈ 0.67.
    */
  private def drainAndCollect(batches: Seq[Seq[(Long, String)]],
                              maxBucket: Int = 10000): Set[Long] = {
    implicit val ctx = spark.sqlContext
    val work = tmp("graft_nds_work")
    val cp = tmp("graft_nds_cp")
    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.writer(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", work, cp, threshold = 0.5, bands = 16,
      maxBucket = maxBucket)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    NearDupStream.survivors(spark, work).select("doc_id")
      .as[Long].collect().toSet
  }

  test("a cross-batch near-dup is dropped regardless of arrival order") {
    val a = uniqueDoc(1)
    val copy = a + marker
    val bystander = uniqueDoc(9)
    // original first: the copy (later arrival) is dropped
    assert(drainAndCollect(Seq(Seq(1L -> a, 9L -> bystander), Seq(2L -> copy)))
      == Set(1L, 9L))
    // copy first: first arrival wins, the original is the one dropped
    assert(drainAndCollect(Seq(Seq(2L -> copy), Seq(1L -> a, 9L -> bystander)))
      == Set(2L, 9L))
  }

  test("a chain verifies against a DROPPED doc through the registry") {
    val a = uniqueDoc(1)
    val b = a + marker          // ≈ a → dropped in batch 2
    val c = a + marker + marker // ≈ b (and a) → must drop even though b did
    assert(drainAndCollect(Seq(Seq(1L -> a), Seq(2L -> b), Seq(3L -> c)))
      == Set(1L))
  }

  test("hot-bucket cap bounds pairing and state instead of exploding") {
    // four identical docs: all bands collide. cap=2 → docs 1,2 pair
    // (2 dropped against 1); docs 3,4 arrive to a full bucket, gain no
    // partners, and survive unverified — bounded state, bounded pairs
    val d = uniqueDoc(1)
    assert(drainAndCollect(
      Seq(Seq(1L -> d, 2L -> d, 3L -> d, 4L -> d)), maxBucket = 2)
      == Set(1L, 3L, 4L))
  }

  test("an over-cap doc redelivered in a later batch is not written twice") {
    // cap=1: doc 1 records, doc 2 arrives over-cap (unrecorded in state),
    // then the source redelivers doc 2 — the registry guard must keep it
    // from landing in clean/ twice (over-cap ids bypass the state dedup)
    val d = uniqueDoc(1)
    implicit val ctx = spark.sqlContext
    val work = tmp("graft_nds_rd")
    val cp = tmp("graft_nds_rdcp")
    val input = MemoryStream[(Long, String)]
    val q = NearDupStream.writer(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", work, cp, threshold = 0.5, bands = 16, maxBucket = 1)
      .start()
    try {
      input.addData(1L -> d); q.processAllAvailable()
      input.addData(2L -> d); q.processAllAvailable()
      input.addData(2L -> d); q.processAllAvailable()
    } finally q.stop()
    val rows = NearDupStream.survivors(spark, work)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(rows == Seq(1L, 2L))
  }

  test("compact folds registry/clean; survivors and cross-batch dedup unchanged") {
    val work = tmp("graft_nds_cmp")
    def batchOf(rows: (Long, String, Seq[Long])*) =
      rows.toSeq.toDF("doc_id", "text", "partners")
    NearDupStream.verifyAndAppend(work, 0.5, 3)(
      batchOf((1L, uniqueDoc(1), Nil)), 0L)
    NearDupStream.verifyAndAppend(work, 0.5, 3)(
      batchOf((2L, uniqueDoc(2), Nil)), 1L)
    val before = NearDupStream.survivors(spark, work)
      .select("doc_id").as[Long].collect().toSet
    assert(before == Set(1L, 2L))
    NearDupStream.compact(spark, work, upToBatch = 2L)
    assert(NearDupStream.survivors(spark, work)
      .select("doc_id").as[Long].collect().toSet == before)
    def dirs(sub: String) =
      new java.io.File(s"$work/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("batch=")).toSet
    assert(dirs("registry") == Set("batch=-1") && dirs("clean") == Set("batch=-1"))
    // the folded registry still guards a redelivery AND still serves the
    // pruned verify read for a near-dup of a folded doc
    NearDupStream.verifyAndAppend(work, 0.5, 3)(
      batchOf((1L, uniqueDoc(1), Nil)), 2L)
    NearDupStream.verifyAndAppend(work, 0.5, 3)(
      batchOf((7L, uniqueDoc(1) + marker, Seq(1L))), 3L)
    assert(NearDupStream.survivors(spark, work)
      .select("doc_id").as[Long].collect().toSet == before,
      "redelivery and folded-registry near-dup must both stay dropped")
  }

  test("survivors equal batch dropNearDuplicates on an ascending-id planted corpus") {
    val originals = (0L until 20L).map(i => i -> uniqueDoc(i))
    val copies = (0L until 10L).map(i => (i + 100L) -> (uniqueDoc(i) + marker))
    val corpus = (originals ++ copies).sortBy(_._1)
    // ascending-id arrival split across three micro-batches
    val streamed = drainAndCollect(Seq(
      corpus.slice(0, 10), corpus.slice(10, 20), corpus.slice(20, 30)))
    val batchKept = Dedup.dropNearDuplicates(
      corpus.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.5,
      bands = 16)
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == batchKept,
      s"stream survivors $streamed != batch survivors $batchKept")
    assert(batchKept == (0L until 20L).toSet, "every planted copy must drop")
    Dedup.clearCaches()
  }

  test("bounded mode: expired buckets are evicted; live buckets arm their TTL") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // a bucket whose watermark deadline passed: removed, nothing emitted
    val timedOut = TestGroupState.create[BucketState](
      Optional.of(BucketState(Vector(1L, 2L), 0L)),
      GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(500L), hasTimedOut = true)
    val out = NearDupStream.bucketUpdate(10, Some(60000L))(
      (0, 42L), Iterator.empty, timedOut)
    assert(out.isEmpty && timedOut.isRemoved,
      "an expired bucket must be dropped without emitting")
    // a live arrival arms the timeout at newest event time + ttl
    val live = TestGroupState.create[BucketState](
      Optional.empty[BucketState], GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(500L), hasTimedOut = false)
    val emitted = NearDupStream.bucketUpdate(10, Some(60000L))(
      (0, 42L),
      Iterator(BandedDoc(0, 42L, 7L, "doc", new java.sql.Timestamp(5000L))),
      live).toSeq
    assert(emitted.map(_.doc_id) == Seq(7L))
    assert(live.getTimeoutTimestampMs.get() == 65000L,
      s"ttl must arm at newest event + ttl, got ${live.getTimeoutTimestampMs}")
    assert(live.get.ids == Vector(7L))
    // an out-of-order (watermark-valid) late arrival must NOT pull the
    // eviction deadline earlier (code-review r6)
    val late = TestGroupState.create[BucketState](
      Optional.of(BucketState(Vector(7L), 5000L)),
      GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(500L), hasTimedOut = false)
    NearDupStream.bucketUpdate(10, Some(60000L))(
      (0, 42L),
      Iterator(BandedDoc(0, 42L, 8L, "late doc", new java.sql.Timestamp(3000L))),
      late).toSeq
    assert(late.getTimeoutTimestampMs.get() == 65000L,
      s"late arrival shrank the TTL: ${late.getTimeoutTimestampMs}")
    assert(late.get.newestMs == 5000L)
  }

  test("bounded mode drops a within-horizon cross-batch near-dup end-to-end") {
    implicit val ctx = spark.sqlContext
    val work = tmp("graft_nds_bwork")
    val cp = tmp("graft_nds_bcp")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = NearDupStream.candidatesBounded(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", watermark = "1 hour", ttlMs = 3600 * 1000L,
      bands = 16)
      .toDF()
      .writeStream.outputMode("update")
      .option("checkpointLocation", cp)
      .foreachBatch(NearDupStream.verifyAndAppend(work, 0.5, 3) _)
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
      val t1 = java.sql.Timestamp.valueOf("2026-01-01 10:30:00")
      input.addData((1L, uniqueDoc(1), t0), (9L, uniqueDoc(9), t0))
      q.processAllAvailable()
      input.addData((2L, uniqueDoc(1) + marker, t1)) // within horizon
      q.processAllAvailable()
    } finally q.stop()
    assert(NearDupStream.survivors(spark, work).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 9L))
  }

  test("bounded mode survives null event times (dropped before state)") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    // unit level: a null-ts arrival reaching bucketUpdate folds to the
    // prior deadline instead of NPEing (ADVICE r06)
    val st = TestGroupState.create[BucketState](
      Optional.of(BucketState(Vector(1L), 5000L)),
      GroupStateTimeout.EventTimeTimeout,
      1000L, Optional.of(500L), hasTimedOut = false)
    NearDupStream.bucketUpdate(10, Some(60000L))(
      (0, 42L), Iterator(BandedDoc(0, 42L, 2L, "doc", null)), st).toSeq
    assert(st.getTimeoutTimestampMs.get() == 65000L && st.get.newestMs == 5000L,
      "null event time must fall back to the prior bucket deadline")
    // end-to-end: a null-ts row cannot enter the watermarked state stage,
    // but it must NOT silently vanish — writerBounded routes it around
    // the stateful operator to the sink unpaired (kept, like a hot-bucket
    // overflow doc), while valid rows still dedup
    implicit val ctx = spark.sqlContext
    val work = tmp("graft_nds_nullts")
    val cp = tmp("graft_nds_nullts_cp")
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = NearDupStream.writerBounded(
      input.toDF().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", watermark = "1 hour", ttlMs = 3600 * 1000L,
      work, cp, threshold = 0.5, bands = 16)
      .start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
      input.addData((1L, uniqueDoc(1), t0), (5L, uniqueDoc(5), null))
      q.processAllAvailable()
      input.addData((2L, uniqueDoc(1) + marker, t0))
      q.processAllAvailable()
    } finally q.stop()
    assert(NearDupStream.survivors(spark, work).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 5L),
      "null-ts doc must be KEPT (routed unpaired); valid near-dup still dedups")
  }

  test("the per-batch registry read is pruned to partner ids") {
    val reg = tmp("graft_nds_reg") + "/registry"
    (0L until 1000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .write.parquet(reg)
    // small partner set: the id filter is pushed into the parquet scan
    val small = NearDupStream.prunedRegistry(spark, reg, Array(3L, 7L))
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("PushedFilters") && smallPlan.contains("In(doc_id"),
      s"expected an In(doc_id) pushed into the scan:\n$smallPlan")
    assert(small.select("doc_id").as[Long].collect().toSet == Set(3L, 7L))
    // large partner set: broadcast left-semi join, still no corpus shuffle
    val big = NearDupStream.prunedRegistry(spark, reg, (0L until 20000L).toArray)
    val bigPlan = big.queryExecution.executedPlan.toString
    assert(bigPlan.contains("LeftSemi") && bigPlan.contains("Broadcast"),
      s"expected a broadcast left-semi prune:\n$bigPlan")
    assert(big.count() == 1000L)
    // no partners: nothing is read at all
    assert(NearDupStream.prunedRegistry(spark, reg, Array.empty).count() == 0L)
  }

  test("a replayed batch id rewrites the same files (idempotent sink)") {
    val work = tmp("graft_nds_idem")
    val batch = Seq((1L, uniqueDoc(1)), (2L, uniqueDoc(1) + marker))
      .toDF("doc_id", "text")
      .withColumn("partners",
        when(col("doc_id") === 2L, array(lit(1L)))
          .otherwise(array().cast("array<bigint>")))
    NearDupStream.verifyAndAppend(work, 0.5, 3)(batch, 7L)
    NearDupStream.verifyAndAppend(work, 0.5, 3)(batch, 7L) // replay
    assert(NearDupStream.survivors(spark, work).select("doc_id")
      .as[Long].collect().toSet == Set(1L))
    assert(spark.read.parquet(s"$work/registry").count() == 2L)
  }
}

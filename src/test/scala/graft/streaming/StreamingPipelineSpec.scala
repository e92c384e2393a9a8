package graft.streaming

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.transform.Kpis

/** ST1/ST2/ST4/ST5/ST7 end-to-end: file-arrival stream → cumulative KPI
  * aggregation → idempotent upsert sink, with the checkpoint providing
  * exactly-once over files (SURVEY.md §5.4).
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Land a frame as ONE complete parquet file inside `dir` (the file
    * source needs whole files appearing atomically, like S3 uploads).
    */
  private def landFile(df: DataFrame, dir: String, name: String): Unit = {
    val stage = tmp("graft_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = Files.list(Paths.get(stage)).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.createDirectories(Paths.get(dir))
    Files.move(part, Paths.get(dir, name + ".parquet"))
  }

  private def enrichedRows(rows: Seq[(String, java.sql.Date, Double, Boolean)]): DataFrame =
    rows.toDF("category", "order_date", "sale_price", "is_returned")

  private def drain(inputDir: String, targetDir: String, checkpoint: String): Unit = {
    val stream = spark.readStream
      .schema(enrichedRows(Seq.empty).schema)
      .parquet(inputDir)
    val q = StreamingPipeline.categoryKpiWriter(stream, targetDir, checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  // (category, day) → (daily_revenue, avg_order_value, avg_return_rate)
  private def kpiMap(df: DataFrame): Map[(String, String), (Double, Double, Double)] =
    df.collect().map(r => (r.getString(0), r.getDate(1).toString) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

  private def readTarget(targetDir: String) =
    kpiMap(spark.read.parquet(targetDir + "/data"))

  test("streaming KPIs equal the batch computation and re-draining is a no-op") {
    val (in, out, cp) = (tmp("graft_in"), tmp("graft_out"), tmp("graft_cp"))
    val d1 = java.sql.Date.valueOf("2024-01-01")

    landFile(enrichedRows(Seq(
      ("toys", d1, 10.0, false), ("toys", d1, 30.0, true),
      ("books", d1, 5.0, false))), in, "f1")
    drain(in, out, cp)

    val after1 = readTarget(out)
    assert(after1(("toys", "2024-01-01")) == (40.0, 20.0, 0.5))
    assert(after1(("books", "2024-01-01")) == (5.0, 5.0, 0.0))

    // ST2: nothing new → second drain must not change the table
    drain(in, out, cp)
    assert(readTarget(out) == after1)

    // ST5: a late file updates the cumulative aggregate for existing keys
    landFile(enrichedRows(Seq(
      ("toys", d1, 60.0, false))), in, "f2")
    drain(in, out, cp)
    val after2 = readTarget(out)
    assert(after2(("toys", "2024-01-01")) == (100.0, 100.0 / 3, 1.0 / 3))
    assert(after2(("books", "2024-01-01")) == (5.0, 5.0, 0.0)) // untouched key kept

    // batch parity: the streamed table equals the batch KPI over all files
    assert(after2 == kpiMap(Kpis.categoryKpis(spark.read.parquet(in))))
  }

  test("partitioned KPI writer equals the whole-table writer and the batch result") {
    import org.apache.spark.sql.functions.col
    val (in, out, cp) = (tmp("graft_pin"), tmp("graft_pout2"), tmp("graft_pcp"))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    landFile(enrichedRows(Seq(
      ("toys", d1, 10.0, false), ("toys", d2, 30.0, true),
      ("books", d1, 5.0, false))), in, "f1")
    def drainP(): Unit = {
      val stream = spark.readStream
        .schema(enrichedRows(Seq.empty).schema).parquet(in)
      val q = StreamingPipeline.categoryKpiWriterPartitioned(stream, out, cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainP()
    // second file touches ONLY d2 — the d1 partitions must survive the
    // partial merge untouched
    landFile(enrichedRows(Seq(("toys", d2, 60.0, false))), in, "f2")
    drainP()
    // order_date partition dirs come back typed — normalize via the shared map
    val got = spark.read.parquet(out + "/data")
      .select("category", "order_date", "daily_revenue", "avg_order_value", "avg_return_rate")
      .collect().map(r => (r.getString(0), r.get(1).toString) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == kpiMap(Kpis.categoryKpis(spark.read.parquet(in))))
    // the table really is laid out by date partition
    assert(new java.io.File(out + "/data/order_date=2024-01-01").isDirectory)
  }

  test("upsertBatch recovers the table from a backup left by a crashed swap") {
    val out = tmp("graft_recover")
    val b1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    StreamingPipeline.upsertBatch(out, Seq("k"))(b1, 0L)
    // simulate a crash between rename(cur, bak) and rename(tmp, cur):
    // the table exists only as _bak_1
    val data = new java.io.File(out, "data")
    assert(data.renameTo(new java.io.File(out, "_bak_1")))
    // next batch must restore the backup and merge against it
    val b2 = Seq((2L, 21.0), (3L, 30.0)).toDF("k", "v")
    StreamingPipeline.upsertBatch(out, Seq("k"))(b2, 2L)
    val table = spark.read.parquet(out + "/data")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(table == Set((1L, 10.0), (2L, 21.0), (3L, 30.0)))
  }

  test("partitioned upsert restores a partition stranded in a _bak_ dir by a crashed swap") {
    val out = tmp("graft_precover")
    val b1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0))
      .toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b1, 0L)

    // simulate a crash between rename(dest, bak) and rename(staged, dest):
    // the 2024-01-02 partition survives only in _bak_1_day=2024-01-02
    val part = new java.io.File(out + "/data/day=2024-01-02")
    assert(part.renameTo(new java.io.File(out, "_bak_1_day=2024-01-02")))

    // replayed batch touches only the OTHER partition — recovery must still
    // put 2024-01-02 back before the merge reads the table
    val b2 = Seq(("2024-01-01", 1L, 11.0)).toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b2, 1L)

    val table = spark.read.parquet(out + "/data")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2).toString)).toSet
    assert(table == Set((1L, 11.0, "2024-01-01"), (2L, 20.0, "2024-01-02")))
    assert(!new java.io.File(out, "_bak_1_day=2024-01-02").exists())
  }

  test("a completed-swap partition backup is dropped, not restored over new data") {
    val out = tmp("graft_pdone")
    val b1 = Seq(("2024-01-01", 1L, 10.0)).toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b1, 0L)
    // simulate a crash AFTER rename(staged, dest) but before delete(bak):
    // dest holds the merged data, the backup holds the stale pre-merge rows
    val stale = tmp("graft_stale")
    Seq(("2024-01-01", 1L, -99.0)).toDF("day", "k", "v")
      .write.parquet(stale + "/p")
    val bak = new java.io.File(out, "_bak_0_day=2024-01-01")
    assert(new java.io.File(stale, "p").renameTo(bak))

    val b2 = Seq(("2024-01-01", 2L, 20.0)).toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b2, 1L)
    val table = spark.read.parquet(out + "/data")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(table == Set((1L, 10.0), (2L, 20.0))) // stale -99 never resurfaces
    assert(!bak.exists())
  }

  test("a partition backup is never promoted to be the whole table") {
    val out = tmp("graft_pwhole")
    val b1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0))
      .toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b1, 0L)
    // worst case: the data dir is gone AND a partition backup lingers —
    // recoverBackup must not rename the partition backup to be `data`
    val data = new java.io.File(out, "data")
    val part = new java.io.File(data, "day=2024-01-02")
    assert(part.renameTo(new java.io.File(out, "_bak_1_day=2024-01-02")))
    assert(new java.io.File(data, "day=2024-01-01")
      .renameTo(new java.io.File(out, "day=2024-01-01_detached")))
    data.delete()

    val b2 = Seq(("2024-01-01", 1L, 11.0)).toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b2, 1L)
    // the partition backup came back as a PARTITION (under data/), not as
    // the table root
    val table = spark.read.parquet(out + "/data")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2).toString)).toSet
    assert(table == Set((1L, 11.0, "2024-01-01"), (2L, 20.0, "2024-01-02")))
  }

  test("partition-aware upsert rewrites only touched partitions") {
    import org.apache.spark.sql.functions.col
    val out = tmp("graft_pout")
    val b1 = Seq(("2024-01-01", 1L, 10.0), ("2024-01-02", 2L, 20.0))
      .toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b1, 0L)

    // note which files back the untouched partition
    val d2dir = new java.io.File(out + "/data/day=2024-01-02")
    val d2files = d2dir.listFiles().map(_.getName).toSet

    // batch 2 touches only 2024-01-01: update k=1, insert k=3
    val b2 = Seq(("2024-01-01", 1L, 11.0), ("2024-01-01", 3L, 30.0))
      .toDF("day", "k", "v")
    StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(b2, 1L)

    // partition-type inference reads day= back as DATE → compare as string
    val table = spark.read.parquet(out + "/data")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2).toString)).toSet
    assert(table == Set((1L, 11.0, "2024-01-01"), (3L, 30.0, "2024-01-01"),
      (2L, 20.0, "2024-01-02")))
    // the 2024-01-02 partition's files were not rewritten
    assert(d2dir.listFiles().map(_.getName).toSet == d2files)
  }

  // ---- streaming daily KPIs (VERDICT r04 #1: the second KPI table) ----

  private def enrichedOrderRows(
      rows: Seq[(String, Long, Long, Double, Boolean, java.sql.Date)]): DataFrame =
    rows.toDF("order_id", "user_id", "product_id", "sale_price",
      "is_returned", "order_date")

  private def dailyMap(df: DataFrame): Map[String, (Long, Double, Long, Double, Long)] =
    df.select("order_date", "total_orders", "total_revenue",
        "total_items_sold", "return_rate", "unique_customers")
      .collect().map(r => r.get(0).toString ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toMap

  test("streaming daily KPIs equal the exact batch computation cumulatively") {
    val (in, out, cp) = (tmp("graft_din"), tmp("graft_dout"), tmp("graft_dcp"))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    def drainD(): Unit = {
      val stream = spark.readStream
        .schema(enrichedOrderRows(Seq.empty).schema).parquet(in)
      val q = StreamingPipeline.dailyKpiWriter(stream, out, cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    landFile(enrichedOrderRows(Seq(
      ("o1", 1L, 10L, 10.0, false, d1),
      ("o1", 1L, 11L, 30.0, true, d1),   // same order, second item
      ("o2", 2L, 10L, 5.0, false, d1),
      ("o3", 1L, 12L, 7.0, false, d2))), in, "f1")
    drainD()
    // HLL++ is exact at these cardinalities (sparse mode), so the streamed
    // sketch columns must EQUAL the batch countDistinct, not just approach it
    assert(dailyMap(spark.read.parquet(out + "/data")) ==
      dailyMap(Kpis.dailyKpis(spark.read.parquet(in))))

    // ST5: a late file revises d1 (new order, NEW user) — cumulative
    // aggregates restate, untouched d2 row survives the upsert
    landFile(enrichedOrderRows(Seq(
      ("o4", 3L, 10L, 20.0, false, d1))), in, "f2")
    drainD()
    val after = dailyMap(spark.read.parquet(out + "/data"))
    assert(after == dailyMap(Kpis.dailyKpis(spark.read.parquet(in))))
    assert(after("2024-01-01") == (3L, 65.0, 4L, 1.0 / 3, 3L))
    assert(after("2024-01-02") == (1L, 7.0, 1L, 0.0, 1L))
  }

  test("partitioned daily KPI writer lays the table out by day and matches batch") {
    val (in, out, cp) = (tmp("graft_dpin"), tmp("graft_dpout"), tmp("graft_dpcp"))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    landFile(enrichedOrderRows(Seq(
      ("o1", 1L, 10L, 10.0, false, d1),
      ("o2", 2L, 11L, 30.0, true, d2))), in, "f1")
    val stream = spark.readStream
      .schema(enrichedOrderRows(Seq.empty).schema).parquet(in)
    val q = StreamingPipeline.dailyKpiWriterPartitioned(stream, out, cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(dailyMap(spark.read.parquet(out + "/data")) ==
      dailyMap(Kpis.dailyKpis(spark.read.parquet(in))))
    assert(new java.io.File(out + "/data/order_date=2024-01-01").isDirectory)
  }

  test("EXACT streaming daily KPIs equal the batch computation bit-for-bit, cumulatively") {
    val (in, out, cp) = (tmp("graft_ein"), tmp("graft_eout"), tmp("graft_ecp"))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    def drainE(): Unit = {
      val stream = spark.readStream
        .schema(enrichedOrderRows(Seq.empty).schema).parquet(in)
      val q = StreamingPipeline.dailyKpiWriterExact(stream, out, cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    landFile(enrichedOrderRows(Seq(
      ("o1", 1L, 10L, 10.0, false, d1),
      ("o1", 1L, 11L, 30.0, true, d1),
      ("o2", 2L, 10L, 5.0, false, d1),
      ("o3", 1L, 12L, 7.0, false, d2))), in, "f1")
    drainE()
    assert(dailyMap(spark.read.parquet(out + "/data")) ==
      dailyMap(Kpis.dailyKpis(spark.read.parquet(in))))
    // late revision: o1 re-keyed user? no — new order+user on d1, and a
    // duplicate ORDER id on d2 (distinct must not double count it)
    landFile(enrichedOrderRows(Seq(
      ("o4", 3L, 10L, 20.0, false, d1),
      ("o3", 1L, 13L, 2.0, true, d2))), in, "f2")
    drainE()
    val after = dailyMap(spark.read.parquet(out + "/data"))
    assert(after == dailyMap(Kpis.dailyKpis(spark.read.parquet(in))))
    assert(after("2024-01-02") == (1L, 9.0, 2L, 1.0, 1L))
  }

  test("kpiWriters drains BOTH reference KPI tables from one enriched stream") {
    val (in, outC, outD, cp) =
      (tmp("graft_kin"), tmp("graft_kcat"), tmp("graft_kday"), tmp("graft_kcp"))
    val d1 = java.sql.Date.valueOf("2024-01-01")
    landFile(Seq(
      ("o1", 1L, 10L, "toys", 10.0, false, d1),
      ("o2", 2L, 11L, "books", 5.0, true, d1))
      .toDF("order_id", "user_id", "product_id", "category",
        "sale_price", "is_returned", "order_date"), in, "f1")
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema).parquet(in)
    val (cat, day) = StreamingPipeline.kpiWriters(stream, outC, outD, cp,
      exactDaily = true)
    val qc = cat.trigger(Trigger.AvailableNow()).start()
    val qd = day.trigger(Trigger.AvailableNow()).start()
    qc.awaitTermination(); qd.awaitTermination()
    val batch = spark.read.parquet(in)
    assert(kpiMap(spark.read.parquet(outC + "/data")) ==
      kpiMap(Kpis.categoryKpis(batch)))
    assert(dailyMap(spark.read.parquet(outD + "/data")) ==
      dailyMap(Kpis.dailyKpis(batch)))
  }

  test("st_daily_kpis registered query: every comparison flag true on testdata") {
    // the driver-oracle shape: real partitioned streaming writer vs the
    // exact batch dailyKpis — exact columns equal, sketch columns within 5%
    val rows = graft.SparkEntry.queries("st_daily_kpis")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (1 to 5).forall(r.getBoolean)),
      "a streamed daily KPI diverged from the batch computation")
  }

  // ---- writer-concurrency fencing (VERDICT r04 #4) ----

  private def writeLock(out: String, pid: Long, host: String, ts: Long): java.io.File = {
    new java.io.File(out).mkdirs()
    val lock = new java.io.File(out, "_writer_lock")
    java.nio.file.Files.writeString(lock.toPath, s"pid=$pid host=$host ts=$ts\n")
    lock
  }

  test("snapshot streaming writers drain to the same tables as the rename-swap ones") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = "/root/testdata/sf0.001"
    val enr = Kpis.enrich(
      graft.sources.TestdataAdapter.orders(spark, dir),
      graft.sources.TestdataAdapter.orderItems(spark, dir),
      graft.sources.TestdataAdapter.products(spark, dir))
      .select("order_id", "user_id", "product_id", "category", "sale_price",
        "is_returned", "order_date")
    val stage = tmp("graft_snapw_in")
    enr.write.mode("overwrite").parquet(stage)
    def drain(mk: (org.apache.spark.sql.DataFrame, String, String) =>
        org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
              out: String): Unit = {
      val stream = spark.readStream
        .schema(spark.read.parquet(stage).schema).parquet(stage)
      val q = mk(stream, out, tmp("graft_snapw_cp"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val catOut = tmp("graft_snapw_cat")
    drain(StreamingPipeline.categoryKpiWriterSnapshot, catOut)
    def catRows(df: org.apache.spark.sql.DataFrame) =
      df.select("category", "order_date", "daily_revenue").collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2))).toSet
    assert(catRows(StreamingPipeline.readSnapshot(spark, catOut))
      == catRows(Kpis.categoryKpis(enr)))
    val dayOut = tmp("graft_snapw_day")
    drain(StreamingPipeline.dailyKpiWriterPartitionedSnapshot, dayOut)
    // sketch-based daily stream: compare the exact columns
    def dayRows(df: org.apache.spark.sql.DataFrame) =
      df.select("order_date", "total_revenue", "total_items_sold").collect()
        .map(r => (r.getDate(0).toString, r.getDouble(1), r.getLong(2))).toSet
    assert(dayRows(StreamingPipeline.readPartitionedSnapshot(spark, dayOut))
      == dayRows(Kpis.dailyKpis(enr)))
  }

  test("a second concurrent writer fails fast instead of interleaving swaps") {
    val out = tmp("graft_lock1")
    val b = Seq((1L, 10.0)).toDF("k", "v")
    // a LIVE concurrent writer: the lock names this very (alive) process
    val lock = writeLock(out, ProcessHandle.current().pid(),
      java.net.InetAddress.getLocalHost.getHostName, System.currentTimeMillis())
    val e = intercept[IllegalStateException] {
      StreamingPipeline.upsertBatch(out, Seq("k"))(b, 0L)
    }
    assert(e.getMessage.contains("another writer"))
    assert(!new java.io.File(out, "data").exists()) // loser wrote nothing
    // same contract on the partitioned path
    val bp = Seq(("2024-01-01", 1L, 10.0)).toDF("day", "k", "v")
    intercept[IllegalStateException] {
      StreamingPipeline.upsertPartitionedBatch(out, Seq("k"), "day")(bp, 0L)
    }
    lock.delete()
    StreamingPipeline.upsertBatch(out, Seq("k"))(b, 0L) // released → proceeds
    assert(spark.read.parquet(out + "/data").count() == 1)
    assert(!new java.io.File(out, "_writer_lock").exists()) // released after the batch
  }

  test("locks from crashed writers are broken: dead pid on this host, stale foreign host") {
    val host = java.net.InetAddress.getLocalHost.getHostName
    val b = Seq((1L, 10.0)).toDF("k", "v")
    // dead-pid lock (pid 2^31-1 exceeds linux pid_max — provably not alive)
    val out1 = tmp("graft_lock2")
    writeLock(out1, Int.MaxValue.toLong, host, System.currentTimeMillis())
    StreamingPipeline.upsertBatch(out1, Seq("k"))(b, 0L)
    assert(spark.read.parquet(out1 + "/data").count() == 1)
    // stale foreign-host lock (older than the 10-minute staleness bound)
    val out2 = tmp("graft_lock3")
    writeLock(out2, 1L, "some-other-host", System.currentTimeMillis() - 11 * 60 * 1000L)
    StreamingPipeline.upsertBatch(out2, Seq("k"))(b, 0L)
    assert(spark.read.parquet(out2 + "/data").count() == 1)
    // fresh foreign-host lock: held — must fail fast
    val out3 = tmp("graft_lock4")
    writeLock(out3, 1L, "some-other-host", System.currentTimeMillis())
    intercept[IllegalStateException] {
      StreamingPipeline.upsertBatch(out3, Seq("k"))(b, 0L)
    }
  }

  test("a corrupt (mid-write-crash) lock is broken after the staleness bound") {
    // code-review r5: an unparseable token has no trustworthy host/ts —
    // age falls back to the FILE mtime so the lock isn't unbreakable forever
    val out = tmp("graft_lockc")
    new java.io.File(out).mkdirs()
    val lock = new java.io.File(out, "_writer_lock")
    java.nio.file.Files.writeString(lock.toPath, "pid=123 ho") // truncated
    assert(lock.setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L))
    val b = Seq((1L, 10.0)).toDF("k", "v")
    StreamingPipeline.upsertBatch(out, Seq("k"))(b, 0L)
    assert(spark.read.parquet(out + "/data").count() == 1)
    // a FRESH corrupt lock still blocks (could be a holder mid-write)
    val out2 = tmp("graft_lockc2")
    new java.io.File(out2).mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(out2, "_writer_lock").toPath, "garbage")
    intercept[IllegalStateException] {
      StreamingPipeline.upsertBatch(out2, Seq("k"))(b, 0L)
    }
  }

  test("a dead holder's RECYCLED pid is still recognized as dead (start-time check)") {
    // the token records the holder's process start time: same pid number,
    // different start → the recorded holder is gone even though the number
    // is alive. Simulate with our own live pid and an impossible start.
    val out = tmp("graft_lockr")
    new java.io.File(out).mkdirs()
    val host = java.net.InetAddress.getLocalHost.getHostName
    // NOT our pid (liveness of another pid + wrong start = recycled);
    // use pid 1 (init — alive on any linux) with a 1970 start time
    java.nio.file.Files.writeString(
      new java.io.File(out, "_writer_lock").toPath,
      s"pid=1 host=$host ts=${System.currentTimeMillis()} start=1000\n")
    val b = Seq((1L, 10.0)).toDF("k", "v")
    StreamingPipeline.upsertBatch(out, Seq("k"))(b, 0L)
    assert(spark.read.parquet(out + "/data").count() == 1)
  }

  test("a LIVE same-host holder is never broken by age (long merges stay fenced)") {
    // code-review r5: age is the cross-host signal only — a same-host lock
    // whose pid is alive must hold even past the staleness bound
    val out = tmp("graft_lock5")
    writeLock(out, ProcessHandle.current().pid(),
      java.net.InetAddress.getLocalHost.getHostName,
      System.currentTimeMillis() - 60 * 60 * 1000L) // an hour-old live lock
    val b = Seq((1L, 10.0)).toDF("k", "v")
    intercept[IllegalStateException] {
      StreamingPipeline.upsertBatch(out, Seq("k"))(b, 0L)
    }
  }

  test("release is ownership-verified: a broken-and-replaced lock is not deleted") {
    // code-review r5: if a breaker replaced our lock while the body ran,
    // our release must leave the successor's lock in place
    val root = new org.apache.hadoop.fs.Path(tmp("graft_lock6"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new java.io.File(root.toString, "_writer_lock")
    StreamingPipeline.withWriterLock(fs, root, 1000L) {
      // simulate a concurrent breaker replacing the lock mid-body
      java.nio.file.Files.writeString(lock.toPath,
        "pid=1 host=other ts=0 nonce=successor\n")
    }
    assert(lock.exists(), "successor's lock was deleted by the broken holder")
    assert(java.nio.file.Files.readString(lock.toPath).contains("successor"))
  }

  test("the holder heartbeat refreshes the token so age measures liveness (ADVICE r5)") {
    val root = new org.apache.hadoop.fs.Path(tmp("graft_lockhb"))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new java.io.File(root.toString, "_writer_lock")
    def tokenTs(): Long =
      java.nio.file.Files.readString(lock.toPath).split("\\s+")
        .collectFirst { case s if s.startsWith("ts=") => s.drop(3).toLong }.get
    val t0 = System.currentTimeMillis()
    StreamingPipeline.withWriterLock(fs, root, staleMs = 2000L) {
      // body runs longer than staleMs: without the heartbeat the token's
      // ts would age out and a cross-host writer would break a LIVE merge
      Thread.sleep(2600L)
      val ts = tokenTs()
      assert(ts > t0 + 1000L,
        s"token ts was never refreshed during a long merge (ts=$ts, t0=$t0)")
      assert(System.currentTimeMillis() - ts < 2000L,
        "refreshed token is still older than staleMs — heartbeat too slow")
    }
    assert(!lock.exists(), "heartbeat holder failed to release its own lock")
  }

  test("lock staleness is configurable via conf and writer parameter (ADVICE r5)") {
    assert(StreamingPipeline.resolveStaleMs(spark, Some(1234L)) == 1234L)
    assert(StreamingPipeline.resolveStaleMs(spark, None) ==
      StreamingPipeline.LockStaleMs)
    spark.conf.set("spark.graft.writerLock.staleMs", "5000")
    try {
      assert(StreamingPipeline.resolveStaleMs(spark, None) == 5000L)
      assert(StreamingPipeline.resolveStaleMs(spark, Some(7L)) == 7L)
      // end-to-end: a foreign-host lock older than the configured bound is
      // broken where the 10-minute default would have blocked
      val out = tmp("graft_lockcfg")
      writeLock(out, 1L, "some-other-host", System.currentTimeMillis() - 60 * 1000L)
      val b = Seq((1L, 10.0)).toDF("k", "v")
      StreamingPipeline.upsertBatch(out, Seq("k"))(b, 0L)
      assert(spark.read.parquet(out + "/data").count() == 1)
    } finally spark.conf.unset("spark.graft.writerLock.staleMs")
  }
}

package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestdataAdapter
import graft.state.SnapshotStore
import graft.transform.Kpis

/** The joint KPI commit (VERDICT r05 #4) and the snapshot pointer store
  * (VERDICT r05 #3): both tables from one stateful operator, one atomic
  * commit point, snapshot-isolated readers, replay idempotence, version
  * reclamation, and bit-exact parity with the batch aggregations.
  */
class JointKpisSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def enrichedTestdata = {
    val dir = "/root/testdata/sf0.001"
    Kpis.enrich(
      TestdataAdapter.orders(spark, dir),
      TestdataAdapter.orderItems(spark, dir),
      TestdataAdapter.products(spark, dir))
  }

  private def catRows(df: org.apache.spark.sql.DataFrame) =
    df.select("category", "order_date", "daily_revenue", "avg_order_value",
      "avg_return_rate")
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3), r.getDouble(4))).toSet

  private def dayRows(df: org.apache.spark.sql.DataFrame) =
    df.select("order_date", "total_orders", "total_revenue",
      "total_items_sold", "return_rate", "unique_customers")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getDouble(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toSet

  test("a pair pinned to an old epoch stays a consistent pair (versionAsOf)") {
    val root = tmp("graft_joint_tt")
    val day0 = java.sql.Date.valueOf("2026-01-01")
    def batchRows(rev: Double) = Seq(
      JointKpiRow("category", day0, Some("cat"), Some(rev), Some(rev),
        Some(0.0), None, None, None, None, None),
      JointKpiRow("daily", day0, None, None, None, None,
        Some(1L), Some(rev), Some(1L), Some(0.0), Some(1L)))
      .toDS().toDF()
    JointKpis.jointSink(root, retainVersions = 3)(batchRows(10.0), 0L)
    JointKpis.jointSink(root, retainVersions = 3)(batchRows(99.0), 1L)
    // current pair sees the upserted epoch; the pinned pair sees epoch 0
    // on BOTH tables — never a mix
    assert(JointKpis.dailyTable(spark, root)
      .select("total_revenue").as[Double].collect().head == 99.0)
    assert(JointKpis.dailyTable(spark, root, Some(0L))
      .select("total_revenue").as[Double].collect().head == 10.0)
    assert(JointKpis.categoryTable(spark, root, Some(0L))
      .select("daily_revenue").as[Double].collect().head == 10.0)
    val e = intercept[IllegalStateException](
      JointKpis.dailyTable(spark, root, Some(42L)).collect())
    assert(e.getMessage.contains("available"), e.getMessage)
  }

  test("JointKpis (batch execution) equals categoryKpis AND dailyKpis bit-for-bit") {
    val joined = enrichedTestdata
    val tagged = JointKpis.stream(joined).toDF()
    assert(catRows(tagged.filter(col("table") === "category"))
      == catRows(Kpis.categoryKpis(joined)))
    assert(dayRows(tagged.filter(col("table") === "daily"))
      == dayRows(Kpis.dailyKpis(joined)))
  }

  test("drained joint writer commits BOTH tables, equal to batch, under one pointer") {
    implicit val ctx = spark.sqlContext
    val joined = enrichedTestdata
      .select("order_id", "user_id", "product_id", "category", "sale_price",
        "is_returned", "order_date").persist()
    val rows = joined.collect()
    val (root, cp) = (tmp("graft_joint"), tmp("graft_joint_cp"))
    val input = MemoryStream[(Long, Long, Long, String, Double, Boolean, java.sql.Date)]
    val stream = input.toDF().toDF("order_id", "user_id", "product_id",
      "category", "sale_price", "is_returned", "order_date")
    val q = JointKpis.writer(stream, root, cp).start()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        input.addData(chunk.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getBoolean(5), r.getDate(6))): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(catRows(JointKpis.categoryTable(spark, root))
      == catRows(Kpis.categoryKpis(joined)))
    assert(dayRows(JointKpis.dailyTable(spark, root))
      == dayRows(Kpis.dailyKpis(joined)))
    // one pointer governs both tables: exactly one committed version dir
    // pair, plus at most its predecessor (reclaim depth 2)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.startsWith("v_"))
    assert(versions.length <= 2, s"reclaim left ${versions.mkString(",")}")
    joined.unpersist()
  }

  test("a crash between version write and pointer flip leaves readers on the old PAIR") {
    val root = tmp("graft_joint_crash")
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cat1 = Seq(("books", "2024-01-01", 1.0)).toDF("category", "order_date", "daily_revenue")
    val day1 = Seq(("2024-01-01", 1L)).toDF("order_date", "total_orders")
    SnapshotStore.commit(fs, rootPath, 1L, Map("category" -> cat1, "daily" -> day1))
    // batch 2 "crashes" after writing its version dirs but BEFORE the
    // pointer flip — simulated by writing the dirs without pointTo
    val cat2 = Seq(("books", "2024-01-01", 2.0)).toDF("category", "order_date", "daily_revenue")
    val day2 = Seq(("2024-01-01", 2L)).toDF("order_date", "total_orders")
    val v2 = SnapshotStore.versionDir(rootPath, 2L)
    cat2.write.mode("overwrite").parquet(new Path(v2, "category").toString)
    day2.write.mode("overwrite").parquet(new Path(v2, "daily").toString)
    // readers still see the COMMITTED pair — batch 1 on both tables
    assert(SnapshotStore.read(spark, root, "category")
      .select("daily_revenue").as[Double].head() == 1.0)
    assert(SnapshotStore.read(spark, root, "daily")
      .select("total_orders").as[Long].head() == 1L)
    // the replayed batch completes the commit: both tables advance TOGETHER
    SnapshotStore.commit(fs, rootPath, 2L, Map("category" -> cat2, "daily" -> day2))
    assert(SnapshotStore.read(spark, root, "category")
      .select("daily_revenue").as[Double].head() == 2.0)
    assert(SnapshotStore.read(spark, root, "daily")
      .select("total_orders").as[Long].head() == 2L)
  }

  test("a replayed batch id is skipped: the committed pair is never re-merged") {
    val root = tmp("graft_joint_replay")
    val batch = JointKpis.stream(enrichedTestdata).toDF().limit(50).persist()
    JointKpis.jointSink(root)(batch, 3L)
    val before = dayRows(JointKpis.dailyTable(spark, root))
    JointKpis.jointSink(root)(batch, 3L) // replay of a committed batch
    JointKpis.jointSink(root)(batch, 2L) // late replay of an older batch
    assert(dayRows(JointKpis.dailyTable(spark, root)) == before)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotStore.currentVersion(fs, new Path(root)).contains(3L))
    batch.unpersist()
  }

  test("manifested joint writer: both tables equal batch, O(touched) versions, one pointer") {
    implicit val ctx = spark.sqlContext
    val joined = enrichedTestdata
      .select("order_id", "user_id", "product_id", "category", "sale_price",
        "is_returned", "order_date").persist()
    val rows = joined.collect()
    val (root, cp) = (tmp("graft_jointm"), tmp("graft_jointm_cp"))
    val input = MemoryStream[(Long, Long, Long, String, Double, Boolean, java.sql.Date)]
    val stream = input.toDF().toDF("order_id", "user_id", "product_id",
      "category", "sale_price", "is_returned", "order_date")
    val q = JointKpis.writerManifested(stream, root, cp).start()
    try {
      rows.grouped(math.max(rows.length / 3, 1)).foreach { chunk =>
        input.addData(chunk.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getBoolean(5), r.getDate(6))): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(catRows(JointKpis.categoryTableManifested(spark, root))
      == catRows(Kpis.categoryKpis(joined)))
    assert(dayRows(JointKpis.dailyTableManifested(spark, root))
      == dayRows(Kpis.dailyKpis(joined)))
    joined.unpersist()
  }

  test("manifested pair: a crash before the pointer leaves BOTH tables on the old epoch") {
    val root = tmp("graft_jointm_crash")
    val batch = JointKpis.stream(enrichedTestdata).toDF().persist()
    try {
      JointKpis.jointSinkManifested(root)(batch, 0L)
      val catBefore = catRows(JointKpis.categoryTableManifested(spark, root))
      val dayBefore = dayRows(JointKpis.dailyTableManifested(spark, root))
      // batch 1 "crashes" after staging data but before the pointer flip:
      // write fresh table dirs under v_1 directly, no pointTo
      val v1 = SnapshotStore.versionDir(new Path(root), 1L)
      batch.filter(col("table") === "category")
        .select("category", "order_date", "daily_revenue")
        .write.mode("overwrite").partitionBy("order_date")
        .parquet(new Path(v1, "category").toString)
      assert(catRows(JointKpis.categoryTableManifested(spark, root)) == catBefore,
        "reader saw an uncommitted epoch")
      assert(dayRows(JointKpis.dailyTableManifested(spark, root)) == dayBefore)
      // the replayed batch completes and the PAIR advances together
      JointKpis.jointSinkManifested(root)(batch, 1L)
      assert(catRows(JointKpis.categoryTableManifested(spark, root)) == catBefore,
        "idempotent upsert of the same rows must not change the answer")
      val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(SnapshotStore.currentVersion(fs, new Path(root)).contains(1L))
      // O(touched): a batch touching ONE day writes only that day's
      // partition for each table in its version dir
      val oneDay = batch.filter(col("order_date") === lit(batch
        .select(max("order_date")).as[java.sql.Date].head()))
      JointKpis.jointSinkManifested(root)(oneDay, 2L)
      val v2daily = new Path(SnapshotStore.versionDir(new Path(root), 2L), "daily")
      val dayDirs = fs.listStatus(v2daily)
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith("order_date="))
      assert(dayDirs.length == 1,
        s"one-day batch rewrote ${dayDirs.length} partitions: ${dayDirs.mkString(",")}")
      // untouched days still resolve (inherited by manifest reference)
      assert(dayRows(JointKpis.dailyTableManifested(spark, root)) == dayBefore)
    } finally batch.unpersist()
  }

  test("a concurrent reader during a commit loop never errors (VERDICT r05 #3)") {
    val root = tmp("graft_snap_reader")
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // seed so the reader always has a committed version
    StreamingPipeline.upsertBatchSnapshot(root, Seq("k"))(
      Seq((0L, 0.0)).toDF("k", "v"), 0L)
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val n = StreamingPipeline.readSnapshot(spark, root).count()
          if (n < 1L) errors.add(new IllegalStateException(s"saw $n rows"))
        } catch { case t: Throwable => errors.add(t) }
      }
    })
    reader.start()
    try {
      (1L to 120L).foreach { i =>
        StreamingPipeline.upsertBatchSnapshot(root, Seq("k"))(
          Seq((i, i * 1.0)).toDF("k", "v"), i)
      }
    } finally { stop = true; reader.join(20000) }
    assert(errors.isEmpty,
      s"reader hit ${errors.size} errors; first: ${Option(errors.peek())}")
    // superseded versions reclaimed: at most current + previous remain
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(new Path(root))
      .map(_.getPath.getName).filter(_.startsWith("v_"))
    assert(versions.length <= 2, s"reclaim left ${versions.length} versions")
    assert(StreamingPipeline.readSnapshot(spark, root).count() == 121L)
  }
}

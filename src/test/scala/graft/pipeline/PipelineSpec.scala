package graft.pipeline

import java.nio.file.Files
import graft.SparkSpec
import graft.state.FileState
import graft.validate.TableRules

/** §7.1 orchestration: validate → gate → transform, plus the processed-file
  * state module (ST2 batch form).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = TableRules(
    table = "orders",
    expectedColumns = Seq("order_id", "user_id", "status", "created_at"),
    uniqueKey = Seq("order_id"),
    requiredColumns = Seq("order_id", "user_id"),
    statusColumn = Some("status"),
    validStatuses = Seq("pending", "shipped"))

  private val ts = java.sql.Timestamp.valueOf("2024-03-05 10:00:00")
  private def orders(status: String) =
    Seq(("o1", "u1", status, ts), ("o2", "u2", "shipped", ts))
      .toDF("order_id", "user_id", "status", "created_at")
  private val items = Seq(("o1", "p1", 10.0, false), ("o1", "p2", 30.0, true),
    ("o2", "p1", 20.0, false)).toDF("order_id", "product_id", "sale_price", "is_returned")
  private val products = Seq(("p1", "toys", "n1", "b1", 9.0), ("p2", "books", "n2", "b2", 29.0))
    .toDF("id", "category", "name", "brand", "retail_price")

  test("clean input passes the gate and produces both KPI frames") {
    val res = Pipeline.run(spark, orders("pending"), items, products,
      Seq((orders("pending"), cfg)), persistJoin = false)
    assert(res.passed)
    val cat = res.categoryKpis.get.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(cat == Map("toys" -> 30.0, "books" -> 30.0))
    val daily = res.dailyKpis.get.collect()
    assert(daily.length == 1 && daily(0).getLong(1) == 2L) // 2 distinct orders
  }

  test("a validation violation fails the gate and skips the transform") {
    val res = Pipeline.run(spark, orders("BOGUS"), items, products,
      Seq((orders("BOGUS"), cfg)), persistJoin = false)
    assert(!res.passed)
    assert(res.categoryKpis.isEmpty && res.dailyKpis.isEmpty)
    assert(res.report.filter($"violation_count" > 0).count() == 1L)
  }

  test("the onResult notify hook fires on the pass branch and on the gate-fail branch") {
    var seen = List.empty[Boolean]
    val ok = Pipeline.run(spark, orders("pending"), items, products,
      Seq((orders("pending"), cfg)), persistJoin = false,
      onResult = r => seen ::= r.passed)
    val bad = Pipeline.run(spark, orders("BOGUS"), items, products,
      Seq((orders("BOGUS"), cfg)), persistJoin = false,
      onResult = r => seen ::= r.passed)
    assert(ok.passed && !bad.passed)
    assert(seen.reverse == List(true, false)) // hook saw both terminal states
  }

  test("FileState: pending diff, mark, save/load roundtrip, idempotent re-run") {
    val dir = Files.createTempDirectory("graft_state").toString + "/state.parquet"
    val s0 = FileState.load(spark, dir)
    assert(s0.isEmpty)

    val arrived = Seq("f1", "f2", "f3").toDF("path")
    val todo1 = FileState.pending(arrived, s0)
    assert(todo1.collect().map(_.getString(0)).toSet == Set("f1", "f2", "f3"))

    FileState.save(FileState.markProcessed(s0, todo1), dir)
    val s1 = FileState.load(spark, dir)
    assert(s1.collect().map(_.getString(0)).toSet == Set("f1", "f2", "f3"))

    // re-run with the same arrivals: nothing pending (exactly-once per file)
    assert(FileState.pending(arrived, s1).isEmpty)

    // a new arrival is the only pending one
    val arrived2 = Seq("f1", "f4").toDF("path")
    assert(FileState.pending(arrived2, s1).collect().map(_.getString(0)).toSeq == Seq("f4"))

    // saving twice is stable
    FileState.save(FileState.markProcessed(s1, FileState.pending(arrived2, s1)), dir)
    assert(FileState.load(spark, dir).count() == 4L)

    // crash simulation: state renamed to its backup name (the window
    // between save()'s two renames) must be restored by load()
    val p = new java.io.File(dir)
    val bak = new java.io.File(p.getParent, s".${p.getName}_bak")
    assert(p.renameTo(bak))
    assert(FileState.load(spark, dir).count() == 4L)
    assert(p.exists() && !bak.exists())
  }
}

package graft.streaming

import graft.SparkSpec
import graft.operators.Passages

/** Streaming passage dedup: per-batch semantics match the incremental
  * batch operator, the registry excludes the current batch on redelivery,
  * and replays are idempotent.
  */
class PassageStreamSpec extends SparkSpec {
  import spark.implicits._

  private def work(): String = graft.util.Scratch.dir("graft_pstest")

  private def clean(workDir: String): Map[Long, String] =
    PassageStream.readClean(spark, workDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

  test("cross-batch registry strip + intra-batch canonical, via the sink") {
    val dirW = work()
    val shared = "k l m n o p"
    val b0 = Seq((1L, s"owner doc with $shared inside it")).toDF("doc_id", "text")
    val b1 = Seq((8L, s"late copy of $shared here"),
      (9L, s"another late $shared copy")).toDF("doc_id", "text")
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(b0, 0L)
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(b1, 1L)
    val m = clean(dirW)
    assert(m(1L) == s"owner doc with $shared inside it")
    assert(m(8L) == "late copy of here")
    assert(m(9L) == "another late copy")
  }

  test("redelivered batch recomputes identically (registry excludes itself)") {
    val dirW = work()
    val shared = "q r s t u v"
    // both docs end "... u v text", so the trailing window [t u v text] is
    // shared too and the span reaches through the last token
    val b0 = Seq((1L, s"first $shared text")).toDF("doc_id", "text")
    val b1 = Seq((5L, s"second $shared text")).toDF("doc_id", "text")
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(b0, 0L)
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(b1, 1L)
    val first = clean(dirW)
    // at-least-once: batch 1 re-delivered — must not see its own batch=1
    // registry partition and must rewrite identical output
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(b1, 1L)
    assert(clean(dirW) == first)
    assert(first(5L) == "second")
  }

  test("registry compaction: one blob, same strips, filter still works") {
    val dirW = work()
    val shared = "aa bb cc dd ee ff"
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(
      Seq((1L, s"first $shared xx")).toDF("doc_id", "text"), 0L)
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(
      Seq((2L, s"middle $shared yy")).toDF("doc_id", "text"), 1L)
    PassageStream.compactRegistry(spark, dirW, upToBatch = 2L)
    val fs = new org.apache.hadoop.fs.Path(s"$dirW/registry")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dirW/registry"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(parts.toSeq == Seq("batch=-1"), parts.mkString(","))
    // a post-compaction batch still strips against the compacted blob
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(
      Seq((9L, s"late $shared zz")).toDF("doc_id", "text"), 2L)
    assert(clean(dirW)(9L) == "late zz")
    // second compaction absorbs the blob + batch 2 into the next id
    PassageStream.compactRegistry(spark, dirW, upToBatch = 3L)
    val parts2 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dirW/registry"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted
    assert(parts2.toSeq == Seq("batch=-2"), parts2.mkString(","))
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(
      Seq((12L, s"even later $shared ww")).toDF("doc_id", "text"), 3L)
    assert(clean(dirW)(12L) == "even later ww")
  }

  test("stream of one batch equals the batch operator") {
    val dirW = work()
    val docs = (0L until 15L).map(i =>
      (i, if (i % 5 == 0) "shared w x y z tail" else s"own doc $i w${i % 4}"))
    val df = docs.toDF("doc_id", "text")
    PassageStream.cleanAndRegister(dirW, w = 4, minDocs = 2)(df, 0L)
    val batch = Passages.removePassages(df, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(clean(dirW) == batch)
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Streaming CDC-chunk registry: per-batch reports match the first-seen-
  * batch rule, intra-batch repeats count as new, and an at-least-once
  * redelivery of a batch recomputes the identical report (the registry
  * probe excludes the current batch's own partition).
  */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  private def work(): String = graft.util.Scratch.dir("graft_cdctest")

  private def report(workDir: String): Map[Long, (Long, Long)] =
    CdcStream.readReport(spark, workDir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap

  // long enough for several 16-char-window chunks
  private val body = (0 until 40).map(j => s"w$j t${j % 7}").mkString(" ")

  test("verbatim cross-batch copy reports every chunk dup; originals report none") {
    val dirW = work()
    val b0 = Seq((1L, body), (2L, "totally different " + body.reverse))
      .toDF("doc_id", "text")
    val b1 = Seq((9L, body)).toDF("doc_id", "text") // verbatim copy of doc 1
    CdcStream.chunkAndRegister(dirW)(b0, 0L)
    CdcStream.chunkAndRegister(dirW)(b1, 1L)
    val r = report(dirW)
    assert(r(1L)._2 == 0L, s"original must report 0 dups: ${r(1L)}")
    assert(r(2L)._2 == 0L)
    assert(r(9L)._1 > 1L, "copy must chunk into multiple pieces")
    assert(r(9L)._1 == r(1L)._1 && r(9L)._2 == r(9L)._1,
      s"verbatim copy must report every chunk dup: ${r(9L)} vs ${r(1L)}")
  }

  test("intra-batch twins both count NEW; redelivery recomputes identically") {
    val dirW = work()
    // two verbatim twins in the SAME batch: the registry excludes the
    // current batch, so neither sees the other as prior art
    val b0 = Seq((1L, body), (2L, body)).toDF("doc_id", "text")
    CdcStream.chunkAndRegister(dirW)(b0, 0L)
    val first = report(dirW)
    assert(first(1L)._2 == 0L && first(2L)._2 == 0L,
      s"intra-batch twins must both be new: $first")
    // at-least-once redelivery of batch 0: same input, same batch id —
    // the probe must NOT see the batch's own half-committed digests
    CdcStream.chunkAndRegister(dirW)(b0, 0L)
    assert(report(dirW) == first, "redelivery changed the report")
    // a LATER batch then sees those digests as prior art
    CdcStream.chunkAndRegister(dirW)(
      Seq((7L, body)).toDF("doc_id", "text"), 1L)
    val after = report(dirW)
    assert(after(7L)._2 == after(7L)._1, s"later copy must be all-dup: $after")
  }

  test("registry compaction: fold is idempotent and post-fold dedup unchanged " +
    "(VERDICT r14 #4)") {
    val dirW = work()
    val b0 = Seq((1L, body), (2L, "totally different " + body.reverse))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, "yet another corpus of words " * 10)).toDF("doc_id", "text")
    CdcStream.chunkAndRegister(dirW)(b0, 0L)
    CdcStream.chunkAndRegister(dirW)(b1, 1L)
    val live = Compaction.readLive(spark, s"$dirW/registry", "chunk_md5 STRING")
      .select("chunk_md5").as[String].collect().toSet
    // both committed → fold both; re-fold must be a no-op on content
    CdcStream.compact(spark, dirW, upToBatch = 2L)
    val folded = Compaction.readLive(spark, s"$dirW/registry", "chunk_md5 STRING")
      .select("chunk_md5").as[String].collect().toSet
    assert(folded == live, "fold must preserve the distinct digest set")
    CdcStream.compact(spark, dirW, upToBatch = 2L)
    assert(Compaction.readLive(spark, s"$dirW/registry", "chunk_md5 STRING")
      .select("chunk_md5").as[String].collect().toSet == live,
      "re-fold must be idempotent")
    // the report dirs folded too (identity union): the read answers
    // identically over the blob
    val preFold = report(dirW)
    assert(preFold.keySet == Set(1L, 2L, 3L), s"report survived the fold: $preFold")
    // a batch arriving AFTER the fold still dedups against the blob: a
    // verbatim copy of doc 1 reports every chunk as prior art
    CdcStream.chunkAndRegister(dirW)(Seq((9L, body)).toDF("doc_id", "text"), 2L)
    val r = report(dirW)
    assert(r(9L)._1 > 1L && r(9L)._2 == r(9L)._1,
      s"post-fold copy must be all-dup: ${r(9L)}")
    assert(r(1L)._2 == 0L && r(2L)._2 == 0L, "pre-fold reports unchanged")
  }
}

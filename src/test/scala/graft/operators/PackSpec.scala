package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Sequence packing: hand-computed chunk assignment, boundary straddles,
  * zero-token documents, partition-layout independence, and the
  * per-sequence roll-up invariants (interior sequences full, token
  * conservation).
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  // budget 10, doc_id order → starts 0, 4, 7, 15, 15; doc 3 straddles
  // the 10-token boundary; doc 4 is zero-token.
  private val docs = Seq(
    (1L, 4L), (2L, 3L), (3L, 8L), (4L, 0L), (5L, 5L)
  ).toDF("doc_id", "n_tokens")

  test("packSequences: hand-computed starts, chunk ids, offsets") {
    val got = Pack.packSequences(docs, "doc_id", "n_tokens", 10,
        Seq(col("doc_id")))
      .select("doc_id", "start_token", "seq_first", "seq_last", "offset_in_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, 0L),
      (2L, 4L, 0L, 0L, 4L),
      (3L, 7L, 0L, 1L, 7L),   // straddles sequences 0 and 1
      (4L, 15L, 1L, 1L, 5L),  // zero tokens: occupies nothing, stays defined
      (5L, 15L, 1L, 1L, 5L)))
  }

  test("packSequences is independent of the input partition layout") {
    val a = Pack.packSequences(docs, "doc_id", "n_tokens", 10, Seq(col("doc_id")))
      .select("doc_id", "start_token").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Pack.packSequences(docs.repartition(7), "doc_id", "n_tokens", 10,
        Seq(col("doc_id")))
      .select("doc_id", "start_token").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("sequenceStats: interior sequences fill exactly, tokens conserved") {
    val packed = Pack.packSequences(docs, "doc_id", "n_tokens", 10, Seq(col("doc_id")))
    val stats = Pack.sequenceStats(packed, "n_tokens", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    // seq 0: docs 1,2 and the head of 3 → 10 tokens; seq 1: tail of 3,
    // zero-token 4, and 5 → 10 tokens. 20 tokens total, both full.
    assert(stats.toSeq == Seq(
      (0L, 3L, 3L, 10L, 1.0),
      (1L, 3L, 2L, 10L, 1.0)))
    assert(stats.map(_._4).sum == 20L)
  }

  test("sequenceStats: a trailing partial sequence reports its true fill") {
    val small = Seq((1L, 4L), (2L, 3L)).toDF("doc_id", "n_tokens")
    val packed = Pack.packSequences(small, "doc_id", "n_tokens", 10, Seq(col("doc_id")))
    val stats = Pack.sequenceStats(packed, "n_tokens", 10).collect()
    assert(stats.length == 1)
    assert(stats(0).getAs[Long]("seq_tokens") == 7L)
    assert(stats(0).getAs[Double]("fill_frac") == 0.7)
  }

  test("negative token counts clamp to zero instead of corrupting offsets") {
    val bad = Seq((1L, 4L), (2L, -5L), (3L, 3L)).toDF("doc_id", "n_tokens")
    val got = Pack.packSequences(bad, "doc_id", "n_tokens", 10, Seq(col("doc_id")))
      .select("doc_id", "start_token", "seq_first", "seq_last")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // doc 2 occupies nothing; doc 3 starts right after doc 1's 4 tokens
    assert(got.toSeq == Seq((1L, 0L, 0L, 0L), (2L, 4L, 0L, 0L), (3L, 4L, 0L, 0L)))
  }

  test("packSequences rejects a non-positive budget") {
    intercept[IllegalArgumentException] {
      Pack.packSequences(docs, "doc_id", "n_tokens", 0, Seq(col("doc_id")))
    }
  }

  test("attentionMasks: segment starts per sequence, continuation blocks at 0") {
    // budget 10: doc1 tok 4 [seq0 @0], doc2 tok 9 [seq0 @4 → spills into
    // seq1], doc3 tok 3 [seq1 @3], doc4 tok 0 (never a boundary)
    val d = Seq((1L, 4L), (2L, 9L), (3L, 3L), (4L, 0L)).toDF("doc_id", "n_tokens")
    val packed = Pack.packSequences(d, "doc_id", "n_tokens", 10L, Seq(col("doc_id")))
    val masks = Pack.attentionMasks(packed, "n_tokens", 10L)
      .collect().map(r => r.getAs[Long]("seq") ->
        (r.getAs[Int]("n_segments"), r.getAs[String]("boundaries"))).toMap
    assert(masks(0L) == ((2, "0 4")))
    // seq1: doc2's continuation block at 0, doc3 starting at offset 3
    assert(masks(1L) == ((2, "0 3")))
    assert(masks.keySet == Set(0L, 1L))
  }
}

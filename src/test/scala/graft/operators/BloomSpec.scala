package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom-prefiltered registry dedup: the no-false-negative contract,
  * false-positive removal by the exact verify (pinned with a sketch
  * sized far too small), and the empty-registry edge.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val registry = Seq(
    (100L, "alpha beta gamma"), (101L, "delta epsilon"), (102L, "zeta eta")
  ).toDF("doc_id", "text")

  test("registryDups: exact duplicates found, fresh content passes") {
    val fresh = Seq(
      (1L, "alpha beta gamma"), // dup of 100
      (2L, "zeta eta"),         // dup of 102
      (3L, "brand new text")
    ).toDF("doc_id", "text")
    val out = Bloom.registryDups(registry, fresh, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("registryDups: a deliberately tiny bloom still yields the exact answer") {
    // 64 bits for 3 items -> false positives near-certain on a larger
    // probe set; the digest semi-join must strip every one of them
    val fresh = (0L until 500L).map(i => (i, s"fresh text $i"))
      .toDF("doc_id", "text")
      .unionByName(Seq((9000L, "delta epsilon")).toDF("doc_id", "text"))
    val out = Bloom.registryDups(registry, fresh, "doc_id", "text",
      expectedItems = 3L, numBits = 64L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(9000L))
  }

  test("registryDups: empty registry returns an empty typed result") {
    val fresh = Seq((1L, "anything")).toDF("doc_id", "text")
    val out = Bloom.registryDups(registry.filter(lit(false)), fresh,
      "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "content_sha"))
    assert(out.count() == 0L)
  }

  test("bloomAgg/mightContain: every inserted member probes true") {
    val items = (0L until 200L).map(i => Tuple1(s"member $i")).toDF("v")
    val bytes = items
      .agg(Bloom.bloomAgg(xxhash64(col("v")), 200L, 4096L).as("bf"))
      .head.getAs[Array[Byte]](0)
    val probed = items
      .filter(Bloom.mightContain(bytes, xxhash64(col("v"))))
      .count()
    assert(probed == 200L) // no false negatives, ever
  }

  test("registryDups: duplicate fresh rows each report (multiplicity kept)") {
    val fresh = Seq((1L, "zeta eta"), (2L, "zeta eta"))
      .toDF("doc_id", "text")
    val out = Bloom.registryDups(registry, fresh, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }
}

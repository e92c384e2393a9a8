package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership pre-filtering for incremental exact dedup —
  * the "have we ever ingested this content before?" probe a daily-ingest
  * pipeline answers against a multi-year registry. The same
  * space-efficient set sketch Spark's own runtime filters build
  * (InjectRuntimeFilter's `BloomFilterAggregate` /
  * `BloomFilterMightContain`, here driven explicitly because the
  * planner only injects them under its own cost heuristics), and the
  * classic published design (Bloom 1970; Putze et al. 2007 for the
  * blocked variant Spark implements).
  *
  * Why this beats the plain semi-join at 100 TB: `Dedup.incremental`'s
  * candidate join must shuffle the WHOLE fresh batch against the
  * registry digests. With a daily duplicate rate of a few percent, the
  * bloom pre-filter drops ~(1 − fpp) of the non-duplicate fresh rows
  * BEFORE the exchange — the join's probe side shrinks from O(|fresh|)
  * to O(|dups| + fpp·|fresh|) — and the filter itself is a scan-local
  * predicate on each fresh partition (codegen'd, no shuffle, no state).
  * The sketch is built in ONE distributed aggregation over the registry
  * digests (map-side partial blooms merged by OR), and only the final
  * O(numBits/8) byte array touches the driver — bounded METADATA, the
  * manifest-list class (4 MiB at the 32M-bit default), embedded in the
  * probe plan as a binary literal so every task shares one copy via the
  * task-binary broadcast.
  *
  * Correctness contract: a Bloom filter has NO false negatives — every
  * true duplicate survives the pre-filter — and the exact digest
  * semi-join afterwards removes the false positives, so the operator's
  * OUTPUT is exactly the naive semi-join's (the DuckDB oracle replays
  * it as one). `xxhash64` collisions at the probe only ADD candidates
  * (removed by the same verify), never remove one.
  */
object Bloom {

  /** Distributed bloom build: aggregate `item` (a LONG — hash wider
    * types first) into a serialized bloom filter of `numBits` bits
    * sized for `expectedItems` distinct items. One row, BinaryType.
    */
  def bloomAgg(item: Column, expectedItems: Long, numBits: Long): Column =
    GraftBridge.column(new BloomFilterAggregate(
      GraftBridge.expression(item),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Scan-local membership probe against a driver-held serialized bloom
    * (`bytes` from [[bloomAgg]]'s result). False positives possible,
    * false negatives never.
    */
  def mightContain(bytes: Array[Byte], item: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal.create(bytes, BinaryType),
      GraftBridge.expression(item)))

  /** Exact content-duplicate report of `fresh` against `registry`:
    * `(idCol, content_sha)` for every fresh document whose sha2-256
    * text digest already exists in the registry — bit-identical to the
    * naive digest semi-join, computed with the bloom pre-filter in
    * front of the exchange (see object scaladoc). `expectedItems` /
    * `numBits` size the sketch: fpp ≈ (1 − e^(−kn/m))^k; the defaults
    * (4M items in 32M bits ≈ 1% fpp) suit a sf-scale registry — at
    * 100 TB you'd raise both, keeping numBits within the driver-metadata
    * budget and letting fpp govern only the wasted-verify fraction,
    * never correctness.
    */
  def registryDups(registry: DataFrame, fresh: DataFrame,
                   idCol: String, textCol: String,
                   expectedItems: Long = 4L * 1000 * 1000,
                   numBits: Long = 32L * 1024 * 1024,
                   cacheDigests: Boolean = false): DataFrame = {
    require(expectedItems > 0 && numBits > 0,
      s"bloom sizing must be positive, got ($expectedItems items, $numBits bits)")
    // The digest frame feeds TWO actions (the bloom-build collect below
    // and the exact semi-join in the returned plan). `cacheDigests`
    // persists it across them — the right call when the registry scan
    // itself is the dominant cost (remote storage, wide rows). It is
    // OFF by default because it was MEASURED slower on columnar local
    // tables (sf0.1: 2.9 s → 9.5 s): sha2 over one projected column is
    // cheaper to recompute than to materialize through a cached
    // exchange, and a caller at real registry scale passes an
    // already-materialized digest table anyway.
    val rd0 = registry.select(sha2(col(textCol), 256).as("content_sha")).distinct()
    val regDig =
      if (cacheDigests) graft.util.Caches.retain(
        rd0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else rd0
    // the ONLY driver materialization: the merged sketch, O(numBits/8)
    val bytes = regDig
      .agg(bloomAgg(xxhash64(col("content_sha")), expectedItems, numBits)
        .as("__bf"))
      .head.getAs[Array[Byte]](0)
    val freshDig = fresh.select(col(idCol),
      sha2(col(textCol), 256).as("content_sha"))
    if (bytes == null) freshDig.filter(lit(false)) // empty registry
    else freshDig
      .filter(mightContain(bytes, xxhash64(col("content_sha"))))
      .join(regDig, Seq("content_sha"), "left_semi")
      .select(col(idCol), col("content_sha"))
  }
}

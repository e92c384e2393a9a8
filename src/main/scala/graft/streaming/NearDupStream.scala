package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** One (document, LSH bucket) arrival for the candidate state machine.
  * `eventTime` is only meaningful under the bounded variant (it carries
  * the watermark tag through to the stateful operator); the unbounded
  * path carries null.
  */
case class BandedDoc(band: Int, sig: Long, docId: Long, text: String,
                     eventTime: java.sql.Timestamp)

/** Per-bucket state: ids seen in this (band, sig) bucket in arrival
  * order (oldest first — partner lists slice off the front, appends are
  * amortized O(1); code-review r6), capped at the hot-bucket bound, plus
  * the newest event time the bucket has EVER seen (an out-of-order batch
  * must not pull the eviction deadline earlier). Ids only — never text,
  * never signatures — so a bucket costs O(members) longs in the state
  * store.
  *
  * State-schema evolution note: Spark's state store checks schema
  * compatibility on restart (`spark.sql.streaming.stateStore
  * .stateSchemaCheck`), so changing these fields strands existing
  * checkpoints — a deployed long-running query must drain (stop at a
  * batch boundary, reprocess the clean table as its new seed) before
  * upgrading across a state shape change.
  */
case class BucketState(ids: Vector[Long], newestMs: Long)

/** A document leaving the candidate stage: its text plus the earlier-seen
  * bucket partners it must be Jaccard-verified against (one row per
  * (doc, band); the sink re-groups by doc).
  */
case class CandidateDoc(doc_id: Long, text: String, partners: Seq[Long])

/** Streaming near-duplicate dedup (VERDICT r05 #1) — the batch
  * MinHash → LSH band → bucket-join → exact-Jaccard pipeline
  * ([[graft.operators.Dedup.dropNearDuplicates]]) as an incremental
  * stream:
  *
  *  1. signatures per micro-batch: [[Dedup.minhashExpr]] /
  *     [[Dedup.bandStructsExpr]] — per-row expressions, so the signature
  *     stage is a stateless projection (a groupBy-min mid-stream would be
  *     an illegal cumulative aggregation) producing the SAME xxhash64
  *     values as the batch operators;
  *  2. banded candidate state: `flatMapGroupsWithState` keyed by
  *     (band, sig). Each bucket's state is its member id list, capped at
  *     `maxBucket` — the batch hot-bucket guard reborn as a state-size
  *     cap: a full bucket stops pairing AND stops growing, so one
  *     degenerate boilerplate signature can neither produce |bucket|²
  *     pairs nor eat the state store. (Asymmetry vs batch, by
  *     construction: `capBuckets` drops a hot bucket's pairs
  *     retroactively; a stream cannot retract already-emitted pairs, so
  *     the first `maxBucket` members keep their pairings.)
  *  3. exact-Jaccard verify in `foreachBatch` against a REGISTRY of every
  *     document seen so far (kept and dropped — a chain C≈B≈A must verify
  *     C against B even though B was dropped), then append survivors.
  *
  * Semantics: FIRST ARRIVAL WINS — a document is dropped iff it
  * Jaccard-verifies (≥ threshold) against any earlier-arrived document
  * sharing an LSH bucket; within one micro-batch "earlier" means smaller
  * doc id, the suite's canonical-min convention. When documents arrive in
  * ascending-id order and near-dup clusters are clique-shaped (every copy
  * pairs with its original — the planted-corpus construction), the
  * survivor set equals [[Dedup.dropNearDuplicates]]'s batch answer
  * exactly; NearDupStreamSpec pins that equivalence. The one inherent
  * divergence of a no-retraction single pass: a chain that becomes
  * connected only through a LATER document (pairs (C,E),(A,E) with no
  * (A,C)) keeps both A and C where batch keeps only A.
  *
  * Scale shape: state is O(distinct band signatures × capped members),
  * ids only; texts ride the shuffle once per band (bands ≈ 4) and land in
  * the registry — which at 100 TB is the corpus store the pipeline
  * already keeps, partitioned by arrival batch. Per-batch verify cost is
  * O(candidate pairs of the batch), the same AQE-strategized joins as the
  * batch verifier.
  *
  * State lives forever under [[NearDupStream.candidates]] (NoTimeout),
  * matching the batch operator's whole-corpus index;
  * [[NearDupStream.candidatesBounded]] is the 100 TB default for an
  * unbounded stream — buckets evict `ttlMs` past their newest event time
  * once the watermark passes, bounding state to the active horizon.
  */
object NearDupStream {

  /** The registry's committed schema — what [[verifyAndAppend]] WRITES to
    * `registry/batch=N` (every seen doc plus the partition column). All
    * registry reads pin this single constant (ADVICE r09): a write-path
    * schema change must surface as a loud failure here, not as
    * silently-null columns in the probe reads.
    */
  private[streaming] val RegistrySchema = "doc_id LONG, text STRING, batch LONG"

  /** Fold one micro-batch of one bucket's arrivals into the member list
    * and emit each doc with the partners it must verify against. Arrivals
    * are processed in ascending doc id so intra-batch pairing follows the
    * canonical-min convention; re-delivered ids are ignored (idempotent
    * under source replay).
    *
    * When the operator runs with a timeout ([[candidatesBounded]]), an
    * expired bucket is simply REMOVED: near-dups are then only detected
    * within the eviction horizon — the bounded-state trade, identical in
    * kind to `dropDuplicatesWithinWatermark`'s. Removing (rather than
    * resetting counters inside) is safe because bucket state carries no
    * aggregate a late arrival would corrupt — a re-seen doc after
    * eviction just re-enters as if new.
    */
  private[streaming] def bucketUpdate(maxBucket: Int,
                                      ttlMs: Option[Long] = None)(
      key: (Int, Long), docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[CandidateDoc] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    val arrivals = docs.toSeq
    val prior = state.getOption.getOrElse(BucketState(Vector.empty, 0L))
    var ids = prior.ids
    var seen = ids.toSet
    val out = Seq.newBuilder[CandidateDoc]
    arrivals.sortBy(_.docId).foreach { d =>
      if (!seen.contains(d.docId)) {
        if (ids.length < maxBucket) {
          out += CandidateDoc(d.docId, d.text, ids)
          ids = ids :+ d.docId
          seen += d.docId
        } else {
          // hot bucket: cap reached — the doc still flows to the sink
          // (with no partners from THIS bucket) but is not added, so the
          // bucket's state and pair volume stay bounded
          out += CandidateDoc(d.docId, d.text, Seq.empty)
        }
      }
    }
    // bounded mode: the bucket lives ttlMs past the newest event time it
    // has EVER seen — maxing against the stored watermark-high keeps a
    // late (but watermark-valid) arrival from pulling the eviction
    // deadline EARLIER (code-review r6). When the watermark passes the
    // armed timestamp, the engine fires the timeout and the bucket is
    // evicted above.
    ttlMs match {
      case Some(ttl) =>
        // null-safe fold (ADVICE r06): candidatesBounded filters null
        // event times upstream, but a direct caller (or a unit test)
        // feeding a null-ts row must degrade to the prior deadline, not
        // NPE and kill the query
        val newest = (prior.newestMs +:
          arrivals.flatMap(a => Option(a.eventTime).map(_.getTime))).max
        state.update(BucketState(ids, newest))
        // floored at the current watermark: late-row admission uses the
        // PREVIOUS batch's watermark while setTimeoutTimestamp validates
        // against the CURRENT one, so a watermark jump larger than ttl
        // could otherwise compute a deadline already in the past and
        // throw, killing the query (code-review r6)
        state.setTimeoutTimestamp(
          math.max(newest + ttl, state.getCurrentWatermarkMs() + 1))
      case None =>
        state.update(BucketState(ids, 0L))
    }
    out.result().iterator
  }

  /** The stateful candidate stage: documents → per-row banded signatures →
    * bucket state → (doc, text, partners) rows, one per (doc, band).
    */
  private def banded(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, bands: Int, shingleN: Int,
                     eventTime: org.apache.spark.sql.Column): DataFrame = {
    val toks = graft.functions.Text.tokens(col(textCol))
    // eventTime rides as a COLUMN (not a derived long) so a watermark
    // applied upstream keeps its event-time tag all the way into the
    // stateful operator
    docs
      .select(col(idCol).cast("long").as("docId"), col(textCol).as("text"),
        toks.as("__toks"), eventTime.as("eventTime"))
      .select(col("docId"), col("text"), col("eventTime"),
        Dedup.minhashExpr(col("__toks"), k, shingleN).as("__mh"))
      .select(col("docId"), col("text"), col("eventTime"),
        explode(Dedup.bandStructsExpr(col("__mh"), k, bands)).as("bs"))
      .select(col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("docId"), col("text"), col("eventTime"))
  }

  def candidates(docs: DataFrame, idCol: String, textCol: String,
                 k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                 maxBucket: Int = 10000): Dataset[CandidateDoc] = {
    import docs.sparkSession.implicits._
    banded(docs, idCol, textCol, k, bands, shingleN,
      lit(null).cast("timestamp"))
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.sig))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(bucketUpdate(maxBucket))
  }

  /** The bounded-state candidate stage (the 100 TB default when the
    * stream is unbounded): the input is watermarked on `tsCol` and every
    * bucket is evicted `ttl` past its newest event time, so state is
    * O(buckets active within the horizon) instead of O(buckets ever
    * seen). The trade, identical in kind to
    * `dropDuplicatesWithinWatermark`: near-duplicates are only detected
    * against documents whose bucket is still within the horizon.
    */
  def candidatesBounded(docs: DataFrame, idCol: String, textCol: String,
                        tsCol: String, watermark: String, ttlMs: Long,
                        k: Int = 16, bands: Int = 4, shingleN: Int = 3,
                        maxBucket: Int = 10000): Dataset[CandidateDoc] = {
    import docs.sparkSession.implicits._
    // the watermark goes on the PROJECTED eventTime column — tagging the
    // source column would be stripped by the cast/alias in the projection.
    // Null event times are dropped FIRST (ADVICE r06): a null survives the
    // engine's late-row filter (null predicate != true) and would reach
    // the stateful operator with no admissible deadline.
    banded(docs.filter(col(tsCol).isNotNull), idCol, textCol, k, bands,
      shingleN, col(tsCol).cast("timestamp"))
      .withWatermark("eventTime", watermark)
      .as[BandedDoc]
      .groupByKey(d => (d.band, d.sig))
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(bucketUpdate(maxBucket, Some(ttlMs)))
  }

  /** The registry read pruned to the ids a batch actually verifies
    * against (VERDICT r06 #3 / ADVICE r06): the registry holds every
    * document ever seen, so an unpruned `read.parquet` made every
    * micro-batch O(corpus). Small partner sets push an `In` filter into
    * the parquet scan (row-group statistics skip whole files); larger
    * ones broadcast-semi-join, keeping the shuffle side zero either way.
    * Per-batch verify cost is now O(batch candidates), not O(corpus).
    */
  private[streaming] def prunedRegistry(spark: SparkSession, regPath: String,
                                        partnerIds: Array[Long]): DataFrame = {
    import spark.implicits._
    // schema-pinned + missing-file-tolerant for the same reasons as the
    // anti-join read in verifyAndAppend (ADVICE r08)
    val reg = spark.read.schema(RegistrySchema)
      .option("ignoreMissingFiles", "true")
      .parquet(regPath).select("doc_id", "text")
    if (partnerIds.isEmpty) reg.limit(0)
    else if (partnerIds.length <= 10000)
      reg.filter(col("doc_id").isin(partnerIds.toSeq: _*))
    else
      reg.join(broadcast(partnerIds.toSeq.toDF("doc_id")), Seq("doc_id"), "left_semi")
  }

  /** Per-batch sink: re-group the (doc, band) candidate rows by doc,
    * exact-Jaccard the candidate pairs against the (partner-pruned)
    * registry ∪ this batch, append survivors to `clean/` and every seen
    * doc to `registry/`. Both writes are per-batch partition dirs
    * overwritten by batch id, so a replayed batch rewrites the same
    * files — idempotent under the checkpoint's at-least-once delivery
    * (the KPI sink's recipe).
    */
  private[streaming] def verifyAndAppend(workDir: String, threshold: Double,
                                         shingleN: Int)
                                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val arrivals = batch.groupBy(col("doc_id"))
      .agg(first(col("text")).as("text"),
        array_distinct(flatten(collect_list(col("partners")))).as("partners"))
      .persist()
    try {
      val regRoot = new Path(s"$workDir/registry")
      val fs = regRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // cross-batch redelivery guard (code-review r7f): over-cap docs are
      // never recorded in bucket state, so an at-least-once source can
      // redeliver them in a LATER batch — excluded here by checking the
      // PRIOR batches' registry partitions (the current batch partition
      // must not count, or a same-batch replay would see its own failed
      // write and drop everything). A DISTRIBUTED anti-join against the
      // registry's ID COLUMN only — columnar projection, never the text
      // bodies, never a driver collect (a rate-free catch-up batch has
      // unbounded distinct ids, unlike the cap-bounded partner set
      // below; code-review r7g).
      // schema-pinned (ADVICE r08): a first-batch crash can leave
      // registry/ existing with only _temporary under it; inference over
      // zero committed files fails the redelivered batch permanently,
      // while a pinned-schema read of an empty root is an empty frame
      val perDoc =
        if (fs.exists(regRoot)) {
          val seenBefore = spark.read
            .schema(RegistrySchema)
            .option("ignoreMissingFiles", "true")
            .parquet(regRoot.toString)
            .filter(col("batch") =!= batchId).select("doc_id")
          arrivals.join(seenBefore, Seq("doc_id"), "left_anti")
        } else arrivals
      val docsHere = perDoc.select(col("doc_id"), col("text"))
      // the partner ids this batch verifies against — bounded by the
      // batch's candidate volume (bucket caps), NOT the corpus size
      val partnerIds = perDoc
        .select(explode(col("partners")).as("doc_id")).distinct()
        .as[Long].collect()
      val texts =
        if (fs.exists(regRoot))
          prunedRegistry(spark, regRoot.toString, partnerIds)
            .unionByName(docsHere)
        else docsHere
      val pairs = perDoc
        .select(col("doc_id").as("id_b"), explode(col("partners")).as("id_a"))
        .select("id_a", "id_b")
      val dropped = Dedup.jaccardVerify(pairs, texts, "doc_id", "text", shingleN)
        .filter(col("jaccard") >= threshold)
        .select(col("id_b").as("doc_id")).distinct()
      perDoc.join(dropped, Seq("doc_id"), "left_anti")
        .select("doc_id", "text")
        .write.mode("overwrite").parquet(s"$workDir/clean/batch=$batchId")
      docsHere.write.mode("overwrite")
        .parquet(s"$workDir/registry/batch=$batchId")
    } finally arrivals.unpersist()
  }

  /** The full streaming near-dup leg: candidate stage → verify-and-append
    * sink. Caller picks the trigger and calls `.start()`, like every other
    * writer in the suite. Survivors accumulate under `workDir/clean`
    * (read them back with [[survivors]]).
    */
  def writer(docs: DataFrame, idCol: String, textCol: String,
             workDir: String, checkpointDir: String,
             threshold: Double = 0.8, k: Int = 16, bands: Int = 4,
             shingleN: Int = 3, maxBucket: Int = 10000): DataStreamWriter[Row] =
    candidates(docs, idCol, textCol, k, bands, shingleN, maxBucket)
      .toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(verifyAndAppend(workDir, threshold, shingleN) _)

  /** [[writer]] through the bounded-state candidate stage (VERDICT r06
    * #4): the declared 100 TB default, watermarked on `tsCol` with
    * per-bucket TTL eviction, wired to the same verify-and-append sink so
    * the eviction path answers the same planted-truth oracle as the
    * unbounded leg (st_neardup_bounded) instead of being test-only.
    *
    * A null-event-time row cannot enter the watermarked state stage, but
    * it must not silently vanish from the corpus either (code-review r7):
    * it is routed AROUND the stateful operator straight to the sink with
    * no partners — kept unverified, exactly like a hot-bucket overflow
    * doc. The trade: a malformed-timestamp duplicate survives; the
    * alternative was losing a unique document with no log or metric.
    */
  def writerBounded(docs: DataFrame, idCol: String, textCol: String,
                    tsCol: String, watermark: String, ttlMs: Long,
                    workDir: String, checkpointDir: String,
                    threshold: Double = 0.8, k: Int = 16, bands: Int = 4,
                    shingleN: Int = 3, maxBucket: Int = 10000): DataStreamWriter[Row] = {
    val nullTs = docs.filter(col(tsCol).isNull)
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"),
        array().cast("array<bigint>").as("partners"))
    candidatesBounded(docs, idCol, textCol, tsCol, watermark, ttlMs,
      k, bands, shingleN, maxBucket)
      .toDF()
      .unionByName(nullTs)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(verifyAndAppend(workDir, threshold, shingleN) _)
  }

  /** [[RegistrySchema]] minus the dir-derived partition column — the
    * FILE schema, for [[Compaction]] folds and live-dir reads.
    */
  private[streaming] val RegistryDataSchema = "doc_id LONG, text STRING"

  /** The surviving (near-dup-free) documents written so far. Live-dir
    * enumeration ([[Compaction.readLive]]): survivor rows are not
    * duplicate-tolerant, so dirs an interrupted compaction absorbed stay
    * excluded by the marker.
    */
  def survivors(spark: SparkSession, workDir: String): DataFrame =
    Compaction.readLive(spark, s"$workDir/clean", RegistryDataSchema)
      .select("doc_id", "text")

  /** Fold the per-trigger partition dirs of a long-running stream —
    * registry and clean rows are DISJOINT across live batches (the
    * anti-join admits each doc_id once), so both are plain union folds
    * under the [[Compaction]] crash-safety/marker/redelivery contract.
    * The trigger-side probe reads stay root-glob (duplicate-tolerant:
    * a crash-window leftover only duplicates candidate pairs, which the
    * verify's distinct collapses) and keep working against negative blob
    * ids.
    */
  def compact(spark: SparkSession, workDir: String, upToBatch: Long): Unit = {
    Compaction.compactDir(spark, s"$workDir/registry", RegistryDataSchema,
      upToBatch)
    Compaction.compactDir(spark, s"$workDir/clean", RegistryDataSchema,
      upToBatch)
  }
}

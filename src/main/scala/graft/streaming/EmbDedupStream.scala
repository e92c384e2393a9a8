package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Similarity

/** One (vector, sign-bucket) arrival for the embedding candidate state. */
case class VecArrival(bucket: Long, vecId: Long, vec: Seq[Double])

/** A vector leaving the candidate stage with the earlier-seen bucket
  * partners it must be cosine-verified against.
  */
case class VecCandidate(vec_id: Long, vec: Seq[Double], partners: Seq[Long])

/** Streaming embedding near-duplicate dedup — the batch
  * [[graft.operators.Dedup.embeddingNearDuplicates]] (axis-sign-pattern
  * blocking + exact cosine verify) as an incremental stream, completing
  * the streaming family across the second modality: text near-dups
  * stream through [[NearDupStream]], embeddings through this.
  *
  * Identical structure, different signature function:
  *
  *  1. bucketing is a per-row STATELESS expression (the first `nbits`
  *     dimension sign bits — no k-means training mid-stream, which would
  *     be an illegal cumulative aggregation AND a moving blocking key);
  *     identical vectors share a bucket by construction, so exact-copy
  *     recall is structural, exactly like the batch operator.
  *  2. candidate state: `flatMapGroupsWithState` keyed by the bucket,
  *     state = member id list capped at `maxBucket` (ids only — vectors
  *     NEVER enter the state store; a bucket costs O(members) longs).
  *     First arrival wins; intra-batch arrivals process in ascending id,
  *     the suite's canonical-min convention.
  *  3. exact cosine verify in `foreachBatch`: each candidate's partner
  *     vectors are read from the registry PRUNED to the batch's partner
  *     ids (the [[NearDupStream.prunedRegistry]] lesson applied from
  *     birth — per-batch cost is O(batch candidates), never O(corpus)),
  *     survivors append to `clean/`, every arrival to `registry/`, both
  *     as batch-id-keyed partition dirs (idempotent under replay).
  *
  * State is O(active buckets × capped members); the 2^nbits bucket space
  * bounds distinct keys. For an unbounded deployment the TTL-eviction
  * variant of [[NearDupStream.candidatesBounded]] applies verbatim (the
  * state machine is the same `BucketState`); the batch-replay query
  * drains with AvailableNow where NoTimeout is the faithful twin of the
  * batch whole-corpus index.
  */
object EmbDedupStream {

  /** The registry's committed schema — what the per-batch sink WRITES to
    * `registry/batch=N`. Both probe reads pin this single constant
    * (ADVICE r09) so a write-path change fails loudly instead of
    * surfacing as null columns.
    */
  private[streaming] val RegistrySchema = "vec_id LONG, vec ARRAY<DOUBLE>, batch LONG"

  /** Sign-pattern bucket — MUST stay in lockstep with
    * [[graft.operators.Dedup.embeddingNearDuplicates]]'s blocking key so
    * stream and batch block identically.
    */
  private def bucketExpr(vecCol: String, nbits: Int) =
    (0 until nbits).map(i =>
      when(element_at(col(vecCol), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))

  /** Fold one micro-batch of one bucket's arrivals: emit each new vector
    * with the earlier member ids it must verify against; cap the bucket
    * (an over-cap arrival flows through unpaired and unrecorded — the
    * hot-bucket guard as a state-size cap); ignore re-delivered ids.
    */
  private[streaming] def bucketUpdate(maxBucket: Int)(
      key: Long, vecs: Iterator[VecArrival],
      state: GroupState[BucketState]): Iterator[VecCandidate] = {
    val prior = state.getOption.getOrElse(BucketState(Vector.empty, 0L))
    var ids = prior.ids
    var seen = ids.toSet
    val out = Seq.newBuilder[VecCandidate]
    vecs.toSeq.sortBy(_.vecId).foreach { v =>
      if (!seen.contains(v.vecId)) {
        if (ids.length < maxBucket) {
          out += VecCandidate(v.vecId, v.vec, ids)
          ids = ids :+ v.vecId
          seen += v.vecId
        } else {
          out += VecCandidate(v.vecId, v.vec, Seq.empty)
        }
      }
    }
    state.update(BucketState(ids, 0L))
    out.result().iterator
  }

  /** The stateful candidate stage: vectors → sign bucket → bucket state →
    * (vec, partners) rows.
    */
  def candidates(vecs: DataFrame, idCol: String, vecCol: String,
                 nbits: Int = 8, maxBucket: Int = 10000): Dataset[VecCandidate] = {
    import vecs.sparkSession.implicits._
    vecs.select(bucketExpr(vecCol, nbits).as("bucket"),
        col(idCol).cast("long").as("vecId"),
        col(vecCol).cast("array<double>").as("vec"))
      .as[VecArrival]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(bucketUpdate(maxBucket))
  }

  /** Registry read pruned to the ids this batch verifies against — the
    * partner set is bounded by the batch's candidate volume, never the
    * corpus ([[NearDupStream.prunedRegistry]]'s contract, vector form).
    */
  private[streaming] def prunedRegistry(spark: SparkSession, regPath: String,
                                        partnerIds: Array[Long]): DataFrame = {
    import spark.implicits._
    // schema-pinned + missing-file-tolerant for the same reasons as the
    // anti-join read in verifyAndAppend (ADVICE r08)
    val reg = spark.read
      .schema(RegistrySchema)
      .option("ignoreMissingFiles", "true")
      .parquet(regPath).select("vec_id", "vec")
    if (partnerIds.isEmpty) reg.limit(0)
    else if (partnerIds.length <= 10000)
      reg.filter(col("vec_id").isin(partnerIds.toSeq: _*))
    else
      reg.join(broadcast(partnerIds.toSeq.toDF("vec_id")), Seq("vec_id"), "left_semi")
  }

  /** Per-batch sink: exact cosine over the candidate pairs against the
    * pruned registry ∪ this batch; survivors to `clean/`, all arrivals to
    * `registry/`, batch-id partition dirs (replay-idempotent).
    */
  private[streaming] def verifyAndAppend(workDir: String, threshold: Double)
                                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val arrivals = batch.groupBy(col("vec_id"))
      .agg(first(col("vec")).as("vec"),
        array_distinct(flatten(collect_list(col("partners")))).as("partners"))
      .persist()
    try {
      val regRoot = new Path(s"$workDir/registry")
      val fs = regRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // cross-batch redelivery guard (code-review r7f): an over-cap
      // arrival is never recorded in bucket state, so an at-least-once
      // source can redeliver it in a LATER batch — without this check it
      // would be written to clean/ twice. Any batch vec already present
      // in a PRIOR batch's registry partition is a redelivery and is
      // excluded whole; the CURRENT batch partition must not count
      // (a same-batch replay would otherwise see its own failed write
      // and drop everything). The check is a DISTRIBUTED anti-join
      // against the registry's ID COLUMN only (columnar projection —
      // never the vector bodies, never a driver collect: a rate-free
      // catch-up batch has unbounded distinct ids, unlike the cap-bounded
      // partner set below; code-review r7g).
      // schema-pinned (ADVICE r08): a first-batch crash can leave
      // registry/ existing with only _temporary under it; inference over
      // zero committed files fails the redelivered batch permanently,
      // while a pinned-schema read of an empty root is an empty frame
      val perVec =
        if (fs.exists(regRoot)) {
          val seenBefore = spark.read
            .schema(RegistrySchema)
            .option("ignoreMissingFiles", "true")
            .parquet(regRoot.toString)
            .filter(col("batch") =!= batchId).select("vec_id")
          arrivals.join(seenBefore, Seq("vec_id"), "left_anti")
        } else arrivals
      val here = perVec.select(col("vec_id"), col("vec"))
      val partnerIds = perVec
        .select(explode(col("partners")).as("vec_id")).distinct()
        .as[Long].collect()
      val vecs =
        if (fs.exists(regRoot))
          prunedRegistry(spark, regRoot.toString, partnerIds)
            .unionByName(here)
        else here
      val pairs = perVec
        .select(col("vec_id").as("id_b"), explode(col("partners")).as("id_a"))
      val dropped = pairs
        .join(vecs.select(col("vec_id").as("id_a"), col("vec").as("__va")), Seq("id_a"))
        .join(vecs.select(col("vec_id").as("id_b"), col("vec").as("__vb")), Seq("id_b"))
        // round(·, 6) BEFORE the threshold — bit-for-bit the batch
        // Dedup.embeddingNearDuplicates accept test (code-review r7f)
        .filter(round(Similarity.cosine(col("__va"), col("__vb")), 6) >= threshold)
        .select(col("id_b").as("vec_id")).distinct()
      perVec.join(dropped, Seq("vec_id"), "left_anti")
        .select("vec_id", "vec")
        .write.mode("overwrite").parquet(s"$workDir/clean/batch=$batchId")
      here.write.mode("overwrite").parquet(s"$workDir/registry/batch=$batchId")
    } finally arrivals.unpersist()
  }

  /** The full streaming embedding-dedup leg; caller picks the trigger and
    * starts it, like every writer in the suite.
    */
  def writer(vecs: DataFrame, idCol: String, vecCol: String,
             workDir: String, checkpointDir: String,
             threshold: Double = 0.99, nbits: Int = 8,
             maxBucket: Int = 10000): DataStreamWriter[Row] =
    candidates(vecs, idCol, vecCol, nbits, maxBucket)
      .toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(verifyAndAppend(workDir, threshold) _)

  /** [[RegistrySchema]] minus the dir-derived partition column — the
    * FILE schema, for [[Compaction]] folds and live-dir reads.
    */
  private[streaming] val RegistryDataSchema = "vec_id LONG, vec ARRAY<DOUBLE>"

  /** The surviving (near-dup-free) vectors written so far. Live-dir
    * enumeration ([[Compaction.readLive]]): survivor rows are not
    * duplicate-tolerant, so dirs an interrupted compaction absorbed stay
    * excluded by the marker.
    */
  def survivors(spark: SparkSession, workDir: String): DataFrame =
    Compaction.readLive(spark, s"$workDir/clean", RegistryDataSchema)
      .select("vec_id", "vec")

  /** Fold the per-trigger partition dirs of a long-running stream —
    * registry and clean rows are DISJOINT across live batches (the
    * anti-join admits each vec_id once), so both are plain union folds
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

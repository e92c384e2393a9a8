package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Baseline: brute-force cosine top-k with a two-stage
  * (per-partition, then global) top-k so no single reducer sees the whole
  * corpus. Scale paths: IVF (coarse centroids → probe nearest cells) and
  * random-hyperplane LSH — both turn the scan into an equi-join on a bucket
  * key.
  *
  * All vector math is `zip_with`/`aggregate` higher-order expressions — no
  * UDFs, no driver collect of vectors (the only collected thing is the tiny
  * centroid table, which is by construction `nlist` rows).
  */
object Similarity {

  /** Memo for [[ivfTopK]]'s persisted centroid frames, keyed by the
    * CANONICALIZED corpus plan + column names (ADVICE r5): repeated ANN
    * calls over the same corpus reuse one cached nlist-row frame instead of
    * stacking a fresh persist (and a fresh materializing count() job) per
    * invocation. Entries drop with `Dedup.clearCaches()` via the
    * [[graft.util.Caches.onClear]] hook, together with the retained frames
    * they point at.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(Any, String, String), DataFrame]()
  graft.util.Caches.onClear(() => centroidCache.clear())

  /** Same memo for [[pqCodebook]]: one training per (corpus plan, dim, m,
    * ksub, iters) — a top-k and a recall query over the same corpus share
    * the codebook instead of re-running Lloyd's.
    */
  private val pqCache =
    new java.util.concurrent.ConcurrentHashMap[(Any, Int, Int, Int, Int, String, String), DataFrame]()
  graft.util.Caches.onClear(() => pqCache.clear())

  /** Dot product of two `array<double>` columns — the native codegen'd
    * expression (graft.functions.DotProduct): a fused primitive loop
    * instead of the HOF `aggregate(zip_with(...))` chain. Bit-identical
    * left-to-right IEEE multiply-accumulate for equal-length vectors (the
    * only case ANN sees); on a length mismatch the native form uses the
    * common prefix where the HOF form nulls out (zip_with pads with null).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.DotProduct(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** The composable built-in formulation of [[dot]] (kept as the reference
    * implementation the native expression is tested against).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (0 when either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0d))
  }

  /** Brute-force cosine top-k: `queries` (small: broadcast) × `corpus`
    * (huge: one narrow pass). Two-stage top-k: rank within each scan
    * partition first (cheap, no shuffle), keep ≤ k per partition, THEN
    * shuffle only ~k·numPartitions survivors per query for the global rank.
    * A single global window over the full corpus would funnel every score
    * through numQueries reducers — this shape doesn't.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     qId: String = "q_id", qVec: String = "q_vec",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col(qId), col(cId),
        cosine(col(qVec), col(cVec)).as("sim"),
        spark_partition_id().as("__part"))
    twoStageTopK(scored, k, qId, cId)
  }

  /** The shared two-stage top-k tail: rank within each scan partition
    * first (cheap, no shuffle), keep ≤ k per partition, THEN shuffle only
    * ~k·numPartitions survivors per query for the global rank. Expects
    * `(qId, cId, sim, __part)`.
    */
  private def twoStageTopK(scored: DataFrame, k: Int,
                           qId: String, cId: String): DataFrame = {
    val localW = Window.partitionBy(col(qId), col("__part"))
      .orderBy(col("sim").desc, col(cId))
    val globalW = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId))
    scored
      .withColumn("__lr", row_number().over(localW)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Hard-negative mining for embedding-model training data: per query,
    * the top-k most-similar corpus vectors whose label DIFFERS from the
    * query's — the high-cosine wrong-class examples a contrastive run
    * wants in its batches. The same broadcast + two-stage top-k shape as
    * [[bruteForceTopK]]; the label inequality rides the broadcast join
    * condition, so same-class pairs drop AT THE SCAN, before either
    * window. For corpora beyond a brute-force pass, feed a candidate set
    * from [[lshTopK]]/[[ivfTopK]] through the same label filter instead.
    */
  def hardNegativesTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                        qId: String = "q_id", qVec: String = "q_vec",
                        qLabel: String = "q_label",
                        cId: String = "vec_id", cVec: String = "embedding",
                        cLabel: String = "label"): DataFrame = {
    val scored = corpus.join(broadcast(queries), col(qLabel) =!= col(cLabel))
      .select(col(qId), col(cId),
        cosine(col(qVec), col(cVec)).as("sim"),
        spark_partition_id().as("__part"))
    twoStageTopK(scored, k, qId, cId)
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix parallel-corpus miner behind the public translation
    * training sets): a candidate pair (x, y) scores
    * `margin = cos(x,y) / ((avgTopK(x→tgt) + avgTopK(y→src)) / 2)` —
    * absolute cosine is NOT comparable across embedding neighborhoods
    * (hubness), so the score normalizes by each side's top-k
    * neighborhood density; a pair survives iff it is the MUTUAL
    * margin-argmax of both its members and clears `threshold`.
    *
    * Deterministic end to end: the two top-k legs are
    * [[bruteForceTopK]] (round-6 sims), neighborhood averages sum the
    * ROUNDED sims through an exact decimal accumulator (the suite rule:
    * never sum raw doubles under an oracle), and margins round to 6
    * before the argmax windows (ties to the lower id) — so the mined
    * set replays verbatim in SQL. Scale shape: both legs are the
    * broadcast-query brute-force pass (fine for the query-sized side;
    * for two web-scale sides feed ANN candidates — [[ivfTopK]] /
    * [[binaryTopK]] — through the same margin + mutual filter), the
    * margin join touches top-k candidate pairs only, and the argmax
    * windows partition on ids.
    */
  def bitextMine(src: DataFrame, tgt: DataFrame, k: Int = 4,
                 threshold: Double = 1.0,
                 sId: String = "src_id", sVec: String = "src_vec",
                 tId: String = "tgt_id", tVec: String = "tgt_vec"): DataFrame = {
    require(k >= 1, s"neighborhood size must be positive, got $k")
    val dec = org.apache.spark.sql.types.DecimalType(16, 6)
    val fwd = bruteForceTopK(src, tgt, k, qId = sId, qVec = sVec,
      cId = tId, cVec = tVec)
    val bwd = bruteForceTopK(tgt, src, k, qId = tId, qVec = tVec,
      cId = sId, cVec = sVec)
    def nbAvg(leg: DataFrame, id: String, out: String): DataFrame =
      leg.groupBy(col(id))
        .agg((sum(col("sim").cast(dec)).cast("double") / count(lit(1))).as(out))
    val cands = fwd.select(col(sId), col(tId))
      .unionByName(bwd.select(col(sId), col(tId)))
      .distinct()
    val scored = cands
      .join(src.select(col(sId), col(sVec)), Seq(sId))
      .join(tgt.select(col(tId), col(tVec)), Seq(tId))
      .select(col(sId), col(tId),
        round(cosine(col(sVec), col(tVec)), 6).as("sim"))
      .join(nbAvg(fwd, sId, "__af"), Seq(sId))
      .join(nbAvg(bwd, tId, "__ab"), Seq(tId))
      .select(col(sId), col(tId), col("sim"),
        round(col("sim") / ((col("__af") + col("__ab")) / 2.0), 6).as("margin"))
    val sW = Window.partitionBy(col(sId)).orderBy(col("margin").desc, col(tId))
    val tW = Window.partitionBy(col(tId)).orderBy(col("margin").desc, col(sId))
    scored
      .withColumn("__rs", row_number().over(sW))
      .withColumn("__rt", row_number().over(tW))
      .filter(col("__rs") === 1 && col("__rt") === 1 &&
        col("margin") >= threshold)
      .select(col(sId), col(tId), col("sim"), col("margin"))
  }

  /** Binary (sign-bit) embedding quantization with exact rescore — the
    * modern vector-store first pass (e.g. the "binary quantization" tier
    * production vector DBs ship): each vector compresses to ONE long of
    * sign bits (32×+ smaller than float32, 64× smaller than doubles), the
    * scan ranks by Hamming distance (a register XOR + popcount per
    * candidate — no float math touches the corpus pass), and only the
    * top `rescore · k` Hamming survivors pay an exact cosine against the
    * full vectors. Sign-bit Hamming is a monotone proxy for angular
    * distance in expectation, so the standard recipe is a generous
    * rescore window rather than a tight one.
    *
    * Deterministic end to end (sign of a double, integer popcount, the
    * suite's tie conventions) — the ann_binary_topk oracle replays
    * packing, Hamming ranking, and the cosine rescore verbatim. Scale
    * shape: the Hamming scan is the [[bruteForceTopK]] broadcast cross
    * over 8-byte codes (two-stage top-R, no global funnel); the rescore
    * join touches `nq · rescore · k` full vectors only.
    */
  def binaryTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                 rescore: Int = 4,
                 qId: String = "q_id", qVec: String = "q_vec",
                 cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(dim >= 1 && dim <= 64, s"sign bits pack into one long: dim=$dim")
    binaryScore(queries,
      corpus.select(col(cId), binaryPack(col(cVec), dim).as("__cc")),
      corpus, dim, k, rescore, qId, qVec, cId, cVec)
  }

  /** Sign-bit packing: one long per vector, bit i = (v(i) > 0). */
  private def binaryPack(vec: Column, dim: Int): Column =
    (0 until dim).map(i =>
      when(element_at(vec, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)

  /** Encode the corpus' sign-bit codes ONCE and commit them to a
    * [[graft.state.SnapshotStore]] root (VERDICT r15 #3 applied to the
    * binary tier, the [[ivfPqCommit]] stance): a serving deployment
    * encodes per corpus refresh and Hamming-scans the stored codes —
    * never re-packing the full float corpus per query batch. One table:
    * `codes(cId, code)`.
    */
  def binaryCommit(corpus: DataFrame, root: String, dim: Int,
                   cId: String = "vec_id", cVec: String = "embedding",
                   batchId: Long = 0L): Unit = {
    require(dim >= 1 && dim <= 64, s"sign bits pack into one long: dim=$dim")
    val codes = corpus.select(col(cId), binaryPack(col(cVec), dim).as("__cc"))
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    graft.state.SnapshotStore.commit(fs, rootPath, batchId,
      Map("codes" -> codes))
  }

  /** Serve binary-quantized top-k from STORED codes: the Hamming scan
    * reads the committed code table (8 bytes/vector — never the float
    * corpus), and only the k·rescore survivors join back to the PRIMARY
    * store `corpus` for the exact-cosine rescore — the standard
    * coarse-index-plus-primary-rerank serving shape. Answers
    * [[binaryTopK]]'s oracle verbatim from the stored index.
    */
  def binaryServe(queries: DataFrame, corpus: DataFrame, root: String,
                  dim: Int, k: Int, rescore: Int = 4,
                  qId: String = "q_id", qVec: String = "q_vec",
                  cId: String = "vec_id", cVec: String = "embedding",
                  versionAsOf: Option[Long] = None): DataFrame = {
    val codes = graft.state.SnapshotStore
      .read(queries.sparkSession, root, "codes", versionAsOf)
    binaryScore(queries, codes, corpus, dim, k, rescore,
      qId, qVec, cId, cVec)
  }

  /** The query side of the binary tier: Hamming scan over `codes`
    * (cId, __cc), two-stage top-(k·rescore), exact-cosine rerank against
    * `corpus`.
    */
  private def binaryScore(queries: DataFrame, codes: DataFrame,
                          corpus: DataFrame, dim: Int, k: Int, rescore: Int,
                          qId: String, qVec: String,
                          cId: String, cVec: String): DataFrame = {
    require(k >= 1 && rescore >= 1, s"bad k=$k/rescore=$rescore")
    val r = k * rescore
    val qcodes = queries.select(col(qId), col(qVec),
      binaryPack(col(qVec), dim).as("__qc"))
    val ham = codes
      .join(broadcast(qcodes))
      .select(col(qId), col(cId),
        bit_count(col("__cc").bitwiseXOR(col("__qc"))).as("hamming"),
        spark_partition_id().as("__part"))
    val localW = Window.partitionBy(col(qId), col("__part"))
      .orderBy(col("hamming"), col(cId))
    val globalW = Window.partitionBy(col(qId)).orderBy(col("hamming"), col(cId))
    val cands = ham
      .withColumn("__lr", row_number().over(localW)).filter(col("__lr") <= r)
      .withColumn("__hr", row_number().over(globalW)).filter(col("__hr") <= r)
      .select(col(qId), col(cId), col("hamming"))
    val rescored = cands
      .join(corpus.select(col(cId), col(cVec)), Seq(cId))
      .join(broadcast(queries.select(col(qId), col(qVec))), Seq(qId))
      .select(col(qId), col(cId), col("hamming"),
        cosine(col(qVec), col(cVec)).as("sim"))
    val finW = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    rescored.withColumn("rank", row_number().over(finW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), col("hamming"),
        round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** IVF "training": one centroid per coarse cell — here the mean vector per
    * existing cluster column (e.g. a pretrained label), computed with
    * posexplode → (cell, pos) average → re-assembled. One aggregation pass.
    *
    * The mean is an exact decimal sum divided in double, NOT avg() over raw
    * doubles: distributed double summation is combine-order-dependent, and
    * this operator sits under an oracled bit-exact query (code-review r3 —
    * the repo rule is "never sum raw doubles in an oracled path").
    */
  def centroids(corpus: DataFrame, cellCol: String, vecCol: String = "embedding"): DataFrame =
    corpus.select(col(cellCol).as("cell"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("cell", "pos")
      .agg((sum(col("v").cast(org.apache.spark.sql.types.DecimalType(27, 15)))
        .cast("double") / count(col("v"))).as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))

  /** IVF coarse quantizer training: Lloyd's k-means over the corpus,
    * DataFrame-only (VERDICT r02 noted ivfTopK needed a pre-existing cell
    * column — this builds one). Deterministic: seeds are the k lowest-id
    * vectors; assignment ties break toward the lower cell id via the
    * struct-max trick. Each iteration is one broadcast join (centroids are
    * k rows) + one `max_by` hash aggregation + one re-averaging pass —
    * no windows over the corpus, no driver-side vectors; centroids are
    * persisted per iteration to keep the plan depth constant.
    */
  def kmeansCells(corpus: DataFrame, k: Int, iters: Int,
                  cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(iters > 0, s"kmeansCells needs at least one iteration, got $iters")
    kmeansFloatTrain(corpus, k, iters, cId, cVec) match {
      case None => kmeansCellsJoinLoop(corpus, k, iters, cId, cVec)
      case Some(cents) if cents.isEmpty =>
        corpus.select(col(cId), lit(0).as("cell")).limit(0)
      case Some(cents) =>
        corpus.select(col(cId),
          argmaxCellCosine(col(cVec), cents).as("cell"))
    }
  }

  /** `corpus` with its trained float-kmeans cell ATTACHED as one
    * projection — for callers that previously joined [[kmeansCells]]'
    * output back onto the corpus by id (a corpus⋈corpus self-join the
    * projection form makes redundant). Falls back to that join past the
    * literal cap. Same training, same assignment values as
    * [[kmeansCells]].
    */
  def kmeansCellsAttach(corpus: DataFrame, k: Int, iters: Int,
                        cId: String = "vec_id",
                        cVec: String = "embedding"): DataFrame = {
    require(iters > 0, s"kmeansCellsAttach needs at least one iteration, got $iters")
    kmeansFloatTrain(corpus, k, iters, cId, cVec) match {
      case None =>
        corpus.join(kmeansCellsJoinLoop(corpus, k, iters, cId, cVec), Seq(cId))
      case Some(cents) if cents.isEmpty =>
        corpus.withColumn("cell", lit(0)).limit(0)
      case Some(cents) =>
        corpus.withColumn("cell", argmaxCellCosine(col(cVec), cents))
    }
  }

  /** [[kmeansCellsAttach]]'s fixed-point twin. */
  def kmeansCellsFixedAttach(corpus: DataFrame, k: Int, iters: Int,
                             scale: Long = 1L << 20,
                             cId: String = "vec_id",
                             cVec: String = "embedding"): DataFrame = {
    require(iters > 0, s"kmeansCellsFixedAttach needs at least one iteration, got $iters")
    require(scale > 0 && (scale & (scale - 1)) == 0,
      s"scale must be a positive power of two (exact IEEE multiply), got $scale")
    val scaled = corpus.select(col(cId),
      transform(col(cVec), x => floor(x * scale).cast("long")).as("__sv"))
    kmeansFixedTrain(scaled, k, iters, cId) match {
      case None =>
        corpus.join(kmeansCellsFixedJoinLoop(scaled, k, iters, cId), Seq(cId))
      case Some(cents) if cents.isEmpty =>
        corpus.withColumn("cell", lit(0)).limit(0)
      case Some(cents) =>
        corpus.withColumn("cell", argminCellFixed(
          transform(col(cVec), x => floor(x * scale).cast("long")), cents))
    }
  }

  /** The float Lloyd's loop with the assignment inlined as
    * [[argmaxCellCosine]] over driver-resident centroids — the
    * [[kmeansFixedTrain]] rework on the cosine/avg family. One job per
    * refinement instead of a broadcast-join explosion + per-vector
    * re-aggregation + persist/count barrier. The float means are avg()
    * like before; their partial-sum order (and therefore the low ulps of
    * the trained centroids) has ALWAYS been partitioning-dependent — this
    * family's queries are the structural-invariant ones for exactly that
    * reason (the ann_ivf_valid stance), and the fixed-point twin carries
    * every verbatim-replay oracle.
    */
  private def kmeansFloatTrain(corpus: DataFrame, k: Int, iters: Int,
                               cId: String,
                               cVec: String): Option[Seq[(Int, Seq[Double])]] = {
    var cents: Seq[(Int, Seq[Double])] = corpus.orderBy(col(cId)).limit(k)
      .select(col(cVec)).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](0).toIndexedSeq) }
      .toIndexedSeq
    if (cents.headOption.exists(c => k.toLong * c._2.length > ArgminLiteralCap))
      return None
    for (_ <- 1 until iters) {
      if (cents.nonEmpty)
        cents = corpus
          .select(argmaxCellCosine(col(cVec), cents).as("cell"),
            posexplode(col(cVec)).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(avg("v").as("m"))
          .collect()
          .groupBy(_.getInt(0)).toSeq
          .map { case (cell, rows) =>
            (cell, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq)
          }
          .sortBy(_._1)
    }
    Some(cents)
  }

  /** The pre-r18 broadcast-join float loop, kept as the past-cap
    * fallback.
    */
  private def kmeansCellsJoinLoop(corpus: DataFrame, k: Int, iters: Int,
                                  cId: String, cVec: String): DataFrame = {
    var cents = corpus.orderBy(col(cId)).limit(k)
      .select(col(cId), col(cVec))
      .withColumn("cell", row_number().over(Window.orderBy(col(cId))) - 1)
      .select(col("cell"), col(cVec).as("centroid"))
    var assigned: DataFrame = null
    var backingAssigned: DataFrame = null // cents the current `assigned` reads
    for (i <- 1 to iters) {
      assigned = corpus.join(broadcast(cents))
        .select(col(cId), col(cVec),
          col("cell"), cosine(col(cVec), col("centroid")).as("csim"))
        .groupBy(col(cId)).agg(
          max_by(col("cell"), struct(col("csim"), -col("cell"))).as("cell"),
          first(col(cVec)).as(cVec))
      // the centroids from two rounds back are referenced by nothing now
      if (backingAssigned != null && (backingAssigned ne cents))
        backingAssigned.unpersist()
      backingAssigned = cents
      // the final iteration's assignment is the result — re-averaging its
      // centroids would be a full wasted pass over the corpus
      if (i < iters) {
        cents = assigned
          .select(col("cell"), posexplode(col(cVec)).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(avg("v").as("m"))
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("centroid"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cents.count() // materialize so the next iteration's plan stays flat
      }
    }
    // exactly one cached frame (the centroids the returned assignment
    // reads) survives; registered for release via Dedup.clearCaches
    if (backingAssigned != null) graft.util.Caches.retain(backingAssigned)
    assigned.select(col(cId), col("cell"))
  }

  /** FIXED-POINT Lloyd's k-means — [[kmeansCells]]'s engine-replayable
    * twin (VERDICT r13 #3, the g_pagerank scaled-long stance): every
    * coordinate scales to a long by `floor(x · scale)` with a
    * power-of-two scale (an IEEE multiply by 2^20 only shifts the
    * exponent — exact, no rounding-mode dependence — and floor is
    * unambiguous across engines), assignment is the integer argmin of
    * squared L2 distance (ties to the lower cell), and centroid updates
    * are integral `div` means (truncation toward zero, matching DuckDB's
    * `//`). No float accumulates anywhere, so the trained assignment is
    * bit-identical across engines, partitionings, and run orders — the
    * ann_ivf_kmeans / knn_graph oracles replay the full training.
    * Same per-iteration plan shape as [[kmeansCells]]: one broadcast
    * join + one min_by hash aggregation + one re-averaging pass; the
    * float twin stays the raw-throughput default for callers that don't
    * need replayability (AnnStream's cadenced refit).
    *
    * Overflow headroom (ANSI mode throws on breach, never wraps):
    * |x| ≤ 64 at scale 2^20 keeps per-dimension diffs < 2^28, squares
    * < 2^55, and 512-dim sums < 2^63 — unit-norm embeddings sit orders
    * of magnitude inside the envelope.
    */
  /** Max centroid-table entries (cells × dim) the expression-argmin form
    * embeds as literals; past it the broadcast-join Lloyd's loop runs
    * unchanged. Every suite caller sits orders of magnitude under it
    * (k ≤ 16, dim ≤ 64 → ≤ 1024 entries ≈ 8 KB of plan); the cap exists
    * for a production nlist (tens of thousands of cells), where a
    * megabyte-scale literal table in every task binary would itself
    * become the cost (the exactGroups InSet lesson).
    */
  private val ArgminLiteralCap = 1 << 16

  /** Integer argmin cell over a DRIVER-RESIDENT centroid table, as one
    * codegen-friendly expression: the distances evaluate into an array,
    * `array_position(ds, array_min(ds))` finds the FIRST index achieving
    * the minimum, and the (ascending-sorted) cell-id literal maps it back
    * — exactly `min_by(cell, struct(d2, cell))`: min distance, ties to
    * the lower cell. Integer math end to end, so the value is
    * bit-identical to the join form's.
    */
  private def argminCellFixed(sv: Column,
                              cents: Seq[(Int, Seq[Long])]): Column = {
    val ds = array(cents.map { case (_, cent) => d2Fixed(sv, typedLit(cent)) }: _*)
    element_at(typedLit(cents.map(_._1)),
      array_position(ds, array_min(ds)).cast("int"))
  }

  /** Cosine argmax cell over a driver-resident (ascending-sorted)
    * centroid table — first index achieving the maximum similarity =
    * `max_by(cell, struct(csim, -cell))`: max similarity, ties to the
    * LOWER cell.
    */
  private[graft] def argmaxCellCosine(vec: Column,
                                      cents: Seq[(Int, Seq[Double])]): Column = {
    val ss = array(cents.map { case (_, cent) => cosine(vec, typedLit(cent)) }: _*)
    element_at(typedLit(cents.map(_._1)),
      array_position(ss, array_max(ss)).cast("int"))
  }

  /** The integer Lloyd's loop over a pre-scaled `(cId, __sv)` frame,
    * returning the FINAL centroid table as driver rows (r18, guide
    * §2.3/§2.4 — the "kmeans-centroid class" of bounded metadata): each
    * refinement is ONE job — the per-(cell, pos) integral-div means with
    * the assignment computed INLINE by [[argminCellFixed]] — instead of
    * the join form's corpus×k broadcast-join explosion, per-vector
    * re-aggregation shuffle, and persist+count barrier. Integer sums are
    * order-independent, so centroids (and therefore every assignment) are
    * bit-identical to the join loop's — the ann_ivf_kmeans / knn_graph /
    * ann_ivfpq_topk oracles replay either form.
    */
  private[operators] def kmeansFixedTrain(scaled: DataFrame, k: Int,
                                          iters: Int,
                                          cId: String): Option[Seq[(Int, Seq[Long])]] = {
    var cents: Seq[(Int, Seq[Long])] = scaled.orderBy(col(cId)).limit(k)
      .select(col("__sv")).collect()
      .zipWithIndex.map { case (r, i) => (i, r.getSeq[Long](0).toIndexedSeq) }
      .toIndexedSeq
    // the seed rows reveal the vector width: past the literal-table cap,
    // signal the caller to run the broadcast-join loop instead
    if (cents.headOption.exists(c => k.toLong * c._2.length > ArgminLiteralCap))
      return None
    for (_ <- 1 until iters) {
      if (cents.nonEmpty)
        cents = scaled
          .select(argminCellFixed(col("__sv"), cents).as("cell"),
            posexplode(col("__sv")).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(expr("sum(v) div count(v)").as("m"))
          .collect()
          .groupBy(_.getInt(0)).toSeq
          .map { case (cell, rows) =>
            (cell, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toIndexedSeq)
          }
          .sortBy(_._1)
    }
    Some(cents)
  }

  def kmeansCellsFixed(corpus: DataFrame, k: Int, iters: Int,
                       scale: Long = 1L << 20,
                       cId: String = "vec_id",
                       cVec: String = "embedding"): DataFrame = {
    require(iters > 0, s"kmeansCellsFixed needs at least one iteration, got $iters")
    require(scale > 0 && (scale & (scale - 1)) == 0,
      s"scale must be a positive power of two (exact IEEE multiply), got $scale")
    val scaled = corpus.select(col(cId),
      transform(col(cVec), x => floor(x * scale).cast("long")).as("__sv"))
    kmeansFixedTrain(scaled, k, iters, cId) match {
      case None => kmeansCellsFixedJoinLoop(scaled, k, iters, cId)
      case Some(cents) if cents.isEmpty =>
        scaled.select(col(cId), lit(0).as("cell")).limit(0)
      case Some(cents) =>
        // the final assignment is a pure projection — no shuffle, and each
        // consumer reference re-executes a scan+project instead of the
        // join form's join+aggregate
        scaled.select(col(cId), argminCellFixed(col("__sv"), cents).as("cell"))
    }
  }

  /** The pre-r18 broadcast-join Lloyd's loop, kept verbatim as the
    * past-cap fallback (production nlist too large for a literal table).
    */
  private def kmeansCellsFixedJoinLoop(scaled: DataFrame, k: Int, iters: Int,
                                       cId: String): DataFrame = {
    val d2 = d2Fixed(col("__sv"), col("__cent"))
    var cents = scaled.orderBy(col(cId)).limit(k)
      .withColumn("cell", row_number().over(Window.orderBy(col(cId))) - 1)
      .select(col("cell"), col("__sv").as("__cent"))
    var assigned: DataFrame = null
    var backingAssigned: DataFrame = null
    for (i <- 1 to iters) {
      assigned = scaled.join(broadcast(cents))
        .select(col(cId), col("__sv"), col("cell"), d2.as("__d2"))
        .groupBy(col(cId)).agg(
          min_by(col("cell"), struct(col("__d2"), col("cell"))).as("cell"),
          first(col("__sv")).as("__sv"))
      if (backingAssigned != null && (backingAssigned ne cents))
        backingAssigned.unpersist()
      backingAssigned = cents
      if (i < iters) {
        cents = assigned
          .select(col("cell"), posexplode(col("__sv")).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(expr("sum(v) div count(v)").as("m"))
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
          .select(col("cell"),
            transform(col("pm"), p => p.getField("m")).as("__cent"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cents.count() // materialize so the next iteration's plan stays flat
      }
    }
    if (backingAssigned != null) graft.util.Caches.retain(backingAssigned)
    assigned.select(col(cId), col("cell"))
  }

  /** IVF probe: route each query to its `nprobe` nearest centroids (tiny
    * broadcast cross), then search ONLY corpus rows in those cells — the
    * cell equi-join prunes the scan to nprobe/nlist of the corpus before
    * any distance math runs.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int,
              nprobe: Int = 2, qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    // Materialize the nlist-row centroid frame BEFORE the probe join
    // (VERDICT r04 #3): un-persisted, the full corpus aggregation behind
    // centroids() rides inside the probes broadcast subtree — and when the
    // corpus itself carries an expensive subtree (ann_ivf_kmeans stacks the
    // k-means assignment under it), that whole tree re-plans under the
    // nested broadcast instead of reading nlist cached rows. The cache is
    // nlist rows (session-lived, released via Dedup.clearCaches — see
    // graft.util.Caches), keyed by the canonicalized corpus plan so
    // repeated calls reuse ONE entry — and only the first call for a given
    // corpus pays the materializing count() job (ADVICE r5).
    // compute + liveness check, not computeIfAbsent: spark.catalog
    // .clearCache() strips the memoized frame's persist entry without
    // going through the Caches.onClear hook, and a dead memo re-runs the
    // corpus aggregation on every reference (the pipeline_curate stale-memo
    // bug, round 8)
    val cents = centroidCache.compute(
      (corpus.queryExecution.analyzed.canonicalized, cellCol, cVec),
      (_, prev) =>
        if (prev != null && prev.storageLevel !=
          org.apache.spark.storage.StorageLevel.NONE) prev
        else {
          val c = graft.util.Caches.retain(
            centroids(corpus, cellCol, cVec)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          c.count()
          c
        })
    val probeW = Window.partitionBy(col(qId)).orderBy(col("csim").desc, col("cell"))
    val probes = queries.join(broadcast(cents))
      .select(col(qId), col(qVec), col("cell"),
        cosine(col(qVec), col("centroid")).as("csim"))
      .withColumn("__r", row_number().over(probeW)).filter(col("__r") <= nprobe)
      .select(col(qId), col(qVec), col("cell"))
    val pruned = corpus.join(broadcast(probes), corpus(cellCol) === probes("cell"))
    val globalW = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    pruned.select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("sim"))
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Squared L2 distance — fixed left-to-right HOF fold, so every call
    * site (codebook training, encoding, ADC tables) computes bit-identical
    * doubles for the same operands; the PQ recall invariant depends on it.
    */
  def sqDist(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.SqDiffDouble(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** The composable built-in formulation of [[sqDist]] (reference
    * implementation the native kernel is tested against).
    */
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)

  /** The m fixed-width subvectors of `vec` as (subspace, sub) structs.
    * The length guard rides inside the expression (assert_true is null on
    * success, like intervalJoin's span guard): a vector that is not
    * `dim`-long fails the job loudly instead of letting zip_with pad the
    * distance folds with null — which would sort nulls FIRST in the
    * ascending top-k and return garbage neighbors silently.
    */
  private def subvecs(vec: Column, dim: Int, m: Int): Column = {
    val dsub = dim / m
    val checked = when(
      assert_true(size(vec) === dim,
        concat(lit("pq: vector length "), size(vec).cast("string"),
          lit(s" != dim $dim"))).isNull, vec)
    array((0 until m).map(j => struct(lit(j).as("subspace"),
      slice(checked, j * dsub + 1, dsub).as("sub"))): _*)
  }

  /** Product-quantization codebook: `m` independent `ksub`-centroid
    * k-means runs — one per subspace — trained TOGETHER in a single
    * Lloyd's loop by keying every step on (subspace, cell), so each
    * iteration is one corpus scan (explode to m subvector rows), one
    * broadcast join against the m×ksub codebook, one min_by hash
    * aggregation, and one re-averaging pass — never m separate jobs.
    * Deterministic: seeds are the subvectors of the ksub lowest-id corpus
    * rows (a TakeOrdered, not a per-subspace window over the corpus);
    * assignment ties break toward the lower cell. Cells are re-indexed
    * contiguously per subspace at the end so ADC tables can use positional
    * lookup; empty cells simply vanish. Returns (subspace, cell, centroid),
    * m×ksub rows — broadcast-sized by construction.
    */
  def pqCodebook(corpus: DataFrame, dim: Int, m: Int, ksub: Int = 16,
                 iters: Int = 2, cId: String = "vec_id",
                 cVec: String = "embedding"): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(ksub > 0 && iters > 0, s"need positive ksub/iters: $ksub/$iters")
    pqCache.compute(
      // cId/cVec are part of the key (like centroidCache): the same corpus
      // plan trained over a different vector or seed-id column is a
      // DIFFERENT codebook. Liveness-checked like centroidCache — a dead
      // memoized codebook is the WORST case of the stale-memo bug: its
      // plan chains every Lloyd's iteration, so re-referencing it uncached
      // re-executes the whole training loop as one deep nested join.
      (corpus.queryExecution.analyzed.canonicalized, dim, m, ksub, iters,
        cId, cVec),
      (_, prev) =>
        if (prev != null && prev.storageLevel !=
          org.apache.spark.storage.StorageLevel.NONE) prev
        else trainPqCodebook(corpus, dim, m, ksub, iters, cId, cVec))
  }

  /** [[pqRefitFixed]]'s float twin: avg() means, sqDist assignment. */
  private def pqRefitFloat(frame: DataFrame, svArr: Column, m: Int,
                           book: DriverBook[Double]): DriverBook[Double] = {
    val codes = pqCodesExpr[Double](svArr, m, book, sqDist)
    frame
      .select(codes.as("__codes"),
        posexplode(svArr).as(Seq("__j", "__sv")))
      .select(col("__sv").getField("subspace").as("subspace"),
        element_at(col("__codes"), col("__j") + 1).as("code"),
        posexplode(col("__sv").getField("sub")).as(Seq("pos", "v")))
      .groupBy("subspace", "code", "pos")
      .agg(avg("v").as("mv"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1))).toSeq
      .map { case ((j, code), rows) =>
        (j, code, rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toIndexedSeq)
      }
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
  }

  private def trainPqCodebook(corpus: DataFrame, dim: Int, m: Int, ksub: Int,
                              iters: Int, cId: String, cVec: String): DataFrame = {
    val spark = corpus.sparkSession
    if (ksub.toLong * dim > ArgminLiteralCap)
      return trainPqCodebookJoinLoop(corpus, dim, m, ksub, iters, cId, cVec)
    val svArr = subvecs(col(cVec), dim, m)
    val seedRows = corpus.orderBy(col(cId)).limit(ksub)
      .select(svArr.as("svs")).collect()
    var book: DriverBook[Double] = (0 until m).map { j =>
      j -> seedRows.toSeq.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[org.apache.spark.sql.Row](0)(j).getSeq[Double](1).toIndexedSeq)
      }
    }.toMap
    for (_ <- 1 to iters)
      book = pqRefitFloat(corpus, svArr, m, book)
    import spark.implicits._
    val df = graft.util.Caches.retain(
      spark.createDataset(bookRows(reindexBook(book)))
        .toDF("subspace", "cell", "centroid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    df.count()
    df
  }

  /** The pre-r18 broadcast-join float PQ trainer — past-cap fallback. */
  private def trainPqCodebookJoinLoop(corpus: DataFrame, dim: Int, m: Int, ksub: Int,
                                      iters: Int, cId: String, cVec: String): DataFrame = {
    val subs = corpus.select(col(cId).as("__id"),
      explode(subvecs(col(cVec), dim, m)).as("sv"))
      .select(col("__id"), col("sv.subspace").as("subspace"),
        col("sv.sub").as("sub"))
    // seeds: ksub lowest GLOBAL ids (TakeOrderedAndProject — no window
    // shuffling the corpus into m reducers), each contributing one seed
    // subvector per subspace
    var cb = corpus.orderBy(col(cId)).limit(ksub)
      .select(col(cId).as("__id"), explode(subvecs(col(cVec), dim, m)).as("sv"))
      .select(col("__id"), col("sv.subspace").as("subspace"),
        col("sv.sub").as("sub"))
      .withColumn("cell", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("__id"))) - 1)
      .select(col("subspace"), col("cell"), col("sub").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = subs.join(broadcast(cb), Seq("subspace"))
        .select(col("__id"), col("subspace"), col("sub"), col("cell"),
          sqDist(col("sub"), col("centroid")).as("d2"))
        .groupBy(col("__id"), col("subspace"))
        .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
          first(col("sub")).as("sub"))
      val next = assigned
        .select(col("subspace"), col("cell"),
          posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy("subspace", "cell", "pos").agg(avg("v").as("mv"))
        .groupBy("subspace", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("subspace"), col("cell"),
          transform(col("pm"), p => p.getField("mv")).as("centroid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize so the next iteration's plan stays flat
      // next is materialized, so the codebook it was derived from (the
      // seed frame on iteration 1 is simply un-persisted) can release now
      if (cb.storageLevel.useMemory) cb.unpersist()
      cb = next
    }
    // contiguous cell ids per subspace (positional-lookup contract); the
    // window runs over the m×ksub codebook rows, not the corpus
    val reindexed = graft.util.Caches.retain(cb
      .withColumn("cell", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("cell"))) - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    reindexed.count()
    cb.unpersist()
    reindexed
  }

  /** PQ encoding: each corpus vector compressed to `m` small codes —
    * nearest codebook cell per subspace, assembled subspace-ordered into
    * one `codes` array per row. One corpus scan, one broadcast join, one
    * hash aggregation; the result is the 100 TB-resident form (m bytes of
    * information per vector instead of dim floats).
    */
  def pqCodes(corpus: DataFrame, codebook: DataFrame, dim: Int, m: Int,
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame =
    collectBookDouble(codebook) match {
      case Some(book) =>
        // one projection against the driver-resident codebook (r18) —
        // same double argmins, no explode/join/re-aggregation
        corpus.select(col(cId),
          pqCodesExpr(subvecs(col(cVec), dim, m), m, book, sqDist).as("codes"))
      case None =>
        corpus.select(col(cId), explode(subvecs(col(cVec), dim, m)).as("sv"))
          .select(col(cId), col("sv.subspace").as("subspace"), col("sv.sub").as("sub"))
          .join(broadcast(codebook), Seq("subspace"))
          .select(col(cId), col("subspace"), col("cell"),
            sqDist(col("sub"), col("centroid")).as("d2"))
          .groupBy(col(cId), col("subspace"))
          .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("code"))
          .groupBy(col(cId))
          .agg(array_sort(collect_list(struct(col("subspace"), col("code")))).as("sc"))
          .select(col(cId), transform(col("sc"), s => s.getField("code")).as("codes"))
    }

  /** [[collectBookLong]]'s float twin. */
  private def collectBookDouble(codebook: DataFrame): Option[DriverBook[Double]] = {
    val rows = codebook.select(col("subspace"),
      codebook.columns.find(c => c == "cell" || c == "code")
        .fold(col("cell"))(col).as("code"), col("centroid")).collect()
    val entries = rows.map(_.getSeq[Double](2).length.toLong).sum
    if (entries > ArgminLiteralCap) None
    else Some(rows.toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap)
  }

  /** Asymmetric-distance PQ scores: every (query, corpus vector) pair's
    * approximate squared L2 distance = Σ_j table[j][code_j], where the
    * per-query table holds the exact distances from the query's j-th
    * subvector to every cell centroid. The table (nq × m × ksub doubles)
    * broadcasts; scoring is ONE narrow pass over the code rows with a
    * fixed-order fold — no shuffle at all after encoding. Structural
    * invariant (the recall oracle pins it): a query that exists in the
    * corpus scores Σ_j min_c d2(q_j, c) — termwise minimal, and IEEE
    * rounding is monotone under same-order summation — so its own row
    * ALWAYS achieves the minimum ADC distance.
    */
  def pqScores(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
               dim: Int, m: Int, qId: String = "q_id",
               qVec: String = "q_vec", cId: String = "vec_id"): DataFrame = {
    // per-query lookup table, rows ordered (subspace, cell) to match the
    // positional contract from pqCodebook's re-indexing
    val qtab = queries
      .select(col(qId), explode(subvecs(col(qVec), dim, m)).as("sv"))
      .select(col(qId), col("sv.subspace").as("subspace"), col("sv.sub").as("qsub"))
      .join(broadcast(codebook), Seq("subspace"))
      .select(col(qId), col("subspace"), col("cell"),
        sqDist(col("qsub"), col("centroid")).as("pd2"))
      .groupBy(col(qId), col("subspace"))
      .agg(array_sort(collect_list(struct(col("cell"), col("pd2")))).as("cp"))
      .select(col(qId), col("subspace"),
        transform(col("cp"), c => c.getField("pd2")).as("row"))
      .groupBy(col(qId))
      .agg(array_sort(collect_list(struct(col("subspace"), col("row")))).as("sr"))
      .select(col(qId), transform(col("sr"), s => s.getField("row")).as("tbl"))
    codes.join(broadcast(qtab))
      .select(col(qId), col(cId),
        aggregate(
          zip_with(col("codes"), col("tbl"),
            (c, row) => element_at(row, c.cast("int") + 1)),
          lit(0.0d), (acc, v) => acc + v).as("adc_dist"))
  }

  /** PQ ANN top-k: train → encode → ADC-score → two-stage ascending
    * top-k (partition-local rank before the global one, same shape as
    * [[bruteForceTopK]] — no reducer ever sees a whole query's corpus).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
             m: Int = 4, ksub: Int = 16, iters: Int = 2,
             qId: String = "q_id", qVec: String = "q_vec",
             cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cb = pqCodebook(corpus, dim, m, ksub, iters, cId, cVec)
    val scored = pqScores(queries, pqCodes(corpus, cb, dim, m, cId, cVec),
      cb, dim, m, qId, qVec, cId)
      .withColumn("__part", spark_partition_id())
    val localW = Window.partitionBy(col(qId), col("__part"))
      .orderBy(col("adc_dist"), col(cId))
    val globalW = Window.partitionBy(col(qId))
      .orderBy(col("adc_dist"), col(cId))
    scored
      .withColumn("__lr", row_number().over(localW)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("adc_dist"), 6).as("adc_dist"),
        col("rank"))
  }

  /** Per-dimension scalar-quantization bounds — SQ8's entire "codebook":
    * the exact coordinate-wise float extrema over the corpus. One
    * posexplode aggregation whose output is `dim` rows, collected
    * driver-side (the dim-bounded-weights stance, like Classify's model)
    * and re-broadcast as literal arrays, so quantization itself is a
    * SHUFFLE-FREE projection. min/max are order-independent, so the
    * bounds — unlike a trained float k-means — are engine-replayable.
    */
  def sq8Bounds(corpus: DataFrame, dim: Int,
                cVec: String = "embedding"): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(cVec)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .collect() // dim rows — bounded by the embedding width, not the data
    require(rows.length == dim, s"expected $dim dims, saw ${rows.length}")
    val mn = new Array[Double](dim)
    val mx = new Array[Double](dim)
    rows.foreach { r =>
      val p = r.getInt(0)
      mn(p) = r.getDouble(1); mx(p) = r.getDouble(2)
    }
    (mn, mx)
  }

  /** SQ8 encode: each coordinate to its 8-bit code
    * `round((v − mn_i) · 255 / (mx_i − mn_i))` against the broadcast
    * literal bounds — 8× smaller than float64 at serving time, computed
    * in one shuffle-free whole-stage-codegen projection. A constant
    * dimension (mx = mn) codes to 0.
    */
  def sq8Codes(corpus: DataFrame, mn: Array[Double], mx: Array[Double],
               cId: String = "vec_id",
               cVec: String = "embedding"): DataFrame = {
    val mnC = typedLit(mn.toSeq)
    val mxC = typedLit(mx.toSeq)
    corpus.select(col(cId),
      transform(col(cVec), (x, i) => {
        val lo = element_at(mnC, i.cast("int") + 1)
        val hi = element_at(mxC, i.cast("int") + 1)
        when(hi > lo,
          round((x.cast("double") - lo) * 255d / (hi - lo), 0).cast("int"))
          .otherwise(lit(0))
      }).as("codes"))
  }

  /** SQ8 ANN top-k: quantize the corpus to 8-bit codes, dequantize each
    * code back to its lattice point `mn_i + q · (mx_i − mn_i) / 255`,
    * and run the asymmetric score — EXACT query vector against the
    * dequantized corpus — through the same broadcast + two-stage top-k
    * as [[bruteForceTopK]]. Every step (extrema, rounding, lattice
    * reconstruction, cosine) is closed-form, so the whole index — unlike
    * trained-PQ — replays verbatim in SQL. 100 TB shape: the corpus scan
    * carries 64 bytes/vector instead of 512, the bounds are 2·dim
    * literals, and nothing shuffles before the ≤ k·partitions survivor
    * exchange.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val (mn, mx) = sq8Bounds(corpus, dim, cVec)
    val mnC = typedLit(mn.toSeq)
    val mxC = typedLit(mx.toSeq)
    val deq = sq8Codes(corpus, mn, mx, cId, cVec)
      .select(col(cId),
        transform(col("codes"), (q, i) => {
          val lo = element_at(mnC, i.cast("int") + 1)
          val hi = element_at(mxC, i.cast("int") + 1)
          lo + q.cast("double") * (hi - lo) / 255d
        }).as("embedding"))
    bruteForceTopK(queries, deq, k, qId, qVec, cId, "embedding")
  }

  /** Compute the SQ8 index ONCE — per-dimension extrema plus 8-bit
    * codes — and commit both to a [[graft.state.SnapshotStore]] root
    * (VERDICT r16 #4, the [[ivfPqCommit]]/[[binaryCommit]] stance): a
    * serving deployment quantizes per corpus refresh, and query batches
    * scan the stored byte codes — never re-deriving extrema or
    * re-encoding the float corpus per query. Two tables:
    * `codes(cId, codes)` and the single-row `bounds(mn, mx)`.
    */
  def sq8Commit(corpus: DataFrame, root: String, dim: Int,
                cId: String = "vec_id", cVec: String = "embedding",
                batchId: Long = 0L): Unit = {
    val (mn, mx) = sq8Bounds(corpus, dim, cVec)
    val codes = sq8Codes(corpus, mn, mx, cId, cVec)
    val spark = corpus.sparkSession
    import spark.implicits._
    val bounds = Seq((mn.toSeq, mx.toSeq)).toDF("mn", "mx")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.state.SnapshotStore.commit(fs, rootPath, batchId,
      Map("codes" -> codes, "bounds" -> bounds))
  }

  /** Serve SQ8 top-k from the STORED index (the other half of
    * [[sq8Commit]]): the scan dequantizes the committed 8-bit codes
    * against the committed bounds — a broadcast join with the 1-row
    * bounds table, so no extrema aggregation and no float-corpus
    * re-encode ever runs, and plan construction launches nothing beyond
    * the stored tables' parquet metadata reads (SimilaritySpec pins the
    * zero-training-jobs claim with the ivfPqServe job audit). Answers
    * [[sq8TopK]]'s oracle VERBATIM: the lattice points are rebuilt from
    * the same integer codes and the same IEEE-double bounds, so every
    * reconstructed coordinate — and therefore every cosine — is
    * bit-identical to the fresh-quantization path.
    */
  def sq8Serve(queries: DataFrame, root: String, dim: Int, k: Int,
               qId: String = "q_id", qVec: String = "q_vec",
               cId: String = "vec_id",
               versionAsOf: Option[Long] = None): DataFrame = {
    val s = queries.sparkSession
    val codes = graft.state.SnapshotStore.read(s, root, "codes", versionAsOf)
    val bounds = graft.state.SnapshotStore.read(s, root, "bounds", versionAsOf)
    val deq = codes.join(broadcast(bounds))
      .select(col(cId),
        transform(col("codes"), (q, i) => {
          val lo = element_at(col("mn"), i.cast("int") + 1)
          val hi = element_at(col("mx"), i.cast("int") + 1)
          lo + q.cast("double") * (hi - lo) / 255d
        }).as("embedding"))
    bruteForceTopK(queries, deq, k, qId, qVec, cId, "embedding")
  }

  /** Random-hyperplane LSH bucket key: `nbits` sign bits of dot(v, h_i),
    * hyperplanes generated deterministically from `seed` (driver-side PRNG,
    * broadcast as literals — nbits × dim doubles, trivially small).
    */
  def lshBucket(vec: Column, dim: Int, nbits: Int, seed: Long): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(v => lit(v)): _*)
      when(dot(vec, plane) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed ANN: bucket corpus and queries with the same hyperplanes,
    * equi-join on the bucket, exact cosine + top-k inside. Multi-table
    * (`ntables` independent hash tables) for recall: a query meets a corpus
    * row if they collide in ANY table — union of equi-joins, still no
    * cartesian.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
              nbits: Int = 8, ntables: Int = 4, seed: Long = 42L,
              qId: String = "q_id", qVec: String = "q_vec",
              cId: String = "vec_id", cVec: String = "embedding"): DataFrame =
    lshJoinTopK(queries, corpus, k, nbits, ntables,
      (v, t) => lshBucket(v, dim, nbits, seed + t),
      multiProbe = false, qId, qVec, cId, cVec)

  /** The ±1 sign of portable hyperplane component (table, bit, dim) —
    * bit 0 of the first hex char of md5("lsh:t:i:j"), so a SQL oracle
    * rebuilds the planes from the same digests.
    */
  private[operators] def portableSign(t: Int, i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"lsh:$t:$i:$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 1) 1.0 else -1.0
  }

  /** [[lshBucket]]'s engine-PORTABLE twin: Achlioptas ±1 hyperplanes
    * (database-friendly random projections, Achlioptas 2003) with each
    * component's sign derived from md5 of its (table, bit, dim)
    * coordinates — deterministic on both engines, no PRNG stream to
    * reproduce.
    */
  def lshBucketPortable(vec: Column, dim: Int, nbits: Int, table: Int): Column =
    (0 until nbits).map { i =>
      val plane = array((0 until dim).map(j => lit(portableSign(table, i, j))): _*)
      when(dot(vec, plane) > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** [[lshTopK]] on the portable ±1 hyperplane family — the whole
    * bucket → banded join → exact-cosine top-k pipeline replays in SQL
    * (VERDICT r12 #7 follow-on: ann_lsh_topk was rows-only because of
    * the PRNG planes; the gaussian family stays pinned by the recall
    * and _valid twins).
    */
  def lshTopKPortable(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                      nbits: Int = 8, ntables: Int = 4,
                      qId: String = "q_id", qVec: String = "q_vec",
                      cId: String = "vec_id", cVec: String = "embedding"): DataFrame =
    lshJoinTopK(queries, corpus, k, nbits, ntables,
      (v, t) => lshBucketPortable(v, dim, nbits, t),
      multiProbe = false, qId, qVec, cId, cVec)

  /** Multi-probe LSH ANN (Lv et al., VLDB '07 — published): the same
    * tables and hyperplanes as [[lshTopK]], but each query ALSO probes
    * every bucket at Hamming distance 1 from its own (each single sign
    * bit flipped — the vectors most likely to be near-misses of the
    * hyperplane test). The candidate set is a SUPERSET of the
    * single-probe run's, so recall@k against the exact top-k can only
    * improve (under the repo's deterministic tie order, anything that
    * outranks a true top-k candidate is itself a true top-k member —
    * ann_lsh_multiprobe_recall pins the dominance). Cost lands on the
    * QUERY side only — (nbits+1)× probe rows on the broadcast frame;
    * the corpus is bucketed exactly once, same as single-probe — which
    * is the whole point of multi-probe over adding tables: more recall
    * without re-hashing or re-shuffling the 100 TB side.
    */
  def lshTopKMultiProbe(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                        nbits: Int = 8, ntables: Int = 4, seed: Long = 42L,
                        qId: String = "q_id", qVec: String = "q_vec",
                        cId: String = "vec_id", cVec: String = "embedding"): DataFrame =
    lshJoinTopK(queries, corpus, k, nbits, ntables,
      (v, t) => lshBucket(v, dim, nbits, seed + t),
      multiProbe = true, qId, qVec, cId, cVec)

  private def lshJoinTopK(queries: DataFrame, corpus: DataFrame,
                          k: Int, nbits: Int, ntables: Int,
                          bucketFn: (Column, Int) => Column,
                          multiProbe: Boolean, qId: String, qVec: String,
                          cId: String, cVec: String): DataFrame = {
    val tableCol = (v: Column) => array((0 until ntables).map(t =>
      struct(lit(t).as("tbl"), bucketFn(v, t).as("bucket"))): _*)
    // query probes: the base bucket, plus (multi-probe) each Hamming-1
    // neighbor — bit i of the base flipped
    val probeCol = (v: Column) => array((for {
      t <- 0 until ntables
      p <- -1 until (if (multiProbe) nbits else 0)
      base = bucketFn(v, t)
    } yield struct(lit(t).as("tbl"),
      (if (p < 0) base else base.bitwiseXOR(lit(1L << p))).as("bucket"))): _*)
    val cb = corpus.select(col(cId), col(cVec),
      explode(tableCol(col(cVec))).as("tb"))
      .select(col(cId), col(cVec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val qb = queries.select(col(qId), col(qVec),
      explode(probeCol(col(qVec))).as("tb"))
      .select(col(qId), col(qVec), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .distinct()
    val met = cb.join(broadcast(qb), Seq("tbl", "bucket"))
      .select(col(qId), col(qVec), col(cId), col(cVec)).distinct()
    val globalW = Window.partitionBy(col(qId)).orderBy(col("sim").desc, col(cId))
    met.select(col(qId), col(cId), cosine(col(qVec), col(cVec)).as("sim"))
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Johnson–Lindenstrauss random projection: compress `dim`-dimensional
    * embeddings to `outDim` dimensions with a fixed Gaussian projection
    * matrix, scaled by 1/√outDim so expected squared distances are
    * preserved (the JL lemma's guarantee; Gaussian sketches are the
    * classic construction — Indyk & Motwani 1998, Dasgupta & Gupta
    * 2003). The curation use: shrink the 100 TB embedding column before
    * brute-force/LSH candidate stages — an 8× narrower vector makes
    * every downstream distance kernel 8× cheaper at a bounded recall
    * cost, and the projection itself is a pure per-row map (no shuffle,
    * no state, codegen'd through [[dot]]).
    *
    * The planes are generated driver-side from `seed` and ride the plan
    * as literals (outDim × dim doubles — trivially small); the SAME
    * seed must regenerate them for the result to be reproducible, which
    * is also what lets the oracle replay the whole map term by term.
    * Output is LONG form `(id, pos, value)` — flat doubles compare
    * exactly across engines, unlike nested arrays — with
    * `value = round(dot(vec, plane_pos) · (1/√outDim), 6)`; the dot is
    * the fixed ascending multiply-accumulate from 0.0 ([[dot]]'s
    * contract), so both engines compute bit-identical doubles modulo
    * nothing at all — products and left-assoc sums are IEEE-exact.
    */
  def randomProjection(vectors: DataFrame, dim: Int, outDim: Int, seed: Long,
                       cId: String = "vec_id",
                       cVec: String = "embedding"): DataFrame = {
    require(dim > 0 && outDim > 0,
      s"randomProjection needs positive dims, got ($dim -> $outDim)")
    val planes = projectionPlanes(dim, outDim, seed)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val cols = planes.zipWithIndex.map { case (p, i) =>
      struct(lit(i).as("pos"),
        round(dot(col(cVec), array(p.map(lit(_)): _*)) * lit(scale), 6)
          .as("value"))
    }
    vectors.select(col(cId), explode(array(cols: _*)).as("__pv"))
      .select(col(cId), col("__pv.pos").as("pos"), col("__pv.value").as("value"))
  }

  /** The deterministic plane matrix [[randomProjection]] embeds — public
    * so the oracle twin (and any re-projection of query vectors) can
    * regenerate the identical literals from the same seed.
    */
  def projectionPlanes(dim: Int, outDim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(outDim)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** k-NN graph over the whole corpus: each vector's `k` nearest
    * neighbors by cosine among vectors sharing its k-means cell — the
    * cluster-then-neighbor blocking of the SemDeDup family
    * ([[graft.operators.Dedup.semanticNearDuplicates]]), here producing
    * the neighbor LISTS that downstream curation consumes (graph-based
    * dedup clustering, label propagation, kNN-classifier quality
    * scoring à la DataComp). Identical vectors land in the same cell by
    * construction (the assignment is a deterministic argmax over the
    * same centroids), so an exact copy is ALWAYS its twin's rank-1
    * neighbor at cos 1.0 — the structural invariant knn_graph_recall
    * pins under the oracle; cross-cell near neighbors are subject to
    * the usual blocking recall trade-off (raise `nCells` resolution, or
    * probe neighbor cells the ivfTopK way, for higher recall). The
    * clustering is [[kmeansCellsFixed]] (VERDICT r13 #3): with
    * integer-trained cells the whole graph — cells, per-cell cosine,
    * ranks — replays verbatim in the knn_graph oracle, and the cell
    * quality is the float trainer's up to 2^-20 input quantization.
    *
    * Scale shape: ONE cell equi-join (the shuffle keys on the cell id —
    * never all-pairs, never a cartesian), cells larger than `maxCell`
    * dropped WHOLE by a count-first pass (the capBuckets stance: a
    * degenerate clustering degrades to a capped drop, not a quadratic
    * join), and the per-source top-k window is bounded by the cell size
    * — at most `maxCell` rows per partition, never the corpus.
    * Output: `(src, dst, sim, rank)` with rank 1..k per surviving src.
    */
  /** Semantic eval-set decontamination — the embedding-space sibling of
    * [[Dedup.contaminationReport]] (which flags verbatim n-gram overlap;
    * this flags paraphrased/near-duplicate leakage the token grams miss).
    * Per corpus vector: the nearest benchmark vector by cosine and a
    * `contaminated` verdict at threshold `tau`.
    *
    * Scale shape: a benchmark suite is metadata-grade next to a 100 TB
    * corpus (thousands of prompts, not billions of documents), so the
    * bench side is BROADCAST — one narrow corpus pass scores every
    * (corpus, bench) pair locally, and the per-vector argmax is a
    * max-of-struct aggregation (map-side combinable: each scan partition
    * reduces to one candidate per vector before the shuffle). No window
    * over the corpus, no cartesian through an exchange. The struct orders
    * (sim, -bench_id), so ties in sim resolve to the SMALLEST bench id —
    * the same total order the oracle's row_number replays.
    */
  def semanticDecontam(corpus: DataFrame, bench: DataFrame, tau: Double,
                       cId: String = "vec_id", cVec: String = "embedding",
                       bId: String = "bench_id", bVec: String = "bench_vec"): DataFrame = {
    require(tau >= -1.0 && tau <= 1.0, s"tau must be a cosine, got $tau")
    val scored = corpus.join(broadcast(bench))
      .select(col(cId), col(bId), cosine(col(cVec), col(bVec)).as("sim"))
    scored.groupBy(col(cId))
      .agg(max(struct(col("sim"), (-col(bId)).as("__nb"))).as("__top"))
      .select(col(cId),
        (-col("__top.__nb")).as(bId),
        round(col("__top.sim"), 6).as("sim"),
        (col("__top.sim") >= tau).as("contaminated"))
  }

  /** FIXED-POINT product quantization — [[pqTopK]] on the
    * [[kmeansCellsFixed]] arithmetic (VERDICT r13 #3): subvectors scale
    * to longs (`floor(x · 2^20)`, exact), codebook training uses integer
    * argmin + integral-div means, encoding is integer argmin, and the
    * per-query ADC tables hold exact integer squared distances — so
    * training, encoding, and scoring replay bit-for-bit in SQL (the
    * ann_pq_topk oracle). `adc_dist` is the integer
    * Σ_j d2(q_j, centroid[code_j]) in scaled² units; the ranking is the
    * float form's up to input quantization. Same plan shapes and the
    * same codebook memo protocol as the float family.
    */
  def pqTopKFixed(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                  m: Int = 4, ksub: Int = 16, iters: Int = 2,
                  scale: Long = 1L << 20,
                  qId: String = "q_id", qVec: String = "q_vec",
                  cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val cb = pqCodebookFixed(corpus, dim, m, ksub, iters, scale, cId, cVec)
    val scored = pqScoresFixed(queries,
      pqCodesFixed(corpus, cb, dim, m, scale, cId, cVec),
      cb, dim, m, scale, qId, qVec, cId)
      .withColumn("__part", spark_partition_id())
    val localW = Window.partitionBy(col(qId), col("__part"))
      .orderBy(col("adc_dist"), col(cId))
    val globalW = Window.partitionBy(col(qId))
      .orderBy(col("adc_dist"), col(cId))
    scored
      .withColumn("__lr", row_number().over(localW)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), col("adc_dist"), col("rank"))
  }

  /** Scaled-long subvector structs — [[subvecs]] over the fixed-point
    * coordinate map (power-of-two multiply + floor, both exact).
    */
  private def subvecsFixed(vec: Column, dim: Int, m: Int, scale: Long): Column =
    subvecs(transform(vec, x => floor(x * scale).cast("long")), dim, m)

  /** Integer squared L2 distance over two `array<long>` columns — the
    * native fused-loop kernel (graft.functions.SqDiffLong); integer sums
    * are order-independent, so bit-identical to the HOF fold.
    */
  private def d2Fixed(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.SqDiffLong(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** [[d2Fixed]]'s composable reference form (tested against the kernel). */
  private[operators] def d2FixedHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** [[pqCodebook]]'s fixed-point twin: (subspace, cell, centroid) with
    * `array<long>` centroids. Same single-Lloyd's-loop plan, same memo
    * (keyed apart from the float family by a "fixed" sentinel + scale).
    */
  def pqCodebookFixed(corpus: DataFrame, dim: Int, m: Int, ksub: Int = 16,
                      iters: Int = 2, scale: Long = 1L << 20,
                      cId: String = "vec_id",
                      cVec: String = "embedding"): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    require(ksub > 0 && iters > 0, s"need positive ksub/iters: $ksub/$iters")
    require(scale > 0 && (scale & (scale - 1)) == 0,
      s"scale must be a positive power of two, got $scale")
    pqCache.compute(
      (("fixed", corpus.queryExecution.analyzed.canonicalized, scale),
        dim, m, ksub, iters, cId, cVec),
      (_, prev) =>
        if (prev != null && prev.storageLevel !=
          org.apache.spark.storage.StorageLevel.NONE) prev
        else trainPqCodebookFixed(corpus, dim, m, ksub, iters, scale, cId, cVec))
  }

  /** A per-subspace codebook as driver rows: subspace → (code, centroid)
    * entries, codes ascending. The PQ twin of the kmeans centroid tables —
    * m×ksub rows of bounded metadata.
    */
  private type DriverBook[T] = Map[Int, Seq[(Int, Seq[T])]]

  /** Per-row PQ code array over a driver-resident codebook, as ONE
    * expression: for each subvector (subspace-ordered, the [[subvecs]]
    * contract), the code minimizing the supplied distance — ties to the
    * lower code, `min_by(code, struct(d2, code))` verbatim. The encode
    * pass and each trainer iteration become pure projections: no
    * corpus×ksub broadcast-join explosion, no per-(row, subspace)
    * re-aggregation shuffle (r18, guide §2.3/§2.4 + VERDICT r17 #4).
    */
  private def pqCodesExpr[T: scala.reflect.runtime.universe.TypeTag](
      svArr: Column, m: Int, book: DriverBook[T],
      d2Of: (Column, Column) => Column): Column =
    transform(svArr, sv => {
      val sub = sv.getField("sub")
      (0 until m).foldLeft(lit(null).cast("int")) { (acc, j) =>
        val entries = book.getOrElse(j, Seq.empty)
        if (entries.isEmpty) acc
        else {
          val ds = array(entries.map { case (_, cent) =>
            d2Of(sub, typedLit(cent)) }: _*)
          when(sv.getField("subspace") === j,
            element_at(typedLit(entries.map(_._1)),
              array_position(ds, array_min(ds)).cast("int"))).otherwise(acc)
        }
      }
    })

  /** One Lloyd's refinement pass over subvector rows with the assignment
    * inlined: (subspace, code, pos) means in a single job, collected back
    * to a [[DriverBook]]. Codes that lost every member vanish, exactly
    * like the aggregate form.
    */
  private def pqRefitFixed(frame: DataFrame, svArr: Column, m: Int,
                           book: DriverBook[Long]): DriverBook[Long] = {
    val codes = pqCodesExpr[Long](svArr, m, book, d2Fixed)
    frame
      .select(codes.as("__codes"),
        posexplode(svArr).as(Seq("__j", "__sv")))
      .select(col("__sv").getField("subspace").as("subspace"),
        element_at(col("__codes"), col("__j") + 1).as("code"),
        posexplode(col("__sv").getField("sub")).as(Seq("pos", "v")))
      .groupBy("subspace", "code", "pos")
      .agg(expr("sum(v) div count(v)").as("mv"))
      .collect()
      .groupBy(r => (r.getInt(0), r.getInt(1))).toSeq
      .map { case ((j, code), rows) =>
        (j, code, rows.sortBy(_.getInt(2)).map(_.getLong(3)).toIndexedSeq)
      }
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap
  }

  /** Contiguous per-subspace code reindex (positional-lookup contract) —
    * the aggregate form's `row_number over (subspace order by cell)`,
    * done on the driver rows.
    */
  private def reindexBook[T](book: DriverBook[T]): DriverBook[T] =
    book.view.mapValues(_.sortBy(_._1).zipWithIndex
      .map { case ((_, cent), i) => (i, cent) }).toMap

  private def bookRows[T](book: DriverBook[T]): Seq[(Int, Int, Seq[T])] =
    book.toSeq.sortBy(_._1).flatMap { case (j, es) =>
      es.map { case (c, cent) => (j, c, cent) }
    }

  private def trainPqCodebookFixed(corpus: DataFrame, dim: Int, m: Int,
                                   ksub: Int, iters: Int, scale: Long,
                                   cId: String, cVec: String): DataFrame = {
    val spark = corpus.sparkSession
    if (ksub.toLong * dim > ArgminLiteralCap)
      return trainPqCodebookFixedJoinLoop(corpus, dim, m, ksub, iters, scale,
        cId, cVec)
    val svArr = subvecsFixed(col(cVec), dim, m, scale)
    // seeds: the ksub lowest-id rows (TakeOrdered returns them sorted), one
    // seed subvector per subspace, code = the seed's id rank
    val seedRows = corpus.orderBy(col(cId)).limit(ksub)
      .select(svArr.as("svs")).collect()
    var book: DriverBook[Long] = (0 until m).map { j =>
      j -> seedRows.toSeq.zipWithIndex.map { case (r, i) =>
        (i, r.getSeq[org.apache.spark.sql.Row](0)(j).getSeq[Long](1).toIndexedSeq)
      }
    }.toMap
    for (_ <- 1 to iters)
      book = pqRefitFixed(corpus, svArr, m, book)
    val reindexed = reindexBook(book)
    import spark.implicits._
    // LocalRelation result; persisted + retained so the pqCache liveness
    // check (storageLevel != NONE) keeps recognizing a live memo entry
    val df = graft.util.Caches.retain(
      spark.createDataset(bookRows(reindexed))
        .toDF("subspace", "cell", "centroid")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    df.count()
    df
  }

  /** The pre-r18 broadcast-join PQ trainer, kept as the past-cap
    * fallback.
    */
  private def trainPqCodebookFixedJoinLoop(corpus: DataFrame, dim: Int, m: Int,
                                           ksub: Int, iters: Int, scale: Long,
                                           cId: String, cVec: String): DataFrame = {
    val subs = corpus.select(col(cId).as("__id"),
      explode(subvecsFixed(col(cVec), dim, m, scale)).as("sv"))
      .select(col("__id"), col("sv.subspace").as("subspace"),
        col("sv.sub").as("sub"))
    var cb = corpus.orderBy(col(cId)).limit(ksub)
      .select(col(cId).as("__id"),
        explode(subvecsFixed(col(cVec), dim, m, scale)).as("sv"))
      .select(col("__id"), col("sv.subspace").as("subspace"),
        col("sv.sub").as("sub"))
      .withColumn("cell", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("__id"))) - 1)
      .select(col("subspace"), col("cell"), col("sub").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = subs.join(broadcast(cb), Seq("subspace"))
        .select(col("__id"), col("subspace"), col("sub"), col("cell"),
          d2Fixed(col("sub"), col("centroid")).as("d2"))
        .groupBy(col("__id"), col("subspace"))
        .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
          first(col("sub")).as("sub"))
      val next = assigned
        .select(col("subspace"), col("cell"),
          posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy("subspace", "cell", "pos")
        .agg(expr("sum(v) div count(v)").as("mv"))
        .groupBy("subspace", "cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("subspace"), col("cell"),
          transform(col("pm"), p => p.getField("mv")).as("centroid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      if (cb.storageLevel.useMemory) cb.unpersist()
      cb = next
    }
    val reindexed = graft.util.Caches.retain(cb
      .withColumn("cell", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("cell"))) - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    reindexed.count()
    cb.unpersist()
    reindexed
  }

  /** Collect a (subspace, cell|code, centroid) codebook frame to a
    * [[DriverBook]] — bounded (m×ksub rows) by construction; `None` past
    * the literal cap routes callers to the join form.
    */
  private def collectBookLong(codebook: DataFrame): Option[DriverBook[Long]] = {
    val rows = codebook.select(col("subspace"),
      codebook.columns.find(c => c == "cell" || c == "code")
        .fold(col("cell"))(col).as("code"), col("centroid")).collect()
    val entries = rows.map(_.getSeq[Long](2).length.toLong).sum
    if (entries > ArgminLiteralCap) None
    else Some(rows.toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toIndexedSeq))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1)).toMap)
  }

  /** [[pqCodes]]'s fixed-point twin: integer argmin encoding — ONE
    * projection against the driver-resident codebook (no explode, no
    * broadcast join, no per-(row, subspace) re-aggregation shuffle; the
    * values are the same integer argmins). Past the literal cap the
    * original join form runs.
    */
  def pqCodesFixed(corpus: DataFrame, codebook: DataFrame, dim: Int, m: Int,
                   scale: Long = 1L << 20, cId: String = "vec_id",
                   cVec: String = "embedding"): DataFrame =
    collectBookLong(codebook) match {
      case Some(book) =>
        corpus.select(col(cId),
          pqCodesExpr(subvecsFixed(col(cVec), dim, m, scale), m, book,
            d2Fixed).as("codes"))
      case None =>
        corpus.select(col(cId), explode(subvecsFixed(col(cVec), dim, m, scale)).as("sv"))
          .select(col(cId), col("sv.subspace").as("subspace"), col("sv.sub").as("sub"))
          .join(broadcast(codebook), Seq("subspace"))
          .select(col(cId), col("subspace"), col("cell"),
            d2Fixed(col("sub"), col("centroid")).as("d2"))
          .groupBy(col(cId), col("subspace"))
          .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("code"))
          .groupBy(col(cId))
          .agg(array_sort(collect_list(struct(col("subspace"), col("code")))).as("sc"))
          .select(col(cId), transform(col("sc"), s => s.getField("code")).as("codes"))
    }

  /** [[pqScores]]'s fixed-point twin: integer ADC tables, long sums. */
  def pqScoresFixed(queries: DataFrame, codes: DataFrame, codebook: DataFrame,
                    dim: Int, m: Int, scale: Long = 1L << 20,
                    qId: String = "q_id", qVec: String = "q_vec",
                    cId: String = "vec_id"): DataFrame = {
    val qtab = queries
      .select(col(qId), explode(subvecsFixed(col(qVec), dim, m, scale)).as("sv"))
      .select(col(qId), col("sv.subspace").as("subspace"), col("sv.sub").as("qsub"))
      .join(broadcast(codebook), Seq("subspace"))
      .select(col(qId), col("subspace"), col("cell"),
        d2Fixed(col("qsub"), col("centroid")).as("pd2"))
      .groupBy(col(qId), col("subspace"))
      .agg(array_sort(collect_list(struct(col("cell"), col("pd2")))).as("cp"))
      .select(col(qId), col("subspace"),
        transform(col("cp"), c => c.getField("pd2")).as("row"))
      .groupBy(col(qId))
      .agg(array_sort(collect_list(struct(col("subspace"), col("row")))).as("sr"))
      .select(col(qId), transform(col("sr"), s => s.getField("row")).as("tbl"))
    codes.join(broadcast(qtab))
      .select(col(qId), col(cId),
        aggregate(
          zip_with(col("codes"), col("tbl"),
            (c, row) => element_at(row, c.cast("int") + 1)),
          lit(0L), (acc, v) => acc + v).as("adc_dist"))
  }

  /** IVF-PQ composite index, fixed-point (the FAISS `IVFx,PQy` structure
    * — THE production layout for billion-vector search: the coarse
    * quantizer prunes the scan to nprobe/nlist of the corpus, and PQ
    * codes over the RESIDUAL vector (v − coarse centroid) compress what
    * remains; residuals concentrate near zero, so a given codebook
    * budget quantizes them far better than raw vectors — the reason the
    * composite beats flat PQ at equal bytes):
    *
    *  1. coarse cells: [[kmeansCellsFixed]] (integer Lloyd's);
    *  2. coarse centroids: integral-div means over the FINAL assignment
    *     — still scaled longs, so residual subtraction is exact;
    *  3. PQ codebook trained per subspace on the residuals (the same
    *     integer trainer as [[pqCodebookFixed]], seeds = the ksub
    *     lowest-id vectors' residuals);
    *  4. query: probe the `nprobe` nearest coarse cells by integer d²,
    *     build ONE ADC table per (query, probed cell) from the
    *     PER-CELL query residual — the asymmetric-distance detail that
    *     distinguishes real IVF-PQ from flat-PQ-after-IVF;
    *  5. score only candidates in probed cells; top-k by (adc_dist, id).
    *
    * All-integer end to end, so training, encoding, probing, and scoring
    * replay bit-for-bit in SQL (the ann_ivfpq_topk oracle). Scale shape:
    * training is the two bounded Lloyd's loops; query-side cost is the
    * pruned candidate join — tables are (nq × nprobe × m × ksub) longs,
    * broadcast; candidate rows carry m byte-sized codes, never vectors.
    */
  def ivfPqTopKFixed(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
                     nCells: Int = 8, nprobe: Int = 2, m: Int = 4,
                     ksub: Int = 16, itersIvf: Int = 2, itersPq: Int = 2,
                     scale: Long = 1L << 20,
                     qId: String = "q_id", qVec: String = "q_vec",
                     cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && nCells >= nprobe, s"bad nprobe=$nprobe/nCells=$nCells")
    val (cells, cc, cbf, codes) =
      ivfPqIndex(corpus, dim, nCells, m, ksub, itersIvf, itersPq, scale, cId, cVec)
    ivfPqScore(queries, codes, cells, cc, cbf, dim, k, nprobe, m,
      scale, qId, qVec, cId)
  }

  /** The train/encode half of [[ivfPqTopKFixed]]: coarse cells, final
    * coarse centroids, residual PQ codebook, and the encoded corpus —
    * the four artifacts a serving tier stores.
    */
  private def ivfPqIndex(corpus: DataFrame, dim: Int, nCells: Int, m: Int,
                         ksub: Int, itersIvf: Int, itersPq: Int, scale: Long,
                         cId: String, cVec: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(m > 0 && dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val spark = corpus.sparkSession
    val scaled0 = corpus.select(col(cId),
      transform(col(cVec), x => floor(x * scale).cast("long")).as("__sv"))
    // r18 (guide §2.3/§2.4, VERDICT r17 #4): coarse training via
    // kmeansFixedTrain (driver-resident centroids), the coarse assignment
    // + residual as ONE projection (no corpus self-join to attach cells),
    // the residual-PQ trainer as one means job per iteration, and the
    // encode as a final projection. All-integer → bit-identical to the
    // join forms; past the literal caps the pre-r18 join pipeline runs
    // unchanged below.
    val trained =
      if (ksub.toLong * dim > ArgminLiteralCap) None
      else kmeansFixedTrain(scaled0, nCells, itersIvf, cId).filter(_.nonEmpty)
    trained match {
      case Some(coarse) =>
        import spark.implicits._
        val cellCol = argminCellFixed(col("__sv"), coarse)
        // final coarse centroids at the trained assignment (integral-div
        // means — one job, nCells×dim driver rows)
        val ccRows: Seq[(Int, Seq[Long])] = scaled0
          .select(cellCol.as("cell"), posexplode(col("__sv")).as(Seq("pos", "v")))
          .groupBy("cell", "pos").agg(expr("sum(v) div count(v)").as("m"))
          .collect()
          .groupBy(_.getInt(0)).toSeq
          .map { case (cell, rows) =>
            (cell, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toIndexedSeq)
          }
          .sortBy(_._1)
        val ccLit = typedLit(ccRows.toMap)
        // residuals: exact long subtraction against the row's own cell
        // centroid — persisted, the PQ trainer makes itersPq passes and
        // the encoder one more
        val resid = graft.util.Caches.retain(
          scaled0.select(col(cId), cellCol.as("cell"), col("__sv"))
            .select(col(cId), col("cell"),
              zip_with(col("__sv"), element_at(ccLit, col("cell")),
                (a, b) => a - b).as("__rv"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val rsv = subvecs(col("__rv"), dim, m)
        // seeds = the ksub lowest-id rows' residual subvectors, code = id
        // rank (the trainPqCodebookFixed protocol verbatim)
        val seedRows = resid.orderBy(col(cId)).limit(ksub)
          .select(rsv.as("svs")).collect()
        var book: DriverBook[Long] = (0 until m).map { j =>
          j -> seedRows.toSeq.zipWithIndex.map { case (r, i) =>
            (i, r.getSeq[org.apache.spark.sql.Row](0)(j).getSeq[Long](1).toIndexedSeq)
          }
        }.toMap
        for (_ <- 1 to itersPq)
          book = pqRefitFixed(resid, rsv, m, book)
        val finalBook = reindexBook(book)
        val codesCol = pqCodesExpr(rsv, m, finalBook, d2Fixed)
        val cells = resid.select(col(cId), col("cell"))
        val cc = spark.createDataset(ccRows.map(t => (t._1, t._2)))
          .toDF("cell", "__cc")
        val cbf = spark.createDataset(bookRows(finalBook))
          .toDF("subspace", "code", "centroid")
        val codes = resid.select(col(cId), codesCol.as("codes"))
        return (cells, cc, cbf, codes)
      case None => () // past a literal cap — the join pipeline below
    }
    val cells = kmeansCellsFixed(corpus, nCells, itersIvf, scale, cId, cVec)
    val scaled = scaled0.join(cells, cId)
    // final coarse centroids at the trained assignment — integral-div
    // means keep everything on the integer lattice
    val cc0 = scaled
      .select(col("cell"), posexplode(col("__sv")).as(Seq("pos", "v")))
      .groupBy("cell", "pos").agg(expr("sum(v) div count(v)").as("m"))
      .groupBy("cell")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("__cc"))
    val cc = graft.util.Caches.retain(
      cc0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cc.count()
    // residuals: exact long subtraction; persisted — the PQ trainer makes
    // itersPq passes and the encoder one more
    val resid = graft.util.Caches.retain(
      scaled.join(broadcast(cc), Seq("cell"))
        .select(col(cId), col("cell"),
          zip_with(col("__sv"), col("__cc"), (a, b) => a - b).as("__rv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val rsubs = resid
      .select(col(cId).as("__id"), explode(subvecs(col("__rv"), dim, m)).as("sv"))
      .select(col("__id"), col("sv.subspace").as("subspace"), col("sv.sub").as("sub"))
    // per-subspace integer Lloyd's over residual subvectors — the
    // trainPqCodebookFixed protocol verbatim: seeds = ksub lowest-id
    // residuals, itersPq assign+refit rounds, contiguous reindex, then
    // ONE encode pass against the final codebook
    var cb = rsubs.join(broadcast(
        resid.orderBy(col(cId)).limit(ksub).select(col(cId).as("__id"))),
        Seq("__id"))
      .withColumn("code", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("__id"))) - 1)
      .select(col("subspace"), col("code"), col("sub").as("centroid"))
    def assignTo(book: DataFrame): DataFrame =
      rsubs.join(broadcast(book), Seq("subspace"))
        .select(col("__id"), col("subspace"), col("sub"), col("code"),
          d2Fixed(col("sub"), col("centroid")).as("d2"))
        .groupBy(col("__id"), col("subspace"))
        .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"),
          first(col("sub")).as("sub"))
    for (_ <- 1 to itersPq) {
      val next = assignTo(cb)
        .select(col("subspace"), col("code"),
          posexplode(col("sub")).as(Seq("pos", "v")))
        .groupBy("subspace", "code", "pos")
        .agg(expr("sum(v) div count(v)").as("mv"))
        .groupBy("subspace", "code")
        .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("subspace"), col("code"),
          transform(col("pm"), p => p.getField("mv")).as("centroid"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      if (cb.storageLevel.useMemory) cb.unpersist()
      cb = next
    }
    val cbf = graft.util.Caches.retain(cb
      .withColumn("code", row_number().over(
        Window.partitionBy(col("subspace")).orderBy(col("code"))) - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    cbf.count()
    cb.unpersist()
    val codes = assignTo(cbf)
      .groupBy(col("__id"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("code")))).as("sc"))
      .select(col("__id").as(cId),
        transform(col("sc"), s => s.getField("code")).as("codes"))
    (cells, cc, cbf, codes)
  }

  /** Train the IVF-PQ index ONCE and commit its four artifacts — cell
    * assignments, coarse centroids, residual PQ codebook, PQ codes — to
    * a [[graft.state.SnapshotStore]] root (VERDICT r15 #3, the
    * st_quality_score batch-artifact stance): a real deployment trains
    * per corpus refresh and serves MANY query batches from the stored
    * index, instead of paying the two Lloyd's loops inside every query.
    * The multi-table commit is atomic (one pointer rename), so a serving
    * tier never observes a half-written index; re-commits under a higher
    * `batchId` version the index and [[ivfPqServe]]'s `versionAsOf` can
    * pin retained history.
    */
  def ivfPqCommit(corpus: DataFrame, root: String, dim: Int,
                  nCells: Int = 8, m: Int = 4, ksub: Int = 16,
                  itersIvf: Int = 2, itersPq: Int = 2,
                  scale: Long = 1L << 20,
                  cId: String = "vec_id", cVec: String = "embedding",
                  batchId: Long = 0L): Unit = {
    val (cells, cc, cbf, codes) =
      ivfPqIndex(corpus, dim, nCells, m, ksub, itersIvf, itersPq, scale, cId, cVec)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(
      corpus.sparkSession.sparkContext.hadoopConfiguration)
    graft.state.SnapshotStore.commit(fs, rootPath, batchId, Map(
      "cells" -> cells, "centroids" -> cc,
      "codebook" -> cbf, "codes" -> codes))
  }

  /** Serve top-k from a STORED IVF-PQ index (the other half of
    * [[ivfPqCommit]]): snapshot-isolated reads of the committed
    * artifacts feed ONLY the query-side DAG — integer probe,
    * per-(query, probed-cell) residual ADC tables, pruned candidate
    * scoring. Plan construction runs no jobs beyond the stored tables'
    * parquet metadata reads — no training ever re-executes
    * (SimilaritySpec pins both via a job-callsite audit); `dim`, `m`,
    * and `scale` must match the committed index — they are baked into
    * the stored codebook/codes geometry.
    */
  def ivfPqServe(queries: DataFrame, root: String, dim: Int, k: Int,
                 nprobe: Int = 2, m: Int = 4, scale: Long = 1L << 20,
                 qId: String = "q_id", qVec: String = "q_vec",
                 cId: String = "vec_id",
                 versionAsOf: Option[Long] = None): DataFrame = {
    val s = queries.sparkSession
    def table(name: String): DataFrame =
      graft.state.SnapshotStore.read(s, root, name, versionAsOf)
    ivfPqScore(queries, table("codes"), table("cells"), table("centroids"),
      table("codebook"), dim, k, nprobe, m, scale, qId, qVec, cId)
  }

  /** The query side of [[ivfPqTopKFixed]]: integer probe, per-(query,
    * cell) residual ADC tables, pruned candidate scoring, top-k.
    */
  private def ivfPqScore(queries: DataFrame, codes: DataFrame,
                         cells: DataFrame, cc: DataFrame, cb: DataFrame,
                         dim: Int, k: Int, nprobe: Int, m: Int, scale: Long,
                         qId: String, qVec: String, cId: String): DataFrame = {
    val qscaled = queries.select(col(qId),
      transform(col(qVec), x => floor(x * scale).cast("long")).as("__qv"))
    val probeW = Window.partitionBy(col(qId)).orderBy(col("__d2"), col("cell"))
    val probes = qscaled.join(broadcast(cc))
      .select(col(qId), col("__qv"), col("cell"), col("__cc"),
        d2Fixed(col("__qv"), col("__cc")).as("__d2"))
      .withColumn("__r", row_number().over(probeW)).filter(col("__r") <= nprobe)
      .select(col(qId), col("cell"),
        zip_with(col("__qv"), col("__cc"), (a, b) => a - b).as("__qr"))
    val tbl = probes
      .select(col(qId), col("cell"), explode(subvecs(col("__qr"), dim, m)).as("sv"))
      .select(col(qId), col("cell"), col("sv.subspace").as("subspace"),
        col("sv.sub").as("qsub"))
      .join(broadcast(cb), Seq("subspace"))
      .select(col(qId), col("cell"), col("subspace"), col("code"),
        d2Fixed(col("qsub"), col("centroid")).as("pd2"))
      .groupBy(col(qId), col("cell"), col("subspace"))
      .agg(array_sort(collect_list(struct(col("code"), col("pd2")))).as("cp"))
      .select(col(qId), col("cell"), col("subspace"),
        transform(col("cp"), c => c.getField("pd2")).as("row"))
      .groupBy(col(qId), col("cell"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("row")))).as("sr"))
      .select(col(qId), col("cell"),
        transform(col("sr"), s => s.getField("row")).as("tbl"))
    val scored = codes.join(cells, cId).join(broadcast(tbl), Seq("cell"))
      .select(col(qId), col(cId),
        aggregate(
          zip_with(col("codes"), col("tbl"),
            (c, row) => element_at(row, c.cast("int") + 1)),
          lit(0L), (acc, v) => acc + v).as("adc_dist"))
      .withColumn("__part", spark_partition_id())
    val localW = Window.partitionBy(col(qId), col("__part"))
      .orderBy(col("adc_dist"), col(cId))
    val globalW = Window.partitionBy(col(qId)).orderBy(col("adc_dist"), col(cId))
    scored
      .withColumn("__lr", row_number().over(localW)).filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(globalW)).filter(col("rank") <= k)
      .select(col(qId), col(cId), col("adc_dist"), col("rank"))
  }

  def knnGraph(vectors: DataFrame, k: Int, nCells: Int = 16,
               iters: Int = 3, maxCell: Int = 10000,
               cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(k > 0, s"knnGraph needs a positive k, got $k")
    // cell attached as a projection — no vectors⋈assignment self-join
    // (r18; same trained assignment, see kmeansCellsFixedAttach)
    val assigned = kmeansCellsFixedAttach(vectors, nCells, iters,
      cId = cId, cVec = cVec)
    val kept = assigned.groupBy(col("cell"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") <= maxCell)
      .select(col("cell"))
    val bounded = assigned.join(kept, Seq("cell"))
    val a = bounded.select(col("cell"), col(cId).as("src"), col(cVec).as("__va"))
    val b = bounded.select(col("cell"), col(cId).as("dst"), col(cVec).as("__vb"))
    val w = Window.partitionBy(col("src")).orderBy(col("sim").desc, col("dst"))
    a.join(b, Seq("cell"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), cosine(col("__va"), col("__vb")).as("sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("src"), col("dst"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell–Goldstein) — the
    * classic DIVERSIFIED top-k: per query, greedily select
    * `argmax λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s)` — high
    * relevance, penalized by similarity to what's already picked, so
    * near-duplicate results can't crowd the list. Seeded with the
    * rank-1 candidate; ties break to the lower id at every step.
    *
    * Scale shape: candidate generation is [[bruteForceTopK]] (swap in
    * ivf/lsh for bigger corpora — anything producing (qId, cId, sim,
    * rank)); everything after is bounded by nCandidates per query — the
    * pairwise candidate-similarity frame is nCandidates² per query and
    * the k greedy steps are joins over those bounded frames, each
    * generation rebased with a lazy localCheckpoint so the returned plan
    * stays k-step-shallow (the bpeLoop idiom; everything materializes on
    * the caller's first action). All scoring arithmetic is on 6-rounded
    * cosines with fixed multiply/subtract order, so the whole greedy
    * trajectory replays verbatim in SQL.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, k: Int,
                nCandidates: Int = 10, lambda: Double = 0.5,
                qId: String = "q_id", qVec: String = "q_vec",
                cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= nCandidates,
      s"need 1 <= k <= nCandidates, got $k/$nCandidates")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // candidates with their vectors: both the pair frame and every greedy
    // step read them — persist once (nQueries × nCandidates rows)
    val cand = graft.util.Caches.retain(
      bruteForceTopK(queries, corpus, nCandidates, qId, qVec, cId, cVec)
        .join(corpus.select(col(cId), col(cVec)), cId)
        .persist(mem))
    val pairs = graft.util.Caches.retain(cand.select(col(qId),
        col(cId).as("__a"), col(cVec).as("__va"))
      .join(cand.select(col(qId), col(cId).as("__b"), col(cVec).as("__vb")),
        Seq(qId))
      .filter(col("__a") =!= col("__b"))
      .select(col(qId), col("__a"), col("__b"),
        round(cosine(col("__va"), col("__vb")), 6).as("__ps"))
      .persist(mem))
    var sel = cand.filter(col("rank") === 1)
      .select(col(qId), col(cId), lit(1).as("mmr_rank"))
    for (t <- 2 to k) {
      val rem = cand.select(col(qId), col(cId), col("sim"))
        .join(sel.select(col(qId), col(cId)), Seq(qId, cId), "left_anti")
      // the diversity penalty: each remaining candidate's max similarity
      // to the already-selected set (pairs are complete within the
      // candidate set, so the max is never null)
      val mp = pairs.join(sel.select(col(qId), col(cId).as("__b")),
          Seq(qId, "__b"))
        .groupBy(col(qId), col("__a").as(cId))
        .agg(max(col("__ps")).as("__mps"))
      val pick = rem.join(mp, Seq(qId, cId))
        .select(col(qId), col(cId),
          (lit(lambda) * col("sim") - lit(1.0 - lambda) * col("__mps"))
            .as("__score"))
        .groupBy(col(qId))
        .agg(max_by(col(cId), struct(col("__score"), -col(cId))).as(cId))
        .select(col(qId), col(cId), lit(t).as("mmr_rank"))
      sel = sel.unionByName(pick).localCheckpoint(false)
    }
    sel
  }
}

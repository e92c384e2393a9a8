package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture sampling — the "hit the target data mixture" stage of a
  * pretraining pipeline: given a token quota per domain, keep the
  * deterministic greedy prefix of each domain's documents in content-hash
  * order until the quota fills. Hash order (md5 — the one hash both this
  * engine and the oracle compute identically, the a9_sample_hash
  * convention) makes the sample stable across runs, engines, and
  * partitionings, unlike rand()-based sampling; quota filling by exact
  * cumulative token counts beats per-row Bernoulli rates, which only hit
  * the mixture in expectation.
  *
  * Scale shape is [[Ranking.quantilesCont]]'s distributed bookkeeping:
  * range-repartition on (domain, hash, id) so every partition sorts in
  * parallel, per-(partition, domain) token totals prefix-sum through a
  * window over ≤ partitions×domains COUNT rows (metadata, no driver
  * collect), and each row's exact in-domain cumulative token count is the
  * partition offset plus a per-partition running sum. One domain hot
  * enough to dominate the corpus still spreads over many range
  * partitions — there is no per-domain single task anywhere.
  */
object Sampling {

  /** Keep each domain's greedy hash-ordered prefix of documents whose
    * INCLUSIVE cumulative token count stays within the domain's quota.
    * Domains absent from `quotas` are dropped (inner join — the mixture
    * contract: unlisted domains contribute nothing).
    *
    * @return input columns + `cum_tokens` (the row's inclusive in-domain
    *         cumulative token count) + `quota`
    */
  def quotaSample(docs: DataFrame, idCol: String, domainCol: String,
                  tokensCol: String, quotas: Seq[(String, Long)]): DataFrame = {
    require(quotas.nonEmpty, "quotaSample needs at least one (domain, quota)")
    require(quotas.forall(_._2 >= 0), s"quotas must be non-negative: $quotas")
    val spark = docs.sparkSession
    import spark.implicits._
    val based = docs
      // null OR negative token counts clamp to 0 — a negative count
      // would shrink the cumulative sum and admit extra documents past
      // the quota (the Pack clamp, same hazard)
      .withColumn("__tok",
        greatest(lit(0L), coalesce(col(tokensCol).cast("long"), lit(0L))))
      .withColumn("__h", md5(col(idCol).cast("string")))
    val ranged = graft.util.Caches.retain(
      based.repartitionByRange(col(domainCol), col("__h"), col(idCol))
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = ranged.groupBy(col("__pid"), col(domainCol))
      .agg(sum(col("__tok")).as("__t"))
    val prefixW = Window.partitionBy(col(domainCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.select(
      col("__pid").as("__opid"), col(domainCol).as("__od"),
      coalesce(sum(col("__t")).over(prefixW), lit(0L)).as("__off"))
    val localW = Window.partitionBy(col("__pid"), col(domainCol))
      .orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q = quotas.toDF("__qd", "__quota")
    ranged.join(offs,
        ranged("__pid") === offs("__opid") && ranged(domainCol) <=> offs("__od"))
      .drop("__opid", "__od")
      .withColumn("cum_tokens", col("__off") + sum(col("__tok")).over(localW))
      .join(q, col(domainCol) <=> col("__qd"))
      .filter(col("cum_tokens") <= col("__quota"))
      .withColumnRenamed("__quota", "quota")
      .drop("__qd", "__tok", "__h", "__pid", "__off")
  }

  /** Translate mixture weights into per-domain token quotas over a total
    * budget: quota = round(budget · weight). round, not truncate — the
    * double product of an inexact weight can land a hair BELOW the
    * intended integer (0.3 · 20000 = 5999.999…), and truncation would
    * quietly shrink the quota by one token.
    */
  def mixtureQuotas(budget: Long, weights: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(budget > 0, s"mixtureQuotas needs a positive budget, got $budget")
    require(weights.forall(w => w._2 >= 0 && w._2 <= 1),
      s"weights must be in [0,1]: $weights")
    weights.map { case (d, w) => d -> math.round(budget * w) }
  }

  /** Per-domain achievement report over a [[quotaSample]] result: kept
    * docs, kept tokens, the quota, and the fill fraction. One map-side
    * combined aggregation on the domain key.
    */
  def mixtureReport(sampled: DataFrame, domainCol: String,
                    tokensCol: String): DataFrame =
    sampled.groupBy(col(domainCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokensCol).cast("long")).as("kept_tokens"),
      max(col("quota")).as("quota"))
      .withColumn("fill_frac",
        round(when(col("quota") > 0,
          col("kept_tokens").cast("double") / col("quota")).otherwise(lit(0.0)), 6))

  /** Epoch plan for an over-budget mixture — the data-recipe arithmetic a
    * training run does when a domain's quota EXCEEDS its available tokens
    * (the usual case for small high-quality sources: "4 epochs of wiki,
    * 0.3 epochs of crawl"): per domain, the available token mass, the
    * target quota, the whole-pass count and leftover-token tail
    * (integer-exact `div`/`mod`, so engines agree), and the fractional
    * epoch count (rounded). One map-side-combined aggregation at domain
    * grain + a broadcast quota join — O(domains) output at any corpus
    * size. Domains missing from `weights` get no row (not part of the
    * mixture); a weight-listed domain with NO rows (or no tokens) still
    * reports its quota with 0 docs/tokens and NULL epochs — the caller's
    * signal that the recipe is unfillable (an absent domain silently
    * vanishing would silently vanish its budget share with it).
    */
  def epochPlan(docs: DataFrame, domainCol: String, tokensCol: String,
                budget: Long, weights: Seq[(String, Double)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val quotas = mixtureQuotas(budget, weights).toDF(domainCol, "quota")
    val avail = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(greatest(lit(0L),
          coalesce(col(tokensCol).cast("long"), lit(0L)))), lit(0L))
          .as("available_tokens"))
    // quotas drive the join: every weight-listed domain gets a row even
    // when the corpus has none of it
    broadcast(quotas).join(avail, Seq(domainCol), "left")
      .select(col(domainCol),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("available_tokens"), lit(0L)).as("available_tokens"),
        col("quota"))
      .select(col(domainCol), col("n_docs"), col("available_tokens"),
        col("quota"),
        when(col("available_tokens") > 0,
          expr("quota div available_tokens")).as("full_epochs"),
        when(col("available_tokens") > 0,
          col("quota") % col("available_tokens")).as("remainder_tokens"),
        when(col("available_tokens") > 0,
          round(col("quota").cast("double") /
            col("available_tokens").cast("double"), 6)).as("epochs"))
  }

  /** Temperature-scaled mixture quotas — the multilingual/multi-source
    * "temperature sampling" recipe (Raffel 2020 §3.4.3 / mT5): source
    * i's share of the token budget ∝ (its token mass)^alpha, alpha < 1
    * flattening the natural distribution so small high-quality sources
    * up-sample and the head crawl stops dominating (alpha = 1 recovers
    * proportional sampling, alpha → 0 approaches uniform).
    *
    * Scale shape: ONE map-side-combined integer aggregation at domain
    * grain; the power/normalize arithmetic runs on the O(sources)
    * aggregate, with the normalizing sum an EXACT decimal sum of
    * 15-decimal powers (the repo rule: never sum raw doubles in an
    * oracled path — combine order cannot move a digit), then double
    * division for the published weight. Output (source,
    * available_tokens, weight, quota), Σ quota ≈ budget up to rounding.
    */
  def temperatureQuotas(docs: DataFrame, domainCol: String, tokensCol: String,
                        budget: Long, alpha: Double): DataFrame = {
    require(budget > 0, s"temperatureQuotas needs a positive budget, got $budget")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val avail = docs.groupBy(col(domainCol))
      .agg(coalesce(sum(greatest(lit(0L),
        coalesce(col(tokensCol).cast("long"), lit(0L)))), lit(0L))
        .as("available_tokens"))
    val powed = avail.withColumn("__pw",
      pow(col("available_tokens").cast("double"), lit(alpha))
        .cast("decimal(27,15)"))
    val total = powed.agg(sum(col("__pw")).as("__tot"))
    powed.crossJoin(broadcast(total))
      .select(col(domainCol), col("available_tokens"),
        round(col("__pw").cast("double") / col("__tot").cast("double"), 6)
          .as("weight"),
        round(lit(budget.toDouble) * col("__pw").cast("double") /
          col("__tot").cast("double")).cast("long").as("quota"))
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-ES
    * (published, "Weighted random sampling with a reservoir", 2006): each
    * row draws key = u^(1/w) and the k LARGEST keys are the sample; one
    * pass, no sequential draw loop, distributed as a TakeOrdered top-k.
    * The uniform u derives from md5 of the id (the quotaSample /
    * a9_sample_hash determinism convention — stable across runs, engines,
    * and partitionings): u = (v + 1) / 2⁶⁰ ∈ (0, 1] with v the first 15
    * md5 hex digits. Selecting the k largest u^(1/w) is equivalent to the
    * k SMALLEST m = −ln(u)/w, and ranking happens on the ROUNDED
    * double-log key `round(ln(m), 6)` ascending (id tie-break): the outer
    * ln makes the 6-decimal rounding a RELATIVE precision of ~1e-6 at any
    * weight scale (round(ln(u)/w, 6) itself collapses to −0.0 once
    * weights reach ~1e6 — real-unit weights like prices or token counts
    * would destroy the draw), and comparing rounded keys means a last-ulp
    * `ln` divergence cannot flip cross-engine ranks (the bm25TopK
    * stance). `+ 0.0` normalizes a rounded −0.0 to +0.0 — the engines
    * disagree on the sign of a rounded negative epsilon, and the compare
    * is on bit repr. Rows with NULL or non-positive weight are excluded —
    * zero weight means never sampled, and a negative weight is corrupt
    * input, not a draw.
    *
    * @return input columns + `sample_key` (smaller = stronger draw) +
    *         `rank` (1-based; the rank window runs over the k selected
    *         rows only, never the input)
    */
  /** The A-ES draw key (see [[weightedSample]]): round(ln(−ln u) − ln w, 6),
    * u from md5 of the id — smaller = stronger draw.
    */
  private def aesKey(idCol: String, weightCol: String): org.apache.spark.sql.Column = {
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val u = (v + 1).cast("double") / lit(1152921504606846976.0) // 2^60, exact
    round(log(-log(u)) - log(col(weightCol).cast("double")), 6) + 0.0
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, s"weightedSample needs a positive k, got $k")
    val top = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_key", aesKey(idCol, weightCol))
      .orderBy(col("sample_key").asc, col(idCol))
      .limit(k)
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("sample_key").asc, col(idCol))))
  }

  /** Stratified (per-group) A-ES weighted sampling without replacement:
    * the same draw key as [[weightedSample]], ranked WITHIN each group by
    * a group-partitioned window — partition-parallel across strata, no
    * global TakeOrdered bottleneck, and each stratum's sample is exactly
    * what [[weightedSample]] would have drawn from that stratum alone
    * (the key depends only on (id, weight), never the stratum).
    */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, weightCol: String,
                             groupCol: String, k: Int): DataFrame = {
    require(k > 0, s"weightedSamplePerGroup needs a positive k, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("sample_key").asc, col(idCol))
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("sample_key", aesKey(idCol, weightCol))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Leakage-safe train/validation/test split: every row is assigned a
    * named split by the md5 hash of its GROUP key, so all rows sharing
    * a group — a dedup cluster, a domain, a user — land on the SAME
    * side, and near-duplicate content can never straddle the
    * train/eval boundary (the contamination a row-level random split
    * guarantees at corpus scale). Assignment compares the hash's first
    * 8 hex chars against precomputed cumulative-weight thresholds:
    * fixed-width lowercase hex compares identically in any engine, so
    * the split is deterministic across runs, engines, and
    * partitionings, and an external oracle can replay it literally. A
    * pure projection — no shuffle, no state.
    */
  def hashSplit(df: DataFrame, groupCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, "hashSplit needs at least two splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split names must be distinct: ${splits.map(_._1)}")
    require(splits.forall(_._2 > 0), s"split weights must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: $splits")
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cums.map(c =>
      f"${math.min((c * 4294967296.0).toLong, 4294967295L)}%08x")
    val h = substring(md5(col(groupCol).cast("string")), 1, 8)
    val assign = splits.map(_._1).zip(thresholds).init
      .foldRight(lit(splits.last._1): org.apache.spark.sql.Column) {
        case ((name, t), els) => when(h < lit(t), lit(name)).otherwise(els)
      }
    // a NULL group key would fall through every `<` to the LAST split —
    // polluting the eval side, the exact leakage this operator exists
    // to prevent. Route nulls to the FIRST (train) split explicitly
    // (code-review r7).
    df.withColumn("split",
      when(col(groupCol).isNull, lit(splits.head._1)).otherwise(assign))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-profiling passes — the monitoring reads that run before (and
  * between) quality gates at 100 TB: equi-width histograms and the
  * drift report between two relations' histograms (typically two
  * versions of one table via the stores' `versionAsOf`). Counts are
  * integer-exact and the bucket arithmetic is a single floor/clamp an
  * external engine replicates term by term, so the whole family
  * hash-compares.
  */
object Profiling {

  /** Equi-width histogram of `value`: `nBuckets` buckets of `width`
    * starting at 0, out-of-range values clamped into the FIRST/LAST
    * bucket and NULLs excluded (`least` alone would silently file both
    * nulls and negatives outside the documented 0..nBuckets-1 range —
    * code-review r7). Fixed bounds, not a data-dependent min/max pass —
    * a two-pass form divides by a float range that drifts across
    * engines, and at scale it costs a second full read. One
    * map-side-combined aggregation on ≤ `nBuckets` keys.
    */
  def histogram(df: DataFrame, value: Column, width: Double,
                nBuckets: Int): DataFrame = {
    require(nBuckets >= 1 && width > 0, "histogram needs nBuckets >= 1, width > 0")
    df.filter(value.isNotNull)
      .select(greatest(lit(0L), least(lit(nBuckets - 1L),
        floor(value.cast("double") / width))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        ((col("bucket") + 1) * width).as("hi"), col("n"))
  }

  /** Equi-depth histogram — the profiling complement of the equi-width
    * [[histogram]]: bucket edges sit at the exact interpolated quantiles
    * (computed by the scale-safe [[Ranking.quantilesCont]] range-partition
    * machinery — no whole-column buffer anywhere), so each bucket holds
    * ~1/nBuckets of the rows regardless of the value distribution. Row
    * assignment is ONE narrow pass counting interior edges strictly below
    * the value against the broadcast single-row edge array; ties on an
    * edge go to the lower bucket deterministically. Empty buckets (mass
    * concentrated on one value) simply don't appear.
    */
  def equiDepthHistogram(df: DataFrame, value: Column,
                         nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "equiDepthHistogram needs nBuckets >= 1")
    val base = df.filter(value.isNotNull)
      .select(value.cast("double").as("__v"), lit(1).as("__g"))
    val probs = (0 to nBuckets).map(i => (i.toDouble / nBuckets, s"__q$i"))
    val qs = Ranking.quantilesCont(base, "__g", "__v", probs)
    val edges = qs.select(
      array((0 to nBuckets).map(i => col(s"__q$i")): _*).as("__edges"))
    base.join(broadcast(edges))
      .select(col("__edges"), size(filter(
        slice(col("__edges"), 2, nBuckets - 1),
        e => col("__v") > e)).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), first(col("__edges")).as("__e"))
      .select(col("bucket"),
        element_at(col("__e"), col("bucket") + 1).as("lo"),
        element_at(col("__e"), col("bucket") + 2).as("hi"),
        col("n"))
  }

  /** One-pass table profile: per column, row/null counts, native-typed
    * min/max rendered to strings, and an HLL++ approximate distinct
    * count. ONE aggregation over the table computes every column's
    * stats together (no per-column passes, no countDistinct Expand —
    * the sketch keeps the pass single and the state bounded), then the
    * single result row pivots to one row per column with a codegen'd
    * explode. min/max are computed on the native type and cast after,
    * so a numeric column's extremes are numeric, not lexicographic.
    * Exact distinct counts at 100 TB are a separate deliberate job;
    * the sketch error is ProfilingSpec-pinned within 5% (rsd 0.02 —
    * the default 0.05 standard deviation overshoots 5% routinely).
    */
  def tableProfile(df: DataFrame, cols: Seq[String],
                   rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"columns $cols must exist in ${df.columns.toSeq}")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c"),
      approx_count_distinct(col(c), rsd).as(s"__ad_$c")))
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"),
        col(s"__ad_$c").as("approx_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  /** Histogram drift between `before` and `after` on the same `value`
    * expression: per-bucket counts from both sides full-outer-joined on
    * the bucket id (a bucket present on one side only reports 0 on the
    * other), with the integer delta. Two bounded aggregations plus a
    * ≤ `nBuckets`-row join — the shape of the report is O(buckets)
    * regardless of table size, which is what a per-commit monitoring
    * hook needs.
    */
  def histogramDrift(before: DataFrame, after: DataFrame, value: Column,
                     width: Double, nBuckets: Int): DataFrame = {
    val h0 = histogram(before, value, width, nBuckets)
      .select(col("bucket"), col("n").as("n_before"))
    val h1 = histogram(after, value, width, nBuckets)
      .select(col("bucket"), col("n").as("n_after"))
    h0.join(h1, Seq("bucket"), "full_outer")
      .select(col("bucket"), (col("bucket") * width).as("lo"),
        ((col("bucket") + 1) * width).as("hi"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .withColumn("delta", col("n_after") - col("n_before"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov statistic between two value
    * columns — the distribution-level drift test that complements
    * [[histogramDrift]]'s bucket deltas: D = sup|F_before − F_after|
    * over the pooled values, the classic nonparametric two-sample test.
    *
    * Exactness: at every pooled distinct value,
    * |F_a − F_b| = |cumA·nB − cumB·nA| / (nA·nB) — the NUMERATOR is
    * pure integer arithmetic, so the supremum is found exactly and only
    * ONE division produces the reported statistic (rounded 6). Long
    * arithmetic bounds each side at ~3·10⁹ rows (cum·n must fit a
    * long) — the documented contract; shard larger tables by group
    * before testing.
    *
    * Scale shape: the pooled frame collapses to DISTINCT-VALUE grain
    * first (one map-side-combined count aggregation), then cumulative
    * counts run through the [[Ranking.percentRank]] distributed-prefix
    * machinery — range exchange on the value, per-partition window
    * sums, partition offsets over ≤ shuffle.partitions COUNT rows
    * (metadata). No global sort of raw rows, no single-partition stage
    * over data.
    */
  def ksDrift(before: DataFrame, after: DataFrame, value: Column): DataFrame = {
    val a = before.select(value.as("__v")).filter(col("__v").isNotNull)
      .select(col("__v"), lit(1L).as("__ia"), lit(0L).as("__ib"))
    val b = after.select(value.as("__v")).filter(col("__v").isNotNull)
      .select(col("__v"), lit(0L).as("__ia"), lit(1L).as("__ib"))
    ksFromIndicators(a.unionByName(b))
  }

  /** The KS statistic from PRE-AGGREGATED value counts — (valueCol,
    * cntCol) per side — for callers that maintain counts incrementally
    * (the streaming drift monitor: cumulative per-value counts drained
    * from an update-mode aggregation equal the batch counts, so this
    * answers [[ksDrift]]'s oracle verbatim without re-scanning rows).
    * Count-weighted indicators feed the same integer sup-CDF-gap tail.
    */
  def ksDriftFromCounts(beforeCounts: DataFrame, afterCounts: DataFrame,
                        valueCol: String, cntCol: String): DataFrame = {
    val a = beforeCounts.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"), col(cntCol).cast("long").as("__ia"),
        lit(0L).as("__ib"))
    val b = afterCounts.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("__v"), lit(0L).as("__ia"),
        col(cntCol).cast("long").as("__ib"))
    ksFromIndicators(a.unionByName(b))
  }

  /** Shared KS tail over (value, countA-weight, countB-weight) rows: one
    * aggregation to distinct-value grain, then the range-partitioned
    * integer prefix machinery.
    */
  private def ksFromIndicators(ind: DataFrame): DataFrame = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = ind.groupBy(col("__v"))
      .agg(sum(col("__ia")).as("__ca"), sum(col("__ib")).as("__cb"))
    val ranged = graft.util.Caches.retain(
      p.repartitionByRange(col("__v"))
        .withColumn("__pid", spark_partition_id()).persist(mem))
    val counts = ranged.groupBy(col("__pid"))
      .agg(sum(col("__ca")).as("__ta"), sum(col("__cb")).as("__tb"))
    val prefixW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.select(col("__pid").as("__opid"),
      coalesce(sum(col("__ta")).over(prefixW), lit(0L)).as("__offa"),
      coalesce(sum(col("__tb")).over(prefixW), lit(0L)).as("__offb"))
    val localW = Window.partitionBy(col("__pid")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = ranged.join(broadcast(offs), ranged("__pid") === offs("__opid"))
      .withColumn("__cumA", col("__offa") + sum(col("__ca")).over(localW))
      .withColumn("__cumB", col("__offb") + sum(col("__cb")).over(localW))
    // totals from the per-partition counts (metadata-sized, derived from
    // the PERSISTED frame) — summing `p` directly would re-scan and
    // re-aggregate both inputs end-to-end (code-review r7g); coalesce
    // keeps the both-empty case reporting (0, 0, NULL) like the
    // one-empty-side case, not (NULL, NULL, NULL)
    val tot = counts.agg(
      coalesce(sum(col("__ta")), lit(0L)).as("__na"),
      coalesce(sum(col("__tb")), lit(0L)).as("__nb"))
    cum.crossJoin(broadcast(tot))
      .agg(
        max(abs(col("__cumA") * col("__nb") - col("__cumB") * col("__na")))
          .as("__d"))
      .crossJoin(broadcast(tot))
      .select(col("__na").as("n_before"), col("__nb").as("n_after"),
        when(col("__na") > 0 && col("__nb") > 0,
          round(col("__d").cast("double") /
            (col("__na") * col("__nb")).cast("double"), 6))
          .as("ks_stat"))
  }

  /** Corpus vocabulary drift between two document cohorts — which terms'
    * DOCUMENT frequency shifted most (the corpus-shift alarm term-level
    * histogram drift can't give, because the interesting unit is "what
    * fraction of documents mention X", not value buckets):
    * `drift = ln(((df_a+1)·(n_b+2)) / ((df_b+1)·(n_a+2)))` — the
    * log-odds-style smoothed rate ratio, integer arithmetic up to ONE
    * ln of one division, so it replays bit-exact. Top `k` terms by
    * |drift| (term tiebreak), among terms with total df ≥ `minDf`.
    *
    * One distinct-(doc, term) pass, one term-grain aggregation with
    * map-side partials, a TakeOrdered slice — never a global sort.
    */
  def dfDrift(a: DataFrame, b: DataFrame, idCol: String, textCol: String,
              minDf: Long = 5, k: Int = 50): DataFrame = {
    def df(side: DataFrame, flag: String) = side
      .select(col(idCol),
        explode(graft.functions.Text.tokens(lower(col(textCol)))).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as(flag))
    val na = a.count()
    val nb = b.count()
    val p = (col("df_a") + 1).cast("double") * lit((nb + 2).toDouble)
    val q = (col("df_b") + 1).cast("double") * lit((na + 2).toDouble)
    df(a, "df_a").join(df(b, "df_b"), Seq("term"), "full_outer")
      .select(col("term"),
        coalesce(col("df_a"), lit(0L)).as("df_a"),
        coalesce(col("df_b"), lit(0L)).as("df_b"))
      .filter(col("df_a") + col("df_b") >= minDf)
      .withColumn("drift", round(log(p / q), 6))
      .orderBy(abs(col("drift")).desc, col("term")).limit(k)
  }

  /** k-anonymity release gate over quasi-identifier columns: every
    * combination's population, flagged when it identifies fewer than
    * `k` rows — the "can this corpus slice be published" check. One
    * hash aggregation at quasi-identifier grain.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k > 0, s"kAnonymity needs positive k, got $k")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** l-diversity — [[kAnonymity]]'s stronger sibling (Machanavajjhala et
    * al. 2007): a quasi-identifier group is publishable only if its
    * SENSITIVE attribute takes at least `l` distinct values (a k-large
    * group where everyone shares one sensitive value still leaks it).
    * Same one-aggregation shape; the exact countDistinct runs at group
    * grain, so its state is bounded by the sensitive-attribute domain.
    */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
                 l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(l > 0, s"lDiversity needs positive l, got $l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }
}

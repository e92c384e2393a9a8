package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Scale-safe global quantile bucketing (VERDICT r05 #2).
  *
  * `ntile(k) OVER (ORDER BY …)` is inherently a single-partition window:
  * one task sorts the world. Fine when the window input is a bounded
  * aggregate (the audited w_ntile_deciles shape), wrong once the ranked
  * table itself is large — at genuine 100 TB customer cardinality the
  * global sort is the bottleneck. This operator computes the SAME buckets
  * with exact rank arithmetic and no single-partition exchange:
  *
  *  1. range-repartition on the sort key — Spark's range exchange samples
  *     boundaries and scatters rows so partition i holds keys strictly
  *     before partition i+1's (the first stage of a distributed sort);
  *  2. count rows per partition and prefix-sum the ≤ shuffle-partitions
  *     counts on the driver (bounded metadata, never data rows);
  *  3. rank = partition offset + per-partition row_number — the window is
  *     keyed by partition id, so every partition sorts in parallel;
  *  4. bucket from the rank in closed form: with q = N div k and
  *     rem = N mod k, NTILE gives the FIRST rem buckets q+1 rows and the
  *     rest q — so ranks ≤ (q+1)·rem land in bucket (rank−1) div (q+1) + 1
  *     and the remainder in rem + (rank−1−(q+1)·rem) div q + 1. All
  *     integral `div`, no float rounding at the bucket edges.
  *
  * The verdict sketched this as "decile boundaries + broadcast
  * boundary-join"; rank arithmetic subsumes the boundary join (the rank
  * already locates every row against all k−1 cut points) and needs no
  * second pass to extract the boundary keys.
  */
object Ranking {

  /** Exact NTILE over a global total order, no single-partition exchange.
    *
    * @param df      input frame (any size — nothing here funnels it to one
    *                task)
    * @param buckets NTILE bucket count
    * @param order   total-order sort expressions, e.g.
    *                `Seq(col("spend").desc, col("id"))`; must be a TOTAL
    *                order (include a unique tiebreaker) for the result to
    *                be deterministic — same contract as deterministic
    *                window ranking anywhere else in the repo
    * @param outCol  bucket column name to append
    *
    * The intermediate range-partitioned frame is persisted (it is read by
    * both the counting pass and the ranking pass) and registered with
    * [[graft.util.Caches]] for release via `Dedup.clearCaches()`.
    */
  def ntileExact(df: DataFrame, buckets: Int, order: Seq[Column],
                 outCol: String): DataFrame = {
    require(buckets > 0, s"ntileExact needs a positive bucket count, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = graft.util.Caches.retain(
      df.repartitionByRange(order: _*)
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // ≤ spark.sql.shuffle.partitions rows — bounded partition METADATA,
    // the same collect class as upsertPartitionedBatch's touched-values
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = counts.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) =>
      val o = (pid, acc); acc += cnt; o
    }.toSeq
    val offs = spark.createDataset(offsets).toDF("__pid", "__off")
    val localW = Window.partitionBy(col("__pid")).orderBy(order: _*)
    // NTILE's remainder-to-FIRST-buckets distribution in closed form;
    // `div` keeps the edge math integral (a double division could round
    // across a bucket edge at extreme cardinalities). q=0 (fewer rows than
    // buckets) only exercises the first branch, so its `div q` arm is
    // guarded to a dead 1.
    val q = total / buckets
    val rem = total % buckets
    val bigCut = (q + 1) * rem // ranks ≤ bigCut sit in the q+1-row buckets
    ranged.join(broadcast(offs), "__pid")
      .withColumn("__rank", col("__off") + row_number().over(localW))
      .withColumn(outCol,
        expr(s"""CAST(CASE WHEN __rank <= ${bigCut}L
                 THEN (__rank - 1L) div ${q + 1}L
                 ELSE ${rem}L + (__rank - 1L - ${bigCut}L) div ${math.max(q, 1L)}L
                 END AS INT) + 1"""))
      .drop("__pid", "__off", "__rank")
  }

  /** EXACT per-group linear-interpolated percentiles (quantile_cont
    * semantics) without buffering any group in memory — the scale-safe
    * form of `percentile(...)`, whose ObjectHashAggregate holds EVERY
    * group value in an executor array (the a7 exact form's documented
    * sf-bound, VERDICT r03/r05).
    *
    * Shape: range-repartition on (group, value) — partition sorts are
    * Spark's spillable ExternalSorter, so memory is bounded regardless of
    * group size — then per-partition row_number + prefix-sum offsets
    * (the [[ntileExact]] machinery, here per group) give every row its
    * exact within-group rank. The interpolation targets (the order
    * statistics at ⌊(N−1)·q⌋ and ⌈(N−1)·q⌉, the percentile/quantile_cont
    * definition) come from the same per-(partition, group) counts,
    * computed on the driver — a collect bounded by
    * O(groups + partitions), group METADATA, never values. One final
    * conditional aggregation picks the two target order statistics per
    * group and interpolates.
    *
    * @param probs (probability, output column name) pairs
    */
  def quantilesCont(df: DataFrame, groupCol: String, valCol: String,
                    probs: Seq[(Double, String)]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p._1 >= 0 && p._1 <= 1),
      s"probabilities must be in [0,1]: $probs")
    val spark = df.sparkSession
    val base = df.select(col(groupCol), col(valCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
    val ranged = graft.util.Caches.retain(
      base.repartitionByRange(col(groupCol), col("__v"))
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val gType = df.schema(groupCol).dataType
    val counts = ranged.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__cnt")).collect()
      .map(r => (r.getInt(0), r.get(1), r.getLong(2)))
    // prefix offsets per group across range partitions, and group sizes
    val byGroup = counts.groupBy(_._2)
    val offsetRows = byGroup.toSeq.flatMap { case (g, cs) =>
      var acc = 0L
      cs.sortBy(_._1).map { case (pid, _, cnt) =>
        val r = Row(pid, g, acc); acc += cnt; r
      }
    }
    val offs = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1),
      StructType(Seq(StructField("__opid", IntegerType, nullable = false),
        StructField("__og", gType),
        StructField("__off", LongType, nullable = false))))
    // interpolation targets per group, replicating Spark percentile()'s
    // exact arithmetic so the two forms agree to the LAST ULP: position =
    // (N−1)·q over 0-based indices lower = ⌊position⌋, higher = ⌈position⌉,
    // and p = (higher − position)·x_lower + (position − lower)·x_higher
    // — with the integral-position case collapsing to weights (1, 0)
    // (Spark special-cases higher == lower; weights 1/0 encode that
    // branch-free). The weights ship from the driver pre-computed with
    // the same double ops Spark uses — recomputing `1 − frac` downstream
    // can differ in the last ulp from `higher − position`.
    val targetRows = byGroup.toSeq.map { case (g, cs) =>
      val n = cs.map(_._3).sum
      val fields = probs.flatMap { case (q, _) =>
        val position = (n - 1) * q
        val lower = math.floor(position)
        val higher = math.ceil(position)
        if (higher == lower)
          Seq[Any](lower.toLong + 1, lower.toLong + 1, 1.0, 0.0)
        else
          Seq[Any](lower.toLong + 1, higher.toLong + 1,
            higher - position, position - lower)
      }
      Row.fromSeq(g +: fields)
    }
    val targetSchema = StructType(
      StructField("__tg", gType) +: probs.zipWithIndex.flatMap { case (_, i) =>
        Seq(StructField(s"__lo$i", LongType, nullable = false),
          StructField(s"__hi$i", LongType, nullable = false),
          StructField(s"__wlo$i",
            org.apache.spark.sql.types.DoubleType, nullable = false),
          StructField(s"__whi$i",
            org.apache.spark.sql.types.DoubleType, nullable = false))
      })
    val targets = spark.createDataFrame(
      spark.sparkContext.parallelize(targetRows, 1), targetSchema)
    // joins are NULL-SAFE on the group key (code-review r6): percentile()
    // treats a null group key as a group like any other, so rows must not
    // fall out of the bookkeeping joins
    val localW = Window.partitionBy(col("__pid"), col(groupCol)).orderBy(col("__v"))
    val ranked = ranged.join(broadcast(offs),
        ranged("__pid") === offs("__opid") && ranged(groupCol) <=> offs("__og"))
      .drop("__opid", "__og")
      .withColumn("__rank", col("__off") + row_number().over(localW))
      .join(broadcast(targets), col(groupCol) <=> targets("__tg"))
      .drop("__tg")
    val aggs = probs.zipWithIndex.map { case ((_, name), i) =>
      val loV = max(when(col("__rank") === col(s"__lo$i"), col("__v")))
      val hiV = max(when(col("__rank") === col(s"__hi$i"), col("__v")))
      (first(col(s"__wlo$i")) * loV + first(col(s"__whi$i")) * hiV).as(name)
    }
    val computed = ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    // groups whose every value is NULL were filtered before ranking, but
    // percentile()/quantile_cont still return them with NULL quantiles
    // (code-review r6) — restore them with a null-safe anti-join
    val missing = df.select(col(groupCol)).distinct()
      .join(computed.select(col(groupCol).as("__cg")),
        col(groupCol) <=> col("__cg"), "left_anti")
      .select(col(groupCol) +:
        probs.map { case (_, name) => lit(null).cast("double").as(name) }: _*)
    computed.unionByName(missing)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins — the manual fallback when AQE's runtime
  * skew-join splitting isn't available (e.g. the join sits under an
  * operator AQE won't touch) or a single hot key needs a fixed fan-out.
  *
  * Salting a fact⋈dim join: the fact side gets a deterministic salt in
  * [0, n); the dim side is replicated n× with every salt value; the join
  * key becomes (key, salt), so one hot key's rows spread across n
  * reducers instead of one. Result set is exactly the plain join's —
  * replication only exists on the (small) dim side.
  */
object Skew {

  /** Deterministic per-row salt: hash of the whole row modulo n. Stable
    * under task retry (no rand()), and spreads duplicate keys because
    * non-key columns differ; fully identical rows hash together, which is
    * harmless — they carry no skew a reducer can't absorb linearly.
    */
  private def rowSalt(df: DataFrame, n: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(n.toLong))

  /** Inner equi-join `facts ⋈ dim` on `factKey = dimKey`, salted n ways.
    * `dim` is replicated n× (explode of a literal range — keep it the
    * small side). Output columns: facts.* then dim.* minus its key,
    * exactly like a plain `join(...).drop(dimKey)`.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, numSalts: Int): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val sf = facts.withColumn("__salt_f", rowSalt(facts, numSalts))
    // rename the dim key before joining: drop-by-name after the join would
    // remove BOTH key columns when factKey == dimKey (code-review r3)
    val sd = dim.withColumnRenamed(dimKey, "__dim_key")
      .withColumn("__salt_d", explode(sequence(lit(0L), lit(numSalts.toLong - 1))))
    sf.join(sd, col(factKey) === col("__dim_key") && col("__salt_f") === col("__salt_d"),
        "inner")
      .drop("__salt_f", "__salt_d", "__dim_key")
  }

  /** Key-skew diagnostic for a prospective shuffle/join key: the `topN`
    * heaviest keys with their row counts, share of all rows, and load
    * relative to the mean key — the report you read before choosing a
    * plain shuffle join, a broadcast, or [[saltedJoin]] (a top key at
    * hundreds of × the mean is the salting signal; a tiny key count is
    * the broadcast signal). One hash aggregation over the keys, one
    * TakeOrdered for the top slice, and a single-row broadcast for the
    * corpus totals — no windows, nothing global. Ratios go through
    * double division once (deterministic for the oracle); counts stay
    * exact longs.
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 20): DataFrame = {
    require(topN > 0, "topN must be positive")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__n_keys"))
    counts.orderBy(col("n").desc, col(keyCol)).limit(topN)
      .join(broadcast(totals))
      .select(col(keyCol), col("n"),
        round(col("n").cast("double") / col("__total") * 100d, 6)
          .as("pct_of_rows"),
        round(col("n").cast("double") * col("__n_keys") / col("__total"), 6)
          .as("x_mean_key"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build — the constructive
  * companion to [[Diff]]: where `diff` reports what changed between two
  * versions, `buildType2` turns a whole change log into validity
  * intervals, one row per (key, run of consecutive identical payloads),
  * with `effective_from` / `effective_to` (exclusive; null = still
  * current) and an `is_current` flag.
  *
  * Scale shape: ONE key-hash shuffle. Both window passes (the `lag`
  * change-point mark and the `lead` interval span) partition by the same
  * keys, so Catalyst reuses the exchange and the second pass only
  * re-sorts the already-filtered change points. Payload columns compare
  * as a single null-safe struct — arbitrarily wide rows cost one
  * comparison, `NULL -> NULL` collapses into the surrounding run, and
  * `NULL -> value` is a real change. No whole-group buffers: windows
  * stream within a partition, so a key with millions of log rows spills
  * through the sort, never through an aggregation buffer.
  *
  * Contract: `orderCol` must be unique within a key (a version number,
  * a line number, an event sequence) — ties would make `lag`/`lead`
  * nondeterministic. Rows with a null `orderCol` carry no position in
  * the history and are dropped.
  */
object Scd {

  /** Collapse `log` into Type-2 validity intervals keyed by `keys` and
    * ordered by `orderCol`. Every column that is neither a key nor the
    * order column is payload. Output: keys, `effective_from` (the order
    * value opening the run), `effective_to` (the next run's
    * `effective_from`, null for the current run), `is_current`, then the
    * payload columns.
    */
  def buildType2(log: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    require(keys.nonEmpty, "buildType2 needs at least one key column")
    require(log.columns.contains(orderCol),
      s"order column $orderCol must exist in ${log.columns.toSeq}")
    require(keys.forall(log.columns.contains),
      s"keys $keys must exist in ${log.columns.toSeq}")
    require(!keys.contains(orderCol), "orderCol cannot also be a key")
    require(!log.columns.contains("__prev"),
      "a payload column named __prev would collide with the change-point marker — rename it")
    val payloadCols = log.columns.toSeq.filterNot(c => keys.contains(c) || c == orderCol)
    // __present rides along so a first-row lag-null is distinguishable
    // from a payload that is entirely null (same marker as Diff.diff)
    val pay = struct(lit(true).as("__present") +: payloadCols.map(col): _*)
    val byOrder = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val changePoints = log
      .filter(col(orderCol).isNotNull)
      .withColumn("__prev", lag(pay, 1).over(byOrder))
      .filter(col("__prev").isNull || !(pay <=> col("__prev")))
      .select((keys.map(col) :+ col(orderCol).as("effective_from")) ++
        payloadCols.map(col): _*)
    val bySpan = Window.partitionBy(keys.map(col): _*).orderBy(col("effective_from"))
    changePoints
      .withColumn("effective_to", lead(col("effective_from"), 1).over(bySpan))
      .withColumn("is_current", col("effective_to").isNull)
      .select((keys.map(col) ++ Seq(col("effective_from"), col("effective_to"),
        col("is_current")) ++ payloadCols.map(col)): _*)
  }

  /** Point-in-time lookup over a Type-2 table built by [[buildType2]]:
    * the one row per key whose interval contains `at`
    * (`effective_from <= at < effective_to`, open current intervals
    * included). A filter, not a join — the interval table already has at
    * most one matching run per key.
    */
  def asOf(scd2: DataFrame, at: org.apache.spark.sql.Column): DataFrame =
    scd2.filter(col("effective_from") <= at &&
      (col("effective_to").isNull || at < col("effective_to")))

  /** Temporal enrichment: each `facts` row left-joined to the one
    * `scd2` run valid at its `timeCol` — the event-time-correct
    * dimension lookup (joining `is_current` instead would rewrite
    * history). The equi-keys carry the join (one key shuffle each side,
    * or a broadcast when the dimension is small); the interval bounds
    * ride along as join residuals, and intervals are disjoint per key,
    * so output multiplicity equals the fact multiplicity — no range-join
    * blowup. Facts before their key's first run (or with a null time)
    * keep null payloads. Also works with a STREAMING `facts` frame:
    * stream-static left joins with residual conditions are supported
    * per micro-batch.
    */
  def enrichAsOf(facts: DataFrame, scd2: DataFrame, keys: Seq[String],
                 timeCol: String): DataFrame = {
    require(keys.nonEmpty, "enrichAsOf needs at least one key column")
    val payload = scd2.columns.toSeq.filterNot(keys.contains)
    val clash = facts.columns.toSeq.intersect(payload)
    require(clash.isEmpty,
      s"fact columns $clash would collide with the dimension payload — rename first")
    val f = facts.alias("__f")
    val d = scd2.alias("__d")
    val t = col(s"__f.$timeCol")
    val cond = keys.map(k => col(s"__f.$k") === col(s"__d.$k")).reduce(_ && _) &&
      col("__d.effective_from") <= t &&
      (col("__d.effective_to").isNull || t < col("__d.effective_to"))
    f.join(d, cond, "left")
      .select(facts.columns.toSeq.map(c => col(s"__f.$c")) ++
        payload.map(c => col(s"__d.$c")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed upsert — the reference's Delta MERGE
  * (containers/transformation/transform.py:331-336: match on
  * `(order_id, product_id)`, whenMatchedUpdateAll / whenNotMatchedInsertAll)
  * re-expressed without Delta (SURVEY.md §7.3): full outer equi-join on the
  * key + per-column `coalesce(new, old)`.
  *
  * MERGE errors when the source has multiple rows per key; the reference's
  * data can contain key dupes (validation only *flags* them,
  * validate.py:223-224), so we define last-writer-wins dedup of the source
  * first (SURVEY.md §7.4.3) — deterministic given a tiebreaker ordering.
  *
  * Scale notes: the join is a plain equi-join on the upsert key — Catalyst
  * shuffles both sides by key (sort-merge) or broadcasts a small source
  * batch; AQE picks at runtime. In the streaming pipeline this runs per
  * micro-batch inside `foreachBatch` where the batch side is typically tiny
  * → broadcast-hash. No driver materialization anywhere.
  */
object Upsert {

  /** Last-writer-wins dedup of a batch on `keys`, ordering ties by
    * `tiebreaker` descending (e.g. an update timestamp or batch sequence).
    */
  def dedupLastWins(batch: DataFrame, keys: Seq[String], tiebreaker: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tiebreaker).desc)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MERGE update-all/insert-all: every row of `updates` replaces (by key)
    * or is appended to `target`. Non-key columns are taken from `updates`
    * when the key matched, else kept from `target`. Requires both frames to
    * share a schema (update-all semantics) and `updates` to be key-unique
    * (apply [[dedupLastWins]] first if not).
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    val dataCols = target.columns.filterNot(keys.contains)
    val t = target.as("t")
    // Row-presence marker: distinguishes "no matching update row" from "an
    // update row whose value is null" even when key columns are nullable.
    val u = updates.withColumn("__present", lit(true)).as("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val fromU = col("u.__present").isNotNull
    t.join(u, cond, "full_outer").select(
      keys.map(k => when(fromU, col(s"u.$k")).otherwise(col(s"t.$k")).as(k)) ++
        dataCols.map { c =>
          // matched → update-all (u wins); unmatched target row → keep t;
          // unmatched update row → insert u.
          when(fromU, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
        }: _*
    )
  }
}

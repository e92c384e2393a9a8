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
  /** [[upsert]] with AUTOMATIC SCHEMA EVOLUTION — the reference's Delta
    * MERGE under `autoMerge` (transform.py:331-339 on Delta 2.4: a source
    * batch carrying a column the table has never seen unions it into the
    * table schema instead of erroring):
    *
    *  - columns in BOTH frames keep [[upsert]]'s update-all semantics;
    *  - target-only columns keep the target's value (an inserted update
    *    row gets null — it never had one);
    *  - update-only columns APPEND to the schema: matched/inserted rows
    *    take the update's value, unmatched target rows get null;
    *  - a shared column whose TYPES disagree is rejected LOUDLY, naming
    *    the columns — silent cross-type coalesce is how a lake corrupts
    *    (Delta raises the same way rather than casting).
    *
    * Column order is the target's schema followed by the new columns in
    * the update's order (Delta's append-at-end rule), so existing readers
    * keep their positional expectations.
    */
  def upsertEvolve(target: DataFrame, updates: DataFrame,
                   keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsertEvolve needs at least one key column")
    require(!target.columns.contains("__present") &&
      !updates.columns.contains("__present"),
      "'__present' is this operator's internal row-presence marker — " +
        "rename the column before merging")
    keys.foreach { k =>
      require(target.columns.contains(k) && updates.columns.contains(k),
        s"key column '$k' must exist on both sides")
    }
    val tTypes = target.schema.map(f => f.name -> f.dataType).toMap
    val uTypes = updates.schema.map(f => f.name -> f.dataType).toMap
    val conflicts = target.columns.filter(c =>
      uTypes.contains(c) && uTypes(c) != tTypes(c))
    require(conflicts.isEmpty,
      s"schema evolution rejects type conflicts: ${conflicts.map(c =>
        s"$c (table ${tTypes(c).simpleString} vs batch ${uTypes(c).simpleString})")
        .mkString(", ")}")
    val shared = target.columns.filter(c => !keys.contains(c) && uTypes.contains(c))
    val uOnly = updates.columns.filter(c => !keys.contains(c) && !tTypes.contains(c))
    val t = target.as("t")
    val u = updates.withColumn("__present", lit(true)).as("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val fromU = col("u.__present").isNotNull
    t.join(u, cond, "full_outer").select(
      keys.map(k => when(fromU, col(s"u.$k")).otherwise(col(s"t.$k")).as(k)) ++
        target.columns.filter(!keys.contains(_)).map { c =>
          if (shared.contains(c))
            when(fromU, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)
          else col(s"t.$c").as(c) // target-only: update rows have none
        } ++
        uOnly.map(c => col(s"u.$c").as(c)): _* // null on unmatched t rows
    )
  }

  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(!target.columns.contains("__present") &&
      !updates.columns.contains("__present"),
      "'__present' is this operator's internal row-presence marker — " +
        "rename the column before merging")
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

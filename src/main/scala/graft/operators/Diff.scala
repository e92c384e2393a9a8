package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed table diff — the audit companion to the snapshot stores' version
  * reads: which rows were added, removed, or changed between two
  * relations of the same schema (typically two versions of one table via
  * `versionAsOf`). One shuffle join on the key; non-key columns compare
  * as a single null-safe struct, so arbitrarily wide rows cost one
  * comparison and changed-ness never misreads NULLs. Unchanged rows are
  * filtered before the result leaves the join, so output is proportional
  * to the real change set, not the table.
  */
object Diff {

  /** Rows differing between `a` (the older relation) and `b` (the newer),
    * keyed by `keys`: `added` = key only in `b`, `removed` = only in `a`,
    * `changed` = in both with different non-key values. A keys-only
    * schema degenerates to added/removed detection.
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"schemas must match: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    require(keys.forall(a.columns.contains),
      s"keys $keys must exist in ${a.columns.toSeq}")
    val others = a.columns.toSeq.filterNot(keys.contains)
    // a non-null marker rides along even when every payload column is
    // null (or there are none), so outer-join absence stays detectable
    def payload(df: DataFrame, name: String) =
      df.select(keys.map(col) :+
        struct(lit(true).as("__present") +: others.map(col): _*).as(name): _*)
    val av = payload(a, "__va")
    val bv = payload(b, "__vb")
    av.join(bv, keys, "full_outer")
      .withColumn("change",
        when(col("__va").isNull, lit("added"))
          .when(col("__vb").isNull, lit("removed"))
          .when(!(col("__va") <=> col("__vb")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) :+ col("change"): _*)
  }
}

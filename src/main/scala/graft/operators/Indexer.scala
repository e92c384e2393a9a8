package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary (label) encoding for categorical columns — the feature-prep
  * step every ML training pipeline runs before a model sees strings (the
  * StringIndexer of Spark MLlib, re-expressed as plain relational ops so
  * it composes with the rest of the engine and replays under the DuckDB
  * oracle).
  *
  * Index order is frequency DESC then value ASC — MLlib's default
  * `frequencyDesc` with a deterministic total tie-break, so the mapping
  * is identical across runs, partitionings, and engines. Index 0 is the
  * most frequent label, which is what makes the encoding useful for
  * frequency-aware embedding tables and default-bucket tricks.
  *
  * Scale shape: the mapping is one map-side-combined count aggregation
  * over the column; the rank window runs over the DISTINCT LABELS — a
  * categorical column's vocabulary is dimension-grade by definition (if
  * it were fact-grade you would not dictionary-encode it), and that
  * bound is the documented contract, same class as the centroid/manifest
  * driver lists. Encoding joins the mapping back broadcast — the fact
  * table never reshuffles.
  */
object Indexer {

  /** The label → index mapping for `column`: `(label, label_count, idx)`
    * with idx 0-based dense in (count DESC, label) order. NULL labels
    * are excluded (encode them with an explicit sentinel before calling
    * if you need them mapped).
    */
  def labelIndex(df: DataFrame, column: String): DataFrame = {
    val counts = df.filter(col(column).isNotNull)
      .groupBy(col(column).as("label"))
      .agg(count(lit(1)).as("label_count"))
    counts.withColumn("idx",
      row_number().over(
        Window.orderBy(col("label_count").desc, col("label"))) - 1)
  }

  /** `df` with `column` joined to its integer index as `outCol`. Labels
    * absent from `mapping` (new data against a frozen mapping) get NULL
    * — surface them, don't invent indices.
    */
  def encode(df: DataFrame, column: String, mapping: DataFrame,
             outCol: String): DataFrame =
    df.join(
      broadcast(mapping.select(col("label").as(column), col("idx").as(outCol))),
      Seq(column), "left")
}

package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** ST2 (batch form) — processed-file bookkeeping.
  *
  * The reference keeps `validated_files_state.json` /
  * `transformed_files_state.json` on S3 and diffs python sets to decide what
  * still needs work (reference containers/validation/validate.py:145-170,
  * 328-330; containers/transformation/transform.py:193-214, 432-434). Here
  * the state is a tiny parquet table of paths and the diff is a distributed
  * `except` — same semantics (exactly-once per file, idempotent re-runs),
  * no driver-side set, works at any file count.
  */
object FileState {

  val schema: StructType = StructType(Seq(StructField("path", StringType)))

  private def bakPath(p: Path) = new Path(p.getParent, s".${p.getName}_bak")

  /** Load the processed-file set; empty if never saved. A missing state
    * file with a backup present means a save() crashed mid-swap — restore
    * the backup first. The filesystem metadata calls and the footer read
    * are retried with backoff (the reference decorates its S3 state reads
    * the same way, validate.py:84-104).
    */
  def load(spark: SparkSession, statePath: String): DataFrame =
    graft.util.Retry.withBackoff() {
      val p = new Path(statePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p) && fs.exists(bakPath(p))) fs.rename(bakPath(p), p)
      if (fs.exists(p)) spark.read.schema(schema).parquet(statePath)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Files that still need processing: arrived − processed
    * (transform.py:434 `validated_files - transformed_files`).
    */
  def pending(arrived: DataFrame, processed: DataFrame): DataFrame =
    arrived.select("path").except(processed.select("path"))

  /** New state after a successful run: processed ∪ done, deduped
    * (validate.py:350-352 adds the batch to the state set).
    */
  def markProcessed(processed: DataFrame, done: DataFrame): DataFrame =
    processed.select("path").unionByName(done.select("path")).distinct()

  /** Persist the state table (tiny). Stage → move old to backup → move
    * staged in → drop backup: every crash point leaves either the previous
    * state or a backup that [[load]] restores — delete-then-rename would
    * have a window losing the state entirely (code-review r3).
    */
  def save(state: DataFrame, statePath: String): Unit = {
    val spark = state.sparkSession
    val p = new Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, s".${p.getName}_staging")
    state.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val bak = bakPath(p)
    fs.delete(bak, true)
    if (fs.exists(p)) fs.rename(p, bak)
    fs.rename(tmp, p)
    fs.delete(bak, true)
  }
}

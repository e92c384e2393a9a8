package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The shared per-batch partition-dir COMPACTION contract — a
  * long-running foreachBatch stream writes one `batch=N` dir per trigger
  * under each state root (registry digests, gated survivors, sighting
  * counts, …); without folding, every later read pays an O(triggers)
  * file-listing fan-in. This object is the one implementation of the
  * fold that [[CurateStream]] pioneered and [[WetStream]] /
  * [[PassageStream]]-class streams reuse:
  *
  *  - **Crash-safe by ordering, not locking**: the merged blob is fully
  *    WRITTEN (staged outside the root, then renamed to a fresh reserved
  *    NEGATIVE batch id) before any absorbed partition deletes, so every
  *    interruption window leaves rows present somewhere — never lost.
  *  - **The absorbed-marker contract**: the blob carries an `_absorbed`
  *    file (underscore prefix — parquet readers skip it) naming the dirs
  *    it folded, written INSIDE the staging dir so the rename publishes
  *    data + absorbed-list atomically. Readers of non-duplicate-tolerant
  *    state ([[readLive]]) exclude marked dirs even when a crash
  *    interrupted the post-rename deletes; duplicate-tolerant readers
  *    (an anti-join registry probe) may keep reading the root glob.
  *  - **Redelivery boundary**: only batches the CHECKPOINT committed
  *    past may fold (`upToBatch` exclusive) — an at-least-once source
  *    redelivers at most the last uncommitted batch, and a redelivered
  *    batch whose own partition was absorbed would see its OWN state as
  *    prior-era. Negative blob ids can never equal a live batch id, so
  *    every current-batch exclusion filter keeps working.
  *  - **Reader coordination**: run between triggers (the foreachBatch
  *    thread after its sink writes, where the committed boundary is
  *    known); probe reads additionally set ignoreMissingFiles so a
  *    mis-scheduled fold degrades, never fails a trigger.
  */
object Compaction {

  /** Marker file a compaction blob carries: the batch-dir names it
    * absorbed, one per line.
    */
  private[streaming] val AbsorbedMarker = "_absorbed"

  /** Dir names under `root` that a published blob's marker lists as
    * absorbed — readers of non-duplicate-tolerant state must skip them.
    */
  private[streaming] def deadDirNames(fs: FileSystem, root: Path): Set[String] =
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=-"))
      .flatMap { d =>
        val m = new Path(d.getPath, AbsorbedMarker)
        if (!fs.exists(m)) Seq.empty[String]
        else {
          val in = fs.open(m)
          try scala.io.Source.fromInputStream(in).getLines()
            .filter(_.nonEmpty).toList
          finally in.close()
        }
      }.toSet

  /** Schema-pinned read of every LIVE `batch=N` dir under `root` —
    * enumerated explicitly (distinct dir lists make file-source plans
    * distinct across triggers, the [[CurateStream.readGated]]
    * CacheManager lesson), absorbed dirs excluded by the marker, a
    * never-written or fully-empty root reading as the empty frame.
    * `ddl` is the FILE schema (no partition column — per-batch writers
    * here write data columns only; the batch id lives in the dir name).
    */
  def readLive(spark: SparkSession, rootDir: String, ddl: String): DataFrame = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dead = deadDirNames(fs, root)
    val dirs =
      if (fs.exists(root))
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName.startsWith("batch=") && !dead(p.getName))
          .map(_.toString).sorted.toSeq
      else Seq.empty
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(ddl))
    else
      spark.read.schema(ddl).option("ignoreMissingFiles", "true")
        .parquet(dirs: _*)
  }

  /** Fold every live partition below `upToBatch` (plus earlier blobs)
    * into one fresh blob under the next unused negative id, publish it
    * with the absorbed marker, then delete the absorbed dirs. `fold`
    * merges the union of absorbed rows — identity for disjoint unions,
    * `.distinct()` for registries, a groupBy-sum for additive counters;
    * it must be deterministic and duplicate-collapsing ENOUGH for its
    * readers (a blob re-fold sees each live row exactly once either way,
    * because absorbed dirs delete or die by marker).
    */
  def compactDir(spark: SparkSession, rootDir: String, dataSchema: String,
                 upToBatch: Long,
                 fold: DataFrame => DataFrame = identity): Unit = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val dead = deadDirNames(fs, root)
    val all = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch="))
    val live = all.filterNot(dead)
    val liveIds = live.map(_.stripPrefix("batch=").toLong)
    val absorbed = liveIds.filter(id => id < 0 || id < upToBatch)
    // still garbage-collect a prior crash's leftover dead dirs even when
    // there is nothing new to fold
    if (absorbed.count(_ >= 0) == 0 && absorbed.length <= 1) {
      dead.foreach(n => fs.delete(new Path(root, n), true))
      return
    }
    // min over EVERY dir (dead included) so a crash can never reuse a
    // blob id that a lingering marker still references
    val newId = all.map(_.stripPrefix("batch=").toLong).min - 1L
    val merged = fold(spark.read.schema(dataSchema)
      .option("ignoreMissingFiles", "true")
      .parquet(absorbed.map(id => s"$rootDir/batch=$id"): _*))
    // stage OUTSIDE the partitioned root (never write into a tree being
    // read), marker INSIDE the staging dir, then one atomic rename
    val tmp = new Path(s"${rootDir}_compact_tmp")
    fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    val out = fs.create(new Path(tmp, AbsorbedMarker), true)
    out.writeBytes(absorbed.sorted.map(id => s"batch=$id")
      .mkString("", "\n", "\n"))
    out.close()
    // a failed rename (plausible on object-store FileSystems) must ABORT
    // before the absorbed-dir deletes — otherwise the folded rows would
    // be deleted without the blob that replaces them ever publishing
    require(fs.rename(tmp, new Path(s"$rootDir/batch=$newId")),
      s"compaction publish rename failed: $tmp -> $rootDir/batch=$newId")
    absorbed.foreach(id => fs.delete(new Path(s"$rootDir/batch=$id"), true))
    dead.foreach(n => fs.delete(new Path(root, n), true))
  }

  /** Convenience: fold to the distinct rows of `cols` (registry dirs). */
  def distinctFold(cols: Seq[String]): DataFrame => DataFrame =
    df => df.select(cols.map(col): _*).distinct()
}

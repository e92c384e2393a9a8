package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition-manifest snapshot commits — [[SnapshotStore]]'s reader
  * isolation at the partitioned sink's O(touched-partitions) write cost
  * (the Iceberg-style combination both named as the next step).
  *
  * A committed version `v_<batch>` holds ONLY the partition directories
  * its batch touched, plus a `_manifest` file mapping every LIVE
  * partition directory name to the version that owns its current data —
  * untouched partitions are inherited by reference, not copied. The
  * commit point stays [[SnapshotStore.pointTo]]'s single atomic pointer
  * rename, so a reader resolves pointer → manifest → a set of
  * directories no writer ever mutates:
  *
  *  - per-batch write cost is O(touched partitions) — the rename-swap
  *    partitioned sink's property, now WITH snapshot isolation;
  *  - a version's data dirs and its manifest commit atomically (the
  *    manifest lives inside the version dir, published by the pointer);
  *  - when the live manifest would reference more than
  *    `maxManifestVersions` distinct versions, the commit COMPACTS: it
  *    rewrites the whole table into the new version (amortized O(1) per
  *    partition) so reader fan-in stays bounded;
  *  - reclamation deletes versions referenced by neither the new nor the
  *    previous manifest AND older than `retentionMs` — a manifest read
  *    spans several per-version directory reads, so an in-flight reader
  *    can straddle MANY commits; the age horizon (Delta's tombstone
  *    retention, default 10 minutes) is what actually protects it, the
  *    manifest-reference check just reclaims eagerly past it.
  *
  * Partition directory names carry Spark's own value escaping (the
  * writer lists what `partitionBy` wrote instead of reconstructing names
  * from values — null lands in `__HIVE_DEFAULT_PARTITION__` like any
  * partitioned table).
  */
object ManifestStore {

  private val ManifestName = "_manifest"

  /** The live manifest of a committed version: partition dir name → the
    * version id owning that partition's data.
    */
  def readManifest(fs: FileSystem, root: Path, version: Long): Map[String, Long] = {
    val p = new Path(SnapshotStore.versionDir(root, version), ManifestName)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).getLines()
      .filter(_.nonEmpty)
      .map { line =>
        val i = line.lastIndexOf('\t')
        line.substring(0, i) -> line.substring(i + 1).toLong
      }.toMap
    finally in.close()
  }

  private def writeManifest(fs: FileSystem, vdir: Path,
                            manifest: Map[String, Long]): Unit = {
    val out = fs.create(new Path(vdir, ManifestName), true)
    out.writeBytes(manifest.toSeq.sortBy(_._1)
      .map { case (d, v) => s"$d\t$v" }.mkString("", "\n", "\n"))
    out.close()
  }

  /** Read the table a manifest describes: group the partition dirs by
    * owning version and read each group with that version dir as
    * `basePath`, so Spark re-derives the partition column and applies
    * partition pruning per group; reader fan-in is bounded by the
    * compaction threshold.
    */
  private def readManifested(spark: SparkSession, root: Path,
                             manifest: Map[String, Long]): DataFrame = {
    require(manifest.nonEmpty, s"empty manifest under $root")
    manifest.groupBy(_._2).toSeq.sortBy(_._1).map { case (v, parts) =>
      val vdir = SnapshotStore.versionDir(root, v)
      spark.read.option("basePath", vdir.toString)
        .parquet(parts.keys.toSeq.sorted.map(d => new Path(vdir, d).toString): _*)
    }.reduce(_ unionByName _)
  }

  /** Snapshot-isolated read of the committed partitioned table. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = SnapshotStore.currentVersion(fs, rootPath).getOrElse(
      throw new IllegalStateException(
        s"no committed snapshot under $root — the writer has not completed a batch"))
    readManifested(spark, rootPath, readManifest(fs, rootPath, v))
  }

  /** Merge `batch` into the committed table and commit version `batchId`:
    * write the touched (or, when compacting, all) partitions under the
    * new version dir, publish the updated manifest, flip the pointer,
    * reclaim unreferenced versions. Caller holds the writer lock and has
    * gated on replayed batch ids.
    */
  def commitPartitioned(spark: SparkSession, root: Path, batchId: Long,
                        batch: DataFrame, keys: Seq[String],
                        partitionCol: String,
                        merge: (DataFrame, DataFrame, Seq[String]) => DataFrame,
                        maxManifestVersions: Int = 16,
                        retentionMs: Long = 10 * 60 * 1000L): Unit = {
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val cur = SnapshotStore.currentVersion(fs, root)
    val prevManifest = cur.map(v => readManifest(fs, root, v)).getOrElse(Map.empty)
    val compact = prevManifest.values.toSet.size + 1 > maxManifestVersions
    val pc = org.apache.spark.sql.functions.col(partitionCol)
    val merged =
      if (prevManifest.isEmpty) batch
      else {
        val table = readManifested(spark, root, prevManifest)
        if (compact) merge(table, batch, keys)
        else {
          // O(touched): only the batch's partitions are read (partition
          // pruning applies inside each per-version read) and rewritten.
          // Same bounded VALUES collect and null arm as the rename-swap
          // partitioned sink; same key-stays-in-its-partition
          // precondition.
          val touched = batch.select(partitionCol).distinct().collect().map(_.get(0))
          val (nullTouched, nonNull) = touched.partition(_ == null)
          val touchedPred =
            if (nullTouched.isEmpty) pc.isin(nonNull: _*)
            else if (nonNull.isEmpty) pc.isNull
            else pc.isin(nonNull: _*) || pc.isNull
          merge(table.filter(touchedPred), batch, keys)
        }
      }
    val vdir = SnapshotStore.versionDir(root, batchId)
    merged.write.mode("overwrite").partitionBy(partitionCol).parquet(vdir.toString)
    val written = fs.listStatus(vdir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .map(_.getPath.getName)
    if (prevManifest.isEmpty && written.isEmpty)
      // an empty FIRST batch commits nothing readable — skip rather than
      // publish a schema-less table; the pointer stays unset
      return
    val newManifest =
      if (compact) written.map(_ -> batchId).toMap
      else prevManifest ++ written.map(_ -> batchId)
    writeManifest(fs, vdir, newManifest)
    SnapshotStore.pointTo(fs, root, batchId)
    val keep = newManifest.values.toSet ++ prevManifest.values.toSet + batchId
    val now = System.currentTimeMillis()
    fs.listStatus(root).map(_.getPath.getName)
      .flatMap(n => if (n.startsWith("v_"))
        scala.util.Try(n.stripPrefix("v_").toLong).toOption else None)
      .filterNot(keep)
      .filter { v =>
        try now - fs.getFileStatus(SnapshotStore.versionDir(root, v))
          .getModificationTime > retentionMs
        catch { case _: Throwable => false }
      }
      .foreach(v => fs.delete(SnapshotStore.versionDir(root, v), true))
  }
}

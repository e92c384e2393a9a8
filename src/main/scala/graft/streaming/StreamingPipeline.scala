package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row
import graft.operators.Upsert
import graft.transform.Kpis

/** ST1/ST4/ST5/ST7 — the event-driven pipeline as Structured Streaming.
  *
  * The reference is "real-time" by orchestration: S3 file event → Lambda →
  * Glue → Step Function → ECS transform, with KPIs MERGEd into Delta and
  * put into DynamoDB per trigger batch (reference glue_job.py:150-162,
  * transform.py:329-404). Structured Streaming collapses that to: a file
  * source (new file in directory = new data, ST1), micro-batch triggers
  * (ST4), a cumulative streaming aggregation in update mode whose changed
  * rows are upserted per batch (ST5), and an idempotent keyed sink + the
  * checkpoint's exactly-once file tracking (ST2/ST7).
  */
object StreamingPipeline {

  /** ST1: file-arrival stream — every file that lands in `dir` after the
    * checkpoint becomes new rows, exactly once (the file source's seen-files
    * log replaces the reference's validated/transformed state JSONs,
    * validate.py:328-330, transform.py:432-434).
    */
  def fileStream(spark: SparkSession, schema: StructType, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** ST2 (streaming form): drop re-delivered rows by key across
    * micro-batches — `dropDuplicates` over a stream keeps a state-store
    * entry per seen key (the reference's processed-file JSON set,
    * validate.py:328-330, as managed state). Unbounded keys grow state
    * forever, faithful to the reference; compose with `withWatermark`
    * upstream to bound it.
    */
  def dedupStream(stream: DataFrame, keyCols: Seq[String]): DataFrame =
    stream.dropDuplicates(keyCols)

  /** ST2, state-bounded form: drop re-delivered keys but keep each key's
    * state-store entry only until the watermark passes its event time —
    * `dropDuplicatesWithinWatermark` guarantees dedup for duplicates whose
    * event times land within the watermark delay of each other, and lets
    * the engine evict everything older. This is the 100 TB default: state
    * is O(distinct keys per watermark window), not O(keys ever seen), so
    * an unbounded stream no longer grows the state store without bound
    * (the failure mode [[dedupStream]] inherits from the reference's
    * never-pruned processed-file set, validate.py:328-330).
    */
  def dedupStreamBounded(stream: DataFrame, keyCols: Seq[String],
                         tsCol: String, watermark: String): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** ST5/ST7 per-batch sink: keyed upsert of the micro-batch into a parquet
    * table at `targetDir/data`, with a staging-write + rename swap so readers
    * never see a half-written table. Idempotent: re-running a batch after a
    * failure rewrites the same cumulative values for the same keys — the
    * exactly-once recipe (replayable source + idempotent keyed sink, ST7;
    * the reference relies on DynamoDB put idempotency the same way,
    * transform.py:379-387).
    */
  /** Crash recovery for the rename swaps below: if a previous run died
    * between "rename current away" and "rename staged in", the table only
    * survives in a `_bak_*` directory — restore the newest one before
    * reading. Makes the swap windows safe: every crash point leaves either
    * the old table, the backup, or the new table recoverable.
    */
  private def recoverBackup(fs: org.apache.hadoop.fs.FileSystem,
                            root: Path, cur: Path): Unit =
    if (!fs.exists(cur) && fs.exists(root)) {
      val baks = fs.listStatus(root)
        // full-table backups only: partition-level backups carry the
        // partition dir name (`_bak_<id>_<col>=<value>`) and must never be
        // promoted to be the whole table (ADVICE r03)
        .filter { s =>
          val n = s.getPath.getName
          n.startsWith("_bak_") && !n.contains("=")
        }
        .sortBy(_.getModificationTime)
      baks.lastOption.foreach(b => fs.rename(b.getPath, cur))
    }

  /** Crash recovery for [[upsertPartitionedBatch]]'s per-partition swaps
    * (ADVICE r03): a crash between "rename dest away" and "rename staged in"
    * leaves that partition only in `_bak_<batchId>_<col>=<value>`. On entry,
    * rename each such backup back under data/ when its destination is
    * missing (the swap never completed — restore, so the replayed merge
    * sees the old rows); when the destination exists the swap DID complete
    * and only the backup cleanup was lost — drop it.
    */
  private def recoverPartitionBackups(fs: org.apache.hadoop.fs.FileSystem,
                                      root: Path, cur: Path,
                                      partitionCol: String): Unit =
    if (fs.exists(root)) {
      val marker = partitionCol + "="
      fs.listStatus(root)
        .map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.startsWith("_bak_") && n.contains(marker)
        }
        .foreach { bak =>
          val partName = bak.getName.substring(bak.getName.indexOf(marker))
          val dest = new Path(cur, partName)
          if (fs.exists(dest)) fs.delete(bak, true)
          else { fs.mkdirs(cur); fs.rename(bak, dest) }
        }
    }

  /** Single-writer fencing for the rename-swap tables (VERDICT r04 #4):
    * the swap protocol is crash-safe but NOT multi-writer-safe — two
    * writers interleaving rename(cur, bak)/rename(tmp, cur) can each
    * promote a merge that never saw the other's rows (the reference's
    * Delta MERGE is ACID under concurrent writers, transform.py:331-339;
    * this is the explicit substitute contract). A `_writer_lock` file
    * created with overwrite=false fences: the second writer fails fast
    * with a clear error instead of silently losing updates.
    *
    * A crashed holder can't release, so a found lock is broken when its
    * recorded pid is provably dead on this host (pid gone, or pid
    * recycled — the token records the holder's process START time, so a
    * reused pid number with a different start is still recognized as
    * dead), or — cross-host, where pid liveness is unknowable — when it
    * is older than `staleMs`. A corrupt/truncated token (a holder that
    * crashed mid-write) has no trustworthy host or ts, so its age falls
    * back to the FILE's modification time and the staleness break
    * applies — otherwise an unparseable lock would be unbreakable
    * forever. A live same-host holder is NEVER broken by age (its merge
    * may simply be long; code-review r5). A live same-JVM or fresh
    * foreign lock throws.
    *
    * Breaking is best-effort-atomic: the stale lock is RENAMED to a unique
    * name (on local/HDFS only one breaker's rename succeeds), the renamed
    * file is verified to be the one inspected (a mismatch means a fresh
    * lock raced in — it is renamed back, with retries; a rename-back that
    * still fails LEAVES the file under its broken name so the evidence
    * survives and the displaced holder's nonce-keyed release check can
    * detect the loss — ADVICE r5), and only then is the free path
    * raced for with create(overwrite=false). Release deletes the lock only
    * if it still carries THIS writer's nonce, so a holder whose lock was
    * legitimately broken cannot delete its successor's lock. Without an
    * atomic compare-and-swap primitive a read-check-act window remains on
    * both paths; it needs ≥3 writers racing a dead lock within
    * milliseconds — the documented residual against which the reference's
    * ACID MERGE is the real answer (transform.py:331-339).
    *
    * While the body runs, a daemon HEARTBEAT rewrites the token's `ts`
    * every staleMs/4 (ADVICE r5): cross-host staleness then measures
    * holder LIVENESS, not merge duration, so a healthy foreign merge
    * longer than `staleMs` is no longer broken mid-flight — only a holder
    * whose JVM actually died stops refreshing and ages out. The refresh
    * re-checks ownership (by nonce) before each rewrite; the read→rewrite
    * window against a racing breaker is the same documented residual as
    * acquisition's.
    */
  private[graft] def withWriterLock[A](fs: org.apache.hadoop.fs.FileSystem,
                                       root: Path, staleMs: Long)(body: => A): A = {
    fs.mkdirs(root)
    val lock = new Path(root, "_writer_lock")
    val myPid = ProcessHandle.current().pid()
    val myHost = java.net.InetAddress.getLocalHost.getHostName
    def startMs(h: ProcessHandle): Long =
      h.info().startInstant().map[Long](_.toEpochMilli).orElse(0L)
    val nonce = java.util.UUID.randomUUID().toString
    def tokenNow(): String =
      s"pid=$myPid host=$myHost ts=${System.currentTimeMillis()} " +
        s"start=${startMs(ProcessHandle.current())} nonce=$nonce"
    val token = tokenNow()
    def owned(content: Option[String]): Boolean =
      content.exists(_.contains(s"nonce=$nonce"))
    def tryAcquire(): Boolean =
      try {
        val out = fs.create(lock, false)
        out.writeBytes(token + "\n")
        out.close()
        true
      } catch { case _: java.io.IOException => false }
    def readLock(p: Path): Option[String] =
      try {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in).mkString.trim)
        finally in.close()
      } catch { case _: Throwable => None }
    def holderDead(content: String): Boolean = {
      val kv = content.split("\\s+").flatMap(_.split("=", 2) match {
        case Array(k, v) => Some(k -> v); case _ => None
      }).toMap
      def num(key: String): Option[Long] =
        kv.get(key).flatMap(v => scala.util.Try(v.toLong).toOption)
      // a parseable host AND ts mark a well-formed token; anything else is
      // a mid-write crash and gets the cross-host staleness treatment
      val wellFormed = kv.contains("host") && num("ts").isDefined
      val sameHost = wellFormed && kv.get("host").contains(myHost)
      val pidDead = num("pid").exists { p =>
        p != myPid && {
          val h = ProcessHandle.of(p)
          if (!h.isPresent) true // pid gone
          else num("start") match {
            // pid RECYCLED: same number, different process start → the
            // recorded holder is dead even though the number is alive
            case Some(rec) if rec > 0 =>
              val actual = startMs(h.get())
              actual > 0 && math.abs(actual - rec) > 1000L
            case _ => !h.get().isAlive
          }
        }
      }
      val age = System.currentTimeMillis() -
        num("ts").getOrElse(
          try fs.getFileStatus(lock).getModificationTime
          catch { case _: Throwable => System.currentTimeMillis() })
      (sameHost && pidDead) || (!sameHost && age > staleMs)
    }
    def tryBreak(inspected: String): Unit = {
      val bak = new Path(root, s"_writer_lock_broken_${java.util.UUID.randomUUID()}")
      val renamed = try fs.rename(lock, bak) catch { case _: Throwable => false }
      if (renamed) {
        if (readLock(bak).contains(inspected)) fs.delete(bak, false)
        else {
          // raced a fresh lock away from its holder: put it back. If the
          // rename-back keeps failing (a third writer re-created the lock
          // in the window), LEAVE the file under its broken name — deleting
          // it would erase the only evidence that the displaced holder lost
          // its lock, while its nonce-keyed release check still detects the
          // loss safely (ADVICE r5).
          var restored = false
          var attempt = 0
          while (!restored && attempt < 5) {
            restored = try fs.rename(bak, lock) catch { case _: Throwable => false }
            attempt += 1
          }
        }
      }
    }
    var acquired = tryAcquire()
    if (!acquired) {
      readLock(lock) match {
        case Some(c) if holderDead(c) => tryBreak(c); acquired = tryAcquire()
        case None => acquired = tryAcquire() // vanished: holder just released
        case _ => ()
      }
    }
    if (!acquired)
      throw new IllegalStateException(
        s"another writer holds $lock — concurrent upserts into $root would " +
          "interleave swaps and lose updates; stop the other writer (or " +
          "remove a stale lock) first")
    // liveness heartbeat: refresh ts while the merge runs so cross-host
    // staleness measures a dead holder, not a long merge (ADVICE r5).
    // `released` is checked right before every rewrite, and RE-checked
    // right after: a heartbeat stuck in an FS call past the join timeout
    // could otherwise resurrect a lock the holder already deleted — an
    // orphan a same-host successor could never break (its pid is this
    // live JVM). The post-write check makes the heartbeat itself undo
    // such a write (code-review r6).
    @volatile var released = false
    val hbPeriod = math.max(staleMs / 4, 1000L)
    val heartbeat = new Thread(() => {
      try {
        while (!Thread.interrupted()) {
          Thread.sleep(hbPeriod)
          if (!released && owned(readLock(lock))) {
            val out = fs.create(lock, true)
            out.writeBytes(tokenNow() + "\n")
            out.close()
            if (released && owned(readLock(lock))) fs.delete(lock, false)
          }
        }
      } catch {
        case _: InterruptedException => ()
        case _: Throwable => () // FS hiccup: stop refreshing; staleness
                                // falls back to the last written ts
      }
    }, s"graft-writer-lock-heartbeat-$nonce")
    heartbeat.setDaemon(true)
    heartbeat.start()
    try body
    finally {
      released = true
      heartbeat.interrupt()
      heartbeat.join(10000)
      if (owned(readLock(lock))) fs.delete(lock, false)
    }
  }

  /** Default staleness for [[withWriterLock]]: with the heartbeat
    * refreshing the token every staleMs/4, 10 minutes of silence means the
    * holder's JVM is gone (or partitioned long past any healthy pause) —
    * not merely that its merge is slow. Override per table via the Spark
    * conf `spark.graft.writerLock.staleMs` or the writers' `staleMs`
    * parameter (ADVICE r5).
    */
  private[graft] val LockStaleMs = 10 * 60 * 1000L

  /** Resolve the effective lock staleness: explicit argument, else the
    * session conf `spark.graft.writerLock.staleMs`, else [[LockStaleMs]].
    */
  private[graft] def resolveStaleMs(spark: SparkSession,
                                    explicit: Option[Long]): Long =
    explicit.orElse(
      spark.conf.getOption("spark.graft.writerLock.staleMs")
        .flatMap(v => scala.util.Try(v.toLong).toOption))
      .getOrElse(LockStaleMs)

  def upsertBatch(targetDir: String, keys: Seq[String],
                  staleMs: Option[Long] = None)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(root, "data")
    withWriterLock(fs, root, resolveStaleMs(spark, staleMs)) {
      recoverBackup(fs, root, cur)
      val merged =
        if (fs.exists(cur)) Upsert.upsert(spark.read.parquet(cur.toString), batch, keys)
        else batch
      val tmp = new Path(root, s"_staging_$batchId")
      merged.write.mode("overwrite").parquet(tmp.toString)
      val bak = new Path(root, s"_bak_$batchId")
      if (fs.exists(cur)) fs.rename(cur, bak)
      fs.rename(tmp, cur)
      fs.delete(bak, true)
    }
  }

  /** [[upsertBatch]] with READER snapshot isolation (VERDICT r05 #3): the
    * merge lands in a fresh `v_<batchId>/` dir and the commit point is one
    * atomic pointer rename ([[graft.state.SnapshotStore]]), so a
    * concurrent reader resolving [[readSnapshot]] can never observe a
    * missing or half-swapped table — the MVCC window the in-place
    * `data/` swap leaves open (recovery there repairs the NEXT writer,
    * not the in-flight reader). Writers stay fenced by the same lock;
    * replayed batch ids are skipped against the committed version, which
    * also keeps the merge idempotent without relying on upsert
    * commutativity.
    */
  def upsertBatchSnapshot(targetDir: String, keys: Seq[String],
                          staleMs: Option[Long] = None,
                          retainVersions: Int = 2,
                          mergeSchema: Boolean = false)
                         (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    withWriterLock(fs, root, resolveStaleMs(spark, staleMs)) {
      val cur = graft.state.SnapshotStore.currentVersion(fs, root)
      if (!cur.exists(_ >= batchId)) {
        // mergeSchema = Delta autoMerge semantics (schema evolution on
        // write): a batch carrying a never-seen column unions it into the
        // committed schema; committed versions stay pinned (time travel
        // reads each version's own schema), type conflicts reject loudly
        val mergeFn: (DataFrame, DataFrame, Seq[String]) => DataFrame =
          if (mergeSchema) Upsert.upsertEvolve else Upsert.upsert
        val merged = cur match {
          case Some(v) => mergeFn(
            spark.read.parquet(new Path(
              graft.state.SnapshotStore.versionDir(root, v), "data").toString),
            batch, keys)
          case None => batch
        }
        graft.state.SnapshotStore.commit(fs, root, batchId,
          Map("data" -> merged), retainVersions)
      }
    }
  }

  /** Snapshot-isolated read of a table maintained by
    * [[upsertBatchSnapshot]] — current version, or any retained batch id
    * via `versionAsOf`.
    */
  def readSnapshot(spark: SparkSession, targetDir: String,
                   versionAsOf: Option[Long] = None): DataFrame =
    graft.state.SnapshotStore.read(spark, targetDir, "data", versionAsOf)

  /** [[upsertPartitionedBatch]] with READER snapshot isolation — the
    * partition-manifest commit ([[graft.state.ManifestStore]]): per-batch
    * write cost stays O(touched partitions) (untouched partitions are
    * inherited by manifest reference, never copied), readers resolve one
    * atomic pointer, and a manifest referencing more than
    * `maxManifestVersions` versions triggers a compacting full rewrite so
    * reader fan-in stays bounded. Same single-writer lock, replay gate,
    * and partition-stability precondition as the other partitioned sink.
    */
  def upsertPartitionedBatchSnapshot(targetDir: String, keys: Seq[String],
                                     partitionCol: String,
                                     staleMs: Option[Long] = None,
                                     maxManifestVersions: Int = 16,
                                     retentionMs: Long = 10 * 60 * 1000L,
                                     mergeSchema: Boolean = false)
                                    (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    withWriterLock(fs, root, resolveStaleMs(spark, staleMs)) {
      if (!graft.state.SnapshotStore.currentVersion(fs, root).exists(_ >= batchId))
        // evolution composes with the manifest layout for free: the new
        // version's schema file carries the union, and readManifested
        // reads every inherited (untouched, older-schema) partition group
        // with that pinned schema — parquet fills the missing column with
        // nulls; versionAsOf reads stay pinned to their own schema file
        graft.state.ManifestStore.commitPartitioned(spark, root, batchId,
          batch, keys, partitionCol,
          if (mergeSchema) Upsert.upsertEvolve else Upsert.upsert,
          maxManifestVersions, retentionMs)
    }
  }

  /** Snapshot-isolated read of a table maintained by
    * [[upsertPartitionedBatchSnapshot]] — current version, or any
    * still-resolvable batch id via `versionAsOf`.
    */
  def readPartitionedSnapshot(spark: SparkSession, targetDir: String,
                              versionAsOf: Option[Long] = None): DataFrame =
    graft.state.ManifestStore.read(spark, targetDir, versionAsOf)

  /** Partition-aware variant of [[upsertBatch]]: only the partitions the
    * micro-batch touches are read, merged, and rewritten (dynamic
    * partition overwrite). [[upsertBatch]] rewrites the whole table per
    * batch — fine for KPI-sized tables, O(table) at 100 TB; this one is
    * O(touched partitions). The driver-side collect is of partition
    * VALUES only (a bounded, tiny list — e.g. the days present in one
    * batch), never data rows.
    *
    * Precondition: a key's partition value is stable across updates (the
    * usual case — the partition column is derived from the key, e.g. the
    * day of an event date). An update that MOVED a key to a different
    * partition would insert it there while the old partition (untouched by
    * the batch) still holds the stale row; use [[upsertBatch]] when keys
    * can migrate.
    */
  def upsertPartitionedBatch(targetDir: String, keys: Seq[String],
                             partitionCol: String,
                             staleMs: Option[Long] = None)
                            (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(targetDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new Path(root, "data")
    withWriterLock(fs, root, resolveStaleMs(spark, staleMs)) {
    recoverBackup(fs, root, cur)
    recoverPartitionBackups(fs, root, cur, partitionCol)
    val touched = batch.select(partitionCol).distinct().collect().map(_.get(0))
    // isin(null) never matches — a null partition value must be selected
    // with an explicit isNull arm or its stored rows would be dropped when
    // the staged __HIVE_DEFAULT_PARTITION__ dir replaces the destination.
    val (nullTouched, nonNull) = touched.partition(_ == null)
    val pc = org.apache.spark.sql.functions.col(partitionCol)
    val touchedPred =
      if (nullTouched.isEmpty) pc.isin(nonNull: _*)
      else if (nonNull.isEmpty) pc.isNull
      else pc.isin(nonNull: _*) || pc.isNull
    val merged =
      if (fs.exists(cur)) {
        val old = spark.read.parquet(cur.toString).filter(touchedPred)
        Upsert.upsert(old, batch, keys)
      } else batch
    // Stage first, swap after: writing straight into `cur` would overwrite
    // the path the merged plan is still reading (and a crash mid-commit
    // would lose the touched partitions; code-review r3). The staged
    // partition directory names carry Spark's own value escaping, so the
    // swap lists them instead of reconstructing names from values.
    val stage = new Path(root, s"_staging_$batchId")
    // cluster by the partition column first — one file per touched dir
    // instead of one per (task, dir), explicit partition count so AQE
    // cannot serialize the dir creation into one task; see
    // ManifestStore.stageTable (guide §6 small files)
    merged.repartition(
        spark.sessionState.conf.numShufflePartitions, pc)
      .write.mode("overwrite").partitionBy(partitionCol).parquet(stage.toString)
    if (!fs.exists(cur)) fs.mkdirs(cur)
    fs.listStatus(stage)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(partitionCol + "="))
      .foreach { p =>
        val dest = new Path(cur, p.getPath.getName)
        val bak = new Path(root, s"_bak_${batchId}_${p.getPath.getName}")
        if (fs.exists(dest)) fs.rename(dest, bak)
        fs.rename(p.getPath, dest)
        fs.delete(bak, true)
      }
    fs.delete(stage, true)
    }
  }

  /** Streaming category KPIs (ST5): the same aggregation as the batch
    * flagship (Kpis.categoryKpis — sum/avg/ratio are streaming-safe; the
    * exact countDistinct of dailyKpis is not, and stays batch-only), run as
    * a cumulative streaming aggregation. Update output mode emits only the
    * keys whose aggregates changed in the micro-batch; foreachBatch upserts
    * them into the target table.
    *
    * Caller picks the trigger (Trigger.AvailableNow for drain-and-stop,
    * ProcessingTime for continuous micro-batches — ST4) and calls .start().
    */
  def categoryKpiWriter(enrichedStream: DataFrame, targetDir: String,
                        checkpointDir: String): DataStreamWriter[Row] =
    Kpis.categoryKpis(enrichedStream)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertBatch(targetDir, Seq("category", "order_date")) _)

  /** The 100 TB form of [[categoryKpiWriter]]: KPI table partitioned by
    * order_date, so each micro-batch merges and swaps ONLY the dates it
    * touched (a day's late events rewrite one partition, not the whole
    * history). order_date is derived from the key, so the
    * partition-stability precondition of [[upsertPartitionedBatch]] holds
    * by construction.
    */
  def categoryKpiWriterPartitioned(enrichedStream: DataFrame, targetDir: String,
                                   checkpointDir: String): DataStreamWriter[Row] =
    Kpis.categoryKpis(enrichedStream)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertPartitionedBatch(targetDir,
        Seq("category", "order_date"), "order_date") _)

  /** [[categoryKpiWriter]] with reader snapshot isolation — the same
    * cumulative aggregation committed through [[upsertBatchSnapshot]]'s
    * versioned dirs + atomic pointer (read back via [[readSnapshot]]).
    * Pick this over the rename-swap writer when the table has live
    * readers during the stream.
    */
  def categoryKpiWriterSnapshot(enrichedStream: DataFrame, targetDir: String,
                                checkpointDir: String): DataStreamWriter[Row] =
    Kpis.categoryKpis(enrichedStream)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertBatchSnapshot(targetDir, Seq("category", "order_date")) _)

  /** Streaming daily KPIs (VERDICT r04 #1 — the reference upserts BOTH KPI
    * tables per trigger batch, transform.py:348-352 AND 359-365; the
    * category writer alone left `order_kpis_daily` batch-only). Cumulative
    * update-mode aggregation of [[graft.transform.Kpis.dailyKpisStreaming]]
    * — the A2 family with mergeable HLL++ sketches standing in for the
    * streaming-unsafe exact countDistinct — upserted per micro-batch
    * through the same idempotent swap sink as the category table.
    */
  def dailyKpiWriter(enrichedStream: DataFrame, targetDir: String,
                     checkpointDir: String): DataStreamWriter[Row] =
    Kpis.dailyKpisStreaming(enrichedStream)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertBatch(targetDir, Seq("order_date")) _)

  /** The 100 TB form of [[dailyKpiWriter]]: table partitioned by
    * order_date (the key itself), so a micro-batch merges and swaps only
    * the days it touched — per-batch sink I/O is O(days in the batch),
    * not O(days of history). One row per partition is the degenerate-small
    * end of partitioning; it is still the right trade here because the
    * whole-table rewrite is what grows with history.
    */
  def dailyKpiWriterPartitioned(enrichedStream: DataFrame, targetDir: String,
                                checkpointDir: String): DataStreamWriter[Row] =
    Kpis.dailyKpisStreaming(enrichedStream)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertPartitionedBatch(targetDir,
        Seq("order_date"), "order_date") _)

  /** [[dailyKpiWriterPartitioned]] with reader snapshot isolation — the
    * partition-manifest sink ([[upsertPartitionedBatchSnapshot]]): still
    * O(touched days) per micro-batch, now with MVCC readers via
    * [[readPartitionedSnapshot]].
    */
  def dailyKpiWriterPartitionedSnapshot(enrichedStream: DataFrame,
                                        targetDir: String,
                                        checkpointDir: String): DataStreamWriter[Row] =
    Kpis.dailyKpisStreaming(enrichedStream)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertPartitionedBatchSnapshot(targetDir,
        Seq("order_date"), "order_date") _)

  /** EXACT streaming daily KPIs ([[graft.streaming.DailyKpis]]): the
    * reference's exact integers (transform.py:395-399) kept under
    * streaming by carrying per-day distinct-id sets in keyed state —
    * choose this over [[dailyKpiWriter]] when per-day cardinality is
    * state-store-affordable and the KV consumer needs exact counts.
    */
  def dailyKpiWriterExact(enrichedStream: DataFrame, targetDir: String,
                          checkpointDir: String): DataStreamWriter[Row] =
    DailyKpis.stream(enrichedStream).toDF()
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(upsertBatch(targetDir, Seq("order_date")) _)

  /** The full streaming KPI leg in one call — BOTH reference tables per
    * trigger, the streaming mirror of [[graft.pipeline.Pipeline.sink]]
    * (transform.py:348-352 AND 359-365 → two KV tables,
    * transform.py:376-404). Starts two streaming queries over the same
    * enriched stream (each with its own checkpoint under
    * `checkpointRoot`); `exactDaily` picks [[dailyKpiWriterExact]]'s
    * id-set state over [[dailyKpiWriter]]'s bounded HLL++ sketches.
    * Caller configures the trigger on the returned writers before
    * `.start()`, matching the single-writer pattern.
    */
  def kpiWriters(enrichedStream: DataFrame, categoryDir: String,
                 dailyDir: String, checkpointRoot: String,
                 exactDaily: Boolean = false): (DataStreamWriter[Row], DataStreamWriter[Row]) = {
    val cat = categoryKpiWriter(enrichedStream, categoryDir,
      s"$checkpointRoot/category")
    val day =
      if (exactDaily)
        dailyKpiWriterExact(enrichedStream, dailyDir, s"$checkpointRoot/daily")
      else dailyKpiWriter(enrichedStream, dailyDir, s"$checkpointRoot/daily")
    (cat, day)
  }
}

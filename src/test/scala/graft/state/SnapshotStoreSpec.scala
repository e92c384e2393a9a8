package graft.state

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Version-pinned reads and configurable retention (VERDICT r06 missing
  * #1): `versionAsOf` resolves any retained committed version, retention
  * depth is a writer parameter, and a reclaimed version errors loudly
  * naming what is still available.
  */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def fsOf(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitN(root: String, v: Long, retain: Int): Unit =
    SnapshotStore.commit(fsOf(root), new Path(root), v,
      Map("data" -> Seq((v, s"batch$v")).toDF("k", "tag")), retain)

  private def tagAt(root: String, versionAsOf: Option[Long]): String =
    SnapshotStore.read(spark, root, "data", versionAsOf)
      .select("tag").as[String].collect().head

  test("versionAsOf reads history to the retention depth; reclaimed errors loudly") {
    val root = tmp("graft_ss_tt")
    (1L to 3L).foreach(commitN(root, _, retain = 3))
    // current is v3; v1 and v2 remain readable at depth 3
    assert(tagAt(root, None) == "batch3")
    assert(tagAt(root, Some(2L)) == "batch2")
    assert(tagAt(root, Some(1L)) == "batch1")
    assert(SnapshotStore.availableVersions(fsOf(root), new Path(root)) ==
      Seq(1L, 2L, 3L))
    // a 4th commit at depth 3 reclaims v1
    commitN(root, 4L, retain = 3)
    assert(SnapshotStore.availableVersions(fsOf(root), new Path(root)) ==
      Seq(2L, 3L, 4L))
    assert(tagAt(root, Some(2L)) == "batch2", "within-horizon history survives")
    val e = intercept[IllegalStateException](tagAt(root, Some(1L)))
    assert(e.getMessage.contains("version 1") &&
      e.getMessage.contains("2, 3, 4") &&
      e.getMessage.contains("retainVersions"),
      s"reclaimed-version error must name the available versions: ${e.getMessage}")
  }

  test("default depth 2 keeps exactly current + previous (prior behavior)") {
    val root = tmp("graft_ss_d2")
    (1L to 3L).foreach(commitN(root, _, retain = 2))
    assert(SnapshotStore.availableVersions(fsOf(root), new Path(root)) ==
      Seq(2L, 3L))
  }

}

package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Physical-layout levers: partition pruning must reach the scan, and
  * bucketed tables must join without a shuffle.
  */
class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("a partition-column predicate becomes a PartitionFilter, not a data filter") {
    val dir = Files.createTempDirectory("graft_prune").toString
    val df = Seq((1L, "A", 1.0), (2L, "B", 2.0), (3L, "A", 3.0))
      .toDF("id", "status", "v")
    Tables.writePartitioned(df, "status", dir)

    val pruned = spark.read.parquet(dir).filter(col("status") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no PartitionFilters in:\n$plan")
    // the pushed partition predicate names the partition column
    assert(plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^]]*status[^]]*\\].*"),
      s"partition filter not on status:\n$plan")
    assert(pruned.count() == 2L)
    // only the matching partition directory is listed as input
    val inputs = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.toString.split("\n")).filter(_.contains("Location"))
    assert(inputs.nonEmpty)
  }

  test("bucketed tables join without an exchange (shuffle-free co-location)") {
    val left = (1L to 100L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 100L).map(i => (i, s"r$i")).toDF("k", "rv")
    Tables.writeBucketed(left, 4, "k", "graft_bleft")
    Tables.writeBucketed(right, 4, "k", "graft_bright")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_bleft").join(spark.table("graft_bright"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, plan:\n$plan")
      assert(joined.count() == 100L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

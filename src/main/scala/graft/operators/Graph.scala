package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality — the link-authority prior corpus pipelines use to
  * weight documents (web-graph PageRank is the classic CommonCrawl
  * quality signal). The iteration is FIXED-POINT INTEGER arithmetic:
  * ranks are scaled longs, per-edge contributions use integral `div`,
  * and the damping blend is `(85 * inflow) div 100` — no float
  * accumulation, so the result is bit-identical across engines,
  * partitionings, and run orders, and an external engine can replay
  * the exact iteration (which is what the g_pagerank oracle does).
  *
  * Scale shape per iteration: one shuffle joining ranks to edges on
  * src (out-degrees ride the same key) and one aggregation on dst.
  * Rank/degree frames are O(nodes); nothing is collected. For deep
  * iteration counts on a real cluster, checkpoint every few rounds to
  * truncate lineage — the same stance as connectedComponents.
  */
object Graph {

  /** `iters` rounds of damped fixed-point PageRank over `edges`
    * (directed src → dst). Every node starts at `scale`; each round
    * each node keeps `scale * 15/100` and receives `85/100` of the
    * floor-divided contributions of its in-neighbors. `scale` must be
    * divisible by 100 so the damping terms stay exact. Nodes with no
    * out-edges (dangling) contribute nothing — the standard leaked-mass
    * simplification; with symmetric edges there are none.
    */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
                    iters: Int, scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "pageRankFixed needs at least one iteration")
    require(scale > 0 && scale % 100 == 0,
      s"scale must be positive and divisible by 100, got $scale")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val baseKeep = lit(scale * 15L / 100L)
    var rank = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val inflow = e
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("rank div d").as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("inflow"))
      rank = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (baseKeep + expr("85 * coalesce(inflow, 0L) div 100")).as("rank"))
    }
    rank
  }
}

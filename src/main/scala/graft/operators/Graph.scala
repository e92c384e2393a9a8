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

  /** Exact k-core decomposition by iterative peeling (Matula & Beck
    * 1983): repeatedly delete every node of degree < k until the
    * remainder is stable — the survivors are EXACTLY the k-core, the
    * maximal subgraph of minimum degree ≥ k. The density read a graph
    * curation pass runs (spam farms and templated link blocks live in
    * dense cores; tendrils and chains peel away).
    *
    * Driver loop, one round = one degree aggregation + two semi-joins
    * of the edge list; the fixpoint test is a node COUNT per round
    * (one long of driver metadata — the kmeansCells materialize
    * pattern, with per-generation persist/unpersist). Rounds are
    * data-dependent (bounded by the peeling depth), and each round
    * strictly shrinks the node set or terminates. Edges are
    * canonicalized first: undirected (both directions), self-loops
    * dropped, duplicates collapsed — so "degree" means distinct
    * neighbors.
    *
    * Output: `(node, core_degree)` for every k-core member, with its
    * degree inside the core. Structural invariants the oracle pins: a
    * (k+1)-clique is ALWAYS in the k-core (its internal degrees alone
    * satisfy k, whatever peels around it), and an isolated chain NEVER
    * is for k ≥ 2 (endpoints peel first, then inductively the rest).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    def backingRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.analyzed.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val und = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionByName(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // Each peeling generation REBASES on its materialized RDD
    // (localCheckpoint(eager=false), the Text.bpeLoop idiom): a
    // persist-chained loop keeps the full join lineage, so round N
    // re-analyzes an N-deep plan — measured as the r13 g_kcore drift.
    // Checkpoint-backed generations keep the per-round plan
    // constant-depth; the count that drives the loop materializes each
    // generation before its parent's blocks drop.
    var cur = und.localCheckpoint(false)
    var nNodes = cur.select(col("src")).distinct().count()
    var done = nNodes == 0
    while (!done) {
      val keep = cur.groupBy(col("src")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select(col("src"))
      val next = cur
        .join(keep, Seq("src"), "left_semi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(false)
      val m = next.select(col("src")).distinct().count()
      backingRdd(cur).foreach(_.unpersist(false)) // superseded generation
      done = m == nNodes || m == 0 // nothing peeled, or nothing left
      cur = next
      nNodes = m
    }
    // checkpoint-backed: retain is a no-op and the ContextCleaner drops
    // the final generation's blocks once the returned frame is
    // unreferenced (the bpeSegment stance)
    graft.util.Caches.retain(cur)
    cur.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
  }
}

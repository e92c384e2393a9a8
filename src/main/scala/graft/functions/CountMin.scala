package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch point-frequency estimates — the bounded-memory
  * "how often does THIS item occur" sketch completing the repo's sketch
  * family (HLL++ distinct counts, Greenwald–Khanna percentiles,
  * Misra–Gries heavy hitters): d×w counters regardless of stream size,
  * mergeable by elementwise addition (so partial aggregation and
  * any partition order produce the IDENTICAL sketch — addition is
  * commutative), never underestimates, and overestimates by at most
  * ε·N with probability ≥ 1−δ (Cormode–Muthukrishnan 2005).
  *
  * Scale shape: Spark's `count_min_sketch` aggregate builds the sketch
  * with map-side partial combine; what reaches the driver is ONE sketch
  * binary of O(d·w) counters — sketch-sized metadata, not data (the
  * Ranking/ManifestStore collect class). Point queries then run on the
  * deserialized sketch against a FIXED probe list.
  */
object CountMin {

  /** Estimated counts of `probes` in `valueCol`, as `(value, est)`.
    * Deterministic: the sketch depends only on the data, ε/δ geometry,
    * and the seed — never on partitioning or merge order.
    */
  def pointEstimates(df: DataFrame, valueCol: String, probes: Seq[String],
                     eps: Double = 0.001, confidence: Double = 0.99,
                     seed: Int = 42): DataFrame = {
    require(probes.nonEmpty, "pointEstimates needs at least one probe")
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df
      .select(count_min_sketch(col(valueCol), lit(eps), lit(confidence),
        lit(seed)).as("__s"))
      .collect()(0).getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    probes.map(p => (p, cms.estimateCount(p))).toDF(valueCol, "est")
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry-split contract (VERDICT r11 #8): the per-family slices
  * merge into the driver maps with no name collisions (a `++` merge
  * would silently keep the LAST duplicate — a slice added carelessly
  * could shadow a green query), every oracle key has a query, and the
  * headline/memoized lists reference registered queries only.
  */
class RegistrySpec extends AnyFunSuite {

  private val slices = Seq(
    "Relational" -> (registry.RelationalQueries.queries.keySet,
      registry.RelationalQueries.oracleSql.keySet),
    "SourceEvent" -> (registry.SourceEventQueries.queries.keySet,
      registry.SourceEventQueries.oracleSql.keySet),
    "Streaming" -> (registry.StreamingQueries.queries.keySet,
      registry.StreamingQueries.oracleSql.keySet),
    "Text" -> (registry.TextQueries.queries.keySet,
      registry.TextQueries.oracleSql.keySet),
    "Dedup" -> (registry.DedupQueries.queries.keySet,
      registry.DedupQueries.oracleSql.keySet),
    "Ann" -> (registry.AnnQueries.queries.keySet,
      registry.AnnQueries.oracleSql.keySet),
    "Multimodal" -> (registry.MultimodalQueries.queries.keySet,
      registry.MultimodalQueries.oracleSql.keySet),
    "Pipeline" -> (registry.PipelineQueries.queries.keySet,
      registry.PipelineQueries.oracleSql.keySet))

  test("no query name is registered by two slices") {
    val all = slices.flatMap { case (n, (qs, _)) => qs.toSeq.map(_ -> n) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate names across slices: $dups")
    assert(SparkEntry.queries.size == all.size,
      "the merged map must carry every slice entry")
  }

  test("every oracle key has a registered query, slice-locally and merged") {
    slices.foreach { case (n, (qs, os)) =>
      assert((os -- qs).isEmpty, s"slice $n has orphan oracles: ${os -- qs}")
    }
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("headline and memoizedHeadline reference registered queries only") {
    val names = SparkEntry.queries.keySet
    assert((SparkEntry.headline.toSet -- names).isEmpty)
    assert((SparkEntry.memoizedHeadline.toSet -- names).isEmpty)
    assert(SparkEntry.headline.distinct == SparkEntry.headline,
      "headline must not time a query twice")
  }
}

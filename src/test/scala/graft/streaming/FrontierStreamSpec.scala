package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Crawl

/** FrontierStream: latest-lastmod-wins across triggers, churn counting
  * immune to duplicate delivery, compaction answer-preserving, and the
  * refetch queue against a fetch log.
  */
class FrontierStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = graft.util.Scratch.dir(p)

  private def sitemap(domain: String, entries: (String, String)*): (String, String) =
    domain -> ("<urlset>\n" + entries.map { case (loc, lm) =>
      s"  <url><loc>$loc</loc><lastmod>$lm</lastmod></url>"
    }.mkString("\n") + "\n</urlset>")

  private def batchOf(rows: (String, String)*) =
    rows.toSeq.toDF("domain", "sitemap_xml")

  test("latest lastmod wins; churn counts distinct lastmods only") {
    val work = tmp("graft_fr_unit")
    FrontierStream.ingestBatch(work)(batchOf(
      sitemap("a.com", ("https://a.com/1", "2026-01-05"),
        ("https://a.com/2", "2026-01-07"))), 0L)
    // re-publish: /1 advances, /2 re-states the SAME lastmod
    FrontierStream.ingestBatch(work)(batchOf(
      sitemap("a.com", ("https://a.com/1", "2026-02-01"),
        ("https://a.com/2", "2026-01-07"))), 1L)
    val f = FrontierStream.frontier(spark, work).collect()
      .map(r => r.getAs[String]("loc") ->
        (r.getAs[String]("lastmod"), r.getAs[Long]("n_updates"))).toMap
    assert(f("https://a.com/1") == (("2026-02-01", 2L)))
    assert(f("https://a.com/2") == (("2026-01-07", 1L)),
      "a duplicate observation must not count as churn")
    // an OUT-OF-ORDER older sitemap cannot roll freshness back
    FrontierStream.ingestBatch(work)(batchOf(
      sitemap("a.com", ("https://a.com/1", "2026-01-02"))), 2L)
    assert(FrontierStream.frontier(spark, work).collect()
      .find(_.getAs[String]("loc") == "https://a.com/1").get
      .getAs[String]("lastmod") == "2026-02-01")
  }

  test("crawl loop: decisions feed the next epoch; replay is idempotent") {
    val work = tmp("graft_fr_loop")
    val dates = Map(0L -> "2026-01-31", 1L -> "2026-02-28")
    val loop = FrontierStream.loopBatch(work, dates) _
    // epoch 0: both URLs unseen → both fetch at the epoch-0 stamp
    loop(batchOf(sitemap("a.com",
      ("https://a.com/1", "2026-01-05"), ("https://a.com/2", "2026-01-07"))), 0L)
    // epoch 1: /1 refreshed past the epoch-0 fetch → stale refetch; /2
    // re-states its old lastmod → fresh, skipped
    loop(batchOf(sitemap("a.com",
      ("https://a.com/1", "2026-02-10"), ("https://a.com/2", "2026-01-07"))), 1L)
    def report = FrontierStream.loopReport(spark, work).collect()
      .map(r => r.getAs[String]("loc") ->
        ((r.getAs[Long]("n_fetches"), r.getAs[String]("last_fetched_at")))).toMap
    val r1 = report
    assert(r1("https://a.com/1") == ((2L, "2026-02-28")),
      "refreshed URL refetches in the next epoch")
    assert(r1("https://a.com/2") == ((1L, "2026-01-31")),
      "unrefreshed URL keeps its first fetch only")
    // crash-replay of epoch 1: identical store state → identical decisions
    loop(batchOf(sitemap("a.com",
      ("https://a.com/1", "2026-02-10"), ("https://a.com/2", "2026-01-07"))), 1L)
    assert(report == r1, "a replayed epoch rewrites, never doubles")
  }

  test("compaction preserves frontier answers and folds the dirs") {
    val work = tmp("graft_fr_cmp")
    FrontierStream.ingestBatch(work)(batchOf(
      sitemap("a.com", ("https://a.com/1", "2026-01-05"))), 0L)
    FrontierStream.ingestBatch(work)(batchOf(
      sitemap("a.com", ("https://a.com/1", "2026-02-01"),
        ("https://a.com/3", "2026-01-09"))), 1L)
    val before = FrontierStream.frontier(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    FrontierStream.compact(spark, work, upToBatch = 2L)
    val after = FrontierStream.frontier(spark, work).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(after == before)
    val dirs = new java.io.File(s"$work/frontier").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=-1"))
  }

  test("refetchQueue: unseen fetch, stale refetch, fresh skip") {
    val work = tmp("graft_fr_q")
    FrontierStream.ingestBatch(work)(batchOf(
      sitemap("a.com", ("https://a.com/1", "2026-02-01"),
        ("https://a.com/2", "2026-01-03"), ("https://a.com/3", "2026-01-05"))),
      0L)
    val log = Seq(("https://a.com/1", "2026-01-10"),
      ("https://a.com/2", "2026-01-10")).toDF("loc", "fetched_at")
    val q = FrontierStream.refetchQueue(spark, work, log).collect()
      .map(r => r.getAs[String]("loc") ->
        (r.getAs[Boolean]("refetch"), r.getAs[String]("reason"))).toMap
    assert(q("https://a.com/1") == ((true, "stale")))
    assert(q("https://a.com/2") == ((false, "fresh")))
    assert(q("https://a.com/3") == ((true, "unseen")))
  }
}

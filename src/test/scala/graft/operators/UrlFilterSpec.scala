package graft.operators

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** URL canonicalization + domain gate + canonical-URL dedup vs
  * hand-computed expectations (RefinedWeb-style front door).
  */
class UrlFilterSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(Tuple1(url)).toDF("url")
      .select(LineCuration.urlCanonicalize(col("url")).as("c"))
      .as[String].collect().head

  test("canonicalize strips fragment, default port, www, trailing slash") {
    assert(canon("HTTP://WWW.Example.com:80/a/b/#frag") ==
      "http://example.com/a/b")
    assert(canon("https://www.example.com:443/x") == "https://example.com/x")
  }

  test("canonicalize keeps non-default ports and path case") {
    assert(canon("https://example.com:8443/A/B") ==
      "https://example.com:8443/A/B")
  }

  test("canonicalize drops utm_* params and the ? when none survive") {
    assert(canon("https://a.com/p?utm_source=x&ref=r1&utm_campaign=y") ==
      "https://a.com/p?ref=r1")
    assert(canon("https://a.com/p/?utm_source=x") == "https://a.com/p")
    assert(canon("https://a.com/p?ref=r1&id=2") == "https://a.com/p?ref=r1&id=2")
  }

  test("urlFilter blocks exact domains and subdomains, dedups by min doc_id") {
    val pages = Seq(
      (1L, "https://spam.tracker.net/x"),     // subdomain of blocked
      (2L, "https://tracker.net/x"),          // exact blocked
      (3L, "https://ok.example.com/a"),
      (4L, "https://www.ok.example.com/a/"),  // same canonical as 3
      (5L, "https://ok.example.com/b")
    ).toDF("doc_id", "url")
    val out = LineCuration.urlFilter(pages, "doc_id", "url",
        blocked = Seq("tracker.net"))
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out(1L) == ((true, 1L, false)))
    assert(out(2L) == ((true, 1L, false)))
    assert(out(3L) == ((false, 1L, true)))
    assert(out(4L) == ((false, 2L, false))) // dup of 3's canonical
    assert(out(5L) == ((false, 1L, true)))
  }

  test("allowlist mode: anything off the allowlist is blocked") {
    val pages = Seq(
      (1L, "https://good.org/a"),
      (2L, "https://sub.good.org/a"),
      (3L, "https://other.com/a")
    ).toDF("doc_id", "url")
    val out = LineCuration.urlFilter(pages, "doc_id", "url",
        blocked = Nil, allowed = Seq("good.org"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
    assert(out == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("plantUrls is deterministic and exercises every rule") {
    val docs = Seq.tabulate(60)(i => Tuple1(i.toLong)).toDF("doc_id")
    val urls = LineCuration.plantUrls(docs, "doc_id").as[(Long, String)]
      .collect().toMap
    assert(urls(0L) == "HTTP://WWW.NEWS.EXAMPLE.COM:80/p/0/?utm_source=feed&ref=r0#sec0")
    assert(urls(1L) == "HTTPS://blog.example.org/p/1")
    assert(urls(2L) == "http://spam.tracker.net/p/2?ref=r2&utm_campaign=x")
    // dedup collision pair: 3 and 63 would share a canonical; within 60
    // ids, 11 vs 41: odd, no query, same domain (11%6=5, 41%6=5), same
    // path (1) — canonicals must collide
    assert(canon(urls(11L)) == canon(urls(41L)))
  }
}

package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crawl front door: WET record framing round-trips (including bodies
  * with blank lines), the length-delimited slice, and every HTML-strip
  * rewrite stage on hand-built pages.
  */
class CrawlSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "plain single line body"),
    (1L, "two lines\nof body text"),
    (2L, "body with a blank line\n\ninside it"),
    (9L, "same file as doc 1 (9 % 8)")
  ).toDF("doc_id", "text")

  test("plantWet concatenates records per file in id order") {
    val wet = Crawl.plantWet(corpus, "doc_id", "text", files = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wet.keySet == Set(0L, 1L, 2L))
    // file 1 holds docs 1 and 9, in that order
    val f1 = wet(1L)
    assert(f1.indexOf("/d/1\n") >= 0 && f1.indexOf("/d/9\n") > f1.indexOf("/d/1\n"))
    assert(f1.startsWith("WARC/1.0\nWARC-Type: conversion\n"))
  }

  test("wetParse round-trips every body, blank lines included") {
    val parsed = Crawl.wetParse(Crawl.plantWet(corpus, "doc_id", "text"))
    val byId = parsed.collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId.keySet == Set(0L, 1L, 2L, 9L))
    val orig = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, r) <- byId) {
      assert(r.getAs[String]("body") == orig(id), s"body of $id")
      assert(r.getAs[Long]("declared_len") == orig(id).length.toLong)
      assert(r.getAs[Boolean]("len_ok"), s"framing of $id")
      assert(r.getAs[String]("uri") == s"https://example.com/d/$id")
    }
  }

  test("wetParse flags a truncated record via len_ok") {
    val wet = Seq((0L,
      "WARC/1.0\nWARC-Target-URI: https://example.com/d/7\n" +
        "Content-Length: 50\n\nonly twenty chars here\n\n"))
      .toDF("file_id", "wet")
    val r = Crawl.wetParse(wet).head()
    assert(!r.getAs[Boolean]("len_ok"))
  }

  test("wetParseBytes frames non-ASCII bodies by BYTE count (chars would misframe)") {
    val docs = Seq(
      (0L, "héllo — ünïcode ⊕ body"), // multi-byte: chars ≠ bytes
      (1L, "plain ascii"),
      (2L, "blank\n\nline ün it")
    ).toDF("doc_id", "text")
    val parsed = Crawl.wetParseBytes(
      Crawl.plantWetBytes(docs, "doc_id", "text", files = 2))
    val byId = parsed.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.keySet == Set(0L, 1L, 2L))
    for ((id, r) <- byId) {
      assert(r.getAs[String]("body") == orig(id), s"body of $id")
      assert(r.getAs[Long]("declared_len") ==
        orig(id).getBytes("UTF-8").length.toLong, s"byte framing of $id")
      assert(r.getAs[Boolean]("len_ok"), s"terminator of $id")
    }
    // the proof the char parser CANNOT make: bytes > chars for doc 0
    assert(byId(0L).getAs[Long]("declared_len") > orig(0L).length.toLong)
  }

  test("wetParseBytes inflates multi-member gzip (one member per record)") {
    val docs = Seq((0L, "first ün body"), (8L, "second body"), (16L, "third"))
      .toDF("doc_id", "text") // all % 8 == 0 → one file, three gzip members
    val parsed = Crawl.wetParseBytes(
      Crawl.plantWetBytes(docs, "doc_id", "text", files = 8,
        gzipRecords = true), gz = true)
    val rows = parsed.collect()
    assert(rows.length == 3 && rows.forall(_.getAs[Boolean]("len_ok")))
    assert(rows.map(_.getAs[String]("body")).toSet ==
      Set("first ün body", "second body", "third"))
    // and the raw blob really is gzip, not plaintext
    val blob = Crawl.plantWetBytes(docs, "doc_id", "text", files = 8,
      gzipRecords = true).head().getAs[Array[Byte]]("content")
    assert((blob(0) & 0xFF) == 0x1F && (blob(1) & 0xFF) == 0x8B)
  }

  test("tolerant gz parse recovers complete members from a truncated archive") {
    import graft.multimodal.Codecs.Gzip
    val good = Seq(
      Crawl.wetRecordBytes("https://example.com/d/1", "first good body"),
      Crawl.wetRecordBytes("https://example.com/d/2", "second good body"))
    // incompressible body so a deep cut removes real DEFLATE data (an
    // all-'x' body compresses so well that even trailer-only cuts leave
    // the full record recoverable)
    val noisy = Array.tabulate(500)(i =>
      ('a' + ((i * 2654435761L >> 9) % 26).toInt).toChar).mkString
    val cut = Crawl.wetRecordBytes("https://example.com/d/3", noisy)
    val gzCut = Gzip.gzip(cut)
    val blob = Gzip.gzip(good(0)) ++ Gzip.gzip(good(1)) ++
      gzCut.take(gzCut.length - 60)
    // strict mode throws; tolerant recovers the complete members
    intercept[IllegalArgumentException](Gzip.gunzipAll(blob))
    val (payload, clean) = Gzip.gunzipAvailable(blob)
    assert(!clean)
    import spark.implicits._
    val rows = Crawl.wetParseBytes(Seq((0L, blob)).toDF("file_id", "content"),
        gz = true, tolerant = true)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("body"), r.getAs[Boolean]("len_ok"))).toMap
    assert(rows(1L) == (("first good body", true)))
    assert(rows(2L) == (("second good body", true)))
    // the cut record is either absent or flagged, never silently whole
    assert(rows.get(3L).forall(!_._2), s"cut record must not frame clean: $rows")
  }

  test("wetParseBytes resyncs after a corrupt record instead of cascading") {
    val good = Crawl.wetRecordBytes("https://example.com/d/1", "good body")
    val bad = ("WARC/1.0\nWARC-Target-URI: https://example.com/d/7\n" +
      "Content-Length: 500\n\nshort\n\n").getBytes("UTF-8")
    val blob = bad ++ good
    import spark.implicits._
    val parsed = Crawl.wetParseBytes(Seq((0L, blob)).toDF("file_id", "content"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!parsed(7L).getAs[Boolean]("len_ok"))
    assert(parsed(1L).getAs[String]("body") == "good body")
    assert(parsed(1L).getAs[Boolean]("len_ok"))
  }

  test("wetParseBytes agrees with wetParse on an all-ASCII corpus") {
    val ascii = corpus // the shared fixture is all-ASCII
    val chars = Crawl.wetParse(Crawl.plantWet(ascii, "doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("file_id"), r.getAs[String]("uri"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("declared_len"),
        r.getAs[String]("body"), r.getAs[Boolean]("len_ok"))).toSet
    val bytes = Crawl.wetParseBytes(Crawl.plantWetBytes(ascii, "doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("file_id"), r.getAs[String]("uri"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("declared_len"),
        r.getAs[String]("body"), r.getAs[Boolean]("len_ok"))).toSet
    assert(bytes == chars)
  }

  test("warcParse: HTTP layer, gate, and header-section-only content type") {
    val docs = Seq(
      (1L, "html doc body text"), // 200 + text/html → gated in
      (5L, "pdf doc body"), // % 5 == 0 → application/pdf
      (7L, "missing doc body"), // % 7 == 0 → 404
      (35L, "missing pdf") // both
    ).toDF("doc_id", "text")
    val parsed = Crawl.warcParse(Crawl.plantWarc(docs, "doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(parsed.keySet == Set(1L, 5L, 7L, 35L))
    assert(parsed.values.forall(_.getAs[Boolean]("len_ok")))
    assert(parsed(1L).getAs[Long]("http_status") == 200L)
    assert(parsed(1L).getAs[String]("content_type") == "text/html; charset=UTF-8")
    assert(parsed(1L).getAs[Boolean]("is_html"))
    assert(parsed(1L).getAs[String]("body")
      == "<html><body><h1>Doc 1</h1><p>html doc body text</p></body></html>")
    assert(parsed(5L).getAs[String]("content_type") == "application/pdf")
    assert(!parsed(5L).getAs[Boolean]("is_html"))
    assert(parsed(5L).getAs[String]("body") == "pdf doc body")
    assert(parsed(7L).getAs[Long]("http_status") == 404L)
    assert(!parsed(7L).getAs[Boolean]("is_html"))
    assert(!parsed(35L).getAs[Boolean]("is_html"))
  }

  test("warcParseZst: the zstd-framed archive parses exactly like the " +
    "uncompressed one (foreign-encoder fixtures, from-scratch decode)") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"document $i body text with some shared vocabulary " * 8))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("file_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("http_status"), r.getAs[String]("content_type"),
        r.getAs[Boolean]("is_html"), r.getAs[String]("body"),
        r.getAs[Boolean]("len_ok"))).toSet
    val plain = rows(Crawl.warcParse(Crawl.plantWarc(docs, "doc_id", "text")))
    for (level <- Seq(1, 9, 19)) {
      val zst = rows(Crawl.warcParseZst(
        Crawl.plantWarcZst(docs, "doc_id", "text", level = level)))
      assert(zst == plain, s"level $level must be indistinguishable")
    }
  }

  test("warcParse: a body mentioning Content-Type cannot spoof the gate") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: application/pdf\r\n\r\n" +
      "body says Content-Type: text/html but the header rules"
    val rec = s"WARC/1.0\nWARC-Type: response\n" +
      s"WARC-Target-URI: https://example.com/d/3\n" +
      s"Content-Length: ${http.length}\n\n$http\n\n"
    val r = Crawl.warcParse(Seq((0L, rec)).toDF("file_id", "warc")).head()
    assert(r.getAs[String]("content_type") == "application/pdf")
    assert(!r.getAs[Boolean]("is_html"))
    assert(r.getAs[String]("body")
      == "body says Content-Type: text/html but the header rules")
  }

  test("robotsGate: longest match wins, Allow breaks ties, no rule allows") {
    val rules = Seq(
      ("a.com", "Disallow", "/private"),
      ("a.com", "Allow", "/private/ok"), // longer → wins inside /private/ok
      ("a.com", "Disallow", "/x"),
      ("a.com", "Allow", "/x") // equal length → Allow wins
    ).toDF("domain", "directive", "path_prefix")
    val urls = Seq(
      (1L, "https://a.com/private/ok/page"),
      (2L, "https://a.com/private/secret"),
      (3L, "https://a.com/x/y"),
      (4L, "https://a.com/public"),
      (5L, "https://b.com/private/secret"), // no ruleset for b.com
      (6L, "https://a.com") // no path → "/"
    ).toDF("doc_id", "url")
    val out = Crawl.robotsGate(urls, rules).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[String]("matched_prefix")),
          r.getAs[Boolean]("allowed"), r.getAs[String]("path"))).toMap
    assert(out(1L) == ((Some("/private/ok"), true, "/private/ok/page")))
    assert(out(2L) == ((Some("/private"), false, "/private/secret")))
    assert(out(3L) == ((Some("/x"), true, "/x/y")))
    assert(out(4L) == ((None, true, "/public")))
    assert(out(5L) == ((None, true, "/private/secret")))
    assert(out(6L) == ((None, true, "/")))
  }

  test("robotsParse keeps Allow/Disallow rules, drops noise and empty Disallow") {
    val robots = Seq(("a.com",
      "# comment\nUser-agent: *\nDisallow: /private\nAllow: /ok\n" +
        "Disallow:\nCrawl-delay: 2\nSitemap: https://a.com/s.xml\n"))
      .toDF("domain", "robots_txt")
    val rules = Crawl.robotsParse(robots).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(rules == Set(("Disallow", "/private"), ("Allow", "/ok")))
  }

  test("fetchPlan: per-domain fresh-first slots spaced by each host's delay") {
    val gated = Seq(
      (1L, "https://a.com/u1", "a.com", "2026-01-05", true),
      (2L, "https://a.com/u2", "a.com", "2026-01-09", true), // freshest → slot 0
      (3L, "https://a.com/u3", "a.com", "2026-01-01", true),
      (4L, "https://a.com/u4", "a.com", "2026-01-01", false), // gated out
      (5L, "https://b.com/u5", "b.com", "2026-01-03", true)
    ).toDF("entry_id", "loc", "domain", "lastmod", "allowed")
    val delays = Seq(("a.com", 3L), ("b.com", 7L)).toDF("domain", "crawl_delay")
    val out = Crawl.fetchPlan(gated, delays).collect()
      .map(r => r.getAs[Long]("entry_id") ->
        (r.getAs[Long]("fetch_slot"), r.getAs[Long]("fetch_eta_s"))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 5L)) // disallowed never scheduled
    assert(out(2L) == ((0L, 0L)))
    assert(out(1L) == ((1L, 3L)))
    assert(out(3L) == ((2L, 6L)))
    assert(out(5L) == ((0L, 0L))) // b.com schedules independently
  }

  test("fetchPlanPrioritized: high-authority stale URL outranks fresh low-authority") {
    val gated = Seq(
      (1L, "https://a.com/hub", "a.com", "2026-01-01", true), // stale, ranked
      (2L, "https://a.com/new", "a.com", "2026-01-30", true), // fresh, unranked
      (3L, "https://a.com/x", "a.com", "2026-01-30", false) // gated out
    ).toDF("entry_id", "loc", "domain", "lastmod", "allowed")
    val delays = Seq(("a.com", 2L)).toDF("domain", "crawl_delay")
    val ranks = Seq((1L, 900000L)).toDF("node", "rank") // 2 → default 150000
    val out = Crawl.fetchPlanPrioritized(gated, delays, ranks, asOf = "2026-02-01")
      .collect().map(r => r.getAs[Long]("entry_id") ->
        (r.getAs[Long]("fetch_slot"), r.getAs[Long]("priority"),
          r.getAs[Long]("fetch_eta_s"))).toMap
    // staleness: 1 → 32 days, 2 → 3 days; under fresh-first 2 would lead
    assert(out(1L) == ((0L, 900000L * 32, 0L)),
      "authority × staleness must outrank freshness alone")
    assert(out(2L) == ((1L, 150000L * 3, 2L)),
      "the fresh low-authority URL waits one crawl-delay slot")
    assert(!out.contains(3L), "disallowed URLs never scheduled")
  }

  test("crawlDelays: declared delay extracted, absent falls back to default") {
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 5\nDisallow: /x\n"),
      ("b.com", "User-agent: *\nDisallow: /y\n"))
      .toDF("domain", "robots_txt")
    val d = Crawl.crawlDelays(robots, default = 2L).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("a.com" -> 5L, "b.com" -> 2L))
  }

  test("htmlStrip drops script/style/comment spans whole") {
    val page = Seq((1L,
      "<html><head><script>var a = '<p>not text</p>';</script>" +
        "<style>p { x }</style></head>" +
        "<body><!-- note --><p>real text.</p></body></html>"))
      .toDF("doc_id", "html")
    val r = Crawl.htmlStrip(page).head()
    assert(r.getAs[String]("strip_text") == "real text.")
  }

  test("htmlStrip turns block closers into line breaks, inline tags into nothing") {
    val page = Seq((1L,
      "<body><h1>Title here</h1><p>first <b>bold</b> para.</p>" +
        "<div>second para.</div>tail text</body>"))
      .toDF("doc_id", "html")
    val r = Crawl.htmlStrip(page).head()
    assert(r.getAs[String]("strip_text") ==
      "Title here\nfirst bold para.\nsecond para.\ntail text")
  }

  test("htmlStrip decodes entities once — no double decode") {
    val page = Seq((1L, "<p>&amp;lt; stays, &lt; decodes, 1 &amp; 2</p>"))
      .toDF("doc_id", "html")
    val r = Crawl.htmlStrip(page).head()
    assert(r.getAs[String]("strip_text") == "&lt; stays, < decodes, 1 & 2")
  }

  test("htmlStrip squeezes whitespace and drops empty lines") {
    val page = Seq((1L, "<p>a   b\t c</p><p>  </p><p>next.</p>"))
      .toDF("doc_id", "html")
    val r = Crawl.htmlStrip(page).head()
    assert(r.getAs[String]("strip_text") == "a b c\nnext.")
  }

  test("htmlStrip extracts the title and counts removed tags") {
    val r = Crawl.htmlStrip(Crawl.plantHtml(corpus, "doc_id", "text"))
      .filter(col("doc_id") === 0L).head()
    assert(r.getAs[String]("title") == "Doc 0")
    // doc 0 (%3==0 branch on): html+head+title pair (4) + script/style
    // pairs (4) + /head+body (2) + h1 pair (2) + p pair (2) + comment +
    // div/p/close/close (5) + /body + /html (2) = 21
    assert(r.getAs[Long]("n_tags") == 21L)
    assert(r.getAs[String]("strip_text").contains("plain single line body"))
  }

  private def hexMd5(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  test("dechunkHttp: body_md5 hashes the RAW reassembled bytes — invalid-UTF-8 " +
    "bodies stay distinct (ADVICE r14)") {
    // two one-chunk bodies that a lossy UTF-8 round-trip would BOTH decode
    // to U+FFFD (a lone 0x80 vs a lone 0xFF continuation-less byte)
    def wire(payload: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(java.lang.Long.toHexString(payload.length.toLong).getBytes("US-ASCII"))
      out.write('\r'); out.write('\n')
      out.write(payload); out.write('\r'); out.write('\n')
      out.write("0\r\n\r\n".getBytes("US-ASCII"))
      out.toByteArray
    }
    val a = Array[Byte](0x80.toByte)
    val b = Array[Byte](0xFF.toByte)
    val got = Crawl.dechunkHttp(
        Seq((1L, wire(a)), (2L, wire(b))).toDF("doc_id", "content"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(1L) == hexMd5(a) && got(2L) == hexMd5(b),
      s"md5 must be over raw bytes: $got")
    assert(got(1L) != got(2L), "distinct binary bodies must not collide")
  }

  test("dechunkHttp: RFC 9112 trailer section accepted, trailing garbage rejected") {
    val body = "hello trailer world".getBytes("US-ASCII")
    def wire(tail: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(java.lang.Long.toHexString(body.length.toLong).getBytes("US-ASCII"))
      out.write('\r'); out.write('\n')
      out.write(body); out.write('\r'); out.write('\n')
      out.write(("0\r\n" + tail).getBytes("US-ASCII"))
      out.toByteArray
    }
    // two trailer field lines before the terminating empty line
    val withTrailers = wire("Expires: later\r\nX-Check: abc\r\n\r\n")
    val r = Crawl.dechunkHttp(Seq((5L, withTrailers)).toDF("doc_id", "content")).head()
    assert(r.getLong(1) == 1L && r.getLong(2) == body.length.toLong &&
      r.getString(3) == hexMd5(body),
      "a valid trailer section must decode like a trailer-free body")
    // bytes after the final CRLF must reject loudly (previously accepted)
    val garbage = wire("\r\nleftover")
    intercept[org.apache.spark.SparkException] {
      Crawl.dechunkHttp(Seq((6L, garbage)).toDF("doc_id", "content")).collect()
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-archive front door — the two steps that sit AHEAD of the URL
  * gate ([[LineCuration.urlFilter]]) in a Common-Crawl-style pretraining
  * pipeline: splitting concatenated WET/WARC conversion records back
  * into per-document rows, and stripping HTML markup down to text.
  *
  * Both passes are pure per-row projections after one explode — no join,
  * no aggregation, no window — so the physical plan is scan → project
  * → generate → project, embarrassingly parallel at any scale. The only
  * shuffle in [[plantWet]] is the test-fixture blob CONSTRUCTION (a
  * groupBy that exists so the parser has something to parse); production
  * input is one blob per file straight off the object store.
  *
  * Every pattern used here is in the Java∩RE2-portable subset (the
  * [[graft.functions.Pii]] discipline): no lookahead, no backreferences,
  * `(?s)` dot-all and lazy `.*?` only — both engines support them — so
  * the DuckDB oracle replays each step verbatim.
  */
object Crawl {

  /** Deterministic WET-like archive planted from any (id, text) corpus:
    * each document becomes one `WARC/1.0` conversion record (Target-URI
    * carries the id, Content-Length the EXACT body byte count), and
    * records are concatenated in id order into one blob per file
    * (`file_id = id % files`) — out-of-order, multi-record, length-
    * delimited: everything [[wetParse]] must handle.
    */
  def plantWet(docs: DataFrame, idCol: String, textCol: String,
               files: Int = 8): DataFrame = {
    val rec = concat(
      lit("WARC/1.0\n"),
      lit("WARC-Type: conversion\n"),
      lit("WARC-Target-URI: https://example.com/d/"), col(idCol), lit("\n"),
      lit("Content-Length: "), length(col(textCol)), lit("\n\n"),
      col(textCol), lit("\n\n"))
    docs.select((col(idCol) % files).cast("long").as("file_id"),
        col(idCol).cast("long").as("__id"), rec.as("__rec"))
      .groupBy(col("file_id"))
      .agg(collect_list(struct(col("__id"), col("__rec"))).as("__rs"))
      .select(col("file_id"),
        array_join(transform(array_sort(col("__rs")), r => r("__rec")), "")
          .as("wet"))
  }

  /** Parse a WET blob column back into one row per record: split on the
    * `WARC/1.0` version line, pull `WARC-Target-URI` and
    * `Content-Length` out of the header block, and slice the body
    * LENGTH-DELIMITED (the WARC contract — substring by declared length,
    * never "until the next blank line", so bodies containing blank lines
    * parse whole; within one record the FIRST blank line is the
    * header/body boundary, which holds because header lines are never
    * empty). The record SPLIT does assume no body contains the literal
    * version line `WARC/1.0\n` — true of this corpus and detectable in
    * general via `len_ok = false` on the truncated fragment.
    *
    * `len_ok` re-checks the framing: after the declared body there must
    * be exactly the two record-terminating newlines and nothing else.
    */
  def wetParse(wet: DataFrame, fileCol: String = "file_id",
               blobCol: String = "wet"): DataFrame = {
    val rec = col("__rec")
    val hdrEnd = instr(rec, "\n\n") // 1-based start of the blank line
    val declared = regexp_extract(rec, "Content-Length: ([0-9]+)\n", 1)
      .cast("long")
    wet.select(col(fileCol),
        explode(split(col(blobCol), "WARC/1\\.0\n")).as("__rec"))
      .filter(col("__rec") =!= "")
      .select(col(fileCol),
        regexp_extract(rec, "WARC-Target-URI: ([^\n]*)\n", 1).as("uri"),
        regexp_extract(rec, "WARC-Target-URI: https://example\\.com/d/([0-9]+)\n", 1)
          .cast("long").as("doc_id"),
        declared.as("declared_len"),
        substring(rec, hdrEnd + lit(2), declared).as("body"),
        (length(rec) === hdrEnd + lit(1) + declared + lit(2)).as("len_ok"))
  }

  /** Deterministic HTML pages planted from any (id, text) corpus: head
    * with title/script/style (the blocks a stripper must DROP whole),
    * entity-encoded punctuation, a comment, block and inline tags, and
    * an id-dependent second paragraph — every branch [[htmlStrip]]
    * handles, all replayable in SQL.
    */
  def plantHtml(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"), concat(
      lit("<html><head><title>Doc "), col(idCol), lit("</title>"),
      lit("<script type=\"text/javascript\">if (x &lt; 1) { x = 2; }</script>"),
      lit("<style>p { color: red }</style></head><body>"),
      lit("<h1>Doc "), col(idCol), lit("</h1>"),
      lit("<p class=\"lead\">"), substring(col(textCol), 1, 120),
      lit(" &amp; more &lt;tags&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end.</p>"),
      when(col(idCol) % 3 === 0,
        concat(lit("<!-- hidden --><div><p>Extra "), col(idCol),
          lit("</p></div>")))
        .otherwise(lit("")),
      lit("</body></html>")).as("html"))

  /** HTML → text, the trafilatura/jusText-class extraction reduced to
    * its deterministic core (the part that is pure string rewriting and
    * therefore oracle-replicable):
    *
    *  1. drop `<script>`/`<style>` ELEMENTS (content included) and
    *     comments — lazy dot-all spans;
    *  2. turn block-element CLOSERS (`</p> </div> </h1..6> </li>
    *     </title>` and `<br>`) into newlines so block structure
    *     survives tag removal;
    *  3. strip every remaining tag;
    *  4. decode the five XML entities plus `&nbsp;` — `&amp;` LAST so
    *     double-encoded text cannot re-decode;
    *  5. collapse runs of spaces/tabs, trim each line, drop empty lines.
    *
    * Emits the title (first `<title>` span), the extracted text, and
    * `n_tags` (tags removed in step 3 — a markup-density signal used the
    * same way boilerplate fraction is).
    */
  def htmlStrip(pages: DataFrame, idCol: String = "doc_id",
                htmlCol: String = "html"): DataFrame = {
    val deScript = regexp_replace(col(htmlCol),
      "(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>|(?s)<!--.*?-->", "")
    val blocked = regexp_replace(deScript,
      "</p>|</div>|</h[1-6]>|</li>|</title>|<br */?>", "\n")
    val unTagged = regexp_replace(blocked, "<[^>]+>", "")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(unTagged) { case (c, (e, ch)) =>
        replace(c, lit(e), lit(ch)) }
    val squeezed = regexp_replace(regexp_replace(decoded,
      "[ \t]+", " "), " *\n *", "\n")
    val cleaned = array_join(
      filter(split(squeezed, "\n"), l => l =!= ""), "\n")
    pages.select(col(idCol),
      regexp_extract(col(htmlCol), "(?s)<title>(.*?)</title>", 1).as("title"),
      cleaned.as("strip_text"),
      regexp_count(col(htmlCol), lit("<[^>]+>")).cast("long").as("n_tags"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Line-grain corpus curation — the page-level cleaning passes every
  * public pretraining recipe runs before tokenization: C4's
  * terminal-punctuation line filter (Raffel et al. 2020, §2.2), the
  * Gopher/MassiveText document-quality rule battery (Rae et al. 2021,
  * appendix A1.1), and order-preserving intra-document line dedup.
  *
  * All three are single-projection, shuffle-free operators: a document's
  * lines live in one array cell, so the whole pass is a map over the scan
  * — embarrassingly parallel, the exact shape that scales to 100 TB (no
  * exchange anywhere; `.explain` shows scan → project). The per-line
  * predicates run as array higher-order functions; each lambda touches one
  * short line, so the interpreted-HOF cost that makes shingle explosion a
  * trap (Text.shinglesFromTokens scaladoc) does not bite at line grain.
  */
object LineCuration {

  /** C4-style line filter + page gate (the T5 corpus recipe, re-expressed
    * over any (id, multi-line text) input):
    *
    *  - a LINE survives iff it (trimmed) ends in terminal punctuation
    *    (`.`, `!`, `?`, `"`), has at least `minWords` space-separated
    *    words, and does not mention "javascript" (case-insensitive);
    *  - the PAGE is kept iff at least `minKeptLines` lines survived, the
    *    raw page mentions no "lorem ipsum" (case-insensitive), and
    *    contains no `{`.
    *
    * Emits every page with its cleaned text and the keep decision — the
    * caller filters on `doc_kept` (keeping the report queryable, the
    * v_rules convention).
    */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = split(col("__page"), "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), " +")) >= minWords &&
        !lower(l).contains("javascript"))
    docs.select(col(idCol), col(textCol).as("__page"))
      .select(col(idCol), lines.as("__lines"), kept.as("__kept"), col("__page"))
      .select(col(idCol),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        (size(col("__kept")) >= minKeptLines &&
          !lower(col("__page")).contains("lorem ipsum") &&
          !col("__page").contains("{")).as("doc_kept"))
  }

  /** C4-style PHRASE-BLOCKLIST page gate (VERDICT r14 #5 — the other half
    * of the published C4 recipe next to [[c4Clean]]'s structural gates:
    * Raffel et al. 2020 drop any page containing a word from a banned-
    * words list): a page is `blocked` iff the token sequence of ANY
    * blocklist phrase appears CONTIGUOUSLY in the page's lowercased
    * whitespace token stream. Token grain, not a regex scan over full
    * pages — "classic" never matches a blocklist "ass", multi-word
    * phrases match exactly as phrases, and the page body is touched once
    * by the tokenizer rather than once per phrase.
    *
    * Mechanics (the t_contamination broadcast n-gram recipe): the phrase
    * list is tokenized DRIVER-side (it is curation config, dozens to
    * thousands of entries, never data-scale); pages explode to one row
    * per (position × distinct phrase length) with the window gram
    * re-joined by `concat_ws` over a `slice`, and a broadcast equi-join
    * on (length, gram) marks hits. Shuffle carries only the per-doc hit
    * counts — gram strings die at the broadcast join, bodies never move.
    * A window shorter than its phrase length (end of document) joins
    * fewer tokens and can never equal an n-token phrase, so no boundary
    * filter is needed.
    *
    * Emits every page with `n_hits` (occurrences over all phrases,
    * overlaps counted per position) and `blocked` — callers filter on
    * `!blocked` (the v_rules queryable-report convention).
    */
  def blocklistGate(docs: DataFrame, idCol: String, textCol: String,
                    phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val normed = phrases.map(_.trim.toLowerCase.split("\\s+").toSeq)
      .filter(_.exists(_.nonEmpty))
    require(normed.nonEmpty, "blocklist must contain at least one phrase")
    val lens = normed.map(_.length).distinct.sorted
    val phraseDf = broadcast(
      normed.map(ts => (ts.length, ts.mkString(" "))).distinct
        .toDF("__pn", "__pg"))
    val toks = docs.select(col(idCol),
      Text.tokens(lower(col(textCol))).as("__t"))
    val gramCols = lens.map(n => struct(lit(n).as("n"),
      concat_ws(" ", slice(col("__t"), col("__i"), lit(n))).as("g")))
    val hits = toks
      .select(col(idCol), col("__t"),
        explode(sequence(lit(1), greatest(size(col("__t")), lit(1)))).as("__i"))
      .select(col(idCol), explode(array(gramCols: _*)).as("__s"))
      .join(phraseDf, col("__s.n") === col("__pn") && col("__s.g") === col("__pg"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0L).as("blocked"))
  }

  /** Order-preserving intra-document line dedup (the MassiveText
    * preprocessing step): a line is kept iff it is the FIRST occurrence of
    * its content in the document. The indexed-filter form
    * (`array_position(lines, l) == i + 1`) is O(lines²) per document with
    * zero shuffle; lines-per-document is bounded (thousands, not
    * millions), so the quadratic term is a per-row constant — for a
    * corpus-wide grain change (dedup ACROSS documents) use
    * [[Passages]]/[[Dedup]] instead.
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), split(col(textCol), "\n").as("__lines"))
      .select(col(idCol), col("__lines"),
        filter(col("__lines"),
          (l, i) => array_position(col("__lines"), l) === i + 1).as("__kept"))
      .select(col(idCol),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__lines")).cast("long").as("n_lines"),
        (size(col("__lines")) - size(col("__kept"))).cast("long")
          .as("n_dups_removed"))

  /** The Gopher document-quality rule battery — one row per document with
    * every signal, every per-rule verdict, and the composite keep flag:
    *
    *  - `r_word_count`: word count in [minWords, maxWords];
    *  - `r_mean_len`: mean word length in [minMeanLen, maxMeanLen];
    *  - `r_symbol`: (`#` + `...` occurrences) / words ≤ maxSymbolRatio;
    *  - `r_bullet`: fraction of lines starting `- `/`* `/`• ` ≤ maxBullet;
    *  - `r_ellipsis`: fraction of lines ending `...` ≤ maxEllipsis;
    *  - `r_alpha`: fraction of words containing a letter ≥ minAlpha;
    *  - `r_stop`: at least `minStopHits` DISTINCT members of `stopList`
    *    appear (Text.stopwords("en") by default — the published rule uses
    *    a fixed 8-word set; the list is a parameter).
    *
    * Ratios are round(…, 6) BEFORE thresholding (the oracle-compare
    * convention — the verdicts must be reproducible from the emitted
    * signals). Like [[c4Clean]], emits every document; callers filter on
    * `gopher_ok`.
    */
  def gopherReport(docs: DataFrame, idCol: String, textCol: String,
                   stopList: Seq[String] = Text.stopwords("en"),
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3, maxMeanLen: Double = 10,
                   maxSymbolRatio: Double = 0.1, maxBullet: Double = 0.9,
                   maxEllipsis: Double = 0.3, minAlpha: Double = 0.8,
                   minStopHits: Int = 2): DataFrame = {
    val page = col("__page")
    val ws = col("__ws")
    val lines = col("__lines")
    val frac6 = (num: Column, den: Column) =>
      round(when(den > 0, num.cast("double") / den).otherwise(lit(0.0)), 6)
    val nHash = length(page) - length(replace(page, lit("#"), lit("")))
    val nEllipsis = (length(page) - length(replace(page, lit("..."), lit("")))) / 3
    val base = docs.select(col(idCol), col(textCol).as("__page"))
      .select(col(idCol), page, Text.tokens(page).as("__ws"),
        split(page, "\n").as("__lines"))
      .select(col(idCol),
        size(ws).cast("long").as("n_words"),
        frac6(length(concat_ws("", ws)), size(ws)).as("mean_word_len"),
        frac6(nHash + floor(nEllipsis), size(ws)).as("symbol_ratio"),
        frac6(size(filter(lines, l => l.startsWith("- ") ||
          l.startsWith("* ") || l.startsWith("• "))), size(lines))
          .as("bullet_line_frac"),
        frac6(size(filter(lines, l => l.endsWith("..."))), size(lines))
          .as("ellipsis_line_frac"),
        frac6(size(filter(ws, w => w.rlike("[a-zA-Z]"))), size(ws))
          .as("alpha_word_frac"),
        size(filter(typedlit(stopList), s => array_contains(ws, s)))
          .cast("long").as("n_stop_present"))
    base.select(col("*"),
      col("n_words").between(minWords, maxWords).as("r_word_count"),
      (col("mean_word_len") >= minMeanLen &&
        col("mean_word_len") <= maxMeanLen).as("r_mean_len"),
      (col("symbol_ratio") <= maxSymbolRatio).as("r_symbol"),
      (col("bullet_line_frac") <= maxBullet).as("r_bullet"),
      (col("ellipsis_line_frac") <= maxEllipsis).as("r_ellipsis"),
      (col("alpha_word_frac") >= minAlpha).as("r_alpha"),
      (col("n_stop_present") >= minStopHits).as("r_stop"))
      .withColumn("gopher_ok",
        col("r_word_count") && col("r_mean_len") && col("r_symbol") &&
          col("r_bullet") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stop"))
  }

  /** Test-harness corpus: the synthetic documents are single-line word
    * bags, so the line-grain operators need a page STRUCTURE planted
    * deterministically (the passageCorpus convention — the plant is part
    * of the harness, not the operator, and the DuckDB oracle replays it
    * verbatim). Per document: lowercase tokens re-wrapped into 6-word
    * lines; line i gets a `- ` bullet when (id+i)%5=0, a ` #` symbol when
    * (id+i)%9=0, and a suffix by the first match of (id+i)%7=0 → `...`,
    * (id+i)%3=0 → `.`, (id+i)%3=2 → `!`, else none. Pages with id%11=0 /
    * %13=0 / %17=0 gain a javascript / lorem-ipsum / `{` poison line (the
    * C4 page gates), and even ids re-append their first two lines (the
    * dedup plant). Token-empty documents are dropped on both sides.
    */
  /** URL canonicalization — the normalization every web-corpus front door
    * (RefinedWeb §3.1, C4's provenance handling) applies before URL-level
    * dedup, as one shuffle-free codegen'd projection:
    *
    *  1. strip the fragment (`#…`);
    *  2. lowercase the scheme+authority head (path/query case survives);
    *  3. strip default ports (`:80` on http, `:443` on https);
    *  4. strip a leading `www.`;
    *  5. drop `utm_*` tracking params, re-joining the survivors in order
    *     (the `?` goes too when nothing survives);
    *  6. strip a trailing `/` from the path.
    *
    * No lookaheads anywhere — the same patterns run under Java regex here
    * and RE2 in the DuckDB oracle, and the two dialects only agree on the
    * lookahead-free subset.
    */
  def urlCanonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val head = regexp_extract(noFrag, "^([A-Za-z]+://[^/?#]*)", 1)
    val lowered = concat(lower(head),
      substring(noFrag, length(head) + 1, length(noFrag)))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?]+):80([/?].*)?$", "$1$2"),
      "^(https://[^/:?]+):443([/?].*)?$", "$1$2")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val base = regexp_replace(regexp_replace(noWww, "\\?.*$", ""), "/$", "")
    val query = regexp_extract(noWww, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !(p === "" || p.rlike("^utm_")))
    when(size(params) === 0, base)
      .otherwise(concat(base, lit("?"), array_join(params, "&")))
  }

  /** Blocklist/allowlist domain gate + canonical-URL dedup — the corpus
    * front door ahead of [[c4Clean]]. Per input row: the canonical URL,
    * its registrable domain, the block verdict (exact match or subdomain
    * of a blocked domain; an empty `allowed` list means no allowlist
    * restriction), the dedup rank among same-verdict rows of the
    * canonical group (doc_id ascending — first-crawled wins), and the
    * composite keep flag. Report-style output (the v_rules convention):
    * every row with its flags, caller filters on `url_kept`.
    *
    * Scale shape: one projection + ONE hash-partitioned window over
    * canonical_url (the dedup grain) — no global sort, no broadcast of
    * anything but the literal domain lists; group cardinality is bounded
    * by crawl duplication, never corpus size.
    */
  def urlFilter(pages: DataFrame, idCol: String, urlCol: String,
                blocked: Seq[String],
                allowed: Seq[String] = Nil): DataFrame = {
    val canon = urlCanonicalize(col(urlCol))
    val domain = regexp_extract(col("canonical_url"), "^https?://([^/:?]+)", 1)
    def inList(ds: Seq[String]) = ds
      .map(b => col("domain") === b || col("domain").endsWith("." + b))
      .reduceOption(_ || _).getOrElse(lit(false))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("canonical_url"), col("domain_blocked"))
      .orderBy(col(idCol))
    pages.select(col(idCol), col(urlCol), canon.as("canonical_url"))
      .withColumn("domain", domain)
      .withColumn("domain_blocked",
        inList(blocked) ||
          (if (allowed.nonEmpty) !inList(allowed) else lit(false)))
      .withColumn("url_rank", row_number().over(w).cast("long"))
      .withColumn("url_kept", !col("domain_blocked") && col("url_rank") === 1)
  }

  /** Deterministic (doc_id, url) planting for the t_url_filter oracle:
    * modulo-scheduled domains (two of six blocked), uppercase
    * scheme/host variants, `www.` prefixes, default ports, shared paths
    * (mod 10 — collisions within small corpora), `utm_*` tracking
    * params, trailing slashes, and fragments, so every canonicalization
    * rule and the dedup rank are all exercised and SQL-replayable.
    */
  def plantUrls(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    val domains = Seq("news.example.com", "blog.example.org",
      "spam.tracker.net", "docs.example.com", "ads.clickbait.io",
      "shop.example.com")
    val dom = element_at(array(domains.map(lit): _*), (id % 6).cast("int") + 1)
    val scheme0 = when(id % 2 === 0, "http").otherwise("https")
    val scheme = when(id % 8 < 2, upper(scheme0)).otherwise(scheme0)
    val host0 = concat(when(id % 3 === 0, "www.").otherwise(""), dom)
    val host = when(id % 10 === 0, upper(host0)).otherwise(host0)
    val port = when(id % 5 === 0,
      when(id % 2 === 0, ":80").otherwise(":443")).otherwise("")
    val path = concat(lit("/p/"), (id % 10).cast("string"),
      when(id % 6 === 0, "/").otherwise(""))
    val query = when(id % 4 === 0,
        concat(lit("?utm_source=feed&ref=r"), (id % 7).cast("string")))
      .when(id % 4 === 2,
        concat(lit("?ref=r"), (id % 7).cast("string"), lit("&utm_campaign=x")))
      .otherwise("")
    val frag = when(id % 9 === 0,
      concat(lit("#sec"), (id % 3).cast("string"))).otherwise("")
    docs.select(id, concat(scheme, lit("://"), host, port, path,
      query, frag).as("url"))
  }

  def plantPages(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol)
    val ts = col("__ts")
    val emptyArr = array().cast("array<string>")
    val withTs = docs
      .select(id, Text.tokens(lower(col(textCol))).as("__ts"))
      .filter(size(ts) > 0)
    val lines = transform(
      sequence(lit(0L), floor((size(ts) + 5) / 6).cast("long") - 1),
      i => {
        val k = id + i
        concat(
          when(k % 5 === 0, "- ").otherwise(""),
          concat_ws(" ", slice(ts, (i * 6 + 1).cast("int"), lit(6))),
          when(k % 9 === 0, " #").otherwise(""),
          when(k % 7 === 0, "...")
            .when(k % 3 === 0, ".")
            .when(k % 3 === 2, "!")
            .otherwise(""))
      })
    withTs.select(id, lines.as("__ls"))
      .select(id,
        array_join(
          concat(col("__ls"),
            when(id % 11 === 0,
              array(lit("this line has javascript inside it.")))
              .otherwise(emptyArr),
            when(id % 13 === 0,
              array(lit("and this page mentions lorem ipsum.")))
              .otherwise(emptyArr),
            when(id % 17 === 0,
              array(lit("{ a curly brace config line.")))
              .otherwise(emptyArr),
            when(id % 2 === 0, slice(col("__ls"), 1, 2)).otherwise(emptyArr)),
          "\n").as("page"))
  }

  /** Sequential gate-attrition funnel — the curation-pipeline
    * observability table ("how many documents did each stage remove, in
    * order?") that per-rule verdict reports ([[Rules]], gopherReport)
    * don't give: a document counts against the FIRST gate it fails, so
    * the per-stage removal counts sum to total − survivors and answer
    * "what would loosening stage k actually buy".
    *
    * One pass: every gate evaluates as a column, the first failing index
    * folds into one `when` chain, and a single O(1)-row aggregation
    * yields all counts; the per-stage rows are arithmetic OVER that
    * aggregate (n_in(k) = total − Σ_{j<k} removed(j)), built driver-side
    * as expressions — output is O(stages) regardless of corpus size, and
    * the only exchange beyond the gates' own is the final scalar
    * aggregation (metadata-grade).
    */
  def gateFunnel(docs: DataFrame, gates: Seq[(String, Column)]): DataFrame = {
    require(gates.nonEmpty, "gateFunnel needs at least one gate")
    val spark = docs.sparkSession
    import spark.implicits._
    val flagged = gates.zipWithIndex.foldLeft(docs) {
      case (df, ((_, c), i)) => df.withColumn(s"__g$i", c)
    }
    val firstFail = gates.indices.foldRight(lit(-1): Column) {
      case (i, rest) => when(!col(s"__g$i"), lit(i)).otherwise(rest)
    }
    val agg = flagged.select(firstFail.as("__fail"))
      .agg(count(lit(1)).as("total"),
        gates.indices.map(i =>
          sum(when(col("__fail") === i, 1L).otherwise(0L)).as(s"__r$i")): _*)
    val stages = spark.createDataset(
      gates.zipWithIndex.map { case ((n, _), i) => (i.toLong, n) })
      .toDF("stage_idx", "stage")
    // O(stages) × O(1) cross of two metadata-grade frames
    agg.crossJoin(stages)
      .withColumn("n_in", gates.indices.foldLeft(col("total")) {
        case (e, i) => e - when(col("stage_idx") > i, col(s"__r$i")).otherwise(lit(0L))
      })
      .withColumn("n_removed",
        gates.indices.foldRight(lit(null).cast("long"): Column) {
          case (i, rest) =>
            when(col("stage_idx") === i, col(s"__r$i")).otherwise(rest)
        })
      .withColumn("n_out", col("n_in") - col("n_removed"))
      .withColumn("removal_frac",
        when(col("n_in") > 0,
          round(col("n_removed").cast("double") / col("n_in").cast("double"), 6)))
      .select("stage_idx", "stage", "n_in", "n_removed", "n_out", "removal_frac")
  }
}

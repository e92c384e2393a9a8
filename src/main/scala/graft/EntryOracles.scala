package graft

import graft.EntryFixtures._

/** Shared DuckDB-oracle SQL fragments (the text that used to sit between
  * SparkEntry.headline and SparkEntry.oracleSql, verbatim) — one home so
  * a tokenization or fold contract edit cannot drift between family
  * registries (VERDICT r11 #8).
  */
private[graft] object EntryOracles {
  /** DuckDB VALUES twin of [[unigramFixedTable]] — ln(prime) evaluates
    * engine-side, so both engines' doubles agree to libm rounding and the
    * round-6 output absorbs the residue.
    */
  private[graft] lazy val sqlUnigramPieces: String =
    unigramPrimes.map { case (p, n) => s"('$p', ln($n))" }.mkString(", ")

  /** Oracle twin of Unigram.segmentWords under [[unigramFixedTable]]:
    * exhaustive lattice-path enumeration by recursive CTE, the same
    * path-order left-fold score, the same (score desc, fewer pieces, lex
    * path) argmax; ends in `useg(word, pieces, n_pieces, score)`. Shared
    * by t_unigram_segment and pipeline_unigram_pack.
    */
  private[graft] lazy val sqlUnigramSegCtes: String =
    s"""WITH RECURSIVE pieces(piece, lp) AS (VALUES $sqlUnigramPieces),
       w AS (SELECT unnest(${sqlTokens("lower(text)")}) AS word FROM documents),
       wc AS (SELECT word FROM w WHERE len(word) <= 12 GROUP BY 1),
       paths(word, pos, path, npieces, score) AS (
         SELECT word, 0, '', 0, CAST(0.0 AS DOUBLE) FROM wc
         UNION ALL
         SELECT p.word, p.pos + len(pc.piece),
                CASE WHEN p.path = '' THEN pc.piece ELSE p.path || '|' || pc.piece END,
                p.npieces + 1, p.score + pc.lp
         FROM paths p JOIN pieces pc
           ON p.pos + len(pc.piece) <= len(p.word)
          AND substring(p.word, p.pos + 1, len(pc.piece)) = pc.piece),
       complete AS (SELECT word, path, npieces, score FROM paths WHERE pos = len(word)),
       ranked AS (SELECT word, path AS pieces, CAST(npieces AS BIGINT) AS n_pieces,
                round(score, 6) AS score,
                row_number() OVER (PARTITION BY word
                  ORDER BY score DESC, npieces ASC, path ASC) AS rn
                FROM complete),
       useg AS (SELECT word, pieces, n_pieces, score FROM ranked WHERE rn = 1)"""

  /** Derived-invariant twin for unigram-LM EM training (rows-only by
    * design: cross-word float aggregation order makes trained
    * probabilities reproducible only to association noise —
    * Unigram.scala:29-35). Flags computed from the ACTUAL trained model:
    * the EM log-likelihood trace must be non-decreasing through the
    * pre-prune passes (1e-6 relative slack; the post-prune final entry MAY
    * dip — pruning removes mass by design), every tokenizer character must
    * survive pruning (coverage), the vocabulary must respect its bound,
    * and the final table must be a probability distribution.
    */
  private[graft] val enOracleList =
    "['the','a','an','and','of','to','in','is','it','that','for','on','with','as','was','at','by','this','are','be']"

  /** Shared SQL fragment: whitespace tokens of a text column. */
  private[graft] def sqlTokens(textExpr: String): String =
    s"list_filter(string_split_regex(trim($textExpr), '\\s+'), x -> len(x) > 0)"

  /** Oracle-side twin of LineCuration.plantPages — the deterministic page
    * structure (6-word lines, modulo-scheduled bullets/symbols/punctuation,
    * poison lines, duplicate tail) replayed verbatim; ends in
    * `pages(doc_id, page)`. Shared by the t_c4_lines / t_line_dedup /
    * t_gopher_report twins.
    */
  private[graft] lazy val sqlPagedCtes: String =
    s"""ptoks AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS ts FROM documents),
       plines AS (SELECT doc_id,
           list_transform(generate_series(0, (len(ts) + 5) // 6 - 1), i ->
               (CASE WHEN (doc_id + i) % 5 = 0 THEN '- ' ELSE '' END)
            || array_to_string(list_slice(ts, i*6 + 1, i*6 + 6), ' ')
            || (CASE WHEN (doc_id + i) % 9 = 0 THEN ' #' ELSE '' END)
            || (CASE WHEN (doc_id + i) % 7 = 0 THEN '...'
                     WHEN (doc_id + i) % 3 = 0 THEN '.'
                     WHEN (doc_id + i) % 3 = 2 THEN '!'
                     ELSE '' END)) AS ls
         FROM ptoks WHERE len(ts) > 0),
       pages AS (SELECT doc_id, array_to_string(
           ls
           || (CASE WHEN doc_id % 11 = 0 THEN ['this line has javascript inside it.'] ELSE CAST([] AS VARCHAR[]) END)
           || (CASE WHEN doc_id % 13 = 0 THEN ['and this page mentions lorem ipsum.'] ELSE CAST([] AS VARCHAR[]) END)
           || (CASE WHEN doc_id % 17 = 0 THEN ['{ a curly brace config line.'] ELSE CAST([] AS VARCHAR[]) END)
           || (CASE WHEN doc_id % 2 = 0 THEN list_slice(ls, 1, 2) ELSE CAST([] AS VARCHAR[]) END),
           chr(10)) AS page FROM plines)"""

  /** Oracle-side twin of [[passageCorpus]] + Passages.windowOccurrences —
    * the shared CTE prefix for the duplicated-passage oracles. Windows are
    * compared by STRING (the operator compares xxhash64 of the string, so
    * the hash compare also certifies collision-freeness on this corpus).
    * Ends in `toks` (doc_id, text, ts) and `wins` (doc_id, pos, win).
    */
  private[graft] lazy val sqlPassageCtes: String =
    s"""WITH donors AS (
         SELECT doc_id, ${sqlTokens("text")} AS ts FROM documents
         WHERE doc_id < 40),
       planted AS (
         SELECT doc_id + 1000000 AS doc_id,
                array_to_string(ts[1:11], ' ') || ' ' ||
                trim(repeat('uniq' || CAST(doc_id + 1000000 AS VARCHAR) || ' ', 5)) AS text
         FROM donors WHERE len(ts) >= 16),
       corpus AS (
         SELECT doc_id, text FROM documents
         UNION ALL SELECT doc_id, text FROM planted),
       toks AS (SELECT doc_id, text, ${sqlTokens("text")} AS ts FROM corpus),
       wins AS (
         SELECT doc_id, u.pos AS pos, u.win AS win FROM (
           SELECT doc_id, unnest(list_transform(
             generate_series(1, len(ts) - 5),
             i -> {'pos': i, 'win': concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3], ts[i+4], ts[i+5])})) AS u
           FROM toks WHERE len(ts) >= 6))"""

  /** Gaps-and-islands span merge over a `hits` CTE (doc_id, pos) — the
    * oracle twin of Passages.mergeSpans for 6-token windows. Emits
    * `spans` (doc_id, g, span_start, span_end).
    */
  private[graft] def sqlPassageSpans(hitsCte: String): String =
    s"""$hitsCte,
       marked AS (
         SELECT doc_id, pos,
           CASE WHEN pos > COALESCE(MAX(pos + 5) OVER (
                  PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
                THEN 1 ELSE 0 END AS brk
         FROM hits),
       isl AS (
         SELECT doc_id, pos, SUM(brk) OVER (
           PARTITION BY doc_id ORDER BY pos) AS g
         FROM marked),
       spans AS (
         SELECT doc_id, g, MIN(pos) AS span_start, MAX(pos) + 5 AS span_end
         FROM isl GROUP BY doc_id, g)"""

  /** The shared removal tail: spans from a `hits` CTE (doc_id, pos), kept
    * tokens re-joined, untouched docs keep their original text — the
    * oracle twin of Passages.cleanByForeign.
    */
  private[graft] def sqlPassageCleanSql(hitsCte: String): String =
    s"""${sqlPassageSpans(hitsCte)},
       kept AS (
         SELECT doc_id, u.i AS i, u.tok AS tok FROM (
           SELECT t.doc_id, unnest(list_transform(
             generate_series(1, len(ts)),
             i -> {'i': i, 'tok': ts[i]})) AS u
           FROM toks t
           WHERE EXISTS (SELECT 1 FROM spans s WHERE s.doc_id = t.doc_id)) q
         WHERE NOT EXISTS (SELECT 1 FROM spans s
                           WHERE s.doc_id = q.doc_id
                             AND q.u.i BETWEEN s.span_start AND s.span_end)),
       cleaned AS (
         SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ctext
         FROM kept GROUP BY doc_id)
       SELECT t.doc_id,
              CASE WHEN sp.doc_id IS NULL THEN t.text
                   ELSE COALESCE(c.ctext, '') END AS text
       FROM toks t
       LEFT JOIN (SELECT DISTINCT doc_id FROM spans) sp USING (doc_id)
       LEFT JOIN cleaned c USING (doc_id)"""

  /** The incremental-passage replay shared by dedup_passage_incremental
    * and its streaming leg: the first-seen day owns each window; later
    * days strip every occurrence, the owning day applies the intra-batch
    * canonical rule.
    */
  private[graft] lazy val sqlPassageIncrementalOracle: String =
    sqlPassageCleanSql(s"""$sqlPassageCtes,
         daywins AS (SELECT doc_id, pos, win,
             CASE WHEN doc_id < 200 THEN 0
                  WHEN doc_id < 1000000 THEN 1 ELSE 2 END AS day
           FROM wins),
         firstday AS (SELECT win, MIN(day) AS d0 FROM daywins GROUP BY 1),
         intra AS (SELECT win, day, COUNT(DISTINCT doc_id) AS nd,
                          MIN(doc_id) AS mdoc
                   FROM daywins GROUP BY 1, 2),
         intra2 AS (SELECT i.win, i.day, i.nd, i.mdoc, MIN(w.pos) AS mpos
                    FROM intra i JOIN daywins w
                      ON w.win = i.win AND w.day = i.day AND w.doc_id = i.mdoc
                    GROUP BY 1, 2, 3, 4),
         hits AS (
           SELECT w.doc_id, w.pos
           FROM daywins w
           JOIN firstday f ON w.win = f.win
           LEFT JOIN intra2 i ON i.win = w.win AND i.day = w.day
           WHERE w.day > f.d0
              OR (w.day = f.d0 AND i.nd >= 2
                  AND NOT (w.doc_id = i.mdoc AND w.pos = i.mpos)))""")

  /** Oracle-side twin of [[termStats]] — the shared TF/DF CTE prefix. */
  private[graft] lazy val sqlTermStatsCtes: String =
    s"""WITH t AS (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS term FROM documents),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t WHERE doc_id < 50 GROUP BY 1, 2),
       df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1)"""

  /** Oracle-side twin of [[LanguageModel.unigramScore]] on the
    * even-doc_id training half — the shared CTE prefix behind t_lm_score
    * and t_lm_buckets, ending in a `scored` CTE with the operator's
    * output columns.
    */
  /** Oracle-side stage-by-stage replay of Pipeline.curate: the
    * pipeline_corpus_prep quality/langID CTEs, the t_lm_score model CTEs
    * (trained on the post-language-filter survivors), the
    * pipeline_mixture window, and the pipeline_packing arithmetic, all
    * chained on one corpus with a planted dup family.
    */
  private[graft] lazy val sqlCurateCtes: String = sqlCurateCtesFor(
    """corpus AS (
         SELECT doc_id, source, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, source, text FROM documents WHERE doc_id % 5 = 0)""")

  /** [[sqlCurateCtes]] over ANY corpus: `corpusCtes` is one or more CTE
    * definitions ending in `corpus(doc_id, source, text)` — the
    * documents+dups instantiation above is the pipeline_curate fixture;
    * pipeline_crawl_corpus passes the whole crawl front half (planted
    * pages → robots gate → strip → mirror union) instead.
    */
  private[graft] def sqlCurateCtesFor(corpusCtes: String,
                                      pplCutoff: String = "30.5"): String =
    s"""WITH $corpusCtes,
       keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY sha256(text)),
       ded AS (SELECT c.doc_id, c.source, c.text FROM corpus c JOIN keep USING (doc_id)),
       t0 AS (SELECT doc_id, source, text, ${sqlTokens("text")} AS ts,
                     ${sqlTokens("lower(text)")} AS lts FROM ded),
       st AS (SELECT doc_id, source, text, lts,
         CAST(len(ts) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS bpe_tokens,
         round(CASE WHEN len(ts) > 0 THEN CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE) / len(ts) ELSE 0.0 END, 6) AS mean_token_len,
         round(CASE WHEN len(text) > 0 THEN CAST(len(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / len(text) ELSE 0.0 END, 6) AS punct_ratio,
         round(CASE WHEN len(ts) > 0 THEN CAST(len(list_filter(ts, x -> list_contains($enOracleList, x))) AS DOUBLE) / len(ts) ELSE 0.0 END, 6) AS stopword_ratio
       FROM t0),
       q AS (SELECT * FROM st
             WHERE n_tokens >= 5 AND n_tokens <= 1000000
               AND mean_token_len >= 2 AND mean_token_len <= 15
               AND punct_ratio < 0.3 AND stopword_ratio > 0.01),
       h AS (SELECT *,
               len(list_filter(lts, x -> list_contains($enOracleList, x))) AS h_en,
               len(list_filter(lts, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','von','zu','den','dem','auf','für','im','sich','auch'], x))) AS h_de,
               len(list_filter(lts, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','no','por','con','para','del','se','su'], x))) AS h_es,
               len(list_filter(lts, x -> list_contains(['le','la','les','de','des','et','un','une','est','dans','que','pour','qui','sur','pas','au','du','ce'], x))) AS h_fr
             FROM q),
       lang AS (SELECT *, CASE
           WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]') THEN 'ja'
           WHEN regexp_matches(text, '[\\x{ac00}-\\x{d7af}]') THEN 'ko'
           WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           WHEN greatest(h_en, h_de, h_es, h_fr) >= 1 THEN
             CASE WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
                  WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                  WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                  ELSE 'de' END
           ELSE 'und' END AS lang_pred
         FROM h),
       l AS (SELECT doc_id, source, text, bpe_tokens FROM lang WHERE lang_pred = 'en'),
       lmc AS (SELECT w, COUNT(*) AS c
               FROM (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM l) GROUP BY 1),
       lms AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM lmc),
       lmtf AS (SELECT doc_id, w, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS w FROM l) GROUP BY 1, 2),
       lmlp AS (SELECT doc_id, w, tf,
                  CAST(tf AS DOUBLE) * ln(CAST(coalesce(lmc.c, 0) + 1 AS DOUBLE) / CAST(lms.n + lms.v AS DOUBLE)) AS lp
                FROM lmtf LEFT JOIN lmc USING (w) CROSS JOIN lms),
       lmpd AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS lm_n,
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lp ORDER BY w)),
                    (a, b) -> a + b) AS lsum
                FROM lmlp GROUP BY 1),
       pk AS (SELECT l.* FROM l JOIN lmpd USING (doc_id)
              WHERE round(exp(-(lmpd.lsum / lmpd.lm_n)), 6) <= $pplCutoff),
       quo(source, quota) AS (VALUES ('src0', 1200), ('src1', 900), ('src2', 600), ('src3', 300)),
       cum AS (SELECT doc_id, source, bpe_tokens,
           CAST(SUM(greatest(0, bpe_tokens)) OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         FROM pk),
       mixed AS (SELECT cum.doc_id, cum.source, cum.bpe_tokens
                 FROM cum JOIN quo USING (source) WHERE cum.cum_tokens <= quo.quota)"""

  /** The packed training layout of the curation DAG's mixture survivors —
    * shared verbatim by pipeline_curate (batch) and st_curate (streaming):
    * the two engines must answer the identical replay.
    */
  private[graft] lazy val sqlCuratePackedOracle: String =
    sqlCuratePackedSql(sqlCurateCtes)

  /** The packed-layout tail over any [[sqlCurateCtesFor]] instantiation. */
  private[graft] def sqlCuratePackedSql(curateCtes: String): String =
    s"""$curateCtes,
       pos AS (SELECT doc_id, bpe_tokens AS n_tokens,
           CAST(COALESCE(SUM(greatest(0, bpe_tokens)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
         FROM mixed)
       SELECT doc_id, n_tokens, start_token,
         CAST(start_token // 256 AS BIGINT) AS seq_first,
         CAST(CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 256
              ELSE start_token // 256 END AS BIGINT) AS seq_last,
         CAST(start_token % 256 AS BIGINT) AS offset_in_seq
       FROM pos"""


  /** The authority-weighted fetch-plan replay over the planted sitemap
    * frontier: rank iteration unrolled (the g_pagerank pattern) over the
    * hub-and-spoke graph, then the priority = rank × staleness window
    * per domain. `lastmodExpr` is the per-entry lastmod in terms of
    * (d, k) — month-1 for the batch query, the latest-wins two-wave form
    * for the streamed frontier; `asOf` the plan date.
    */
  private[graft] def sqlFetchPrioritySql(lastmodExpr: String, asOf: String): String = {
    def iter(prev: String, cur: String) =
      s"""$cur AS (SELECT n.node,
            CAST(150000 + (85 * COALESCE(SUM(r.rank // od.d), 0)) // 100 AS BIGINT) AS rank
          FROM nodes n
          LEFT JOIN ed ON ed.dst = n.node
          LEFT JOIN $prev r ON r.node = ed.src
          LEFT JOIN od ON od.src = ed.src
          GROUP BY n.node)"""
    s"""WITH dd AS (SELECT DISTINCT doc_id % 8 AS d FROM documents),
       rules0 AS (
         SELECT 'd' || CAST(d AS VARCHAR) || '.example.com' AS domain,
                'Disallow' AS directive, '/private' AS path_prefix FROM dd
         UNION ALL
         SELECT 'd' || CAST(d AS VARCHAR) || '.example.com', 'Allow',
                '/private/ok' FROM dd WHERE d % 2 = 0
         UNION ALL
         SELECT 'd' || CAST(d AS VARCHAR) || '.example.com', 'Disallow',
                '/p/' || CAST(d AS VARCHAR) FROM dd WHERE d % 3 = 0),
       e AS (SELECT d, CAST(d * 100 + k AS BIGINT) AS entry_id,
               CASE WHEN k % 3 = 0 THEN '/private/ok/s' || CAST(d * 100 + k AS VARCHAR)
                    WHEN k % 3 = 1 THEN '/private/s' || CAST(d * 100 + k AS VARCHAR)
                    ELSE '/s/' || CAST(d * 100 + k AS VARCHAR) END AS path,
               'd' || CAST(d AS VARCHAR) || '.example.com' AS domain,
               $lastmodExpr AS lastmod
             FROM dd, unnest(range(0, 3 + d)) AS uk(k)),
       m AS (SELECT e.entry_id, r.directive, r.path_prefix,
               row_number() OVER (PARTITION BY e.entry_id
                 ORDER BY len(r.path_prefix) DESC,
                          (r.directive = 'Allow') DESC,
                          r.path_prefix DESC) AS rn
             FROM e JOIN rules0 r ON e.domain = r.domain
               AND starts_with(e.path, r.path_prefix)),
       a AS (SELECT e.* FROM e
             LEFT JOIN (SELECT entry_id, directive FROM m WHERE rn = 1) b
               USING (entry_id)
             WHERE COALESCE(b.directive = 'Allow', true)),
       sp AS (SELECT entry_id AS src, (entry_id // 100) * 100 AS dst
              FROM e WHERE entry_id % 100 <> 0),
       ed AS (SELECT src, dst FROM sp UNION ALL SELECT dst, src FROM sp),
       nodes AS (SELECT DISTINCT src AS node FROM ed),
       od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM ed GROUP BY 1),
       r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
       ${iter("r0", "r1")},
       ${iter("r1", "r2")},
       ${iter("r2", "r3")},
       pr AS (SELECT a.entry_id, 'https://' || a.domain || a.path AS loc,
                a.domain, a.lastmod,
                COALESCE(r3.rank, 150000) AS rank,
                CAST(date_diff('day', CAST(a.lastmod AS DATE),
                  DATE '$asOf') + 1 AS BIGINT) AS staleness_days,
                CAST(a.d % 3 + 1 AS BIGINT) AS crawl_delay
              FROM a LEFT JOIN r3 ON r3.node = a.entry_id),
       sl AS (SELECT *, CAST(rank * staleness_days AS BIGINT) AS priority
              FROM pr)
       SELECT entry_id, loc, domain, lastmod, rank, staleness_days,
              crawl_delay, priority,
              CAST(row_number() OVER (PARTITION BY domain
                ORDER BY priority DESC, entry_id) - 1 AS BIGINT) AS fetch_slot,
              CAST((row_number() OVER (PARTITION BY domain
                ORDER BY priority DESC, entry_id) - 1) * crawl_delay AS BIGINT)
                AS fetch_eta_s
       FROM sl"""
  }

  /** The crawl-to-corpus FRONT HALF as corpus CTEs for
    * [[sqlCurateCtesFor]] (VERDICT r12 #2 — docs/CRAWL.md proved as ONE
    * lineage): planted HTML pages behind the documents' URI scheme →
    * robots longest-match gate over the inline example.com ruleset
    * (Disallow /d/1, Allow /d/13 carve-back) → the WET gz ingest is
    * byte-lossless so the fetched body IS the page → the five-stage
    * htmlStrip replay → a content-mirror union (every 5th allowed page
    * duplicated at +1000000, the different-URL-same-content case exact
    * dedup must catch).
    */
  private[graft] lazy val sqlCrawlCorpusCtes: String =
    """pg AS (SELECT doc_id, source,
           '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' ||
           '<script type="text/javascript">if (x &lt; 1) { x = 2; }</script>' ||
           '<style>p { color: red }</style></head><body>' ||
           '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
           '<p class="lead">' || substring(text, 1, 120) ||
           ' &amp; more &lt;tags&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end.</p>' ||
           (CASE WHEN doc_id % 3 = 0 THEN
              '<!-- hidden --><div><p>Extra ' || CAST(doc_id AS VARCHAR) || '</p></div>'
            ELSE '' END) ||
           '</body></html>' AS html
         FROM documents),
       crl(directive, path_prefix) AS (VALUES ('Disallow', '/d/1'), ('Allow', '/d/13')),
       cmt AS (SELECT pg.doc_id, r.directive,
                row_number() OVER (PARTITION BY pg.doc_id
                  ORDER BY len(r.path_prefix) DESC,
                           (r.directive = 'Allow') DESC,
                           r.path_prefix DESC) AS rn
              FROM pg JOIN crl r
                ON starts_with('/d/' || CAST(pg.doc_id AS VARCHAR), r.path_prefix)),
       cg AS (SELECT pg.* FROM pg
             LEFT JOIN (SELECT doc_id, directive FROM cmt WHERE rn = 1) b
               USING (doc_id)
             WHERE COALESCE(b.directive = 'Allow', true)),
       cs1 AS (SELECT doc_id, source, regexp_replace(html,
           '(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>|(?s)<!--.*?-->',
           '', 'g') AS t FROM cg),
       cs2 AS (SELECT doc_id, source, regexp_replace(t,
           '</p>|</div>|</h[1-6]>|</li>|</title>|<br */?>', chr(10), 'g') AS t
         FROM cs1),
       cs3 AS (SELECT doc_id, source,
           regexp_replace(t, '<[^>]+>', '', 'g') AS t FROM cs2),
       cs4 AS (SELECT doc_id, source,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
             '&nbsp;', ' '), '&amp;', '&') AS t FROM cs3),
       cs5 AS (SELECT doc_id, source, regexp_replace(regexp_replace(t,
           '[ \t]+', ' ', 'g'), ' *\n *', chr(10), 'g') AS t FROM cs4),
       cs6 AS (SELECT doc_id, source, array_to_string(
           list_filter(string_split(t, chr(10)), x -> x <> ''), chr(10))
           AS strip_text FROM cs5),
       corpus AS (SELECT doc_id, source, strip_text AS text FROM cs6
                  UNION ALL
                  SELECT doc_id + 1000000, source, strip_text FROM cs6
                  WHERE doc_id % 5 = 0)"""

  /** The curation DAG's per-stage funnel report — shared by
    * pipeline_curate_report and st_curate_report.
    */
  private[graft] lazy val sqlCurateReportOracle: String =
    s"""$sqlCurateCtes
       SELECT '0_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COALESCE(SUM(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))), 0) AS BIGINT) AS n_bpe_tokens
       FROM corpus
       UNION ALL
       SELECT '1_dedup', CAST(COUNT(*) AS BIGINT),
              CAST(COALESCE(SUM(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+'))), 0) AS BIGINT)
       FROM ded
       UNION ALL
       SELECT '2_quality', CAST(COUNT(*) AS BIGINT),
              CAST(COALESCE(SUM(bpe_tokens), 0) AS BIGINT) FROM q
       UNION ALL
       SELECT '3_lang', CAST(COUNT(*) AS BIGINT),
              CAST(COALESCE(SUM(bpe_tokens), 0) AS BIGINT) FROM l
       UNION ALL
       SELECT '4_ppl', CAST(COUNT(*) AS BIGINT),
              CAST(COALESCE(SUM(bpe_tokens), 0) AS BIGINT) FROM pk
       UNION ALL
       SELECT '5_mixture', CAST(COUNT(*) AS BIGINT),
              CAST(COALESCE(SUM(bpe_tokens), 0) AS BIGINT) FROM mixed"""

  /** Oracle-side unrolled twin of Text.bpeLoop: w0 = char-split vocab;
    * per level i, p_i counts adjacent pairs, b_i argmaxes (cnt DESC, l, r),
    * w_{i+1} applies the merge with a nested-list fold. The accumulator
    * CARRIES the winning pair as its first two elements (stripped by the
    * final [3:] slice) because DuckDB 1.0 lambdas cannot see correlated
    * columns (they silently resolve NULL); explicit `a[1:len(a)-1]`
    * bounds because `a[:-1]` on a lambda parameter is a no-op there.
    */
  private[graft] lazy val sqlBpeTrainCtes: String = sqlBpeTrainCtesFor("documents")

  /** Oracle-side unrolled BPE trainer over any source relation exposing a
    * `text` column — shared by the 3-merge oracle (documents), the deep
    * run's prefix oracle (the rich corpus), and the BYTE-GRAIN twins
    * (`byteGrain = true` starts w0 from UTF-8 hex pairs instead of
    * characters; everything after the alphabet is the same loop).
    */
  private[graft] def sqlBpeTrainCtesFor(sourceRel: String,
                                 byteGrain: Boolean = false): String = {
    def pairCtes(i: Int) =
      s"""p$i AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(wn) AS BIGINT) AS cnt
           FROM w$i, unnest(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
         b$i AS (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)"""
    def mergeCte(i: Int) =
      s"""w${i + 1} AS (SELECT w, wn,
           list_reduce(list_concat([[b$i.l, b$i.r]], list_transform(syms, s -> [s])), (acc, x) ->
             CASE WHEN len(acc) > 2 AND acc[len(acc)] = acc[1] AND x[1] = acc[2]
                  THEN list_append(acc[1:len(acc) - 1], acc[1] || acc[2])
                  ELSE list_concat(acc, x) END)[3:] AS syms
         FROM w$i CROSS JOIN b$i)"""
    val symInit =
      if (byteGrain) "regexp_extract_all(hex(encode(w)), '[0-9A-F]{2}')"
      else """list_transform(generate_series(1, len(w)),
                  i -> substr(w, CAST(i AS INTEGER), 1))"""
    s"""WITH toks AS (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM $sourceRel),
       v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wn FROM toks GROUP BY 1),
       w0 AS (SELECT w, wn, $symInit AS syms FROM v),
       ${pairCtes(0)}, ${mergeCte(0)},
       ${pairCtes(1)}, ${mergeCte(1)},
       ${pairCtes(2)}, ${mergeCte(2)}"""
  }

  /** One merge-APPLY CTE: `dst` = `src` with merge `b$bIdx` applied under
    * the training fold's leftmost-non-overlapping accumulator semantics —
    * the body of sqlBpeTrainCtesFor's merge step, reusable over any
    * vocabulary (the t_bpe_encode oracle applies TRAINED merges to a NEW
    * corpus's vocab).
    */
  private[graft] def sqlBpeApplyCte(src: String, dst: String, bIdx: Int): String =
    s"""$dst AS (SELECT w, wn,
         list_reduce(list_concat([[b$bIdx.l, b$bIdx.r]], list_transform(syms, s -> [s])), (acc, x) ->
           CASE WHEN len(acc) > 2 AND acc[len(acc)] = acc[1] AND x[1] = acc[2]
                THEN list_append(acc[1:len(acc) - 1], acc[1] || acc[2])
                ELSE list_concat(acc, x) END)[3:] AS syms
       FROM $src CROSS JOIN b$bIdx)"""

  /** The deep-BPE training corpus: documents text plus two deterministic
    * doc_id-derived numeric words per document. The natural corpus has
    * only ~31 distinct words (the synthetic generator's vocabulary), so
    * greedy merging exhausts its pair supply near merge 90; the numeric
    * tail guarantees >256 merges by a counting argument — the loop can
    * only run dry when every distinct multi-char word has collapsed to
    * one symbol, which needs at least as many merges as there are
    * distinct numeric words (hundreds at sf0.001, thousands at sf0.01).
    * Pure integer arithmetic, so the oracle replays the corpus verbatim.
    */
  private[graft] lazy val sqlBpeRichRel: String =
    """(SELECT text || ' ' || CAST(((doc_id % 1000000000) * 2654435761) % 1000000000 AS VARCHAR)
              || ' ' || CAST((((doc_id % 100000) + 7) * 40503) % 100000 AS VARCHAR) AS text
       FROM documents)"""

  /** The byte-BPE corpus: documents text plus one NON-ASCII word per
    * document ("über0".."über6") — multi-byte UTF-8 sequences the char
    * alphabet never sees, forcing the byte-grain loop to merge across
    * byte boundaries (C3+BC first, on any corpus where the ü word family
    * is frequent enough). Deterministic, so both engines replant it.
    */
  private[graft] lazy val sqlBpeBytesRel: String =
    """(SELECT text || ' über' || CAST(doc_id % 7 AS VARCHAR) AS text
       FROM documents)"""

  private[graft] lazy val sqlLmScoreCtes: String =
    s"""WITH tr AS (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM documents WHERE doc_id % 2 = 0),
       c AS (SELECT w, COUNT(*) AS c FROM tr GROUP BY 1),
       s AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM c),
       tok AS (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS w FROM documents),
       tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       lp AS (SELECT doc_id, w, tf,
                CAST(tf AS DOUBLE) * ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / CAST(s.n + s.v AS DOUBLE)) AS lp
              FROM tf LEFT JOIN c USING (w) CROSS JOIN s),
       pd AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lp ORDER BY w)),
                  (a, b) -> a + b) AS lsum
              FROM lp GROUP BY 1),
       scored AS (SELECT d.doc_id, coalesce(pd.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
                    round(pd.lsum / pd.n_tokens, 6) AS avg_logprob,
                    round(exp(-(pd.lsum / pd.n_tokens)), 6) AS ppl
                  FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id))"""

  /** The SCD2 interval table over the tie-collapsed lineitem change log
    * — shared by the batch build (e_scd2_history) and the streaming
    * maintenance operator (st_scd2_history), which must answer it
    * verbatim.
    */
  private[graft] val scd2HistoryOracle: String =
    """WITH log AS (
         SELECT l_orderkey, l_linenumber,
                min(l_returnflag) AS l_returnflag,
                min(l_linestatus) AS l_linestatus
         FROM lineitem GROUP BY l_orderkey, l_linenumber
       ), marked AS (
         SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
                CASE WHEN lag(1) OVER w IS NULL
                       OR l_returnflag IS DISTINCT FROM lag(l_returnflag) OVER w
                       OR l_linestatus IS DISTINCT FROM lag(l_linestatus) OVER w
                     THEN 1 ELSE 0 END AS is_change
         FROM log
         WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
       ), runs AS (
         SELECT l_orderkey, l_linenumber AS effective_from, l_returnflag, l_linestatus
         FROM marked WHERE is_change = 1
       )
       SELECT l_orderkey, effective_from,
              lead(effective_from) OVER w2 AS effective_to,
              (lead(effective_from) OVER w2 IS NULL) AS is_current,
              l_returnflag, l_linestatus
       FROM runs
       WINDOW w2 AS (PARTITION BY l_orderkey ORDER BY effective_from)"""

  /** Shared SQL fragment: cosine similarity of two DOUBLE[] expressions. */
  private[graft] def sqlCosine(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)) > 0
        THEN list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
        ELSE 0.0 END"""

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check.
    */
  /** The WET-parse replay — shared verbatim by `src_wet_parse` (the char
    * parser) and `src_wet_parse_gz` (the gzipped byte parser): on the
    * all-ASCII corpus byte and char framing coincide, so both parsers
    * must hash-match this one statement.
    */
  private[graft] val wetParseOracle: String =
    """WITH r AS (SELECT doc_id, doc_id % 8 AS file_id,
           'WARC/1.0' || chr(10) || 'WARC-Type: conversion' || chr(10) ||
           'WARC-Target-URI: https://example.com/d/' || CAST(doc_id AS VARCHAR) || chr(10) ||
           'Content-Length: ' || CAST(len(text) AS VARCHAR) || chr(10) || chr(10) ||
           text || chr(10) || chr(10) AS rec
         FROM documents),
       b AS (SELECT file_id, string_agg(rec, '' ORDER BY doc_id) AS wet
             FROM r GROUP BY file_id),
       e AS (SELECT file_id,
               unnest(string_split(wet, 'WARC/1.0' || chr(10))) AS rec FROM b),
       f AS (SELECT file_id, rec FROM e WHERE rec <> ''),
       p AS (SELECT file_id, rec,
           regexp_extract(rec, 'WARC-Target-URI: ([^\n]*)\n', 1) AS uri,
           CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)\n', 1) AS BIGINT)
             AS declared_len,
           strpos(rec, chr(10) || chr(10)) AS he FROM f)
       SELECT file_id, uri,
         CAST(regexp_extract(rec,
           'WARC-Target-URI: https://example\.com/d/([0-9]+)\n', 1) AS BIGINT)
           AS doc_id,
         declared_len,
         substring(rec, he + 2, CAST(declared_len AS INTEGER)) AS body,
         (len(rec) = he + 1 + declared_len + 2) AS len_ok
       FROM p"""


  /** The orders rule report as DuckDB SQL over relation `rel` (used for both
    * the clean table and the mutated CTE).
    */
  private[graft] def rulesOrdersOracle(rel: String): String =
    s"""SELECT 'orders' AS table_name, 'null_required' AS rule, 'o_orderkey' AS column_name, CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS violation_count FROM $rel
       UNION ALL SELECT 'orders', 'null_required', 'o_custkey', CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM $rel
       UNION ALL SELECT 'orders', 'null_required', 'o_orderstatus', CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) FROM $rel
       UNION ALL SELECT 'orders', 'null_required', 'o_orderdate', CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) FROM $rel
       UNION ALL SELECT 'orders', 'invalid_status', 'o_orderstatus', CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('P','O','F')) AS BIGINT) FROM $rel
       UNION ALL SELECT 'orders', 'negative_value', 'o_totalprice', CAST(COUNT(*) FILTER (WHERE o_totalprice < 0) AS BIGINT) FROM $rel
       UNION ALL SELECT 'orders', 'empty_relation', '*', CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS BIGINT) FROM $rel
       UNION ALL SELECT 'orders', 'duplicate_key', 'o_orderkey', CAST(COUNT(*) AS BIGINT) FROM (SELECT 1 FROM $rel GROUP BY o_orderkey HAVING COUNT(*) > 1)
       UNION ALL SELECT 'orders', 'non_integral_type', 'o_orderkey', CAST(0 AS BIGINT)"""
}

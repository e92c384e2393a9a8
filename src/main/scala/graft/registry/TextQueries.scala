package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.operators.{Dedup, Grouping, LanguageModel, Pack, Passages, Sampling, SetJoin, Similarity, Skew, Upsert}
import graft.functions.Text
import graft.pipeline.Pipeline
import graft.sources.{Tables, TestdataAdapter}
import graft.transform.Kpis
import graft.validate.{Rules, TableRules}
import graft.EntryFixtures._
import graft.EntryOracles._

/** The Text slice of the SparkEntry registry — text analysis, tokenizers, LM scoring, and line curation.
  * Entries are verbatim from the pre-split SparkEntry (VERDICT r11 #8);
  * SparkEntry merges every slice into the driver-contract maps.
  */
private[graft] object TextQueries {

  /** WordPiece vocab-build CTEs (the Unigram.seedVocab counting pass at
    * maxPieceLen 6 / top-128, which WordPiece.vocab delegates to) —
    * ends in `wp(piece, weight)`, the UNDOUBLED piece set. The ##
    * doubling makes start and continuation sets identical by
    * construction, so the segment oracle matches against `wp` at every
    * position and adds the `##` prefix textually.
    */
  private val sqlWordPieceVocabCtes: String =
    s"""wpw AS (SELECT unnest(${sqlTokens("lower(text)")}) AS word FROM documents),
       wpc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM wpw GROUP BY 1),
       wps AS (SELECT unnest(flatten([[substring(word, i, L) for i in generate_series(1, len(word) - L + 1)] for L in generate_series(2, 6) if len(word) >= L])) AS piece, cnt FROM wpc),
       wpm AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS weight FROM wps GROUP BY 1 ORDER BY weight DESC, piece LIMIT 128),
       wpg AS (SELECT unnest([substring(word, i, 1) for i in generate_series(1, len(word))]) AS piece, cnt FROM wpc),
       wpsg AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS weight FROM wpg GROUP BY 1),
       wp AS (SELECT piece, weight FROM wpm UNION ALL SELECT piece, weight FROM wpsg)"""

  /** Likelihood-scored WordPiece TRAINING oracle CTEs (the t_bpe_train
    * unrolled-decision pattern): three merge rounds, each pinning the
    * argmax of score = cnt / (freq_l · freq_r) — the same IEEE double
    * division Spark orders by — over role-marked symbols (first char
    * plain, rest ##-prefixed), then the leftmost-non-overlapping fold
    * with the merged symbol l || r-without-##.
    */
  private val sqlWordPieceTrainCtes: String = {
    def pairCtes(i: Int) =
      s"""f$i AS (SELECT s AS sym, CAST(SUM(wn) AS BIGINT) AS f
           FROM w$i, unnest(syms) AS u(s) GROUP BY 1),
         p$i AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(SUM(wn) AS BIGINT) AS cnt
           FROM w$i, unnest(range(1, len(syms))) AS u(i) GROUP BY 1, 2),
         b$i AS (SELECT p$i.l, p$i.r, p$i.cnt, fl.f AS fl, fr.f AS fr
           FROM p$i JOIN f$i fl ON fl.sym = p$i.l JOIN f$i fr ON fr.sym = p$i.r
           ORDER BY CAST(p$i.cnt AS DOUBLE) / (fl.f * fr.f) DESC, p$i.l, p$i.r
           LIMIT 1)"""
    def mergeCte(i: Int) =
      s"""w${i + 1} AS (SELECT w, wn,
           list_reduce(list_concat([[b$i.l, b$i.r]], list_transform(syms, s -> [s])), (acc, x) ->
             CASE WHEN len(acc) > 2 AND acc[len(acc)] = acc[1] AND x[1] = acc[2]
                  THEN list_append(acc[1:len(acc) - 1], acc[1] || substr(acc[2], 3))
                  ELSE list_concat(acc, x) END)[3:] AS syms
         FROM w$i CROSS JOIN b$i)"""
    s"""WITH toks AS (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM documents),
       v AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wn FROM toks GROUP BY 1),
       w0 AS (SELECT w, wn, list_transform(generate_series(1, len(w)),
           i -> CASE WHEN i = 1 THEN substr(w, CAST(i AS INTEGER), 1)
                ELSE '##' || substr(w, CAST(i AS INTEGER), 1) END) AS syms FROM v),
       ${pairCtes(0)}, ${mergeCte(0)},
       ${pairCtes(1)}, ${mergeCte(1)},
       ${pairCtes(2)}"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // Benchmark decontamination (Dedup.contaminationReport): docs < 10
    // play the benchmark/eval set; the corpus is every other document
    // plus a PLANTED contaminated twin of each benchmark doc (its text +
    // a pad suffix — guaranteed shared 8-grams). Exact integer overlap
    // counts, so the oracle replicates the whole pass verbatim: every
    // planted twin must flag contaminated, every count must hash-match.
    // Trainable quality classifier (operators/Classify.scala): hashed
    // bag-of-words logistic regression, full-batch GD in DataFrame ops.
    // Planted: every doc gets a class marker token repeated 3× (qpos for
    // odd ids, qneg for even) appended to its REAL text — linearly
    // separable by construction, so a converged model must classify every
    // doc exactly; the oracle states the planted truth directly. This pins
    // the whole train→score loop end-to-end (features, broadcast weight
    // joins, gradient shuffle, bias path) without exposing FP-order-
    // sensitive raw weights to the hash compare.
    "t_quality_train" -> ((s, dir) => {
      val labeled = qualityLabeled(s, dir)
      val model = graft.operators.Classify.train(labeled, "doc_id", "text",
        "label", dim = 1 << 16, iters = 15, lr = 0.8)
      graft.operators.Classify.score(labeled, "doc_id", "text", model)
        .select(col("doc_id"), col("predicted"))
    }),

    "t_contamination" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val bench = d.filter(col("doc_id") < 10)
      val planted = bench.select((col("doc_id") + PlantedOffset).as("doc_id"),
        concat(col("text"), lit(" tail pad tokens")).as("text"))
      val corpus = d.filter(col("doc_id") >= 10).unionByName(planted)
      Dedup.contaminationReport(corpus, "doc_id", "text", bench, "text")
    }),

    // BM25 ranked retrieval over the corpus (operators/Retrieval.scala):
    // exact integer tf/df/len/N, fixed-order per-term addition, ranking
    // by the ROUNDED score — every arithmetic step mirrored verbatim in
    // the DuckDB oracle, so the whole scoring pipeline is hash-compared.
    "t_bm25_topk" -> ((s, dir) =>
      graft.operators.Retrieval.bm25TopK(Tables.documents(s, dir),
        "doc_id", "text", Seq("spark", "scan"), k = 20)),

    // HYBRID retrieval (Retrieval.rrfFuse): the standard production
    // search stack — a lexical BM25 leg and a vector cosine leg fused by
    // reciprocal-rank fusion, score = 1/(60+rank_lex) + 1/(60+rank_vec),
    // missing legs 0. Both legs are their own oracled retrievers; the
    // fusion is two IEEE divisions and a fixed-order sum, replayed
    // verbatim. Vector leg: the corpus embedding of doc 0 as the query
    // (vec_id and doc_id share the id space at every SF).
    "t_hybrid_rrf" -> ((s, dir) => {
      val lex = graft.operators.Retrieval.bm25TopK(Tables.documents(s, dir),
        "doc_id", "text", Seq("spark", "scan"), k = 20)
      val e = embDouble(s, dir)
      val vec = Similarity.bruteForceTopK(
        e.filter(col("vec_id") === 0)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        e.select(col("vec_id"), col("emb_d").as("embedding")), k = 20)
        .select(col("vec_id").as("doc_id"), col("rank"))
      graft.operators.Retrieval.rrfFuse(
        lex.select(col("doc_id"), col("rank")), vec, "doc_id", k = 10)
    }),

    // TF-IDF cosine retrieval — the vector-space scorer beside BM25,
    // normalized by the FULL document vector norm (term-sorted left fold,
    // the LM-score determinism contract); the oracle replays idf, fold,
    // fixed-order dot, and the single division verbatim.
    "t_tfidf_topk" -> ((s, dir) =>
      graft.operators.Retrieval.tfidfTopK(Tables.documents(s, dir),
        "doc_id", "text", Seq("spark", "scan"), k = 20)),

    // ---- text analysis (§7.5) ----
    // PMI term associations (operators/Association.scala): top pairs by
    // pointwise mutual information at distinct-(doc, term) grain —
    // df-banded vocabulary, per-doc rarest-term cap bounding the pair
    // join, one ln per surviving pair; the oracle replays every stage.
    "t_pmi_cooc" -> ((s, dir) =>
      graft.operators.Association.pmiPairs(
        Tables.documents(s, dir).select("doc_id", "text"),
        "doc_id", "text", minDf = 2, maxDf = 1000000L,
        perDocCap = 16, minPair = 5, k = 100)),
    "t_text_stats" -> ((s, dir) =>
      Text.analyzed(Tables.documents(s, dir).select(col("doc_id"), col("text")))
        .select("doc_id", "n_tokens", "n_chars_measured", "mean_token_len",
          "punct_ratio", "stopword_ratio", "quality_ok")),
    "t_bpe_tokens" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.bpeTokenCount(col("text")).as("bpe_tokens"))),
    // Tokenizer fertility/compression table (Text.fertilityReport): per
    // source, whitespace-word and BPE-regex-piece totals plus the
    // pieces-per-word and chars-per-piece ratios — both tokenizations
    // are the deterministic codegen'd counters, so the oracle replays
    // the whole report including the ratio arithmetic.
    "t_tokenizer_fertility" -> ((s, dir) =>
      Text.fertilityReport(Tables.documents(s, dir), "source")),
    "t_lang_id" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.langId(col("text")).as("lang_pred"))),
    // TRAINED language ID (VERDICT r13 #7, operators/LangId.scala):
    // multinomial Naive Bayes over hashed char trigrams, integer-count
    // training, scaled-long log-weights, integer scoring. Planted: every
    // doc gets its language's stopword sentence appended 3× (lang by
    // doc_id % 4) over its REAL text — the shared base text contributes
    // near-equally to every class (labels stripe the same corpus), so
    // the marker grams decide with a wide margin and the converged model
    // must reproduce the planted labels exactly (the t_quality_train
    // stance). The heuristic t_lang_id stays as the fallback surface.
    "t_lang_id_trained" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr")
      val markers = langs.map(l =>
        (Text.stopwords(l).mkString(" ") + " ") * 3)
      val markerCol = element_at(
        array(markers.map(lit): _*), (col("doc_id") % 4).cast("int") + 1)
      val langCol = element_at(
        array(langs.map(lit): _*), (col("doc_id") % 4).cast("int") + 1)
      val labeled = Tables.documents(s, dir).select(col("doc_id"),
        concat(col("text"), lit(" "), markerCol).as("text"),
        langCol.as("lang"))
      val model = graft.operators.LangId.train(labeled, "doc_id", "text",
        "lang", dim = 1 << 12, n = 3)
      graft.operators.LangId.predict(labeled, "doc_id", "text", model)
    }),
    // Corpus-ingest text normalization (functions/Normalize.scala): the
    // native NFC Catalyst expression + the codegen'd cleanup chain. Mess is
    // planted on doc_id%7 (decomposed accent, NBSP/em-space, CRLF, BEL,
    // edge spaces); the oracle builds the identical mess with chr() and
    // replays the identical regex chain over DuckDB's nfc_normalize.
    "t_normalize" -> ((s, dir) => {
      val raw = when(col("doc_id") % 7 === 0,
        concat(lit("Café du monde  \t\r\n"),
          col("text"), lit("  "))).otherwise(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), raw.as("__raw"))
        .select(col("doc_id"),
          graft.functions.Normalize.cleaned(col("__raw")).as("norm_text"),
          (graft.functions.Normalize.cleaned(col("__raw")) =!= col("__raw"))
            .as("changed"),
          length(col("__raw")).cast("long").as("n_chars_raw"))
        .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
    }),
    // C4 line-level cleaning (operators/LineCuration.scala) over the
    // deterministically planted page corpus (LineCuration.plantPages
    // scaladoc) — terminal-punct/word-count/javascript line gates plus the
    // lorem-ipsum/curly-brace/min-lines page gates, all replayed in DuckDB.
    "t_c4_lines" -> ((s, dir) =>
      graft.operators.LineCuration.c4Clean(
        graft.operators.LineCuration.plantPages(
          Tables.documents(s, dir), "doc_id", "text"), "doc_id", "page")),
    // C4 banned-phrase page gate (VERDICT r14 #5): poison phrases planted
    // into a modulo schedule of pages — a multi-word phrase appended to
    // %7 docs, a single word wrapped around %11 docs (both sides, so
    // multi-hit counting is exercised), case mixed so the lowercase
    // normalization is pinned. Token-grain contiguous match via the
    // broadcast n-gram join; the oracle replays the same tokenize +
    // window walk, so natural corpus hits (if any) agree by construction.
    "t_c4_blocklist" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val pages = docs.select(col("doc_id"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" buy cheap pills now")))
          .when(col("doc_id") % 11 === 0,
            concat(lit("GAMBLINGSPAM "), col("text"), lit(" gamblingspam")))
          .otherwise(col("text")).as("page"))
      graft.operators.LineCuration.blocklistGate(pages, "doc_id", "page",
        Seq("Buy Cheap Pills", "gamblingspam"))
    }),
    // Order-preserving intra-document line dedup on the same planted pages
    // (even ids re-append their first two lines, so the removal count is
    // provably exercised).
    "t_line_dedup" -> ((s, dir) =>
      graft.operators.LineCuration.dedupLines(
        graft.operators.LineCuration.plantPages(
          Tables.documents(s, dir), "doc_id", "text"), "doc_id", "page")),
    // Gopher/MassiveText quality-rule battery on the planted pages: every
    // signal, every per-rule verdict, and the composite flag, each
    // hash-compared against the DuckDB transcription.
    "t_gopher_report" -> ((s, dir) =>
      graft.operators.LineCuration.gopherReport(
        graft.operators.LineCuration.plantPages(
          Tables.documents(s, dir), "doc_id", "text"), "doc_id", "page")),
    // URL/domain front door (VERDICT r10 #5 — the step ahead of c4Clean):
    // canonicalization + blocklist gate (one suffix-matched, one exact)
    // + canonical-URL dedup over the planted crawl. The oracle replays
    // the planting and every normalization step; the blocked "spam
    // .tracker.net" rows prove the subdomain suffix match.
    "t_url_filter" -> ((s, dir) =>
      graft.operators.LineCuration.urlFilter(
        graft.operators.LineCuration.plantUrls(
          Tables.documents(s, dir), "doc_id"),
        "doc_id", "url",
        blocked = Seq("tracker.net", "ads.clickbait.io"))),
    // ... and the gated records feeding the strip — the crawl DAG's
    // first two real stages composed: parse → is_html gate → htmlStrip.
    "t_warc_strip" -> ((s, dir) =>
      graft.operators.Crawl.htmlStrip(
        graft.operators.Crawl.warcParse(
          graft.operators.Crawl.plantWarc(
            Tables.documents(s, dir), "doc_id", "text"))
          .filter(col("is_html"))
          .select(col("doc_id"), col("body")),
        "doc_id", "body")),
    // HTML → text extraction over planted pages: script/style/comment
    // spans dropped whole (lazy dot-all), block closers → newlines, tags
    // stripped, the six entities decoded (&amp; last), whitespace
    // squeezed — every rewrite replayed in DuckDB with the same
    // RE2-portable patterns under the 'g' flag.
    "t_html_strip" -> ((s, dir) =>
      graft.operators.Crawl.htmlStrip(
        graft.operators.Crawl.plantHtml(
          Tables.documents(s, dir), "doc_id", "text"))),
    // Per-document token entropy (Text.tokenEntropy): the
    // repetitiveness signal with the foldLogProbs determinism contract —
    // the Σ c·ln c term folds over the term-sorted count list on both
    // engines, so even the double arithmetic hash-compares bit-exact.
    "t_entropy_quality" -> ((s, dir) =>
      Text.tokenEntropy(Tables.documents(s, dir), "doc_id", "text")),
    // Corpus vocabulary drift (Profiling.dfDrift): document-frequency
    // shift between the even- and odd-id cohorts — integer df counts up
    // to ONE ln of one division, top-50 by |drift| with term tiebreak.
    "t_df_drift" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      graft.operators.Profiling.dfDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", minDf = 5, k = 50)
    }),
    // Sequential gate-attrition funnel (LineCuration.gateFunnel): the
    // curation observability table — lang → exact-dup → length-band →
    // lexical-diversity gates over documents plus planted %9 duplicate
    // copies; a document counts against the FIRST gate it fails, so the
    // removals sum to total − survivors. O(stages) output; the oracle
    // replays the first-fail classification and the funnel arithmetic.
    "t_filter_funnel" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = Tables.documents(s, dir).select("doc_id", "lang", "text")
      val planted = base.unionByName(base.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + PlantedOffset).as("doc_id"),
          col("lang"), col("text")))
      val toks = filter(split(trim(lower(col("text"))), "\\s+"),
        t => length(t) > 0)
      val flagged = planted
        .withColumn("n_toks", size(toks).cast("long"))
        .withColumn("n_vocab", size(array_distinct(toks)).cast("long"))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      graft.operators.LineCuration.gateFunnel(flagged, Seq(
        "lang_en" -> (col("lang") === "en"),
        "exact_dup" -> (col("__rn") === 1),
        "length_band" -> col("n_toks").between(20, 1000),
        "lexical_diversity" -> (col("n_vocab") * 10 >= col("n_toks") * 3)))
    }),
    // Zipf fit over the 64 most frequent terms (Text.zipfFit): corpus
    // health in two numbers — least-squares slope/intercept of ln(freq)
    // on ln(rank), folds and expression trees replayed token-for-token.
    "t_corpus_zipf" -> ((s, dir) =>
      Text.zipfFit(Tables.documents(s, dir), "text", topK = 64)),
    // Per-source adaptive quality gate: keep the top 75% of each
    // source's documents by vocabulary richness — percent_rank inside
    // the source partition with an id tiebreak, so the kept set is
    // deterministic and the oracle replays rank arithmetic exactly.
    "t_adaptive_quality" -> ((s, dir) =>
      graft.operators.Shards.adaptiveQualityGate(
        docTokenVocab(Tables.documents(s, dir)),
        "source", "doc_id", "n_vocab", q = 0.25)),
    // BPE tokenizer-training step: corpus-wide weighted adjacent-char
    // pair counts at distinct-word grain — integer counting all the way,
    // so the oracle replicates the whole pass verbatim
    "t_bpe_pairs" -> ((s, dir) =>
      Text.bpePairCounts(Tables.documents(s, dir), "text")),
    // FULL BPE training loop (Text.bpeLoop): 3 greedy merges — each
    // iteration counts pairs over the evolving symbol sequences, argmaxes
    // with a fixed tie-break, and applies the merge leftmost-greedy. The
    // oracle unrolls the identical loop in DuckDB (every intermediate
    // merge DECISION is verified, not just the final table).
    "t_bpe_train" -> ((s, dir) =>
      Text.bpeTrainMerges(Tables.documents(s, dir), "text", nMerges = 3)),
    // BPE at VOCABULARY scale (VERDICT r09 #3): the same greedy loop run
    // to 256 merges — realistic tokenizer-training depth, one Spark job
    // per merge after the r10 rework. The oracle is the decision-replay
    // PREFIX: the first three merges of the deep run must equal the
    // 3-merge unrolled DuckDB replay (greedy is prefix-stable — depth
    // changes nothing about earlier decisions), and the shape twin pins
    // that the full 256-merge depth was actually reached.
    "t_bpe_train256" -> ((s, dir) =>
      bpe256(s, dir).filter(col("merge_rank") <= 3)),
    // The tokenizer's ENCODE path (Text.bpeEncode): merges trained on
    // documents applied to the UNSEEN rich corpus (its numeric words
    // never appeared in training) — the train→ship→tokenize-new-text
    // lifecycle. The oracle trains the same 3 merges and replays the
    // application fold by fold over the new corpus's vocabulary.
    "t_bpe_encode" -> ((s, dir) => {
      val merges = Text.bpeTrainMerges(Tables.documents(s, dir), "text",
          nMerges = 3)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Text.bpeEncode(bpeRichCorpus(s, dir), "text", merges)
    }),
    "t_bpe_train256_shape" -> ((s, dir) =>
      bpe256(s, dir).agg(
        count(lit(1)).cast("long").as("n_merges"),
        (min(col("pair_count")) >= 1L).as("counts_positive"))),
    // the trained tokenizer applied to its vocabulary: piece sequences
    // after the same 3 merges, flat-string serialized
    "t_bpe_segment" -> ((s, dir) =>
      Text.bpeSegment(Tables.documents(s, dir), "text", nMerges = 3)),
    // BYTE-LEVEL BPE (VERDICT r11 #5 — the GPT-2 variant): the same
    // greedy loop started from UTF-8 hex-pair bytes over the ü-enriched
    // corpus, so merges cross multi-byte boundaries. The oracle unrolls
    // the identical loop at byte grain — every merge DECISION replays.
    "t_bpe_bytes" -> ((s, dir) =>
      Text.bpeTrainMergesBytes(bpeBytesCorpus(s, dir), "text", nMerges = 3)),
    // the byte-trained tokenizer applied to its vocabulary, with the
    // LOSSLESS ROUND-TRIP column: word_rt re-decodes each word from its
    // hex pieces (unhex → UTF-8) and must equal word on every row — the
    // zero-OOV guarantee the byte alphabet buys, hash-checked corpus-wide
    "t_bpe_bytes_segment" -> ((s, dir) =>
      Text.bpeSegmentBytes(bpeBytesCorpus(s, dir), "text", nMerges = 3)),
    // the byte encode path: merges trained on documents applied to the
    // UNSEEN ü-corpus — non-ASCII words the training text never
    // contained still encode with zero OOV (base bytes always cover)
    "t_bpe_bytes_encode" -> ((s, dir) => {
      val merges = Text.bpeTrainMergesBytes(Tables.documents(s, dir), "text",
          nMerges = 3)
        .orderBy("merge_rank").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Text.bpeEncodeBytes(bpeBytesCorpus(s, dir), "text", merges)
    }),
    // Unigram tokenizer SEED vocabulary (Kudo 2018 step 1 — the other
    // tokenizer family beside BPE): substring candidates at distinct-word
    // grain, top-k by corpus weight, singles appended unconditionally.
    // Pure integer counting → the oracle replays it verbatim (seedSize
    // 128 so the top-k boundary actually bites on this corpus).
    // SENTENCE segmentation (Text.sentenceSplit over planted prose —
    // 6-word sentences with scheduled ./!/? terminators): mark
    // punctuation+whitespace boundaries, split, index; the grain
    // sentence-level dedup and citation alignment run on. Shuffle-free;
    // every piece replayed verbatim.
    "t_sentences" -> ((s, dir) =>
      Text.sentenceSplit(
        Text.plantProse(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id", "prose")),
    // Sentence-budget context chunking (Text.chunkBySentences): the RAG
    // ingestion packer — sentences pack greedily into ≤20-token chunks,
    // overflow starts the next chunk, never split mid-sentence. The
    // greedy reset is a sequential fold (one HOF aggregate per doc);
    // the oracle replays it as a recursive CTE.
    "t_chunks_sentences" -> ((s, dir) =>
      Text.chunkBySentences(
        Text.plantProse(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id", "prose", budget = 20)),
    // WORDPIECE — the third tokenizer family (BERT's greedy
    // longest-match-first): vocabulary = the seedVocab counting pass at
    // (6, 128) doubled into ##-continuation forms. Pure integer counting
    // + string concat, replayed verbatim.
    "t_wordpiece_vocab" -> ((s, dir) =>
      graft.operators.WordPiece.vocab(Tables.documents(s, dir), "text",
        maxPieceLen = 6, topK = 128)),
    // Greedy longest-match segmentation under the broadcast vocabulary,
    // over a corpus enriched with one word carrying a character the
    // training text never saw ('\u00a4') — that word MUST collapse to
    // [UNK] (unlike byte-BPE, WordPiece has an OOV path; the oracle
    // follows the same chain position by position via recursive CTE).
    "t_wordpiece_segment" -> ((s, dir) => {
      // the typed (starts, conts) path: corpus-built sets carry no '##'
      // marker round-trip, so '#'-bearing corpus tokens stay unambiguous
      val (starts, conts) = graft.operators.WordPiece.vocabSets(
        Tables.documents(s, dir), "text", maxPieceLen = 6, topK = 128)
      graft.operators.WordPiece.segmentTyped(
        Tables.documents(s, dir)
          .select(concat(col("text"), lit(" zebra\u00a4tail")).as("text")),
        "text", starts, conts, maxPieceLen = 6)
    }),
    // Likelihood-scored WordPiece TRAINING (operators/WordPiece.train —
    // VERDICT r12 #4, the published algorithm): three greedy merges
    // maximizing freq(pair)/(freq(l)·freq(r)) over role-marked symbols,
    // each decision's integer evidence (pair count + both symbol
    // frequencies) pinned by the unrolled DuckDB replay.
    "t_wordpiece_train" -> ((s, dir) =>
      graft.operators.WordPiece.train(Tables.documents(s, dir), "text",
        nMerges = 3)),
    "t_unigram_seed" -> ((s, dir) =>
      graft.operators.Unigram.seedVocab(Tables.documents(s, dir), "text",
        maxPieceLen = 8, seedSize = 128)),
    // Viterbi segmentation under the FIXED prime-log table
    // (unigramFixedTable): tie-free by unique prime factorization, score
    // a fixed left-fold both engines replay bit-for-bit — the oracle
    // enumerates EVERY lattice path by recursive CTE and takes the same
    // argmax. Words with uncoverable chars (punctuation — table covers
    // [a-z0-9]) drop on both sides; ≤12-char cap bounds the oracle's
    // path enumeration.
    "t_unigram_segment" -> ((s, dir) => {
      val words = graft.operators.Unigram
        .wordCounts(Tables.documents(s, dir), "text")
        .filter(length(col("word")) <= 12).select("word")
      graft.operators.Unigram.segmentWords(words, "word",
        unigramFixedTable, maxPieceLen = 2)
    }),
    // Full EM training — rows-only with derived invariants (the
    // unigramTrainValid scaladoc has the why).
    "t_unigram_train_valid" -> ((s, dir) => unigramTrainValid(s, dir)),
    // Unigram-LM scoring (operators/LanguageModel.scala): the CCNet-style
    // statistical quality signal. Train on the even-doc_id half (odd docs
    // then carry genuinely unseen tokens through the add-one floor),
    // score everything. Per-doc log-prob sums are term-ordered LEFT FOLDS
    // (aggregate over sort_array here, list_reduce over list(ORDER BY) in
    // DuckDB) — never sum(), whose re-association is engine-dependent.
    "t_lm_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      LanguageModel.unigramScore(
        docs.filter(col("doc_id") % 2 === 0), docs, "doc_id", "text")
    }),
    // CCNet head/middle/tail slices: exact NTILE(3) over descending
    // avg_logprob through the scale-safe rank machinery (Ranking
    // .ntileExact — no single-partition exchange; PlanAuditSpec class).
    "t_lm_buckets" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      LanguageModel.perplexityBuckets(
        docs.filter(col("doc_id") % 2 === 0), docs, "doc_id", "text")
    }),
    // DSIR importance weights: per-doc log-likelihood ratio of an
    // English-target unigram model over the whole-corpus source model,
    // both smoothed over the SHARED union vocabulary.
    "t_dsir_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "text")
      LanguageModel.dsirWeights(
        docs.filter(col("lang") === "en"), docs, docs, "doc_id", "text")
    }),
    // Bigram LM with Stupid Backoff (Brants et al. 2007): conditional
    // bigram scores backing off to the add-one unigram floor at α = 0.4.
    // Same train/score split as t_lm_score, same sorted-fold determinism
    // contract — the oracle replays the whole model in DuckDB.
    "t_lm_bigram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      LanguageModel.bigramScore(
        docs.filter(col("doc_id") % 2 === 0), docs, "doc_id", "text")
    }),
    // PII detection + redaction (functions/Pii.scala): plant emails /
    // phones / SSNs / IPv4s derived from doc_id (the oracle replants the
    // identical strings), then count per category on the raw text and
    // redact with tag replacements — the whole pass, including every
    // redacted string, hash-compares. Patterns live in the Java∩RE2
    // regex subset, so both engines match identically.
    "t_pii_redact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" call 555-010-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" id 123-45-6789")).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" host 10.0.0."), (col("doc_id") % 256).cast("string")))
          .otherwise(lit(""))).as("text"))
      planted.select(col("doc_id") +:
        graft.functions.Pii.annotations(col("text"))
          .map { case (n, c) => c.as(n) }: _*)
    }),
    // Repetition filters (Text.repetitionStats — the Gopher/MassiveText
    // repetition quality signals): plant a doubled twin of every document
    // (text \n text — two identical lines, every 2-gram count doubled),
    // so planted rows must show dup_line_frac = 0.5 and dup_ngram_frac
    // near 1 while originals keep their natural repetition; the whole
    // stats pass is hash-compared against the DuckDB transcription.
    "t_repetition" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val doubled = docs.select((col("doc_id") + PlantedOffset).as("doc_id"),
        concat(col("text"), lit("\n"), col("text")).as("text"))
      Text.repetitionStats(docs.unionByName(doubled), "doc_id", "text")
        .withColumn("repetitive",
          col("dup_line_frac") >= 0.3 || col("top_ngram_char_frac") >= 0.2)
    }),
    // Corpus n-gram statistics: global top-k trigrams — explode shingles,
    // one count aggregation (map-side combined), TakeOrdered for the k.
    // The corpus-frequency pass every dataset-curation pipeline starts with.
    "t_top_ngrams" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(Text.tokens(col("text")).as("__toks"))
        .select(explode(Text.shinglesFromTokens(col("__toks"), 3)).as("ngram"))
        .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("ngram"))
        .limit(20)),
    // Term statistics (the TF-IDF join, kept integer-exact): per-document
    // term frequency joined with corpus document frequency. One explode +
    // two aggregations + an equi-join on the term; the float idf multiply
    // is a trivial projection on top and deliberately left out of the
    // oracle (libm log differs across engines in the last ulp).
    "t_term_stats" -> ((s, dir) => termStats(s, dir)),
    // Keyword extraction: top-3 terms per document by the DETERMINISTIC
    // (tf DESC, df ASC, term) lexicographic order — highest in-document
    // frequency, rarest in corpus, integer-exact end to end. The float
    // tf·idf score is deliberately not part of the contract (libm log is
    // engine-dependent in the last ulp — t_term_stats stance); this
    // ordering is the hash-stable keyword heuristic layered on the SAME
    // termStats frames. Per-doc window after the (doc, term) aggregation:
    // partition-parallel, no global sort.
    "t_keywords" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      termStats(s, dir)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    }),
    // Frequent terms via the Misra–Gries sketch (custom typed Aggregator,
    // functions/FrequentItems.scala): ≤ k-1 counters per partition instead
    // of the full distinct-term shuffle — the 100 TB heavy-hitters path.
    // Which light items survive is order-dependent, so the oracle pins the
    // GUARANTEED part only: every term with exact count > N/k must be in
    // the summary (inner join — a miss drops the row and fails the row
    // count) with its estimate inside [exact - N/k, exact].
    "t_frequent_terms" -> ((s, dir) => {
      import s.implicits._
      val k = 200
      val toks = Tables.documents(s, dir)
        .select(explode(Text.tokens(lower(col("text")))).as("term"))
      val summary = toks.select(col("term")).as[String]
        .select(graft.functions.FrequentItems.sketch(k).name("summary"))
        .select(explode(col("summary")).as(Seq("term", "est")))
      val exact = toks.groupBy("term").agg(count(lit(1)).as("n_exact"))
      val total = toks.count()
      exact.filter(col("n_exact") > total / k.toLong)
        .join(summary, "term")
        .select(col("term"), col("n_exact"),
          (col("est") <= col("n_exact") &&
            col("est") >= col("n_exact") - lit(total / k.toLong + 1))
            .as("est_within_bounds"))
    }),
    // Count-min point frequencies (functions/CountMin.scala): probe the
    // English stopword list against a CMS over every corpus token. The
    // oracle pins the GUARANTEED contract only (t_frequent_terms stance):
    // est ≥ exact always (CMS never undercounts), and ≤ exact + ε·N —
    // δ-probable in general, a fixed deterministic fact for this
    // data + seed. The collected sketch is O(d·w) counters, not data.
    "t_cms_counts" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(Text.tokens(lower(col("text")))).as("term"))
      val probes = Text.stopwords("en")
      val est = graft.functions.CountMin.pointEstimates(toks, "term", probes)
      val exact = toks.filter(col("term").isin(probes: _*))
        .groupBy("term").agg(count(lit(1)).as("__n"))
      val epsBound = (toks.count() * 0.001).toLong + 1
      est.join(exact, Seq("term"), "left")
        .select(col("term"),
          coalesce(col("__n"), lit(0L)).as("n_exact"),
          (col("est") >= coalesce(col("__n"), lit(0L)) &&
            col("est") <= coalesce(col("__n"), lit(0L)) + lit(epsBound))
            .as("est_within_bounds"))
    }),
    // FULLY-ORACLED document fingerprint (formerly rows-only): the
    // portable md5-derived rolling fold — DuckDB replays every rotate
    // and xor. The xxhash64 fold stays pinned by t_fingerprint_dups.
    "t_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Text.fingerprintPortable(col("text")).as("fingerprint"))),
    // Cross-document boilerplate fraction (Dedup.boilerplateStats):
    // docs < 100 get planted exact copies, so their every 8-gram is
    // shared (frac 1.0) while original prose stays near 0 — the whole
    // report hash-compares.
    "t_boilerplate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.unionByName(
        exactCopy(docs.filter(col("doc_id") < 100), PlantedOffset))
      Dedup.boilerplateStats(corpus, "doc_id", "text")
    }),
    // Inverted-index build (Retrieval.invertedIndex): term → doc-sorted
    // posting list serialized flat ("id:tf,…"), df/total_tf exact;
    // stopword-grade terms (df > 400) dropped by a count-first pass so
    // no posting buffer ever holds most of the corpus.
    "t_inverted_index" -> ((s, dir) =>
      graft.operators.Retrieval.invertedIndex(
        Tables.documents(s, dir), "doc_id", "text", maxDf = 400L)),
    // Sliding-window chunking (Text.chunk): 200-char windows every 150
    // chars — the context-window splitter, whole output (offsets AND
    // chunk text) hash-compared against the oracle's generate_series +
    // substr replay.
    "t_chunks" -> ((s, dir) =>
      Text.chunk(Tables.documents(s, dir), "doc_id", "text", 200, 150)),
    // Fingerprint invariants over a planted corpus (VERDICT r03 #1): an
    // exact copy (id + 1M) must share its original's fingerprint; a
    // suffix-mutated copy (id + 2M) must differ (the fold is
    // order-sensitive and collision-resistant at 64 bits). One fingerprint
    // pass over the whole union, then two self-joins on the shifted ids.
    "t_fingerprint_dups" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs
        .unionByName(exactCopy(docs, PlantedOffset))
        .unionByName(mutatedCopy(docs, PlantedOffset2))
      val fps = corpus.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      val o = fps.filter(col("doc_id") < PlantedOffset)
      val ex = fps.filter(col("doc_id") >= PlantedOffset && col("doc_id") < PlantedOffset2)
        .select((col("doc_id") - PlantedOffset).as("doc_id"), col("fp").as("fp_exact"))
      val mu = fps.filter(col("doc_id") >= PlantedOffset2)
        .select((col("doc_id") - PlantedOffset2).as("doc_id"), col("fp").as("fp_mut"))
      o.join(ex, "doc_id").join(mu, "doc_id")
        .select(col("doc_id"),
          (col("fp") === col("fp_exact")).as("exact_dup_same"),
          (col("fp") =!= col("fp_mut")).as("mutated_differs"))
    }),
    // Semantic eval-set decontamination (Similarity.semanticDecontam —
    // the embedding-space sibling of t_contamination's n-gram overlap):
    // bench = the vec_id % 41 slice (13 vectors — metadata-grade, as a
    // real benchmark suite is), corpus = the rest UNION planted
    // near-copies of every bench vector (scaled 1.0000001, offset ids —
    // the embeddingNearDuplicates planting), so the contaminated flag
    // provably bites on exactly the planted rows. Broadcast bench, one
    // corpus pass, max-of-struct argmax; the oracle replays the planting
    // and takes the same (sim DESC, bench_id) argmax by row_number.
    "t_decontam_semantic" -> ((s, dir) => {
      val e = embDouble(s, dir).select(col("vec_id"), col("emb_d"))
      val bench = e.filter(col("vec_id") % 41 === 0)
        .select(col("vec_id").as("bench_id"), col("emb_d").as("bench_vec"))
      val corpus = e.filter(col("vec_id") % 41 =!= 0)
        .unionByName(bench.select(
          (col("bench_id") + PlantedOffset).as("vec_id"),
          transform(col("bench_vec"), x => x * 1.0000001d).as("emb_d")))
      Similarity.semanticDecontam(corpus, bench, tau = 0.9,
        cId = "vec_id", cVec = "emb_d")
    }))

  val oracleSql: Map[String, String] = Map(

    // the planted truth the converged classifier must reproduce exactly
    "t_quality_train" ->
      "SELECT doc_id, doc_id % 2 = 1 AS predicted FROM documents",
    "t_boilerplate" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 100),
         toks AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS ts FROM corpus),
         g AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(ts) - 7, 1)),
                 i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3],
                                ts[i+4], ts[i+5], ts[i+6], ts[i+7])))) AS gram
               FROM toks),
         dfg AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
         per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
         sh AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
                FROM g JOIN dfg USING (gram) GROUP BY 1)
         SELECT per.doc_id, per.n_grams,
                COALESCE(sh.n_shared, 0) AS n_shared,
                round(CAST(COALESCE(sh.n_shared, 0) AS DOUBLE) / per.n_grams, 6) AS shared_frac
         FROM per LEFT JOIN sh USING (doc_id)""",
    "t_inverted_index" ->
      s"""WITH t AS (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS term FROM documents),
         tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM t GROUP BY 1, 2),
         kept AS (SELECT term FROM tf GROUP BY term HAVING COUNT(*) <= 400)
         SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                CAST(SUM(tf) AS BIGINT) AS total_tf,
                string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
         FROM tf JOIN kept USING (term) GROUP BY term""",
    "t_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len
           FROM documents WHERE length(text) > 0),
         c AS (SELECT doc_id, text,
                 unnest(generate_series(0, (len - 1) // 150)) AS chunk_id
               FROM d)
         SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                CAST(chunk_id * 150 + 1 AS BIGINT) AS chunk_start,
                substr(text, CAST(chunk_id * 150 + 1 AS INTEGER), 200) AS chunk_text
         FROM c""",
    // decontamination: the whole pass transcribed — same planted corpus,
    // same lowercase tokens, same 8-gram windows (concat_ws skips
    // out-of-range NULLs exactly like Spark's capped slice), same
    // distinct-then-count overlap
    "t_contamination" ->
      s"""WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 10),
         corpus AS (SELECT doc_id, text FROM documents WHERE doc_id >= 10
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text || ' tail pad tokens' AS text FROM bench),
         btoks AS (SELECT ${sqlTokens("lower(text)")} AS ts FROM bench),
         bgrams AS (SELECT DISTINCT unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(ts) - 7, 1)),
             i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3],
                            ts[i+4], ts[i+5], ts[i+6], ts[i+7])))) AS gram
           FROM btoks),
         ctoks AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS ts FROM corpus),
         cgrams AS (SELECT doc_id, unnest(list_distinct(list_transform(
             generate_series(1, greatest(len(ts) - 7, 1)),
             i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2], ts[i+3],
                            ts[i+4], ts[i+5], ts[i+6], ts[i+7])))) AS gram
           FROM ctoks),
         ov AS (SELECT doc_id, COUNT(*) AS overlap_ngrams
           FROM cgrams JOIN bgrams USING (gram) GROUP BY 1)
         SELECT c.doc_id,
                COALESCE(ov.overlap_ngrams, 0) AS overlap_ngrams,
                COALESCE(ov.overlap_ngrams, 0) >= 1 AS contaminated
         FROM corpus c LEFT JOIN ov ON c.doc_id = ov.doc_id""",

    // BM25: the Spark expression tree transcribed operator-for-operator
    // (exact ints; one double division for avgdl; fixed-order term sum;
    // rank by rounded score) — see Retrieval.bm25TopK's scaladoc
    "t_bm25_topk" ->
      s"""WITH base AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS toks FROM documents),
         lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM base),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS term FROM base)
                WHERE term IN ('spark', 'scan') GROUP BY 1, 2),
         stats AS (SELECT COUNT(*) AS n, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avgdl FROM lens),
         dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         parts AS (SELECT tf.doc_id, tf.term,
             ln((n - df + 0.5) / (df + 0.5) + 1)
               * (tf * (1.2 + 1))
               / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl)) AS part
           FROM tf JOIN dft USING (term) JOIN lens ON tf.doc_id = lens.doc_id
           CROSS JOIN stats),
         piv AS (SELECT doc_id,
             COALESCE(MAX(CASE WHEN term = 'spark' THEN part END), 0.0)
               + COALESCE(MAX(CASE WHEN term = 'scan' THEN part END), 0.0) AS s
           FROM parts GROUP BY 1)
         SELECT CAST(row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS INT) AS rank,
                doc_id, round(s, 6) AS score
         FROM piv WHERE round(s, 6) > 0
         ORDER BY rank LIMIT 20""",
    // both retrieval legs replayed by their own oracled constructions,
    // then the rank-based fusion: two exact reciprocals, fixed-order sum
    "t_hybrid_rrf" ->
      s"""WITH base AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS toks FROM documents),
         lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS len FROM base),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS term FROM base)
                WHERE term IN ('spark', 'scan') GROUP BY 1, 2),
         stats AS (SELECT COUNT(*) AS n, CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avgdl FROM lens),
         dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         parts AS (SELECT tf.doc_id, tf.term,
             ln((n - df + 0.5) / (df + 0.5) + 1)
               * (tf * (1.2 + 1))
               / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avgdl)) AS part
           FROM tf JOIN dft USING (term) JOIN lens ON tf.doc_id = lens.doc_id
           CROSS JOIN stats),
         piv AS (SELECT doc_id,
             COALESCE(MAX(CASE WHEN term = 'spark' THEN part END), 0.0)
               + COALESCE(MAX(CASE WHEN term = 'scan' THEN part END), 0.0) AS s
           FROM parts GROUP BY 1),
         la AS (SELECT CAST(row_number() OVER (ORDER BY round(s, 6) DESC, doc_id) AS INT) AS rank_a,
                       doc_id
                FROM piv WHERE round(s, 6) > 0
                ORDER BY rank_a LIMIT 20),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT v AS q_vec FROM e WHERE vec_id = 0),
         sc AS (SELECT e.vec_id, ${sqlCosine("q_vec", "v")} AS sim FROM e CROSS JOIN q),
         lb AS (SELECT CAST(rank_b AS INT) AS rank_b, vec_id AS doc_id FROM
                 (SELECT vec_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS rank_b FROM sc)
                WHERE rank_b <= 20),
         f AS (SELECT COALESCE(la.doc_id, lb.doc_id) AS doc_id,
                 la.rank_a, lb.rank_b,
                 round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + la.rank_a), CAST(0.0 AS DOUBLE))
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + lb.rank_b), CAST(0.0 AS DOUBLE)), 6) AS rrf_score
               FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id)
         SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rank,
                doc_id, rrf_score, rank_a, rank_b
         FROM f ORDER BY rank LIMIT 10""",
    // idf = ln(N/df); per-doc norm as the term-ORDERED fold of squared
    // weights; dot in fixed query-term order; one division of the rounded
    // report — the Spark expression tree transcribed operator-for-operator
    "t_tfidf_topk" ->
      s"""WITH base AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS toks FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS term FROM base)
                GROUP BY 1, 2),
         stats AS (SELECT COUNT(*) AS n FROM base),
         dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         weighted AS (SELECT tf.doc_id, tf.term,
             tf.tf * ln(CAST(n AS DOUBLE) / df) AS w,
             ln(CAST(n AS DOUBLE) / df) AS idf
           FROM tf JOIN dft USING (term) CROSS JOIN stats),
         norms AS (SELECT doc_id,
             sqrt(list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE), list(w * w ORDER BY term)),
               (acc, x) -> acc + x)) AS dnorm
           FROM weighted GROUP BY doc_id),
         qidf AS (SELECT term, ln(CAST(n AS DOUBLE) / df) AS idf
                  FROM dft CROSS JOIN stats
                  WHERE term IN ('spark', 'scan')),
         qn AS (SELECT sqrt(
             COALESCE(MAX(CASE WHEN term = 'spark' THEN idf * idf END), 0.0)
               + COALESCE(MAX(CASE WHEN term = 'scan' THEN idf * idf END), 0.0))
             AS qnorm FROM qidf),
         piv AS (SELECT doc_id,
             COALESCE(MAX(CASE WHEN term = 'spark' THEN w * idf END), 0.0)
               + COALESCE(MAX(CASE WHEN term = 'scan' THEN w * idf END), 0.0) AS dot
           FROM weighted WHERE term IN ('spark', 'scan') GROUP BY 1),
         scored AS (SELECT p.doc_id,
             round(p.dot / (q.qnorm * nm.dnorm), 6) AS score
           FROM piv p JOIN norms nm USING (doc_id) CROSS JOIN qn q)
         SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
                doc_id, score
         FROM scored WHERE score > 0
         ORDER BY rank LIMIT 20""",
    "t_fingerprint_dups" ->
      "SELECT doc_id, true AS exact_dup_same, true AS mutated_differs FROM documents",
    // the portable rolling fingerprint replayed fold step by fold step:
    // rotate-left-5 within 60 bits, xor the md5-derived token hash
    "t_fingerprint" ->
      s"""WITH toks AS (SELECT doc_id, ${sqlTokens("text")} AS ts FROM documents)
         SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(ts,
                 t -> CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT))),
             (acc, h) -> xor(((acc & 36028797018963967) << 5) | (acc >> 55), h))
             AS fingerprint
         FROM toks""",
    "t_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, ${sqlTokens("text")} AS ts FROM documents),
         st AS (SELECT doc_id,
           CAST(len(ts) AS BIGINT) AS n_tokens,
           CAST(len(text) AS BIGINT) AS n_chars_measured,
           round(CASE WHEN len(ts) > 0 THEN CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE) / len(ts) ELSE 0.0 END, 6) AS mean_token_len,
           round(CASE WHEN len(text) > 0 THEN CAST(len(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / len(text) ELSE 0.0 END, 6) AS punct_ratio,
           round(CASE WHEN len(ts) > 0 THEN CAST(len(list_filter(ts, x -> list_contains($enOracleList, x))) AS DOUBLE) / len(ts) ELSE 0.0 END, 6) AS stopword_ratio
         FROM t)
         SELECT *, (n_tokens >= 5 AND n_tokens <= 1000000
                AND mean_token_len >= 2 AND mean_token_len <= 15
                AND punct_ratio < 0.3 AND stopword_ratio > 0.01) AS quality_ok
         FROM st""",
    // the identical mess built with chr(), the identical regex chain over
    // DuckDB's nfc_normalize (classes spelled out — Java \s and RE2 \s
    // disagree on \x0B, Normalize.scaladoc)
    "t_normalize" ->
      s"""WITH m AS (SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN 'Cafe'||chr(769)||chr(160)||'du'||chr(8195)||'monde  '||chr(9)||chr(13)||chr(10)||chr(7)||text||'  '
                ELSE text END AS raw FROM documents),
         n AS (SELECT doc_id, raw,
           trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             nfc_normalize(raw),
             '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g'),
             '[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]', ' ', 'g'),
             '[ \\t]+', ' ', 'g'),
             ' ?\\n ?', chr(10), 'g')) AS norm_text FROM m)
         SELECT doc_id, norm_text, (norm_text != raw) AS changed,
           CAST(len(raw) AS BIGINT) AS n_chars_raw,
           CAST(len(norm_text) AS BIGINT) AS n_chars_norm FROM n""",
    // the same tokenize + per-position window walk, per phrase length
    "t_c4_blocklist" ->
      s"""WITH pages AS (SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' buy cheap pills now'
                WHEN doc_id % 11 = 0 THEN 'GAMBLINGSPAM ' || text || ' gamblingspam'
                ELSE text END AS page FROM documents),
         toks AS (SELECT doc_id, ${sqlTokens("lower(page)")} AS ts FROM pages),
         ph(pg, pn) AS (SELECT * FROM (VALUES ('buy cheap pills', 3), ('gamblingspam', 1))),
         pos AS (SELECT doc_id, ts, i FROM toks, unnest(range(1, len(ts) + 1)) AS ui(i)),
         hits AS (SELECT doc_id, COUNT(*) AS n
                  FROM pos JOIN ph ON array_to_string(ts[CAST(i AS INTEGER) : CAST(i + pn - 1 AS INTEGER)], ' ') = pg
                  GROUP BY 1)
         SELECT p.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_hits,
                COALESCE(h.n, 0) > 0 AS blocked
         FROM pages p LEFT JOIN hits h USING (doc_id)""",
    "t_c4_lines" ->
      s"""WITH $sqlPagedCtes,
         l AS (SELECT doc_id, page, string_split(page, chr(10)) AS lines FROM pages),
         k AS (SELECT doc_id, page, lines,
           list_filter(lines, x -> regexp_matches(trim(x), '[.!?"]$$')
             AND len(regexp_split_to_array(trim(x), ' +')) >= 5
             AND NOT contains(lower(x), 'javascript')) AS kept FROM l)
         SELECT doc_id, coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           (len(kept) >= 3 AND NOT contains(lower(page), 'lorem ipsum')
             AND NOT contains(page, '{')) AS doc_kept FROM k""",
    "t_line_dedup" ->
      s"""WITH $sqlPagedCtes,
         l AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM pages),
         k AS (SELECT doc_id, lines,
           list_filter(lines, (x, i) -> list_position(lines, x) = i) AS kept FROM l)
         SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(lines) - len(kept) AS BIGINT) AS n_dups_removed FROM k""",
    // URL front door: plantUrls + every urlCanonicalize step replayed
    // (RE2 side of the shared lookahead-free patterns; DuckDB's
    // first-match regexp_replace equals Spark's global replace here —
    // every pattern is end-anchored, so at most one match exists)
    "t_url_filter" ->
      """WITH d AS (SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END AS s,
           (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END) ||
           (CASE doc_id % 6 WHEN 0 THEN 'news.example.com'
              WHEN 1 THEN 'blog.example.org' WHEN 2 THEN 'spam.tracker.net'
              WHEN 3 THEN 'docs.example.com' WHEN 4 THEN 'ads.clickbait.io'
              ELSE 'shop.example.com' END) AS h
         FROM documents),
       u AS (SELECT doc_id,
           (CASE WHEN doc_id % 8 < 2 THEN upper(s) ELSE s END) || '://' ||
           (CASE WHEN doc_id % 10 = 0 THEN upper(h) ELSE h END) ||
           (CASE WHEN doc_id % 5 = 0 THEN
              (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
            ELSE '' END) ||
           '/p/' || CAST(doc_id % 10 AS VARCHAR) ||
           (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
           (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&ref=r' || CAST(doc_id % 7 AS VARCHAR)
                 WHEN doc_id % 4 = 2 THEN '?ref=r' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=x'
                 ELSE '' END) ||
           (CASE WHEN doc_id % 9 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END) AS url
         FROM d),
       c0 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nf FROM u),
       c1 AS (SELECT doc_id, url, nf,
                regexp_extract(nf, '^([A-Za-z]+://[^/?#]*)', 1) AS head FROM c0),
       c2 AS (SELECT doc_id, url,
                lower(head) || substring(nf, len(head) + 1) AS lo FROM c1),
       c3 AS (SELECT doc_id, url,
                regexp_replace(regexp_replace(lo,
                  '^(http://[^/:?]+):80([/?].*)?$', '\1\2'),
                  '^(https://[^/:?]+):443([/?].*)?$', '\1\2') AS np FROM c2),
       c4 AS (SELECT doc_id, url,
                regexp_replace(np, '^(https?://)www\.', '\1') AS nw FROM c3),
       c5 AS (SELECT doc_id, url,
                regexp_replace(regexp_replace(nw, '\?.*$', ''), '/$', '') AS base,
                list_filter(string_split(regexp_extract(nw, '\?(.*)$', 1), '&'),
                  p -> p <> '' AND NOT regexp_matches(p, '^utm_')) AS ps FROM c4),
       c6 AS (SELECT doc_id, url,
                CASE WHEN len(ps) = 0 THEN base
                     ELSE base || '?' || array_to_string(ps, '&') END AS canonical_url
              FROM c5),
       c7 AS (SELECT doc_id, url, canonical_url,
                regexp_extract(canonical_url, '^https?://([^/:?]+)', 1) AS domain FROM c6),
       c8 AS (SELECT doc_id, url, canonical_url, domain,
                (domain = 'tracker.net' OR ends_with(domain, '.tracker.net')
                 OR domain = 'ads.clickbait.io'
                 OR ends_with(domain, '.ads.clickbait.io')) AS domain_blocked FROM c7),
       c9 AS (SELECT *, CAST(row_number() OVER (
                PARTITION BY canonical_url, domain_blocked
                ORDER BY doc_id) AS BIGINT) AS url_rank FROM c8)
       SELECT doc_id, url, canonical_url, domain, domain_blocked, url_rank,
              (NOT domain_blocked AND url_rank = 1) AS url_kept FROM c9""",
    // parse → gate → strip: the is_html survivors' payloads through the
    // same five rewrite stages as t_html_strip
    "t_warc_strip" ->
      """WITH h AS (SELECT doc_id,
             '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' ||
             substring(text, 1, 120) || '</p></body></html>' AS html
           FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 5 <> 0),
         s1 AS (SELECT doc_id, html, regexp_replace(html,
             '(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>|(?s)<!--.*?-->',
             '', 'g') AS t FROM h),
         s2 AS (SELECT doc_id, html, regexp_replace(t,
             '</p>|</div>|</h[1-6]>|</li>|</title>|<br */?>', chr(10), 'g') AS t
           FROM s1),
         s3 AS (SELECT doc_id, html,
             regexp_replace(t, '<[^>]+>', '', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id, html,
             replace(replace(replace(replace(replace(replace(t,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
               '&nbsp;', ' '), '&amp;', '&') AS t FROM s3),
         s5 AS (SELECT doc_id, html, regexp_replace(regexp_replace(t,
             '[ \t]+', ' ', 'g'), ' *\n *', chr(10), 'g') AS t FROM s4),
         s6 AS (SELECT doc_id, html, array_to_string(
             list_filter(string_split(t, chr(10)), x -> x <> ''), chr(10))
             AS strip_text FROM s5)
         SELECT doc_id,
           regexp_extract(html, '(?s)<title>(.*?)</title>', 1) AS title,
           strip_text,
           CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags
         FROM s6""",
    // HTML strip: replant the page, then replay all five rewrite stages
    // ('g'-flagged — Spark regexp_replace is always global) and the raw
    // tag count
    "t_html_strip" ->
      """WITH h AS (SELECT doc_id,
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
       s1 AS (SELECT doc_id, html, regexp_replace(html,
           '(?s)<script[^>]*>.*?</script>|(?s)<style[^>]*>.*?</style>|(?s)<!--.*?-->',
           '', 'g') AS t FROM h),
       s2 AS (SELECT doc_id, html, regexp_replace(t,
           '</p>|</div>|</h[1-6]>|</li>|</title>|<br */?>', chr(10), 'g') AS t
         FROM s1),
       s3 AS (SELECT doc_id, html,
           regexp_replace(t, '<[^>]+>', '', 'g') AS t FROM s2),
       s4 AS (SELECT doc_id, html,
           replace(replace(replace(replace(replace(replace(t,
             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)),
             '&nbsp;', ' '), '&amp;', '&') AS t FROM s3),
       s5 AS (SELECT doc_id, html, regexp_replace(regexp_replace(t,
           '[ \t]+', ' ', 'g'), ' *\n *', chr(10), 'g') AS t FROM s4),
       s6 AS (SELECT doc_id, html, array_to_string(
           list_filter(string_split(t, chr(10)), x -> x <> ''), chr(10))
           AS strip_text FROM s5)
       SELECT doc_id,
         regexp_extract(html, '(?s)<title>(.*?)</title>', 1) AS title,
         strip_text,
         CAST(len(regexp_extract_all(html, '<[^>]+>')) AS BIGINT) AS n_tags
       FROM s6""",
    // Token entropy: the foldLogProbs contract — list_reduce over the
    // term-ordered count list pins the IEEE addition order
    "t_entropy_quality" ->
      s"""WITH t AS (SELECT doc_id,
             unnest(${sqlTokens("lower(text)")}) AS term FROM documents),
       c AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt
             FROM t GROUP BY doc_id, term),
       d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_toks,
             CAST(count(*) AS BIGINT) AS n_vocab,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(CAST(cnt AS DOUBLE) ORDER BY term)),
               (acc, x) -> acc + x * ln(x)) AS s
         FROM c GROUP BY doc_id)
       SELECT doc_id, n_toks, n_vocab,
         round(ln(CAST(n_toks AS DOUBLE)) - s / CAST(n_toks AS DOUBLE), 6)
           AS entropy,
         CASE WHEN n_vocab > 1 THEN
           round((ln(CAST(n_toks AS DOUBLE)) - s / CAST(n_toks AS DOUBLE))
             / ln(CAST(n_vocab AS DOUBLE)), 6) END AS entropy_ratio
       FROM d""",
    // DF drift: distinct-(doc, term) counts per cohort, smoothed
    // integer rate ratio, one ln
    "t_df_drift" ->
      s"""WITH ha AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
       hb AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
       ta AS (SELECT DISTINCT doc_id, term FROM
             (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS term FROM ha)),
       tb AS (SELECT DISTINCT doc_id, term FROM
             (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS term FROM hb)),
       da AS (SELECT term, CAST(count(*) AS BIGINT) AS df_a FROM ta GROUP BY term),
       db AS (SELECT term, CAST(count(*) AS BIGINT) AS df_b FROM tb GROUP BY term),
       j AS (SELECT coalesce(da.term, db.term) AS term,
             coalesce(df_a, 0) AS df_a, coalesce(df_b, 0) AS df_b
         FROM da FULL OUTER JOIN db ON da.term = db.term),
       f AS (SELECT * FROM j WHERE df_a + df_b >= 5),
       d AS (SELECT term, df_a, df_b,
             round(ln((CAST(df_a + 1 AS DOUBLE) *
                       CAST((SELECT count(*) + 2 FROM hb) AS DOUBLE)) /
                      (CAST(df_b + 1 AS DOUBLE) *
                       CAST((SELECT count(*) + 2 FROM ha) AS DOUBLE))), 6)
             AS drift FROM f)
       SELECT term, df_a, df_b, drift FROM d
       ORDER BY abs(drift) DESC, term LIMIT 50""",
    // Gate funnel: first-fail classification, scalar counts, per-stage
    // arithmetic over the aggregate
    "t_filter_funnel" ->
      s"""WITH u AS (SELECT doc_id, lang, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 9 = 0),
       d AS (SELECT doc_id, lang, ${sqlTokens("lower(text)")} AS ts,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         FROM u),
       f AS (SELECT (lang = 'en') AS g0, (rn = 1) AS g1,
             (len(ts) BETWEEN 20 AND 1000) AS g2,
             (CAST(len(list_distinct(ts)) AS BIGINT) * 10
                >= CAST(len(ts) AS BIGINT) * 3) AS g3 FROM d),
       x AS (SELECT CASE WHEN NOT g0 THEN 0 WHEN NOT g1 THEN 1
                         WHEN NOT g2 THEN 2 WHEN NOT g3 THEN 3
                         ELSE -1 END AS fail FROM f),
       a AS (SELECT CAST(count(*) AS BIGINT) AS total,
             CAST(count(*) FILTER (WHERE fail = 0) AS BIGINT) AS r0,
             CAST(count(*) FILTER (WHERE fail = 1) AS BIGINT) AS r1,
             CAST(count(*) FILTER (WHERE fail = 2) AS BIGINT) AS r2,
             CAST(count(*) FILTER (WHERE fail = 3) AS BIGINT) AS r3 FROM x),
       s AS (SELECT * FROM (VALUES
             (CAST(0 AS BIGINT), 'lang_en'), (1, 'exact_dup'),
             (2, 'length_band'), (3, 'lexical_diversity'))
             AS v(stage_idx, stage)),
       w AS (SELECT stage_idx, stage,
             total - (CASE WHEN stage_idx > 0 THEN r0 ELSE 0 END)
                   - (CASE WHEN stage_idx > 1 THEN r1 ELSE 0 END)
                   - (CASE WHEN stage_idx > 2 THEN r2 ELSE 0 END) AS n_in,
             CASE stage_idx WHEN 0 THEN r0 WHEN 1 THEN r1
                            WHEN 2 THEN r2 ELSE r3 END AS n_removed
         FROM a, s)
       SELECT stage_idx, stage, n_in, n_removed,
         n_in - n_removed AS n_out,
         CASE WHEN n_in > 0 THEN
           round(CAST(n_removed AS DOUBLE) / CAST(n_in AS DOUBLE), 6)
         END AS removal_frac
       FROM w""",
    // Zipf fit: term counts → top-64 → rank → four rank-ordered folds →
    // the identical slope/intercept expression trees
    "t_corpus_zipf" ->
      s"""WITH t AS (SELECT unnest(${sqlTokens("lower(text)")}) AS term
             FROM documents),
       c AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM t
             GROUP BY term ORDER BY cnt DESC, term LIMIT 64),
       r AS (SELECT term, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS rank
         FROM c),
       v AS (SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y FROM r),
       a AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(x ORDER BY rank)), (p, q) -> p + q) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(y ORDER BY rank)), (p, q) -> p + q) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(x * y ORDER BY rank)), (p, q) -> p + q) AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(x * x ORDER BY rank)), (p, q) -> p + q) AS sxx FROM v),
       b AS (SELECT n, sx, sy,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b FROM a)
       SELECT CAST(n AS BIGINT) AS n_terms, round(b, 6) AS slope,
              round((sy - b * sx) / n, 6) AS intercept FROM b""",
    // Per-source adaptive gate: percent_rank with the id tiebreak,
    // rounded like the operator
    "t_adaptive_quality" ->
      s"""WITH t AS (SELECT doc_id, source,
             ${sqlTokens("lower(text)")} AS ts FROM documents),
       d AS (SELECT doc_id, source, CAST(len(ts) AS BIGINT) AS n_toks,
             CAST(len(list_distinct(ts)) AS BIGINT) AS n_vocab FROM t)
       SELECT doc_id, source, n_toks, n_vocab,
         round(percent_rank() OVER (PARTITION BY source
           ORDER BY n_vocab, doc_id), 6) AS q_rank,
         (percent_rank() OVER (PARTITION BY source
           ORDER BY n_vocab, doc_id) >= 0.25) AS kept
       FROM d""",
    "t_gopher_report" ->
      s"""WITH $sqlPagedCtes,
         g AS (SELECT doc_id, page, string_split(page, chr(10)) AS lines,
                      ${sqlTokens("page")} AS ws FROM pages),
         m AS (SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           round(CASE WHEN len(ws) > 0 THEN CAST(list_sum(list_transform(ws, x -> len(x))) AS DOUBLE) / len(ws) ELSE 0.0 END, 6) AS mean_word_len,
           round(CASE WHEN len(ws) > 0 THEN CAST((len(page) - len(replace(page, '#', ''))) + (len(page) - len(replace(page, '...', ''))) // 3 AS DOUBLE) / len(ws) ELSE 0.0 END, 6) AS symbol_ratio,
           round(CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, x -> starts_with(x, '- ') OR starts_with(x, '* ') OR starts_with(x, '• '))) AS DOUBLE) / len(lines) ELSE 0.0 END, 6) AS bullet_line_frac,
           round(CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, x -> ends_with(x, '...'))) AS DOUBLE) / len(lines) ELSE 0.0 END, 6) AS ellipsis_line_frac,
           round(CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(ws) ELSE 0.0 END, 6) AS alpha_word_frac,
           CAST(len(list_filter($enOracleList, s -> list_contains(ws, s))) AS BIGINT) AS n_stop_present
         FROM g)
         SELECT *, (n_words BETWEEN 50 AND 100000) AS r_word_count,
           (mean_word_len >= 3 AND mean_word_len <= 10) AS r_mean_len,
           (symbol_ratio <= 0.1) AS r_symbol,
           (bullet_line_frac <= 0.9) AS r_bullet,
           (ellipsis_line_frac <= 0.3) AS r_ellipsis,
           (alpha_word_frac >= 0.8) AS r_alpha,
           (n_stop_present >= 2) AS r_stop,
           (r_word_count AND r_mean_len AND r_symbol AND r_bullet
             AND r_ellipsis AND r_alpha AND r_stop) AS gopher_ok FROM m""",
    "t_top_ngrams" ->
      s"""WITH toks AS (SELECT ${sqlTokens("text")} AS ts FROM documents),
         sh AS (SELECT list_transform(generate_series(1, greatest(len(ts) - 2, 1)),
                       i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])) AS sl
                FROM toks),
         e AS (SELECT unnest(sl) AS ngram FROM sh)
         SELECT ngram, COUNT(*) AS n FROM e
         GROUP BY 1 ORDER BY n DESC, ngram LIMIT 20""",
    "t_term_stats" ->
      s"""$sqlTermStatsCtes
         SELECT tf.doc_id, tf.term, tf.tf, df.df FROM tf JOIN df USING (term)""",
    "t_bpe_pairs" ->
      s"""WITH t AS (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM documents),
         v AS (SELECT w, COUNT(*) AS wn FROM t GROUP BY 1),
         p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                        i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, wn
               FROM v WHERE len(w) >= 2)
         SELECT pair, CAST(SUM(wn) AS BIGINT) AS n FROM p
         GROUP BY 1 ORDER BY n DESC, pair LIMIT 30""",
    // unigram-LM scoring: the per-doc sum is list_reduce over
    // list(lp ORDER BY w) — the same left fold, in the same term order,
    // as the Spark side's aggregate over sort_array (LanguageModel's
    // determinism contract); residual divergence is the last-ulp ln
    "t_lm_score" ->
      s"""$sqlLmScoreCtes
         SELECT * FROM scored""",
    "t_lm_buckets" ->
      s"""$sqlLmScoreCtes
         SELECT doc_id, n_tokens, avg_logprob, ppl,
                CAST(ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS INTEGER) AS ppl_bucket
         FROM scored WHERE n_tokens > 0""",
    // full BPE loop: every merge decision pinned (b0/b1/b2), then the
    // segmented vocabulary after all three
    "t_bpe_train" ->
      s"""$sqlBpeTrainCtes
         SELECT 1 AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count FROM b0
         UNION ALL SELECT 2, l, r, cnt FROM b1
         UNION ALL SELECT 3, l, r, cnt FROM b2""",
    // the deep run's first three decisions — greedy is prefix-stable, so
    // the 256-merge loop must answer the 3-merge replay verbatim (over
    // the same vocabulary-rich corpus)
    "t_bpe_train256" ->
      s"""${sqlBpeTrainCtesFor(sqlBpeRichRel)}
         SELECT 1 AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count FROM b0
         UNION ALL SELECT 2, l, r, cnt FROM b1
         UNION ALL SELECT 3, l, r, cnt FROM b2""",
    // planted-truth shape of the deep run: the full depth was reached and
    // every chosen pair existed (count >= 1)
    "t_bpe_train256_shape" ->
      "SELECT CAST(256 AS BIGINT) AS n_merges, true AS counts_positive",
    // unigram seed vocab: the substring-explode counting replayed
    // verbatim (generate_series(1, 0) is [] in DuckDB, so the too-short
    // guard is implicit in the comprehension bounds)
    // sentence split: replant the prose, replay mark-split-index
    "t_sentences" ->
      s"""WITH pr0 AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS ts FROM documents),
         pr1 AS (SELECT doc_id, array_to_string(
             list_transform(generate_series(0, (len(ts) + 5) // 6 - 1), i ->
               array_to_string(list_slice(ts, i * 6 + 1, i * 6 + 6), ' ')
               || ['.', '!', '?'][CAST((doc_id + i) % 3 AS INTEGER) + 1]), ' ') AS prose
           FROM pr0 WHERE len(ts) > 0),
         mk AS (SELECT doc_id,
             regexp_replace(prose, '([.!?]+)\\s+', '\\1' || chr(1), 'g') AS m
           FROM pr1),
         sp AS (SELECT doc_id, string_split(m, chr(1)) AS parts FROM mk),
         ex AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx,
                  parts[i] AS sentence
                FROM sp, unnest(generate_series(1, len(parts))) AS u(i))
         SELECT doc_id, sent_idx, sentence,
           CAST(len(${sqlTokens("sentence")}) AS BIGINT) AS n_tokens
         FROM ex WHERE len(sentence) > 0""",
    // the same sentence base, then the greedy budget fold as a recursive
    // CTE (state = open-chunk tokens + chunk id, stepping seq by seq)
    "t_chunks_sentences" ->
      s"""WITH RECURSIVE pr0 AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS ts FROM documents),
         pr1 AS (SELECT doc_id, array_to_string(
             list_transform(generate_series(0, (len(ts) + 5) // 6 - 1), i ->
               array_to_string(list_slice(ts, i * 6 + 1, i * 6 + 6), ' ')
               || ['.', '!', '?'][CAST((doc_id + i) % 3 AS INTEGER) + 1]), ' ') AS prose
           FROM pr0 WHERE len(ts) > 0),
         mk AS (SELECT doc_id,
             regexp_replace(prose, '([.!?]+)\\s+', '\\1' || chr(1), 'g') AS m
           FROM pr1),
         sp AS (SELECT doc_id, string_split(m, chr(1)) AS parts FROM mk),
         ex AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_idx,
                  parts[i] AS sentence
                FROM sp, unnest(generate_series(1, len(parts))) AS u(i)),
         sn AS (SELECT doc_id, sentence,
                  CAST(len(${sqlTokens("sentence")}) AS BIGINT) AS n_tokens,
                  row_number() OVER (PARTITION BY doc_id ORDER BY sent_idx) AS seq
                FROM ex WHERE len(sentence) > 0),
         st(doc_id, seq, cur, cid) AS (
           SELECT doc_id, seq, n_tokens, 0 FROM sn WHERE seq = 1
           UNION ALL
           SELECT s.doc_id, s.seq,
             CASE WHEN st.cur + s.n_tokens > 20 AND st.cur > 0
                  THEN s.n_tokens ELSE st.cur + s.n_tokens END,
             CASE WHEN st.cur + s.n_tokens > 20 AND st.cur > 0
                  THEN st.cid + 1 ELSE st.cid END
           FROM st JOIN sn s ON s.doc_id = st.doc_id AND s.seq = st.seq + 1)
         SELECT sn.doc_id, CAST(st.cid AS INT) AS chunk_id,
                CAST(COUNT(*) AS BIGINT) AS n_sentences,
                CAST(SUM(sn.n_tokens) AS BIGINT) AS n_tokens,
                string_agg(sn.sentence, ' ' ORDER BY sn.seq) AS chunk_text
         FROM sn JOIN st ON st.doc_id = sn.doc_id AND st.seq = sn.seq
         GROUP BY 1, 2""",
    // likelihood-scored WordPiece training: every merge decision
    // replayed (argmax of cnt/(fl·fr) per round, the same IEEE double
    // both engines divide), integer evidence columns only
    "t_wordpiece_train" ->
      s"""$sqlWordPieceTrainCtes
         SELECT 1 AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count,
                fl AS freq_l, fr AS freq_r FROM b0
         UNION ALL SELECT 2, l, r, cnt, fl, fr FROM b1
         UNION ALL SELECT 3, l, r, cnt, fl, fr FROM b2""",
    // WordPiece vocab: the seedVocab replay at (6, 128) + ## doubling
    "t_wordpiece_vocab" ->
      s"""WITH $sqlWordPieceVocabCtes
         SELECT piece, weight FROM wp
         UNION ALL SELECT '##' || piece AS piece, weight FROM wp""",
    // WordPiece segmentation: best (longest) piece per (word, pos) as a
    // window argmax, then the greedy chain followed by recursive CTE;
    // words whose chain never completes (the planted \u00a4 word) are
    // [UNK]
    "t_wordpiece_segment" ->
      s"""WITH RECURSIVE $sqlWordPieceVocabCtes,
         ew AS (SELECT unnest(${sqlTokens("lower(text || ' zebra\u00a4tail')")}) AS word FROM documents),
         ec AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wn FROM ew GROUP BY 1),
         positions AS (SELECT word, CAST(i AS INTEGER) AS pos
                       FROM ec, unnest(generate_series(1, len(word))) AS ui(i)),
         mt AS (SELECT p.word, p.pos, wp.piece, len(wp.piece) AS pl
                FROM positions p
                JOIN wp ON substring(p.word, p.pos, len(wp.piece)) = wp.piece),
         best AS (SELECT word, pos, piece, pl FROM (
                    SELECT word, pos, piece, pl,
                           row_number() OVER (PARTITION BY word, pos
                             ORDER BY pl DESC) AS rn
                    FROM mt) WHERE rn = 1),
         chain AS (
           SELECT word, 1 AS pos, CAST('' AS VARCHAR) AS pieces, 0 AS np
           FROM ec
           UNION ALL
           SELECT c.word, c.pos + b.pl,
                  c.pieces || CASE WHEN c.pos = 1 THEN '' ELSE ' ##' END || b.piece,
                  c.np + 1
           FROM chain c JOIN best b ON b.word = c.word AND b.pos = c.pos
           WHERE c.pos <= len(c.word)),
         done AS (SELECT word, pieces, np FROM chain WHERE pos = len(word) + 1)
         SELECT ec.word, ec.wn AS n_occurrences,
                COALESCE(d.pieces, '[UNK]') AS pieces,
                CAST(COALESCE(d.np, 1) AS INTEGER) AS n_pieces,
                (d.pieces IS NULL) AS has_unk
         FROM ec LEFT JOIN done d USING (word)""",
    "t_unigram_seed" ->
      s"""WITH w AS (SELECT unnest(${sqlTokens("lower(text)")}) AS word FROM documents),
         wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w GROUP BY 1),
         subs AS (SELECT unnest(flatten([[substring(word, i, L) for i in generate_series(1, len(word) - L + 1)] for L in generate_series(2, 8) if len(word) >= L])) AS piece, cnt FROM wc),
         multi AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS weight FROM subs GROUP BY 1 ORDER BY weight DESC, piece LIMIT 128),
         sing AS (SELECT unnest([substring(word, i, 1) for i in generate_series(1, len(word))]) AS piece, cnt FROM wc),
         sgrp AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS weight FROM sing GROUP BY 1)
         SELECT piece, weight FROM multi UNION ALL SELECT piece, weight FROM sgrp""",
    // Viterbi under the fixed prime-log table: exhaustive lattice-path
    // enumeration (recursive CTE), same left-fold score accumulation in
    // path order, same (score desc, fewer pieces, lex path) argmax
    "t_unigram_segment" ->
      s"""$sqlUnigramSegCtes
         SELECT word, pieces, n_pieces, score FROM useg""",
    // EM training: literal structural truth (unigramTrainValid computes
    // the flags from the actual model; emIters 3 + the post-prune pass)
    "t_unigram_train_valid" ->
      """SELECT CAST(4 AS BIGINT) AS ll_len, true AS ll_nondecreasing,
                true AS singles_covered, true AS vocab_bounded,
                true AS probs_normalized""",
    // encode: train on documents, apply the 3 learned merges fold-by-fold
    // to the rich corpus's vocabulary
    "t_bpe_encode" ->
      s"""${sqlBpeTrainCtesFor("documents")},
         n0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wn
                FROM (SELECT unnest(${sqlTokens("lower(text)")}) AS w
                      FROM $sqlBpeRichRel) GROUP BY 1),
         n0s AS (SELECT w, wn,
                  list_transform(generate_series(1, len(w)),
                    i -> substr(w, CAST(i AS INTEGER), 1)) AS syms FROM n0),
         ${sqlBpeApplyCte("n0s", "n1", 0)},
         ${sqlBpeApplyCte("n1", "n2", 1)},
         ${sqlBpeApplyCte("n2", "n3", 2)}
         SELECT w AS word, wn AS n_occurrences,
                array_to_string(syms, ' ') AS pieces,
                CAST(len(syms) AS INTEGER) AS n_pieces
         FROM n3""",
    "t_bpe_segment" ->
      s"""$sqlBpeTrainCtes
         SELECT w AS word, wn AS n_occurrences,
                array_to_string(syms, ' ') AS pieces,
                CAST(len(syms) AS INTEGER) AS n_pieces
         FROM w3""",
    // byte-grain training decisions replayed verbatim (hex-pair alphabet)
    "t_bpe_bytes" ->
      s"""${sqlBpeTrainCtesFor(sqlBpeBytesRel, byteGrain = true)}
         SELECT 1 AS merge_rank, l AS lhs, r AS rhs, cnt AS pair_count FROM b0
         UNION ALL SELECT 2, l, r, cnt FROM b1
         UNION ALL SELECT 3, l, r, cnt FROM b2""",
    // byte-grain segmentation + the lossless round-trip reconstruction
    "t_bpe_bytes_segment" ->
      s"""${sqlBpeTrainCtesFor(sqlBpeBytesRel, byteGrain = true)}
         SELECT w AS word, wn AS n_occurrences,
                array_to_string(syms, ' ') AS pieces,
                CAST(len(syms) AS INTEGER) AS n_pieces,
                decode(unhex(array_to_string(syms, ''))) AS word_rt
         FROM w3""",
    // byte encode: train on documents at byte grain, apply the 3 merges
    // fold-by-fold to the unseen ü-corpus vocabulary
    "t_bpe_bytes_encode" ->
      s"""${sqlBpeTrainCtesFor("documents", byteGrain = true)},
         n0 AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS wn
                FROM (SELECT unnest(${sqlTokens("lower(text)")}) AS w
                      FROM $sqlBpeBytesRel) GROUP BY 1),
         n0s AS (SELECT w, wn,
                  regexp_extract_all(hex(encode(w)), '[0-9A-F]{2}') AS syms
                 FROM n0),
         ${sqlBpeApplyCte("n0s", "n1", 0)},
         ${sqlBpeApplyCte("n1", "n2", 1)},
         ${sqlBpeApplyCte("n2", "n3", 2)}
         SELECT w AS word, wn AS n_occurrences,
                array_to_string(syms, ' ') AS pieces,
                CAST(len(syms) AS INTEGER) AS n_pieces
         FROM n3""",
    // PMI associations: every stage replayed — distinct grain, df band,
    // per-doc rarest-16 cap (same (df ASC, term) window), pair join,
    // one ln per pair, rounded-score ordering with full tie-break
    "t_pmi_cooc" ->
      s"""WITH tok AS (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS term FROM documents),
         dt AS (SELECT DISTINCT doc_id, term FROM tok),
         dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         vocab AS (SELECT term, df FROM dfq WHERE df >= 2 AND df <= 1000000),
         rn AS (SELECT dt.doc_id, dt.term,
                  row_number() OVER (PARTITION BY dt.doc_id
                    ORDER BY vocab.df ASC, dt.term) AS rn
                FROM dt JOIN vocab USING (term)),
         capped AS (SELECT doc_id, term FROM rn WHERE rn <= 16),
         p AS (SELECT a.term AS w1, b.term AS w2, CAST(COUNT(*) AS BIGINT) AS co_df
               FROM capped a JOIN capped b
                 ON a.doc_id = b.doc_id AND a.term < b.term
               GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         d AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
         SELECT w1, w2, co_df, fa.df AS df1, fb.df AS df2,
                round(ln(CAST(co_df * n_docs AS DOUBLE) /
                         CAST(fa.df * fb.df AS DOUBLE)), 6) AS pmi
         FROM p JOIN vocab fa ON p.w1 = fa.term
                JOIN vocab fb ON p.w2 = fb.term
                CROSS JOIN d
         ORDER BY pmi DESC, w1, w2 LIMIT 100""",
    // bigram Stupid Backoff: the CASE replays S(w2|w1) literally — exact
    // bigram branch c2/c1(w1), else α times the add-one unigram floor;
    // per-doc sum is the same (w1, w2)-ordered left fold as t_lm_score
    "t_lm_bigram" ->
      s"""WITH tr AS (SELECT ${sqlTokens("lower(text)")} AS ts FROM documents WHERE doc_id % 2 = 0),
         trbg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
                  FROM tr, unnest(range(1, len(ts))) AS u(i)),
         c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM trbg GROUP BY 1, 2),
         trw AS (SELECT unnest(ts) AS w FROM tr),
         c1 AS (SELECT w, COUNT(*) AS c FROM trw GROUP BY 1),
         s AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM c1),
         tok AS (SELECT doc_id, ${sqlTokens("lower(text)")} AS ts FROM documents),
         bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
                FROM tok, unnest(range(1, len(ts))) AS u(i)),
         tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
         lp AS (SELECT doc_id, w1, w2, tf,
                  CAST(tf AS DOUBLE) * ln(CASE WHEN c2.c2 IS NOT NULL
                      THEN CAST(c2.c2 AS DOUBLE) / CAST(cp.c AS DOUBLE)
                      ELSE CAST(0.4 AS DOUBLE) *
                           CAST(coalesce(cw.c, 0) + 1 AS DOUBLE) /
                           CAST(s.n + s.v AS DOUBLE) END) AS lp
                FROM tf LEFT JOIN c2 USING (w1, w2)
                     LEFT JOIN c1 cp ON tf.w1 = cp.w
                     LEFT JOIN c1 cw ON tf.w2 = cw.w
                     CROSS JOIN s),
         pd AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lp ORDER BY w1, w2)),
                    (a, b) -> a + b) AS lsum
                FROM lp GROUP BY 1)
         SELECT d.doc_id, coalesce(pd.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams,
                round(pd.lsum / pd.n_bigrams, 6) AS avg_logprob,
                round(exp(-(pd.lsum / pd.n_bigrams)), 6) AS ppl
         FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)""",
    "t_dsir_weights" ->
      s"""WITH tgt AS (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM documents WHERE lang = 'en'),
         src AS (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM documents),
         ctab AS (SELECT w, COUNT(*) AS c_t FROM tgt GROUP BY 1),
         cstab AS (SELECT w, COUNT(*) AS c_s FROM src GROUP BY 1),
         vocab AS (SELECT coalesce(ctab.w, cstab.w) AS w,
                     coalesce(c_t, 0) AS c_t, coalesce(c_s, 0) AS c_s
                   FROM ctab FULL OUTER JOIN cstab ON ctab.w = cstab.w),
         s AS (SELECT CAST(SUM(c_t) AS BIGINT) AS nt, CAST(SUM(c_s) AS BIGINT) AS ns,
                 COUNT(*) AS v FROM vocab),
         tok AS (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS w FROM documents),
         tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         lp AS (SELECT doc_id, w, tf,
                  CAST(tf AS DOUBLE) *
                    (ln(CAST(coalesce(vocab.c_t, 0) + 1 AS DOUBLE) / CAST(s.nt + s.v AS DOUBLE))
                   - ln(CAST(coalesce(vocab.c_s, 0) + 1 AS DOUBLE) / CAST(s.ns + s.v AS DOUBLE))) AS lp
                FROM tf LEFT JOIN vocab USING (w) CROSS JOIN s),
         pd AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lp ORDER BY w)),
                    (a, b) -> a + b) AS lsum
                FROM lp GROUP BY 1)
         SELECT d.doc_id, coalesce(pd.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
                round(pd.lsum, 6) AS log_weight
         FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)""",
    // the CMS contract rows: exact count per probe, true bound flags
    "t_cms_counts" ->
      s"""WITH t AS (SELECT unnest(${sqlTokens("lower(text)")}) AS term FROM documents),
         c AS (SELECT term, COUNT(*) AS n FROM t GROUP BY 1),
         p AS (SELECT unnest($enOracleList) AS term)
         SELECT p.term, CAST(coalesce(c.n, 0) AS BIGINT) AS n_exact,
                true AS est_within_bounds
         FROM p LEFT JOIN c USING (term)""",
    // only the sketch's GUARANTEED content is pinned: the exact heavy set
    // with true bound flags (see the query comment)
    "t_frequent_terms" ->
      s"""WITH t AS (SELECT unnest(${sqlTokens("lower(text)")}) AS term FROM documents),
         c AS (SELECT term, COUNT(*) AS n_exact FROM t GROUP BY 1),
         tot AS (SELECT COUNT(*) AS n FROM t)
         SELECT term, n_exact, true AS est_within_bounds
         FROM c, tot WHERE n_exact > n // 200""",
    "t_keywords" ->
      s"""$sqlTermStatsCtes,
         r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rank
               FROM tf JOIN df USING (term))
         SELECT doc_id, term, tf, df, CAST(rank AS INTEGER) AS rank
         FROM r WHERE rank <= 3""",
    "t_bpe_tokens" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS bpe_tokens
         FROM documents""",
    "t_tokenizer_fertility" ->
      s"""WITH d AS (SELECT source,
                CAST(length(text) AS BIGINT) AS chars,
                CAST(len(${sqlTokens("text")}) AS BIGINT) AS words,
                CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS pieces
              FROM documents)
         SELECT source, COUNT(*) AS n_docs,
                CAST(SUM(chars) AS BIGINT) AS chars,
                CAST(SUM(words) AS BIGINT) AS words,
                CAST(SUM(pieces) AS BIGINT) AS bpe_pieces,
                round(CAST(SUM(pieces) AS DOUBLE) / SUM(words), 6) AS pieces_per_word,
                round(CAST(SUM(chars) AS DOUBLE) / SUM(pieces), 6) AS chars_per_piece
         FROM d GROUP BY source""",
    // the planted truth the converged NB model must reproduce exactly
    // (the t_quality_train stance)
    "t_lang_id_trained" ->
      """SELECT doc_id, CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN 'de' WHEN 1 THEN 'en' WHEN 2 THEN 'es' ELSE 'fr'
         END AS lang_pred FROM documents""",
    "t_lang_id" ->
      s"""WITH t AS (SELECT doc_id, text, ${sqlTokens("lower(text)")} AS ts FROM documents),
         h AS (SELECT doc_id, text,
                 len(list_filter(ts, x -> list_contains($enOracleList, x))) AS h_en,
                 len(list_filter(ts, x -> list_contains(['der','die','das','und','ist','nicht','ein','eine','mit','von','zu','den','dem','auf','für','im','sich','auch'], x))) AS h_de,
                 len(list_filter(ts, x -> list_contains(['el','la','los','las','de','que','y','en','un','una','es','no','por','con','para','del','se','su'], x))) AS h_es,
                 len(list_filter(ts, x -> list_contains(['le','la','les','de','des','et','un','une','est','dans','que','pour','qui','sur','pas','au','du','ce'], x))) AS h_fr
               FROM t)
         SELECT doc_id, CASE
           WHEN regexp_matches(text, '[\\x{3040}-\\x{30ff}]') THEN 'ja'
           WHEN regexp_matches(text, '[\\x{ac00}-\\x{d7af}]') THEN 'ko'
           WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
           WHEN greatest(h_en, h_de, h_es, h_fr) >= 1 THEN
             CASE WHEN h_fr = greatest(h_en, h_de, h_es, h_fr) THEN 'fr'
                  WHEN h_es = greatest(h_en, h_de, h_es, h_fr) THEN 'es'
                  WHEN h_en = greatest(h_en, h_de, h_es, h_fr) THEN 'en'
                  ELSE 'de' END
           ELSE 'und' END AS lang_pred
         FROM h""",
    // PII: identical planted strings, identical Java∩RE2 patterns,
    // counts on the raw text, replacement order email→ip→ssn→phone
    "t_pii_redact" ->
      """WITH planted AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             || CASE WHEN doc_id % 3 = 0 THEN ' call 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN ' id 123-45-6789' ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN ' host 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE '' END AS text
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ssn,
           CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted
         FROM planted""",
    // repetition filters: same planted doubled twins, same \s+ tokens
    // (the \n joining the halves is whitespace on both engines), same
    // 2-gram construction as the Spark side, ties toward the larger gram
    "t_repetition" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text || chr(10) || text AS text FROM documents),
         lines AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM corpus),
         lc AS (SELECT doc_id, line, COUNT(*) AS c FROM lines GROUP BY 1, 2),
         lstats AS (SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_lines,
             CAST(SUM(c - 1) AS BIGINT) AS dup_lines,
             CAST(SUM(c * len(line)) AS BIGINT) AS line_chars,
             CAST(SUM((c - 1) * len(line)) AS BIGINT) AS dup_line_chars
           FROM lc GROUP BY 1),
         toks AS (SELECT doc_id, ${sqlTokens("text")} AS ts FROM corpus),
         grams AS (SELECT doc_id, unnest(list_transform(
             generate_series(1, greatest(len(ts) - 1, 1)),
             i -> concat_ws(' ', ts[i], ts[i+1]))) AS gram FROM toks),
         gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2),
         gtop AS (SELECT doc_id, gram AS top_ngram, c AS top_c FROM (
             SELECT doc_id, gram, c, row_number() OVER (PARTITION BY doc_id
                 ORDER BY c DESC, gram DESC) AS rn FROM gc) WHERE rn = 1),
         gmass AS (SELECT doc_id,
             CAST(SUM(c * len(gram)) AS BIGINT) AS gram_mass,
             CAST(SUM(CASE WHEN c >= 2 THEN c * len(gram) ELSE 0 END) AS BIGINT) AS dup_gram_mass
           FROM gc GROUP BY 1)
         SELECT c.doc_id, l.n_lines,
           round(CASE WHEN l.n_lines > 0 THEN CAST(l.dup_lines AS DOUBLE) / l.n_lines ELSE 0.0 END, 6) AS dup_line_frac,
           round(CASE WHEN l.line_chars > 0 THEN CAST(l.dup_line_chars AS DOUBLE) / l.line_chars ELSE 0.0 END, 6) AS dup_line_char_frac,
           t.top_ngram,
           round(CASE WHEN len(c.text) > 0 THEN CAST(t.top_c * len(t.top_ngram) AS DOUBLE) / len(c.text) ELSE 0.0 END, 6) AS top_ngram_char_frac,
           round(CASE WHEN m.gram_mass > 0 THEN CAST(m.dup_gram_mass AS DOUBLE) / m.gram_mass ELSE 0.0 END, 6) AS dup_ngram_frac,
           (round(CASE WHEN l.n_lines > 0 THEN CAST(l.dup_lines AS DOUBLE) / l.n_lines ELSE 0.0 END, 6) >= 0.3
            OR round(CASE WHEN len(c.text) > 0 THEN CAST(t.top_c * len(t.top_ngram) AS DOUBLE) / len(c.text) ELSE 0.0 END, 6) >= 0.2) AS repetitive
         FROM corpus c
         JOIN lstats l USING (doc_id) JOIN gtop t USING (doc_id) JOIN gmass m USING (doc_id)""",
    "t_decontam_semantic" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         bench AS (SELECT vec_id AS bench_id, v AS bv FROM e WHERE vec_id % 41 = 0),
         corpus AS (SELECT vec_id, v FROM e WHERE vec_id % 41 != 0
                    UNION ALL
                    SELECT bench_id + 1000000, list_transform(bv, x -> x * 1.0000001)
                    FROM bench),
         s AS (SELECT c.vec_id, b.bench_id, ${sqlCosine("c.v", "b.bv")} AS sim
               FROM corpus c CROSS JOIN bench b),
         top AS (SELECT vec_id, bench_id, sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, bench_id) AS rn
                 FROM s)
         SELECT vec_id, bench_id, round(sim, 6) AS sim, sim >= 0.9 AS contaminated
         FROM top WHERE rn = 1""")
}

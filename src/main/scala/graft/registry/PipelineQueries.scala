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

/** The Pipeline slice of the SparkEntry registry — end-to-end curation DAGs and the crawl front door.
  * Entries are verbatim from the pre-split SparkEntry (VERDICT r11 #8);
  * SparkEntry merges every slice into the driver-contract maps.
  */
private[graft] object PipelineQueries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Crawl-archive front door (operators/Crawl.scala): the planted WET
    // blobs (8 files, records concatenated in id order, length-delimited
    // bodies) parsed back to per-document rows — split + regexp_extract
    // + substring projections only, no join/agg. The oracle rebuilds the
    // identical blobs with ordered string_agg and replays the parse,
    // including the `len_ok` framing re-check.
    // UTF-8 audit (Crawl.utf8Audit — the byte-hygiene pass ahead of any
    // text column): 512 planted byte records mixing ASCII runs, valid
    // 2-/3-byte sequences, lone continuations, an overlong 0xC0 0xAF
    // pair, and a truncated trailing lead — every count closed-form by
    // construction, so one wrong RFC 3629 branch shifts a column.
    "src_utf8_audit" -> ((s, dir) => {
      import s.implicits._
      val blobs = s.range(512).map { id =>
        val a = (20 + id % 13).toInt
        val buf = Array.newBuilder[Byte]
        (0 until a).foreach(i => buf += ('A' + i % 26).toByte)
        (0 until (id % 3).toInt).foreach { _ =>
          buf += 0xC3.toByte; buf += 0xA9.toByte // é
        }
        (0 until (id % 2).toInt).foreach { _ =>
          buf += 0xE2.toByte; buf += 0x82.toByte; buf += 0xAC.toByte // €
        }
        (0 until (id % 4).toInt).foreach(_ => buf += 0x80.toByte) // lone cont
        if (id % 5 == 0) { buf += 0xC0.toByte; buf += 0xAF.toByte } // overlong
        if (id % 7 == 0) buf += 0xC3.toByte // truncated lead at EOF
        (id, buf.result())
      }.toDF("doc_id", "content")
      graft.operators.Crawl.utf8Audit(blobs)
    }),
    // HTTP chunked Transfer-Encoding (Crawl.dechunkHttp): documents
    // wire-framed at 3..9-byte chunk sizes with a planted `;ext` on
    // every 3rd record, then de-chunked by the RFC 9112 walk; chunk
    // counts, body lengths, and body md5 all closed-form (ASCII corpus:
    // bytes == chars).
    "src_http_dechunk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val wire = graft.operators.Crawl.chunkHttp(docs, "doc_id", "text",
        kCol = lit(3) + col("doc_id") % 7, extCol = col("doc_id") % 3 === 0)
      graft.operators.Crawl.dechunkHttp(wire)
    }),
    "src_wet_parse" -> ((s, dir) =>
      graft.operators.Crawl.wetParse(
        graft.operators.Crawl.plantWet(
          Tables.documents(s, dir), "doc_id", "text"))),
    // robots.txt politeness gate — the step a crawler runs BEFORE any
    // fetch: parse planted per-domain rulesets (Allow/Disallow lines,
    // noise skipped, the empty-Disallow no-op dropped), then gate a
    // planted frontier by Google's longest-match semantics (Allow beats
    // Disallow at equal length; no rule → allowed). Rules broadcast,
    // verdict one max-of-struct aggregation per URL.
    "src_robots_gate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.Crawl.robotsGate(
        graft.operators.Crawl.plantFrontier(docs, "doc_id"),
        graft.operators.Crawl.robotsParse(
          graft.operators.Crawl.plantRobots(docs, "doc_id")))
    }),
    // ... and the politeness fetch SCHEDULE over the gated frontier:
    // per-domain slots fresh-first, spaced by each host's own
    // Crawl-delay (varied 1..3 in the planted rulesets) — the plan a
    // crawl coordinator hands its fetchers. Domain-partitioned window,
    // broadcast delay table.
    "pipeline_fetch_plan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val robots = graft.operators.Crawl.plantRobots(docs, "doc_id")
      val discovered = graft.operators.Crawl.sitemapParse(
        graft.operators.Crawl.plantSitemap(docs, "doc_id"))
        .withColumn("entry_id",
          regexp_extract(col("loc"), "([0-9]+)$", 1).cast("long"))
      val gated = graft.operators.Crawl.robotsGate(
        discovered.select(col("entry_id"), col("loc")),
        graft.operators.Crawl.robotsParse(robots),
        idCol = "entry_id", urlCol = "loc")
        .join(discovered.select("entry_id", "lastmod"), Seq("entry_id"))
      graft.operators.Crawl.fetchPlan(gated,
        graft.operators.Crawl.crawlDelays(robots))
    }),
    // ... and the AUTHORITY-WEIGHTED schedule (VERDICT r12 #5): the same
    // gated frontier slotted by rank × staleness instead of freshness
    // alone, rank = 3 damped integer PageRank iterations over a planted
    // hub-and-spoke link graph (every entry ↔ its domain hub, so hubs
    // carry real authority). The oracle replays the rank iteration
    // unrolled (the g_pagerank pattern) AND the priority window.
    "pipeline_fetch_priority" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val robots = graft.operators.Crawl.plantRobots(docs, "doc_id")
      val discovered = graft.operators.Crawl.sitemapParse(
        graft.operators.Crawl.plantSitemap(docs, "doc_id"))
        .withColumn("entry_id",
          regexp_extract(col("loc"), "([0-9]+)$", 1).cast("long"))
      val gated = graft.operators.Crawl.robotsGate(
        discovered.select(col("entry_id"), col("loc")),
        graft.operators.Crawl.robotsParse(robots),
        idCol = "entry_id", urlCol = "loc")
        .join(discovered.select("entry_id", "lastmod"), Seq("entry_id"))
      // links exist regardless of robots verdicts: graph over ALL
      // discovered entries, plan over the allowed ones
      val spokes = discovered
        .select(col("entry_id").as("src"),
          (col("entry_id") - col("entry_id") % 100).as("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = spokes.unionByName(
        spokes.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Crawl.fetchPlanPrioritized(gated,
        graft.operators.Crawl.crawlDelays(robots),
        graft.operators.Graph.pageRankFixed(edges, "src", "dst", iters = 3),
        asOf = "2026-02-01")
    }),
    // ... and the freshness decision: the allowed frontier against a
    // planted fetch log (every even entry fetched 2026-01-04) — unseen
    // entries fetch, lastmod-newer entries refetch, the rest skip.
    "pipeline_recrawl" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val discovered = graft.operators.Crawl.sitemapParse(
        graft.operators.Crawl.plantSitemap(docs, "doc_id"))
        .withColumn("entry_id",
          regexp_extract(col("loc"), "([0-9]+)$", 1).cast("long"))
      val gated = graft.operators.Crawl.robotsGate(
        discovered.select(col("entry_id"), col("loc")),
        graft.operators.Crawl.robotsParse(
          graft.operators.Crawl.plantRobots(docs, "doc_id")),
        idCol = "entry_id", urlCol = "loc")
        .filter(col("allowed"))
        .join(discovered.select("entry_id", "lastmod"), Seq("entry_id"))
      graft.operators.Crawl.recrawlPlan(
        gated.select("entry_id", "loc", "lastmod"),
        discovered.filter(col("entry_id") % 2 === 0)
          .select(col("loc"), lit("2026-01-04").as("fetched_at")))
        .select("entry_id", "loc", "lastmod", "fetched_at", "refetch", "reason")
    }),
    // sitemap discovery: planted per-domain urlsets parsed to
    // (domain, loc, lastmod) — one explode + two regexps, shuffle-free
    "src_sitemap_parse" -> ((s, dir) =>
      graft.operators.Crawl.sitemapParse(
        graft.operators.Crawl.plantSitemap(
          Tables.documents(s, dir), "doc_id"))),
    // the crawl DISCOVERY pipeline composed: sitemap-discovered URLs
    // through the robots politeness gate — per URL the fetch verdict
    // plus the freshness stamp a scheduler would key on. Entry ids ride
    // in the planted path, so the composition keys without hashing.
    "pipeline_frontier" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val discovered = graft.operators.Crawl.sitemapParse(
        graft.operators.Crawl.plantSitemap(docs, "doc_id"))
        .withColumn("entry_id",
          regexp_extract(col("loc"), "([0-9]+)$", 1).cast("long"))
      val gated = graft.operators.Crawl.robotsGate(
        discovered.select(col("entry_id"), col("loc")),
        graft.operators.Crawl.robotsParse(
          graft.operators.Crawl.plantRobots(docs, "doc_id")),
        idCol = "entry_id", urlCol = "loc")
      gated.join(discovered.select("entry_id", "lastmod"), Seq("entry_id"))
    }),
    // The BYTE-DOMAIN front door (VERDICT r11 #1): same corpus, framed by
    // UTF-8 byte count and shipped as real multi-member .wet.gz (one
    // deflate member per record, the Common Crawl layout); inflate +
    // byte-walk behind the Codecs boundary. On this all-ASCII corpus
    // byte and char framing coincide, so the gz parse must answer
    // src_wet_parse's oracle VERBATIM — a framing or inflate bug
    // anywhere and the hashes split.
    "src_wet_parse_gz" -> ((s, dir) =>
      graft.operators.Crawl.wetParseBytes(
        graft.operators.Crawl.plantWetBytes(
          Tables.documents(s, dir), "doc_id", "text", gzipRecords = true),
        gz = true)),
    // Non-ASCII byte framing (VERDICT r11 #3): every body gets a
    // multi-byte prefix, so Content-Length (UTF-8 BYTES) exceeds the
    // char count and only a byte-sliced parse round-trips with
    // len_ok = true — the char-counting parser would misframe every
    // record. The oracle states the closed form per document,
    // octet_length(encode(...)) supplying the byte count.
    "src_wet_bytes" -> ((s, dir) =>
      graft.operators.Crawl.wetParseBytes(
        graft.operators.Crawl.plantWetBytes(
          Tables.documents(s, dir).select(col("doc_id"),
            concat(lit("héllo → "), col("text")).as("text")),
          "doc_id", "text"))),
    // Full WARC RESPONSE parse (VERDICT r11 #7): response records carry
    // an HTTP payload — status line, headers, body. The parser slices
    // the record length-delimited, then parses the HTTP layer, pulling
    // Content-Type from the HEADER SECTION only (a body mentioning
    // "Content-Type:" cannot spoof the gate). is_html = status 200 AND
    // text/html — the fetch gate ahead of htmlStrip. Oracle states the
    // planted closed form per document.
    "src_warc_parse" -> ((s, dir) =>
      graft.operators.Crawl.warcParse(
        graft.operators.Crawl.plantWarc(
          Tables.documents(s, dir), "doc_id", "text"))),
    // .warc.zst ingest (VERDICT r15 missing #5, the stretch goal): the
    // SAME planted archive shipped as one zstd frame per file (FOREIGN
    // zstd-jni encoder), decoded by the from-scratch RFC 8878 decoder
    // (FSE, Huffman, sequences, checksums), parsed by the same WARC
    // walk — must answer src_warc_parse's oracle VERBATIM.
    "src_warc_parse_zst" -> ((s, dir) =>
      graft.operators.Crawl.warcParseZst(
        graft.operators.Crawl.plantWarcZst(
          Tables.documents(s, dir), "doc_id", "text"))),
    // the WRITE half (round 17): the same archive framed by the
    // engine's OWN store-mode zstd encoder (Zstd.compressStore — raw/RLE
    // blocks, single-segment header, XXH64 checksum; zstd-jni decodes
    // every emitted frame in ZstdSpec, the foreign conformance pin),
    // then re-ingested through the from-scratch decoder — write → read
    // must answer src_warc_parse's oracle VERBATIM.
    "src_warc_write_zst" -> ((s, dir) =>
      graft.operators.Crawl.warcParseZst(
        graft.operators.Crawl.plantWarcZstStore(
          Tables.documents(s, dir), "doc_id", "text"))),
    // ...and the FULL Common Crawl layout: a leading skippable frame
    // carrying a per-file TRAINED dictionary, every record its own frame
    // compressed against it (preloaded entropy tables, starting repeat
    // offsets, window-prefix matches). Same verbatim oracle again.
    "src_warc_parse_zstdict" -> ((s, dir) =>
      graft.operators.Crawl.warcParseZstDict(
        graft.operators.Crawl.plantWarcZstDict(
          Tables.documents(s, dir), "doc_id", "text"))),
    // Deterministic training-shard shuffle (operators/Shards.scala):
    // md5-seeded permutation + ntileExact sharding + in-shard sequence
    // numbers — the scale-safe rank machinery, never a global window.
    // DuckDB replays md5/ntile/row_number verbatim (both engines emit
    // lowercase-hex MD5 and remainder-to-first-buckets NTILE).
    "pipeline_shard_shuffle" -> ((s, dir) =>
      graft.operators.Shards.shardShuffle(
        Tables.documents(s, dir).select("doc_id"), "doc_id",
        nShards = 16, seed = "r11")),
    // Token-budget greedy selection: ship the highest-vocabulary
    // documents until 10k tokens are on the stream (Pack.packSequences
    // prefix sums under (n_vocab DESC, doc_id) order). Integer score —
    // no float ordering anywhere; the oracle is one window cumsum.
    "pipeline_token_budget" -> ((s, dir) =>
      graft.operators.Shards.tokenBudgetSelect(
        docTokenVocab(Tables.documents(s, dir)),
        "doc_id", "n_toks", "n_vocab", budget = 10000L)),
    // Rendezvous (HRW) sharding at 16 AND 17 shards in one shuffle-free
    // projection: per-row md5 weight arrays, argmax by array_max +
    // array_position. The `moved` column exhibits the consistent-hashing
    // contract (ShardsSpec pins that every moved row lands in the NEW
    // shard); the oracle replays both assignments with list_aggregate.
    "pipeline_shard_rendezvous" -> ((s, dir) => {
      val d16 = graft.operators.Shards.rendezvousShard(
        Tables.documents(s, dir).select("doc_id"), "doc_id", 16, "r11")
        .withColumnRenamed("shard", "shard16")
        .withColumnRenamed("rdv_weight", "w16")
      graft.operators.Shards.rendezvousShard(d16, "doc_id", 17, "r11")
        .withColumnRenamed("shard", "shard17")
        .withColumnRenamed("rdv_weight", "w17")
        .withColumn("moved", col("shard16") =!= col("shard17"))
        .select("doc_id", "shard16", "w16", "shard17", "w17", "moved")
    }),
    // END-TO-END selection-and-shipping tail: per-source adaptive gate →
    // token-budget selection → deterministic shard shuffle, composed
    // over the same integer/md5 arithmetic each stage proved alone — the
    // "pick the best 8k tokens fairly across sources and lay them into
    // balanced shards" recipe as ONE lineage. The oracle chains the
    // three stages' CTEs.
    "pipeline_select_and_shard" -> ((s, dir) => {
      val gated = graft.operators.Shards.adaptiveQualityGate(
          docTokenVocab(Tables.documents(s, dir)),
          "source", "doc_id", "n_vocab", q = 0.25)
        .filter(col("kept")).drop("q_rank", "kept")
      val chosen = graft.operators.Shards.tokenBudgetSelect(
          gated, "doc_id", "n_toks", "n_vocab", budget = 8000L)
        .filter(col("kept")).drop("kept", "cut")
      graft.operators.Shards.shardShuffle(chosen, "doc_id",
        nShards = 8, seed = "r11e2e")
        .select("doc_id", "source", "n_toks", "n_vocab", "cum_before",
          "shuffle_key", "shard", "seq_in_shard")
    }),
    // EPOCH PLAN (Sampling.epochPlan): the data-recipe arithmetic for an
    // over-budget mixture — "how many passes of each source does this
    // recipe need": 200k-token budget over the four sources makes the
    // large-weight sources multi-epoch and the small-weight one
    // fractional. Integer div/mod + one rounded division, O(domains) out.
    "pipeline_epoch_plan" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"),
        Text.bpeTokenCount(col("text")).as("bpe_tokens"))
      Sampling.epochPlan(docs, "source", "bpe_tokens", budget = 200000L,
        weights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
          "src3" -> 0.1))
    }),
    // TEMPERATURE mixture (Sampling.temperatureQuotas): source shares ∝
    // token-mass^0.5 — the mT5 flattening recipe. alpha = 0.5 keeps the
    // power a sqrt (IEEE-exact in both engines); the normalizing sum is
    // an exact decimal sum of 15-decimal powers, so combine order cannot
    // move a digit of the published weight.
    "pipeline_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("source"),
        Text.bpeTokenCount(col("text")).as("bpe_tokens"))
      Sampling.temperatureQuotas(docs, "source", "bpe_tokens",
        budget = 200000L, alpha = 0.5)
    }),
    // CURRICULUM packing: the same distributed prefix-sum packer, ordered
    // by self-trained perplexity ASCENDING (cleanest-text-first — the
    // curriculum-learning layout) instead of doc_id. packSequences'
    // `order` parameter is the whole feature: any total order lays the
    // corpus out without new machinery, and the rounded ppl + doc_id
    // tie-break keep the order engine-stable under the oracle.
    "pipeline_pack_curriculum" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val scored = graft.operators.LanguageModel
        .unigramScore(docs, docs, "doc_id", "text")
        .filter(col("ppl").isNotNull).select("doc_id", "ppl")
      val withTok = docs.select(col("doc_id"),
          Text.bpeTokenCount(col("text")).as("n_tokens"))
        .join(scored, Seq("doc_id"))
      Pack.packSequences(withTok, "doc_id", "n_tokens", 256L,
          Seq(col("ppl"), col("doc_id")))
        .select("doc_id", "n_tokens", "ppl", "start_token", "seq_first",
          "seq_last", "offset_in_seq")
    }),

    // ---- pipeline orchestration (§7.1: validate → gate → transform) ----
    "pipeline_kpis" -> ((s, dir) => {
      // Gate on the orders rules: the synthetic lineitem legitimately
      // violates the duplicate-key rule (v_rules_lineitem reports it), and
      // a failed gate stops the transform — exactly the DAG's semantics.
      val res = Pipeline.run(s,
        TestdataAdapter.orders(s, dir),
        TestdataAdapter.orderItems(s, dir),
        TestdataAdapter.products(s, dir),
        Seq((Tables.orders(s, dir), cfgOrders)),
        persistJoin = false)
      res.categoryKpis.getOrElse(s.emptyDataFrame)
    }),
    // End-to-end corpus preparation (§7.5 in ONE query): planted-dup
    // corpus → exact dedup → language ID → quality gate → per-language
    // corpus stats. The four stages every pretraining curation run
    // chains, composed from the same operators the suite verifies
    // individually. Scale shape: the dedup is one digest-partitioned
    // window pass (single scan, single exchange — see
    // Dedup.keepCanonical), the annotations are pure codegen'd
    // expressions, and the final rollup is one map-side-combined
    // aggregation on a low-cardinality key. Integer-only output keeps it
    // hash-exact under the oracle.
    "pipeline_corpus_prep" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.unionByName(
        exactCopy(docs.filter(col("doc_id") % 5 === 0), PlantedOffset))
      val deduped = Dedup.keepCanonical(corpus, "doc_id", "text")
      Text.analyzed(deduped).filter(col("quality_ok"))
        .groupBy(col("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("bpe_tokens")).as("total_bpe_tokens"))
    }),
    // END-TO-END curation (pipeline/Pipeline.curate): exact dedup →
    // quality gate → language filter → self-trained perplexity gate →
    // mixture quota fill → sequence packing, each stage the
    // already-oracled operator, composed — the "run the whole corpus
    // pipeline on this library" call. The packed layout and the funnel
    // report both hash-compare against a stage-by-stage DuckDB replay.
    "pipeline_curate" -> ((s, dir) =>
      curationOf(s, dir).packed
        .select("doc_id", "n_tokens", "start_token", "seq_first",
          "seq_last", "offset_in_seq")),
    // The WHOLE crawl-to-corpus DAG as ONE lineage (VERDICT r12 #2 —
    // docs/CRAWL.md proved the way pipeline_select_and_shard proved the
    // shipping tail): planted HTML pages → robots longest-match gate →
    // real multi-member .wet.gz planting → byte-domain parse → five-stage
    // htmlStrip → content mirrors → exact dedup → quality gate → language
    // filter → self-trained perplexity gate → mixture quotas → 256-token
    // packing. Every stage is the already-oracled operator, composed; the
    // oracle replays the chain stage by stage (sqlCrawlCorpusCtes feeding
    // the sqlCurateCtesFor machinery).
    "pipeline_crawl_corpus" -> ((s, dir) =>
      crawlCurationRun(s, dir, crawlRecords(s, dir)).packed
        .select("doc_id", "n_tokens", "start_token", "seq_first",
          "seq_last", "offset_in_seq")),
    "pipeline_curate_report" -> ((s, dir) => curationOf(s, dir).report),
    // Sequence packing (operators/Pack.scala): the concatenate-and-chunk
    // layout onto 256-token training sequences, doc_id total order. All
    // integral arithmetic — start offsets, chunk ids, in-sequence offsets
    // hash-compare exactly against the oracle's window sum.
    // TRAINED-tokenizer packing: the BPE loop trains on the corpus, every
    // document's token count is the sum of its words' trained piece
    // counts (one vocabulary-grain join — the fact table never carries
    // symbol arrays), and the packer lays those counts onto 256-token
    // sequences. Token-less documents have nothing to pack and drop out.
    // The oracle unrolls the merge decisions (the t_bpe_segment CTEs),
    // replays the join-sum, and the prefix-sum packing arithmetic.
    "pipeline_tokenize_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val seg = Text.bpeSegment(docs, "text", nMerges = 3)
        .select(col("word"), col("n_pieces"))
      val counts = docs
        .select(col("doc_id"),
          explode(Text.tokens(lower(col("text")))).as("word"))
        .join(seg, "word")
        .groupBy(col("doc_id"))
        .agg(sum(col("n_pieces")).cast("long").as("n_tokens"))
      Pack.packSequences(counts, "doc_id", "n_tokens", budget = 256,
        order = Seq(col("doc_id")))
        .select("doc_id", "n_tokens", "start_token", "seq_first",
          "seq_last", "offset_in_seq")
    }),

    // The SECOND tokenizer family driving the same packer (VERDICT r10
    // #8): unigram-LM Viterbi segmentation under the FIXED prime-log
    // table (exactly oracle-replayable — the trained table's float noise
    // stays out of the lineage), per-word piece counts joined at
    // vocabulary grain, prefix-sum packed onto 256-token sequences.
    // Documents whose every word is uncoverable (or >12 chars) drop out,
    // mirroring the oracle's inner join.
    "pipeline_unigram_pack" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val words = graft.operators.Unigram.wordCounts(docs, "text")
        .filter(length(col("word")) <= 12).select("word")
      val seg = graft.operators.Unigram.segmentWords(words, "word",
          unigramFixedTable, maxPieceLen = 2)
        .select(col("word"), col("n_pieces"))
      val counts = docs
        .select(col("doc_id"),
          explode(Text.tokens(lower(col("text")))).as("word"))
        .join(seg, "word")
        .groupBy(col("doc_id"))
        .agg(sum(col("n_pieces")).cast("long").as("n_tokens"))
      Pack.packSequences(counts, "doc_id", "n_tokens", budget = 256,
        order = Seq(col("doc_id")))
        .select("doc_id", "n_tokens", "start_token", "seq_first",
          "seq_last", "offset_in_seq")
    }),

    "pipeline_packing" -> ((s, dir) =>
      Pack.packSequences(
        Tables.documents(s, dir).select(col("doc_id"),
          Text.bpeTokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", budget = 256, order = Seq(col("doc_id")))
        .select("doc_id", "n_tokens", "start_token", "seq_first",
          "seq_last", "offset_in_seq")),
    // ... and the block-diagonal ATTENTION MASKS of that layout — the
    // cu_seqlens offsets a trainer needs so packed documents cannot
    // attend to each other: per sequence, the sorted segment-start
    // offsets (pack offset for docs starting here, 0 for a continuation
    // block). Flat-string serialized, replayed exactly.
    "pipeline_pack_masks" -> ((s, dir) =>
      Pack.attentionMasks(
        Pack.packSequences(
          Tables.documents(s, dir).select(col("doc_id"),
            Text.bpeTokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", budget = 256, order = Seq(col("doc_id"))),
        "n_tokens", budget = 256)),
    // ... and the per-sequence roll-up: docs touching / starting in each
    // sequence, exact token fill. seq_tokens must sum to the corpus total
    // and every interior sequence must fill to exactly 256.
    "pipeline_packing_seqs" -> ((s, dir) =>
      Pack.sequenceStats(
        Pack.packSequences(
          Tables.documents(s, dir).select(col("doc_id"),
            Text.bpeTokenCount(col("text")).as("n_tokens")),
          "doc_id", "n_tokens", budget = 256, order = Seq(col("doc_id"))),
        "n_tokens", budget = 256)),
    // Domain-mixture sampling (operators/Sampling.scala): fill per-language
    // token quotas (40/20/20/10/10% of a 20k-token budget) with each
    // language's greedy md5-ordered document prefix — deterministic across
    // engines, so the exact kept set hash-compares against the oracle's
    // window sum.
    "pipeline_mixture" -> ((s, dir) =>
      Sampling.quotaSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"),
          Text.bpeTokenCount(col("text")).as("n_tokens")),
        "doc_id", "lang", "n_tokens",
        Sampling.mixtureQuotas(20000L, Seq("en" -> 0.4, "es" -> 0.2,
          "de" -> 0.2, "zh" -> 0.1, "fr" -> 0.1)))
        .select("doc_id", "lang", "n_tokens", "cum_tokens")),
    // ... and the achieved-vs-target report per domain.
    "pipeline_mixture_report" -> ((s, dir) =>
      Sampling.mixtureReport(
        Sampling.quotaSample(
          Tables.documents(s, dir).select(col("doc_id"), col("lang"),
            Text.bpeTokenCount(col("text")).as("n_tokens")),
          "doc_id", "lang", "n_tokens",
          Sampling.mixtureQuotas(20000L, Seq("en" -> 0.4, "es" -> 0.2,
            "de" -> 0.2, "zh" -> 0.1, "fr" -> 0.1))),
        "lang", "n_tokens")
        .select("lang", "n_docs", "kept_tokens", "quota", "fill_frac")),
    // Leakage-safe corpus split (Sampling.hashSplit): documents grouped
    // by CONTENT hash so exact duplicates can never straddle the
    // train/eval boundary, assigned 80/10/10 by md5-hex threshold — a
    // pure projection, deterministic across engines (the oracle replays
    // the CASE literally).
    "pipeline_split" -> ((s, dir) =>
      Sampling.hashSplit(
        Tables.documents(s, dir)
          .select(col("doc_id"), sha2(col("text"), 256).as("content_sha")),
        "content_sha",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),
    // NEAR-DUP leakage-safe split: content-hash splitting stops exact
    // copies from straddling the train/eval boundary, but a paraphrase
    // or marker-suffixed near-copy still leaks — the classic eval
    // contamination. Group docs by their NEAR-dup cluster first
    // (portable MinHash pairs → connected components, singletons their
    // own group), then hash-split on the GROUP id: every member of a
    // near-dup cluster lands on the same side. The oracle replays
    // pairs, a recursive min-closure, and the split CASE verbatim.
    "pipeline_split_neardup" -> ((s, dir) => {
      val docs = docsWithPlantedDups(s, dir).select("doc_id", "text")
      val pairs = Dedup.nearDuplicatesPortable(docs, "doc_id", "text",
        threshold = 0.5)
      val cc = Grouping.connectedComponentsAuto(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        "src", "dst")
      val grouped = docs.select(col("doc_id"))
        .join(cc.select(col("node").as("doc_id"), col("component")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("group_id"))
      Sampling.hashSplit(grouped, "group_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .select("doc_id", "group_id", "split")
    }),
    // ... and the per-split size report (docs + chars, integer-exact).
    "pipeline_split_report" -> ((s, dir) =>
      Sampling.hashSplit(
        Tables.documents(s, dir)
          .select(col("doc_id"), length(col("text")).as("n_chars"),
            sha2(col("text"), 256).as("content_sha")),
        "content_sha",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("long")).as("n_chars"))))


  /** The WARC response parse restated closed-form (status/ctype/payload
    * all deterministic in doc_id, the gate being 200 AND text/html) —
    * shared VERBATIM by src_warc_parse and the .warc.zst ingest.
    */
  private val sqlWarcParse: String =
    """WITH d AS (SELECT doc_id, text,
             CASE WHEN doc_id % 7 = 0 THEN '404 Not Found' ELSE '200 OK' END AS status,
             CASE WHEN doc_id % 5 = 0 THEN 'application/pdf'
                  ELSE 'text/html; charset=UTF-8' END AS ctype,
             CASE WHEN doc_id % 5 = 0 THEN substring(text, 1, 40)
                  ELSE '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
                       '</h1><p>' || substring(text, 1, 120) ||
                       '</p></body></html>' END AS payload
           FROM documents),
         h AS (SELECT doc_id, status, ctype, payload,
             'HTTP/1.1 ' || status || chr(13) || chr(10) ||
             'Content-Type: ' || ctype || chr(13) || chr(10) ||
             'Server: graft-fixture' || chr(13) || chr(10) ||
             chr(13) || chr(10) || payload AS http
           FROM d)
         SELECT CAST(doc_id % 8 AS BIGINT) AS file_id,
           'https://example.com/d/' || CAST(doc_id AS VARCHAR) AS uri,
           doc_id,
           CAST(len(http) AS BIGINT) AS declared_len,
           CAST(substring(status, 1, 3) AS BIGINT) AS http_status,
           ctype AS content_type,
           (substring(status, 1, 3) = '200' AND starts_with(ctype, 'text/html'))
             AS is_html,
           payload AS body,
           true AS len_ok
         FROM h"""

  val oracleSql: Map[String, String] = Map(

    // WET front door: rebuild the blobs with ordered string_agg, replay
    // the record split, header extraction, length-delimited body slice,
    // and the framing re-check
    // every count replayed from the construction formula
    "src_utf8_audit" ->
      """SELECT id AS doc_id,
                CAST(20 + id%13 + 2*(id%3) + 3*(id%2) + (id%4)
                     + CASE WHEN id%5=0 THEN 2 ELSE 0 END
                     + CASE WHEN id%7=0 THEN 1 ELSE 0 END AS BIGINT) AS n_bytes,
                CAST(20 + id%13 + (id%3) + (id%2) AS BIGINT) AS n_codepoints,
                CAST((id%3) + (id%2) AS BIGINT) AS n_multibyte,
                CAST((id%4) + CASE WHEN id%5=0 THEN 2 ELSE 0 END
                     + CASE WHEN id%7=0 THEN 1 ELSE 0 END AS BIGINT) AS n_replacements
         FROM (SELECT unnest(range(0, 512)) AS id)""",
    // de-chunking is lossless: ceil-division chunk count, full length,
    // and the body digest straight off the source text
    "src_http_dechunk" ->
      """SELECT doc_id,
                CAST((len(text) + 3 + doc_id % 7 - 1) // (3 + doc_id % 7) AS BIGINT) AS n_chunks,
                CAST(len(text) AS BIGINT) AS body_len,
                md5(text) AS body_md5
         FROM documents""",
    "src_wet_parse" -> wetParseOracle,
    // robots gate: replant rules + frontier, replay the longest-match
    // argmax (len DESC, Allow first, prefix DESC — the struct-max order)
    "src_robots_gate" ->
      """WITH d AS (SELECT DISTINCT doc_id % 8 AS d FROM documents),
         rules0 AS (
           SELECT 'd' || CAST(d AS VARCHAR) || '.example.com' AS domain,
                  'Disallow' AS directive, '/private' AS path_prefix FROM d
           UNION ALL
           SELECT 'd' || CAST(d AS VARCHAR) || '.example.com', 'Allow',
                  '/private/ok' FROM d WHERE d % 2 = 0
           UNION ALL
           SELECT 'd' || CAST(d AS VARCHAR) || '.example.com', 'Disallow',
                  '/p/' || CAST(d AS VARCHAR) FROM d WHERE d % 3 = 0),
         urls AS (SELECT doc_id,
             CASE WHEN doc_id % 4 = 0
                    THEN '/private/ok/page' || CAST(doc_id % 3 AS VARCHAR)
                  WHEN doc_id % 4 = 1
                    THEN '/private/sec' || CAST(doc_id % 5 AS VARCHAR)
                  WHEN doc_id % 4 = 2
                    THEN '/p/' || CAST(doc_id % 10 AS VARCHAR)
                  ELSE '/pub/item' || CAST(doc_id % 7 AS VARCHAR) END AS path,
             'd' || CAST(doc_id % 8 AS VARCHAR) || '.example.com' AS domain
           FROM documents),
         m AS (SELECT u.doc_id, r.directive, r.path_prefix,
                 row_number() OVER (PARTITION BY u.doc_id
                   ORDER BY len(r.path_prefix) DESC,
                            (r.directive = 'Allow') DESC,
                            r.path_prefix DESC) AS rn
               FROM urls u JOIN rules0 r ON u.domain = r.domain
                 AND starts_with(u.path, r.path_prefix))
         SELECT u.doc_id, 'https://' || u.domain || u.path AS url,
                u.domain, u.path,
                b.path_prefix AS matched_prefix,
                COALESCE(b.directive = 'Allow', true) AS allowed
         FROM urls u
         LEFT JOIN (SELECT doc_id, directive, path_prefix FROM m WHERE rn = 1) b
           USING (doc_id)""",
    // sitemap parse: replant the urlsets, state the closed form
    "src_sitemap_parse" ->
      """WITH d AS (SELECT DISTINCT doc_id % 8 AS d FROM documents),
         e AS (SELECT d, k FROM d, unnest(range(0, 3 + d)) AS uk(k))
         SELECT 'd' || CAST(d AS VARCHAR) || '.example.com' AS domain,
           'https://d' || CAST(d AS VARCHAR) || '.example.com' ||
           CASE WHEN k % 3 = 0 THEN '/private/ok/s' || CAST(d * 100 + k AS VARCHAR)
                WHEN k % 3 = 1 THEN '/private/s' || CAST(d * 100 + k AS VARCHAR)
                ELSE '/s/' || CAST(d * 100 + k AS VARCHAR) END AS loc,
           '2026-01-' || lpad(CAST((d + k) % 28 + 1 AS VARCHAR), 2, '0') AS lastmod
         FROM e""",
    // discovery composed with politeness: the sitemap closed form joined
    // through the same longest-match argmax as src_robots_gate
    "pipeline_frontier" ->
      """WITH dd AS (SELECT DISTINCT doc_id % 8 AS d FROM documents),
         rules0 AS (
           SELECT 'd' || CAST(d AS VARCHAR) || '.example.com' AS domain,
                  'Disallow' AS directive, '/private' AS path_prefix FROM dd
           UNION ALL
           SELECT 'd' || CAST(d AS VARCHAR) || '.example.com', 'Allow',
                  '/private/ok' FROM dd WHERE d % 2 = 0
           UNION ALL
           SELECT 'd' || CAST(d AS VARCHAR) || '.example.com', 'Disallow',
                  '/p/' || CAST(d AS VARCHAR) FROM dd WHERE d % 3 = 0),
         e AS (SELECT CAST(d * 100 + k AS BIGINT) AS entry_id,
                 CASE WHEN k % 3 = 0 THEN '/private/ok/s' || CAST(d * 100 + k AS VARCHAR)
                      WHEN k % 3 = 1 THEN '/private/s' || CAST(d * 100 + k AS VARCHAR)
                      ELSE '/s/' || CAST(d * 100 + k AS VARCHAR) END AS path,
                 'd' || CAST(d AS VARCHAR) || '.example.com' AS domain,
                 '2026-01-' || lpad(CAST((d + k) % 28 + 1 AS VARCHAR), 2, '0') AS lastmod
               FROM dd, unnest(range(0, 3 + d)) AS uk(k)),
         m AS (SELECT e.entry_id, r.directive, r.path_prefix,
                 row_number() OVER (PARTITION BY e.entry_id
                   ORDER BY len(r.path_prefix) DESC,
                            (r.directive = 'Allow') DESC,
                            r.path_prefix DESC) AS rn
               FROM e JOIN rules0 r ON e.domain = r.domain
                 AND starts_with(e.path, r.path_prefix))
         SELECT e.entry_id, 'https://' || e.domain || e.path AS loc,
                e.domain, e.path,
                b.path_prefix AS matched_prefix,
                COALESCE(b.directive = 'Allow', true) AS allowed,
                e.lastmod
         FROM e
         LEFT JOIN (SELECT entry_id, directive, path_prefix FROM m WHERE rn = 1) b
           USING (entry_id)""",
    // the freshness decision over the allowed frontier vs the planted
    // fetch log
    "pipeline_recrawl" ->
      """WITH dd AS (SELECT DISTINCT doc_id % 8 AS d FROM documents),
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
                 '2026-01-' || lpad(CAST((d + k) % 28 + 1 AS VARCHAR), 2, '0') AS lastmod
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
               WHERE COALESCE(b.directive = 'Allow', true))
         SELECT entry_id, 'https://' || domain || path AS loc, lastmod,
                CASE WHEN entry_id % 2 = 0 THEN '2026-01-04' END AS fetched_at,
                (entry_id % 2 <> 0 OR lastmod > '2026-01-04') AS refetch,
                CASE WHEN entry_id % 2 <> 0 THEN 'unseen'
                     WHEN lastmod > '2026-01-04' THEN 'stale'
                     ELSE 'fresh' END AS reason
         FROM a""",
    // the fetch schedule: allowed frontier slotted per domain
    // (lastmod DESC, id), eta = slot x the domain's planted Crawl-delay
    "pipeline_fetch_plan" ->
      """WITH dd AS (SELECT DISTINCT doc_id % 8 AS d FROM documents),
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
                 '2026-01-' || lpad(CAST((d + k) % 28 + 1 AS VARCHAR), 2, '0') AS lastmod
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
         sl AS (SELECT *, CAST(row_number() OVER (PARTITION BY domain
                  ORDER BY lastmod DESC, entry_id) - 1 AS BIGINT) AS fetch_slot
                FROM a)
         SELECT entry_id, 'https://' || domain || path AS loc, domain,
                lastmod, CAST(d % 3 + 1 AS BIGINT) AS crawl_delay,
                fetch_slot,
                CAST(fetch_slot * (d % 3 + 1) AS BIGINT) AS fetch_eta_s
         FROM sl""",
    // the authority-weighted schedule: rank iteration unrolled (the
    // g_pagerank pattern) over the hub-and-spoke graph, then the
    // priority = rank × staleness window per domain
    "pipeline_fetch_priority" ->
      sqlFetchPrioritySql("'2026-01-' || lpad(CAST((d + k) % 28 + 1 AS VARCHAR), 2, '0')", "2026-02-01"),
    // the gz byte-domain parse answers the SAME oracle on the all-ASCII
    // corpus (byte count == char count there) — inflate + byte framing
    // must be invisible to the result
    "src_wet_parse_gz" -> wetParseOracle,
    // non-ASCII framing: declared_len is the UTF-8 BYTE count of the
    // prefixed body, and a correct byte slice round-trips every record
    "src_wet_bytes" ->
      """SELECT CAST(doc_id % 8 AS BIGINT) AS file_id,
                'https://example.com/d/' || CAST(doc_id AS VARCHAR) AS uri,
                doc_id,
                CAST(octet_length(encode('héllo → ' || text)) AS BIGINT)
                  AS declared_len,
                'héllo → ' || text AS body,
                true AS len_ok
         FROM documents""",
    // WARC response parse: the planted record layer restated closed-form
    // (status/ctype/payload all deterministic in doc_id), the gate being
    // 200 AND text/html
    "src_warc_parse" -> sqlWarcParse,
    // the zst ingest answers the SAME oracle: a stored-and-decoded
    // archive must be indistinguishable from the uncompressed parse
    "src_warc_parse_zst" -> sqlWarcParse,
    "src_warc_parse_zstdict" -> sqlWarcParse,
    // the engine-written store-mode archive answers the SAME oracle:
    // write → read must be indistinguishable from the uncompressed parse
    "src_warc_write_zst" -> sqlWarcParse,
    // Deterministic shard shuffle: md5 permutation, NTILE sharding,
    // in-shard sequence — all three native on both engines
    "pipeline_shard_shuffle" ->
      """WITH k AS (SELECT doc_id,
           md5('r11:' || CAST(doc_id AS VARCHAR)) AS shuffle_key FROM documents),
       n AS (SELECT doc_id, shuffle_key,
           CAST(ntile(16) OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS shard
         FROM k)
       SELECT doc_id, shuffle_key, shard,
         CAST(row_number() OVER (PARTITION BY shard
           ORDER BY shuffle_key, doc_id) AS BIGINT) AS seq_in_shard
       FROM n""",
    // Token-budget greedy selection: one descending-quality window
    // cumsum is the whole oracle
    "pipeline_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
             ${sqlTokens("lower(text)")} AS ts FROM documents),
       d AS (SELECT doc_id, source, CAST(len(ts) AS BIGINT) AS n_toks,
             CAST(len(list_distinct(ts)) AS BIGINT) AS n_vocab FROM t),
       c AS (SELECT *, CAST(coalesce(sum(n_toks) OVER (
             ORDER BY n_vocab DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS cum_before FROM d)
       SELECT doc_id, source, n_toks, n_vocab, cum_before,
         (cum_before < 10000) AS kept,
         (cum_before < 10000 AND cum_before + n_toks > 10000) AS cut FROM c""",
    // Rendezvous sharding: replay both weight arrays; argmax via
    // list_aggregate max + list_position (no struct sort needed — md5
    // collisions across shard ids cannot happen, so max is unique)
    "pipeline_shard_rendezvous" ->
      """WITH c AS (SELECT doc_id,
           list_transform(generate_series(0, 15), s ->
             md5('r11:' || CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))) AS w16l,
           list_transform(generate_series(0, 16), s ->
             md5('r11:' || CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR))) AS w17l
         FROM documents),
       m AS (SELECT doc_id,
           CAST(list_position(w16l, list_aggregate(w16l, 'max')) - 1 AS BIGINT) AS shard16,
           list_aggregate(w16l, 'max') AS w16,
           CAST(list_position(w17l, list_aggregate(w17l, 'max')) - 1 AS BIGINT) AS shard17,
           list_aggregate(w17l, 'max') AS w17
         FROM c)
       SELECT doc_id, shard16, w16, shard17, w17,
              (shard16 <> shard17) AS moved FROM m""",
    // Selection-and-shipping tail: the three stages' CTEs chained
    "pipeline_select_and_shard" ->
      s"""WITH t AS (SELECT doc_id, source,
             ${sqlTokens("lower(text)")} AS ts FROM documents),
       d AS (SELECT doc_id, source, CAST(len(ts) AS BIGINT) AS n_toks,
             CAST(len(list_distinct(ts)) AS BIGINT) AS n_vocab FROM t),
       g AS (SELECT doc_id, source, n_toks, n_vocab FROM
             (SELECT *, percent_rank() OVER (PARTITION BY source
                ORDER BY n_vocab, doc_id) AS pr FROM d)
             WHERE pr >= 0.25),
       c AS (SELECT *, CAST(coalesce(sum(n_toks) OVER (
             ORDER BY n_vocab DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS cum_before FROM g),
       k AS (SELECT * FROM c WHERE cum_before < 8000),
       s AS (SELECT *, md5('r11e2e:' || CAST(doc_id AS VARCHAR))
             AS shuffle_key FROM k),
       n AS (SELECT *, CAST(ntile(8) OVER (ORDER BY shuffle_key, doc_id)
             AS BIGINT) AS shard FROM s)
       SELECT doc_id, source, n_toks, n_vocab, cum_before, shuffle_key,
         shard,
         CAST(row_number() OVER (PARTITION BY shard
           ORDER BY shuffle_key, doc_id) AS BIGINT) AS seq_in_shard
       FROM n""",
    // epoch plan: domain-grain token mass vs quota, integer passes +
    // leftover + rounded fractional epochs
    "pipeline_epoch_plan" ->
      """WITH t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COALESCE(SUM(greatest(0, len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')))), 0) AS BIGINT) AS available_tokens
           FROM documents GROUP BY 1),
         q(source, quota) AS (VALUES ('src0', 80000), ('src1', 60000),
                                     ('src2', 40000), ('src3', 20000))
         SELECT t.source, n_docs, available_tokens,
           CAST(q.quota AS BIGINT) AS quota,
           CASE WHEN available_tokens > 0
                THEN CAST(q.quota // available_tokens AS BIGINT) END AS full_epochs,
           CASE WHEN available_tokens > 0
                THEN CAST(q.quota % available_tokens AS BIGINT) END AS remainder_tokens,
           CASE WHEN available_tokens > 0
                THEN round(CAST(q.quota AS DOUBLE) / available_tokens, 6) END AS epochs
         FROM t JOIN q USING (source)""",
    // temperature mixture: the same token-mass aggregation, sqrt powers
    // rounded to DECIMAL(27,15), exact decimal normalizing sum, double
    // division for the published weight/quota
    "pipeline_temperature_mix" ->
      """WITH t AS (SELECT source,
             CAST(COALESCE(SUM(greatest(0, len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')))), 0) AS BIGINT) AS available_tokens
           FROM documents GROUP BY 1),
         p AS (SELECT source, available_tokens,
                 CAST(pow(CAST(available_tokens AS DOUBLE), 0.5) AS DECIMAL(27,15)) AS pw
               FROM t),
         s AS (SELECT SUM(pw) AS tot FROM p)
         SELECT source, available_tokens,
           round(CAST(pw AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS weight,
           CAST(round(200000 * CAST(pw AS DOUBLE) / CAST(tot AS DOUBLE)) AS BIGINT) AS quota
         FROM p CROSS JOIN s""",
    // curriculum packing: the unigram ppl (trained on the full corpus)
    // replayed with the t_lm_score fold, then the packing window ordered
    // (ppl, doc_id) instead of doc_id
    "pipeline_pack_curriculum" ->
      s"""WITH c AS (SELECT w, COUNT(*) AS c
             FROM (SELECT unnest(${sqlTokens("lower(text)")}) AS w FROM documents)
             GROUP BY 1),
         s AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM c),
         tok AS (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS w FROM documents),
         tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
         lp AS (SELECT doc_id, w, tf,
                  CAST(tf AS DOUBLE) * ln(CAST(coalesce(c.c, 0) + 1 AS DOUBLE) / CAST(s.n + s.v AS DOUBLE)) AS lp
                FROM tf LEFT JOIN c USING (w) CROSS JOIN s),
         pd AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS lm_n,
                  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(lp ORDER BY w)),
                    (a, b) -> a + b) AS lsum
                FROM lp GROUP BY 1),
         sc AS (SELECT doc_id, round(exp(-(lsum / lm_n)), 6) AS ppl FROM pd),
         nt AS (SELECT doc_id,
                  CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tokens
                FROM documents),
         j AS (SELECT nt.doc_id, nt.n_tokens, sc.ppl
               FROM nt JOIN sc USING (doc_id) WHERE sc.ppl IS NOT NULL),
         pos AS (SELECT doc_id, n_tokens, ppl,
             CAST(COALESCE(SUM(greatest(0, n_tokens)) OVER (ORDER BY ppl, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
           FROM j)
         SELECT doc_id, n_tokens, ppl, start_token,
           CAST(start_token // 256 AS BIGINT) AS seq_first,
           CAST(CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 256
                ELSE start_token // 256 END AS BIGINT) AS seq_last,
           CAST(start_token % 256 AS BIGINT) AS offset_in_seq
         FROM pos""",
    "pipeline_kpis" ->
      """SELECT p.p_type AS category,
         CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_extendedprice) AS avg_order_value,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS avg_return_rate
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2""",
    "pipeline_corpus_prep" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 5 = 0),
         keep AS (SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY sha256(text)),
         ded AS (SELECT c.doc_id, c.text FROM corpus c JOIN keep USING (doc_id)),
         t AS (SELECT doc_id, text, ${sqlTokens("text")} AS ts,
                      ${sqlTokens("lower(text)")} AS lts FROM ded),
         st AS (SELECT doc_id, text, lts,
           CAST(len(ts) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS bpe_tokens,
           round(CASE WHEN len(ts) > 0 THEN CAST(list_sum(list_transform(ts, x -> len(x))) AS DOUBLE) / len(ts) ELSE 0.0 END, 6) AS mean_token_len,
           round(CASE WHEN len(text) > 0 THEN CAST(len(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / len(text) ELSE 0.0 END, 6) AS punct_ratio,
           round(CASE WHEN len(ts) > 0 THEN CAST(len(list_filter(ts, x -> list_contains($enOracleList, x))) AS DOUBLE) / len(ts) ELSE 0.0 END, 6) AS stopword_ratio
         FROM t),
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
           FROM h)
         SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens
         FROM lang GROUP BY 1""",
    // end-to-end curation: the packed layout of the mixture survivors.
    // st_curate answers the SAME replay — the streaming DAG's published
    // artifact must be indistinguishable from the batch DAG's output.
    "pipeline_curate" -> sqlCuratePackedOracle,
    // the crawl-to-corpus DAG: the crawl front half (pages → robots gate
    // → strip → mirrors) feeding the same stage-by-stage curate replay
    "pipeline_crawl_corpus" ->
      sqlCuratePackedSql(sqlCurateCtesFor(sqlCrawlCorpusCtes, pplCutoff = "61.5")),
    // ... and the per-stage funnel report (batch + streaming twins)
    "pipeline_curate_report" -> sqlCurateReportOracle,
   
    // sequence packing: the same BPE-ish token count, one window prefix
    // sum in doc_id order, integral div/mod chunk arithmetic
    // trained-BPE piece counts per doc (vocabulary join-sum over the
    // unrolled merge CTEs), then the same prefix-sum packing arithmetic
    "pipeline_tokenize_pack" ->
      s"""$sqlBpeTrainCtes,
         counts AS (
           SELECT d.doc_id, CAST(SUM(len(w3.syms)) AS BIGINT) AS n_tokens
           FROM (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS w
                 FROM documents) d
           JOIN w3 ON w3.w = d.w GROUP BY 1),
         pos AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
           FROM counts)
         SELECT doc_id, n_tokens, start_token,
           CAST(start_token // 256 AS BIGINT) AS seq_first,
           CAST(CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 256
                ELSE start_token // 256 END AS BIGINT) AS seq_last,
           CAST(start_token % 256 AS BIGINT) AS offset_in_seq
         FROM pos""",
    // unigram-tokenizer packing: the fixed-table Viterbi piece counts
    // (useg) joined over each document's words, then the same prefix-sum
    // packing arithmetic as pipeline_tokenize_pack
    "pipeline_unigram_pack" ->
      s"""$sqlUnigramSegCtes,
         counts AS (
           SELECT d.doc_id, CAST(SUM(u.n_pieces) AS BIGINT) AS n_tokens
           FROM (SELECT doc_id, unnest(${sqlTokens("lower(text)")}) AS w
                 FROM documents) d
           JOIN useg u ON u.word = d.w GROUP BY 1),
         pos AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
           FROM counts)
         SELECT doc_id, n_tokens, start_token,
           CAST(start_token // 256 AS BIGINT) AS seq_first,
           CAST(CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 256
                ELSE start_token // 256 END AS BIGINT) AS seq_last,
           CAST(start_token % 256 AS BIGINT) AS offset_in_seq
         FROM pos""",
    "pipeline_packing" ->
      """WITH toks AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tokens
           FROM documents),
         pos AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
           FROM toks)
         SELECT doc_id, n_tokens, start_token,
           CAST(start_token // 256 AS BIGINT) AS seq_first,
           CAST(CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 256
                ELSE start_token // 256 END AS BIGINT) AS seq_last,
           CAST(start_token % 256 AS BIGINT) AS offset_in_seq
         FROM pos""",
    // the masks: same layout cumsum, explode each doc's sequence span,
    // boundary = pack offset in its first sequence / 0 in continuations
    "pipeline_pack_masks" ->
      """WITH toks AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tokens
           FROM documents),
         pos AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
           FROM toks),
         spans AS (SELECT doc_id, n_tokens, start_token,
             start_token // 256 AS seq_first,
             (start_token + n_tokens - 1) // 256 AS seq_last,
             start_token % 256 AS offset_in_seq
           FROM pos WHERE n_tokens > 0),
         x AS (SELECT s.seq_first, s.offset_in_seq, u.seq
               FROM spans s, unnest(generate_series(s.seq_first, s.seq_last)) AS u(seq)),
         b AS (SELECT seq,
                 CASE WHEN seq = seq_first THEN offset_in_seq ELSE 0 END AS boundary
               FROM x),
         g AS (SELECT seq, list_sort(list(DISTINCT boundary)) AS bs
               FROM b GROUP BY 1)
         SELECT CAST(seq AS BIGINT) AS seq,
                CAST(len(bs) AS INTEGER) AS n_segments,
                array_to_string(bs, ' ') AS boundaries
         FROM g""",
    "pipeline_packing_seqs" ->
      """WITH toks AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tokens
           FROM documents),
         pos AS (SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_token
           FROM toks),
         packed AS (SELECT *,
             CAST(start_token // 256 AS BIGINT) AS seq_first,
             CAST(CASE WHEN n_tokens > 0 THEN (start_token + n_tokens - 1) // 256
                  ELSE start_token // 256 END AS BIGINT) AS seq_last
           FROM pos),
         spans AS (SELECT n_tokens, start_token, seq_first,
             unnest(generate_series(seq_first, seq_last)) AS seq
           FROM packed)
         SELECT seq, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN seq = seq_first THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           CAST(SUM(least((seq + 1) * 256, start_token + n_tokens)
                  - greatest(seq * 256, start_token)) AS BIGINT) AS seq_tokens,
           round(CAST(SUM(least((seq + 1) * 256, start_token + n_tokens)
                  - greatest(seq * 256, start_token)) AS DOUBLE) / 256, 6) AS fill_frac
         FROM spans GROUP BY 1""",
    // mixture sampling: same md5 hash order (the a9_sample_hash
    // convention), same inclusive window token cumsum, same quotas
    "pipeline_mixture" ->
      """WITH toks AS (SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tokens
           FROM documents),
         q(lang, quota) AS (VALUES ('en', 8000), ('es', 4000), ('de', 4000), ('zh', 2000), ('fr', 2000)),
         c AS (SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           FROM toks)
         SELECT c.doc_id, c.lang, c.n_tokens, c.cum_tokens
         FROM c JOIN q USING (lang) WHERE c.cum_tokens <= q.quota""",
    "pipeline_mixture_report" ->
      """WITH toks AS (SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+')) AS BIGINT) AS n_tokens
           FROM documents),
         q(lang, quota) AS (VALUES ('en', 8000), ('es', 4000), ('de', 4000), ('zh', 2000), ('fr', 2000)),
         c AS (SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
           FROM toks),
         kept AS (SELECT c.*, q.quota FROM c JOIN q USING (lang)
                  WHERE c.cum_tokens <= q.quota)
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS kept_tokens,
           CAST(MAX(quota) AS BIGINT) AS quota,
           round(CAST(SUM(n_tokens) AS DOUBLE) / MAX(quota), 6) AS fill_frac
         FROM kept GROUP BY 1""",
    // the portable pair construction, a recursive min-closure (the
    // er_entities pattern), then the hash-split CASE on the group id
    "pipeline_split_neardup" ->
      s"""WITH RECURSIVE ${DedupQueries.sqlNearDupPairCtes(
           """SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text || ' graft dup marker' FROM documents""")},
         ed AS (SELECT id_a AS src, id_b AS dst FROM ndpairs
                UNION SELECT id_b, id_a FROM ndpairs),
         r(node, m) AS (
           SELECT src, src FROM (SELECT DISTINCT src FROM ed)
           UNION
           SELECT r.node, ed.dst FROM r JOIN ed ON r.m = ed.src),
         comp AS (SELECT node, MIN(m) AS component FROM r GROUP BY 1),
         g AS (SELECT c0.doc_id, COALESCE(comp.component, c0.doc_id) AS group_id
               FROM corpus c0 LEFT JOIN comp ON comp.node = c0.doc_id),
         hs8 AS (SELECT doc_id, group_id,
                 substr(md5(CAST(group_id AS VARCHAR)), 1, 8) AS h8 FROM g)
         SELECT doc_id, group_id,
                CASE WHEN h8 IS NULL THEN 'train'
                     WHEN h8 < 'cccccccc' THEN 'train'
                     WHEN h8 < 'e6666666' THEN 'valid'
                     ELSE 'test' END AS split
         FROM hs8""",
    // 0xcccccccc = floor(0.8 * 2^32), 0xe6666666 = floor(0.9 * 2^32) —
    // the same literals hashSplit embeds
    "pipeline_split" ->
      """WITH g AS (SELECT doc_id, substr(md5(sha256(text)), 1, 8) AS h8
           FROM documents)
         SELECT doc_id,
                CASE WHEN h8 IS NULL THEN 'train'
                     WHEN h8 < 'cccccccc' THEN 'train'
                     WHEN h8 < 'e6666666' THEN 'valid'
                     ELSE 'test' END AS split
         FROM g""",
    "pipeline_split_report" ->
      """WITH g AS (SELECT doc_id, length(text) AS n_chars,
                  substr(md5(sha256(text)), 1, 8) AS h8
           FROM documents)
         SELECT CASE WHEN h8 IS NULL THEN 'train'
                     WHEN h8 < 'cccccccc' THEN 'train'
                     WHEN h8 < 'e6666666' THEN 'valid'
                     ELSE 'test' END AS split,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS n_chars
         FROM g GROUP BY 1""")
}

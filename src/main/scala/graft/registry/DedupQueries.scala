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

/** The Dedup slice of the SparkEntry registry — exact/near/semantic dedup and entity resolution.
  * Entries are verbatim from the pre-split SparkEntry (VERDICT r11 #8);
  * SparkEntry merges every slice into the driver-contract maps.
  */
private[graft] object DedupQueries {

  /** 31^j mod 2^31 for j = 0..15 — the CDC window-polynomial weights,
    * shared by the dedup_cdc_* oracles (Dedup.cdcChunks computes the
    * same table executor-side). `private[registry]` (ADVICE r14): the
    * streaming st_cdc_dedup oracle replays the same walk and previously
    * inlined this table as a hardcoded literal — a future change to the
    * CDC window or base would have silently desynchronized it.
    */
  private[registry] val SqlCdcPows: String =
    "[" + Iterator.iterate(1L)(p => (p * 31L) % 2147483648L)
      .take(16).mkString(",") + "]"

  /** The shared CDC chunk-walk CTE fragment: Gear hash per position,
    * 16-char windowed polynomial, boundary set, chunk extents. Expects a
    * prior CTE `d(doc_id, text, n)` (extra columns ride along — callers
    * re-join `ch` back to `d` for them) and defines `g`, `h`, `bset`,
    * `ch(doc_id, endpos, chunk_idx, startpos)`. One definition for the
    * batch (dedup_cdc_*) and streaming (st_cdc_dedup) oracles so the
    * walk can never drift between them (ADVICE r14 #5).
    */
  private[registry] val SqlCdcWalk: String =
    s"""g AS (SELECT doc_id, n, i,
                 (ascii(substr(text, CAST(i+1 AS INTEGER), 1)) * 2654435761) % 16777216 + 1 AS gv
               FROM d, unnest(range(0, n)) AS ui(i)),
         h AS (SELECT a.doc_id, a.n, a.i,
                 SUM(b.gv * ($SqlCdcPows)[a.i - b.i + 1]) AS hv
               FROM g a JOIN g b ON a.doc_id = b.doc_id
                 AND b.i BETWEEN a.i - 15 AND a.i
               WHERE a.i >= 15 GROUP BY 1, 2, 3),
         bset AS (SELECT DISTINCT doc_id, i FROM (
                    SELECT doc_id, i FROM h WHERE hv % 64 = 0 AND i < n - 1
                    UNION ALL SELECT doc_id, n - 1 AS i FROM d WHERE n > 0)),
         ch AS (SELECT doc_id, i AS endpos,
                  row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS chunk_idx,
                  COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i) + 1, 0) AS startpos
                FROM bset)"""
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Entity resolution end-to-end (the record-linkage composition of
    // two verified operators): records keyed by name#nation#segment,
    // every 5th customer planted as a one-char-mutated duplicate;
    // fuzzyPairs blocks + verifies edit-distance ≤ 1 WITHOUT a
    // cartesian, connectedComponents clusters the pairs, and every
    // record maps to its cluster's min id (singletons to themselves).
    // The oracle recomputes the SAME pairs with a brute-force
    // levenshtein cross join (byte == char on this ASCII key) and the
    // same recursive closure — exact agreement of the whole pipeline.
    "er_entities" -> ((s, dir) => {
      val base = Tables.customer(s, dir).select(col("c_custkey").as("id"),
        concat(col("c_name"), lit("#"), col("c_nationkey").cast("string"),
          lit("#"), col("c_mktsegment")).as("name"))
      val dups = base.filter(col("id") % 5 === 0)
        .select((col("id") + PlantedOffset).as("id"),
          concat(substring(col("name"), 1, 4), lit("@"),
            substring(col("name"), 6, 1000000)).as("name"))
      val all = base.unionByName(dups)
      val pairs = Dedup.fuzzyPairs(all, "id", "name")
      val comps = Grouping.connectedComponentsAuto(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")), "src", "dst")
      all.select(col("id"))
        .join(comps.select(col("node").as("id"), col("component")), Seq("id"), "left")
        .select(col("id").as("customer_id"),
          coalesce(col("component"), col("id")).as("entity_id"))
    }),

    // ---- dedup suite (§7.5) ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")),
    // Content-defined chunking (Dedup.cdcChunks): the windowed-polynomial
    // Gear cut — offset-shift-immune chunk boundaries, a pure map pass.
    // The W-term non-recursive hash makes every boundary, chunk extent,
    // and md5 digest replayable verbatim in SQL.
    "dedup_cdc_chunks" -> ((s, dir) =>
      Dedup.cdcChunks(Tables.documents(s, dir), "doc_id", "text")),
    // ...and cross-doc shared chunks over planted verbatim twins
    // (doc_id < 50 duplicated at +PlantedOffset): every twin chunk MUST
    // appear in ≥ 2 docs; digests are the only shuffle key.
    "dedup_cdc_shared" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + PlantedOffset).as("doc_id"), col("text")))
      Dedup.cdcSharedChunks(planted, "doc_id", "text")
    }),
    // Exact-substring dedup coverage (Dedup.duplicatedSpans — the Lee
    // et al. ACL '22 ExactSubstr filter, L-gram formulation): maximal
    // per-doc spans covered by corpus-duplicated 50-grams, over planted
    // verbatim twins. Every twin doc ≥ 50 chars must surface one span
    // covering the whole doc; md5 digests and the interval merge replay
    // verbatim in SQL.
    "dedup_substring_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + PlantedOffset).as("doc_id"), col("text")))
      Dedup.duplicatedSpans(planted, "doc_id", "text", gramLen = 50)
    }),
    // ...and the REMOVAL step the paper actually ships: cut every merged
    // span out, keep the gaps (one HOF fold over the per-doc span array,
    // no char explode). Twin docs ≥ 50 chars clean to the empty string.
    "dedup_substring_clean" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.unionByName(docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + PlantedOffset).as("doc_id"), col("text")))
      Dedup.removeDuplicatedSpans(planted, "doc_id", "text", gramLen = 50)
    }),
    "dedup_jaccard_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
    }),
    // FULLY-ORACLED near-dup pairs (VERDICT r12 #7 — formerly rows-only):
    // the portable md5 double-hash MinHash family, so signatures, string
    // band keys, bucket caps, the candidate join, and the jaccard verify
    // all replay verbatim in DuckDB. The xxhash64 production operators
    // stay pinned by the _valid/_recall twins below.
    "dedup_near" -> ((s, dir) =>
      Dedup.nearDuplicatesPortable(docsWithPlantedDups(s, dir), "doc_id",
        "text", threshold = 0.5)),
    // DENSITY-ADAPTIVE banding (VERDICT r14 #7): a 400-member planted
    // boilerplate family (58 shared shingles, ~4 unique per member)
    // pushes the corpus shingle duplication factor past the ladder's
    // last rung, so the engine must pick 1×16 banding — and the oracle
    // replays the measurement, the CASE ladder, AND the dynamically-
    // sliced band keys, so a drifted parameter choice hash-mismatches.
    // Exact copies of doc_id < 10 ride along so the collapse + within-
    // group expansion paths stay exercised under the adaptive banding.
    "dedup_near_adaptive" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val family = s.range(400).select(
        (col("id") + DenseFamilyOffset).as("doc_id"),
        concat(lit(AdaptiveBoiler), lit(" tail "), col("id").cast("string"),
          lit(" suffix")).as("text"))
      val corpus = docs.filter(col("doc_id") < 20)
        .unionByName(docs.filter(col("doc_id") < 10)
          .select((col("doc_id") + PlantedOffset).as("doc_id"), col("text")))
        .unionByName(family)
      Dedup.nearDuplicatesAdaptive(corpus, "doc_id", "text", threshold = 0.5)
    }),
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashNearDuplicatesPortable(docsWithPlantedDups(s, dir),
        "doc_id", "text")),
    // SOURCE-PRIORITY exact dedup (Dedup.keepCanonicalBy): every doc < 100
    // gets a planted exact copy at +PlantedOffset under source "zz-mirror"
    // — the lexicographically LAST source, so priority (source ASC,
    // doc_id) must keep every original and drop every mirror copy, while
    // natural intra-corpus dups resolve by the same deterministic order.
    // The cross-corpus curation rule: identical content appears in a
    // curated source and in a crawl mirror → keep the curated copy.
    "dedup_priority" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val corpus = docs.unionByName(docs.filter(col("doc_id") < 100)
        .select((col("doc_id") + PlantedOffset).as("doc_id"),
          lit("zz-mirror").as("source"), col("text")))
      Dedup.keepCanonicalBy(corpus, "text",
          Seq(col("source"), col("doc_id")))
        .select("doc_id", "source")
    }),
    // Derived-invariant twins for the rows-only pair outputs (VERDICT r09
    // #7): the pair SETS are seeded-hash-dependent, but their structure
    // is not — ordering, uniqueness, verify-score range, id provenance
    // all hash-compare against literal truth.
    "dedup_near_valid" -> ((s, dir) => {
      val docs = docsWithPlantedDups(s, dir)
      pairsValid(Dedup.nearDuplicates(docs, "doc_id", "text", threshold = 0.5),
        "jaccard", 0.5, 1.0, docs.select("doc_id"))
    }),
    "dedup_simhash_valid" -> ((s, dir) => {
      val docs = docsWithPlantedDups(s, dir)
      pairsValid(Dedup.simhashNearDuplicates(docs, "doc_id", "text"),
        "hamming", 0.0, 3.0, docs.select("doc_id"))
    }),

    // Planted-truth recall (VERDICT r03 #1): ground truth is known by
    // construction (doc_id ↔ doc_id + 1,000,000), so "every planted pair
    // was found" IS DuckDB-expressible even though the xxhash64 signatures
    // aren't. A missed pair drops a row → the driver's rows/hash compare
    // fails. This puts the whole MinHash→band→bucket-join→Jaccard pipeline
    // under the oracle.
    "dedup_near_recall" -> ((s, dir) => {
      // bands = k (r = 1): a pair collides when ANY minhash agrees, so the
      // miss probability for a planted pair (jaccard ≥ 0.5 by construction)
      // is ≤ (1-j)^16 ≈ 1e-5 — and the pipeline is fully deterministic
      // (seeded xxhash64), so a locally-green run stays green. The default
      // 4×4 banding stays in dedup_near: it's the right cost/recall trade
      // for a real corpus; this query trades candidate-side cost for a
      // recall guarantee the oracle can pin.
      val pairs = Dedup.nearDuplicates(docsWithPlantedDups(s, dir), "doc_id",
        "text", threshold = 0.5, bands = 16)
      val planted = Tables.documents(s, dir).select(col("doc_id"))
      planted.join(pairs,
        planted("doc_id") === pairs("id_a") &&
          pairs("id_b") === planted("doc_id") + PlantedOffset, "left_semi")
        .select(col("doc_id"), lit(true).as("found"))
    }),
    // End-to-end dedup: MinHash-LSH pairs → connected-component clusters →
    // planted-truth check that every copy clusters with its original. The
    // full production shape (signatures → candidates → verify → clusters)
    // under one oracle.
    "dedup_clusters_recall" -> ((s, dir) => {
      val pairs = Dedup.nearDuplicates(docsWithPlantedDups(s, dir), "doc_id",
        "text", threshold = 0.5, bands = 16)
      val cc = Grouping.connectedComponentsAuto(pairs, "id_a", "id_b")
      val orig = cc.filter(col("node") < PlantedOffset)
        .select(col("node").as("doc_id"), col("component").as("c_orig"))
      val copies = cc.filter(col("node") >= PlantedOffset)
        .select((col("node") - PlantedOffset).as("doc_id"), col("component").as("c_copy"))
      orig.join(copies, "doc_id")
        .select(col("doc_id"), (col("c_orig") === col("c_copy")).as("same_cluster"))
    }),
    // The end-to-end DROP: dropNearDuplicates must remove every planted
    // copy (its original has the smaller id, so the copy can never be the
    // cluster canonical; bands=16 gives the r=1 recall guarantee that the
    // pair IS found). Emits one row per original whose copy was dropped —
    // a surviving copy deletes a row and fails the driver's rows/hash
    // compare.
    "dedup_dropped_recall" -> ((s, dir) => {
      val kept = Dedup.dropNearDuplicates(docsWithPlantedDups(s, dir),
        "doc_id", "text", threshold = 0.5, bands = 16)
      val copies = Tables.documents(s, dir)
        .select((col("doc_id") + PlantedOffset).as("doc_id"))
      copies.join(kept, Seq("doc_id"), "left_anti")
        .select((col("doc_id") - PlantedOffset).as("doc_id"),
          lit(true).as("dropped"))
    }),
    // SimHash recall over planted EXACT duplicates: identical token streams
    // give identical 64-bit signatures, so every planted pair must surface
    // with Hamming distance 0 — a structural guarantee, not an empirical
    // one (the suffix-mutated corpus stays rows-only in dedup_simhash
    // because near-dup recall there is genuinely probabilistic).
    "dedup_simhash_recall" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val corpus = docs.unionByName(exactCopy(docs, PlantedOffset))
      val pairs = Dedup.simhashNearDuplicates(corpus, "doc_id", "text")
      val planted = docs.select(col("doc_id"))
      planted.join(pairs,
        planted("doc_id") === pairs("id_a") &&
          pairs("id_b") === planted("doc_id") + PlantedOffset, "inner")
        .select(col("doc_id"), col("hamming").cast("integer").as("hamming"))
    }),

    // Fuzzy key join (SymSpell symmetric deletes → exact Levenshtein
    // verify): plant a ONE-character substitution inside every document's
    // key window (position 3; '¤' is outside the corpus alphabet, so the
    // distance is exactly 1) — every planted pair must surface at
    // edit_distance 1. Only (doc, its own mutation) pairs can differ by
    // exactly the planted offset, so the join pins recall per document.
    "dedup_fuzzy_recall" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val mutated = docs.select((col("doc_id") + PlantedOffset).as("doc_id"),
        concat(substring(col("text"), 1, 2), lit("¤"),
          substring(col("text"), 4, 1000000)).as("text"))
      val pairs = Dedup.fuzzyPairs(docs.unionByName(mutated), "doc_id", "text")
      docs.select("doc_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
          .select(col("id_a").as("doc_id"),
            (col("edit_distance") === 1).as("d1")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("d1"), lit(false)).as("found"))
    }),

    // embedding-cosine near-dup: plant near-identical vectors (tiny
    // perturbation keeps the sign pattern) so the pair set is non-empty
    "dedup_embedding" -> ((s, dir) => {
      val e = embDouble(s, dir).select(col("vec_id"), col("emb_d"))
      val planted = e.unionByName(e.filter(col("vec_id") < 50).select(
        (col("vec_id") + PlantedOffset).as("vec_id"),
        transform(col("emb_d"), x => x * 1.0000001d).as("emb_d")))
      Dedup.embeddingNearDuplicates(planted, "vec_id", "emb_d",
        threshold = 0.99, nbits = 8)
    }),

    // Containment (subsumption) recall: plant the FIRST-HALF token
    // excerpt of every doc with ≥ 12 tokens (token-boundary cut, so the
    // excerpt's 3-gram shingles are a strict subset of the original's and
    // containment is exactly 1.0 by construction — a character cut could
    // shear a token and break the subset property). Candidates come from
    // the df-capped shingle join, so the recall condition is
    // DETERMINISTIC: an excerpt is missed only if every one of its
    // shingles appears in > maxDf documents — false for this corpus
    // (doc-specific prose) and inspectable for any other; no
    // probabilistic banding in the loop at all.
    "dedup_contained_recall" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val eligible = docs
        .select(col("doc_id"), col("text"), Text.tokens(col("text")).as("__t"))
        .filter(size(col("__t")) >= 12)
      val excerpts = eligible.select(
        (col("doc_id") + PlantedOffset).as("doc_id"),
        concat_ws(" ", slice(col("__t"), lit(1),
          floor(size(col("__t")) / 2).cast("int"))).as("text"))
      val corpus = docs.unionByName(excerpts)
      val pairs = Dedup.containedDocuments(corpus, "doc_id", "text",
        threshold = 0.9)
      val base = eligible.select(col("doc_id"))
      base.join(pairs,
        base("doc_id") + PlantedOffset === pairs("contained_id") &&
          pairs("container_id") === base("doc_id") &&
          pairs("containment") === 1.0d, "left_semi")
        .select(col("doc_id"), lit(true).as("found"))
    }),

    // Cross-document duplicated-passage dedup (operators/Passages.scala):
    // exact substring dedup at 6-token window grain. Planted: each donor
    // doc (< 40, ≥ 16 tokens) spawns a twin that copies the donor's first
    // 11 tokens and pads with a doc-unique filler token — a guaranteed
    // partial overlap (6 shared windows ⇒ one merged span of 11 tokens in
    // both docs), while the filler windows stay doc-unique. The oracle
    // replicates the WHOLE pass verbatim (windows by string equality —
    // also re-proving the operator's hash shortcut collision-free on this
    // corpus), so every span boundary hash-compares.
    "dedup_passages" -> ((s, dir) =>
      Passages.duplicatedSpans(passageCorpus(s, dir), "doc_id", "text",
        w = 6, minDocs = 2)),

    // The removal leg: canonical (smallest doc, pos) occurrence keeps its
    // passage, every other occurrence loses it; docs without a foreign
    // span pass through with their original text. Same planted corpus,
    // same verbatim oracle — the cleaned TEXT itself is hash-compared.
    "dedup_passage_clean" -> ((s, dir) =>
      Passages.removePassages(passageCorpus(s, dir), "doc_id", "text",
        w = 6, minDocs = 2)),

    // the curation-dashboard read: how much of the corpus sits inside
    // duplicated passages (docs hit, span tokens, corpus tokens, ratio)
    "dedup_passage_stats" -> ((s, dir) =>
      Passages.duplicationProfile(passageCorpus(s, dir), "doc_id", "text",
        w = 6, minDocs = 2)),

    // Incremental (daily-ingest) passage dedup: three ingest days —
    // donors (< 200), the rest of the base corpus, then the planted
    // twins — each cleaned against the window-hash registry of the
    // PRIOR days plus today's intra-batch pass. The twins' copied
    // prefixes hit the day-0/1 registry and strip even though no donor
    // doc is in their batch; the oracle replays the day-by-day registry
    // semantics verbatim (first-seen day owns each window).
    "dedup_passage_incremental" -> ((s, dir) => {
      val corpus = passageCorpus(s, dir)
      val days = Seq(
        corpus.filter(col("doc_id") < 200),
        corpus.filter(col("doc_id") >= 200 && col("doc_id") < PlantedOffset),
        corpus.filter(col("doc_id") >= PlantedOffset))
      val emptyReg = s.range(0).select(col("id").as("win_hash"))
      val (cleanedAll, _) = days.foldLeft(
        (Seq.empty[DataFrame], emptyReg)) { case ((acc, reg), day) =>
        val (cleaned, newHashes) = Passages.cleanIncremental(
          day, "doc_id", "text", reg, w = 6, minDocs = 2)
        (acc :+ cleaned, reg.unionByName(newHashes))
      }
      cleanedAll.reduce(_ unionByName _)
    }),

    // EXACT set-similarity self-join (operators/SetJoin.scala): prefix
    // filtering under the global (df, token) order with an exact integer
    // accept test. The oracle recomputes the FULL pairwise closure brute
    // force, so the prefix filter's losslessness theorem is itself what
    // the hash compare pins — a missed pair fails the row count. Planted
    // exact copies of docs < 100 guarantee Jaccard-1 pairs exist.
    "dedup_ssjoin_exact" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 250)
        .select("doc_id", "text")
      val corpus = docs.unionByName(
        exactCopy(docs.filter(col("doc_id") < 100), PlantedOffset))
      SetJoin.jaccardSelfJoin(corpus, "doc_id", "text", 80)
    }),

    // SemDeDup recall over planted EXACT copies: an identical vector is
    // assigned the same k-means cell by construction (deterministic argmax
    // over the same trained centroids), so every planted pair must surface
    // from the cell self-join with cos_sim 1.0 REGARDLESS of clustering
    // quality — the structural guarantee that lets the kmeans-cell
    // blocking pipeline sit under the DuckDB oracle even though the
    // centroids themselves aren't SQL-replicable.
    "dedup_semantic_recall" -> ((s, dir) => {
      val e = embDouble(s, dir).select(col("vec_id"), col("emb_d"))
      val planted = e.unionByName(e.filter(col("vec_id") < 50).select(
        (col("vec_id") + PlantedOffset).as("vec_id"), col("emb_d")))
      val pairs = Dedup.semanticNearDuplicates(planted, "vec_id", "emb_d",
        threshold = 0.99)
      val base = e.filter(col("vec_id") < 50).select(col("vec_id"))
      base.join(pairs,
        base("vec_id") === pairs("id_a") &&
          pairs("id_b") === base("vec_id") + PlantedOffset, "left_semi")
        .select(col("vec_id"), lit(true).as("found"))
    }),

    // Incremental (daily-ingest) dedup recall: fresh = an exact copy of
    // every document, registry = the originals plus a planted
    // registry-internal duplicate family (doc_id < 50 copied again at
    // PlantedOffset2). Identical text gives identical MinHash band
    // signatures, so every fresh copy MUST collide with its registry
    // original and verify at jaccard 1.0 — a missed pair drops a row and
    // fails the driver compare. Registry×registry pairs (the planted
    // internal family) staying out of the output is pinned by DedupSpec.
    "dedup_incremental_recall" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val registry = docs.unionByName(
        exactCopy(docs.filter(col("doc_id") < 50), PlantedOffset2))
      val fresh = exactCopy(docs, PlantedOffset)
      val pairs = Dedup.incrementalNearDuplicates(registry, fresh,
        "doc_id", "text", threshold = 0.8)
      val base = docs.select(col("doc_id"))
      base.join(pairs,
        base("doc_id") + PlantedOffset === pairs("id_a") &&
          pairs("id_b") === base("doc_id"), "left_semi")
        .select(col("doc_id"), lit(true).as("found"))
    }),

    // Bloom-prefiltered incremental exact dedup (operators/Bloom.scala):
    // registry = even docs, fresh = odd docs plus planted exact copies
    // of every 10th even doc. The bloom pass has no false negatives and
    // the digest semi-join removes its false positives, so the output
    // is bit-identical to the naive semi-join the oracle runs.
    "dedup_bloom_registry" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val registry = docs.filter(col("doc_id") % 2 === 0)
      val fresh = docs.filter(col("doc_id") % 2 === 1).unionByName(
        exactCopy(docs.filter(col("doc_id") % 10 === 0), PlantedOffset))
      graft.operators.Bloom.registryDups(registry, fresh, "doc_id", "text")
    }))

  /** The planted boilerplate block for dedup_near_adaptive — 60 distinct
    * tokens shared verbatim by every family member (suffix-mutated, so
    * exactGroups cannot collapse the family and the adaptive ladder must
    * handle the density). One Scala constant interpolated into BOTH the
    * Spark fixture and the SQL oracle, so they cannot drift.
    */
  private[registry] val AdaptiveBoiler: String =
    (1 to 60).map(i => "ab" + i).mkString(" ")

  /** The adaptive family's id block (clear of PlantedOffset's copies). */
  private[registry] val DenseFamilyOffset = 2000000L

  /** The portable near-dup PAIR construction as a reusable CTE chain
    * (collapse → signatures → banding → cap → candidates → jaccard →
    * expansion), parameterized by the corpus SELECT; ends with an
    * `ndpairs(id_a, id_b, jaccard)` CTE. dedup_near consumes it
    * directly; pipeline_split_neardup chains connected components and
    * the hash split on top.
    */
  private[registry] def sqlNearDupPairCtes(corpusSelect: String): String = {
    val mins = (0 until 16).map(i => s"MIN(h1 + $i * h2) AS m$i").mkString(", ")
    val bandSel = (0 until 4).map { b =>
      val key = (b * 4 until b * 4 + 4)
        .map(i => s"CAST(m$i AS VARCHAR)").mkString(" || ':' || ")
      s"SELECT doc_id, $b AS band, $key AS sig FROM sigs"
    }.mkString(" UNION ALL ")
    s"""corpus AS ($corpusSelect),
         grp AS (SELECT doc_id, text,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
                 FROM corpus),
         members AS (SELECT rep, doc_id FROM grp),
         reps AS (SELECT doc_id, text FROM grp WHERE doc_id = rep),
         toks AS (SELECT doc_id, ${sqlTokens("text")} AS ts FROM reps),
         sh AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, greatest(len(ts) - 2, 1)),
                    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS shingle
                FROM toks),
         hs AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h1,
                  CAST(('0x' || substr(md5(shingle), 16, 15)) AS BIGINT)
                    & 36028797018963967 AS h2
                FROM sh),
         sigs AS (SELECT doc_id, $mins FROM hs GROUP BY 1),
         bs AS ($bandSel),
         ok AS (SELECT band, sig FROM bs GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
         capped AS (SELECT bs.* FROM bs JOIN ok USING (band, sig)),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM capped a JOIN capped b USING (band, sig)
                  WHERE a.doc_id < b.doc_id),
         sets AS (SELECT doc_id,
                    list_distinct(list_transform(generate_series(1, greatest(len(ts) - 2, 1)),
                      i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS st
                  FROM toks),
         j AS (SELECT c.id_a, c.id_b,
                 round(CAST(len(list_distinct(list_intersect(a.st, b.st))) AS DOUBLE)
                       / len(list_distinct(list_concat(a.st, b.st))), 6) AS jaccard
               FROM cand c JOIN sets a ON a.doc_id = c.id_a
                 JOIN sets b ON b.doc_id = c.id_b),
         jf AS (SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5),
         ndpairs AS (
           SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                  greatest(ma.doc_id, mb.doc_id) AS id_b, jf.jaccard
           FROM jf JOIN members ma ON jf.id_a = ma.rep
                   JOIN members mb ON jf.id_b = mb.rep
           UNION ALL
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(1.0 AS DOUBLE) AS jaccard
           FROM members a JOIN members b
             ON a.rep = b.rep AND a.doc_id < b.doc_id)"""
  }

  val oracleSql: Map[String, String] = Map(

    "er_entities" ->
      """WITH RECURSIVE
         base AS (SELECT c_custkey AS id,
                    c_name || '#' || CAST(c_nationkey AS VARCHAR) || '#' || c_mktsegment AS name
                  FROM customer),
         dups AS (SELECT id + 1000000 AS id,
                    substr(name, 1, 4) || '@' || substr(name, 6) AS name
                  FROM base WHERE id % 5 = 0),
         all_recs AS (SELECT * FROM base UNION ALL SELECT * FROM dups),
         e AS (SELECT a.id AS src, b.id AS dst
               FROM all_recs a JOIN all_recs b
                 ON a.id <> b.id AND levenshtein(a.name, b.name) <= 1),
         r(node, m) AS (
           SELECT src, src FROM (SELECT DISTINCT src FROM e)
           UNION
           SELECT r.node, e.dst FROM r JOIN e ON r.m = e.src),
         comp AS (SELECT node, MIN(m) AS component FROM r GROUP BY 1)
         SELECT ar.id AS customer_id, COALESCE(c.component, ar.id) AS entity_id
         FROM all_recs ar LEFT JOIN comp c ON ar.id = c.node""",
    "dedup_exact" ->
      """SELECT sha256(text) AS content_sha, MIN(doc_id) AS keep_id,
                CAST(COUNT(*) AS BIGINT) AS dup_count
         FROM documents GROUP BY 1""",
    // the windowed-polynomial Gear hash, boundary test, chunk extents,
    // and md5 digests replayed without recursion (16-term self-join)
    "dedup_cdc_chunks" ->
      s"""WITH d AS (SELECT doc_id, text, len(text) AS n FROM documents),
         $SqlCdcWalk
         SELECT ch.doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(startpos AS BIGINT) AS start_pos,
                CAST(endpos - startpos + 1 AS BIGINT) AS chunk_len,
                md5(substr(d.text, CAST(startpos + 1 AS INTEGER),
                           CAST(endpos - startpos + 1 AS INTEGER))) AS chunk_md5
         FROM ch JOIN d ON ch.doc_id = d.doc_id""",
    // the L-gram coverage and the cumulative-running-max interval merge
    // replayed verbatim (50-char md5 grams, window per doc)
    "dedup_substring_spans" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000 AS doc_id, text FROM documents
             WHERE doc_id < 50),
         grams AS (SELECT doc_id, i AS p,
                     md5(substr(text, CAST(i+1 AS INTEGER), 50)) AS g
                   FROM corpus, unnest(range(0, len(text) - 50 + 1)) AS ui(i)
                   WHERE len(text) >= 50),
         dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         dp AS (SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)),
         fl AS (SELECT doc_id, p,
                  CASE WHEN p > COALESCE(MAX(p + 49) OVER (PARTITION BY doc_id
                    ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 1 ELSE 0 END AS new_span
                FROM dp),
         sp AS (SELECT doc_id, p,
                  SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
                FROM fl)
         SELECT doc_id, MIN(p) AS span_start, MAX(p) + 49 AS span_end,
                MAX(p) + 49 - MIN(p) + 1 AS span_len,
                CAST(COUNT(*) AS BIGINT) AS n_grams
         FROM sp GROUP BY doc_id, span_id""",
    // the spans chain extended with the gap reconstruction: lag window
    // builds the inter-span segments, string_agg stitches them in order
    "dedup_substring_clean" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000 AS doc_id, text FROM documents
             WHERE doc_id < 50),
         grams AS (SELECT doc_id, i AS p,
                     md5(substr(text, CAST(i+1 AS INTEGER), 50)) AS g
                   FROM corpus, unnest(range(0, len(text) - 50 + 1)) AS ui(i)
                   WHERE len(text) >= 50),
         dup AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         dp AS (SELECT doc_id, p FROM grams WHERE g IN (SELECT g FROM dup)),
         fl AS (SELECT doc_id, p,
                  CASE WHEN p > COALESCE(MAX(p + 49) OVER (PARTITION BY doc_id
                    ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -2) + 1
                  THEN 1 ELSE 0 END AS new_span
                FROM dp),
         sp AS (SELECT doc_id, p,
                  SUM(new_span) OVER (PARTITION BY doc_id ORDER BY p) AS span_id
                FROM fl),
         spans AS (SELECT doc_id, MIN(p) AS a, MAX(p) + 49 AS b
                   FROM sp GROUP BY doc_id, span_id),
         segs AS (
           SELECT doc_id,
             COALESCE(lag(b) OVER (PARTITION BY doc_id ORDER BY a) + 1, 0) AS ga,
             a - 1 AS gb
           FROM spans
           UNION ALL
           SELECT s.doc_id, MAX(s.b) + 1 AS ga, MAX(len(c.text)) - 1 AS gb
           FROM spans s JOIN corpus c ON s.doc_id = c.doc_id GROUP BY s.doc_id),
         kept AS (SELECT s.doc_id,
                    string_agg(CASE WHEN gb >= ga
                      THEN substr(c.text, CAST(ga + 1 AS INTEGER),
                                  CAST(gb - ga + 1 AS INTEGER))
                      ELSE '' END, '' ORDER BY ga) AS clean
                  FROM segs s JOIN corpus c ON s.doc_id = c.doc_id
                  GROUP BY s.doc_id),
         rem AS (SELECT doc_id, SUM(b - a + 1) AS n_removed
                 FROM spans GROUP BY doc_id)
         SELECT c.doc_id, CAST(len(c.text) AS BIGINT) AS n_chars,
                CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
                CAST(len(c.text) - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept,
                md5(COALESCE(k.clean, c.text)) AS clean_md5
         FROM corpus c LEFT JOIN rem r ON c.doc_id = r.doc_id
         LEFT JOIN kept k ON c.doc_id = k.doc_id""",
    // the same chunk walk over the planted-twin corpus, regrouped by digest
    "dedup_cdc_shared" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents
                WHERE doc_id < 50),
         d AS (SELECT doc_id, text, len(text) AS n FROM corpus),
         $SqlCdcWalk,
         chunks AS (SELECT ch.doc_id,
                      md5(substr(d.text, CAST(startpos + 1 AS INTEGER),
                                 CAST(endpos - startpos + 1 AS INTEGER))) AS chunk_md5
                    FROM ch JOIN d ON ch.doc_id = d.doc_id)
         SELECT chunk_md5, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                MIN(doc_id) AS first_doc
         FROM chunks GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2""",
    "dedup_jaccard_pairs" ->
      s"""WITH toks AS (SELECT doc_id, ${sqlTokens("text")} AS ts FROM documents),
         sh AS (SELECT doc_id,
                  list_transform(generate_series(1, greatest(len(ts) - 2, 1)),
                                 i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])) AS sl
                FROM toks),
         sets AS (SELECT doc_id, list_distinct(sl) AS st FROM sh)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                round(CAST(len(list_distinct(list_intersect(a.st, b.st))) AS DOUBLE)
                      / len(list_distinct(list_concat(a.st, b.st))), 6) AS jaccard
         FROM sets a JOIN sets b ON b.doc_id = a.doc_id + 1 AND a.doc_id % 2 = 0""",

    // full verbatim replay of the PORTABLE minhash near-dup pass with the
    // exact-duplicate collapse (VERDICT r13 #1a): group verbatim copies by
    // digest and run the pipeline at representative grain — one md5 per
    // shingle → (h1, h2) halves → 16 double-hash mins → 4 string band
    // keys → ≤10000 bucket cap → candidate self-join → jaccard ≥ 0.5 —
    // then expand rep pairs to member pairs (within-group pairs are
    // jaccard 1.0 by construction)
    "dedup_near" ->
      s"""WITH ${sqlNearDupPairCtes(
           """SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text || ' graft dup marker' FROM documents""")}
         SELECT id_a, id_b, jaccard FROM ndpairs""",
    // the adaptive twin: the shingle-density measurement, the CASE
    // ladder, and band keys sliced by the CHOSEN rows-per-band all
    // replay — the band CTE slices the 16-minhash list dynamically, so
    // a drifted parameter choice changes every join key
    "dedup_near_adaptive" -> {
      val mins = (0 until 16).map(i => s"MIN(h1 + $i * h2) AS m$i").mkString(", ")
      val mhList = (0 until 16).map(i => s"m$i").mkString("[", ", ", "]")
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id < 20
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 10
           UNION ALL
           SELECT id + $DenseFamilyOffset AS doc_id,
                  '$AdaptiveBoiler tail ' || CAST(id AS VARCHAR) || ' suffix' AS text
           FROM range(400) t(id)),
         grp AS (SELECT doc_id, text,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
                 FROM corpus),
         members AS (SELECT rep, doc_id FROM grp),
         reps AS (SELECT doc_id, text FROM grp WHERE doc_id = rep),
         toks AS (SELECT doc_id, ${sqlTokens("text")} AS ts FROM reps),
         sh AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, greatest(len(ts) - 2, 1)),
                    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS shingle
                FROM toks),
         params AS (SELECT CASE WHEN COUNT(*) // COUNT(DISTINCT shingle) <= 1 THEN 4
                                WHEN COUNT(*) // COUNT(DISTINCT shingle) <= 3 THEN 8
                                ELSE 16 END AS r FROM sh),
         hs AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h1,
                  CAST(('0x' || substr(md5(shingle), 16, 15)) AS BIGINT)
                    & 36028797018963967 AS h2
                FROM sh),
         sigs AS (SELECT doc_id, $mins FROM hs GROUP BY 1),
         mh AS (SELECT doc_id, $mhList AS ml FROM sigs),
         bs AS (SELECT doc_id, b AS band,
                  array_to_string(ml[CAST(b * r + 1 AS INTEGER) : CAST((b + 1) * r AS INTEGER)], ':') AS sig
                FROM mh, params, unnest(range(0, 16 // r)) AS ub(b)),
         ok AS (SELECT band, sig FROM bs GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
         capped AS (SELECT bs.* FROM bs JOIN ok USING (band, sig)),
         cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                  FROM capped a JOIN capped b USING (band, sig)
                  WHERE a.doc_id < b.doc_id),
         sets AS (SELECT doc_id,
                    list_distinct(list_transform(generate_series(1, greatest(len(ts) - 2, 1)),
                      i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS st
                  FROM toks),
         j AS (SELECT c.id_a, c.id_b,
                 round(CAST(len(list_distinct(list_intersect(a.st, b.st))) AS DOUBLE)
                       / len(list_distinct(list_concat(a.st, b.st))), 6) AS jaccard
               FROM cand c JOIN sets a ON a.doc_id = c.id_a
                 JOIN sets b ON b.doc_id = c.id_b),
         jf AS (SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5),
         ndpairs AS (
           SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                  greatest(ma.doc_id, mb.doc_id) AS id_b, jf.jaccard
           FROM jf JOIN members ma ON jf.id_a = ma.rep
                   JOIN members mb ON jf.id_b = mb.rep
           UNION ALL
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(1.0 AS DOUBLE) AS jaccard
           FROM members a JOIN members b
             ON a.rep = b.rep AND a.doc_id < b.doc_id)
         SELECT id_a, id_b, jaccard FROM ndpairs""" },
    // full verbatim replay of the PORTABLE 60-bit simhash pass: one md5
    // per token → 60 bit votes → sign bits → 4×16-bit banding → cap →
    // Hamming ≤ 3 verify
    "dedup_simhash" -> {
      val votes = (0 until 60)
        .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j")
        .mkString(", ")
      val sig = (0 until 60)
        .map(j => s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END")
        .mkString(" + ")
      val bandSel = (0 until 4)
        .map(b => s"SELECT doc_id, s, $b AS band, (s >> ${b * 16}) & 65535 AS sig FROM sig")
        .mkString(" UNION ALL ")
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, text || ' graft dup marker' FROM documents),
         grp AS (SELECT doc_id, text,
                   MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
                 FROM corpus),
         members AS (SELECT rep, doc_id FROM grp),
         reps AS (SELECT doc_id, text FROM grp WHERE doc_id = rep),
         toks AS (SELECT doc_id, ${sqlTokens("text")} AS ts FROM reps),
         th AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
                FROM (SELECT doc_id, unnest(ts) AS t FROM toks)),
         v AS (SELECT doc_id, $votes FROM th GROUP BY 1),
         sig AS (SELECT doc_id, CAST($sig AS BIGINT) AS s FROM v),
         bs AS ($bandSel),
         ok AS (SELECT band, sig FROM bs GROUP BY 1, 2 HAVING COUNT(*) <= 10000),
         capped AS (SELECT bs.* FROM bs JOIN ok USING (band, sig)),
         rp AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
                FROM capped a JOIN capped b USING (band, sig)
                WHERE a.doc_id < b.doc_id AND bit_count(xor(a.s, b.s)) <= 3)
         SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                greatest(ma.doc_id, mb.doc_id) AS id_b, rp.hamming
         FROM rp JOIN members ma ON rp.id_a = ma.rep
                 JOIN members mb ON rp.id_b = mb.rep
         UNION ALL
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(0 AS INTEGER) AS hamming
         FROM members a JOIN members b
           ON a.rep = b.rep AND a.doc_id < b.doc_id"""
    },
    // planted-truth recall oracles: ground truth by construction (see the
    // matching queries' scaladoc) — a missed planted pair changes the row
    // set and fails the driver's rows/hash compare
    "dedup_near_recall" ->
      "SELECT doc_id, true AS found FROM documents",
    "dedup_clusters_recall" ->
      "SELECT doc_id, true AS same_cluster FROM documents",
    "dedup_dropped_recall" ->
      "SELECT doc_id, true AS dropped FROM documents",
    "dedup_simhash_recall" ->
      "SELECT doc_id, CAST(0 AS INTEGER) AS hamming FROM documents",
    // fuzzy join planted truth: every 1-edit mutation found at distance 1
    "dedup_fuzzy_recall" ->
      "SELECT doc_id, true AS found FROM documents",
    "dedup_semantic_recall" ->
      "SELECT vec_id, true AS found FROM embeddings WHERE vec_id < 50",
    "dedup_contained_recall" ->
      s"""SELECT doc_id, true AS found
         FROM (SELECT doc_id, ${sqlTokens("text")} AS ts FROM documents)
         WHERE len(ts) >= 12""",
    "dedup_incremental_recall" ->
      "SELECT doc_id, true AS found FROM documents",
    // full verbatim replay of the duplicated-passage pass (string-equality
    // windows — also certifies the operator's xxhash64 shortcut)
    "dedup_passages" ->
      s"""${sqlPassageSpans(s"""$sqlPassageCtes,
         flag AS (SELECT win FROM wins
                  GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
         hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN flag f USING (win))""")}
         SELECT doc_id, span_start, span_end,
                span_end - span_start + 1 AS span_tokens
         FROM spans""",
    "dedup_passage_clean" ->
      sqlPassageCleanSql(s"""$sqlPassageCtes,
         own AS (SELECT win, MIN(doc_id) AS odoc FROM wins
                 GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
         own2 AS (SELECT w.win, o.odoc, MIN(w.pos) AS opos
                  FROM wins w JOIN own o
                    ON w.win = o.win AND w.doc_id = o.odoc
                  GROUP BY 1, 2),
         hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN own2 o USING (win)
                  WHERE NOT (w.doc_id = o.odoc AND w.pos = o.opos))"""),
    // the span report re-aggregated + one token count + ONE division
    "dedup_passage_stats" ->
      s"""${sqlPassageSpans(s"""$sqlPassageCtes,
         flag AS (SELECT win FROM wins
                  GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
         hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN flag f USING (win))""")},
         sa AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_with_dups,
                       CAST(COALESCE(SUM(span_end - span_start + 1), 0) AS BIGINT) AS dup_tokens
                FROM spans),
         ta AS (SELECT CAST(COALESCE(SUM(len(ts)), 0) AS BIGINT) AS total_tokens FROM toks)
         SELECT sa.docs_with_dups, sa.dup_tokens, ta.total_tokens,
                CASE WHEN ta.total_tokens > 0 THEN
                  round(CAST(sa.dup_tokens AS DOUBLE) /
                        CAST(ta.total_tokens AS DOUBLE), 6) END AS dup_token_ratio
         FROM sa CROSS JOIN ta""",
    // day-by-day registry replay: the first-seen day owns each window;
    // later days strip every occurrence, the owning day applies the
    // intra-batch canonical rule
    "dedup_passage_incremental" -> sqlPassageIncrementalOracle,
    // bloom prefilter + exact verify == the naive digest semi-join
    "dedup_bloom_registry" ->
      s"""WITH reg AS (SELECT DISTINCT sha256(text) AS content_sha
                 FROM documents WHERE doc_id % 2 = 0),
         fresh AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
                   UNION ALL
                   SELECT doc_id + 1000000 AS doc_id, text
                   FROM documents WHERE doc_id % 10 = 0)
         SELECT f.doc_id, sha256(f.text) AS content_sha
         FROM fresh f JOIN reg ON sha256(f.text) = reg.content_sha""",
    // brute-force pairwise closure — the prefix filter must reproduce it
    "dedup_ssjoin_exact" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id < 250
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 100),
         sets AS (SELECT doc_id, unnest(list_distinct(${sqlTokens("lower(text)")})) AS w
                  FROM corpus),
         lens AS (SELECT doc_id, COUNT(*) AS len FROM sets GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS isect
                   FROM sets a JOIN sets b ON a.w = b.w AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, isect, la.len + lb.len - isect AS union_size,
                round(CAST(isect AS DOUBLE) / (la.len + lb.len - isect), 6) AS jaccard
         FROM inter JOIN lens la ON la.doc_id = id_a
                    JOIN lens lb ON lb.doc_id = id_b
         WHERE 100 * isect >= 80 * (la.len + lb.len - isect)""",
    "dedup_embedding" ->
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         e AS (SELECT vec_id, v FROM e0
               UNION ALL
               SELECT vec_id + 1000000, list_transform(v, x -> x * 1.0000001) FROM e0 WHERE vec_id < 50),
         b AS (SELECT vec_id, v,
                 (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END) + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
               + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END) + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
               + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END) + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END)
               + (CASE WHEN v[7] > 0 THEN 64 ELSE 0 END) + (CASE WHEN v[8] > 0 THEN 128 ELSE 0 END) AS sig
               FROM e)
         SELECT id_a, id_b, cos_sim FROM (
           SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                  round(${sqlCosine("a.v", "b2.v")}, 6) AS cos_sim
           FROM b a JOIN b b2 ON a.sig = b2.sig AND a.vec_id < b2.vec_id)
         WHERE cos_sim >= 0.99""",
    // source-priority exact dedup: the same digest window, ordered
    // (source, doc_id) — mirrors drop, curated copies survive
    "dedup_priority" ->
      """WITH corpus AS (
           SELECT doc_id, source, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000, 'zz-mirror', text FROM documents
           WHERE doc_id < 100),
         r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY sha256(text)
                   ORDER BY source, doc_id) AS rn
               FROM corpus)
         SELECT doc_id, source FROM r WHERE rn = 1""",
    "dedup_near_valid" ->
      """SELECT true AS pairs_ordered, true AS pairs_distinct,
                true AS scores_in_range, true AS ids_in_corpus""",
    "dedup_simhash_valid" ->
      """SELECT true AS pairs_ordered, true AS pairs_distinct,
                true AS scores_in_range, true AS ids_in_corpus""")
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import graft.operators.{Dedup, Grouping, LanguageModel, Pack, Passages, Sampling, SetJoin, Similarity, Skew, Upsert}
import graft.functions.Text
import graft.pipeline.Pipeline
import graft.sources.{Tables, TestdataAdapter}
import graft.transform.Kpis
import graft.validate.{Rules, TableRules}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-data-pipeline
  * extensions, §7.5) is exposed as a named query over the driver testdata
  * (FIXTURES.md §B mapping), with a DuckDB oracle twin in `oracleSql` where
  * SQL-expressible. Column names/aliases match between the Spark result and
  * the oracle; double aggregates go through exact decimal sums
  * (graft.transform.Kpis.moneySum) or IEEE-deterministic division +
  * round(…, 6), so both engines produce bit-identical values. Queries whose
  * math is not DuckDB-replicable (xxhash64-based signatures, PRNG
  * hyperplanes, uuid) have no oracle entry → the driver records the weaker
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("a1_category_kpis")(spark, "/root/testdata/sf0.001")

  /** The enrichment join shared by the KPI queries (reference
    * transform.py:311-323).
    */
  private def enriched(s: SparkSession, dir: String): DataFrame =
    Kpis.enrich(
      TestdataAdapter.orders(s, dir),
      TestdataAdapter.orderItems(s, dir),
      TestdataAdapter.products(s, dir))

  // ---- validation rule configs for the testdata tables (SURVEY §2.7;
  // per-table business rules mirror validate.py:31-47,220-243) ----

  private val cfgOrders = TableRules(
    table = "orders",
    expectedColumns = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    uniqueKey = Seq("o_orderkey"),
    requiredColumns = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"),
    statusColumn = Some("o_orderstatus"),
    validStatuses = Seq("P", "O", "F"),
    nonNegativeColumns = Seq("o_totalprice"),
    integralColumns = Seq("o_orderkey"))

  private val cfgLineitem = TableRules(
    table = "lineitem",
    expectedColumns = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    uniqueKey = Seq("l_orderkey", "l_linenumber"),
    requiredColumns = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
    statusColumn = Some("l_returnflag"),
    validStatuses = Seq("N", "A", "R"),
    nonNegativeColumns = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    integralColumns = Seq("l_linenumber"))

  /** Deterministically injected violations over orders (for
    * v_rules_violations): bad status every 10th key, negative price every
    * 7th, null user every 13th, duplicated rows every 11th.
    */
  private def mutatedOrders(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(s, dir)
      .withColumn("o_custkey",
        when(col("o_orderkey") % 13 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 10 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
    m.unionByName(m.filter(col("o_orderkey") % 11 === 0))
  }

  /** Planted-corpus building blocks — every planted-truth oracle derives
    * its ground truth from these (an id at `base + offset` is a copy of the
    * id at `base`, by construction). ONE definition of the offsets and the
    * mutation marker: the recall oracles hardcode the same arithmetic, so a
    * drifting copy of the construction would silently break them.
    */
  private[graft] val PlantedOffset = 1000000L   // primary planted copy
  private[graft] val PlantedOffset2 = 2000000L  // secondary copy (fingerprint)
  private val PlantedMarker = " graft dup marker"

  /** A verbatim copy of `docs` with ids shifted by `offset`. */
  private def exactCopy(docs: DataFrame, offset: Long): DataFrame =
    docs.select((col("doc_id") + offset).as("doc_id"), col("text"))

  /** Integer token/vocabulary counts per document (whitespace tokens of
    * the lowercased text — the sqlTokens convention): the all-integer
    * quality signal the shard/budget/adaptive-gate queries rank on, so
    * their total orders never involve float comparison.
    */
  private def docTokenVocab(docs: DataFrame): DataFrame = {
    val toks = filter(split(trim(lower(col("text"))), "\\s+"),
      t => length(t) > 0)
    docs.select(col("doc_id"), col("source"),
      size(toks).cast("long").as("n_toks"),
      size(array_distinct(toks)).cast("long").as("n_vocab"))
  }

  /** The planted linearly-separable quality corpus: every doc keeps its
    * REAL text plus a class marker token (qpos for odd ids, qneg for
    * even) repeated proportionally to the document's own length — at
    * least 3 times, and at least a quarter of the word count — plus the
    * matching 0/1 label. The proportional repeat (ADVICE r08) keeps the
    * marker a constant FRACTION of the hashed-tf feature mass (~1/5)
    * instead of a 3/len signal that fades on longer documents, so the
    * oracle pins converged classification, not a corpus-specific
    * convergence margin. Separable by construction, so a converged
    * classifier must reproduce the labels exactly (the t_quality_train /
    * st_quality_score oracle).
    */
  private def qualityLabeled(s: SparkSession, dir: String): DataFrame = {
    // reps counts via Text.tokens — the SAME tokenization Classify.features
    // hashes (ADVICE r09: a whitespace split diverges on punctuation-heavy
    // docs, eroding the documented constant marker fraction)
    val reps = greatest(lit(3),
      (size(Text.tokens(lower(col("text")))) / 4).cast("int"))
    Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 2 === 1, repeat(lit(" qpos"), reps))
          .otherwise(repeat(lit(" qneg"), reps))).as("text"),
      (col("doc_id") % 2).cast("int").as("label"))
  }

  /** documents ∪ a planted partial-overlap twin per donor doc (< 40, ≥ 16
    * tokens): the twin copies the donor's FIRST 11 tokens and pads with 5
    * repeats of a doc-unique filler token. Under 6-token windows, exactly
    * the donor-prefix windows (positions 1-6) are shared cross-doc; every
    * filler-touching window is unique to the twin. The planted corpus for
    * the duplicated-passage queries.
    */
  private def passageCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select("doc_id", "text")
    val donors = base
      .select(col("doc_id"), Text.tokens(col("text")).as("__t"))
      .filter(col("doc_id") < 40 && size(col("__t")) >= 16)
    val planted = donors.select(
      (col("doc_id") + PlantedOffset).as("doc_id"),
      concat_ws(" ",
        concat(slice(col("__t"), 1, 11),
          array_repeat(
            format_string("uniq%d", col("doc_id") + PlantedOffset),
            5))).as("text"))
    base.unionByName(planted)
  }

  /** A suffix-mutated (near-duplicate) copy of `docs`, ids shifted. */
  private def mutatedCopy(docs: DataFrame, offset: Long): DataFrame =
    docs.select((col("doc_id") + offset).as("doc_id"),
      concat(col("text"), lit(PlantedMarker)).as("text"))

  /** documents ∪ a near-duplicate copy (suffix-mutated, shifted ids) — the
    * planted-duplicates corpus for the near-dup queries (package-visible:
    * graft.Profile profiles the same corpus the queries run).
    */
  private[graft] def docsWithPlantedDups(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    docs.unionByName(mutatedCopy(docs, PlantedOffset))
  }

  /** embeddings with the float vector cast to double — keeps the Spark fold
    * and the DuckDB list_dot_product in the same precision.
    */
  /** The shared end-to-end curation run behind pipeline_curate /
    * pipeline_curate_report: planted exact-dup family (every 5th doc
    * copied at PlantedOffset — the dedup stage must remove them), en-only
    * language keep, perplexity cut at 30.5, a 3000-BPE-token mixture over
    * four sources, 256-token sequences.
    */
  // memoized per (session, dir): pipeline_curate and its report would
  // otherwise each re-run the whole 6-stage DAG and double the retained
  // cache footprint (code-review r7g) — the frames are lazy plans over
  // session-lived persisted intermediates, safe to share. The memo DROPS
  // with Caches.clear(): the shared frames' persist markers die there, and
  // a memo that outlives them re-executes the stage fan-out uncached every
  // time (measured 2× on pipeline_curate under the bench's clear-per-run
  // protocol, round 8) — same lifetime coupling as Similarity's centroid
  // cache.
  private val curationCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String),
      graft.pipeline.CurationResult]()
  graft.util.Caches.onClear(() => curationCache.clear())

  private def curationOf(s: SparkSession, dir: String): graft.pipeline.CurationResult =
    curationCache.compute((s, dir), (_, prev) =>
      // liveness check: spark.catalog.clearCache() (the bench protocol)
      // strips the memoized run's persist entries without going through
      // Caches.clear — serving the stale memo then re-executes the stage
      // fan-out uncached on every reference. kept is one of the run's two
      // persisted frames; NONE means the memo is dead.
      if (prev != null && prev.kept.storageLevel !=
        org.apache.spark.storage.StorageLevel.NONE) prev
      else curationRun(s, dir))

  private def curationRun(s: SparkSession, dir: String): graft.pipeline.CurationResult = {
    val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
    val corpus = docs.unionByName(docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + PlantedOffset).as("doc_id"),
        col("source"), col("text")))
    graft.pipeline.Pipeline.curate(corpus, "doc_id", "text", "source",
      langKeep = Seq("en"), pplCutoff = 30.5, budget = 3000L,
      weights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
      seqBudget = 256L)
  }

  /** One drained CurateStream run per (session, sfDir): st_curate and
    * st_curate_report read the published artifacts of the SAME drained
    * stream instead of each paying a 3-trigger replay of the identical
    * DAG (the jointKpiRoots recipe). The memoized value is the stream's
    * work dir (paths on disk, no persisted frames — no liveness check
    * needed); entries drop with Caches.clear so a bench clear-per-run
    * protocol re-drains rather than serving a deleted scratch dir.
    */
  private val curateStreamRoots =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  graft.util.Caches.onClear(() => curateStreamRoots.clear())

  /** Replay the pipeline_curate corpus (planted every-5th exact dups at
    * +PlantedOffset) as three ascending-doc_id ingest days through the
    * full streaming curation DAG ([[graft.streaming.CurateStream]]) and
    * return the drained work dir. Ascending day splits make cross-batch
    * first-seen-wins equal the batch DAG's min-id canonical rule, so the
    * published artifacts answer pipeline_curate's oracle VERBATIM.
    */
  private def curateStreamRoot(s: SparkSession, dir: String): String =
    curateStreamRoots.computeIfAbsent((s, dir), { _ =>
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, dir).select("doc_id", "source", "text")
      val corpus = docs.unionByName(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + PlantedOffset).as("doc_id"),
            col("source"), col("text")))
        .select(col("doc_id"), col("source").as("domain"), col("text"))
      val days = Seq(
        corpus.filter(col("doc_id") < 200),
        corpus.filter(col("doc_id") >= 200 && col("doc_id") < PlantedOffset),
        corpus.filter(col("doc_id") >= PlantedOffset))
      val stage = tmpDir("graft_stcur_in")
      days.zipWithIndex.foreach { case (d, i) =>
        val sub = s"$stage/d$i"
        d.coalesce(1).write.mode("overwrite").parquet(sub)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(sub))
          .iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime
              .fromMillis(1700000000000L + i * 600000L)))
      }
      val (work, cp) = (tmpDir("graft_stcur_work"), tmpDir("graft_stcur_cp"))
      val cfg = graft.streaming.CurateConfig(langKeep = Seq("en"),
        pplCutoff = 30.5, budget = 3000L,
        weights = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
        seqBudget = 256L)
      val schema = s.read.parquet(s"$stage/d0").schema
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$stage/d*")
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch(graft.streaming.CurateStream.curateBatch(work, cfg) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      work
    })

  /** One 256-merge BPE training run per (session, sfDir), shared by the
    * prefix-replay and shape queries. bpeTrainMerges returns a
    * driver-list-backed frame (the merge decisions ARE driver metadata),
    * so the memo holds no persisted plans and needs no liveness check;
    * entries drop with Caches.clear like every operator memo.
    */
  private val bpe256Cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  graft.util.Caches.onClear(() => bpe256Cache.clear())

  /** Spark-side twin of [[sqlBpeRichRel]]: the vocabulary-rich deep-BPE
    * training corpus (documents text + two doc_id-derived numeric words).
    */
  // doc_id reduced mod 1e9 BEFORE the Knuth multiply: scaled-up corpora
  // (ScaleUp's key-offset copies) carry doc_ids large enough that the
  // raw product overflows a long under ANSI mode (found at sf1)
  private def bpeRichCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(concat(col("text"), lit(" "),
      (((col("doc_id") % 1000000000L) * 2654435761L) % 1000000000L)
        .cast("string"), lit(" "),
      ((((col("doc_id") % 100000L) + 7L) * 40503L) % 100000L)
        .cast("string")).as("text"))

  private def bpe256(s: SparkSession, dir: String): DataFrame =
    bpe256Cache.computeIfAbsent((s, dir), _ =>
      Text.bpeTrainMerges(bpeRichCorpus(s, dir), "text", nMerges = 256))

  /** Spark-side twin of [[sqlBpeBytesRel]]: documents text plus one
    * non-ASCII word per document — the byte-BPE fixture corpus.
    */
  private def bpeBytesCorpus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(concat(col("text"), lit(" über"),
      (col("doc_id") % 7L).cast("string")).as("text"))

  private def embDouble(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).withColumn("emb_d",
      transform(col("embedding"), x => x.cast("double")))

  /** The FIXED prime-log piece table behind t_unigram_segment: every
    * lowercase letter/digit plus six common bigrams, each scored
    * log(prime) with a distinct prime. Distinct paths multiply distinct
    * prime sets, so path scores are tie-free by unique factorization
    * (bigram primes sit away from their char-prime products — "er"'s 673
    * vs 11·61 = 671 is the closest pair, a 0.3% log gap, far above float
    * noise). ONE source of truth: the Scala map and the SQL VALUES list
    * below both derive from this sequence, so they cannot diverge.
    */
  private val unigramPrimes: Seq[(String, Int)] = {
    val letterPrimes = Seq(2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41,
      43, 47, 53, 59, 61, 67, 71, 73, 79, 83, 89, 97, 101)
    val digitPrimes = Seq(103, 107, 109, 113, 127, 131, 137, 139, 149, 151)
    ('a' to 'z').map(_.toString).zip(letterPrimes) ++
      ('0' to '9').map(_.toString).zip(digitPrimes) ++
      Seq("th" -> 1361, "he" -> 211, "in" -> 991, "er" -> 673,
        "an" -> 89, "re" -> 677)
  }

  private lazy val unigramFixedTable: Map[String, Double] =
    unigramPrimes.map { case (p, n) => p -> math.log(n.toDouble) }.toMap

  /** DuckDB VALUES twin of [[unigramFixedTable]] — ln(prime) evaluates
    * engine-side, so both engines' doubles agree to libm rounding and the
    * round-6 output absorbs the residue.
    */
  private lazy val sqlUnigramPieces: String =
    unigramPrimes.map { case (p, n) => s"('$p', ln($n))" }.mkString(", ")

  /** Oracle twin of Unigram.segmentWords under [[unigramFixedTable]]:
    * exhaustive lattice-path enumeration by recursive CTE, the same
    * path-order left-fold score, the same (score desc, fewer pieces, lex
    * path) argmax; ends in `useg(word, pieces, n_pieces, score)`. Shared
    * by t_unigram_segment and pipeline_unigram_pack.
    */
  private lazy val sqlUnigramSegCtes: String =
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
  private def unigramTrainValid(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val emIters = 3
    val m = graft.operators.Unigram.train(docs, "text", vocabSize = 96,
      maxPieceLen = 6, seedSize = 256, emIters = emIters)
    val corpusChars = graft.operators.Unigram.wordCounts(docs, "text")
      .select(explode(split(col("word"), "")).as("c"))
      .filter(length(col("c")) === 1)
      .distinct().as[String].collect().toSet
    val singles = m.logp.keySet.filter(_.length == 1)
    val pre = m.llTrace.take(emIters)
    val nonDec = pre.zip(pre.tail).forall { case (a, b) =>
      b >= a - 1e-6 * math.abs(a) }
    val covered = corpusChars.subsetOf(singles)
    val bounded = m.logp.size <= math.max(96, singles.size)
    val mass = m.logp.values.map(math.exp).sum
    Seq((m.llTrace.length.toLong, nonDec, covered, bounded,
      math.abs(mass - 1.0) < 1e-6))
      .toDF("ll_len", "ll_nondecreasing", "singles_covered",
        "vocab_bounded", "probs_normalized")
  }

  /** Structural validity of a top-k result (VERDICT r09 #7 — the
    * derived-invariant oracle for seeded-hash outputs DuckDB cannot
    * replay): per query, ranks must be exactly 1..n with n ≤ k, the
    * score must be monotone along rank, and neighbors must be distinct
    * and drawn from the corpus id set. Every flag is computed from the
    * ACTUAL result; the oracle states the literal truth per query id —
    * a duplicated rank, an out-of-order score, or a fabricated neighbor
    * anywhere breaks the hash compare.
    */
  private def topkValid(r: DataFrame, qCol: String, nCol: String,
                        scoreCol: String, ascending: Boolean, k: Int,
                        corpusIds: DataFrame): DataFrame = {
    // distinct: a duplicated corpus id would MULTIPLY result rows through
    // the flag join and corrupt every count-based flag below
    val flagged = r.join(
      corpusIds.toDF(nCol).distinct().withColumn("__in", lit(true)),
      Seq(nCol), "left")
    val pairs = sort_array(collect_list(struct(col("rank"),
      col(scoreCol).cast("double").as("s"))))
    val cmp = (cur: org.apache.spark.sql.Column, prev: org.apache.spark.sql.Column) =>
      if (ascending) cur >= prev else cur <= prev
    val mono = aggregate(pairs,
      struct(lit(true).as("ok"), lit(null).cast("double").as("prev")),
      (acc, x) => struct(
        (acc.getField("ok") && (acc.getField("prev").isNull ||
          cmp(x.getField("s"), acc.getField("prev")))).as("ok"),
        x.getField("s").as("prev")),
      acc => acc.getField("ok"))
    flagged.groupBy(col(qCol).as("q_id")).agg(
      (min(col("rank")) === 1 && max(col("rank")) === count(lit(1)) &&
        countDistinct(col("rank")) === count(lit(1)) &&
        count(lit(1)) <= k).as("ranks_ok"),
      mono.as("scores_sorted"),
      (countDistinct(col(nCol)) === count(lit(1))).as("neighbors_distinct"),
      (min(when(col("__in"), lit(1)).otherwise(lit(0))) === 1)
        .as("neighbors_in_corpus"))
  }

  /** [[topkValid]]'s twin for near-dup PAIR outputs: one aggregate row
    * asserting id_a < id_b everywhere, pair uniqueness, the verify score
    * inside its legal range, and both ids drawn from the input corpus.
    * Robust to an empty pair set (vacuous truth) — the recall twins are
    * what pin non-emptiness.
    */
  private def pairsValid(pairs: DataFrame, scoreCol: String, lo: Double,
                         hi: Double, corpusIds: DataFrame): DataFrame = {
    val flags = pairs.agg(
      coalesce(min(when(col("id_a") < col("id_b"), 1).otherwise(0)) === 1,
        lit(true)).as("pairs_ordered"),
      coalesce(count_distinct(struct(col("id_a"), col("id_b"))) === count(lit(1)),
        lit(true)).as("pairs_distinct"),
      coalesce(min(col(scoreCol).cast("double")) >= lo &&
        max(col(scoreCol).cast("double")) <= hi, lit(true)).as("scores_in_range"))
    val stray = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .join(corpusIds.toDF("doc_id"), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("__n_stray"))
    flags.crossJoin(stray)
      .select(col("pairs_ordered"), col("pairs_distinct"),
        col("scores_in_range"), (col("__n_stray") === 0L).as("ids_in_corpus"))
  }

  /** Scratch dir for the roundtrip queries (self-cleaning, shared impl). */
  private def tmpDir(prefix: String): String = graft.util.Scratch.dir(prefix)

  /** One drained JointKpis run per (session, sfDir) — st_joint_category
    * and st_joint_daily read their table from the SAME committed root
    * instead of each paying a full stage + AvailableNow drain of the
    * identical one-query-two-tables pipeline (code-review r6). The memo
    * is the keyed-cache pattern of Similarity's centroid cache; entries
    * drop with Dedup.clearCaches.
    */
  private val jointKpiRoots =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  graft.util.Caches.onClear(() => jointKpiRoots.clear())

  /** Stage the enriched projection to parquet, drain `writerFn` over it
    * with AvailableNow, return the committed root — ONE staging recipe
    * for both joint-commit legs, so they cannot drift (code-review r7).
    */
  private def drainJointRoot(s: SparkSession, dir: String, prefix: String,
                             writerFn: (DataFrame, String, String) =>
                               org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row])
      : String = {
    import org.apache.spark.sql.streaming.Trigger
    val stage = tmpDir(s"graft_${prefix}_in")
    enriched(s, dir).select(col("order_id"), col("user_id"),
        col("product_id"), col("category"), col("sale_price"),
        col("is_returned"), col("order_date"))
      .write.mode("overwrite").parquet(stage)
    val (root, cp) = (tmpDir(s"graft_${prefix}_root"), tmpDir(s"graft_${prefix}_cp"))
    val stream = s.readStream.schema(s.read.parquet(stage).schema).parquet(stage)
    val q = writerFn(stream, root, cp).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    root
  }

  private def jointKpiRoot(s: SparkSession, dir: String): String =
    jointKpiRoots.computeIfAbsent(s.hashCode() + "|" + dir,
      _ => drainJointRoot(s, dir, "stj",
        graft.streaming.JointKpis.writer(_, _, _)))

  /** The manifested twin of [[jointKpiRoot]] (VERDICT r06 missing #3):
    * the same pipeline drained through the multi-table partition-manifest
    * commit — O(touched order_date partitions) per table, one pointer.
    */
  private def jointKpiRootManifested(s: SparkSession, dir: String): String =
    jointKpiRoots.computeIfAbsent("m|" + s.hashCode() + "|" + dir,
      _ => drainJointRoot(s, dir, "stjm",
        graft.streaming.JointKpis.writerManifested(_, _, _)))

  /** Shared TF/DF frames behind t_term_stats and t_keywords (ONE
    * definition, mirrored by [[sqlTermStatsCtes]] on the oracle side, so
    * the tokenization/tf-cut/df math cannot drift between the queries).
    */
  private def termStats(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(lower(col("text")))).as("term"))
    val tf = toks.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(df, "term").select("doc_id", "term", "tf", "df")
  }

  /** One entry per implemented operator from SURVEY.md §2 / §7.5. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- flagship KPIs (J1, P1, A1-A3, F1, F4) ----
    // No orderBy: Verify applies the canonical sort at dump time; the
    // benched plan stays sort-free (VERDICT r01 #3).
    "a1_category_kpis" -> ((s, dir) => Kpis.categoryKpis(enriched(s, dir))),
    "a2_daily_kpis" -> ((s, dir) => Kpis.dailyKpis(enriched(s, dir))),
    // A2's 100 TB plan: same exact numbers, no Expand×3 (see
    // Kpis.dailyKpisScalable) — verified against the same oracle as a2.
    "a2_daily_kpis_scalable" -> ((s, dir) =>
      Kpis.dailyKpisScalable(enriched(s, dir))),

    // ---- validation rule engine (§2.7: P3, P5-P9, A6, A7) ----
    "v_rules_orders" -> ((s, dir) =>
      Rules.evaluate(s, Tables.orders(s, dir), cfgOrders)),
    "v_rules_lineitem" -> ((s, dir) =>
      Rules.evaluate(s, Tables.lineitem(s, dir), cfgLineitem)),
    "v_rules_violations" -> ((s, dir) =>
      Rules.evaluate(s, mutatedOrders(s, dir), cfgOrders)),
    // per-group report (validate.py:344-348 shape) over the mutated frame,
    // grouped by customer so groups mix clean and violating rows
    "v_group_report" -> ((s, dir) =>
      Rules.groupReport(
        mutatedOrders(s, dir).withColumn("grp", col("o_orderkey") % 100),
        cfgOrders, "grp")),

    // ---- upsert (S7/J2) ----
    "j2_upsert" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val updates = t.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val inserts = t.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      Upsert.upsert(t, updates.unionByName(inserts), Seq("o_orderkey"))
    }),

    // ---- joins / set algebra (J3-J6, A4, A5) ----
    // Skew-mitigated fact⋈dim join: salted n-way fan-out of hot keys,
    // result identical to the plain join (oracled as such).
    "j7_salted_join" -> ((s, dir) => Skew.saltedJoin(
      Tables.lineitem(s, dir).select("l_orderkey", "l_partkey", "l_extendedprice"),
      Tables.part(s, dir).filter(col("p_partkey") <= 50).select("p_partkey", "p_type"),
      "l_partkey", "p_partkey", numSalts = 8)),
    "j3_semi" -> ((s, dir) => Grouping.semi(
      Tables.orders(s, dir).select("o_orderkey", "o_totalprice"),
      Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
        .select(col("l_orderkey").as("o_orderkey")),
      "o_orderkey")),
    "j4_anti" -> ((s, dir) => Grouping.anti(
      Tables.orders(s, dir).select("o_orderkey"),
      Tables.lineitem(s, dir).filter(col("l_quantity") > 45)
        .select(col("l_orderkey").as("o_orderkey")),
      "o_orderkey")),
    "j5_all_present" -> ((s, dir) => Grouping.allValuesPresent(
      Tables.lineitem(s, dir).select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey",
      Tables.part(s, dir).filter(col("p_partkey") % 2 === 0).select("p_partkey"),
      "p_partkey")),
    "j6_containment" -> ((s, dir) => {
      val manifest = Grouping.valueSetPerKey(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey")
      Grouping.containment(manifest, "l_partkey_set", "l_orderkey",
        Tables.part(s, dir).filter(col("p_partkey") <= 20).select("p_partkey"),
        "p_partkey")
        .select(col("p_partkey"), array_join(col("groups"), ",").as("orders_with_part"))
    }),
    // As-of (point-in-time) join: each event sees the user's latest order
    // AT event time — one union + one window pass, no range-join blowup
    // (see graft.operators.AsOf). Nullable join results are sentinel-
    // coalesced: a NULL in an integer column would make pandas lift the
    // oracle side to float and break the bit-exact compare.
    "j8_asof" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val or = Tables.orders(s, dir)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus")
      graft.operators.AsOf.asofJoin(ev, "user_id", "ts",
        or, "o_custkey", "o_orderdate", "o_orderkey",
        Seq("o_orderkey", "o_orderstatus"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_o_orderkey"), lit(-1L)).as("asof_orderkey"),
          coalesce(col("asof_o_orderstatus"), lit("NONE")).as("asof_status"))
    }),
    // FORWARD as-of join: each event sees the user's NEXT order at or
    // after event time — the label-attribution mirror of j8 (same
    // union + one window pass, descending scan).
    "j11_asof_next" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val or = Tables.orders(s, dir)
        .select("o_custkey", "o_orderdate", "o_orderkey", "o_orderstatus")
      graft.operators.AsOf.asofJoinForward(ev, "user_id", "ts",
        or, "o_custkey", "o_orderdate", "o_orderkey",
        Seq("o_orderkey", "o_orderstatus"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("next_o_orderkey"), lit(-1L)).as("next_orderkey"),
          coalesce(col("next_o_orderstatus"), lit("NONE")).as("next_status"))
    }),
    // Bucketized interval join (attribution shape): every event within two
    // hours of a same-user signup, joined on (user, hour-bucket) with the
    // exact BETWEEN inside the join — no key-hot quadratic post-filter
    // (see graft.operators.RangeJoin).
    "j9_interval" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val windows = Tables.events(s, dir).filter(col("event_type") === "signup")
        .select(col("user_id").as("w_user"), col("event_id").as("signup_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      graft.operators.RangeJoin.intervalJoin(ev, "user_id", "ts",
        windows, "w_user", "w_start", "w_end", bucketMicros = 3600L * 1000000L)
        .select("event_id", "signup_id")
    }),
    "a4_distinct" -> ((s, dir) =>
      Grouping.distinctIds(Tables.lineitem(s, dir), "l_partkey")),
    "a5_collect_set" -> ((s, dir) =>
      Grouping.valueSetPerKey(Tables.lineitem(s, dir), "l_orderkey", "l_partkey")
        .select(col("l_orderkey"),
          size(col("l_partkey_set")).as("n_parts"),
          array_join(sort_array(col("l_partkey_set")), ",").as("parts"))),
    // batch completeness pass (ST3's batch parity; glue_job.py:221-256)
    "g_complete_groups" -> ((s, dir) => Grouping.completeGroups(
      Tables.orders(s, dir).select("o_orderkey"), "o_orderkey",
      Tables.lineitem(s, dir).select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey",
      Tables.part(s, dir).filter(col("p_partkey") % 2 === 0).select("p_partkey"),
      "p_partkey",
      Tables.orders(s, dir).filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").as("l_orderkey")))),

    // Connected components (entity-resolution clustering): orders linked by
    // sharing any rare part (p_partkey <= 30) — pair edges from a
    // self-join, clusters from iterative min-label propagation, exactly
    // the pairs→clusters step that production near-dup needs. The oracle
    // recomputes the same components with a recursive transitive closure.
    "g_connected_components" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_partkey") <= 30)
        .select("l_partkey", "l_orderkey").distinct()
      val a = li.select(col("l_partkey"), col("l_orderkey").as("src"))
      val b = li.select(col("l_partkey"), col("l_orderkey").as("dst"))
      val edges = a.join(b, Seq("l_partkey"))
        .filter(col("src") < col("dst")).select("src", "dst").distinct()
      Grouping.connectedComponents(edges, "src", "dst")
        .select(col("node").as("order_id"), col("component").as("component_id"))
    }),
    // the O(log n)-round star-contraction form (Kiveris et al., SoCC'14) on
    // the SAME graph against the SAME recursive-closure oracle — the
    // diameter-independent 100 TB path for the dedup cluster step
    "g_cc_largestar" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_partkey") <= 30)
        .select("l_partkey", "l_orderkey").distinct()
      val a = li.select(col("l_partkey"), col("l_orderkey").as("src"))
      val b = li.select(col("l_partkey"), col("l_orderkey").as("dst"))
      val edges = a.join(b, Seq("l_partkey"))
        .filter(col("src") < col("dst")).select("src", "dst").distinct()
      Grouping.connectedComponentsStar(edges, "src", "dst")
        .select(col("node").as("order_id"), col("component").as("component_id"))
    }),

    // Fixed-point PageRank (operators/Graph.scala) over the symmetric
    // customer↔part purchase graph — the link-authority prior corpus
    // pipelines weight documents by. Integer arithmetic throughout
    // (scaled ranks, integral div), so three damped iterations are
    // bit-identical to the oracle's unrolled replay; one join + one
    // aggregation shuffle per iteration, rank state O(nodes).
    "g_pagerank" -> ((s, dir) => {
      val e0 = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p")).distinct()
      val edges = e0.select(col("c").as("src"), (col("p") + 10000000L).as("dst"))
        .unionByName(e0.select((col("p") + 10000000L).as("src"), col("c").as("dst")))
      graft.operators.Graph.pageRankFixed(edges, "src", "dst", iters = 3)
    }),
    // Exact k-core by iterative peeling (Graph.kCore) over the
    // co-purchase graph with planted STRUCTURAL truth: a disjoint
    // 7-clique is always in the 3-core (its internal degrees alone
    // satisfy k), an isolated 5-chain never is (endpoints peel first,
    // then inductively the rest) — both independent of what the real
    // graph's core looks like.
    "g_kcore" -> ((s, dir) => {
      import s.implicits._
      val e0 = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_partkey") + 10000000L).as("dst"))
        .distinct()
      val cliqueIds = (1 to 7).map(i => 900000000L + i)
      val clique = (for { a <- cliqueIds; b <- cliqueIds if a < b } yield (a, b))
        .toDF("src", "dst")
      val chainIds = (1 to 5).map(i => 910000000L + i)
      val chain = chainIds.zip(chainIds.tail).toDF("src", "dst")
      val core = graft.operators.Graph.kCore(
        e0.unionByName(clique).unionByName(chain), "src", "dst", k = 3)
      val planted = (cliqueIds.map(id => (id, true)) ++
        chainIds.map(id => (id, false))).toDF("node", "expect_in_core")
      planted.join(core.select(col("node"), lit(true).as("__in")),
          Seq("node"), "left")
        .select(col("node"), col("expect_in_core"),
          coalesce(col("__in"), lit(false)).as("in_core"))
    }),
    // Exact per-node triangle counts (Grouping.triangleCounts — the
    // Suri–Vassilvitskii degree-ordered wedge algorithm) over the same
    // co-purchase graph as the CC queries; the oracle brute-forces the
    // 3-way closing join, so exactly-once triangle generation AND the
    // 0-for-triangle-free-nodes contract are both pinned.
    "g_triangles" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_partkey") <= 30)
        .select("l_partkey", "l_orderkey").distinct()
      val a = li.select(col("l_partkey"), col("l_orderkey").as("src"))
      val b = li.select(col("l_partkey"), col("l_orderkey").as("dst"))
      val edges = a.join(b, Seq("l_partkey"))
        .filter(col("src") < col("dst")).select("src", "dst").distinct()
      Grouping.triangleCounts(edges, "src", "dst")
        .select(col("node").as("order_id"), col("n_triangles"))
    }),
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
      val comps = Grouping.connectedComponents(
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")), "src", "dst")
      all.select(col("id"))
        .join(comps.select(col("node").as("id"), col("component")), Seq("id"), "left")
        .select(col("id").as("customer_id"),
          coalesce(col("component"), col("id")).as("entity_id"))
    }),

    // ---- dedup suite (§7.5) ----
    "dedup_exact" -> ((s, dir) =>
      Dedup.exact(Tables.documents(s, dir), "doc_id", "text")),
    "dedup_jaccard_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
    }),
    "dedup_near" -> ((s, dir) =>          // rows-only: xxhash64 minhash
      Dedup.nearDuplicates(docsWithPlantedDups(s, dir), "doc_id", "text",
        threshold = 0.5)),
    "dedup_simhash" -> ((s, dir) =>       // rows-only: xxhash64 simhash
      Dedup.simhashNearDuplicates(docsWithPlantedDups(s, dir), "doc_id", "text")),
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
      val cc = Grouping.connectedComponents(pairs, "id_a", "id_b")
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

    // Model SERVING in Structured Streaming: the classifier trains
    // batch-side (models are batch artifacts), then the same planted
    // corpus replays as a multi-batch file stream and every micro-batch
    // scores through ONE broadcast weight join into the snapshot-isolated
    // upsert store. Answers t_quality_train's oracle verbatim — streaming
    // inference must agree with batch inference exactly.
    "st_quality_score" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val labeled = qualityLabeled(s, dir)
      val model = graft.operators.Classify.train(labeled, "doc_id", "text",
        "label", dim = 1 << 16, iters = 15, lr = 0.8)
      val stage = tmpDir("graft_stqual_in")
      labeled.select("doc_id", "text").write.mode("overwrite").parquet(stage)
      val (out, cp) = (tmpDir("graft_stqual_out"), tmpDir("graft_stqual_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 8).parquet(stage)
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val scored = graft.operators.Classify
            .score(batch, "doc_id", "text", model)
            .select(col("doc_id"), col("predicted"))
          graft.streaming.StreamingPipeline
            .upsertBatchSnapshot(out, Seq("doc_id"))(scored, id)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.StreamingPipeline.readSnapshot(s, out)
        .select("doc_id", "predicted")
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

    // TF-IDF cosine retrieval — the vector-space scorer beside BM25,
    // normalized by the FULL document vector norm (term-sorted left fold,
    // the LM-score determinism contract); the oracle replays idf, fold,
    // fixed-order dot, and the single division verbatim.
    "t_tfidf_topk" -> ((s, dir) =>
      graft.operators.Retrieval.tfidfTopK(Tables.documents(s, dir),
        "doc_id", "text", Seq("spark", "scan"), k = 20)),

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

    // STREAMING exact-substring dedup (streaming/PassageStream.scala):
    // the three ingest days replay as one-file-per-trigger micro-batches
    // (staged with ascending mtimes so file→batch order is
    // deterministic); each batch cleans through the SAME
    // Passages.cleanIncremental the batch query runs — batch/stream
    // parity by construction — against the per-batch-partitioned
    // window-hash registry. Answers dedup_passage_incremental's
    // first-seen-day oracle VERBATIM.
    "st_passage_clean" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val corpus = passageCorpus(s, dir)
      val days = Seq(
        corpus.filter(col("doc_id") < 200),
        corpus.filter(col("doc_id") >= 200 && col("doc_id") < PlantedOffset),
        corpus.filter(col("doc_id") >= PlantedOffset))
      val stage = tmpDir("graft_stpass_in")
      days.zipWithIndex.foreach { case (d, i) =>
        val sub = s"$stage/d$i"
        d.coalesce(1).write.mode("overwrite").parquet(sub)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(sub))
          .iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime
              .fromMillis(1700000000000L + i * 600000L)))
      }
      val (work, cp) = (tmpDir("graft_stpass_work"), tmpDir("graft_stpass_cp"))
      val schema = s.read.parquet(s"$stage/d0").schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$stage/d*")
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch(graft.streaming.PassageStream
          .cleanAndRegister(work, w = 6, minDocs = 2) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.PassageStream.readClean(s, work)
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

    // k-NN graph recall (Similarity.knnGraph): every planted exact copy
    // shares its original's k-means cell by construction, and an
    // identical vector maximizes cosine — so the original MUST be the
    // copy's rank-1 neighbor regardless of clustering quality. The
    // structural invariant that puts the cluster-then-neighbor graph
    // under the DuckDB oracle (the dedup_semantic_recall stance).
    "knn_graph_recall" -> ((s, dir) => {
      val e = embDouble(s, dir).select(col("vec_id"), col("emb_d"))
      val planted = e.unionByName(e.filter(col("vec_id") < 50).select(
        (col("vec_id") + PlantedOffset).as("vec_id"), col("emb_d")))
      val g = graft.operators.Similarity.knnGraph(planted, k = 5,
        cId = "vec_id", cVec = "emb_d")
      val base = e.filter(col("vec_id") < 50).select(col("vec_id"))
      base.join(g,
        base("vec_id") + PlantedOffset === g("src") &&
          g("dst") === base("vec_id") && g("rank") === 1, "left_semi")
        .select(col("vec_id"), lit(true).as("found"))
    }),
    // rows-only general form (kmeans cells aren't SQL-replicable; the
    // recall twin above is the oracled leg)
    "knn_graph" -> ((s, dir) =>
      graft.operators.Similarity.knnGraph(
        embDouble(s, dir).select(col("vec_id"), col("emb_d")),
        k = 5, cId = "vec_id", cVec = "emb_d")),
    // JL random projection (Similarity.randomProjection): 64 -> 8 dims
    // under the seed-77 Gaussian planes; pure per-row map, long-form
    // output, IEEE-exact (products + left-assoc sums, no ln) — the
    // oracle replays all 8 folds term by term from the same PRNG.
    "emb_project" -> ((s, dir) =>
      graft.operators.Similarity.randomProjection(
        embDouble(s, dir).select(col("vec_id"), col("emb_d")),
        dim = 64, outDim = 8, seed = 77L, cId = "vec_id", cVec = "emb_d")),

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
    }),

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
    // Crawl-archive front door (operators/Crawl.scala): the planted WET
    // blobs (8 files, records concatenated in id order, length-delimited
    // bodies) parsed back to per-document rows — split + regexp_extract
    // + substring projections only, no join/agg. The oracle rebuilds the
    // identical blobs with ordered string_agg and replays the parse,
    // including the `len_ok` framing re-check.
    "src_wet_parse" -> ((s, dir) =>
      graft.operators.Crawl.wetParse(
        graft.operators.Crawl.plantWet(
          Tables.documents(s, dir), "doc_id", "text"))),
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
    // STREAMING crawl ingestion (streaming/WetStream.scala): the WET
    // front door drained across 9 file triggers — 8 archive files in
    // file_id order plus a 9th REFETCH file redelivering every
    // doc_id%8==0 record under the same URI. First-seen-wins keeps the
    // original file's parse; the seen/ log proves the refetch was
    // observed (n_seen = 2) before being dropped. The oracle states the
    // closed-form expectation per document.
    "st_wet_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val blobs = graft.operators.Crawl.plantWet(docs, "doc_id", "text")
        .unionByName(graft.operators.Crawl
          .plantWet(docs.filter(col("doc_id") % 8 === 0), "doc_id", "text",
            files = 1)
          .select(lit(8L).as("file_id"), col("wet")))
      val stage = tmpDir("graft_stwet_in")
      (0L to 8L).foreach { i =>
        val sub = s"$stage/f$i"
        blobs.filter(col("file_id") === i).coalesce(1)
          .write.mode("overwrite").parquet(sub)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.list(java.nio.file.Paths.get(sub))
          .iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .foreach(f => java.nio.file.Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime
              .fromMillis(1700000000000L + i * 600000L)))
      }
      val (work, cp) = (tmpDir("graft_stwet_work"), tmpDir("graft_stwet_cp"))
      val schema = s.read.parquet(s"$stage/f0").schema
      val q = graft.streaming.WetStream.writer(
          s.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$stage/f*"),
          work, cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.WetStream.records(s, work)
        .join(graft.streaming.WetStream.sightings(s, work), Seq("uri"))
        .select(col("doc_id"), col("uri"), col("file_id"),
          col("declared_len"), col("body"), col("len_ok"), col("n_seen"))
    }),
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
    // Per-document token entropy (Text.tokenEntropy): the
    // repetitiveness signal with the foldLogProbs determinism contract —
    // the Σ c·ln c term folds over the term-sorted count list on both
    // engines, so even the double arithmetic hash-compares bit-exact.
    "t_entropy_quality" -> ((s, dir) =>
      Text.tokenEntropy(Tables.documents(s, dir), "doc_id", "text")),
    // Embedding-dimension ablation (Matryoshka-style truncation eval):
    // per query, top-10 overlap between the full-dimension cosine
    // ranking and the first-16-dims ranking — the "how many dims can we
    // drop" table. Both rankings are the oracle-verified
    // Similarity.bruteForceTopK; the overlap is an integer semi-join
    // count, recall one exact division.
    "ann_dim_ablation" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec"))
      val full = Similarity.bruteForceTopK(q,
        e.select(col("vec_id"), col("emb_d").as("embedding")), k = 10)
      val trunc = Similarity.bruteForceTopK(
        q.select(col("q_id"), slice(col("q_vec"), 1, 16).as("q_vec")),
        e.select(col("vec_id"), slice(col("emb_d"), 1, 16).as("embedding")),
        k = 10)
      full.select("q_id", "vec_id")
        .join(trunc.select("q_id", "vec_id"),
          Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("overlap"))
        .select(col("q_id"), col("overlap"),
          round(col("overlap").cast("double") / 10.0, 6).as("recall_at_10"))
    }),
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
    // k-anonymity release gate (Profiling.kAnonymity) over the
    // (lang, source) quasi-identifier: every combination's population
    // and whether it clears k = 10.
    "v_k_anonymity" -> ((s, dir) =>
      graft.operators.Profiling.kAnonymity(
        Tables.documents(s, dir), Seq("lang", "source"), k = 10L)),
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
    // Sized-output-file write planning (Pack.packSequences under a BYTE
    // budget): bin documents onto ~64 KiB target files in id order —
    // the "write uniformly sized parquet files" layout pass, integer
    // arithmetic end to end.
    "s_file_binpack" -> ((s, dir) =>
      Pack.packSequences(
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", budget = 65536L, order = Seq(col("doc_id")))
        .select(col("doc_id"), col("n_chars"),
          col("start_token").as("start_byte"),
          col("seq_first").as("file_first"),
          col("seq_last").as("file_last"),
          col("offset_in_seq").as("offset_in_file"))),
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
    "t_fingerprint" -> ((s, dir) =>       // rows-only: xxhash64 rolling hash
      Tables.documents(s, dir)
        .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"))),
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

    // ---- similarity / ANN (§7.5) ----
    "sim_bruteforce_topk" -> ((s, dir) => {
      val e = embDouble(s, dir)
      Similarity.bruteForceTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        e.select(col("vec_id"), col("emb_d").as("embedding")),
        k = 10)
    }),
    // Hard-negative mining (Similarity.hardNegativesTopK): per query
    // vector, the top-10 most-similar DIFFERENT-label vectors — the
    // contrastive-training batch builder. Label inequality rides the
    // broadcast join condition; the two-stage top-k never windows the
    // corpus globally.
    "sim_hard_negatives" -> ((s, dir) => {
      val e = embDouble(s, dir)
      Similarity.hardNegativesTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec"),
            col("label").as("q_label")),
        e.select(col("vec_id"), col("emb_d").as("embedding"), col("label")),
        k = 10)
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
    }),
    "ann_ivf_topk" -> ((s, dir) => {
      val e = embDouble(s, dir)
      Similarity.ivfTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        e.select(col("vec_id"), col("label"), col("emb_d").as("embedding")),
        cellCol = "label", k = 10, nprobe = 2)
    }),
    "ann_ivf_kmeans" -> ((s, dir) => {    // rows-only: fp-sensitive training
      val e = embDouble(s, dir)
      val corpus = e.select(col("vec_id"), col("emb_d").as("embedding"))
      val cells = Similarity.kmeansCells(corpus, k = 8, iters = 2)
      Similarity.ivfTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        corpus.join(cells, "vec_id"),
        cellCol = "cell", k = 10, nprobe = 2)
    }),
    "ann_lsh_topk" -> ((s, dir) => {      // rows-only: PRNG hyperplanes
      val e = embDouble(s, dir)
      val dim = 64 // hyperplane width ≥ vector dim; dot ignores the excess
      Similarity.lshTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        e.select(col("vec_id"), col("emb_d").as("embedding")),
        dim = dim, k = 10)
    }),
    // Derived-invariant twins for the rows-only top-k outputs (VERDICT
    // r09 #7): which neighbors the seeded structures retrieve is not
    // SQL-replayable, but rank contiguity, score monotonicity, neighbor
    // uniqueness, and corpus provenance are — all computed from the
    // actual result and hash-compared against literal truth per query.
    "ann_lsh_valid" -> ((s, dir) => {
      val e = embDouble(s, dir)
      topkValid(Similarity.lshTopK(
          e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
          e.select(col("vec_id"), col("emb_d").as("embedding")),
          dim = 64, k = 10),
        "q_id", "vec_id", "sim", ascending = false, k = 10,
        e.select("vec_id"))
    }),
    "ann_pq_valid" -> ((s, dir) => {
      val e = embDouble(s, dir)
      topkValid(Similarity.pqTopK(
          e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
          e.select(col("vec_id"), col("emb_d")),
          dim = 64, k = 10, cVec = "emb_d"),
        "q_id", "vec_id", "adc_dist", ascending = true, k = 10,
        e.select("vec_id"))
    }),
    "ann_ivf_valid" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val corpus = e.select(col("vec_id"), col("emb_d").as("embedding"))
      val cells = Similarity.kmeansCells(corpus, k = 8, iters = 2)
      topkValid(Similarity.ivfTopK(
          e.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
          corpus.join(cells, "vec_id"),
          cellCol = "cell", k = 10, nprobe = 2),
        "q_id", "vec_id", "sim", ascending = false, k = 10,
        e.select("vec_id"))
    }),
    // ... and the kNN graph: per-source flags folded into one global row
    // (the source SET depends on the clustering, so per-source rows are
    // not a deterministic oracle shape; the conjunction is).
    "knn_graph_valid" -> ((s, dir) => {
      val e = embDouble(s, dir).select(col("vec_id"), col("emb_d"))
      val g = graft.operators.Similarity.knnGraph(e, k = 5,
        cId = "vec_id", cVec = "emb_d")
      val per = topkValid(g, "src", "dst", "sim", ascending = false, k = 5,
        e.select("vec_id"))
      def allOf(c: String) = coalesce(
        min(when(col(c), 1).otherwise(0)) === 1, lit(true)).as(s"all_$c")
      val folded = per.agg(allOf("ranks_ok"), allOf("scores_sorted"),
        allOf("neighbors_distinct"), allOf("neighbors_in_corpus"))
      val noSelf = g.agg(coalesce(
        min(when(col("src") =!= col("dst"), 1).otherwise(0)) === 1,
        lit(true)).as("no_self_loops"))
      folded.crossJoin(noSelf)
    }),
    "ann_pq_topk" -> ((s, dir) => {       // rows-only: fp-sensitive training
      val e = embDouble(s, dir)
      Similarity.pqTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        e.select(col("vec_id"), col("emb_d")),
        dim = 64, k = 10, cVec = "emb_d")
    }),
    // PQ structural self-recall: a query drawn from the corpus encodes to
    // the codes that MINIMIZE each subspace's quantization distance, so
    // its ADC score Σ_j min_c d2(q_j, c) is termwise ≤ any other row's —
    // and IEEE rounding is monotone under the fixed-order fold — so the
    // self row always ties the global minimum EXACTLY (same doubles, same
    // order). Pins training/encoding/table consistency end-to-end even
    // though the trained centroids aren't SQL-replicable.
    "ann_pq_recall" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val corpus = e.select(col("vec_id"), col("emb_d"))
      val cb = Similarity.pqCodebook(corpus, dim = 64, m = 4, cVec = "emb_d")
      val scored = Similarity.pqScores(
        corpus.filter(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        Similarity.pqCodes(corpus, cb, dim = 64, m = 4, cVec = "emb_d"),
        cb, dim = 64, m = 4)
      val mins = scored.groupBy(col("q_id")).agg(min(col("adc_dist")).as("min_adc"))
      val self = scored.filter(col("q_id") === col("vec_id"))
        .select(col("q_id"), col("adc_dist").as("self_adc"))
      mins.join(self, "q_id")
        .select(col("q_id"), (col("self_adc") === col("min_adc")).as("found"))
    }),
    // LSH self-recall (VERDICT r03 #1): each query vector is drawn from the
    // corpus, collides with itself in every hash table by construction, and
    // cosine(v, v) rounds to exactly 1.0 — so rank 1 must be the query
    // itself. Oracle-exact even though the hyperplanes are PRNG.
    "ann_lsh_recall" -> ((s, dir) => {
      val e = embDouble(s, dir)
      Similarity.lshTopK(
        e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec")),
        e.select(col("vec_id"), col("emb_d").as("embedding")),
        dim = 64, k = 10)
        .filter(col("rank") === 1)
        .select(col("q_id"), col("vec_id"), col("sim"))
    }),
    // Multi-probe LSH (Similarity.lshTopKMultiProbe): the oracle pins the
    // two structural guarantees — every query still self-retrieves at
    // rank 1 / sim 1.0 (the base bucket always contains self), and
    // recall@10 against the exact brute-force top-10 DOMINATES the
    // single-probe run (the candidate set is a strict superset; anything
    // outranking a true top-k member is itself a true top-k member, so
    // hits cannot drop). Both recalls are computed distributively; only
    // the invariant booleans reach the output row.
    "ann_lsh_multiprobe_recall" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val queries = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("emb_d").as("q_vec"))
      val corpus = e.select(col("vec_id"), col("emb_d").as("embedding"))
      val exact = Similarity.bruteForceTopK(queries, corpus, k = 10)
        .select(col("q_id"), col("vec_id"))
      def hits(ann: DataFrame): DataFrame = ann
        .select(col("q_id"), col("vec_id"))
        .join(exact, Seq("q_id", "vec_id"), "left_semi")
        .agg(count(lit(1)).as("__hits"))
      val single = Similarity.lshTopK(queries, corpus, dim = 64, k = 10)
      val multi = Similarity.lshTopKMultiProbe(queries, corpus, dim = 64, k = 10)
      val self = multi.filter(col("rank") === 1).agg(
        count(lit(1)).as("__nq"),
        min(when(col("vec_id") === col("q_id") && col("sim") === 1.0, 1)
          .otherwise(0)).as("__selfok"))
      self.crossJoin(hits(single).select(col("__hits").as("__hs")))
        .crossJoin(hits(multi).select(col("__hits").as("__hm")))
        .select(col("__nq").cast("int").as("n_queries"),
          (col("__selfok") === 1).as("self_rank1_all"),
          (col("__hm") >= col("__hs")).as("recall_dominates"))
    }),
    // k-means assignment-quality invariants (VERDICT r03 #1): every vector
    // assigned exactly once, every cell id in [0, k), and a planted
    // near-identical copy (tiny scale perturbation — cosine is
    // scale-invariant) lands in the same cell as its original. All counts
    // are oracle-derivable even though the trained centroids aren't.
    "ann_ivf_kmeans_quality" -> ((s, dir) => {
      val e = embDouble(s, dir)
      val base = e.select(col("vec_id"), col("emb_d").as("embedding"))
      val planted = base.filter(col("vec_id") < 50).select(
        (col("vec_id") + PlantedOffset).as("vec_id"),
        transform(col("embedding"), x => x * 1.0000001d).as("embedding"))
      val corpus = base.unionByName(planted)
      val cells = Similarity.kmeansCells(corpus, k = 8, iters = 2)
      val orig = cells.filter(col("vec_id") < PlantedOffset)
      val copies = cells.filter(col("vec_id") >= PlantedOffset).select(
        (col("vec_id") - PlantedOffset).as("vec_id"), col("cell").as("copy_cell"))
      val nVectors = corpus.agg(count(lit(1)).as("n_vectors"))
      val totals = cells.agg(count(lit(1)).as("n_assigned"),
        sum(when(col("cell") < 0 || col("cell") >= 8, 1L).otherwise(0L))
          .as("n_bad_cell"))
      val same = orig.join(copies, "vec_id").agg(
        count(lit(1)).as("n_planted"),
        sum(when(col("cell") === col("copy_cell"), 1L).otherwise(0L))
          .as("n_same_cell"))
      // single-row × single-row joins on a constant key (not a data-path
      // cross join — each side is one aggregate row)
      nVectors.withColumn("__j", lit(1))
        .join(totals.withColumn("__j", lit(1)), "__j")
        .join(same.withColumn("__j", lit(1)), "__j")
        .drop("__j")
    }),

    // ---- events / scalar functions (P2, P10, P11, F2, F3, F5-F9) ----
    "e_parse_props" -> ((s, dir) =>       // F7 from_json
      Tables.events(s, dir).select(col("event_id"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))),
    // F7 serialization direction. event_type is coalesced on both sides:
    // Spark's to_json OMITS null struct fields where DuckDB emits
    // "field":null, so nulls must not reach the serializer.
    "e_to_json" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        to_json(struct(col("event_id"),
          coalesce(col("event_type"), lit("")).as("event_type"))).as("payload"))),
    "e_route" -> ((s, dir) =>             // P10/P11/F2/F5 routing predicates
      Tables.events(s, dir).select(
        col("event_id"),
        when(col("event_type").contains("view"), "views")
          .when(col("event_type").contains("click"), "clicks")
          .when(col("event_type").startsWith("purch"), "purchases")
          .when(col("event_type").endsWith("up"), "signups")
          .otherwise("other").as("route"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))),
    "e_daily_value" -> ((s, dir) =>       // F1/F6 + decimal-exact sum
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(Kpis.moneySum(coalesce(col("value"), lit(0.0))).as("total_value"),
          count(lit(1)).as("n_events"))),
    "e_filter_eq" -> ((s, dir) =>         // P2 equality filter via F3 cast
      Tables.events(s, dir)
        .filter(col("user_id").cast("string") === "7")
        .select("event_id", "user_id", "event_type")),
    "f_uuid" -> ((s, dir) =>              // rows-only: F8 uuid() random, F9 now()
      Tables.events(s, dir).select(col("event_id"),
        expr("uuid()").as("run_uuid"),
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").as("run_ts"))),
    // Structural oracle for F8/F9 (the values are random, their SHAPE is
    // not): every uuid must match the RFC 4122 v4 pattern, all uuids must be
    // distinct, and the ISO timestamp must round-trip through
    // to_timestamp∘date_format unchanged. The oracle pins each count to the
    // table's row count, so a single malformed uuid or timestamp breaks the
    // hash.
    "f_uuid_shape" -> ((s, dir) => {
      val gen = Tables.events(s, dir).select(
        expr("uuid()").as("run_uuid"),
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss").as("run_ts"))
      gen.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("run_uuid").rlike(
          "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"),
          1)).as("n_uuid_v4"),
        countDistinct(col("run_uuid")).as("n_uuid_distinct"),
        count(when(date_format(
          to_timestamp(col("run_ts"), "yyyy-MM-dd'T'HH:mm:ss"),
          "yyyy-MM-dd'T'HH:mm:ss") === col("run_ts"), 1)).as("n_ts_roundtrip"))
    }),

    // S8: KV batch-write sink — write the daily rollup through the chunked
    // sink into the in-memory store, then read the store back as the result
    // (transform.py:226-257 / 376-404: KPI rows → DynamoDB items).
    "s_kv_sink" -> ((s, dir) => {
      import s.implicits._
      val kpis = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(Kpis.moneySum(coalesce(col("value"), lit(0.0))).as("total_value"),
          count(lit(1)).as("n_events"))
        .select(
          concat_ws("|", col("event_type"), date_format(col("day"), "yyyy-MM-dd")).as("pk"),
          col("total_value").cast("string").as("total_value"),
          col("n_events").cast("string").as("n_events"))
      graft.sinks.InMemoryKv.clear()
      graft.sinks.KvSink.write(kpis, graft.sinks.InMemoryKv.writer("pk"),
        keyCol = Some("pk"))
      graft.sinks.InMemoryKv.snapshot
        .map(m => (m("pk"), m("total_value").toDouble, m("n_events").toLong))
        .toDF("pk", "total_value", "n_events")
    }),

    // ST3 (batch execution): the same flatMapGroupsWithState operator the
    // streaming layer runs, driven by a batch event Dataset built from the
    // tables — orders as header arrivals, lineitem as item arrivals, and
    // product arrivals for even part keys only (so completeness is a real
    // filter, like g_complete_groups).
    "st_completeness" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.{Completeness, PartEvent}
      val header = Tables.orders(s, dir).select(
        col("o_orderkey").cast("string").as("orderId"),
        lit(Completeness.KindOrder).as("kind"),
        lit(null).cast("string").as("productId"))
      val items = Tables.lineitem(s, dir).select(
        col("l_orderkey").cast("string").as("orderId"),
        lit(Completeness.KindItem).as("kind"),
        col("l_partkey").cast("string").as("productId"))
      val prods = Tables.lineitem(s, dir)
        .filter(col("l_partkey") % 2 === 0).select(
          col("l_orderkey").cast("string").as("orderId"),
          lit(Completeness.KindProduct).as("kind"),
          col("l_partkey").cast("string").as("productId"))
      Completeness.stream(header.unionByName(items).unionByName(prods).as[PartEvent])
        .select(col("orderId").as("order_id"),
          array_join(col("productIds"), ",").as("product_ids"))
    }),

    // ST5, exact streaming form of the daily KPIs: the batch execution of
    // the flatMapGroupsWithState operator (graft.streaming.DailyKpis),
    // oracled against the SAME SQL as a2_daily_kpis — per-day id-set state
    // reproduces the exact countDistinct integers, so streaming-exact and
    // batch math cannot drift.
    "st_daily_kpis_exact" -> ((s, dir) =>
      graft.streaming.DailyKpis.stream(enriched(s, dir)).toDF()),

    // Streaming sessionization answering e_sessionize's oracle VERBATIM:
    // events replayed as a multi-batch file stream (maxFilesPerTrigger
    // forces real cross-batch session-state merging), session_window in
    // append mode, finalized sessions landing in the snapshot-isolated
    // key upsert table. Two AvailableNow drains from ONE checkpoint pin
    // the stop/resume story: run 1 ingests every real file (the huge
    // watermark delay means nothing finalizes — arrival order is
    // hash-partitioned, so a smaller delay would drop genuinely-early
    // files as late); run 2 resumes the same state and ships one
    // far-future sentinel event, advancing the watermark past every real
    // session end so the engine's no-data batch flushes them all.
    // Production uses a real delay and flushes continuously — same code.
    // Streaming LM scoring (score-on-ingest): documents replayed as a
    // multi-batch file stream, each micro-batch scored against the FIXED
    // batch-trained unigram model inside foreachBatch — scoring is
    // per-document given the model, so batch-local scoring is exact with
    // NO cross-batch state — and upserted into the snapshot store. The
    // read-back answers t_lm_score's batch oracle VERBATIM, and the
    // scorer is LanguageModel.unigramScore itself, not a streaming copy.
    "st_lm_score" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val model = docs.filter(col("doc_id") % 2 === 0)
      val stage = tmpDir("graft_stlm_in")
      docs.write.mode("overwrite").parquet(stage)
      val (out, cp) = (tmpDir("graft_stlm_out"), tmpDir("graft_stlm_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 8).parquet(stage)
      val q = stream.writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val scored = LanguageModel.unigramScore(model, batch, "doc_id", "text")
          graft.streaming.StreamingPipeline
            .upsertBatchSnapshot(out, Seq("doc_id"))(scored, id)
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.streaming.StreamingPipeline.readSnapshot(s, out)
        .select("doc_id", "n_tokens", "avg_logprob", "ppl")
    }),
    // Streaming TF/DF maintenance (streaming/TermStatsStream.scala):
    // documents replayed as a multi-batch file stream; per-term df
    // (stateful distinct → update-mode count) and per-(doc, term) tf
    // drain into two snapshot-isolated upsert stores, and the joined
    // read-back answers t_term_stats's batch oracle VERBATIM. The same
    // dfCounts/tfCounts functions run batch-side in TermStatsStreamSpec,
    // so parity is by construction, not by copy.
    "st_term_stats" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val stage = tmpDir("graft_stterm_in")
      docs.write.mode("overwrite").parquet(stage)
      val schema = s.read.parquet(stage).schema
      val (outTf, cpTf) = (tmpDir("graft_stterm_tf"), tmpDir("graft_stterm_tfcp"))
      val (outDf, cpDf) = (tmpDir("graft_stterm_df"), tmpDir("graft_stterm_dfcp"))
      def drain(transform: DataFrame => DataFrame, keys: Seq[String],
                out: String, cp: String): Unit = {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 8).parquet(stage)
        val q = transform(stream).writeStream.outputMode("update")
          .option("checkpointLocation", cp)
          .foreachBatch(graft.streaming.StreamingPipeline
            .upsertBatchSnapshot(out, keys) _)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain(graft.streaming.TermStatsStream.dfCounts, Seq("term"), outDf, cpDf)
      drain(graft.streaming.TermStatsStream.tfCounts(_, 50L),
        Seq("doc_id", "term"), outTf, cpTf)
      graft.streaming.StreamingPipeline.readSnapshot(s, outTf)
        .join(graft.streaming.StreamingPipeline.readSnapshot(s, outDf), "term")
        .select("doc_id", "term", "tf", "df")
    }),
    "st_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val stage = tmpDir("graft_stsess_in")
      ev.write.mode("overwrite").parquet(stage)
      val maxTs = s.read.parquet(stage).agg(max(col("ts"))).first().getTimestamp(0)
      val (out, cp) = (tmpDir("graft_stsess_out"), tmpDir("graft_stsess_cp"))
      def drain(): Unit = {
        val stream = s.readStream.schema(s.read.parquet(stage).schema)
          .option("maxFilesPerTrigger", 8).parquet(stage)
        val sess = graft.streaming.Windows.sessionizeStream(
          stream, "ts", "user_id", "30 minutes", "3650 days")
        val q = sess.writeStream.outputMode("append")
          .option("checkpointLocation", cp)
          .foreachBatch(graft.streaming.StreamingPipeline
            .upsertBatchSnapshot(out, Seq("user_id", "session_start")) _)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain()
      // sentinel: one event far enough ahead that watermark (sentinel −
      // delay) clears every real session end; its own session never
      // finalizes and its user id never appears in the output
      import s.implicits._
      Seq((-1L, new java.sql.Timestamp(
        maxTs.getTime + (3651L * 24 * 3600 * 1000))))
        .toDF("user_id", "ts")
        .write.mode("append").parquet(stage)
      drain()
      graft.streaming.StreamingPipeline.readSnapshot(s, out)
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"))
    }),

    // ST5, second KPI table (VERDICT r04 #1): the REAL streaming
    // dailyKpiWriterPartitioned drained (AvailableNow) over a file-sourced
    // copy of the enriched rows into its partitioned upsert table, read
    // back and compared per day against the exact batch dailyKpis. Exact
    // columns (decimal-summed revenue, item count) are pinned equal; the
    // HLL++ sketch columns are pinned within 5% (tolerance-oracle pattern,
    // like a8_approx_distinct). An inner join makes a MISSING day fail the
    // driver's row-count compare, so silent drops can't pass.
    "st_daily_kpis" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val enr = enriched(s, dir)
      val stage = tmpDir("graft_stdk_in")
      enr.select(col("order_id"), col("user_id"), col("product_id"),
          col("sale_price"), col("is_returned"), col("order_date"))
        .write.mode("overwrite").parquet(stage)
      val (out, cp) = (tmpDir("graft_stdk_out"), tmpDir("graft_stdk_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema).parquet(stage)
      val q = graft.streaming.StreamingPipeline
        .dailyKpiWriterPartitioned(stream, out, cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = s.read.parquet(out + "/data").select(
        col("order_date"), col("total_orders").as("s_orders"),
        col("total_revenue").as("s_revenue"),
        col("total_items_sold").as("s_items"),
        col("return_rate").as("s_rr"),
        col("unique_customers").as("s_users"))
      Kpis.dailyKpis(enr).join(streamed, Seq("order_date"))
        .select(col("order_date"),
          (col("s_revenue") === col("total_revenue")).as("revenue_exact"),
          (col("s_items") === col("total_items_sold")).as("items_exact"),
          (abs(col("s_orders") - col("total_orders")) <=
            greatest(lit(1.0), col("total_orders") * 0.05)).as("orders_close"),
          (abs(col("s_users") - col("unique_customers")) <=
            greatest(lit(1.0), col("unique_customers") * 0.05)).as("customers_close"),
          // rate × orders recovers the EXACT returned-item count on both
          // sides (the numerator is exact everywhere; only the denominator
          // is sketched) — a sharper invariant than a tolerance on the
          // ratio itself, which an off-by-one sketch on a 2-order day
          // would break while still being a correct sketch
          (abs(col("s_rr") * col("s_orders") -
            col("return_rate") * col("total_orders")) <= lit(0.5))
            .as("returned_count_match"))
    }),
    // Streaming near-duplicate dedup (VERDICT r05 #1): the planted corpus
    // drained through the incremental MinHash/LSH leg
    // (graft.streaming.NearDupStream — per-row signatures, banded
    // candidate state, registry Jaccard verify), then compared against the
    // batch Dedup.dropNearDuplicates on the SAME corpus. bands = 16 (r=1)
    // gives the planted-recall guarantee of dedup_near_recall; the whole
    // corpus drains as one AvailableNow batch, where intra-bucket
    // ascending-id processing matches the batch min-id-canonical
    // convention — so survivors must agree EXACTLY. One row per original:
    // its copy dropped in the stream, and stream/batch membership agreeing
    // for both the original and the copy.
    "st_neardup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val corpus = docsWithPlantedDups(s, dir)
      val stage = tmpDir("graft_stnd_in")
      corpus.write.mode("overwrite").parquet(stage)
      val (work, cp) = (tmpDir("graft_stnd_work"), tmpDir("graft_stnd_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema).parquet(stage)
      val q = graft.streaming.NearDupStream.writer(stream, "doc_id", "text",
        work, cp, threshold = 0.5, bands = 16)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamKept = graft.streaming.NearDupStream.survivors(s, work)
      val batchKept = Dedup.dropNearDuplicates(corpus, "doc_id", "text",
        threshold = 0.5, bands = 16)
      def member(kept: DataFrame, flag: String, shift: Long) =
        kept.select((col("doc_id") - shift).as("doc_id"), lit(true).as(flag))
      Tables.documents(s, dir).select("doc_id")
        .join(member(streamKept, "s_o", 0L), Seq("doc_id"), "left")
        .join(member(batchKept, "b_o", 0L), Seq("doc_id"), "left")
        .join(member(streamKept, "s_c", PlantedOffset), Seq("doc_id"), "left")
        .join(member(batchKept, "b_c", PlantedOffset), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (!coalesce(col("s_c"), lit(false))).as("dropped"),
          ((coalesce(col("s_o"), lit(false)) === coalesce(col("b_o"), lit(false))) &&
            (coalesce(col("s_c"), lit(false)) === coalesce(col("b_c"), lit(false))))
            .as("batch_agree"))
    }),

    // Streaming embedding dedup (streaming/EmbDedupStream.scala): the
    // second modality through the streaming dedup machinery — planted
    // exact copies of vec_id < 50 drained through the sign-bucket
    // candidate state + registry cosine verify. An identical vector
    // shares its original's bucket by construction and verifies at
    // cosine 1.0, so every copy MUST drop and every original MUST
    // survive — structural, independent of how crude the 8-bit blocking
    // is. (At threshold 0.99 the random corpus holds no cross pairs; a
    // planted pair is the only ≥-threshold edge per bucket.)
    "st_emb_dedup" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val e = embDouble(s, dir).select(col("vec_id"), col("emb_d"))
      val planted = e.unionByName(e.filter(col("vec_id") < 50).select(
        (col("vec_id") + PlantedOffset).as("vec_id"), col("emb_d")))
      val stage = tmpDir("graft_sted_in")
      planted.write.mode("overwrite").parquet(stage)
      val (work, cp) = (tmpDir("graft_sted_work"), tmpDir("graft_sted_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema).parquet(stage)
      val q = graft.streaming.EmbDedupStream.writer(stream, "vec_id", "emb_d",
        work, cp, threshold = 0.99)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val kept = graft.streaming.EmbDedupStream.survivors(s, work)
      val base = e.filter(col("vec_id") < 50).select(col("vec_id"))
      base
        .join(kept.select(col("vec_id"), lit(true).as("k_o")),
          Seq("vec_id"), "left")
        .join(kept.select((col("vec_id") - PlantedOffset).as("vec_id"),
          lit(true).as("k_c")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("k_o"), lit(false)).as("original_kept"),
          (!coalesce(col("k_c"), lit(false))).as("copy_dropped"))
    }),

    // The bounded-TTL twin (VERDICT r06 #4): the SAME planted corpus
    // through candidatesBounded — watermark + per-bucket event-time TTL,
    // the declared 100 TB default — with every document timestamped inside
    // one 30-minute window so the whole corpus sits within the 24 h
    // horizon. Within-horizon, eviction must be a no-op: the dropped set
    // equals the unbounded leg's, which equals batch. This puts the
    // eviction-capable code path (watermark tagging, null-ts filter, TTL
    // arming) under the driver's oracle, not just TestGroupState units.
    "st_neardup_bounded" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val corpus = docsWithPlantedDups(s, dir).withColumn("ts",
        timestamp_seconds(lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00"))
          .cast("long") + pmod(col("doc_id"), lit(1800L))))
      val stage = tmpDir("graft_stndb_in")
      corpus.write.mode("overwrite").parquet(stage)
      val (work, cp) = (tmpDir("graft_stndb_work"), tmpDir("graft_stndb_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema).parquet(stage)
      val q = graft.streaming.NearDupStream.writerBounded(stream, "doc_id",
        "text", "ts", watermark = "2 hours", ttlMs = 24L * 3600 * 1000,
        work, cp, threshold = 0.5, bands = 16)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamKept = graft.streaming.NearDupStream.survivors(s, work)
      val batchKept = Dedup.dropNearDuplicates(corpus.drop("ts"), "doc_id",
        "text", threshold = 0.5, bands = 16)
      def member(kept: DataFrame, flag: String, shift: Long) =
        kept.select((col("doc_id") - shift).as("doc_id"), lit(true).as(flag))
      Tables.documents(s, dir).select("doc_id")
        .join(member(streamKept, "s_o", 0L), Seq("doc_id"), "left")
        .join(member(batchKept, "b_o", 0L), Seq("doc_id"), "left")
        .join(member(streamKept, "s_c", PlantedOffset), Seq("doc_id"), "left")
        .join(member(batchKept, "b_c", PlantedOffset), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (!coalesce(col("s_c"), lit(false))).as("dropped"),
          ((coalesce(col("s_o"), lit(false)) === coalesce(col("b_o"), lit(false))) &&
            (coalesce(col("s_c"), lit(false)) === coalesce(col("b_c"), lit(false))))
            .as("batch_agree"))
    }),

    // Joint KPI commit (VERDICT r05 #4): ONE streaming query maintains BOTH
    // reference KPI tables in one date-keyed state machine and commits them
    // under a single SnapshotStore pointer per micro-batch (a crash cannot
    // leave the pair at different batch ids; readers are snapshot-isolated,
    // VERDICT r05 #3). Both tables are exact, so each drained table answers
    // the corresponding BATCH oracle verbatim (a1/a2's SQL).
    "st_joint_category" -> ((s, dir) =>
      graft.streaming.JointKpis.categoryTable(s, jointKpiRoot(s, dir))
        .select("category", "order_date", "daily_revenue", "avg_order_value",
          "avg_return_rate")),
    "st_joint_daily" -> ((s, dir) =>
      graft.streaming.JointKpis.dailyTable(s, jointKpiRoot(s, dir))
        .select("order_date", "total_orders", "total_revenue",
          "total_items_sold", "return_rate", "unique_customers")),
    // The fact-grain variant (VERDICT r06 missing #3): the same pair
    // committed through ONE multi-table partition manifest —
    // O(touched order_date partitions) per table under a single pointer —
    // and still answering the batch a1/a2 oracles verbatim.
    "st_jointm_category" -> ((s, dir) =>
      graft.streaming.JointKpis.categoryTableManifested(s,
        jointKpiRootManifested(s, dir))
        .select("category", "order_date", "daily_revenue", "avg_order_value",
          "avg_return_rate")),
    "st_jointm_daily" -> ((s, dir) =>
      graft.streaming.JointKpis.dailyTableManifested(s,
        jointKpiRootManifested(s, dir))
        .select("order_date", "total_orders", "total_revenue",
          "total_items_sold", "return_rate", "unique_customers")),

    // ---- event-time windows (§7.5 extensions over the events stream) ----
    "e_tumbling" -> ((s, dir) =>
      graft.streaming.Windows.tumbling(
        Tables.events(s, dir), "ts", "event_type", "1 hour", "value")),
    // session bounds as µs-formatted strings: the events table is
    // nanosecond-precision, and a raw-timestamp compare would hinge on the
    // comparator's ns-vs-µs normalization; formatted strings are exact on
    // both engines.
    "e_sliding" -> ((s, dir) =>
      graft.streaming.Windows.sliding(
        Tables.events(s, dir), "ts", "event_type", "1 hour", "30 minutes")),
    // ranking / top-N-per-group (window function family): top-3 parts by
    // revenue within each category
    "w_top_parts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      enriched(s, dir)
        .groupBy(col("category"), col("product_id"))
        .agg(Kpis.moneySum(col("sale_price")).as("revenue"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("category"))
            .orderBy(col("revenue").desc, col("product_id"))))
        .filter(col("rn") <= 3)
    }),
    // global top-k: orderBy + limit plans as TakeOrderedAndProject —
    // per-partition heaps then a k-row driver merge, never a full sort
    // (the scalable global-limit shape; full tiebreak keeps it
    // deterministic for the oracle)
    "w_global_topk" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")),
    // cumulative (running-total) window: per-priority revenue/order count
    // accumulated over days. PARTITIONED window — each priority class
    // sorts independently after one hash exchange, so the sort is
    // partition-parallel (a global ORDER BY window would funnel 100 TB
    // through one task). Decimal accumulation, cast once at the edge.
    "w_running_total" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"),
          count(lit(1)).as("n_orders"))
      val w = Window.partitionBy(col("priority")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select(col("priority"), col("day"), col("n_orders"),
        sum(col("n_orders")).over(w).as("cum_orders"),
        sum(col("rev_dec")).over(w).cast("double").as("cum_revenue"))
    }),
    // lag/lead analytic window: day-over-day event-count delta per event
    // type — the trend query every KPI dashboard derives from the daily
    // rollup. Same partitioned-window scale shape as w_running_total;
    // integer-only output keeps it hash-exact.
    "w_day_over_day" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      daily.select(col("event_type"), col("day"), col("n"),
        lag(col("n"), 1).over(w).as("prev_n"),
        (col("n") - coalesce(lag(col("n"), 1).over(w), lit(0L))).as("delta"))
    }),
    // quantile bucketing: customers into spend deciles — NTILE over a
    // per-customer aggregation (the "assign every user a quality/size
    // bucket" curation step). PARTITIONED window is impossible here (one
    // global decile ranking), but the window input is the already
    // aggregated per-customer frame — 150k·sf rows, not the fact table —
    // so the single-partition sort is over the small aggregate, the same
    // shape as a global top-k over aggregates.
    "w_ntile_deciles" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("customer"))
        .agg(Kpis.moneySum(col("o_totalprice")).as("total_spend"),
          count(lit(1)).as("n_orders"))
      spend.select(col("customer"), col("total_spend"), col("n_orders"),
        ntile(10).over(Window.orderBy(col("total_spend").desc, col("customer")))
          .as("decile"))
    }),
    // Exact global percent_rank with distributed bookkeeping
    // (Ranking.percentRank): the score-normalization transform on the
    // same spend frame — the only single-partition stage runs over
    // per-partition COUNT rows, never data.
    "w_percent_rank" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("customer"))
        .agg(Kpis.moneySum(col("o_totalprice")).as("total_spend"),
          count(lit(1)).as("n_orders"))
      graft.operators.Ranking.percentRank(spend,
        Seq(col("total_spend").desc, col("customer")), "pct_rank")
        .select("customer", "total_spend", "n_orders", "pct_rank")
    }),
    // the 100 TB form of w_ntile_deciles (VERDICT r05 #2): identical
    // deciles — same oracle SQL — via graft.operators.Ranking.ntileExact's
    // range-partition + exact rank arithmetic, with NO single-partition
    // exchange anywhere in the plan (PlanAuditSpec locks that)
    "w_ntile_boundaries" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey").as("customer"))
        .agg(Kpis.moneySum(col("o_totalprice")).as("total_spend"),
          count(lit(1)).as("n_orders"))
      graft.operators.Ranking.ntileExact(spend, 10,
        Seq(col("total_spend").desc, col("customer")), "decile")
        .select("customer", "total_spend", "n_orders", "decile")
    }),
    // per-group outlier flagging with DISTRIBUTED-DETERMINISTIC z-scores:
    // stddev/avg over doubles are combine-order-dependent (the repo rule
    // bans them in oracled paths), so the moments come from EXACT decimal
    // sums (Σx, Σx²) and the float math is a fixed chain of single IEEE
    // ops — mean = Σx/n, var = Σx²/n - mean², z = (x - mean)/sqrt(var) —
    // each correctly rounded, hence bit-identical on any engine. One
    // aggregation + a broadcast join back; no window over the facts.
    "a10_outliers" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      // (18,2) factors keep the product inside both engines' decimal-38
      // multiply rule (36+ digits result) — exact at these magnitudes
      val dec = org.apache.spark.sql.types.DecimalType(18, 2)
      val moments = o.groupBy(col("o_orderpriority").as("priority")).agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(dec)).cast("double").as("sx"),
        sum((col("o_totalprice").cast(dec) * col("o_totalprice").cast(dec))
          .cast(org.apache.spark.sql.types.DecimalType(38, 4)))
          .cast("double").as("sx2"))
      val stats = moments.select(col("priority"),
        (col("sx") / col("n")).as("mean"),
        sqrt(col("sx2") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")))
          .as("sd"))
      // top-20 by |z|, not a fixed sigma cut: the synthetic prices are
      // uniform (max |z| ≈ 1.8), so a 3σ filter would be structurally
      // empty — a vacuous oracle. TakeOrdered with a full tiebreak keeps
      // it deterministic and global-sort-free.
      o.select(col("o_orderkey"), col("o_orderpriority").as("priority"),
          col("o_totalprice"))
        .join(broadcast(stats), "priority")
        .withColumn("z", (col("o_totalprice") - col("mean")) / col("sd"))
        .orderBy(abs(col("z")).desc, col("o_orderkey"))
        .limit(20)
        .select(col("priority"), col("o_orderkey"), col("o_totalprice"),
          round(col("z"), 6).as("z"))
    }),
    // Equi-width histogram profiling: fixed bounds (no data-dependent
    // min/max pass — the two-pass form divides by a float range that
    // drifts across engines), floor arithmetic shared with the oracle,
    // over-range values clamp into the last bucket. One map-side-combined
    // aggregation on ≤ 20 keys — the data-profiling pass that runs before
    // any quality gate at 100 TB.
    "a11_histogram" -> ((s, dir) =>
      graft.operators.Profiling.histogram(Tables.orders(s, dir),
        col("o_totalprice"), 25000.0, 20)),
    // Histogram drift (Profiling.histogramDrift): the per-commit
    // monitoring read — compare the price distribution before and
    // after a mutation (every 7th order's price doubled, the same
    // change the version-diff family plants), report per-bucket
    // before/after counts and the integer delta. O(buckets) output
    // regardless of table size.
    "a12_drift" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val mutated = o.withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      graft.operators.Profiling.histogramDrift(o, mutated,
        col("o_totalprice"), 25000.0, 20)
    }),
    // Exact two-sample KS drift (Profiling.ksDrift): the same planted
    // price-doubling mutation as a12_drift, read as ONE distribution
    // statistic — the supremum CDF gap found with pure integer
    // arithmetic (|cumA·nB − cumB·nA| maximized, divided once).
    "a21_ks_drift" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val mutated = o.withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")))
      graft.operators.Profiling.ksDrift(o, mutated, col("o_totalprice"))
    }),
    // STREAMING drift monitor: the mutated price stream replays in
    // micro-batches; an update-mode per-value count aggregation drains
    // cumulative counts into the snapshot upsert store (the st_term_stats
    // convergence argument: last-wins keyed upserts of cumulative counts
    // equal the batch counts once drained), and the final KS reads the
    // STORE against the reference — answering a21_ks_drift's oracle
    // verbatim. The monitor a 100 TB ingest actually runs: per-trigger
    // cost is the batch's count delta, the KS itself is O(distinct
    // values) whenever probed.
    "st_drift" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val o = Tables.orders(s, dir)
      val mutated = o.select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      val stage = tmpDir("graft_stdrift_in")
      mutated.write.mode("overwrite").parquet(stage)
      val (out, cp) = (tmpDir("graft_stdrift_out"), tmpDir("graft_stdrift_cp"))
      val stream = s.readStream.schema(s.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", 8).parquet(stage)
      val counts = stream
        .select(col("o_totalprice").as("v")).filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      val q = counts.writeStream.outputMode("update")
        .option("checkpointLocation", cp)
        .foreachBatch(graft.streaming.StreamingPipeline
          .upsertBatchSnapshot(out, Seq("v")) _)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val after = graft.streaming.StreamingPipeline.readSnapshot(s, out)
      val before = o.select(col("o_totalprice").as("v"))
        .filter(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      graft.operators.Profiling.ksDriftFromCounts(before, after, "v", "cnt")
    }),

    // Robust outliers (median/MAD, the quantile companion to
    // a10_outliers' moment z-scores): per-priority exact medians via
    // the scale-safe quantilesCont machinery — both the median and the
    // MAD pass use range-partitioned ranks, no whole-group buffers —
    // then a fixed IEEE chain (price-med)/(mad*1.4826) rounded to 6,
    // top-20 by |robust z| with a full tiebreak.
    // key-skew diagnostic (operators/Skew.scala): top keys by load with
    // share + ×mean — exact counts, single-division ratios, oracle-exact
    "a15_skew_report" -> ((s, dir) =>
      graft.operators.Skew.skewReport(Tables.lineitem(s, dir), "l_partkey")),
    // equi-depth histogram: edges at exact quantiles (quantilesCont ≡
    // quantile_cont bit-for-bit — the a7 family pins that), assignment by
    // deterministic strict comparison — the whole report hash-compares
    "a16_equidepth" -> ((s, dir) =>
      graft.operators.Profiling.equiDepthHistogram(
        Tables.orders(s, dir), col("o_totalprice"), nBuckets = 8)),
    "a14_robust_outliers" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("priority"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("price"))
      val med = graft.operators.Ranking.quantilesCont(
        o, "priority", "price", Seq(0.5 -> "med"))
      val dev = o.join(broadcast(med), "priority")
        .select(col("priority"), abs(col("price") - col("med")).as("absdev"))
      val mad = graft.operators.Ranking.quantilesCont(
        dev, "priority", "absdev", Seq(0.5 -> "mad"))
      val rz = (col("price") - col("med")) / (col("mad") * 1.4826)
      o.join(broadcast(med), "priority").join(broadcast(mad), "priority")
        .orderBy(abs(rz).desc, col("o_orderkey"))
        .limit(20)
        .select(col("priority"), col("o_orderkey"), col("price"),
          round(rz, 6).as("robust_z"))
    }),
    // Group-median null imputation (the repair transform a feature
    // pipeline runs before training): every 10th order's price is nulled,
    // then filled with its priority group's EXACT median from the
    // scale-safe quantilesCont — medians are bit-identical to DuckDB's
    // quantile_cont (the a7/a14 contract), so the imputed values
    // hash-compare without tolerance. NO broadcast hint on the median
    // join (AQE broadcasts the 5-row frame at runtime anyway).
    "a18_impute_median" -> ((s, dir) => {
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority").as("grp"),
        when(col("o_orderkey") % 10 === 0, lit(null))
          .otherwise(col("o_totalprice").cast("double")).as("__v"))
      val med = graft.operators.Ranking.quantilesCont(
        base, "grp", "__v", Seq(0.5 -> "__med"))
      base.join(med, "grp")
        .select(col("o_orderkey"), col("grp"),
          round(coalesce(col("__v"), col("__med")), 6).as("value_imputed"),
          col("__v").isNull.as("was_imputed"))
    }),
    // Winsorization (the outlier-clipping repair transform): values
    // clipped to their priority group's EXACT [p10, p90] off the same
    // scale-safe quantilesCont — bit-identical quantiles (the a7/a18
    // contract), so clipped values hash-compare without tolerance.
    "a20_winsorize" -> ((s, dir) => {
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderpriority").as("grp"),
        col("o_totalprice").cast("double").as("__v"))
      val q = graft.operators.Ranking.quantilesCont(base, "grp", "__v",
        Seq(0.1 -> "__lo", 0.9 -> "__hi"))
      base.join(q, "grp")
        .select(col("o_orderkey"), col("grp"),
          round(least(greatest(col("__v"), col("__lo")), col("__hi")), 6)
            .as("value_w"),
          (col("__v") < col("__lo") || col("__v") > col("__hi")).as("was_clipped"))
    }),
    // One-pass table profile (Profiling.tableProfile): every column's
    // counts/nulls/min/max in a single aggregation, pivoted to a row
    // per column. The oracled projection keeps the exact columns; the
    // HLL++ approx_distinct the same pass computes is pinned within 5%
    // by ProfilingSpec (the a8_approx_distinct stance: sketches don't
    // hash-compare across engines).
    "a13_profile" -> ((s, dir) =>
      graft.operators.Profiling.tableProfile(Tables.orders(s, dir),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))
        .select("column_name", "n_rows", "n_nulls", "min_value", "max_value")),
    // Ordered funnel (operators/Funnel.scala): signup → click →
    // purchase conversion counts; strictly-after semantics on integer
    // epoch micros (raw nanos timestamps floor identically in both
    // engines — last-3-digit comparisons cannot diverge).
    "e_funnel" -> ((s, dir) =>
      graft.operators.Funnel.report(Tables.events(s, dir),
        "user_id", "event_type", "ts", Seq("signup", "click", "purchase"))),
    // LOCF gap-fill resample (Timeseries.resampleLocf): each user's
    // value series on a daily grid; the oracle replays it with an ASOF
    // join over the same deduped samples.
    "e_resample" -> ((s, dir) =>
      graft.operators.Timeseries.resampleLocf(
        Tables.events(s, dir), "user_id", "ts", "value",
        stepMicros = 86400000000L)),
    // Linear-interpolation resample: same grid, each point interpolated
    // between its bracketing samples (exactly the sample when on one);
    // both brackets from running last(ignoreNulls) windows over ONE key
    // exchange, decimal/integer until the single IEEE chain.
    "e_resample_linear" -> ((s, dir) =>
      graft.operators.Timeseries.resampleLinear(
        Tables.events(s, dir), "user_id", "ts", "value",
        stepMicros = 86400000000L)),
    // EWMA (Timeseries.ewma): per-user exponentially weighted level at
    // alpha 0.3 — the sequential recurrence as ONE time-ordered fold per
    // key; the oracle replays the identical fold with list_reduce.
    "e_ewma" -> ((s, dir) =>
      graft.operators.Timeseries.ewma(
        Tables.events(s, dir), "user_id", "ts", "value")),
    // Time-weighted average (operators/Timeseries.scala): per-user mean
    // of `value` weighted by how long each sample held — decimal-exact
    // products/sums, one IEEE division rounded to 6.
    "e_time_weighted" -> ((s, dir) =>
      graft.operators.Timeseries.timeWeightedAvg(
        Tables.events(s, dir), "user_id", "ts", "value")),
    // Cohort retention (Funnel.cohortRetention): first-activity-week
    // cohorts × weekly activity, long form; Monday-aligned weeks make
    // the day-diff div 7 exact in both engines.
    "e_cohorts" -> ((s, dir) =>
      graft.operators.Funnel.cohortRetention(
        Tables.events(s, dir), "user_id", "ts")),
    "e_sessionize" -> ((s, dir) =>
      graft.streaming.Windows.sessionize(
        Tables.events(s, dir), "ts", "user_id", "30 minutes")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
          col("n_events"))),

    // ---- multimodal columns (§7.5: opaque binary + typed metadata) ----
    "mm_describe" -> ((s, dir) =>
      graft.multimodal.Multimodal.describe(
        Tables.documents(s, dir).select(
          col("doc_id").as("media_id"),
          lit("text/plain").as("media_type"),
          col("text").cast("binary").as("content")))),
    // The stub decoder is deterministic (feature i = byte[i % len] / 255f),
    // so the whole mapPartitions decode boundary is oracle-checkable: the
    // first feature, scaled back to its byte, must equal the first byte of
    // the content — which DuckDB reads as ascii(text) on this all-ASCII
    // corpus. (The raw float survives the 255× round-trip exactly for all
    // 256 byte values; the rounded float itself doesn't, e.g. byte 80.)
    "mm_features" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
        .as[graft.multimodal.MediaRecord]
      graft.multimodal.Multimodal.extractFeatures(media, dim = 8)
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 1).cast("double") * 255d, 0)
            .cast("integer").as("f0_byte"))
    }),
    // REAL-codec decode (multimodal/Codecs.scala — VERDICT r09 #4): 512
    // synthetic 24-bit BMPs built executor-side from closed-form pixel
    // formulas, encoded by the real encoder (padded bottom-up BGR rows)
    // and re-parsed by the real decoder; the oracle recomputes dimensions,
    // exact file length (header + stride padding), and per-channel pixel
    // SUMS analytically — one wrong byte offset, stride, or row direction
    // anywhere in the codec and the integer sums mismatch.
    "mm_decode_bmp" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/bmp",
          graft.multimodal.Codecs.Bmp.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.bmpStats(media)
    }),
    // Real-codec pixels through the media-dedup chain: 100 base BMPs plus
    // pixel-IDENTICAL twins of ids < 30 at +1e6; real decode → bucketed
    // descriptors → average-hash → Hamming banding. Identical payloads
    // decode to identical features and hence identical hashes, so every
    // planted twin MUST pair at hamming 0 regardless of descriptor
    // quality — the mm_phash_dups structural oracle, now with the real
    // codec (not the stub) behind the boundary.
    "mm_phash_real" -> ((s, dir) => {
      import s.implicits._
      def img(id: Long, seed: Long) = graft.multimodal.MediaRecord(id,
        "image/bmp", graft.multimodal.Codecs.Bmp.encode(16, 16, (x, y) => (
          ((x * 7 + y * 13 + seed * 31) % 256).toInt,
          ((x * 5 + y * 11 + seed * 17) % 256).toInt,
          ((x * 3 + y * 17 + seed * 7) % 256).toInt)))
      val media = s.range(100).map(id => img(id, id))
        .union(s.range(30).map(id => img(id + PlantedOffset, id)))
      val feats = graft.multimodal.Multimodal
        .extractFeaturesBmp(media, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      s.range(30).toDF("media_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
            .select(col("id_a").as("media_id"), lit(true).as("found")),
          Seq("media_id"), "left")
        .select(col("media_id"), coalesce(col("found"), lit(false)).as("found"))
    }),
    // ... and the audio twin: PCM-16 WAVs through the RIFF chunk walk,
    // with the exact interleaved-sample sum replayed by the oracle.
    "mm_decode_wav" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nSamples = (64 + id % 33).toInt * channels
        val samples = Array.tabulate(nSamples)(i =>
          (((i * 31 + 7 * id) % 65536) - 32768).toShort)
        graft.multimodal.MediaRecord(id, "audio/wav",
          graft.multimodal.Codecs.Wav.encode(rate, channels, samples))
      }
      graft.multimodal.Multimodal.wavStats(media)
    }),

    // Real PNG decode (Codecs.Png — VERDICT r11 #4): 512 RGB8 PNGs from
    // closed-form pixel formulas, zlib-deflated with the scanline filter
    // CYCLING y % 5, so every image exercises all five reconstruction
    // filters (None/Sub/Up/Average/Paeth); the oracle recomputes
    // dimensions and per-channel pixel sums analytically. (A deflate
    // stream's length is not closed-form, so n_pixels stands where the
    // BMP twin pins n_bytes.)
    "mm_decode_png" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(512).map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 3) % 7).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.pngStats(media)
    }),
    // The real image chain end to end (VERDICT r11 #4: resizeStub
    // replaced): PNG decode → EXACT 2×2 integer box resize → stats.
    // Every output pixel is floor(Σ block / 4), closed-form integer, so
    // the oracle recomputes the downsampled image block by block — a
    // wrong filter predictor, stride, or mean and the sums split.
    "mm_resize_real" -> ((s, dir) => {
      import s.implicits._
      val media = s.range(256).map { id =>
        val w = (2 * (4 + id % 5)).toInt
        val h = (2 * (3 + id % 4)).toInt
        graft.multimodal.MediaRecord(id, "image/png",
          graft.multimodal.Codecs.Png.encode(w, h, (x, y) => (
            ((x * 7 + y * 13 + id) % 256).toInt,
            ((x * 5 + y * 11 + 2 * id) % 256).toInt,
            ((x * 3 + y * 17 + 3 * id) % 256).toInt)))
      }
      graft.multimodal.Multimodal.resizePngStats(media, k = 2)
    }),
    // mm_phash_real's chain with the REAL RESAMPLER in the middle: PNG
    // decode → 2×2 box resize → bucketed descriptor → average-hash →
    // Hamming banding. Pixel-identical payloads resize to identical
    // pixels, so every planted twin must pair at hamming 0.
    "mm_phash_resized" -> ((s, dir) => {
      import s.implicits._
      def img(id: Long, seed: Long) = graft.multimodal.MediaRecord(id,
        "image/png", graft.multimodal.Codecs.Png.encode(16, 16, (x, y) => (
          ((x * 7 + y * 13 + seed * 31) % 256).toInt,
          ((x * 5 + y * 11 + seed * 17) % 256).toInt,
          ((x * 3 + y * 17 + seed * 7) % 256).toInt)))
      val media = s.range(100).map(id => img(id, id))
        .union(s.range(30).map(id => img(id + PlantedOffset, id)))
      val feats = graft.multimodal.Multimodal
        .extractFeaturesPngResized(media, k = 2, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      s.range(30).toDF("media_id")
        .join(pairs.filter(col("id_b") - col("id_a") === PlantedOffset)
            .select(col("id_a").as("media_id"), lit(true).as("found")),
          Seq("media_id"), "left")
        .select(col("media_id"), coalesce(col("found"), lit(false)).as("found"))
    }),

    // Perceptual-hash media dedup (Multimodal.phash + the shared Hamming
    // banding): planted byte-identical payloads decode (stub) to
    // identical features, hence identical average-hash bits — every
    // planted pair MUST surface at hamming 0 regardless of how crude the
    // stub decode is. Codec stays stubbed; hashing and banding are the
    // production expressions.
    "mm_phash_dups" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val planted = docs.unionByName(
        exactCopy(docs.filter(col("doc_id") < 50), PlantedOffset))
      val media = planted.select(col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
        .as[graft.multimodal.MediaRecord]
      val feats = graft.multimodal.Multimodal
        .extractFeatures(media, dim = 64).toDF()
      val pairs = graft.multimodal.Multimodal
        .phashNearDuplicates(feats, maxDist = 0)
      val base = docs.filter(col("doc_id") < 50).select(col("doc_id"))
      base.join(pairs, base("doc_id") === pairs("id_a") &&
          pairs("id_b") === base("doc_id") + PlantedOffset, "left_semi")
        .select(col("doc_id"), lit(true).as("found"))
    }),

    // Frame sampling through the stub demuxer (fixed-size frames, every
    // 2nd kept): deterministic record fan-out, so frame ids and sizes are
    // DuckDB-replicable — the flatMap decode boundary under the oracle.
    "mm_frames" -> ((s, dir) => {
      import s.implicits._
      val media = Tables.documents(s, dir).select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
        .as[graft.multimodal.MediaRecord]
      graft.multimodal.Multimodal.sampleFrames(media, frameBytes = 32, everyNth = 2)
        .toDF()
        .select(col("media_id").as("frame_id"),
          length(col("content")).as("n_bytes"))
    }),

    // ordered statistics: exact linear-interpolated percentiles per group
    // (same definition as DuckDB's quantile_cont, so bit-comparable).
    // SCALE BOUND (VERDICT r03 "What's wrong" #2): exact percentile() is an
    // ObjectHashAggregate that buffers EVERY group value in executor memory
    // — right for an sf-bounded oracle, an OOM hazard at 100× group sizes.
    // The scale default is a7_percentiles_approx below (bounded sketch).
    "a7_percentiles" -> ((s, dir) =>
      enriched(s, dir)
        .groupBy(col("category"))
        .agg(expr("percentile(sale_price, array(0.5, 0.9))").as("ps"))
        .select(col("category"),
          round(col("ps").getItem(0), 6).as("p50"),
          round(col("ps").getItem(1), 6).as("p90"))),
    // EXACT percentiles at scale (closes the a7 sf-bound, VERDICT r05
    // nit): same quantile_cont math, but via graft.operators.Ranking
    // .quantilesCont — range-partitioned exact ranks + driver-side target
    // arithmetic, spillable sorts instead of ObjectHashAggregate's
    // in-memory whole-group buffers. Same oracle SQL as a7_percentiles.
    "a7_percentiles_scalable" -> ((s, dir) =>
      graft.operators.Ranking.quantilesCont(
        enriched(s, dir), "category", "sale_price",
        Seq(0.5 -> "p50_raw", 0.9 -> "p90_raw"))
        .select(col("category"),
          round(col("p50_raw"), 6).as("p50"),
          round(col("p90_raw"), 6).as("p90"))),
    // Scale-safe percentiles: approx_percentile keeps a fixed-size
    // Greenwald-Khanna sketch per group (memory bounded by `accuracy`, not
    // group size — the 100 TB default). The oracled check asserts the
    // sketch lands within 1% of the exact order statistic: the exact value
    // is computed here once at test scale, and the driver's oracle pins
    // every flag to true against DuckDB's quantile_cont.
    "a7_percentiles_approx" -> ((s, dir) =>
      enriched(s, dir)
        .groupBy(col("category"))
        .agg(expr("percentile(sale_price, array(0.5, 0.9))").as("ex"),
          expr("approx_percentile(sale_price, array(0.5, 0.9), 10000)").as("ap"))
        .select(col("category"),
          (abs(col("ap").getItem(0) - col("ex").getItem(0))
            <= abs(col("ex").getItem(0)) * 0.01).as("p50_ok"),
          (abs(col("ap").getItem(1) - col("ex").getItem(1))
            <= abs(col("ex").getItem(1)) * 0.01).as("p90_ok"))),

    // Deterministic fixed-size-per-group sampling: order each group by a
    // content hash and keep the first k — the stable subsample a training
    // pipeline needs (same rows on every run, every engine, any
    // partitioning), unlike rand()-based sampling. One window pass;
    // md5 because both engines produce identical hex for it.
    "a9_sample_hash" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("__h", md5(concat_ws("|",
          col("l_orderkey").cast("string"), col("l_linenumber").cast("string"))))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("l_partkey"))
            .orderBy(col("__h"), col("l_orderkey"), col("l_linenumber"))))
        .filter(col("__rn") <= 3)
        .select("l_partkey", "l_orderkey", "l_linenumber")
    }),

    // Weighted sampling without replacement (Sampling.weightedSample —
    // Efraimidis–Spirakis A-ES keys over an md5-derived uniform): top-500
    // orders by u^(1/totalprice), compared in the rounded log domain so
    // both engines rank identically. Inclusion probability follows the
    // weight; the draw is deterministic, so the oracle replays it exactly.
    "a17_weighted_sample" -> ((s, dir) =>
      Sampling.weightedSample(
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            col("o_totalprice").cast("double").as("weight")),
        "o_orderkey", "weight", k = 500)
        .select(col("rank"), col("o_orderkey"), col("weight"),
          col("sample_key"))),

    // Stratified A-ES: the same draw ranked within each order-priority
    // stratum by a group-partitioned window — partition-parallel across
    // strata, and each stratum's sample equals what the global sampler
    // would draw from that stratum alone.
    "a19_weighted_stratified" -> ((s, dir) =>
      Sampling.weightedSamplePerGroup(
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderpriority").as("grp"),
            col("o_totalprice").cast("double").as("weight")),
        "o_orderkey", "weight", "grp", k = 20)
        .select(col("grp"), col("rank"), col("o_orderkey"), col("weight"),
          col("sample_key"))),

    // Rolling z-score over each customer's last-7-order window — the
    // time-series anomaly signal. Every windowed aggregate runs in
    // DECIMAL (association-free exact sums — a double sum would differ
    // between Spark's frame iteration and DuckDB's segment tree), then
    // ONE cast to double feeds a fixed IEEE chain for the z value.
    "w_rolling_z" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice").cast("decimal(15,2)").as("__p"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-6, Window.currentRow)
      val nD = count(lit(1)).over(w).cast("double")
      val smD = sum(col("__p")).over(w).cast("double")
      val sqD = sum(col("__p") * col("__p")).over(w).cast("double")
      val varD = (nD * sqD - smD * smD) / (nD * (nD - lit(1.0)))
      val z = (col("__p").cast("double") - smD / nD) / sqrt(varD)
      o.select(col("o_custkey"), col("o_orderkey"),
        nD.cast("long").as("n_window"),
        when(nD >= 2.0 && varD > 0.0, round(z, 6)).as("roll_z"))
    }),

    // Sketch-distinct family: HyperLogLog++ approx_count_distinct — the
    // 100 TB default when an exact distinct (a2's Expand plan or
    // a2_scalable's two-phase) is still too expensive: constant-size
    // registers per group, one shuffle, merge is a register-wise max so the
    // result is deterministic under any partitioning. The oracled check
    // pins the exact count (DuckDB-matchable) and asserts the sketch lands
    // within 5% of it (rsd = 1%, so this holds with huge margin).
    "a8_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"),
          approx_count_distinct(col("user_id"), 0.01).as("ap"))
        .select(col("event_type"), col("n_exact"),
          (abs(col("ap") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("approx_ok"))),

    // grouping-sets family: category×day → per-category → grand total in
    // one pass (Expand over the grouping sets, partial-agg per set).
    // Rolled-up NULLs get a sentinel so the compare never sorts mixed
    // null/non-null keys.
    "a6_rollup" -> ((s, dir) =>
      enriched(s, dir)
        .rollup(col("category"), col("order_date"))
        .agg(Kpis.moneySum(col("sale_price")).as("revenue"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("category"), lit("ALL")).as("category"),
          coalesce(date_format(col("order_date"), "yyyy-MM-dd"), lit("ALL")).as("order_date"),
          col("revenue"), col("n"))),
    // full cube: all four grouping sets in one Expand pass (the remaining
    // grouping-sets family member beside rollup)
    "a6_cube" -> ((s, dir) =>
      enriched(s, dir)
        .cube(col("category"), col("order_date"))
        .agg(Kpis.moneySum(col("sale_price")).as("revenue"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("category"), lit("ALL")).as("category"),
          coalesce(date_format(col("order_date"), "yyyy-MM-dd"), lit("ALL")).as("order_date"),
          col("revenue"), col("n"))),

    // ---- pivot / unpivot (reshaping family) ----
    // fixed value list keeps the pivot one-pass (no values-discovery job)
    // and the output schema static — the 100 TB-safe form
    "e_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", types)
        .count()
        // a (day, type) cell with no rows pivots to NULL; the relational
        // answer (and the oracle's FILTER count) is 0
        .select(col("day") +: types.map(c => coalesce(col(c), lit(0L)).as(c)): _*)
    }),
    "e_unpivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .unpivot(Array(col("day")), "event_type", "n")
        .filter(col("n").isNotNull)),

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
    "pipeline_curate_report" -> ((s, dir) => curationOf(s, dir).report),
    // STREAMING end-to-end curation (streaming/CurateStream.scala): the
    // same planted corpus replays as three ascending ingest days; every
    // trigger gates (dedup-registry anti-join + quality + language) and
    // republishes the whole-corpus artifacts (ppl gate, mixture, packing)
    // from the drained cumulative state through one atomic snapshot
    // commit. The drained layout and funnel report answer
    // pipeline_curate's / pipeline_curate_report's oracles VERBATIM —
    // batch/stream parity for the entire curation DAG.
    "st_curate" -> ((s, dir) =>
      graft.streaming.CurateStream.readPacked(s, curateStreamRoot(s, dir))
        .select("doc_id", "n_tokens", "start_token", "seq_first",
          "seq_last", "offset_in_seq")),
    "st_curate_report" -> ((s, dir) =>
      graft.streaming.CurateStream.readReport(s, curateStreamRoot(s, dir))),
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
          sum(col("n_chars").cast("long")).as("n_chars"))),

    // ---- sources / sinks (S1, S3, S5, S6, S9, S10) ----
    "s_csv_roundtrip" -> ((s, dir) => {   // S1 declared-schema CSV + S5 write
      val region = Tables.region(s, dir)
      val tmp = tmpDir("graft_csv_rt")
      region.write.mode("overwrite").option("header", "true").csv(tmp)
      Tables.csv(s, region.schema, tmp)
    }),
    // S1 inference variant (reference glue_job.py:170 pd.read_csv infers
    // types): one extra pass over the data at planning — declared-schema
    // `Tables.csv` stays the scale default.
    "s_csv_inferred" -> ((s, dir) => {
      val region = Tables.region(s, dir)
      val tmp = tmpDir("graft_csv_inf")
      region.write.mode("overwrite").option("header", "true").csv(tmp)
      Tables.csvInferred(s, tmp).select("r_regionkey", "r_name")
    }),
    // Malformed-record tolerance: PERMISSIVE parse with a corrupt-record
    // column — bad rows surface as data instead of failing the job (the
    // reference's pandas read_csv raises and poisons the whole batch).
    // Input is a fixed synthetic file, so the oracle pins exact counts.
    "s_csv_corrupt" -> ((s, dir) => {
      val tmp = tmpDir("graft_csv_bad")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tmp, "part.csv"),
        "id,name\n1,a\n2,b\nnot_a_number,c\n3,d\n")
      val schema = StructType(Seq(
        StructField("id", org.apache.spark.sql.types.LongType),
        StructField("name", org.apache.spark.sql.types.StringType),
        StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
      val df = s.read.option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(schema).csv(tmp)
      // the scan must read a data column alongside _corrupt_record (Spark
      // rejects corrupt-column-only queries); a malformed row parses its
      // typed columns to null, so count(id) IS the clean count
      df.agg(
        count(col("id")).as("n_clean"),
        count(col("_corrupt_record")).as("n_corrupt"))
    }),
    // Bucketed co-located join (the 100 TB lever for repeatedly-joined fact
    // tables): both sides written bucketed+sorted on the join key, so the
    // join runs with NO Exchange on either side (PartitionPruneSpec asserts
    // the plan; this entry puts the result under the DuckDB oracle).
    "s_bucketed_join" -> ((s, dir) => {
      Tables.writeBucketed(Tables.orders(s, dir)
        .select("o_orderkey", "o_totalprice"), 8, "o_orderkey", "graft_bkt_orders")
      Tables.writeBucketed(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"),
          col("l_extendedprice")), 8, "o_orderkey", "graft_bkt_items")
      s.table("graft_bkt_orders").join(s.table("graft_bkt_items"), "o_orderkey")
    }),
    // Z-order layout (operators/Layout.scala): the Morton interleave of
    // two 10-bit dimension keys, term-replicated in the oracle. The
    // layout pass itself (range exchange + in-partition sort on z) is
    // LayoutSpec-pinned; this query hash-locks the bit arithmetic that
    // decides every file's hypercube.
    "s_zorder" -> ((s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"), (col("o_custkey") % 1024).as("x"),
          (col("o_orderkey") % 1024).as("y"))
        .withColumn("z", graft.operators.Layout.zValue(
          Seq(col("x"), col("y")), 10))
        .select("o_orderkey", "x", "y", "z")),
    // Small-file compaction (Layout.compact): orders scattered into 64
    // files, bin-packed and rewritten in one pass; the read-back must be
    // the exact source table (LayoutSpec pins the file-count collapse and
    // the oversized-file path — here the oracle pins content identity).
    "s_compact" -> ((s, dir) => {
      val scattered = tmpDir("graft_compact_in")
      Tables.orders(s, dir).repartition(64)
        .write.mode("overwrite").parquet(scattered)
      val compacted = tmpDir("graft_compact_out")
      graft.operators.Layout.compact(s, scattered, compacted,
        targetBytes = 16L * 1024 * 1024)
      s.read.parquet(compacted)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
    }),
    // Table OPTIMIZE (Layout.optimize): 64 scattered files rewritten in
    // ONE pass that both compacts (partition count from total bytes /
    // target) and z-orders (custkey, orderkey) — the Delta
    // OPTIMIZE+ZORDER maintenance shape; contents hash-locked against
    // the source, file-count and clustering pinned by LayoutSpec.
    "s_optimize" -> ((s, dir) => {
      val scattered = tmpDir("graft_opt_in")
      Tables.orders(s, dir).repartition(64)
        .write.mode("overwrite").parquet(scattered)
      val out = tmpDir("graft_opt_out")
      graft.operators.Layout.optimize(s, scattered, out,
        zcols = Seq("o_custkey", "o_orderkey"), bits = 16,
        targetBytes = 16L * 1024 * 1024,
        statCols = Seq("o_custkey"))
      s.read.parquet(out)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
    }),
    // Dictionary label encoding (operators/Indexer.scala): the
    // frequency-DESC StringIndexer mapping joined back broadcast — the
    // fact table never reshuffles; the whole encoded table hash-compares
    // against the window replay.
    "e_string_index" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val mapping = graft.operators.Indexer.labelIndex(orders, "o_orderpriority")
      graft.operators.Indexer.encode(orders, "o_orderpriority", mapping, "prio_idx")
        .select(col("o_orderkey"), col("o_orderpriority"), col("prio_idx"))
    }),
    // File-stats data skipping (operators/Layout.scala) end-to-end over
    // the z-order layout it exists for: write orders z-ordered on
    // (custkey, orderkey), collect the per-file min/max index in one
    // aggregation, then answer a custkey range by reading ONLY the
    // files whose range intersects (LayoutSpec pins the pruning — ≤3 of
    // 10 files touched; this query hash-locks the exactness of the
    // pruned read against a full-scan oracle).
    "s_data_skipping" -> ((s, dir) => {
      val tmp = tmpDir("graft_skip")
      graft.operators.Layout.zorder(
        Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
        Seq(col("o_custkey"), col("o_orderkey")), 16, numPartitions = 8)
        .write.mode("overwrite").parquet(tmp)
      val stats = graft.operators.Layout.fileStats(s, tmp, Seq("o_custkey"))
      graft.operators.Layout.skippingRead(s, tmp, stats, "o_custkey",
          lit(100L), lit(400L))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }),
    "s_partitioned_roundtrip" -> ((s, dir) => { // S6 partitioned overwrite
      val tmp = tmpDir("graft_part_rt")
      Tables.writePartitioned(Tables.orders(s, dir), "o_orderstatus", tmp)
      s.read.parquet(tmp).select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
    }),
    // The partition-aware upsert under the oracle: seed a
    // status-partitioned table, merge an update batch (every 7th order's
    // price doubled — only its partitions are read and swapped), read the
    // table back. Exercises the per-partition staging/rename/backup path
    // end-to-end (ADVICE r03's crash-window machinery).
    "s_partitioned_upsert" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_pups")
      graft.streaming.StreamingPipeline.upsertPartitionedBatch(
        tmp, Seq("o_orderkey"), "o_orderstatus")(t, 0L)
      val updates = t.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      graft.streaming.StreamingPipeline.upsertPartitionedBatch(
        tmp, Seq("o_orderkey"), "o_orderstatus")(updates, 1L)
      s.read.parquet(tmp + "/data").select("o_orderkey", "o_custkey",
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    }),
    // the same two-batch upsert through the partition-MANIFEST snapshot
    // sink (O(touched) writes + MVCC readers, graft.state.ManifestStore):
    // batch 1 touches only the F/O partitions its updates live in, the
    // other status partitions are inherited by manifest reference — and
    // the final read must still equal the rename-swap sink's answer
    "s_partitioned_upsert_snapshot" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_pups_snap")
      graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderstatus")(t, 0L)
      val updates = t.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderstatus")(updates, 1L)
      graft.streaming.StreamingPipeline.readPartitionedSnapshot(s, tmp)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    }),
    // SCHEMA EVOLUTION ON WRITE (Upsert.upsertEvolve through the
    // partition-manifest sink — the reference's Delta MERGE autoMerge,
    // transform.py:331-339): batch 1 carries a NEVER-SEEN `note` column
    // and touches only the URGENT/HIGH priority partitions; the other
    // priorities are inherited by manifest reference with their
    // pre-evolution files and must read the new column as null. The
    // whole full-outer+coalesce+null-fill surface replays in DuckDB.
    "s_evolve_upsert" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_evolve")
      val sink = graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderpriority", mergeSchema = true) _
      sink(t.filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_totalprice", "o_orderpriority"), 0L)
      sink(t.filter(col("o_orderkey") % 2 === 0 &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderpriority"),
          concat(lit("c"), (col("o_orderkey") % 5).cast("string")).as("note")),
        1L)
      graft.streaming.StreamingPipeline.readPartitionedSnapshot(s, tmp)
        .select("o_orderkey", "o_totalprice", "o_orderpriority", "note")
    }),
    // SCHEMA EVOLUTION ACROSS STREAM RESTARTS — the form a live pipeline
    // actually meets (the reference's producers evolve, its Delta sink
    // autoMerges): era 1 drains a narrow producer into the evolving
    // snapshot sink and stops; the producer starts emitting a NEW column;
    // era 2 RESTARTS on the same checkpoint with the widened schema,
    // processes only the new files, and the store unions the column in —
    // no rewrite, no downtime, old rows read null. Batch ids continue
    // across the restart, so the sink's replay gate keeps working.
    "st_evolve" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val t = Tables.orders(s, dir)
      val stage = tmpDir("graft_stevo_in")
      val (store, cp) = (tmpDir("graft_stevo_out"), tmpDir("graft_stevo_cp"))
      def drain(schema: String): Unit = {
        val q = s.readStream.schema(schema).parquet(s"$stage/era*")
          .writeStream.outputMode("append")
          .option("checkpointLocation", cp)
          .foreachBatch(graft.streaming.StreamingPipeline.upsertBatchSnapshot(
            store, Seq("o_orderkey"), mergeSchema = true) _)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      t.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderpriority").as("prio"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/era1")
      drain("o_orderkey LONG, prio STRING")
      t.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"),
          concat(lit("u:"), col("o_orderpriority")).as("prio"),
          col("o_totalprice").as("bonus"))
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/era2")
      drain("o_orderkey LONG, prio STRING, bonus DOUBLE")
      graft.streaming.StreamingPipeline.readSnapshot(s, store)
        .select("o_orderkey", "prio", "bonus")
    }),
    // ... and the pinning half of the contract: AFTER the evolving commit,
    // versionAsOf = 0 still reads the pre-evolution schema and rows —
    // time travel is pinned to each version's own committed schema file.
    "s_evolve_timetravel" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_evolve_tt")
      val sink = graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderpriority", mergeSchema = true) _
      sink(t.filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_totalprice", "o_orderpriority"), 0L)
      sink(t.filter(col("o_orderkey") % 2 === 0 &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          col("o_orderpriority"),
          concat(lit("c"), (col("o_orderkey") % 5).cast("string")).as("note")),
        1L)
      graft.streaming.StreamingPipeline.readPartitionedSnapshot(s, tmp, Some(0L))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    }),

    // Keyed DELETE on the manifest store (ManifestStore.deletePartitioned
    // — the reference's Delta MERGE DELETE leg): commit orders, delete
    // every 5th key plus one whole status partition's rows ("P" has few
    // orders — exercises the emptied-partition manifest drop), read the
    // survivors back. The oracle replays the delete as an anti-filter on
    // the raw table, so a resurrected partition, a missed key, or an
    // over-delete all hash-fail.
    "s_partitioned_delete" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_pdel")
      graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderstatus")(t, 0L)
      val doomed = t.filter(col("o_orderkey") % 5 === 0 ||
          col("o_orderstatus") === "P")
        .select("o_orderkey", "o_orderstatus")
      graft.state.ManifestStore.deletePartitioned(s,
        new org.apache.hadoop.fs.Path(tmp), 1L, doomed,
        Seq("o_orderkey"), "o_orderstatus")
      graft.streaming.StreamingPipeline.readPartitionedSnapshot(s, tmp)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    }),

    // Time travel under the oracle (VERDICT r06 missing #1): the same
    // two-batch manifest upsert, then BOTH epochs read back — versionAsOf 0
    // must still show the pre-upsert prices while the current epoch shows
    // the doubled ones. DuckDB replicates both from the raw table, so a
    // stale pin, a wrong version resolution, or a reclaim-too-early all
    // hash-fail.
    "s_time_travel" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_tt")
      val sink = graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderstatus") _
      sink(t, 0L)
      sink(t.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2), 1L)
      val v0 = graft.streaming.StreamingPipeline
        .readPartitionedSnapshot(s, tmp, versionAsOf = Some(0L))
        .select(col("o_orderkey"), col("o_totalprice").as("price_v0"))
      val now = graft.streaming.StreamingPipeline.readPartitionedSnapshot(s, tmp)
        .select(col("o_orderkey"), col("o_totalprice").as("price_now"))
      v0.join(now, Seq("o_orderkey"))
    }),
    // Version diff (operators/Diff.scala) over the same manifest-snapshot
    // sink: batch 1 doubles every 7th order's price AND inserts re-keyed
    // copies of every 13th order, so diff(v0, current) must report
    // exactly those keys as 'changed' and 'added' — the audit read the
    // time-travel API exists for.
    "s_version_diff" -> ((s, dir) => {
      val t = Tables.orders(s, dir)
      val tmp = tmpDir("graft_vdiff")
      val sink = graft.streaming.StreamingPipeline.upsertPartitionedBatchSnapshot(
        tmp, Seq("o_orderkey"), "o_orderstatus") _
      sink(t, 0L)
      sink(t.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(t.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 1000000000L)), 1L)
      val v0 = graft.streaming.StreamingPipeline
        .readPartitionedSnapshot(s, tmp, versionAsOf = Some(0L))
      val now = graft.streaming.StreamingPipeline.readPartitionedSnapshot(s, tmp)
      graft.operators.Diff.diff(v0, now, Seq("o_orderkey"))
    }),
    // SCD Type-2 history build (operators/Scd.scala): each order's
    // lineitem sequence read as a change log (l_linenumber = version),
    // consecutive identical (returnflag, linestatus) payloads collapsed
    // into one validity interval with exclusive effective_to — the
    // dimension-history constructor over one key shuffle (both window
    // passes share the l_orderkey exchange). The synthetic lineitem
    // repeats line numbers, violating buildType2's unique-version
    // contract (ties make the run collapse order-dependent), so the log
    // is first collapsed to one deterministic record per (key, version)
    // — the cleanup any real change-log ingest does. The explicit
    // l_orderkey repartition makes the tie-collapse groupBy, whose
    // (key, version) clustering it satisfies as a subset, AND both
    // window passes share ONE exchange (asserted by PlanAuditSpec).
    "e_scd2_history" -> ((s, dir) =>
      graft.operators.Scd.buildType2(
        Tables.lineitem(s, dir)
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(min(col("l_returnflag")).as("l_returnflag"),
            min(col("l_linestatus")).as("l_linestatus")),
        Seq("l_orderkey"), "l_linenumber")),
    // The STREAMING SCD2 maintenance operator (streaming/Scd2Stream)
    // batch-executed over the same collapsed change log: per-key state
    // holds only the open run (O(keys), history-length independent),
    // and the emitted intervals answer e_scd2_history's oracle SQL
    // verbatim — streaming maintenance and the batch build cannot
    // drift. Payload packs (returnflag, linestatus) into one string
    // and unpacks after, keeping the operator schema-free.
    "st_scd2_history" -> ((s, dir) => {
      import s.implicits._
      val events = Tables.lineitem(s, dir)
        .repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(min(col("l_returnflag")).as("rf"), min(col("l_linestatus")).as("ls"))
        .select(col("l_orderkey").cast("long").as("key"),
          col("l_linenumber").cast("long").as("version"),
          concat(col("rf"), lit("|"), col("ls")).as("payload"))
        .as[graft.streaming.ScdEvent]
      graft.streaming.Scd2Stream.runs(events).toDF()
        .select(col("key").as("l_orderkey"), col("effective_from"),
          col("effective_to"), col("is_current"),
          split(col("payload"), "\\|").getItem(0).as("l_returnflag"),
          split(col("payload"), "\\|").getItem(1).as("l_linestatus"))
    }),
    // Temporal enrichment (Scd.enrichAsOf): every lineitem row joined
    // to the dimension run valid at ITS line number — the
    // event-time-correct lookup (joining is_current would rewrite
    // history). Equi-keys carry the join, the interval bounds are
    // residuals, and disjoint runs mean output multiplicity == fact
    // multiplicity; the dimension side arrives already partitioned by
    // the build's window exchange.
    "j10_temporal_enrich" -> ((s, dir) => {
      val scd = graft.operators.Scd.buildType2(
        Tables.lineitem(s, dir)
          .repartition(col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_linenumber"))
          .agg(min(col("l_returnflag")).as("l_returnflag"),
            min(col("l_linestatus")).as("l_linestatus")),
        Seq("l_orderkey"), "l_linenumber")
      graft.operators.Scd.enrichAsOf(
        Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber", "l_partkey"),
        scd, Seq("l_orderkey"), "l_linenumber")
    }),

    // Partition pruning: a predicate on the partition column must skip
    // whole directories at planning time (PartitionFilters in the scan —
    // asserted by PartitionPruneSpec; SURVEY §4 "free if we add
    // date-filtered reads").
    "s_partition_pruned" -> ((s, dir) => {
      val tmp = tmpDir("graft_part_prune")
      Tables.writePartitioned(Tables.orders(s, dir), "o_orderstatus", tmp)
      s.read.parquet(tmp).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
    }),
    "s_json_roundtrip" -> ((s, dir) => {  // S9 JSON doc write + schema read
      val customer = Tables.customer(s, dir)
      val tmp = tmpDir("graft_json_rt")
      customer.write.mode("overwrite").json(tmp)
      s.read.schema(customer.schema).json(tmp)
    }),
    "s_orc_roundtrip" -> ((s, dir) => {   // columnar-format breadth: ORC
      val tmp = tmpDir("graft_orc_rt")
      Tables.orders(s, dir).write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
    }),
    "s_text_roundtrip" -> ((s, dir) => {  // line-text source (one col/line)
      val tmp = tmpDir("graft_text_rt")
      Tables.documents(s, dir).select(col("text")).write.mode("overwrite").text(tmp)
      s.read.text(tmp)
    }),
    // Schema evolution on read: two parquet generations (the second adds a
    // column), merged by footer union (mergeSchema) — old files surface the
    // new column as null. The ingest reality every long-lived table hits;
    // mergeSchema costs one footer read per file, so the scale default
    // stays declared-schema (Tables.parquet) and this is the migration
    // path. Oracle replays the same union in SQL.
    "s_schema_merge" -> ((s, dir) => {
      val tmp = tmpDir("graft_schema_merge")
      val r = Tables.region(s, dir)
      r.select("r_regionkey", "r_name").write.parquet(tmp + "/gen=0")
      r.select(col("r_regionkey"), col("r_name"),
          lit("v2").as("ingest_tag")).write.parquet(tmp + "/gen=1")
      s.read.option("mergeSchema", "true").parquet(tmp)
        .select("r_regionkey", "r_name", "ingest_tag", "gen")
    }),
    "s_listing" -> ((s, dir) =>           // S10 object-listing source
      s.read.format("binaryFile").load(dir + "/*.parquet")
        .select(regexp_extract(col("path"), "([a-z]+)\\.parquet$", 1)
          .as("table_name"))),
    "s_schema_only" -> ((s, dir) => {     // S3 footer-only scan
      import s.implicits._
      Tables.parquetSchema(s, dir + "/orders.parquet")
        .fields.map(_.name).toSeq.toDF("column_name")
    })
  )

  /** Queries whose registered plan answers from a per-(session, sfDir)
    * operator memo after its first computation — a drained stream's
    * artifact dirs or a driver-held merge list — so their benched numbers
    * measure a memo read (spark.catalog.clearCache does not touch these
    * memos; only Caches.clear does). Bench reports a paired
    * `fresh_cost_s` for each, measured once after a full Caches.clear,
    * so the committed record carries the operator's real cost next to
    * the read cost (VERDICT r10 #6).
    *
    * ONE representative per distinct memo (VERDICT r11 #9 — every memo
    * covered, no redundant rebuilds): curateStreamRoots → st_curate
    * (st_curate_report reads the same drained root), jointKpiRoots plain
    * → st_joint_daily (st_joint_category same root), jointKpiRoots
    * manifested → st_jointm_daily (st_jointm_category same root),
    * bpe256Cache → t_bpe_train256 (…_shape reads the same merge list).
    * pipeline_curate and the Similarity centroid/PQ memos are NOT here:
    * they liveness-check their persisted frames and re-execute uncached
    * after clearCache, so their benched tail numbers are already fresh.
    */
  val memoizedHeadline: Seq[String] = Seq("st_curate", "st_joint_daily",
    "st_jointm_daily", "t_bpe_train256")

  /** The benchmark set (Bench.scala): the flagship KPIs plus the heaviest
    * representative of each new operator family.
    */
  val headline: Seq[String] = Seq(
    "a1_category_kpis", "a2_daily_kpis", "a2_daily_kpis_scalable",
    "j2_upsert", "j7_salted_join", "j8_asof", "j9_interval", "g_complete_groups",
    "dedup_exact", "dedup_near", "dedup_simhash", "t_text_stats",
    "sim_bruteforce_topk", "ann_ivf_topk", "e_daily_value", "e_sessionize",
    "a6_cube", "a8_approx_distinct", "w_running_total", "pipeline_corpus_prep",
    // round 6: the scale-safe rank family and the manifest snapshot sink
    "w_ntile_boundaries", "a7_percentiles_scalable",
    "s_partitioned_upsert_snapshot",
    // round 7: fuzzy join, BM25 retrieval, decontamination, repetition
    // filters, PII redaction, sequence packing, mixture sampling, z-order
    "dedup_fuzzy_recall", "t_bm25_topk", "t_contamination",
    "t_repetition", "t_pii_redact", "pipeline_packing", "pipeline_mixture",
    "s_zorder",
    // round 7b: dimension history + temporal enrich, entity resolution,
    // fixed-point PageRank, data skipping, leakage-safe split
    "e_scd2_history", "j10_temporal_enrich", "er_entities", "g_pagerank",
    "s_data_skipping", "pipeline_split",
    // round 7c: retrieval index, boilerplate, robust stats, resample
    "t_inverted_index", "t_boilerplate", "a14_robust_outliers", "e_resample",
    // round 7d: SemDeDup cells, daily-ingest incremental dedup, PQ ANN,
    // containment (subsumption) dedup, equi-depth histogram
    "dedup_semantic_recall", "dedup_incremental_recall", "ann_pq_recall",
    "dedup_contained_recall", "a16_equidepth",
    // round 7e: LM scoring and the exact set-similarity join
    "t_lm_buckets", "dedup_ssjoin_exact",
    // round 7f: bigram backoff LM, PMI associations, bloom-prefiltered
    // registry dedup, cell-blocked k-NN graph, BPE training loop,
    // JL projection
    "t_lm_bigram", "t_pmi_cooc", "dedup_bloom_registry", "knn_graph",
    "t_bpe_train", "emb_project", "mm_phash_dups",
    // round 7g: the end-to-end curation DAG, the EWMA fold, k-core,
    // exact KS drift
    "pipeline_curate", "e_ewma", "g_kcore", "a21_ks_drift",
    // round 8: duplicated-passage dedup, the trainable quality
    // classifier (t_quality_train times the full 15-iteration GD loop),
    // the forward as-of join, and TF-IDF cosine retrieval
    "dedup_passages", "dedup_passage_clean", "dedup_passage_incremental",
    "t_quality_train", "j11_asof_next", "t_tfidf_topk",
    "pipeline_tokenize_pack",
    // round 10: the streaming end-to-end curation DAG (3-trigger replay,
    // per-trigger global refit + atomic artifact commit)
    "st_curate",
    // round 10b: the line-grain curation family + NFC normalization —
    // all four are shuffle-free single projections (PlanAuditSpec pins
    // zero exchanges), so they double as a map-throughput benchmark
    "t_normalize", "t_c4_lines", "t_line_dedup", "t_gopher_report",
    // round 11: the URL front door, the unigram tokenizer family + its
    // packer, semantic decontamination, the tokenizer fertility table
    "t_url_filter", "t_unigram_seed", "t_unigram_segment",
    "pipeline_unigram_pack", "t_decontam_semantic", "t_tokenizer_fertility",
    // round 11b: the crawl-archive front door (WET record parse, HTML
    // strip — both shuffle-free map passes) and the shard/budget tail
    // (ntileExact shuffle-shard, prefix-sum token budget, per-source
    // adaptive quality gate)
    "src_wet_parse", "t_html_strip", "pipeline_shard_shuffle",
    "pipeline_token_budget", "t_adaptive_quality",
    "pipeline_shard_rendezvous", "t_entropy_quality",
    "t_filter_funnel", "t_corpus_zipf",
    "pipeline_select_and_shard", "s_file_binpack",
    // round 11c: corpus observability + release gating — vocabulary
    // drift between cohorts, Matryoshka-style dimension-ablation recall,
    // k-anonymity release gate
    "t_df_drift", "ann_dim_ablation", "v_k_anonymity",
    // round 12: the byte-domain crawl front door (multi-member .wet.gz
    // inflate + octet-counted framing) and the real image path (PNG
    // decode through all five filters, exact box resize, phash on real
    // resized pixels)
    "src_wet_parse_gz", "src_wet_bytes", "mm_decode_png", "mm_resize_real",
    "mm_phash_resized",
    // round 12b: byte-level BPE (zero-OOV tokenizer family)
    "t_bpe_bytes", "t_bpe_bytes_segment", "t_bpe_bytes_encode",
    // round 12c: WARC response records — HTTP status/content-type gate
    // ahead of the strip
    "src_warc_parse", "t_warc_strip")

  // ---- DuckDB oracle twins ----

  private val enOracleList =
    "['the','a','an','and','of','to','in','is','it','that','for','on','with','as','was','at','by','this','are','be']"

  /** Shared SQL fragment: whitespace tokens of a text column. */
  private def sqlTokens(textExpr: String): String =
    s"list_filter(string_split_regex(trim($textExpr), '\\s+'), x -> len(x) > 0)"

  /** Oracle-side twin of LineCuration.plantPages — the deterministic page
    * structure (6-word lines, modulo-scheduled bullets/symbols/punctuation,
    * poison lines, duplicate tail) replayed verbatim; ends in
    * `pages(doc_id, page)`. Shared by the t_c4_lines / t_line_dedup /
    * t_gopher_report twins.
    */
  private lazy val sqlPagedCtes: String =
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
  private lazy val sqlPassageCtes: String =
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
  private def sqlPassageSpans(hitsCte: String): String =
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
  private def sqlPassageCleanSql(hitsCte: String): String =
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
  private lazy val sqlPassageIncrementalOracle: String =
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
  private lazy val sqlTermStatsCtes: String =
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
  private lazy val sqlCurateCtes: String =
    s"""WITH corpus AS (
         SELECT doc_id, source, text FROM documents
         UNION ALL
         SELECT doc_id + 1000000, source, text FROM documents WHERE doc_id % 5 = 0),
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
              WHERE round(exp(-(lmpd.lsum / lmpd.lm_n)), 6) <= 30.5),
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
  private lazy val sqlCuratePackedOracle: String =
    s"""$sqlCurateCtes,
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

  /** The curation DAG's per-stage funnel report — shared by
    * pipeline_curate_report and st_curate_report.
    */
  private lazy val sqlCurateReportOracle: String =
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
  private lazy val sqlBpeTrainCtes: String = sqlBpeTrainCtesFor("documents")

  /** Oracle-side unrolled BPE trainer over any source relation exposing a
    * `text` column — shared by the 3-merge oracle (documents), the deep
    * run's prefix oracle (the rich corpus), and the BYTE-GRAIN twins
    * (`byteGrain = true` starts w0 from UTF-8 hex pairs instead of
    * characters; everything after the alphabet is the same loop).
    */
  private def sqlBpeTrainCtesFor(sourceRel: String,
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
  private def sqlBpeApplyCte(src: String, dst: String, bIdx: Int): String =
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
  private lazy val sqlBpeRichRel: String =
    """(SELECT text || ' ' || CAST(((doc_id % 1000000000) * 2654435761) % 1000000000 AS VARCHAR)
              || ' ' || CAST((((doc_id % 100000) + 7) * 40503) % 100000 AS VARCHAR) AS text
       FROM documents)"""

  /** The byte-BPE corpus: documents text plus one NON-ASCII word per
    * document ("über0".."über6") — multi-byte UTF-8 sequences the char
    * alphabet never sees, forcing the byte-grain loop to merge across
    * byte boundaries (C3+BC first, on any corpus where the ü word family
    * is frequent enough). Deterministic, so both engines replant it.
    */
  private lazy val sqlBpeBytesRel: String =
    """(SELECT text || ' über' || CAST(doc_id % 7 AS VARCHAR) AS text
       FROM documents)"""

  private lazy val sqlLmScoreCtes: String =
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
  private val scd2HistoryOracle: String =
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
  private def sqlCosine(a: String, b: String): String =
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
  private val wetParseOracle: String =
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

  def oracleSql: Map[String, String] = Map(
    "a1_category_kpis" ->
      """SELECT p.p_type AS category,
         CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_extendedprice) AS avg_order_value,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS avg_return_rate
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "a2_daily_kpis" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS order_date,
         COUNT(DISTINCT o.o_orderkey) AS total_orders,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         COUNT(l.l_partkey) AS total_items_sold,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(DISTINCT o.o_orderkey) AS return_rate,
         COUNT(DISTINCT o.o_custkey) AS unique_customers
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1 ORDER BY 1""",

    "a2_daily_kpis_scalable" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS order_date,
         COUNT(DISTINCT o.o_orderkey) AS total_orders,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         COUNT(l.l_partkey) AS total_items_sold,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(DISTINCT o.o_orderkey) AS return_rate,
         COUNT(DISTINCT o.o_custkey) AS unique_customers
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    "j7_salted_join" ->
      """SELECT l.l_orderkey, l.l_partkey, l.l_extendedprice, p.p_type
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_partkey <= 50""",
    "v_rules_orders" -> rulesOrdersOracle("orders"),
    "v_rules_lineitem" ->
      """SELECT 'lineitem' AS table_name, 'null_required' AS rule, 'l_orderkey' AS column_name, CAST(COUNT(*) FILTER (WHERE l_orderkey IS NULL) AS BIGINT) AS violation_count FROM lineitem
         UNION ALL SELECT 'lineitem', 'null_required', 'l_partkey', CAST(COUNT(*) FILTER (WHERE l_partkey IS NULL) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'null_required', 'l_suppkey', CAST(COUNT(*) FILTER (WHERE l_suppkey IS NULL) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'null_required', 'l_linenumber', CAST(COUNT(*) FILTER (WHERE l_linenumber IS NULL) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'invalid_status', 'l_returnflag', CAST(COUNT(*) FILTER (WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('N','A','R')) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'negative_value', 'l_quantity', CAST(COUNT(*) FILTER (WHERE l_quantity < 0) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'negative_value', 'l_extendedprice', CAST(COUNT(*) FILTER (WHERE l_extendedprice < 0) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'negative_value', 'l_discount', CAST(COUNT(*) FILTER (WHERE l_discount < 0) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'negative_value', 'l_tax', CAST(COUNT(*) FILTER (WHERE l_tax < 0) AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'empty_relation', '*', CAST(CASE WHEN COUNT(*) = 0 THEN 1 ELSE 0 END AS BIGINT) FROM lineitem
         UNION ALL SELECT 'lineitem', 'duplicate_key', 'l_orderkey,l_linenumber', CAST(COUNT(*) AS BIGINT) FROM (SELECT 1 FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
         UNION ALL SELECT 'lineitem', 'non_integral_type', 'l_linenumber', CAST(0 AS BIGINT)""",
    "v_rules_violations" ->
      s"""WITH m AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
                  CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                  CASE WHEN o_orderkey % 7 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders),
         w AS (SELECT * FROM m UNION ALL SELECT * FROM m WHERE o_orderkey % 11 = 0)
         ${rulesOrdersOracle("w")}""",

    "v_group_report" ->
      """WITH m AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END AS o_custkey,
                  CASE WHEN o_orderkey % 10 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
                  CASE WHEN o_orderkey % 7 = 0 THEN -o_totalprice ELSE o_totalprice END AS o_totalprice,
                  o_orderdate
           FROM orders),
         w AS (SELECT * FROM m UNION ALL SELECT * FROM m WHERE o_orderkey % 11 = 0),
         g AS (SELECT o_orderkey % 100 AS grp,
                      COUNT(*) FILTER (WHERE o_orderkey IS NULL)
                    + COUNT(*) FILTER (WHERE o_custkey IS NULL)
                    + COUNT(*) FILTER (WHERE o_orderstatus IS NULL)
                    + COUNT(*) FILTER (WHERE o_orderdate IS NULL)
                    + COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('P','O','F'))
                    + COUNT(*) FILTER (WHERE o_totalprice < 0) AS violation_count
               FROM w GROUP BY 1)
         SELECT grp, CAST(violation_count AS BIGINT) AS violation_count,
                CASE WHEN violation_count = 0 THEN 'VALIDATION_PASSED'
                     ELSE 'VALIDATION_FAILED' END AS status
         FROM g""",
    "j2_upsert" ->
      """WITH u AS (
           SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey % 97 = 0)
         SELECT
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderkey ELSE t.o_orderkey END AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey ELSE t.o_custkey END AS o_custkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
         FROM orders t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey""",

    "j3_semi" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""",
    "j4_anti" ->
      """SELECT o_orderkey FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)""",
    "j5_all_present" ->
      """SELECT DISTINCT l_orderkey FROM lineitem
         EXCEPT
         SELECT DISTINCT l_orderkey FROM lineitem
         WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0)""",
    "j6_containment" ->
      """SELECT l_partkey AS p_partkey,
                array_to_string(list_sort(list(DISTINCT l_orderkey)), ',') AS orders_with_part
         FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_partkey <= 20)
         GROUP BY 1""",
    "a4_distinct" ->
      "SELECT DISTINCT l_partkey FROM lineitem WHERE l_partkey IS NOT NULL",
    "a5_collect_set" ->
      """SELECT l_orderkey,
                CAST(COUNT(DISTINCT l_partkey) AS INTEGER) AS n_parts,
                array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS parts
         FROM lineitem GROUP BY 1""",
    "g_complete_groups" ->
      """WITH pending AS (
           SELECT DISTINCT l_orderkey FROM lineitem
           WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 5 = 0)),
         inent AS (SELECT l_orderkey FROM pending WHERE l_orderkey IN (SELECT o_orderkey FROM orders)),
         failing AS (
           SELECT DISTINCT l_orderkey FROM lineitem
           WHERE l_orderkey IN (SELECT l_orderkey FROM inent)
             AND l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_partkey % 2 = 0))
         SELECT l_orderkey FROM inent WHERE l_orderkey NOT IN (SELECT l_orderkey FROM failing)""",

    "g_connected_components" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_partkey, l_orderkey FROM lineitem WHERE l_partkey <= 30),
         e AS (SELECT a.l_orderkey AS src, b.l_orderkey AS dst
               FROM li a JOIN li b
                 ON a.l_partkey = b.l_partkey AND a.l_orderkey <> b.l_orderkey),
         r(node, m) AS (
           SELECT src, src FROM (SELECT DISTINCT src FROM e)
           UNION
           SELECT r.node, e.dst FROM r JOIN e ON r.m = e.src)
         SELECT node AS order_id, MIN(m) AS component_id FROM r GROUP BY 1""",
    "g_cc_largestar" ->
      """WITH RECURSIVE
         li AS (SELECT DISTINCT l_partkey, l_orderkey FROM lineitem WHERE l_partkey <= 30),
         e AS (SELECT a.l_orderkey AS src, b.l_orderkey AS dst
               FROM li a JOIN li b
                 ON a.l_partkey = b.l_partkey AND a.l_orderkey <> b.l_orderkey),
         r(node, m) AS (
           SELECT src, src FROM (SELECT DISTINCT src FROM e)
           UNION
           SELECT r.node, e.dst FROM r JOIN e ON r.m = e.src)
         SELECT node AS order_id, MIN(m) AS component_id FROM r GROUP BY 1""",
    // brute-force 3-way closing join over canonical u<v edges: each
    // triangle appears once as a<b<c, attributed to all three corners
    "g_triangles" ->
      """WITH li AS (SELECT DISTINCT l_partkey, l_orderkey FROM lineitem WHERE l_partkey <= 30),
         e AS (SELECT DISTINCT a.l_orderkey AS u, b.l_orderkey AS v
               FROM li a JOIN li b
                 ON a.l_partkey = b.l_partkey AND a.l_orderkey < b.l_orderkey),
         nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
         tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                 FROM e e1
                 JOIN e e2 ON e2.u = e1.v
                 JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
         pn AS (SELECT node, COUNT(*) AS n
                FROM (SELECT unnest([a, b, c]) AS node FROM tri) GROUP BY 1)
         SELECT nodes.node AS order_id, CAST(coalesce(pn.n, 0) AS BIGINT) AS n_triangles
         FROM nodes LEFT JOIN pn USING (node)""",
    // k-core planted truth: the clique is in BY STRUCTURE, the chain out
    "g_kcore" -> {
      val rows = ((1 to 7).map(i => s"(${900000000L + i}, true, true)") ++
        (1 to 5).map(i => s"(${910000000L + i}, false, false)")).mkString(", ")
      s"""SELECT CAST(node AS BIGINT) AS node, expect_in_core, in_core
         FROM (VALUES $rows) t(node, expect_in_core, in_core)"""
    },
    "g_pagerank" -> {
      // the same damped integer iteration, unrolled: r{k} from r{k-1}
      def iter(prev: String, cur: String) =
        s"""$cur AS (SELECT n.node,
              CAST(150000 + (85 * COALESCE(SUM(r.rank // od.d), 0)) // 100 AS BIGINT) AS rank
            FROM nodes n
            LEFT JOIN e ON e.dst = n.node
            LEFT JOIN $prev r ON r.node = e.src
            LEFT JOIN od ON od.src = e.src
            GROUP BY n.node)"""
      s"""WITH e0 AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         e AS (SELECT c AS src, p + 10000000 AS dst FROM e0
               UNION ALL SELECT p + 10000000 AS src, c AS dst FROM e0),
         nodes AS (SELECT DISTINCT src AS node FROM e),
         od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY 1),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
         ${iter("r0", "r1")},
         ${iter("r1", "r2")},
         ${iter("r2", "r3")}
         SELECT node, rank FROM r3"""
    },
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
    "knn_graph_recall" ->
      "SELECT vec_id, true AS found FROM embeddings WHERE vec_id < 50",
    // JL projection: the identical plane literals (same PRNG, same seed)
    // folded in the identical ascending order from 0.0 — term-by-term
    // IEEE parity, no tolerance needed
    "emb_project" -> {
      val planes = graft.operators.Similarity.projectionPlanes(64, 8, 77L)
      val scale = 1.0 / math.sqrt(8.0)
      // every operand CAST to DOUBLE: DuckDB parses long decimal literals
      // as DECIMAL, and DECIMAL op FLOAT promotes to FLOAT32 — which
      // would run the whole fold in single precision
      planes.zipWithIndex.map { case (p, i) =>
        val fold = p.zipWithIndex
          .map { case (c, j) =>
            s"CAST(embedding[${j + 1}] AS DOUBLE) * CAST($c AS DOUBLE)" }
          .mkString("CAST(0.0 AS DOUBLE) + ", " + ", "")
        s"SELECT vec_id, $i AS pos, round(($fold) * CAST($scale AS DOUBLE), 6) AS value FROM embeddings"
      }.mkString("\nUNION ALL\n")
    },
    "dedup_contained_recall" ->
      s"""SELECT doc_id, true AS found
         FROM (SELECT doc_id, ${sqlTokens("text")} AS ts FROM documents)
         WHERE len(ts) >= 12""",
    "dedup_incremental_recall" ->
      "SELECT doc_id, true AS found FROM documents",
    // the planted truth the converged classifier must reproduce exactly
    "t_quality_train" ->
      "SELECT doc_id, doc_id % 2 = 1 AS predicted FROM documents",
    // streaming inference must agree with batch inference exactly
    "st_quality_score" ->
      "SELECT doc_id, doc_id % 2 = 1 AS predicted FROM documents",
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
    // the streaming leg's batches ARE the three days (one staged file per
    // trigger, mtime-ordered), so it answers the identical replay
    "st_passage_clean" -> sqlPassageIncrementalOracle,
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
    "ann_lsh_recall" ->
      """SELECT vec_id AS q_id, vec_id, CAST(1.0 AS DOUBLE) AS sim
         FROM embeddings WHERE vec_id < 5""",
    // the structural guarantees only: self-retrieval and recall dominance
    "ann_lsh_multiprobe_recall" ->
      """SELECT CAST(50 AS INTEGER) AS n_queries, true AS self_rank1_all,
                true AS recall_dominates""",
    "ann_pq_recall" ->
      "SELECT vec_id AS q_id, true AS found FROM embeddings WHERE vec_id < 50",
    "ann_ivf_kmeans_quality" ->
      """SELECT CAST(COUNT(*) + 50 AS BIGINT) AS n_vectors,
                CAST(COUNT(*) + 50 AS BIGINT) AS n_assigned,
                CAST(0 AS BIGINT) AS n_bad_cell,
                CAST(50 AS BIGINT) AS n_planted,
                CAST(50 AS BIGINT) AS n_same_cell
         FROM embeddings""",
    "t_fingerprint_dups" ->
      "SELECT doc_id, true AS exact_dup_same, true AS mutated_differs FROM documents",
    // streaming near-dup: every planted copy dropped by the drained
    // stream, and stream survivors equal to the batch operator's
    "st_neardup" ->
      "SELECT doc_id, true AS dropped, true AS batch_agree FROM documents",
    // bounded-TTL twin: within-horizon corpus, same planted truth
    "st_neardup_bounded" ->
      "SELECT doc_id, true AS dropped, true AS batch_agree FROM documents",
    // streaming embedding dedup: planted vector copies dropped, originals kept
    "st_emb_dedup" ->
      "SELECT vec_id, true AS original_kept, true AS copy_dropped FROM embeddings WHERE vec_id < 50",
    // the jointly-committed pair answers the BATCH KPI oracles verbatim
    // (exact state, same math — a1/a2's SQL)
    "st_joint_category" ->
      """SELECT p.p_type AS category,
         CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_extendedprice) AS avg_order_value,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS avg_return_rate
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "st_joint_daily" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS order_date,
         COUNT(DISTINCT o.o_orderkey) AS total_orders,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         COUNT(l.l_partkey) AS total_items_sold,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(DISTINCT o.o_orderkey) AS return_rate,
         COUNT(DISTINCT o.o_custkey) AS unique_customers
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    // the manifested pair: same math, same oracles (multi-table manifest
    // commit under one pointer)
    "st_jointm_category" ->
      """SELECT p.p_type AS category,
         CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS daily_revenue,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l.l_extendedprice) AS avg_order_value,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS avg_return_rate
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "st_jointm_daily" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS order_date,
         COUNT(DISTINCT o.o_orderkey) AS total_orders,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         COUNT(l.l_partkey) AS total_items_sold,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(DISTINCT o.o_orderkey) AS return_rate,
         COUNT(DISTINCT o.o_custkey) AS unique_customers
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    "a8_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, true AS approx_ok
         FROM events GROUP BY 1""",
    // A-ES replay: same md5-uniform, same double-log rounded key (the
    // expression SHAPE mirrors Sampling.weightedSample term for term)
    "a17_weighted_sample" ->
      """WITH w AS (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS weight,
             round(ln(-ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                      / 1152921504606846976.0))
                   - ln(CAST(o_totalprice AS DOUBLE)), 6) + 0.0 AS sample_key
           FROM orders WHERE o_totalprice > 0),
         t AS (SELECT * FROM w ORDER BY sample_key ASC, o_orderkey LIMIT 500)
         SELECT CAST(row_number() OVER (ORDER BY sample_key ASC, o_orderkey) AS INTEGER) AS rank,
                o_orderkey, weight, sample_key
         FROM t""",
    "a19_weighted_stratified" ->
      """WITH w AS (SELECT o_orderkey, o_orderpriority AS grp,
             CAST(o_totalprice AS DOUBLE) AS weight,
             round(ln(-ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                      / 1152921504606846976.0))
                   - ln(CAST(o_totalprice AS DOUBLE)), 6) + 0.0 AS sample_key
           FROM orders WHERE o_totalprice > 0),
         r AS (SELECT *, CAST(row_number() OVER (PARTITION BY grp
                 ORDER BY sample_key ASC, o_orderkey) AS INTEGER) AS rank FROM w)
         SELECT grp, rank, o_orderkey, weight, sample_key
         FROM r WHERE rank <= 20""",
    "w_rolling_z" ->
      """WITH b AS (SELECT o_custkey, o_orderkey, o_orderdate,
                      CAST(o_totalprice AS DECIMAL(15,2)) AS p FROM orders),
         w AS (SELECT o_custkey, o_orderkey, p,
                 CAST(COUNT(*) OVER win AS DOUBLE) AS n,
                 CAST(SUM(p) OVER win AS DOUBLE) AS sm,
                 CAST(SUM(p * p) OVER win AS DOUBLE) AS sq
               FROM b
               WINDOW win AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT o_custkey, o_orderkey, CAST(n AS BIGINT) AS n_window,
                CASE WHEN n >= 2 AND (n * sq - sm * sm) / (n * (n - 1.0)) > 0
                     THEN round((CAST(p AS DOUBLE) - sm / n)
                                / sqrt((n * sq - sm * sm) / (n * (n - 1.0))), 6)
                END AS roll_z
         FROM w""",
    "a9_sample_hash" ->
      """SELECT l_partkey, l_orderkey, l_linenumber FROM (
           SELECT l_partkey, l_orderkey, l_linenumber,
                  row_number() OVER (PARTITION BY l_partkey
                    ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR)),
                             l_orderkey, l_linenumber) AS rn
           FROM lineitem)
         WHERE rn <= 3""",
    "a7_percentiles_approx" ->
      """SELECT p.p_type AS category, true AS p50_ok, true AS p90_ok
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    "s_csv_inferred" -> "SELECT r_regionkey, r_name FROM region",
    "s_csv_corrupt" ->
      "SELECT CAST(3 AS BIGINT) AS n_clean, CAST(1 AS BIGINT) AS n_corrupt",
    "s_bucketed_join" ->
      """SELECT o.o_orderkey, o.o_totalprice, l.l_quantity, l.l_extendedprice
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey""",
    // z-order: the Morton interleave replicated term by term — bit b of
    // x at position 2b, of y at position 2b+1
    "s_zorder" ->
      s"""SELECT o_orderkey, o_custkey % 1024 AS x, o_orderkey % 1024 AS y,
         CAST(${(0 until 10).flatMap(b => Seq(
           s"(((o_custkey % 1024) // ${1L << b}) % 2) * ${1L << (2 * b)}",
           s"(((o_orderkey % 1024) // ${1L << b}) % 2) * ${1L << (2 * b + 1)}"))
           .mkString(" + ")} AS BIGINT) AS z
         FROM orders""",
    "s_compact" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderpriority
         FROM orders""",
    "s_data_skipping" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_custkey BETWEEN 100 AND 400""",
    // OPTIMIZE moves bytes, not rows: content equals the source
    "s_optimize" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderpriority
         FROM orders""",
    "e_string_index" ->
      """WITH m AS (SELECT o_orderpriority AS label, CAST(COUNT(*) AS BIGINT) AS label_count
                    FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
         r AS (SELECT label, CAST(row_number() OVER (ORDER BY label_count DESC, label) - 1 AS INTEGER) AS idx
               FROM m)
         SELECT o.o_orderkey, o.o_orderpriority, r.idx AS prio_idx
         FROM orders o LEFT JOIN r ON o.o_orderpriority = r.label""",
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
    // WET front door: rebuild the blobs with ordered string_agg, replay
    // the record split, header extraction, length-delimited body slice,
    // and the framing re-check
    "src_wet_parse" -> wetParseOracle,
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
    "src_warc_parse" ->
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
         FROM h""",
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
    // Streaming WET ingestion: after first-seen dedup across the 9
    // triggers the table is exactly one row per document — original
    // file, exact body, framing ok, and the refetched rows seen twice
    "st_wet_ingest" ->
      """SELECT doc_id,
           'https://example.com/d/' || CAST(doc_id AS VARCHAR) AS uri,
           doc_id % 8 AS file_id,
           CAST(len(text) AS BIGINT) AS declared_len,
           text AS body,
           true AS len_ok,
           CAST(CASE WHEN doc_id % 8 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_seen
         FROM documents""",
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
    // Dimension ablation: both rankings replayed, overlap joined
    "ann_dim_ablation" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5),
       sf AS (SELECT q_id, e.vec_id, ${sqlCosine("q_vec", "v")} AS sim
              FROM e CROSS JOIN q),
       rf AS (SELECT q_id, vec_id FROM
              (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, vec_id) AS rank FROM sf)
              WHERE rank <= 10),
       et AS (SELECT vec_id, v[1:16] AS v FROM e),
       qt AS (SELECT q_id, q_vec[1:16] AS q_vec FROM q),
       st AS (SELECT q_id, et.vec_id, ${sqlCosine("q_vec", "v")} AS sim
              FROM et CROSS JOIN qt),
       rt AS (SELECT q_id, vec_id FROM
              (SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, vec_id) AS rank FROM st)
              WHERE rank <= 10)
       SELECT q_id, CAST(count(*) AS BIGINT) AS overlap,
         round(CAST(count(*) AS DOUBLE) / 10.0, 6) AS recall_at_10
       FROM rf JOIN rt USING (q_id, vec_id) GROUP BY q_id""",
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
    // k-anonymity: one aggregation at quasi-identifier grain
    "v_k_anonymity" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
           (count(*) >= 10) AS anonymous
         FROM documents GROUP BY lang, source""",
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
    // Byte-budget file bin-packing: one ordered cumsum + integer div
    "s_file_binpack" ->
      """WITH c AS (SELECT doc_id, n_chars,
           CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS start_byte
         FROM documents)
       SELECT doc_id, n_chars, start_byte,
         start_byte // 65536 AS file_first,
         CASE WHEN n_chars > 0 THEN (start_byte + n_chars - 1) // 65536
              ELSE start_byte // 65536 END AS file_last,
         start_byte % 65536 AS offset_in_file
       FROM c""",
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
    // the streaming drain must answer the batch query verbatim
    "st_term_stats" ->
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
    // the streaming score-on-ingest drain answers the batch query verbatim
    "st_lm_score" ->
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

    "sim_bruteforce_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5),
         s AS (SELECT q_id, e.vec_id, ${sqlCosine("q_vec", "v")} AS sim FROM e CROSS JOIN q)
         SELECT q_id, vec_id, round(sim, 6) AS sim, CAST(rank AS INTEGER) AS rank
         FROM (SELECT q_id, vec_id, sim,
                      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
               FROM s)
         WHERE rank <= 10""",
    "sim_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec FROM e WHERE vec_id < 5),
         s AS (SELECT q_id, e.vec_id, ${sqlCosine("q_vec", "v")} AS sim
               FROM e CROSS JOIN q WHERE e.label != q.q_label)
         SELECT q_id, vec_id, round(sim, 6) AS sim, CAST(rank AS INTEGER) AS rank
         FROM (SELECT q_id, vec_id, sim,
                      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
               FROM s)
         WHERE rank <= 10""",
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
         FROM top WHERE rn = 1""",
    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         q AS (SELECT vec_id AS q_id, v AS q_vec FROM e WHERE vec_id < 5),
         ex AS (SELECT label, unnest(v) AS x, unnest(generate_series(1, len(v))) AS pos FROM e),
         cpos AS (SELECT label AS cell, pos,
                  CAST(SUM(CAST(x AS DECIMAL(27,15))) AS DOUBLE) / COUNT(x) AS m
                  FROM ex GROUP BY 1, 2),
         cent AS (SELECT cell, list(m ORDER BY pos) AS centroid FROM cpos GROUP BY 1),
         cs AS (SELECT q_id, q_vec, cell, ${sqlCosine("q_vec", "centroid")} AS csim
                FROM q CROSS JOIN cent),
         probes AS (SELECT q_id, q_vec, cell FROM
                     (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY csim DESC, cell) AS pr FROM cs)
                    WHERE pr <= 2),
         sc AS (SELECT p.q_id, e.vec_id, ${sqlCosine("p.q_vec", "e.v")} AS sim
                FROM e JOIN probes p ON e.label = p.cell)
         SELECT q_id, vec_id, round(sim, 6) AS sim, CAST(rank AS INTEGER) AS rank
         FROM (SELECT q_id, vec_id, sim,
                      row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
               FROM sc)
         WHERE rank <= 10""",

    "e_parse_props" ->
      "SELECT event_id, CAST(props->>'k' AS INTEGER) AS k FROM events",
    "e_to_json" ->
      """SELECT event_id,
                CAST(to_json(struct_pack(event_id := event_id, event_type := COALESCE(event_type, ''))) AS VARCHAR) AS payload
         FROM events""",
    "e_route" ->
      """SELECT event_id,
                CASE WHEN contains(event_type, 'view') THEN 'views'
                     WHEN contains(event_type, 'click') THEN 'clicks'
                     WHEN starts_with(event_type, 'purch') THEN 'purchases'
                     WHEN ends_with(event_type, 'up') THEN 'signups'
                     ELSE 'other' END AS route,
                strftime(ts, '%Y-%m-%d') AS day
         FROM events""",
    "e_daily_value" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
                COUNT(*) AS n_events
         FROM events GROUP BY 1, 2""",
    "e_filter_eq" ->
      """SELECT event_id, user_id, event_type FROM events
         WHERE CAST(user_id AS VARCHAR) = '7'""",
    // f_uuid's structural twin: uuid()/now() values are random, but a
    // correct generator yields exactly one well-formed v4 uuid per row, all
    // distinct, and a timestamp whose ISO rendering round-trips — so every
    // shape count must equal COUNT(*).
    "f_uuid_shape" ->
      """SELECT COUNT(*) AS n_rows, COUNT(*) AS n_uuid_v4,
                COUNT(*) AS n_uuid_distinct, COUNT(*) AS n_ts_roundtrip
         FROM events""",
    "s_kv_sink" ->
      """WITH k AS (SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
                COUNT(*) AS n_events
           FROM events GROUP BY 1, 2)
         SELECT event_type || '|' || strftime(day, '%Y-%m-%d') AS pk, total_value, n_events FROM k""",
    "st_completeness" ->
      """WITH ok AS (
           SELECT l_orderkey FROM lineitem GROUP BY 1
           HAVING COUNT(*) FILTER (WHERE l_partkey % 2 <> 0) = 0),
         compl AS (SELECT l_orderkey FROM ok WHERE l_orderkey IN (SELECT o_orderkey FROM orders))
         SELECT CAST(l_orderkey AS VARCHAR) AS order_id,
                array_to_string(list_sort(list(DISTINCT CAST(l_partkey AS VARCHAR))), ',') AS product_ids
         FROM lineitem WHERE l_orderkey IN (SELECT l_orderkey FROM compl)
         GROUP BY 1""",
    // the stateful exact-streaming operator answers the BATCH daily-KPI
    // oracle verbatim (same math, different execution)
    "st_daily_kpis_exact" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS order_date,
         COUNT(DISTINCT o.o_orderkey) AS total_orders,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
         COUNT(l.l_partkey) AS total_items_sold,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(DISTINCT o.o_orderkey) AS return_rate,
         COUNT(DISTINCT o.o_custkey) AS unique_customers
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    // every day present, every comparison flag true — a false or missing
    // row fails the hash/row compare
    "st_daily_kpis" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS order_date,
                true AS revenue_exact, true AS items_exact,
                true AS orders_close, true AS customers_close,
                true AS returned_count_match
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    // the streaming session store must answer the batch gaps-and-islands
    // sessionization exactly (same SQL as e_sessionize)
    "st_sessionize" ->
      """WITH x AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
               FROM x)
         SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                COUNT(*) AS n_events
         FROM y GROUP BY user_id, sid""",

    "e_tumbling" ->
      """SELECT event_type,
                date_trunc('hour', ts) AS window_start,
                date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2, 3""",
    "e_sliding" ->
      """WITH s AS (
           SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) AS w FROM events
           UNION ALL
           SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events)
         SELECT event_type, w AS window_start, w + INTERVAL 1 HOUR AS window_end,
                COUNT(*) AS n_events
         FROM s GROUP BY 1, 2""",
    "w_top_parts" ->
      """WITH r AS (
           SELECT p.p_type AS category, l.l_partkey AS product_id,
                  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
           JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1, 2)
         SELECT category, product_id, revenue, CAST(rn AS INTEGER) AS rn FROM (
           SELECT *, row_number() OVER (PARTITION BY category ORDER BY revenue DESC, product_id) AS rn
           FROM r)
         WHERE rn <= 3""",
    "w_percent_rank" ->
      """WITH s AS (SELECT o_custkey AS customer,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
             COUNT(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT customer, total_spend, n_orders,
                round(percent_rank() OVER (ORDER BY total_spend DESC, customer), 6) AS pct_rank
         FROM s""",
    "w_ntile_deciles" ->
      """WITH s AS (SELECT o_custkey AS customer,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
             COUNT(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT customer, total_spend, n_orders,
                CAST(ntile(10) OVER (ORDER BY total_spend DESC, customer) AS INTEGER) AS decile
         FROM s""",
    // the scale-safe plan must answer the SAME deciles as the NTILE window
    "w_ntile_boundaries" ->
      """WITH s AS (SELECT o_custkey AS customer,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
             COUNT(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT customer, total_spend, n_orders,
                CAST(ntile(10) OVER (ORDER BY total_spend DESC, customer) AS INTEGER) AS decile
         FROM s""",
    "a10_outliers" ->
      """WITH m AS (SELECT o_orderpriority AS priority, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx2
           FROM orders GROUP BY 1),
         st AS (SELECT priority, sx/n AS mean, sqrt(sx2/n - (sx/n)*(sx/n)) AS sd FROM m)
         SELECT o.o_orderpriority AS priority, o.o_orderkey, o.o_totalprice,
                round((o.o_totalprice - st.mean)/st.sd, 6) AS z
         FROM orders o JOIN st ON o.o_orderpriority = st.priority
         ORDER BY abs((o.o_totalprice - st.mean)/st.sd) DESC, o.o_orderkey
         LIMIT 20""",
    "a11_histogram" ->
      """WITH b AS (SELECT greatest(0, least(19, CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT))) AS bucket
           FROM orders WHERE o_totalprice IS NOT NULL)
         SELECT bucket, bucket * 25000.0 AS lo, (bucket + 1) * 25000.0 AS hi,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM b GROUP BY 1""",
    // the supremum CDF gap: integer numerator maximized, one division
    "a21_ks_drift" ->
      """WITH av AS (SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL),
         bv AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                       ELSE o_totalprice END AS v
                FROM orders WHERE o_totalprice IS NOT NULL),
         p AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca, CAST(SUM(ib) AS BIGINT) AS cb
               FROM (SELECT v, 1 AS ia, 0 AS ib FROM av
                     UNION ALL SELECT v, 0, 1 FROM bv)
               GROUP BY v),
         c AS (SELECT v,
                 SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
                 SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB
               FROM p),
         t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM p)
         SELECT t.na AS n_before, t.nb AS n_after,
                round(CAST(MAX(abs(cumA * nb - cumB * na)) AS DOUBLE) /
                      CAST(na * nb AS DOUBLE), 6) AS ks_stat
         FROM c CROSS JOIN t GROUP BY t.na, t.nb""",
    // the drained cumulative-count store equals the batch counts, so the
    // streaming monitor answers the batch KS verbatim
    "st_drift" ->
      """WITH av AS (SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL),
         bv AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                       ELSE o_totalprice END AS v
                FROM orders WHERE o_totalprice IS NOT NULL),
         p AS (SELECT v, CAST(SUM(ia) AS BIGINT) AS ca, CAST(SUM(ib) AS BIGINT) AS cb
               FROM (SELECT v, 1 AS ia, 0 AS ib FROM av
                     UNION ALL SELECT v, 0, 1 FROM bv)
               GROUP BY v),
         c AS (SELECT v,
                 SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumA,
                 SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumB
               FROM p),
         t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM p)
         SELECT t.na AS n_before, t.nb AS n_after,
                round(CAST(MAX(abs(cumA * nb - cumB * na)) AS DOUBLE) /
                      CAST(na * nb AS DOUBLE), 6) AS ks_stat
         FROM c CROSS JOIN t GROUP BY t.na, t.nb""",
    "a12_drift" ->
      """WITH h0 AS (
           SELECT greatest(0, least(19, CAST(floor(CAST(o_totalprice AS DOUBLE) / 25000.0) AS BIGINT))) AS bucket,
                  CAST(COUNT(*) AS BIGINT) AS n_before
           FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
         h1 AS (
           SELECT greatest(0, least(19, CAST(floor(CAST(
                    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                         ELSE o_totalprice END AS DOUBLE) / 25000.0) AS BIGINT))) AS bucket,
                  CAST(COUNT(*) AS BIGINT) AS n_after
           FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1)
         SELECT COALESCE(h0.bucket, h1.bucket) AS bucket,
                COALESCE(h0.bucket, h1.bucket) * 25000.0 AS lo,
                (COALESCE(h0.bucket, h1.bucket) + 1) * 25000.0 AS hi,
                COALESCE(n_before, 0) AS n_before,
                COALESCE(n_after, 0) AS n_after,
                COALESCE(n_after, 0) - COALESCE(n_before, 0) AS delta
         FROM h0 FULL OUTER JOIN h1 ON h0.bucket = h1.bucket""",
    "a18_impute_median" ->
      """WITH b AS (SELECT o_orderkey, o_orderpriority AS grp,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE CAST(o_totalprice AS DOUBLE) END AS v
           FROM orders),
         m AS (SELECT grp, quantile_cont(v, 0.5) AS med FROM b GROUP BY 1)
         SELECT o_orderkey, grp, round(coalesce(v, med), 6) AS value_imputed,
                v IS NULL AS was_imputed
         FROM b JOIN m USING (grp)""",
    "a20_winsorize" ->
      """WITH b AS (SELECT o_orderkey, o_orderpriority AS grp,
             CAST(o_totalprice AS DOUBLE) AS v FROM orders),
         q AS (SELECT grp, quantile_cont(v, 0.1) AS lo,
                 quantile_cont(v, 0.9) AS hi FROM b GROUP BY 1)
         SELECT o_orderkey, grp,
                round(least(greatest(v, lo), hi), 6) AS value_w,
                (v < lo OR v > hi) AS was_clipped
         FROM b JOIN q USING (grp)""",
    "a14_robust_outliers" ->
      """WITH o AS (SELECT o_orderpriority AS priority, o_orderkey,
                      CAST(o_totalprice AS DOUBLE) AS price FROM orders),
         med AS (SELECT priority, quantile_cont(price, 0.5) AS med FROM o GROUP BY 1),
         dev AS (SELECT o.priority, abs(price - med) AS absdev
                 FROM o JOIN med USING (priority)),
         mad AS (SELECT priority, quantile_cont(absdev, 0.5) AS mad FROM dev GROUP BY 1)
         SELECT o.priority, o.o_orderkey, o.price,
                round((price - med) / (mad * 1.4826), 6) AS robust_z
         FROM o JOIN med USING (priority) JOIN mad USING (priority)
         ORDER BY abs((price - med) / (mad * 1.4826)) DESC, o.o_orderkey
         LIMIT 20""",
    "a15_skew_report" ->
      """WITH c AS (SELECT l_partkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
         t AS (SELECT SUM(n) AS total, COUNT(*) AS n_keys FROM c)
         SELECT l_partkey, CAST(n AS BIGINT) AS n,
                round(CAST(n AS DOUBLE) / total * 100, 6) AS pct_of_rows,
                round(CAST(n AS DOUBLE) * n_keys / total, 6) AS x_mean_key
         FROM c, t ORDER BY n DESC, l_partkey LIMIT 20""",
    // edge probabilities i/8 are exact binary doubles, so the literal
    // list below IS the i.toDouble/nBuckets sequence the Spark side uses
    "a16_equidepth" ->
      s"""WITH o AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders),
         e AS (SELECT [${(0 to 8).map(i => s"quantile_cont(v, ${i / 8.0})").mkString(", ")}] AS ea FROM o),
         b AS (SELECT len(list_filter(ea[2:8], x -> v > x)) AS bucket, ea
               FROM o, e WHERE v IS NOT NULL)
         SELECT CAST(bucket AS INTEGER) AS bucket,
                ea[bucket + 1] AS lo, ea[bucket + 2] AS hi,
                COUNT(*) AS n
         FROM b GROUP BY bucket, ea""",
    "a13_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority").map(c =>
      s"""SELECT '$c' AS column_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
             CAST(MIN($c) AS VARCHAR) AS min_value,
             CAST(MAX($c) AS VARCHAR) AS max_value
          FROM orders""").mkString("\n UNION ALL \n"),
    "e_funnel" ->
      """WITH e AS (SELECT user_id AS u, event_type AS tp, epoch_us(ts) AS t FROM events),
         s1 AS (SELECT u, MIN(t) AS t FROM e WHERE tp = 'signup' GROUP BY 1),
         s2 AS (SELECT e.u, MIN(e.t) AS t FROM e JOIN s1 ON e.u = s1.u
                WHERE e.tp = 'click' AND e.t > s1.t GROUP BY 1),
         s3 AS (SELECT e.u, MIN(e.t) AS t FROM e JOIN s2 ON e.u = s2.u
                WHERE e.tp = 'purchase' AND e.t > s2.t GROUP BY 1)
         SELECT 1 AS step, 'signup' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s1
         UNION ALL
         SELECT 2 AS step, 'click' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s2
         UNION ALL
         SELECT 3 AS step, 'purchase' AS step_name, CAST(COUNT(*) AS BIGINT) AS n_users FROM s3""",
    "e_resample" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                      MAX(CAST(value AS DECIMAL(18,2))) AS v
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT u, MIN(t) AS t0, MAX(t) AS t1 FROM e GROUP BY 1),
         grid AS (SELECT u, unnest(generate_series(t0, t1, 86400000000)) AS gt FROM b)
         SELECT g.u AS user_id, CAST(g.gt AS BIGINT) AS grid_micros,
                CAST(e.v AS DOUBLE) AS value
         FROM grid g ASOF JOIN e ON g.u = e.u AND g.gt >= e.t""",
    "e_resample_linear" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                      MAX(CAST(value AS DECIMAL(18,2))) AS v
           FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
           GROUP BY 1, 2),
         b AS (SELECT u, MIN(t) AS t0, MAX(t) AS t1 FROM e GROUP BY 1),
         grid AS (SELECT u, unnest(generate_series(t0, t1, 86400000000)) AS t FROM b),
         un AS (SELECT u, t, 0 AS g, v FROM e
                UNION ALL
                SELECT u, t, 1 AS g, CAST(NULL AS DECIMAL(18,2)) AS v FROM grid),
         br AS (SELECT u, t, g,
                  last_value(CASE WHEN g = 0 THEN t END IGNORE NULLS) OVER fwd AS pt,
                  last_value(CASE WHEN g = 0 THEN v END IGNORE NULLS) OVER fwd AS pv,
                  last_value(CASE WHEN g = 0 THEN t END IGNORE NULLS) OVER bwd AS nt,
                  last_value(CASE WHEN g = 0 THEN v END IGNORE NULLS) OVER bwd AS nv
                FROM un
                WINDOW fwd AS (PARTITION BY u ORDER BY t, g
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 bwd AS (PARTITION BY u ORDER BY t DESC, g DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT u AS user_id, CAST(t AS BIGINT) AS grid_micros,
                round(CASE WHEN t = pt THEN CAST(pv AS DOUBLE)
                      ELSE CAST(pv AS DOUBLE)
                           + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                             * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
                      END, 6) AS value
         FROM br WHERE g = 1""",
    "e_time_weighted" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                      CAST(value AS DECIMAL(18,2)) AS v FROM events
                    WHERE value IS NOT NULL AND ts IS NOT NULL),
         d AS (SELECT u, v, lead(t) OVER (PARTITION BY u ORDER BY t, v) - t AS dt
               FROM e),
         g AS (SELECT u, SUM(v * dt) AS num, SUM(dt) AS den
               FROM d WHERE dt IS NOT NULL GROUP BY 1 HAVING SUM(dt) > 0)
         SELECT u AS user_id, round(CAST(num AS DOUBLE) / den, 6) AS tw_avg,
                CAST(den AS BIGINT) AS span_micros
         FROM g""",
    // EWMA: identical fold — first sample is the init (no-init
    // list_reduce), then alpha*x + beta*acc per step in DOUBLE. beta is
    // interpolated from the SAME 1.0 - alpha double the operator uses
    // (1.0 - 0.3 is 0.7000000000000001 in IEEE, NOT 0.7)
    "e_ewma" ->
      s"""WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t,
                      CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v
                    FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
         g AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS n_samples,
                 list_reduce(list({'t': t, 'v': v} ORDER BY t, v),
                   (acc, x) -> {'t': x.t,
                     'v': CAST(0.3 AS DOUBLE) * x.v + CAST(${1.0 - 0.3} AS DOUBLE) * acc.v}) AS f
               FROM e GROUP BY u)
         SELECT u AS user_id, n_samples, round(f.v, 6) AS ewma FROM g""",
    "e_cohorts" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
                      CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
         f AS (SELECT u, MIN(wk) AS cohort_week FROM a GROUP BY 1)
         SELECT f.cohort_week,
                date_diff('day', f.cohort_week, a.wk) // 7 AS weeks_since,
                CAST(COUNT(*) AS BIGINT) AS n_active
         FROM a JOIN f USING (u) GROUP BY 1, 2""",
    "e_sessionize" ->
      """WITH x AS (SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         y AS (SELECT user_id, ts,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
               FROM x)
         SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
                COUNT(*) AS n_events
         FROM y GROUP BY user_id, sid""",
    "mm_describe" ->
      """SELECT doc_id AS media_id, 'text/plain' AS media_type,
                CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
                sha256(text) AS content_sha
         FROM documents""",
    "mm_frames" ->
      """WITH d AS (SELECT doc_id, CAST(text AS BLOB) AS b FROM documents),
         f AS (SELECT doc_id, octet_length(b) AS len,
                      unnest(generate_series(0, CAST(ceil(octet_length(b) / 32.0) AS INTEGER) - 1)) AS i
               FROM d)
         SELECT doc_id * 100000 + i AS frame_id,
                CAST(least(32, len - i * 32) AS INTEGER) AS n_bytes
         FROM f WHERE i % 2 = 0""",
    "mm_features" ->
      """SELECT doc_id AS media_id,
                CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
                CAST(ascii(text) AS INTEGER) AS f0_byte
         FROM documents""",
    // planted-payload truth: byte-identical media must pair at hamming 0
    "mm_phash_dups" ->
      "SELECT doc_id, true AS found FROM documents WHERE doc_id < 50",
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
    // derived-invariant twins (VERDICT r09 #7): literal structural truth
    // for the seeded-hash outputs whose row sets DuckDB cannot replay
    "ann_lsh_valid" ->
      """SELECT vec_id AS q_id, true AS ranks_ok, true AS scores_sorted,
                true AS neighbors_distinct, true AS neighbors_in_corpus
         FROM embeddings WHERE vec_id < 5""",
    "ann_pq_valid" ->
      """SELECT vec_id AS q_id, true AS ranks_ok, true AS scores_sorted,
                true AS neighbors_distinct, true AS neighbors_in_corpus
         FROM embeddings WHERE vec_id < 5""",
    "ann_ivf_valid" ->
      """SELECT vec_id AS q_id, true AS ranks_ok, true AS scores_sorted,
                true AS neighbors_distinct, true AS neighbors_in_corpus
         FROM embeddings WHERE vec_id < 5""",
    "knn_graph_valid" ->
      """SELECT true AS all_ranks_ok, true AS all_scores_sorted,
                true AS all_neighbors_distinct, true AS all_neighbors_in_corpus,
                true AS no_self_loops""",
    "dedup_near_valid" ->
      """SELECT true AS pairs_ordered, true AS pairs_distinct,
                true AS scores_in_range, true AS ids_in_corpus""",
    "dedup_simhash_valid" ->
      """SELECT true AS pairs_ordered, true AS pairs_distinct,
                true AS scores_in_range, true AS ids_in_corpus""",
    // real-codec BMP: dimensions, exact padded file length, and
    // per-channel pixel sums recomputed analytically from the generator
    // formulas — the encode→parse roundtrip must land every byte
    "mm_decode_bmp" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                       FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(54 + h * ((3 * w + 3) // 4 * 4) AS BIGINT) AS n_bytes,
                CAST(SUM((x * 7 + y * 13 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 5 + y * 11 + 2 * id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 3 + y * 17 + 3 * id) % 256) AS BIGINT) AS sum_b
         FROM dims, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4""",
    // planted-payload truth through the REAL codec: pixel-identical BMPs
    // must pair at hamming 0
    "mm_phash_real" ->
      """SELECT id AS media_id, true AS found
         FROM (SELECT unnest(range(0, 30)) AS id)""",
    // real-codec WAV: fmt-chunk fields + the exact interleaved PCM-16
    // sample sum
    "mm_decode_wav" ->
      """WITH clips AS (SELECT id, 1 + id % 2 AS ch,
                               8000 + (id % 3) * 4000 AS rate,
                               64 + id % 33 AS frames
                        FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(rate AS BIGINT) AS sample_rate,
                CAST(ch AS BIGINT) AS channels,
                CAST(frames AS BIGINT) AS n_frames,
                CAST(44 + frames * ch * 2 AS BIGINT) AS n_bytes,
                CAST(SUM((i * 31 + 7 * id) % 65536 - 32768) AS BIGINT) AS sum_samples
         FROM clips, unnest(range(0, frames * ch)) AS ui(i)
         GROUP BY 1, 2, 3, 4, 5""",
    // real-codec PNG: dimensions + per-channel pixel sums recomputed
    // analytically — the zlib inflate and all five scanline filters must
    // land every byte (n_pixels replaces n_bytes: deflate length is not
    // closed-form)
    "mm_decode_png" ->
      """WITH dims AS (SELECT id, 8 + id % 9 AS w, 8 + (id * 3) % 7 AS h
                       FROM (SELECT unnest(range(0, 512)) AS id))
         SELECT id AS media_id, CAST(w AS BIGINT) AS width,
                CAST(h AS BIGINT) AS height,
                CAST(w * h AS BIGINT) AS n_pixels,
                CAST(SUM((x * 7 + y * 13 + id) % 256) AS BIGINT) AS sum_r,
                CAST(SUM((x * 5 + y * 11 + 2 * id) % 256) AS BIGINT) AS sum_g,
                CAST(SUM((x * 3 + y * 17 + 3 * id) % 256) AS BIGINT) AS sum_b
         FROM dims, unnest(range(0, w)) AS ux(x), unnest(range(0, h)) AS uy(y)
         GROUP BY 1, 2, 3, 4""",
    // decode → exact 2×2 box resize → stats: every output pixel is
    // floor(block sum / 4), recomputed block by block
    "mm_resize_real" ->
      """WITH dims AS (SELECT id, 2 * (4 + id % 5) AS w, 2 * (3 + id % 4) AS h
                       FROM (SELECT unnest(range(0, 256)) AS id)),
         blocks AS (SELECT id, w, h, bx, by,
             SUM(((2 * bx + dx) * 7 + (2 * by + dy) * 13 + id) % 256) // 4 AS pr,
             SUM(((2 * bx + dx) * 5 + (2 * by + dy) * 11 + 2 * id) % 256) // 4 AS pg,
             SUM(((2 * bx + dx) * 3 + (2 * by + dy) * 17 + 3 * id) % 256) // 4 AS pb
           FROM dims, unnest(range(0, w // 2)) AS ubx(bx),
                unnest(range(0, h // 2)) AS uby(by),
                unnest(range(0, 2)) AS udx(dx), unnest(range(0, 2)) AS udy(dy)
           GROUP BY 1, 2, 3, 4, 5)
         SELECT id AS media_id, CAST(w // 2 AS BIGINT) AS out_width,
                CAST(h // 2 AS BIGINT) AS out_height,
                CAST(SUM(pr) AS BIGINT) AS sum_r,
                CAST(SUM(pg) AS BIGINT) AS sum_g,
                CAST(SUM(pb) AS BIGINT) AS sum_b
         FROM blocks GROUP BY 1, 2, 3""",
    // planted-payload truth through decode + REAL resize: pixel-identical
    // PNGs must still pair at hamming 0
    "mm_phash_resized" ->
      """SELECT id AS media_id, true AS found
         FROM (SELECT unnest(range(0, 30)) AS id)""",
    "a7_percentiles" ->
      """SELECT p.p_type AS category,
                round(quantile_cont(l.l_extendedprice, 0.5), 6) AS p50,
                round(quantile_cont(l.l_extendedprice, 0.9), 6) AS p90
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    // the scale-safe exact form must answer the same order statistics
    "a7_percentiles_scalable" ->
      """SELECT p.p_type AS category,
                round(quantile_cont(l.l_extendedprice, 0.5), 6) AS p50,
                round(quantile_cont(l.l_extendedprice, 0.9), 6) AS p90
         FROM orders o
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1""",
    "j8_asof" ->
      """WITH ev AS (SELECT event_id, user_id, ts FROM events),
         cand AS (
           SELECT e.event_id, o.o_orderkey, o.o_orderstatus,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
           FROM ev e JOIN orders o
             ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts)
         SELECT e.event_id, e.user_id,
                COALESCE(c.o_orderkey, -1) AS asof_orderkey,
                COALESCE(c.o_orderstatus, 'NONE') AS asof_status
         FROM ev e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
           ON c.event_id = e.event_id""",
    // the forward mirror: smallest date >= event time, smallest orderkey
    // breaks the tie
    "j11_asof_next" ->
      """WITH ev AS (SELECT event_id, user_id, ts FROM events),
         cand AS (
           SELECT e.event_id, o.o_orderkey, o.o_orderstatus,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
           FROM ev e JOIN orders o
             ON o.o_custkey = e.user_id AND CAST(o.o_orderdate AS TIMESTAMP) >= e.ts)
         SELECT e.event_id, e.user_id,
                COALESCE(c.o_orderkey, -1) AS next_orderkey,
                COALESCE(c.o_orderstatus, 'NONE') AS next_status
         FROM ev e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
           ON c.event_id = e.event_id""",
    "w_global_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""",
    // date_trunc to µs on both comparands: the engine compares at Spark's
    // microsecond timestamp precision while DuckDB reads the raw
    // nanosecond parquet values
    "j9_interval" ->
      """SELECT e.event_id, s.event_id AS signup_id
         FROM events e
         JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
           ON s.user_id = e.user_id
          AND date_trunc('microseconds', e.ts) >= date_trunc('microseconds', s.ts)
          AND date_trunc('microseconds', e.ts) <= date_trunc('microseconds', s.ts) + INTERVAL 2 HOUR""",
    "a6_cube" ->
      """SELECT COALESCE(category, 'ALL') AS category,
                COALESCE(strftime(order_date, '%Y-%m-%d'), 'ALL') AS order_date,
                CAST(SUM(price_d) AS DOUBLE) AS revenue,
                COUNT(*) AS n
         FROM (SELECT p.p_type AS category, CAST(o.o_orderdate AS DATE) AS order_date,
                      CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price_d
               FROM orders o
               JOIN lineitem l ON o.o_orderkey = l.l_orderkey
               JOIN part p ON l.l_partkey = p.p_partkey)
         GROUP BY CUBE(category, order_date)""",
    "a6_rollup" ->
      """SELECT COALESCE(category, 'ALL') AS category,
                COALESCE(strftime(order_date, '%Y-%m-%d'), 'ALL') AS order_date,
                CAST(SUM(price_d) AS DOUBLE) AS revenue,
                COUNT(*) AS n
         FROM (SELECT p.p_type AS category, CAST(o.o_orderdate AS DATE) AS order_date,
                      CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price_d
               FROM orders o
               JOIN lineitem l ON o.o_orderkey = l.l_orderkey
               JOIN part p ON l.l_partkey = p.p_partkey)
         GROUP BY ROLLUP(category, order_date)""",
    "e_pivot" ->
      """SELECT CAST(ts AS DATE) AS day,
                COUNT(*) FILTER (WHERE event_type = 'click') AS click,
                COUNT(*) FILTER (WHERE event_type = 'error') AS error,
                COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
                COUNT(*) FILTER (WHERE event_type = 'view') AS view
         FROM events GROUP BY 1""",
    "e_unpivot" ->
      """SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
         FROM events
         WHERE event_type IN ('click','error','purchase','signup','view')
         GROUP BY 1, 2""",
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
    "w_running_total" ->
      """WITH daily AS (
           SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec,
                  COUNT(*) AS n_orders
           FROM orders GROUP BY 1, 2)
         SELECT priority, day, n_orders,
                CAST(SUM(n_orders) OVER w AS BIGINT) AS cum_orders,
                CAST(SUM(rev_dec) OVER w AS DOUBLE) AS cum_revenue
         FROM daily
         WINDOW w AS (PARTITION BY priority ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "w_day_over_day" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, n,
                lag(n) OVER w AS prev_n,
                n - coalesce(lag(n) OVER w, 0) AS delta
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day)""",
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
    "st_curate" -> sqlCuratePackedOracle,
    // ... and the per-stage funnel report (batch + streaming twins)
    "pipeline_curate_report" -> sqlCurateReportOracle,
    "st_curate_report" -> sqlCurateReportOracle,
   
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
         FROM g GROUP BY 1""",

    "s_csv_roundtrip" -> "SELECT r_regionkey, r_name FROM region",
    "s_partitioned_roundtrip" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders",
    "s_partition_pruned" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         FROM orders WHERE o_orderstatus = 'F'""",
    "s_partitioned_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders""",
    "s_partitioned_upsert_snapshot" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders""",
    // schema evolution: the full-outer MERGE with the update batch's new
    // column, null on every row the evolving batch didn't write
    "s_evolve_upsert" ->
      """WITH t AS (SELECT o_orderkey, o_totalprice, o_orderpriority
                    FROM orders WHERE o_orderkey % 3 = 0),
            u AS (SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
                         o_orderpriority,
                         'c' || CAST(o_orderkey % 5 AS VARCHAR) AS note
                  FROM orders
                  WHERE o_orderkey % 2 = 0
                    AND o_orderpriority IN ('1-URGENT', '2-HIGH'))
         SELECT
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderkey
                ELSE t.o_orderkey END AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderpriority
                ELSE t.o_orderpriority END AS o_orderpriority,
           u.note AS note
         FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey""",
    // time travel after the evolving commit: version 0's own schema/rows
    "s_evolve_timetravel" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
         FROM orders WHERE o_orderkey % 3 = 0""",
    // the restarted-stream evolution: era-1 MERGE then era-2 MERGE with
    // the new column — same full-outer semantics, null on era-1-only rows
    "st_evolve" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority AS prio
                    FROM orders WHERE o_orderkey % 3 = 0),
            u AS (SELECT o_orderkey, 'u:' || o_orderpriority AS prio,
                         o_totalprice AS bonus
                  FROM orders WHERE o_orderkey % 2 = 0)
         SELECT
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderkey
                ELSE t.o_orderkey END AS o_orderkey,
           CASE WHEN u.o_orderkey IS NOT NULL THEN u.prio
                ELSE t.prio END AS prio,
           u.bonus AS bonus
         FROM t FULL OUTER JOIN u ON t.o_orderkey = u.o_orderkey""",
    // the delete replayed as an anti-filter on the raw table
    "s_partitioned_delete" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders
         WHERE NOT (o_orderkey % 5 = 0 OR o_orderstatus = 'P')""",
    "s_time_travel" ->
      """SELECT o_orderkey, o_totalprice AS price_v0,
                CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                     ELSE o_totalprice END AS price_now
         FROM orders""",
    "s_version_diff" ->
      """SELECT o_orderkey, 'changed' AS change FROM orders WHERE o_orderkey % 7 = 0
         UNION ALL
         SELECT o_orderkey + 1000000000 AS o_orderkey, 'added' AS change
         FROM orders WHERE o_orderkey % 13 = 0""",
    "e_scd2_history" -> scd2HistoryOracle,
    // the STREAMING maintenance operator answers the batch oracle
    // verbatim (the st_daily_kpis_exact convention)
    "st_scd2_history" -> scd2HistoryOracle,
    "j10_temporal_enrich" ->
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
         ), scd AS (
           SELECT l_orderkey, effective_from,
                  lead(effective_from) OVER w2 AS effective_to,
                  (lead(effective_from) OVER w2 IS NULL) AS is_current,
                  l_returnflag, l_linestatus
           FROM runs
           WINDOW w2 AS (PARTITION BY l_orderkey ORDER BY effective_from)
         )
         SELECT f.l_orderkey, f.l_linenumber, f.l_partkey,
                s.effective_from, s.effective_to, s.is_current,
                s.l_returnflag, s.l_linestatus
         FROM lineitem f
         LEFT JOIN scd s
           ON f.l_orderkey = s.l_orderkey
          AND s.effective_from <= f.l_linenumber
          AND (s.effective_to IS NULL OR f.l_linenumber < s.effective_to)""",
    "s_json_roundtrip" ->
      "SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
    "s_schema_merge" ->
      """SELECT r_regionkey, r_name, NULL AS ingest_tag, CAST(0 AS BIGINT) AS gen FROM region
         UNION ALL
         SELECT r_regionkey, r_name, 'v2' AS ingest_tag, CAST(1 AS BIGINT) AS gen FROM region""",
    "s_orc_roundtrip" ->
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders",
    "s_text_roundtrip" -> "SELECT text AS value FROM documents",
    "s_listing" ->
      """SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),('events'),('lineitem'),
         ('nation'),('orders'),('part'),('region'),('supplier')) AS t(table_name)""",
    "s_schema_only" ->
      """SELECT * FROM (VALUES ('o_orderkey'),('o_custkey'),('o_orderstatus'),
         ('o_totalprice'),('o_orderdate'),('o_orderpriority')) AS t(column_name)"""
  )

  /** The orders rule report as DuckDB SQL over relation `rel` (used for both
    * the clean table and the mutated CTE).
    */
  private def rulesOrdersOracle(rel: String): String =
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

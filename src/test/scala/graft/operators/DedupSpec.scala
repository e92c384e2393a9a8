package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Dedup family: exact grouping, MinHash determinism, planted near-dups
  * end-to-end, Jaccard exactness, hot-bucket cap, SimHash Hamming.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near dup of 1
    (4L, "completely different content about spark catalyst optimizer rules and plans"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content and keeps the smallest id") {
    val out = Dedup.exact(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet // (keep_id, dup_count)
    assert(out == Set((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L)))
  }

  test("keepCanonical keeps exactly the smallest-id row per distinct content, columns intact") {
    val out = Dedup.keepCanonical(corpus, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 3L, 4L, 5L)) // 2 is the exact dup of 1
    assert(out(1L).contains("today") && out(5L) == "")
    // one row per survivor, schema unchanged
    assert(Dedup.keepCanonical(corpus, "doc_id", "text").columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("dropNearDuplicates keeps one doc per near-dup cluster plus all unpaired docs") {
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    // {1,2,3} cluster → keep 1; 4 unpaired; 5 (empty) unpaired
    assert(kept == Set(1L, 4L, 5L))
  }

  test("identical documents get identical minhash signatures; different ones differ") {
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("nearDuplicates finds exact and near pairs, not unrelated ones") {
    val pairs = Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)),
      s"near dup pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated doc paired: $pairs")
  }

  test("exactGroups sparse lazy collapse: member map covers dup groups only, " +
    "clean corpus degenerates to identity, pair results unchanged (VERDICT r14 #1)") {
    // corpus has ONE exact dup pair (1,2): the member map holds exactly
    // that group — singletons stay implicit
    val (reps, mem) = Dedup.exactGroups(corpus, "doc_id", "text", cache = false)
    val m = mem.get.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 1L), (1L, 2L)), s"sparse member map: $m")
    assert(reps.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 4L, 5L), "reps drop only the non-canonical copy")
    // a dup-free corpus: empty member map, reps = input rows
    val clean = corpus.filter(col("doc_id") =!= 2L)
    val (reps2, mem2) = Dedup.exactGroups(clean, "doc_id", "text", cache = false)
    assert(mem2.get.isEmpty, "a dup-free corpus has an empty member map")
    assert(reps2.count() == clean.count())
    // and the collapsed pipeline answers exactly like the uncollapsed one
    // on a clean corpus: representative grain IS document grain
    val viaSparse = Dedup.nearDuplicates(clean, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaNone = Dedup.nearDuplicates(clean, "doc_id", "text", threshold = 0.5,
      collapseExact = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaSparse == viaNone)
    Dedup.clearCaches()
  }

  test("adaptive banding: boilerplate density tightens band keys so bucket " +
    "occupancy stays bounded where fixed 4x4 degenerates (VERDICT r14 #7)") {
    // 40 suffix-mutated members sharing a 60-token block (8 unique
    // tokens each): exactGroups cannot collapse them (no verbatim
    // copies), and under fixed 4x4 banding nearly every member shares
    // some band key with every other — the quadratic candidate set the
    // ladder exists to prevent
    val boiler = (1 to 60).map(i => "qq" + i).mkString(" ")
    val dense = (1 to 40).map(i =>
      (i.toLong, s"$boiler " + (1 to 8).map(j => s"t${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.adaptiveBandRows(dense, "text") == 16,
      "a dup-factor > 3 corpus must pick the 1x16 rung")
    // organically-sparse prose keeps the default trade
    val sparse = (1 to 40).map(i =>
      (i.toLong, (1 to 30).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.adaptiveBandRows(sparse, "text") == 4)
    // measured cost on the dense corpus, production (index-independent
    // xxhash64) family: fixed 4x4 pairs most of the family through some
    // shared band; the ladder's 1x16 key bounds both occupancy and the
    // candidate join (deterministic hashes — these numbers are stable)
    val sigs = Dedup.minhashSignatures(dense, "doc_id", "text", 16)
    def stats(bands: Int): (Long, Long) = {
      val banded = Dedup.bandSignatures(sigs, "doc_id", 16, bands)
      (banded.groupBy("band", "sig").count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0),
        Dedup.lshCandidates(banded, "doc_id").count())
    }
    val (fixedMax, fixedCands) = stats(4)
    val (adMax, adCands) = stats(1)
    assert(fixedCands >= 700L,
      s"fixed banding should near-saturate the 780 possible pairs: $fixedCands")
    assert(adCands * 4 <= fixedCands,
      s"adaptive keys must bound the candidate join: $adCands vs $fixedCands")
    assert(adMax * 2 <= fixedMax,
      s"adaptive keys must bound occupancy: $adMax vs $fixedMax")
    Dedup.clearCaches()
  }

  test("jaccardVerify computes exact shingle-set Jaccard") {
    // doc 1: tokens a b c d → 3-shingles {abc, bcd}; doc 2: a b c e → {abc, bce}
    val docs = Seq((1L, "a b c d"), (2L, "a b c e")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val j = Dedup.jaccardVerify(pairs, docs, "doc_id", "text")
      .collect()(0).getDouble(2)
    assert(math.abs(j - 1.0 / 3.0) <= 1e-6) // |∩|=1 ({abc}), |∪|=3
  }

  test("hot-bucket cap suppresses quadratic candidate generation") {
    // 50 identical docs: one (band, sig) bucket of 50 → 1225 pairs uncapped
    val many = (1L to 50L).map(i => (i, "same same same text body here"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(many, "doc_id", "text", k = 8)
    val banded = Dedup.bandSignatures(sigs, "doc_id", k = 8, bands = 2)
    assert(Dedup.lshCandidates(banded, "doc_id", maxBucket = 10).isEmpty,
      "bucket of 50 must be dropped with cap 10")
    assert(Dedup.lshCandidates(banded, "doc_id", maxBucket = 100).count() == 50L * 49 / 2)
  }

  test("embeddingNearDuplicates pairs near-identical vectors, skips distant ones") {
    val emb = Seq(
      (1L, Seq(0.5, -0.2, 0.8, 0.1, 0.3, -0.7, 0.2, 0.9)),
      (2L, Seq(0.5000001, -0.2, 0.8, 0.1, 0.3, -0.7, 0.2, 0.9)), // ≈ 1
      (3L, Seq(-0.5, 0.2, -0.8, -0.1, -0.3, 0.7, -0.2, -0.9)),   // opposite
      (4L, Seq(0.9, -0.1, 0.1, 0.2, 0.1, -0.1, 0.8, 0.1))        // same signs, low cos
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDuplicates(emb, "vec_id", "embedding",
      threshold = 0.99, nbits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical docs at Hamming 0; simhashNearDuplicates pairs them") {
    val sigs = Dedup.simhash(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    val pairs = Dedup.simhashNearDuplicates(corpus, "doc_id", "text", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 2L)).contains(0))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("dropNearDuplicates with star contraction keeps the same survivors") {
    val kept = Dedup.dropNearDuplicates(corpus, "doc_id", "text",
        threshold = 0.5, starContraction = true)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("clearCaches releases the session-lived signature caches (VERDICT r04 #7)") {
    Dedup.clearCaches(blocking = true) // start from a clean registry
    // track the SPECIFIC RDD ids our caches add — comparing global
    // getPersistentRDDs SIZES races the async ContextCleaner reclaiming
    // other suites' stale localCheckpoint blocks mid-test
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // materialize both cache-bearing pipelines so their persists have blocks
    Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.5).count()
    Dedup.simhashNearDuplicates(corpus, "doc_id", "text").count()
    assert(graft.util.Caches.registeredCount >= 2)
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "signature caches should be materialized")
    Dedup.clearCaches(blocking = true)
    assert(graft.util.Caches.registeredCount == 0)
    val remaining = spark.sparkContext.getPersistentRDDs.keySet
    assert(added.forall(id => !remaining.contains(id)),
      "orphaned cache entry survived clearCaches")
    // a second invocation after the clear recomputes and still answers
    val pairs = Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    Dedup.clearCaches(blocking = true)
  }

  test("contaminationReport flags benchmark-overlapping docs with exact counts") {
    import spark.implicits._
    val bench = Seq(1L -> "alpha beta gamma delta epsilon zeta")
      .toDF("doc_id", "text")
    val docs = Seq(
      // contains the benchmark's 4-gram "alpha beta gamma delta" (and
      // "beta gamma delta epsilon") → 2 distinct overlapping 4-grams
      10L -> "xx alpha beta gamma delta epsilon yy",
      // shares words but no full 4-gram window
      11L -> "alpha beta other gamma delta",
      12L -> "wholly unrelated text entirely")
      .toDF("doc_id", "text")
    val got = Dedup.contaminationReport(docs, "doc_id", "text",
      bench, "text", shingleN = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(10L) == ((2L, true)), s"expected 2 overlapping 4-grams: ${got(10L)}")
    assert(got(11L) == ((0L, false)))
    assert(got(12L) == ((0L, false)))
    // minOverlap raises the bar
    val strict = Dedup.contaminationReport(docs, "doc_id", "text",
      bench, "text", shingleN = 4, minOverlap = 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(strict(10L) == false, "2 overlaps must not flag at minOverlap=3")
  }

  test("deleteVariantsExpr produces the key plus every single-char deletion") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("abc", "", "x").toDF("k")
      .select(col("k"), Dedup.deleteVariantsExpr(col("k"), 64).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(got("abc") == Set("abc", "bc", "ac", "ab"))
    assert(got("") == Set(""), "empty key must not hit the descending-sequence trap")
    assert(got("x") == Set("x", ""))
  }

  test("fuzzyPairs: substitution/deletion/insertion pair at d<=1; transposition and strangers do not") {
    import spark.implicits._
    val docs = Seq(
      1L -> "colour grade",   // base
      2L -> "colour grado",   // substitution (d=1)
      3L -> "colour grad",    // deletion (d=1)
      4L -> "colour gradle",  // insertion (d=1)
      5L -> "colour grdae",   // transposition (d=2 in plain Levenshtein)
      6L -> "wholly other")
      .toDF("doc_id", "text")
    val pairs = Dedup.fuzzyPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val ab = pairs.map(p => (p._1, p._2)).toSet
    assert(Set((1L, 2L), (1L, 3L), (1L, 4L)).subsetOf(ab),
      s"all three d=1 edits must pair with the base: $ab")
    assert(!ab.exists(p => p._1 == 6L || p._2 == 6L), "strangers must not pair")
    assert(!ab.contains((1L, 5L)),
      "a transposition is Levenshtein 2 — candidate generated, verify rejects")
    assert(pairs.forall(_._3 <= 1))
    // identical keys pair at distance 0 exactly once despite sharing
    // every delete variant
    val dup = Dedup.fuzzyPairs(
      Seq(7L -> "same key", 8L -> "same key").toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(dup.toSeq == Seq((7L, 8L, 0)))
  }

  test("fuzzyPairs hot-variant buckets are capped, not quadratic") {
    import spark.implicits._
    val docs = (1L to 50L).map(_ -> "the same boilerplate key").toDF("doc_id", "text")
    assert(Dedup.fuzzyPairs(docs, "doc_id", "text", maxBucket = 10).count() == 0L,
      "an over-cap variant bucket must be dropped, like every LSH family")
  }

  test("fuzzyPairs drops null keys instead of pairing them at distance 0") {
    import spark.implicits._
    val docs = Seq((1L, null), (2L, null), (3L, "real key"))
      .toDF("doc_id", "text")
    assert(Dedup.fuzzyPairs(docs, "doc_id", "text").count() == 0L)
  }

  test("boilerplateStats: shared spans score high, original prose zero") {
    import spark.implicits._
    val boiler = "copyright header one two three four five six"  // 9 tokens
    val docs = Seq(
      (1L, boiler + " alpha beta gamma delta"),
      (2L, boiler + " epsilon zeta eta theta"),
      (3L, "completely original text with no repeats at all anywhere")
    ).toDF("doc_id", "text")
    val byId = Dedup.boilerplateStats(docs, "doc_id", "text", shingleN = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the 8-token boiler prefix gives docs 1/2 (12 tokens, 5 windows)
    // exactly one fully-shared window each; doc 3 (9 tokens, 2
    // windows) shares nothing
    assert(byId(1L)._1 == 5L && byId(1L)._2 == 1L)
    assert(byId(1L)._3 == 0.2)
    assert(byId(2L)._2 == 1L)
    assert(byId(3L) == ((2L, 0L, 0.0)))
  }

  test("boilerplateStats hashed grams match the string-gram model exactly") {
    import spark.implicits._
    // deterministic pseudo-random corpus with shared spans, short docs
    // (< shingleN tokens: whole-token-list gram), an empty doc, and exact
    // copies — the hashed implementation must reproduce the STRING-gram
    // model (the DuckDB oracle's form) count for count
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val boiler = "all rights reserved c 2026 example corp inc"
    def doc(seed: Long): String = {
      val r = new scala.util.Random(seed)
      val body = Seq.fill(4 + r.nextInt(16))(words(r.nextInt(words.length)))
      (if (seed % 3 == 0) boiler + " " else "") + body.mkString(" ")
    }
    val rows = (1L to 60L).map(i => i -> doc(i)) ++
      Seq(61L -> "tiny doc", 62L -> "tiny doc", 63L -> "", 64L -> "solo") ++
      (1L to 10L).map(i => (100L + i) -> doc(i)) // exact copies
    val n = 8
    def gramsOf(text: String): Set[Seq[String]] = {
      val ts = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val count = math.max(ts.length - (n - 1), 1)
      (0 until count).map(i => ts.slice(i, i + n)).toSet
    }
    val model = rows.map { case (id, t) => id -> gramsOf(t) }
    val df = model.flatMap { case (_, gs) => gs }
      .groupBy(identity).view.mapValues(_.size).toMap
    val expected = model.map { case (id, gs) =>
      val shared = gs.count(g => df(g) >= 2)
      id -> ((gs.size.toLong, shared.toLong,
        BigDecimal.decimal(shared.toDouble / gs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val got = Dedup.boilerplateStats(rows.toDF("doc_id", "text"),
      "doc_id", "text", shingleN = n)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, expected $e")
    }
  }

  test("incrementalNearDuplicates: fresh pairs only, registry internals excluded") {
    import spark.implicits._
    // registry holds an internal exact-duplicate pair (1,2) that a full
    // dedup would emit; the incremental pass must NOT re-find it, but
    // must find fresh 10 against registry 1 AND 2, and fresh-fresh
    // (10,11) exactly once
    val registry = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again today",
      2L -> "the quick brown fox jumps over the lazy dog again today",
      3L -> "completely unrelated registry document about database engines"
    ).toDF("doc_id", "text")
    val fresh = Seq(
      10L -> "the quick brown fox jumps over the lazy dog again today",
      11L -> "the quick brown fox jumps over the lazy dog again today"
    ).toDF("doc_id", "text")
    val pairs = Dedup.incrementalNearDuplicates(registry, fresh,
      "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (10L, 11L)),
      s"got $pairs")
  }

  test("semanticNearDuplicates finds planted copies and caps hot cells") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val emb = (1L to 40L).map(i =>
      (i, Seq.fill(8)(r.nextGaussian()))).toDF("vec_id", "emb_d")
    val planted = emb.unionByName(
      emb.filter(col("vec_id") <= 5).select(
        (col("vec_id") + 100L).as("vec_id"), col("emb_d")))
    val pairs = Dedup.semanticNearDuplicates(planted, "vec_id", "emb_d",
      threshold = 0.999, nCells = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L to 5L).foreach(i =>
      assert(pairs.contains((i, i + 100L)), s"planted copy of $i missed: $pairs"))
    // one degenerate cell (cap 3 < any real cell) -> capped drop, no blow-up
    assert(Dedup.semanticNearDuplicates(planted, "vec_id", "emb_d",
      threshold = 0.0, nCells = 1, iters = 1, maxCell = 3).count() == 0L)
  }

  test("containmentVerify: excerpt scores 1.0 against its source, asymmetric both ways") {
    import spark.implicits._
    val full = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, full), (2L, "one two three four five")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r = Dedup.containmentVerify(pairs, docs, "doc_id", "text").collect()(0)
    assert(r.getDouble(3) == 1.0)            // excerpt (b) fully contained in a
    assert(r.getDouble(2) < 1.0)             // source only partially covered by b
  }

  test("containedDocuments: planted half-excerpt reported contained in its source") {
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, (0 until 12).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val excerpts = (1L to 20L).map(i =>
      (i + 100L, (0 until 6).map(j => s"w${i}_$j").mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.containedDocuments(docs.unionByName(excerpts),
      "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    (1L to 20L).foreach { i =>
      assert(got.contains((i + 100L, i, 1.0)), s"excerpt of $i missed: ${got.toSeq}")
    }
    // no false direction: a 12-token source is never contained in its 6-token excerpt
    assert(!got.exists { case (c, _, _) => c <= 20L })
  }

  test("cdcChunks reassembles the document and is offset-shift immune") {
    import spark.implicits._
    val base = (0 until 40).map(j => s"token$j word${j % 7}").mkString(" ")
    val docs = Seq((1L, base), (2L, "PREFIX INSERTED AHEAD " + base))
      .toDF("doc_id", "text")
    val rows = Dedup.cdcChunks(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // chunks of each doc tile it exactly: starts/lengths are a partition
    Seq(1L, 2L).foreach { id =>
      val cs = rows.filter(_._1 == id).sortBy(_._2)
      assert(cs.head._3 == 0L, "first chunk starts at 0")
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._4 == b._3, s"gap after $a")
        case _ =>
      }
      val doclen = docs.filter(col("doc_id") === id)
        .select("text").as[String].head().length
      assert(cs.map(_._4).sum == doclen, "chunk lengths tile the doc")
    }
    // the defining CDC property: after the prefix-shifted doc re-syncs at
    // its first shared boundary, the digest STREAMS coincide — most of
    // doc 1's chunk digests appear verbatim in doc 2
    val d1 = rows.filter(_._1 == 1L).map(_._5).toSet
    val d2 = rows.filter(_._1 == 2L).map(_._5).toSet
    val shared = d1.intersect(d2).size
    assert(shared >= d1.size - 2,
      s"offset immunity lost: only $shared of ${d1.size} digests survive a prefix")
    // fixed-size chunking (same width, same count) shares ~nothing — the
    // contrast that motivates CDC
    val width = 55
    def fixed(t: String) = t.grouped(width).toSet
    val f1 = fixed(base); val f2 = fixed("PREFIX INSERTED AHEAD " + base)
    assert(f1.intersect(f2).size <= 1, "fixed-size would also be immune?!")
  }

  test("duplicatedSpans: coverage union of duplicated L-grams, overlaps merged") {
    import spark.implicits._
    // doc 1 and doc 2 share a 30-char passage embedded at DIFFERENT
    // offsets; everything else is unique. L = 20 → the shared passage's
    // 11 grams are duplicated, nothing else.
    // NOTE: the chars ADJACENT to the shared passage differ per doc (q/r
    // vs s/t) — a common separator would itself extend the duplicated
    // region by one gram on each side
    val shared = "abcdefghijklmnopqrstuvwxyz0123" // 30 chars
    val d1 = "AAAAq" + shared + "rBBBBBBBBBBBBBBBBB"
    val d2 = "CCCCCCCCCCCCs" + shared + "tDDDD"
    val docs = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // exactly one maximal span per doc, covering the shared 30 chars
    assert(spans.length == 2, s"expected 2 spans: ${spans.toSeq}")
    val s1 = spans.find(_._1 == 1L).get
    val s2 = spans.find(_._1 == 2L).get
    assert(s1._2 == d1.indexOf(shared) && s1._3 == d1.indexOf(shared) + 29,
      s"doc1 span $s1")
    assert(s2._2 == d2.indexOf(shared) && s2._3 == d2.indexOf(shared) + 29,
      s"doc2 span $s2")
    assert(s1._4 == 30 && s2._4 == 30, "span_len covers the passage exactly")
    assert(s1._5 == 11, "30-char passage has 11 duplicated 20-grams")
    // an intra-doc repeat is also a duplication: one doc repeating its
    // own 20-gram twice reports both occurrences (possibly merged)
    val rep = "X" * 5 + "yyyyyyyyyyyyyyyyyyyy" + "Z" * 5 +
      "yyyyyyyyyyyyyyyyyyyy" + "W" * 5
    val intra = Dedup.duplicatedSpans(Seq((9L, rep)).toDF("doc_id", "text"),
      "doc_id", "text", gramLen = 20).collect()
    assert(intra.nonEmpty, "intra-doc repeats must surface")
  }

  test("duplicatedSpans: exactly-touching duplicated intervals merge into one " +
    "contiguous span (ADVICE r14)") {
    import spark.implicits._
    // doc 1 = X ++ Y (two 20-char blocks, adjacent); X recurs alone in
    // doc 2, Y alone in doc 3 — so in doc 1 only the grams at p=0 (X)
    // and p=20 (Y) are duplicated: intervals [0,19] and [20,39] touch
    // exactly and their union is one contiguous duplicated region
    val x = "abcdefghijklmnopqrst"
    val y = "0123456789!@#$%^&*()"
    val docs = Seq(
      (1L, x + y),
      (2L, "ppppppp" + x + "qqqqqqq"),
      (3L, "rrrrrrr" + y + "sssssss")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", gramLen = 20)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.toSeq == Seq((0L, 39L, 40L, 2L)),
      s"touching intervals must report ONE maximal span: ${spans.toSeq}")
  }

  test("fuzzyPairs never emits self-pairs, even for duplicate input ids") {
    import spark.implicits._
    // id 1 appears under two keys at distance 1: the key-pair expansion
    // must not produce (1, 1)
    val docs = Seq((1L, "abc"), (1L, "abd"), (2L, "abe"))
      .toDF("doc_id", "text")
    val pairs = Dedup.fuzzyPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a < b }, s"self or unordered pair in ${pairs.toSeq}")
  }
}

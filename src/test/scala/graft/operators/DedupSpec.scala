package graft.operators

import graft.SparkSpec

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

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shards: shuffle determinism/balance, budget-line arithmetic at the
  * straddle boundary, and per-group adaptive-gate rank math.
  */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  test("shardShuffle is a balanced deterministic permutation") {
    val docs = (0L until 100L).toDF("doc_id")
    val a = Shards.shardShuffle(docs, "doc_id", nShards = 8, seed = "s1")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard")))
    // balanced: 100 rows into 8 shards → sizes 13 or 12, ids 1..8
    val sizes = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.keySet == (1L to 8L).toSet)
    assert(sizes.values.forall(n => n == 12 || n == 13) &&
      sizes.values.sum == 100)
    // in-shard sequences are 1..size with no gaps
    for ((shard, rows) <- a.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (1L to sizes(shard)).toSeq)
    // deterministic: a second run is identical
    val b = Shards.shardShuffle(docs, "doc_id", nShards = 8, seed = "s1")
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard")))
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("shardShuffle seed changes the permutation") {
    val docs = (0L until 100L).toDF("doc_id")
    def order(seed: String) =
      Shards.shardShuffle(docs, "doc_id", 4, seed).collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_in_shard"),
          r.getAs[Long]("doc_id"))).sorted.map(_._3).toSeq
    assert(order("s1") != order("s2"))
  }

  test("tokenBudgetSelect keeps best-first until the line, flags the straddler") {
    val docs = Seq(
      (1L, 40L, 9L),   // 3rd by score: cum_before 60 → kept, CUT (60+40>80)
      (2L, 30L, 10L),  // 1st: cum 0, kept
      (3L, 30L, 10L),  // 2nd (id tiebreak): cum 30, kept
      (4L, 50L, 5L)    // 4th: cum 100 ≥ 80 → dropped
    ).toDF("doc_id", "n_toks", "score")
    val r = Shards.tokenBudgetSelect(docs, "doc_id", "n_toks", "score", 80L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cum_before"), r.getAs[Boolean]("kept"),
          r.getAs[Boolean]("cut"))).toMap
    assert(r(2L) == ((0L, true, false)))
    assert(r(3L) == ((30L, true, false)))
    assert(r(1L) == ((60L, true, true)))
    assert(r(4L) == ((100L, false, false)))
  }

  test("tokenBudgetSelect exact fill is kept uncut") {
    val docs = Seq((1L, 80L, 1L)).toDF("doc_id", "n_toks", "score")
    val r = Shards.tokenBudgetSelect(docs, "doc_id", "n_toks", "score", 80L)
      .head()
    assert(r.getAs[Boolean]("kept") && !r.getAs[Boolean]("cut"))
  }

  test("adaptiveQualityGate thresholds per group, not globally") {
    // group a: scores 1..4 (pr 0, 1/3, 2/3, 1); group b: 100..103 —
    // a global 25% cut would drop all of group a; per-group it drops
    // exactly the worst row of each
    val docs = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 4L),
      ("b", 5L, 100L), ("b", 6L, 101L), ("b", 7L, 102L), ("b", 8L, 103L)
    ).toDF("grp", "doc_id", "score")
    val r = Shards.adaptiveQualityGate(docs, "grp", "doc_id", "score", 0.25)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("q_rank"), r.getAs[Boolean]("kept"))).toMap
    assert(!r(1L)._2 && !r(5L)._2)
    assert(Seq(2L, 3L, 4L, 6L, 7L, 8L).forall(r(_)._2))
    assert(r(2L)._1 == 0.333333 && r(3L)._1 == 0.666667 && r(4L)._1 == 1.0)
  }

  test("rendezvousShard: growing the ring moves rows ONLY into the new shard") {
    val docs = (0L until 400L).toDF("doc_id")
    val s16 = Shards.rendezvousShard(docs, "doc_id", 16, "s")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val s17 = Shards.rendezvousShard(docs, "doc_id", 17, "s")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    val moved = (0L until 400L).filter(id => s16(id) != s17(id))
    // the HRW contract: a row moves iff the NEW shard (id 16) wins it
    assert(moved.forall(id => s17(id) == 16L), "a moved row landed in an old shard")
    // ≈ 1/17 of rows move (23.5 expected) — generous band, zero would
    // mean the new shard never wins and all-moved would mean mod-sharding
    assert(moved.size > 5 && moved.size < 60, s"moved ${moved.size} of 400")
  }

  test("rendezvousShard covers all shards and is seed-sensitive") {
    val docs = (0L until 400L).toDF("doc_id")
    val a = Shards.rendezvousShard(docs, "doc_id", 8, "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(a.values.toSet == (0L to 7L).toSet)
    val b = Shards.rendezvousShard(docs, "doc_id", 8, "s2")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("shard")).toMap
    assert(a != b)
  }

  test("adaptiveQualityGate breaks score ties by id deterministically") {
    val docs = Seq(("a", 1L, 5L), ("a", 2L, 5L), ("a", 3L, 5L))
      .toDF("grp", "doc_id", "score")
    val r = Shards.adaptiveQualityGate(docs, "grp", "doc_id", "score", 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("kept")).toMap
    assert(r == Map(1L -> false, 2L -> true, 3L -> true))
  }
}

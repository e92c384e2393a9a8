package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assembly — the LAST mile of a pretraining data
  * pipeline, after curation/dedup/packing: give every example a
  * deterministic pseudo-random position, cut the stream into N
  * equal-size output shards, and (upstream of that) choose WHICH
  * examples ship when the run has a fixed token budget.
  *
  * Everything here rides the repo's two scale-safe total-order
  * primitives — [[Ranking.ntileExact]] (range repartition + per-
  * partition ranks + driver-side prefix of ≤ shuffle-partitions
  * partition COUNTS) and [[Pack.packSequences]] (same shape for token
  * prefix sums) — so there is no single-partition window anywhere: a
  * 100 TB corpus pays one range exchange and parallel sorts per pass.
  * Randomness is `md5(seed || id)` — seeded, reproducible, and
  * replayable bit-for-bit by the DuckDB oracle (both engines emit
  * lowercase-hex MD5), unlike `rand()` which is neither.
  */
object Shards {

  /** Deterministic global shuffle + sharding: order every row by
    * `shuffle_key = md5(seed:id)` (a seeded pseudo-random permutation —
    * change the seed, get an independent shuffle), cut the permuted
    * stream into `nShards` NTILE buckets (sizes differ by at most one —
    * balanced shards, the property shard writers want), and number rows
    * within their shard.
    *
    * The in-shard `row_number` window partitions by shard — `nShards`
    * concurrent sorts, never a global one; for huge corpora pick
    * `nShards` ≥ the cluster's parallelism and the per-shard sort is
    * also the shard's write order.
    */
  def shardShuffle(docs: DataFrame, idCol: String, nShards: Int,
                   seed: String): DataFrame = {
    require(nShards > 0, s"shardShuffle needs a positive shard count, got $nShards")
    val keyed = docs.withColumn("shuffle_key",
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
    val order = Seq(col("shuffle_key"), col(idCol))
    Ranking.ntileExact(keyed, nShards, order, "shard")
      .withColumn("seq_in_shard",
        row_number().over(Window.partitionBy(col("shard")).orderBy(order: _*))
          .cast("long"))
      .withColumn("shard", col("shard").cast("long"))
  }

  /** Fixed-token-budget greedy selection ("ship the best `budget`
    * tokens"): lay documents on one stream in (score DESC, id) order via
    * [[Pack.packSequences]]' distributed prefix sums and keep every
    * document whose first token lands before the budget line — exactly
    * the take-highest-quality-until-full rule, computed without a global
    * window. The last kept document may straddle the line (`cut = true`);
    * the caller decides whether to truncate or keep it whole.
    *
    * Emits all input columns plus `cum_before` (tokens shipped ahead of
    * this document), `kept`, and `cut`.
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, tokensCol: String,
                        scoreCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudgetSelect needs a positive budget, got $budget")
    Pack.packSequences(docs, idCol, tokensCol, budget,
        Seq(col(scoreCol).desc, col(idCol)))
      .withColumnRenamed("start_token", "cum_before")
      .withColumn("kept", col("cum_before") < budget)
      .withColumn("cut", col("kept") &&
        col("cum_before") + coalesce(col(tokensCol).cast("long"), lit(0L))
          > budget)
      .drop("seq_first", "seq_last", "offset_in_seq")
  }

  /** Rendezvous (highest-random-weight) shard assignment: every row
    * scores each shard with `md5(seed:shard:id)` and joins the shard it
    * scores highest (Thaler–Ravishankar HRW hashing). ZERO shuffle — the
    * candidate weights live in one per-row array, so the plan is scan →
    * project — and, unlike `ntile`/mod sharding, RESIZING is minimally
    * disruptive: growing `nShards` by one reassigns only the rows the
    * NEW shard now wins, ≈ 1/(n+1) of the corpus, while every other row
    * keeps its shard (the consistent-hashing property that makes
    * incremental re-sharding of a 100 TB corpus an append, not a
    * rewrite).
    *
    * Balance is statistical (multinomial, not exact-equal like
    * [[shardShuffle]]); determinism is total — no tie can exist because
    * two distinct shard ids cannot produce the same 128-bit digest for
    * one row.
    */
  def rendezvousShard(docs: DataFrame, idCol: String, nShards: Int,
                      seed: String): DataFrame = {
    require(nShards > 0, s"rendezvousShard needs a positive shard count, got $nShards")
    val ws = transform(sequence(lit(0), lit(nShards - 1)),
      s => md5(concat(lit(seed), lit(":"), s.cast("string"), lit(":"),
        col(idCol).cast("string"))))
    docs.withColumn("__ws", ws)
      .withColumn("rdv_weight", array_max(col("__ws")))
      .withColumn("shard",
        (array_position(col("__ws"), col("rdv_weight")) - 1).cast("long"))
      .drop("__ws")
  }

  /** Per-group adaptive quality gate (the RefinedWeb/FineWeb move of
    * thresholding quality PER LANGUAGE or PER DOMAIN instead of
    * globally, so a verbose domain cannot starve a terse one): inside
    * each group, rank rows by (score, id) and keep the top `1 - q`
    * fraction by `percent_rank`. One hash exchange on the group column;
    * the window sort runs per group in parallel — group count is the
    * parallelism, fine for domain/language grains (hundreds to
    * millions of groups), NOT for a single global group (use
    * [[tokenBudgetSelect]] or [[Ranking.ntileExact]] there).
    *
    * The id tiebreak makes every rank — and therefore the kept set —
    * deterministic and oracle-replayable even with duplicate scores.
    */
  def adaptiveQualityGate(docs: DataFrame, groupCol: String, idCol: String,
                          scoreCol: String, q: Double): DataFrame = {
    require(q >= 0 && q < 1, s"adaptiveQualityGate needs q in [0,1), got $q")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    // kept compares the RAW rank (the rounded q_rank is display-grade;
    // gating on it would let a 0.2499999 rank round its way over the bar)
    docs.withColumn("__pr", percent_rank().over(w))
      .withColumn("q_rank", round(col("__pr"), 6))
      .withColumn("kept", col("__pr") >= q)
      .drop("__pr")
  }
}

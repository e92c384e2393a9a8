package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** EXACT set-similarity self-join with prefix filtering — the
  * lossless complement of the MinHash/LSH near-dup family: every pair
  * of documents whose token-SET Jaccard meets the threshold, no
  * probabilistic recall, no banding misses. The classic prefix-filter
  * framework (Chaudhuri et al. 2006's SSJoin / Xiao et al.'s PPJoin
  * family, both published): under a GLOBAL total token order, a pair
  * with J(A,B) ≥ t must share a token inside each side's first
  * |x| − ⌈t·|x|⌉ + 1 tokens — pigeonhole: J ≥ t forces
  * |A∩B| ≥ ⌈t·|x|⌉, which cannot hide entirely in a suffix of length
  * ⌈t·|x|⌉ − 1 — so the equi-join on PREFIX tokens generates a
  * candidate superset and an exact intersection count verifies.
  *
  * Scale shape: the global order is (df ASC, token ASC) — prefixes hold
  * each document's globally RAREST tokens, so prefix-token join buckets
  * are naturally small (a token shared by many docs has high df and
  * falls out of prefixes); candidate generation is an equi-join of
  * prefix rows with a length filter (t·|a| ≤ |b| ≤ |a|/t) folded in;
  * verification joins the candidate pairs back to the full distinct-token
  * sets — O(candidates × set size), output-sensitive like every exact
  * algorithm (identical-corpus worst case IS the output). Per-doc token
  * ranks come from a window partitioned BY DOCUMENT — partition-parallel,
  * no global sort. The threshold is an integer percentage and the accept
  * test is cross-multiplied integer arithmetic (`100·i ≥ t·(|a|+|b|−i)`),
  * so acceptance is exact — the only float is the REPORTED jaccard, one
  * division rounded to 6 (the oracle-compare convention).
  */
object SetJoin {

  /** All pairs (id_a < id_b) with token-set Jaccard ≥ t100/100, as
    * `(id_a, id_b, isect, union_size, jaccard)`.
    */
  def jaccardSelfJoin(docs: DataFrame, idCol: String, textCol: String,
                      t100: Int): DataFrame = {
    require(t100 >= 1 && t100 <= 100,
      s"jaccardSelfJoin threshold is an integer percent in [1, 100], got $t100")
    val sets = docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(Text.tokens(lower(col(textCol))))).as("__w"))
    val lens = sets.groupBy(col("__id")).agg(count(lit(1)).as("__len"))
    val dfs = sets.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
    // global order (df, token); per-doc rank over it -> prefix rows.
    // ceil(t*len) in exact integer arithmetic: floor((t100*len + 99)/100)
    // — Column./ is IEEE double division, so floor() restores the
    // integer-division semantics (exact: t100*len + 99 << 2^53).
    val ceilTLen = floor((lit(t100) * col("__len") + 99) / 100).cast("long")
    val byRarity = Window.partitionBy(col("__id"))
      .orderBy(col("__df"), col("__w"))
    val prefixes = sets.join(dfs, "__w")
      .withColumn("__rn", row_number().over(byRarity))
      .join(lens, "__id")
      .filter(col("__rn") <= col("__len") - ceilTLen + 1)
      .select(col("__id"), col("__w"), col("__len"))
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.__w") === col("b.__w") && col("a.__id") < col("b.__id") &&
          // length filter: t|a| <= |b| and t|b| <= |a| (integer cross-mult)
          lit(t100) * col("a.__len") <= lit(100) * col("b.__len") &&
          lit(t100) * col("b.__len") <= lit(100) * col("a.__len"))
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb"))
      .distinct()
    val isect = cands
      .join(sets.select(col("__id").as("__ida"), col("__w")), "__ida")
      .join(sets.select(col("__id").as("__idb"), col("__w")), Seq("__idb", "__w"))
      .groupBy(col("__ida"), col("__idb")).agg(count(lit(1)).as("isect"))
    isect
      .join(lens.select(col("__id").as("__ida"), col("__len").as("__la")), "__ida")
      .join(lens.select(col("__id").as("__idb"), col("__len").as("__lb")), "__idb")
      .withColumn("union_size", col("__la") + col("__lb") - col("isect"))
      .filter(lit(100) * col("isect") >= lit(t100) * col("union_size"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("isect"), col("union_size"),
        round(col("isect").cast("double") / col("union_size"), 6).as("jaccard"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concatenate-and-chunk assignment every LLM
  * pretraining pipeline runs before training: documents are laid out on
  * one global token stream in a deterministic total order and chunked
  * into fixed `budget`-token training sequences. Each document learns
  * which sequence its first token lands in, which its last token lands
  * in (long documents straddle sequence boundaries), and its offset
  * inside the first sequence.
  *
  * Scale shape is the [[Ranking.ntileExact]] machinery: range-repartition
  * on the order key, per-partition token prefix sums (parallel windows
  * keyed by partition id — never a single-partition window), and
  * per-partition token-total offsets prefix-summed on the driver
  * (≤ shuffle-partitions rows — bounded partition METADATA, the
  * ntileExact collect class, never data rows). A 100 TB corpus pays one
  * range exchange and parallel partition sorts; all arithmetic is
  * integral (`div`/`%`), so there is no float rounding at chunk edges.
  */
object Pack {

  /** Per-document packing positions over a fixed token budget.
    *
    * @param order  total-order sort expressions (include a unique
    *               tiebreaker — the ntileExact determinism contract)
    * @return input columns + `start_token` (global 0-based offset of the
    *         document's first token), `seq_first`, `seq_last` (0-based
    *         sequence ids; a zero-token document occupies no tokens and
    *         gets seq_last = seq_first), and `offset_in_seq`
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    budget: Long, order: Seq[Column]): DataFrame = {
    require(budget > 0, s"packSequences needs a positive token budget, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    // null OR negative token counts clamp to 0: a negative count would
    // silently shrink every later start offset and make seq_last <
    // seq_first (a DESCENDING sequence() span in sequenceStats) —
    // corrupt layout, no error (code-review r7)
    val based = docs.withColumn("__tok",
      greatest(lit(0L), coalesce(col(tokensCol).cast("long"), lit(0L))))
    val ranged = graft.util.Caches.retain(
      based.repartitionByRange(order: _*)
        .withColumn("__pid", spark_partition_id())
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val partTotals = ranged.groupBy(col("__pid"))
      .agg(sum(col("__tok")).as("__t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = partTotals.map { case (pid, t) =>
      val o = (pid, acc); acc += t; o
    }.toSeq
    val offs = spark.createDataset(offsets).toDF("__pid", "__poff")
    val prefixW = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offs), "__pid")
      .withColumn("start_token",
        col("__poff") + coalesce(sum(col("__tok")).over(prefixW), lit(0L)))
      .withColumn("seq_first", expr(s"start_token div ${budget}L"))
      .withColumn("seq_last",
        when(col("__tok") > 0,
          expr(s"(start_token + __tok - 1L) div ${budget}L"))
          .otherwise(expr(s"start_token div ${budget}L")))
      .withColumn("offset_in_seq", expr(s"start_token % ${budget}L"))
      .drop("__tok", "__pid", "__poff")
  }

  /** Per-sequence roll-up of a [[packSequences]] frame: how many documents
    * touch each training sequence, how many START in it, the exact token
    * fill, and the fill fraction. One explode over each document's
    * (seq_first .. seq_last) span — output-sensitive, a document costs one
    * row per sequence it touches — then a single hash aggregation.
    */
  def sequenceStats(packed: DataFrame, tokensCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, s"sequenceStats needs a positive token budget, got $budget")
    val toks = greatest(lit(0L), coalesce(col(tokensCol).cast("long"), lit(0L)))
    val spanned = packed
      .select(toks.as("__tok"), col("start_token"), col("seq_first"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .withColumn("__in_seq",
        least((col("seq") + 1) * budget, col("start_token") + col("__tok")) -
          greatest(col("seq") * budget, col("start_token")))
    spanned.groupBy(col("seq")).agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("seq") === col("seq_first"), 1L).otherwise(0L)).as("n_starts"),
      sum(col("__in_seq")).as("seq_tokens"))
      .withColumn("fill_frac",
        round(col("seq_tokens").cast("double") / budget, 6))
  }

  /** Per-sequence ATTENTION-BOUNDARY masks over a [[packSequences]]
    * layout — the cu_seqlens-style offsets a trainer needs to mask
    * attention block-diagonally so packed documents cannot attend to
    * each other: for every training sequence, the sorted offsets where
    * a document SEGMENT begins (a document starting inside the sequence
    * begins at its pack offset; a document CONTINUING from the previous
    * sequence begins a fresh block at 0). Offsets are unique within a
    * sequence by construction, so the sorted set is the exact mask;
    * serialized as a flat space-joined string (the bpeSegment exact-
    * compare convention). One explode over each document's sequence
    * span — the [[sequenceStats]] grain — then a per-sequence collect
    * of at most (docs-touching-the-sequence) offsets: bounded by the
    * budget, never by the corpus.
    */
  def attentionMasks(packed: DataFrame, tokensCol: String,
                     budget: Long): DataFrame = {
    require(budget > 0, s"attentionMasks needs a positive token budget, got $budget")
    packed
      .filter(coalesce(col(tokensCol).cast("long"), lit(0L)) > 0)
      .select(col("offset_in_seq"), col("seq_first"),
        explode(sequence(col("seq_first"), col("seq_last"))).as("seq"))
      .select(col("seq"),
        when(col("seq") === col("seq_first"), col("offset_in_seq"))
          .otherwise(lit(0L)).as("__boundary"))
      .groupBy(col("seq"))
      .agg(sort_array(collect_set(col("__boundary"))).as("__bs"))
      .select(col("seq"),
        size(col("__bs")).as("n_segments"),
        array_join(transform(col("__bs"), b => b.cast("string")), " ")
          .as("boundaries"))
  }
}

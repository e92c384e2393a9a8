package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Text

/** Cross-document duplicated-passage detection and removal — exact
  * substring dedup at token-window grain (the "remove all but one
  * occurrence of any repeated passage" pass of LLM corpus curation, in the
  * spirit of Lee et al. 2021, "Deduplicating Training Data Makes Language
  * Models Better"). Where [[Dedup.exact]] and the MinHash family act at
  * WHOLE-document grain, this family finds passages shared ACROSS (or
  * repeated WITHIN) documents that are otherwise distinct — boilerplate
  * headers, license blocks, quoted excerpts — and removes every occurrence
  * except one canonical copy.
  *
  * Mechanics: every w-token sliding window (stride 1) of every document is
  * hashed (xxhash64 of the space-joined window — hashed immediately after
  * the explode, so only 8-byte longs ever shuffle, never window strings);
  * a window value that occurs in ≥ `minDocs` distinct documents is
  * duplicated. Its canonical occurrence is the lexicographically smallest
  * (doc, pos) pair; all other occurrences are foreign. Overlapping or
  * adjacent duplicated windows merge into maximal token spans
  * (gaps-and-islands over a per-document running max — one window pass per
  * document, no self-join).
  *
  * Scale contract: candidate discovery is ONE hash-keyed aggregation
  * (shuffle = one long per window occurrence, partial-aggregated map-side
  * is impossible for the distinct count, but the key space is bounded by
  * total windows); flagging back is an equi-join on the hash where the
  * flagged side is distinct — no fan-out, output ≤ input. Span merging
  * partitions by document. No crossJoin, no driver-side state; a 100 TB
  * corpus shuffles O(total tokens) longs, exactly like the MinHash shingle
  * pass it sits beside.
  */
object Passages {

  /** The per-row window-hash primitive behind [[windowOccurrences]], for
    * SQL users (graft_window_hashes) and custom pipelines: xxhash64 of
    * every w-token sliding window of an ALREADY-projected token array
    * (see [[Text.shinglesFromTokens]]'s materialization warning), index i
    * = window at token position i+1; fewer than w tokens → empty array.
    */
  def windowHashesExpr(ts: Column, w: Int): Column = {
    require(w >= 2, s"passage window must be at least 2 tokens, got $w")
    // null-safe guard (code-review r8): size(NULL) is NULL, which would
    // fall through to a NULL result instead of the documented empty array
    when(coalesce(size(ts), lit(0)) < w, array().cast("array<bigint>"))
      .otherwise(transform(Text.shinglesFromTokens(ts, w), s => xxhash64(s)))
  }

  /** One row per (doc, window position): `pos` (1-based token index) and
    * `win_hash` (xxhash64 of the w-token window). Documents shorter than w
    * tokens contribute no windows. Tokens materialize once per document
    * before the shingle lambda reads them (see
    * [[Text.shinglesFromTokens]]'s O(tokens²) warning).
    */
  def windowOccurrences(docs: DataFrame, idCol: String, textCol: String,
                        w: Int): DataFrame = {
    require(w >= 2, s"passage window must be at least 2 tokens, got $w")
    docs
      .select(col(idCol), Text.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= w)
      .select(col(idCol),
        posexplode(Text.shinglesFromTokens(col("__toks"), w)))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"),
        xxhash64(col("col")).as("win_hash"))
  }

  /** Window occurrences that are duplicated (their hash occurs in ≥
    * `minDocs` distinct documents), each annotated with its canonical
    * owner: `owner_id`/`owner_pos` = the smallest (doc, pos) occurrence.
    * The flagged-hash side of the join is one row per hash, so the join
    * cannot fan out.
    */
  def duplicatedWindows(docs: DataFrame, idCol: String, textCol: String,
                        w: Int, minDocs: Int): DataFrame =
    duplicatedWindowsFromOcc(windowOccurrences(docs, idCol, textCol, w),
      idCol, minDocs)

  /** [[duplicatedWindows]] over a PRECOMPUTED occurrence frame — so
    * callers that already hold one ([[cleanIncremental]]'s registry
    * probe) don't pay the tokenize + shingle + hash explode twice
    * (code-review r8).
    */
  def duplicatedWindowsFromOcc(occ: DataFrame, idCol: String,
                               minDocs: Int): DataFrame = {
    val flagged = occ
      .groupBy(col("win_hash"))
      .agg(countDistinct(col(idCol)).as("__nd"),
        min(struct(col(idCol).as("id"), col("pos").as("pos"))).as("__own"))
      .filter(col("__nd") >= minDocs)
      .select(col("win_hash"), col("__own.id").as("owner_id"),
        col("__own.pos").as("owner_pos"))
    occ.join(flagged, "win_hash")
  }

  /** Merge a frame of duplicated window positions (idCol, pos) into
    * maximal spans per document: windows at p cover tokens [p, p+w−1];
    * overlapping or adjacent covers fuse. Output: (idCol, span_start,
    * span_end, span_tokens).
    */
  private def mergeSpans(occ: DataFrame, idCol: String, w: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val prevEnd = max(col("pos") + (w - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    occ
      .withColumn("__brk",
        when(prevEnd.isNull || col("pos") > prevEnd + 1, 1).otherwise(0))
      .withColumn("__g", sum(col("__brk")).over(byDoc))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (w - 1)).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Report of every duplicated passage in every document (canonical
    * occurrences included — the report answers "what is duplicated
    * where"; [[removePassages]] is the one that spares the canonical
    * copy). One row per maximal span: (idCol, span_start, span_end,
    * span_tokens), token indices 1-based inclusive.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      w: Int = 8, minDocs: Int = 2): DataFrame =
    mergeSpans(
      duplicatedWindows(docs, idCol, textCol, w, minDocs)
        .select(col(idCol), col("pos")),
      idCol, w)

  /** Remove every FOREIGN duplicated passage (all occurrences except the
    * canonical smallest-(doc, pos) one) and return (idCol, textCol) with
    * the surviving text. Documents with no foreign span pass through with
    * their ORIGINAL text (whitespace untouched); documents that lose a
    * span are re-joined from their kept tokens with single spaces. The
    * per-document span list is bounded by doc length, so the token filter
    * HOF is O(tokens × spans) per document — per-partition work, nothing
    * global.
    */
  def removePassages(docs: DataFrame, idCol: String, textCol: String,
                     w: Int = 8, minDocs: Int = 2): DataFrame = {
    val foreign = duplicatedWindows(docs, idCol, textCol, w, minDocs)
      .filter(!(col(idCol) === col("owner_id") &&
        col("pos") === col("owner_pos")))
      .select(col(idCol), col("pos"))
    cleanByForeign(docs, idCol, textCol, foreign, w)
  }

  /** Strip the spans covered by a frame of FOREIGN window positions
    * (idCol, pos) from the documents — the shared removal tail of
    * [[removePassages]] and [[cleanIncremental]].
    */
  private def cleanByForeign(docs: DataFrame, idCol: String, textCol: String,
                             foreignOcc: DataFrame, w: Int): DataFrame = {
    val spans = mergeSpans(foreignOcc, idCol, w)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    docs.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        when(col("__spans").isNull, col(textCol))
          .otherwise(concat_ws(" ",
            filter(Text.tokens(col(textCol)), (t, i) =>
              !exists(col("__spans"), s =>
                i + 1 >= s("span_start") && i + 1 <= s("span_end")))))
          .as(textCol))
  }

  /** Corpus-level duplication profile — the curation-dashboard read over
    * [[duplicatedSpans]]: how much of the corpus sits inside duplicated
    * passages. One row: documents with ≥1 duplicated span, total span
    * tokens, total corpus tokens, and the 6-rounded ratio (ONE division).
    * Span totals aggregate the span report (output-sized); corpus tokens
    * are one `size()` aggregation over the docs.
    */
  def duplicationProfile(docs: DataFrame, idCol: String, textCol: String,
                         w: Int = 8, minDocs: Int = 2): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, w, minDocs)
    val spanAgg = spans.agg(
      countDistinct(col(idCol)).as("docs_with_dups"),
      coalesce(sum(col("span_tokens")), lit(0L)).as("dup_tokens"))
    val tokAgg = docs.agg(
      coalesce(sum(size(Text.tokens(col(textCol)))), lit(0L))
        .as("total_tokens"))
    spanAgg.crossJoin(tokAgg)
      .select(col("docs_with_dups"), col("dup_tokens"), col("total_tokens"),
        when(col("total_tokens") > 0,
          round(col("dup_tokens").cast("double") /
            col("total_tokens").cast("double"), 6)).as("dup_token_ratio"))
  }

  /** Incremental (daily-ingest) passage dedup against a REGISTRY of
    * previously-seen window hashes: an occurrence is foreign when its
    * window was registered by ANY earlier ingest (the earlier corpus owns
    * it — all of today's occurrences strip, even "canonical" ones), or
    * when today's batch itself duplicates it across ≥ `minDocs` docs (then
    * the intra-batch canonical smallest-(doc, pos) occurrence survives,
    * exactly like [[removePassages]]). Returns (cleaned docs, the batch's
    * distinct NEW window hashes to append to the registry).
    *
    * Scale contract: the registry carries 8-byte hashes, never text; the
    * registry probe is a semi-join on the hash (broadcast- or
    * shuffle-hash-joinable), today's intra-batch pass touches only
    * today's windows, and the new-hash frame is `except`-free (one
    * left-anti join). Per-ingest cost is O(today's tokens + matching
    * registry partitions) — the incremental form a 100 TB daily pipeline
    * actually runs, where re-running [[removePassages]] over the full
    * archive would rescan everything.
    */
  def cleanIncremental(newDocs: DataFrame, idCol: String, textCol: String,
                       registry: DataFrame, w: Int = 8,
                       minDocs: Int = 2): (DataFrame, DataFrame) = {
    val occ = windowOccurrences(newDocs, idCol, textCol, w)
    val regForeign = occ
      .join(registry.select(col("win_hash")), Seq("win_hash"), "left_semi")
      .select(col(idCol), col("pos"))
    val intraForeign = duplicatedWindowsFromOcc(occ, idCol, minDocs)
      .filter(!(col(idCol) === col("owner_id") &&
        col("pos") === col("owner_pos")))
      .select(col(idCol), col("pos"))
    val foreign = regForeign.unionByName(intraForeign).distinct()
    val newHashes = occ.select(col("win_hash")).distinct()
      .join(registry.select(col("win_hash")), Seq("win_hash"), "left_anti")
    (cleanByForeign(newDocs, idCol, textCol, foreign, w), newHashes)
  }
}

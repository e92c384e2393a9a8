package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — for each left row, the single right row
  * with the greatest timestamp ≤ the left row's timestamp, per key. The
  * training-data staple the reference has no analogue for: features must
  * reflect the dimension's state AT event time, not its current state
  * (otherwise label leakage).
  *
  * NOT implemented as a range join (left ⋈ right ON key ∧ rts ≤ lts, then
  * argmax): that intermediate is |left| × |matching right versions| — at
  * 100 TB a slowly-changing dimension with hundreds of versions per key
  * multiplies the event table by the version count. Instead, the
  * union-and-scan shape: tag both inputs, union them (narrow), and run ONE
  * window pass partitioned by key and ordered by time —
  * `last(…, ignoreNulls)` over the preceding frame carries the latest
  * right-version forward onto every left row. Cost: a single
  * hash-partition shuffle of |left| + |right| rows and a per-partition
  * sort, independent of version density (the running `last` keeps one
  * value; no per-row frame re-scan).
  *
  * Tie semantics are deterministic: a right row AT exactly the left's
  * timestamp matches (≤, right sorts before left at equal time), and among
  * right rows sharing the as-of timestamp the greatest `rightTiebreak`
  * wins (sorts last in the window order, so the running `last` holds it).
  */
object AsOf {

  /** Join `left` (key, ts, payload…) to the as-of version of `right`
    * (key, ts, tiebreak, carried…). Returns every left row plus the
    * `carried` columns of its match, renamed `asof_<c>` — null when the
    * key has no right row at or before the left timestamp. The carried
    * columns travel as ONE struct, so they always come from the same
    * right row even when some carried field is null.
    */
  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               rightTiebreak: String, carried: Seq[String]): DataFrame =
    asofImpl(left, leftKey, leftTs, right, rightKey, rightTs, rightTiebreak,
      carried, forward = false, prefix = "asof_")

  /** The FORWARD as-of join: for each left row, the single right row with
    * the SMALLEST timestamp ≥ the left row's timestamp, per key — the
    * label-attribution staple ("the next order after this event"), where
    * the backward form is the feature staple. Same union-and-one-window
    * shape and cost; carried columns come back as `next_<c>`. Ties: a
    * right row AT exactly the left timestamp matches, and among right
    * rows sharing the as-of timestamp the SMALLEST `rightTiebreak` wins
    * (the mirror of the backward form's greatest-wins).
    */
  def asofJoinForward(left: DataFrame, leftKey: String, leftTs: String,
                      right: DataFrame, rightKey: String, rightTs: String,
                      rightTiebreak: String, carried: Seq[String]): DataFrame =
    asofImpl(left, leftKey, leftTs, right, rightKey, rightTs, rightTiebreak,
      carried, forward = true, prefix = "next_")

  private def asofImpl(left: DataFrame, leftKey: String, leftTs: String,
                       right: DataFrame, rightKey: String, rightTs: String,
                       rightTiebreak: String, carried: Seq[String],
                       forward: Boolean, prefix: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val carriedType = StructType(carried.map(c => right.schema(c)))
    // SQL join semantics: a null key matches nothing — without this filter
    // null-key versions would land in the null window partition and "match"
    // null-key left rows
    val rightKeyed = right.filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
    val l = left.select(
      Seq(col(leftKey).as("__key"), col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(right.schema(rightTiebreak).dataType).as("__tie"),
        lit(null).cast(carriedType).as("__r")) ++ leftCols.map(col): _*)
    val r = rightKeyed.select(
      Seq(col(rightKey).as("__key"),
        col(rightTs).cast(left.schema(leftTs).dataType).as("__ts"),
        lit(0).as("__side"), col(rightTiebreak).as("__tie"),
        struct(carried.map(col): _*).as("__r")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // forward mirrors the scan: descending time, rights still sort before
    // lefts at equal time (≥ matches), descending tie so the running
    // `last` holds the SMALLEST tiebreak of the nearest-following version.
    // desc_nulls_first, NOT desc (code-review r8): plain desc puts NULLs
    // last, so a null-ts left row would sort after every right row and
    // spuriously "match" the earliest version — nulls must scan first in
    // both directions (asc already defaults to nulls-first), matching the
    // backward form and SQL's NULL >= anything = no match; likewise a
    // null tiebreak must lose the exact-time tie in both directions.
    val w = Window.partitionBy(col("__key"))
      .orderBy(
        (if (forward)
          Seq(col("__ts").desc_nulls_first, col("__side"),
            col("__tie").desc_nulls_first)
        else Seq(col("__ts"), col("__side"), col("__tie"))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col(s"__last.$c").as(s"$prefix$c")): _*)
  }
}

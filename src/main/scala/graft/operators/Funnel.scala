package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the conversion read (signup → click →
  * purchase) of product analytics: a user reaches step k at their
  * EARLIEST event of that step's type STRICTLY AFTER their step-(k-1)
  * time, so out-of-order events (a purchase before the click) never
  * advance the funnel.
  *
  * Scale shape: one filtered aggregation per step, each shuffled on
  * the user key (the exchange is reused down the chain), joined to the
  * previous step's O(users) time frame — no per-user event buffers, no
  * window over a user's whole history, and the event stream is
  * filtered to one step's type before every shuffle. Times compare as
  * integer epoch MICROS (`unix_micros`) — the parquet nanos floor to
  * the same integers in any engine, where raw timestamp comparisons
  * can disagree in the last three digits.
  */
object Funnel {

  /** Per-user step-reach times: one row per (user, reached step) with
    * the step index (1-based), name, and epoch-micros time.
    */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelTimes needs at least one step")
    require(steps.distinct == steps, s"duplicate funnel steps: $steps")
    val ev = events.select(col(userCol).as("user"), col(typeCol).as("tp"),
      unix_micros(col(tsCol)).as("t"))
    var cur = ev.filter(col("tp") === steps.head)
      .groupBy(col("user")).agg(min(col("t")).as("t"))
    var acc = cur.select(col("user"), lit(1).as("step"),
      lit(steps.head).as("step_name"), col("t"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      cur = ev.filter(col("tp") === st)
        .join(cur.select(col("user"), col("t").as("__prev")), "user")
        .filter(col("t") > col("__prev"))
        .groupBy(col("user")).agg(min(col("t")).as("t"))
      acc = acc.unionByName(cur.select(col("user"), lit(i + 1).as("step"),
        lit(st).as("step_name"), col("t")))
    }
    acc
  }

  /** The conversion report: users reaching each step — ONE row per
    * step, including a zero count for a step no user reached (a dead
    * step silently missing from the report would read as "not
    * measured", not "converted nobody" — code-review r7). Counts are
    * monotone non-increasing by construction.
    */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    import events.sparkSession.implicits._
    val all = steps.zipWithIndex.map { case (n, i) => (i + 1, n) }
      .toDF("step", "step_name")
    val reached = funnelTimes(events, userCol, typeCol, tsCol, steps)
      .groupBy(col("step"), col("step_name"))
      .agg(count(lit(1)).as("n_users"))
    all.join(reached, Seq("step", "step_name"), "left")
      .select(col("step"), col("step_name"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Cohort retention: users grouped by their FIRST-activity week (ISO
    * Monday truncation), counted active in each later week, reported
    * long-form as (cohort_week, weeks_since, n_active). Weeks diff as
    * integral day-diff div 7 — exact, both weeks being Monday-aligned.
    * Two user-keyed aggregations (the distinct week frame and the
    * first-week frame share the exchange) and one bounded rollup; the
    * per-user state is the O(weeks-active) distinct-week frame, never
    * raw events.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val weekly = events.select(col(userCol).as("user"),
        to_date(date_trunc("week", col(tsCol))).as("wk"))
      .distinct()
    val firstWk = weekly.groupBy(col("user")).agg(min(col("wk")).as("cohort_week"))
    weekly.join(firstWk, "user")
      .select(col("cohort_week"),
        expr("datediff(wk, cohort_week) div 7").as("weeks_since"))
      .groupBy(col("cohort_week"), col("weeks_since"))
      .agg(count(lit(1)).as("n_active"))
  }
}

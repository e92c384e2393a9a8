package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TestdataAdapter
import graft.transform.Kpis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * over the driver testdata (FIXTURES.md §B mapping), with a DuckDB oracle
  * twin in `oracleSql` where SQL-expressible. Column names/aliases match
  * between the Spark result and the oracle; every result has a canonical
  * full-key ORDER BY; double aggregates go through exact decimal sums
  * (graft.transform.Kpis.moneySum) so both engines produce bit-identical
  * values.
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

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 — category-level daily KPIs (reference transform.py:348-352).
    // No orderBy: Verify applies the canonical sort at dump time; the
    // benched plan stays sort-free (VERDICT r01 #3).
    "a1_category_kpis" -> ((s, dir) => Kpis.categoryKpis(enriched(s, dir))),
    // A2 — order-level daily KPIs (reference transform.py:359-365)
    "a2_daily_kpis" -> ((s, dir) => Kpis.dailyKpis(enriched(s, dir)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
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
         GROUP BY 1 ORDER BY 1"""
  )
}

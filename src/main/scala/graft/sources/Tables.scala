package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources — SURVEY.md §2.1.
  *
  * The reference reads whole objects into memory (CSV via pandas, reference
  * glue_job.py:169-170; parquet via pyarrow, validate.py:207-210). Here every
  * read stays a distributed, lazily-planned scan so Catalyst can push filters
  * and prune columns down to the parquet footer.
  */
object Tables {

  /** S2: multi-file parquet scan (reference transform.py:286-295 reads a
    * *list* of parquet paths as one relation). The planning-time metadata
    * read (file listing + footer) is retried with backoff — the analogue of
    * the reference's S3 retry decorator (validate.py:84-104); task-level
    * read failures are already retried by Spark's scheduler.
    */
  def parquet(spark: SparkSession, paths: Seq[String]): DataFrame =
    graft.util.Retry.withBackoff() { spark.read.parquet(paths: _*) }

  /** S1: schema-declared CSV scan (reference glue_job.py:169-170 infers via
    * pandas; we declare the schema instead — no inference pass over the data).
    */
  def csv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S1 inference variant (reference glue_job.py:170 infers via pandas).
    * Costs an extra full pass over the files at planning time — prefer the
    * declared-schema [[csv]] on large inputs.
    */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S3: schema-only scan — footer read, no job (reference validate.py:184-187
    * reads just the parquet schema).
    */
  def parquetSchema(spark: SparkSession, path: String): StructType =
    graft.util.Retry.withBackoff() { spark.read.parquet(path).schema }

  /** S5: snappy parquet sink (reference glue_job.py:176-178). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "snappy").parquet(path)

  /** S6: partitioned overwrite sink (reference transform.py:338-339 writes
    * Delta partitioned by order_date; plain parquet here — see SURVEY.md §7.3).
    */
  def writePartitioned(df: DataFrame, partitionCol: String, path: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol)
      .option("compression", "snappy").parquet(path)

  /** Bucketed table writer — co-locates join keys at write time so later
    * equi-joins/aggregations on `key` run shuffle-free (both sides
    * pre-partitioned by the same bucketing function). The 100 TB lever for
    * repeatedly-joined fact tables; see BucketedJoinSpec for the
    * no-Exchange plan proof.
    */
  def writeBucketed(df: DataFrame, buckets: Int, key: String, table: String): Unit =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
      .option("compression", "snappy").saveAsTable(table)

  // ---- driver testdata tables (TESTDATA.md / FIXTURES.md §B) ----

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    parquet(spark, Seq(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events carries a nanosecond-precision timestamp, which Spark's parquet
    * reader rejects by default; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong` and this reader converts the
    * raw nanos back to a (microsecond) timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // newer testdata stores micros-precision NTZ timestamps; normalize
        // to the session-timezone (UTC everywhere here) instant type so
        // epoch arithmetic (unix_micros et al.) and every query behave
        // identically to the nanos-as-long era — the cast is wall-clock
        // preserving under a UTC session
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Re-targets the driver's TPC-H-ish testdata onto the reference's e-commerce
  * roles (FIXTURES.md §B): orders→orders, lineitem→order_items, part→products.
  * Pure column renames/derivations — stays inside the parquet scan projection,
  * so column pruning still reaches the reader.
  */
object TestdataAdapter {

  /** orders in reference shape: order_id, user_id, status, created_at. */
  def orders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("order_id"),
      col("o_custkey").as("user_id"),
      col("o_orderstatus").as("status"),
      col("o_orderdate").as("created_at")
    )

  /** order_items in reference shape; `is_returned` stands in for the
    * reference's `returned_at IS NOT NULL` flag (FIXTURES.md §B maps it to
    * `l_returnflag = 'R'`).
    */
  def orderItems(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).select(
      col("l_orderkey").as("order_id"),
      col("l_partkey").as("product_id"),
      col("l_linenumber").as("line_number"),
      col("l_extendedprice").as("sale_price"),
      col("l_quantity").as("quantity"),
      (col("l_returnflag") === "R").as("is_returned")
    )

  /** products in reference shape: id, category, name, brand, retail_price. */
  def products(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey").as("id"),
      col("p_type").as("category"),
      col("p_name").as("name"),
      col("p_brand").as("brand"),
      col("p_retailprice").as("retail_price")
    )
}

package graft.model

import org.apache.spark.sql.types._

/** Fixed by-name schemas for the engine's e-commerce data model.
  *
  * The reference infers types via `pd.read_csv` (reference
  * src/glue_scripts/glue_job.py:170) and only declares expected *column sets*
  * (glue_job.py:24-28, containers/validation/validate.py:31-35). We make the
  * schema explicit per SURVEY.md §1.2/§1.3: declared `StructType` per table,
  * by-name and order-insensitive, extra columns tolerated at validation time.
  */
object Schemas {

  /** orders — reference README.md:64, validate.py:31-47. */
  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false),
    StructField("returned_at", TimestampType, nullable = true),
    StructField("shipped_at", TimestampType, nullable = true),
    StructField("delivered_at", TimestampType, nullable = true),
    StructField("num_of_item", IntegerType, nullable = true)
  ))

  /** order_items — reference README.md:65, validate.py:32. */
  val orderItems: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("order_id", StringType, nullable = false),
    StructField("user_id", StringType, nullable = false),
    StructField("product_id", StringType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = true),
    StructField("shipped_at", TimestampType, nullable = true),
    StructField("delivered_at", TimestampType, nullable = true),
    StructField("returned_at", TimestampType, nullable = true),
    StructField("sale_price", DoubleType, nullable = true)
  ))

  /** products — reference README.md:66, validate.py:33. */
  val products: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("sku", StringType, nullable = false),
    StructField("cost", DoubleType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("brand", StringType, nullable = false),
    StructField("retail_price", DoubleType, nullable = true),
    StructField("department", StringType, nullable = true)
  ))

  val byTable: Map[String, StructType] =
    Map("orders" -> orders, "order_items" -> orderItems, "products" -> products)

  /** Valid order statuses — the reference applies the status whitelist to
    * orders only (validate.py:226-230); order_items gets sale_price >= 0 and
    * products gets cost/retail_price >= 0 instead (validate.py:231-238).
    */
  val validStatuses: Seq[String] =
    Seq("pending", "processing", "shipped", "delivered", "cancelled", "returned")

  /** Unique keys per table — reference validate.py:37-41. */
  val uniqueKeys: Map[String, Seq[String]] = Map(
    "orders" -> Seq("order_id"),
    "order_items" -> Seq("order_id", "product_id"),
    "products" -> Seq("id")
  )

  /** Required (non-null) columns per table — reference validate.py:43-47. */
  val requiredColumns: Map[String, Seq[String]] = Map(
    "orders" -> Seq("order_id", "user_id", "status", "created_at"),
    "order_items" -> Seq("id", "order_id", "user_id", "product_id", "status"),
    "products" -> Seq("id", "sku", "name", "brand")
  )
}

/** A file-arrival event — the distilled form of the reference's
  * S3-ObjectCreated→SQS→Lambda event (reference glue_job.py:152-162,
  * src/lambda/lambda2/lambda2.py:44-48). One element per landed file.
  */
case class FileEvent(path: String, tableType: String, arrivalTs: java.sql.Timestamp)

/** One violation found by the validation rule engine (SURVEY.md §2.7);
  * reference emits `{order_id, status, issues[]}` (validate.py:344-348).
  */
case class Violation(table: String, rule: String, column: String, detail: String)

/** Per-file validation report — reference validate.py:249-265. */
case class ValidationReport(path: String, table: String, passed: Boolean, issues: Seq[Violation])

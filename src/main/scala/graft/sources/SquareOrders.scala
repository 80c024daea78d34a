package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._

/** Source schema + readers for Square-style order documents.
  *
  * Shape per the reference connector's consumed fields
  * (`/root/reference/app/services/etl_service.py:496-522` fixture;
  * consumed at `etl_service.py:246-328`): an order with scalar fields and a
  * `line_items` array of structs with nested money structs and a
  * `modifiers` array. The schema is explicit — the reference relies on
  * fixed field expectations, not inference (SURVEY.md §1.3).
  *
  * `quantity` is deliberately STRING: the upstream API sends it as a
  * string; casting happens in the transform (etl_service.py:285).
  */
object SquareOrders {

  val moneySchema: StructType = StructType(Seq(
    StructField("amount", LongType),
    StructField("currency", StringType)))

  val modifierSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("base_price_money", moneySchema)))

  val lineItemSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("variation_name", StringType),
    StructField("quantity", StringType),
    StructField("base_price_money", moneySchema),
    StructField("gross_sales_money", moneySchema),
    StructField("modifiers", ArrayType(modifierSchema))))

  val orderSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("location_id", StringType),
    StructField("closed_at", StringType),
    StructField("state", StringType),
    StructField("line_items", ArrayType(lineItemSchema))))

  /** Parse a dataset of JSON order documents (one order per element).
    * Malformed documents surface as all-null rows (PERMISSIVE mode) and
    * are dropped by the transform's order-level validation. */
  def fromJson(spark: SparkSession, json: Dataset[String]): DataFrame =
    spark.read.schema(orderSchema).json(json)

  def fromJsonFile(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(orderSchema).json(path)

  /** The `locations` dimension (reference `README.md:108-114`):
    * id INT, name STRING, square_id STRING. */
  val locationsSchema: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("name", StringType),
    StructField("square_id", StringType)))
}

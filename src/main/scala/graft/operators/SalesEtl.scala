package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference ETL dataflow, re-expressed as one declarative Spark plan.
  *
  * Reference behavior (rromero09/analytics-etl):
  *  - orders missing `closed_at` are rejected and counted
  *    (`etl_service.py:247-250`);
  *  - orders with missing/empty `line_items` yield 0 rows (`:252-254`);
  *  - line items with `base_price_money.amount <= 0` are dropped
  *    (`:117-125`);
  *  - line items whose lowercased name CONTAINS any of
  *    "dine in"/"to go"/"free water" are dropped — substring, not equality
  *    (`:44-48`, `:127-133`);
  *  - invalid line items (null name, non-numeric or non-positive quantity,
  *    missing/negative gross amount) are skipped, not fatal (`:175-215`,
  *    `:276-280`);
  *  - `sale_price` = gross_sales_money (base + modifiers) cents / 100 as
  *    decimal dollars (`:290-292`; we keep DecimalType(12,2) end-to-end
  *    rather than reproducing the reference's float degradation at `:300`);
  *  - `modifiers` = ", "-joined names of modifiers with amount > 0, empty
  *    string when none (`:137-172`);
  *  - `month`/`day_of_week`/`sale_timestamp` derived in America/Chicago
  *    wall time (`:56-103`);
  *  - unknown `square_id` drops the order (`database_service.py:205-207`).
  *
  * Everything is built from codegen'd built-ins (explode, higher-order
  * array functions, date functions, broadcast hash join) — no UDFs — so
  * the whole transform stays inside WholeStageCodegen and scales linearly
  * with input splits. At 100 TB the only shuffle in this plan is the final
  * write's optional repartition; the dimension join is broadcast.
  */
object SalesEtl {

  /** The core output row (SURVEY.md §1.4: typed Dataset at the API
    * boundary). `sale_price` is BigDecimal — decimal end-to-end. */
  case class SalesRow(item_name: String, sale_price: java.math.BigDecimal,
      qty: Int, sale_timestamp: java.sql.Timestamp, month: String,
      day_of_week: String, item_category: String, location_id: Int,
      modifiers: String)

  /** Typed view of a resolved+validated sales frame. */
  def typed(sales: org.apache.spark.sql.DataFrame)
    : org.apache.spark.sql.Dataset[SalesRow] = {
    val spark = sales.sparkSession
    import spark.implicits._
    sales.as[SalesRow]
  }

  val ignoredNameParts: Seq[String] = Seq("dine in", "to go", "free water")
  val chicagoTz = "America/Chicago"
  private val dayNames = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  /** Order-level validation (reference `etl_service.py:247-250`):
    * keep orders that have a parseable `closed_at`. */
  def validOrders(orders: DataFrame): DataFrame =
    orders.filter(to_timestamp(col("closed_at")).isNotNull)

  /** Orders rejected at the order level, for quarantine accounting. */
  def rejectedOrders(orders: DataFrame): DataFrame =
    orders.filter(to_timestamp(col("closed_at")).isNull)

  private def ignoredName(name: Column): Column =
    ignoredNameParts.map(p => lower(name).contains(p)).reduce(_ || _)

  /** Core transform: nested order documents → flat sales rows.
    *
    * Output columns: order_id, square_location_id, item_name,
    * sale_price DECIMAL(12,2), qty INT, sale_timestamp (Chicago wall
    * time), month 'yyyy-MM', day_of_week 'Monday'.., item_category,
    * modifiers.
    */
  def toSalesRows(orders: DataFrame): DataFrame = {
    val localTs = from_utc_timestamp(to_timestamp(col("closed_at")), chicagoTz)
    // try_cast: ANSI-safe — non-numeric quantity yields null and the row
    // is quarantined (reference skips it), instead of failing the job.
    val qty = col("li.quantity").try_cast(IntegerType)
    val gross = col("li.gross_sales_money.amount")
    validOrders(orders)
      .select(
        col("id").as("order_id"),
        col("location_id").as("square_location_id"),
        localTs.as("sale_timestamp"),
        date_format(localTs, "yyyy-MM").as("month"),
        date_format(localTs, "EEEE").as("day_of_week"),
        // plain explode: empty/missing line_items => 0 rows
        explode(col("line_items")).as("li"))
      // F1 zero-price + F2 ignored-name (substring) + F3 domain validation
      .filter(col("li.base_price_money.amount") > 0)
      .filter(!ignoredName(col("li.name")))
      .filter(col("li.name").isNotNull && qty.isNotNull && qty > 0 &&
        gross.isNotNull && gross >= 0)
      .select(
        col("order_id"), col("square_location_id"),
        col("li.name").as("item_name"),
        (gross.cast(DecimalType(14, 2)) / 100).cast(DecimalType(12, 2))
          .as("sale_price"),
        qty.as("qty"),
        col("sale_timestamp"), col("month"), col("day_of_week"),
        coalesce(col("li.variation_name"), lit("N/A")).as("item_category"),
        coalesce(
          array_join(
            transform(
              filter(col("li.modifiers"), m => m("base_price_money")("amount") > 0),
              m => m("name")),
            ", "),
          lit("")).as("modifiers"))
  }

  /** J1: resolve Square location ids to internal ids via the (tiny)
    * locations dimension — broadcast hash join, no shuffle. Unknown
    * square_id drops the row (inner join), matching the reference. */
  def withLocations(sales: DataFrame, locations: DataFrame): DataFrame =
    sales
      .join(broadcast(locations),
        sales("square_location_id") === locations("square_id"), "inner")
      .select(sales("item_name"), sales("sale_price"), sales("qty"),
        sales("sale_timestamp"), sales("month"), sales("day_of_week"),
        sales("item_category"), locations("id").as("location_id"),
        sales("modifiers"))

  /** Left-join variant of [[withLocations]]: unknown-location rows are
    * KEPT and marked `_known = false`, so a caller can count (observe)
    * and drop them in the same pass instead of re-scanning the source
    * with an anti-join. `location_id` is null for unknown rows. */
  def withLocationsFlagged(sales: DataFrame, locations: DataFrame): DataFrame =
    sales
      .join(broadcast(locations),
        sales("square_location_id") === locations("square_id"), "left")
      .select(sales("item_name"), sales("sale_price"), sales("qty"),
        sales("sale_timestamp"), sales("month"), sales("day_of_week"),
        sales("item_category"), locations("id").as("location_id"),
        sales("modifiers"), locations("square_id").isNotNull.as("_known"))

  /** Audit of rows that would be dropped by [[withLocations]]. */
  def unknownLocations(sales: DataFrame, locations: DataFrame): DataFrame =
    sales.join(broadcast(locations),
      sales("square_location_id") === locations("square_id"), "left_anti")

  /** F4 output validation predicate (reference `etl_service.py:363-413`):
    * all fields present, non-negative price, positive qty, month matches
    * yyyy-MM, day_of_week is a real day name. */
  def isValidSalesRow: Column =
    col("item_name").isNotNull &&
      col("sale_price").isNotNull && col("sale_price") >= 0 &&
      col("qty").isNotNull && col("qty") > 0 &&
      col("sale_timestamp").isNotNull &&
      regexp_like(col("month"), lit("^\\d{4}-\\d{2}$")) &&
      col("day_of_week").isin(dayNames: _*)

  /** Split a sales frame into (valid, quarantined) without failing the
    * job — behavior-equivalent to the reference's log-and-skip. */
  def validate(sales: DataFrame): (DataFrame, DataFrame) =
    (sales.filter(isValidSalesRow), sales.filter(!isValidSalesRow))

  /** Full pipeline: raw order documents + locations dim → validated sales. */
  def run(orders: DataFrame, locations: DataFrame): DataFrame =
    validate(withLocations(toSalesRows(orders), locations))._1
}

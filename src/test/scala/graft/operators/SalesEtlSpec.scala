package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SquareOrders

/** Golden-order and edge-case specs for the sales ETL.
  *
  * The golden order and its expected output come from the reference's own
  * inline test (`/root/reference/app/services/etl_service.py:496-522`,
  * assertions at `:528-545`): 2 line items → 1 row, sale_price 6.65
  * (gross = base 5.65 + modifier 1.00), modifiers "Almond Milk",
  * "Dine In" filtered out.
  */
class SalesEtlSpec extends SparkSpec {
  import spark.implicits._

  private val goldenOrder =
    """{"id":"test_order_v1.1","location_id":"L5WST6KFZBT10",
      |"closed_at":"2025-11-24T13:27:45.163Z","line_items":[
      |{"name":"Iced Lavander latte","variation_name":"16 oz","quantity":"1",
      | "base_price_money":{"amount":565,"currency":"USD"},
      | "gross_sales_money":{"amount":665,"currency":"USD"},
      | "modifiers":[{"name":"Almond Milk","base_price_money":{"amount":100}}]},
      |{"name":"Dine In","variation_name":"N/A","quantity":"1",
      | "base_price_money":{"amount":0,"currency":"USD"},
      | "gross_sales_money":{"amount":0,"currency":"USD"}}]}"""
      .stripMargin.replace("\n", "")

  private val locations = Seq(
    (1, "Wrigleyville", "LWRIG000000001"),
    (2, "Current", "L5WST6KFZBT10"),
    (3, "Southport", "LSOUT000000003"))
    .toDF("id", "name", "square_id")

  private def orders(json: String*) =
    SquareOrders.fromJson(spark, spark.createDataset(json))

  test("golden order: 2 line items -> 1 row with exact reference semantics") {
    val out = SalesEtl.run(orders(goldenOrder), locations).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("item_name") === "Iced Lavander latte")
    assert(r.getAs[java.math.BigDecimal]("sale_price")
      .compareTo(new java.math.BigDecimal("6.65")) === 0)
    assert(r.getAs[Int]("qty") === 1)
    // 13:27:45.163Z == 07:27:45.163 America/Chicago (CST, UTC-6)
    assert(r.getAs[java.sql.Timestamp]("sale_timestamp").toString
      === "2025-11-24 07:27:45.163")
    assert(r.getAs[String]("month") === "2025-11")
    assert(r.getAs[String]("day_of_week") === "Monday")
    assert(r.getAs[String]("item_category") === "16 oz")
    assert(r.getAs[Int]("location_id") === 2)
    assert(r.getAs[String]("modifiers") === "Almond Milk")
  }

  test("order missing closed_at is rejected, not fatal") {
    val noTs = """{"id":"o2","location_id":"L5WST6KFZBT10","line_items":[
      |{"name":"Latte","quantity":"1",
      | "base_price_money":{"amount":100},"gross_sales_money":{"amount":100}}]}"""
      .stripMargin.replace("\n", "")
    val in = orders(goldenOrder, noTs)
    assert(SalesEtl.run(in, locations).count() === 1)
    assert(SalesEtl.rejectedOrders(in).count() === 1)
  }

  test("missing or empty line_items yields zero rows (plain explode)") {
    val empty = """{"id":"o3","location_id":"L5WST6KFZBT10",
      |"closed_at":"2025-11-24T13:00:00Z","line_items":[]}"""
      .stripMargin.replace("\n", "")
    val missing = """{"id":"o4","location_id":"L5WST6KFZBT10",
      |"closed_at":"2025-11-24T13:00:00Z"}""".stripMargin.replace("\n", "")
    assert(SalesEtl.run(orders(empty, missing), locations).count() === 0)
  }

  test("ignored-name filter is substring, not equality") {
    val o = """{"id":"o5","location_id":"L5WST6KFZBT10",
      |"closed_at":"2025-11-24T13:00:00Z","line_items":[
      |{"name":"Avocado To Go Box","quantity":"1",
      | "base_price_money":{"amount":500},"gross_sales_money":{"amount":500}},
      |{"name":"Togo Salad","quantity":"1",
      | "base_price_money":{"amount":400},"gross_sales_money":{"amount":400}}]}"""
      .stripMargin.replace("\n", "")
    val out = SalesEtl.run(orders(o), locations)
    // "Avocado To Go Box" contains "to go" -> dropped; "Togo" does not
    assert(out.select("item_name").as[String].collect().toSeq === Seq("Togo Salad"))
  }

  test("invalid line items are skipped: bad quantity, negative gross, null name") {
    val o = """{"id":"o6","location_id":"L5WST6KFZBT10",
      |"closed_at":"2025-11-24T13:00:00Z","line_items":[
      |{"name":"BadQty","quantity":"abc",
      | "base_price_money":{"amount":100},"gross_sales_money":{"amount":100}},
      |{"name":"ZeroQty","quantity":"0",
      | "base_price_money":{"amount":100},"gross_sales_money":{"amount":100}},
      |{"quantity":"1",
      | "base_price_money":{"amount":100},"gross_sales_money":{"amount":100}},
      |{"name":"Good","quantity":"2",
      | "base_price_money":{"amount":100},"gross_sales_money":{"amount":300}}]}"""
      .stripMargin.replace("\n", "")
    val out = SalesEtl.run(orders(o), locations).collect()
    assert(out.map(_.getAs[String]("item_name")).toSeq === Seq("Good"))
    assert(out.head.getAs[Int]("qty") === 2)
    assert(out.head.getAs[java.math.BigDecimal]("sale_price")
      .compareTo(new java.math.BigDecimal("3.00")) === 0)
  }

  test("defaults: variation_name -> N/A, no positive modifiers -> empty string") {
    val o = """{"id":"o7","location_id":"L5WST6KFZBT10",
      |"closed_at":"2025-11-24T13:00:00Z","line_items":[
      |{"name":"Plain","quantity":"1",
      | "base_price_money":{"amount":200},"gross_sales_money":{"amount":200},
      | "modifiers":[{"name":"Free Extra","base_price_money":{"amount":0}}]}]}"""
      .stripMargin.replace("\n", "")
    val r = SalesEtl.run(orders(o), locations).collect().head
    assert(r.getAs[String]("item_category") === "N/A")
    assert(r.getAs[String]("modifiers") === "")
  }

  test("unknown square_id drops the order; anti-join audits it") {
    val o = """{"id":"o8","location_id":"UNKNOWN_LOC",
      |"closed_at":"2025-11-24T13:00:00Z","line_items":[
      |{"name":"Latte","quantity":"1",
      | "base_price_money":{"amount":100},"gross_sales_money":{"amount":100}}]}"""
      .stripMargin.replace("\n", "")
    val sales = SalesEtl.toSalesRows(orders(o))
    assert(SalesEtl.withLocations(sales, locations).count() === 0)
    assert(SalesEtl.unknownLocations(sales, locations).count() === 1)
  }

  test("DST boundaries: CDT (UTC-5) vs CST (UTC-6) month/day derivation") {
    def mk(id: String, ts: String) =
      s"""{"id":"$id","location_id":"L5WST6KFZBT10","closed_at":"$ts",
         |"line_items":[{"name":"X","quantity":"1",
         |"base_price_money":{"amount":100},"gross_sales_money":{"amount":100}}]}"""
        .stripMargin.replace("\n", "")
    val out = SalesEtl.run(orders(
      mk("july", "2025-07-15T03:30:00Z"), // CDT: 22:30 July 14 local
      mk("nyd", "2026-01-01T04:00:00Z"), // CST: 22:00 Dec 31 2025 local
      mk("fallback", "2025-11-02T06:30:00Z"), // DST ends 2am CDT->CST: 00:30 CST? No: 06:30Z = 01:30 CDT? ambiguous hour; Spark resolves to CST 00:30
      mk("springfwd", "2025-03-09T08:30:00Z") // DST starts: 02:30 local does not exist; 08:30Z = 02:30 CDT -> 03:30? Spark: 02:30->03:30 CDT
    ), locations).orderBy("sale_timestamp")
      .select("month", "day_of_week").collect()
    // july: 2025-07-14 Monday local; nyd: 2025-12-31 Wednesday local
    val byMonth = SalesEtl.run(orders(
      mk("july", "2025-07-15T03:30:00Z"),
      mk("nyd", "2026-01-01T04:00:00Z")), locations)
      .select("month", "day_of_week").orderBy("month").collect()
    assert(byMonth.map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("2025-07", "Monday"), ("2025-12", "Wednesday")))
    assert(out.length === 4)
  }

  test("F4 validation quarantines rather than fails") {
    val good = SalesEtl.run(orders(goldenOrder), locations)
    val (valid, bad) = SalesEtl.validate(good)
    assert(valid.count() === 1 && bad.count() === 0)
  }

  test("typed Dataset[SalesRow] boundary round-trips the golden row") {
    val row = SalesEtl.typed(SalesEtl.run(orders(goldenOrder), locations))
      .collect().head
    assert(row.item_name === "Iced Lavander latte")
    assert(row.sale_price.compareTo(new java.math.BigDecimal("6.65")) === 0)
    assert(row.location_id === 2 && row.day_of_week === "Monday")
  }
}

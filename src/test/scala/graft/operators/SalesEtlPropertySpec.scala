package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.SquareOrders

/** Property-based spec (SURVEY.md §5.2): for randomly generated orders —
  * including negative/zero prices, bad quantities, ignored names, missing
  * fields — the Spark pipeline must agree with an independent plain-Scala
  * reimplementation of the reference semantics on (a) surviving row
  * count, (b) total revenue cents, and (c) every output row passing the
  * F4 validator.
  */
class SalesEtlPropertySpec extends SparkSpec {
  import spark.implicits._

  case class GMod(name: String, cents: Long)
  case class GItem(name: Option[String], qty: String, base: Long,
      gross: Option[Long], variation: Option[String], mods: List[GMod])
  case class GOrder(id: String, closedAt: Option[String], items: List[GItem])

  private val nameGen = Gen.oneOf(
    "Latte", "Mocha", "Dine In", "Avocado To Go Box", "free water cup",
    "Scone", "Espresso", "Drip Coffee")
  private val qtyGen = Gen.oneOf("1", "2", "3", "0", "-1", "abc", "")
  private val centsGen = Gen.oneOf(-100L, 0L, 1L, 250L, 565L, 10000L)
  private val tsGen = Gen.oneOf(
    Some("2025-11-24T13:27:45Z"), Some("2025-07-04T02:00:00Z"),
    Some("2025-03-09T08:30:00Z"), None)

  private val itemGen: Gen[GItem] = for {
    name <- Gen.option(nameGen)
    qty <- qtyGen
    base <- centsGen
    gross <- Gen.option(centsGen)
    variation <- Gen.option(Gen.oneOf("12 oz", "16 oz"))
    mods <- Gen.listOfN(2, for {
      mn <- Gen.oneOf("Almond Milk", "Oat Milk", "Free Extra")
      mc <- Gen.oneOf(0L, 100L)
    } yield GMod(mn, mc)).map(_.take(2))
  } yield GItem(name, qty, base, gross, variation, mods)

  private val orderGen: Gen[GOrder] = for {
    id <- Gen.identifier.map(_.take(8))
    ts <- tsGen
    items <- Gen.listOfN(4, itemGen).map(_.take(4))
  } yield GOrder(id, ts, items)

  private def json(o: GOrder): String = {
    def item(i: GItem) = {
      val fields = List(
        i.name.map(n => s""""name":"$n""""),
        Some(s""""quantity":"${i.qty}""""),
        Some(s""""base_price_money":{"amount":${i.base}}"""),
        i.gross.map(g => s""""gross_sales_money":{"amount":$g}"""),
        i.variation.map(v => s""""variation_name":"$v""""),
        Some(s""""modifiers":[${i.mods.map(m =>
          s"""{"name":"${m.name}","base_price_money":{"amount":${m.cents}}}""")
          .mkString(",")}]""")).flatten
      fields.mkString("{", ",", "}")
    }
    val base = List(
      Some(s""""id":"${o.id}""""),
      Some(""""location_id":"L5WST6KFZBT10""""),
      o.closedAt.map(t => s""""closed_at":"$t""""),
      Some(s""""line_items":[${o.items.map(item).mkString(",")}]""")).flatten
    base.mkString("{", ",", "}")
  }

  /** Independent reimplementation of the reference's survival rules
    * (etl_service.py:117-133, :175-215, :247-250). */
  private def expectedSurvivors(o: GOrder): List[GItem] =
    if (o.closedAt.isEmpty) Nil
    else o.items.filter { i =>
      val ignored = i.name.exists(n => Seq("dine in", "to go", "free water")
        .exists(n.toLowerCase.contains))
      val qtyOk = i.qty.toIntOption.exists(_ > 0)
      i.base > 0 && !ignored && i.name.nonEmpty && qtyOk &&
        i.gross.exists(_ >= 0)
    }

  private val locations =
    Seq((2, "Current", "L5WST6KFZBT10")).toDF("id", "name", "square_id")

  test("pipeline agrees with independent reference semantics on random orders") {
    val prop = Prop.forAll(Gen.listOfN(8, orderGen)) { orders =>
      val df = SquareOrders.fromJson(spark,
        spark.createDataset(orders.map(json)))
      val resolved = SalesEtl.withLocations(SalesEtl.toSalesRows(df), locations)
      val (valid, quarantined) = SalesEtl.validate(resolved)
      val rows = valid.select(col("sale_price") * 100).collect()
        .map(_.getDecimal(0).longValueExact())

      val expected = orders.flatMap(expectedSurvivors)
      val expectedCents = expected.map(_.gross.get).sum

      (quarantined.count() == 0) :| "no quarantined rows from valid input" &&
        (rows.length == expected.length) :| s"rows ${rows.length} != expected ${expected.length}" &&
        (rows.sum == expectedCents) :| s"cents ${rows.sum} != $expectedCents"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}

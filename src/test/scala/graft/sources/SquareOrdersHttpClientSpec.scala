package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Exercises the live-connector loop against an in-process loopback
  * HTTP server — the pagination/auth/error semantics of
  * `square_service.py:138-276` without any network egress. */
class SquareOrdersHttpClientSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  private def order(id: String, name: String): String =
    s"""{"id":"$id","location_id":"LOC1","closed_at":"2025-11-02T01:00:00Z",
       |"state":"COMPLETED","line_items":[{"name":"$name",
       |"variation_name":"v","quantity":"1",
       |"base_price_money":{"amount":500,"currency":"USD"},
       |"gross_sales_money":{"amount":500,"currency":"USD"},
       |"modifiers":[]}]}""".stripMargin.replaceAll("\n", "")

  /** Loopback server: three pages of orders behind cursor pagination,
    * an optional one-shot 500 before the first success, and a token
    * check. Records every request's auth header, cursor, and body. */
  private class FakeSquare(validToken: String, failFirst: Int = 0) {
    val auths = ArrayBuffer.empty[String]
    val cursors = ArrayBuffer.empty[Option[String]]
    val bodies = ArrayBuffer.empty[String]
    private val failures = new AtomicInteger(failFirst)
    private val pages = Map(
      None -> (Seq(order("o1", "Latte"), order("o2", "Mocha")), Some("c1")),
      Some("c1") -> (Seq(order("o3", "Espresso")), Some("c2")),
      Some("c2") -> (Seq(order("o4", "Drip")), None))

    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v2/orders/search", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      bodies += body
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      auths += auth
      val cursor = Option(mapper.readTree(body).get("cursor")).map(_.asText())
      cursors += cursor
      val (status, resp) =
        if (failures.getAndDecrement() > 0)
          (500, """{"errors":[{"code":"INTERNAL_SERVER_ERROR"}]}""")
        else if (auth != s"Bearer $validToken")
          (401, """{"errors":[{"code":"UNAUTHORIZED"}]}""")
        else {
          val (orders, next) = pages(cursor)
          val n = next.map(c => s""","cursor":"$c"""").getOrElse("")
          (200, s"""{"orders":[${orders.mkString(",")}]$n}""")
        }
      val bytes = resp.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  private def client(sq: FakeSquare, tokenMap: Map[Int, String],
      slept: ArrayBuffer[Long] = ArrayBuffer.empty) =
    new SquareOrdersHttpClient(sq.url, defaultToken = "default-tok",
      tokenMap = tokenMap, initialBackoffMs = 2000L,
      sleepMs = slept += _)

  test("cursor pagination walks every page; per-location token is " +
    "selected; the date/state filter is pushed into the request body") {
    val sq = new FakeSquare(validToken = "loc2-tok")
    try {
      val orders = client(sq, Map(2 -> "loc2-tok"))
        .searchOrders("LOC1", locationDbId = 2,
          "2025-11-01T06:00:00Z", "2025-11-02T05:59:59Z")
      assert(orders.size === 4)
      assert(sq.cursors.toSeq === Seq(None, Some("c1"), Some("c2")))
      assert(sq.auths.distinct.toSeq === Seq("Bearer loc2-tok"))
      val filter = mapper.readTree(sq.bodies.head).path("query").path("filter")
      assert(filter.path("date_time_filter").path("closed_at")
        .path("start_at").asText() === "2025-11-01T06:00:00Z")
      assert(filter.path("state_filter").path("states").get(0)
        .asText() === "COMPLETED")
      assert(mapper.readTree(sq.bodies.head).path("limit").asInt() === 100)
    } finally sq.stop()
  }

  test("an unmapped location falls back to the default token") {
    val sq = new FakeSquare(validToken = "default-tok")
    try {
      val orders = client(sq, Map(2 -> "loc2-tok"))
        .searchOrders("LOC1", locationDbId = 7, "s", "e")
      assert(orders.size === 4)
      assert(sq.auths.distinct.toSeq === Seq("Bearer default-tok"))
    } finally sq.stop()
  }

  test("a transient 500 retries with backoff and succeeds") {
    val sq = new FakeSquare(validToken = "default-tok", failFirst = 1)
    val slept = ArrayBuffer.empty[Long]
    try {
      val orders = client(sq, Map.empty, slept)
        .searchOrders("LOC1", locationDbId = 1, "s", "e")
      assert(orders.size === 4)
      // one failed attempt + one backoff sleep at the initial delay
      assert(slept.toSeq === Seq(2000L))
      assert(sq.auths.size === 4) // 3 pages + 1 retried request
    } finally sq.stop()
  }

  test("a 500 that persists exhausts retries and raises typed") {
    val sq = new FakeSquare(validToken = "default-tok", failFirst = 99)
    val slept = ArrayBuffer.empty[Long]
    try {
      val e = intercept[SquareApiError] {
        client(sq, Map.empty, slept).searchOrders("LOC1", 1, "s", "e")
      }
      assert(e.status === 500)
      assert(slept.toSeq === Seq(2000L, 4000L)) // 3 attempts, ×2 backoff
    } finally sq.stop()
  }

  test("a non-transient 401 raises typed immediately, no retry") {
    val sq = new FakeSquare(validToken = "some-other-token")
    try {
      val e = intercept[SquareApiError] {
        client(sq, Map.empty).searchOrders("LOC1", 1, "s", "e")
      }
      assert(e.status === 401)
      assert(sq.auths.size === 1, "4xx must not retry")
    } finally sq.stop()
  }

  test("test mode stops after 2 pages like the reference") {
    val sq = new FakeSquare(validToken = "default-tok")
    try {
      val orders = client(sq, Map.empty)
        .searchOrders("LOC1", 1, "s", "e", test = true)
      assert(orders.size === 3) // pages of 2 + 1, third page never fetched
      assert(sq.cursors.toSeq === Seq(None, Some("c1")))
    } finally sq.stop()
  }

  test("readOrders parses fetched pages through the engine schema") {
    val sq = new FakeSquare(validToken = "default-tok")
    try {
      val df = client(sq, Map.empty)
        .readOrders(spark, "LOC1", 1, "s", "e")
      assert(df.schema === SquareOrders.orderSchema)
      val names = df.selectExpr("explode(line_items.name) AS n")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(names === Seq("Drip", "Espresso", "Latte", "Mocha"))
    } finally sq.stop()
  }
}

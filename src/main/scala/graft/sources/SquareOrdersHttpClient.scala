package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed API failure, mirroring the reference's SquareAPIError
  * (`square_service.py:24-27`): a non-transient HTTP status (4xx) or a
  * transient failure that survived every retry. */
case class SquareApiError(status: Int, message: String)
  extends RuntimeException(s"Square API error $status: $message")

/** HTTP client for the Square Orders search API, modeling the
  * reference connector's live loop (`square_service.py:138-276`):
  *
  *  - POST `{base}/v2/orders/search` with the `closed_at` date-window +
  *    state filter and `CLOSED_AT ASC` sort in the request body (the
  *    server-side pushdown the V2 connector declares), `limit` 100;
  *  - cursor pagination: follow `cursor` until the response omits it;
  *    test mode stops after 2 pages (`square_service.py:201-207`);
  *  - per-location bearer tokens: `location_db_id → token` map with a
  *    default fallback (`square_service.py:76-104`);
  *  - transient failures (5xx, connection errors) retry with the same
  *    bounded backoff policy as the sink (3 attempts / 2 s / ×2 —
  *    `etl_service.py` posture); non-transient statuses (4xx) raise
  *    [[SquareApiError]] immediately, matching the reference's
  *    raise-on-HTTPError.
  *
  * This is a DRIVER-SIDE utility fetching one (location, window) — the
  * unit of work the reference processes per loop iteration. At scale
  * the V2 source maps one InputPartition per location
  * (`v2/SquareOrdersSource.scala`); a live deployment would run one of
  * these clients inside each partition reader, so fetch parallelism ==
  * location parallelism, same as the file-backed model. `sleepMs` is
  * injectable so specs exercise the retry schedule without waiting.
  */
class SquareOrdersHttpClient(
    baseUrl: String,
    defaultToken: String,
    tokenMap: Map[Int, String] = Map.empty,
    maxAttempts: Int = 3,
    initialBackoffMs: Long = 2000L,
    backoffFactor: Double = 2.0,
    sleepMs: Long => Unit = Thread.sleep,
    requestTimeoutMs: Long = 30000L) {

  // bounded connect + request timeouts: a black-holed connection (LB
  // stall, dropped packets) must surface as an IOException the retry
  // schedule handles — an untimed send() would hang the driver-side
  // fetch forever and the 3-attempt policy would never engage
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(requestTimeoutMs))
    .build()
  private val mapper = new ObjectMapper()

  /** Location-specific token with default fallback
    * (`square_service.py:90-92`). */
  def tokenFor(locationDbId: Int): String =
    tokenMap.getOrElse(locationDbId, defaultToken)

  /** Fetch every order for one location + closed_at window as raw JSON
    * documents (one order per element). `test = true` caps pagination
    * at 2 pages like the reference's test mode. */
  def searchOrders(locationId: String, locationDbId: Int,
      startRfc: String, endRfc: String, state: String = "COMPLETED",
      test: Boolean = false): Seq[String] = {
    val token = tokenFor(locationDbId)
    val orders = ArrayBuffer.empty[String]
    var cursor: Option[String] = None
    var page = 0
    val maxPages = if (test) 2 else Int.MaxValue
    var done = false
    while (!done && page < maxPages) {
      page += 1
      val body = requestBody(locationId, startRfc, endRfc, state, cursor)
      val resp = postWithRetry(s"$baseUrl/v2/orders/search", token, body)
      val root = mapper.readTree(resp)
      val pageOrders = root.path("orders")
      if (pageOrders.isArray) {
        val it = pageOrders.elements()
        while (it.hasNext) orders += mapper.writeValueAsString(it.next())
      }
      cursor = Option(root.get("cursor")).filter(!_.isNull).map(_.asText())
      done = cursor.isEmpty
    }
    orders.toSeq
  }

  /** [[searchOrders]] parsed through the engine's explicit order schema
    * — the reader path a pipeline consumes
    * ([[SquareOrders.fromJson]]). */
  def readOrders(spark: SparkSession, locationId: String,
      locationDbId: Int, startRfc: String, endRfc: String,
      state: String = "COMPLETED", test: Boolean = false): DataFrame = {
    import spark.implicits._
    SquareOrders.fromJson(spark,
      spark.createDataset(searchOrders(locationId, locationDbId,
        startRfc, endRfc, state, test)))
  }

  /** The search body the reference builds per page
    * (`square_service.py:209-234`). */
  private def requestBody(locationId: String, startRfc: String,
      endRfc: String, state: String, cursor: Option[String]): String = {
    val root = mapper.createObjectNode()
    root.putArray("location_ids").add(locationId)
    val query = root.putObject("query")
    val filter = query.putObject("filter")
    val closedAt = filter.putObject("date_time_filter").putObject("closed_at")
    closedAt.put("start_at", startRfc)
    closedAt.put("end_at", endRfc)
    filter.putObject("state_filter").putArray("states").add(state)
    val sort = query.putObject("sort")
    sort.put("sort_field", "CLOSED_AT")
    sort.put("sort_order", "ASC")
    root.put("limit", 100)
    cursor.foreach(c => root.put("cursor", c))
    mapper.writeValueAsString(root)
  }

  /** POST with the engine's bounded transient-retry policy: 5xx and
    * connection failures back off and retry; 4xx is typed and final. */
  private def postWithRetry(url: String, token: String,
      body: String): String = {
    var attempt = 0
    var backoff = initialBackoffMs
    var lastTransient: Option[SquareApiError] = None
    while (attempt < maxAttempts) {
      attempt += 1
      val outcome: Either[SquareApiError, String] =
        try {
          val req = HttpRequest.newBuilder(URI.create(url))
            .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
            .header("Authorization", s"Bearer $token")
            .header("Content-Type", "application/json")
            .header("Accept", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(body))
            .build()
          val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case ok if ok >= 200 && ok < 300 => Right(resp.body())
            case s if s >= 500 =>
              Left(SquareApiError(s, s"transient server error: ${resp.body()}"))
            case s =>
              // non-transient (auth, bad request): no retry, typed raise
              throw SquareApiError(s, resp.body())
          }
        } catch {
          case e: java.io.IOException =>
            Left(SquareApiError(0, s"connection failure: ${e.getMessage}"))
        }
      outcome match {
        case Right(ok) => return ok
        case Left(transient) =>
          lastTransient = Some(transient)
          if (attempt < maxAttempts) {
            sleepMs(backoff)
            backoff = (backoff * backoffFactor).toLong
          }
      }
    }
    throw lastTransient.getOrElse(SquareApiError(0, "retries exhausted"))
  }
}

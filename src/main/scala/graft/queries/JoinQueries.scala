package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, AssocRules, CoOccurrence, RangeJoin}

/** Specialized join queries. a01 checks the composed as-of join against
  * DuckDB's NATIVE `ASOF JOIN` — a strong cross-implementation oracle.
  */
object JoinQueries {

  // for each click, the most recent prior 'view' value per user
  private def a01(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"),
        col("value"))
    AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "vts",
      Seq("value"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
      .orderBy("event_id")
      .limit(500)
  }

  // events landing in the hour after each signup of the same user
  private def a02(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
    val signups = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
    val ev = e.select(col("event_id"), col("user_id"), col("ts"))
    RangeJoin.binned(ev, "ts", signups, "w_start", "w_end",
      Seq("user_id"), binSeconds = 3600)
      .groupBy("signup_id").agg(count(lit(1)).as("cnt"))
      .orderBy("signup_id")
      .limit(500)
  }

  // item-item CF: top-5 "also bought" per part, exact-integer ppm
  // scores, pair blowup bounded by order line counts
  private def a03(s: SparkSession, dir: String): DataFrame =
    // maxGroupRows opt-in: orders are bounded (7 lines max in TPC-H)
    // but the cap path stays exercised by the gate + its oracle
    CoOccurrence.topK(Tables(s, dir, "lineitem"),
      "l_orderkey", "l_partkey", k = 5, minPairs = 3,
      maxGroupRows = 100000L)
      .orderBy("item", "rank")

  // co-located join through bucketed tables: both sides pre-bucketed
  // on the join key, so the join plans with ZERO Exchange (asserted by
  // BucketedJoinSpec) — the explicit-bucketing layout a 100 TB fact
  // store ships with. Results identical to the plain join (the oracle).
  private def a04(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.SalesSink
    val base = "/tmp/graft_bucketed_" +
      java.lang.Integer.toHexString(dir.hashCode)
    val oTbl = "a04_orders_b"
    val lTbl = "a04_lineitem_b"
    if (!s.catalog.tableExists(oTbl)) {
      SalesSink.writeBucketed(
        Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority"),
        oTbl, "o_orderkey", 16, path = Some(s"$base/orders"))
      SalesSink.writeBucketed(
        Tables(s, dir, "lineitem")
          .select("l_orderkey", "l_quantity", "l_extendedprice"),
        lTbl, "l_orderkey", 16, path = Some(s"$base/lineitem"))
    }
    s.table(lTbl).join(s.table(oTbl),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("long")).as("qty"),
        sum(expr("CAST(l_extendedprice AS DECIMAL(18,4))"))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  // global association rules over the same baskets a03 ranks
  // per-item: top-100 pairings by lift (exact integer ppm — support,
  // confidence, lift all floor-divisions over pair/item/basket counts)
  private def a05(s: SparkSession, dir: String): DataFrame =
    AssocRules.mine(Tables(s, dir, "lineitem"),
      "l_orderkey", "l_partkey", minPairs = 3, topN = 100)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a01_asof_join" -> (a01 _),
    "a02_range_join" -> (a02 _),
    "a03_item_cooccur" -> (a03 _),
    "a04_bucketed_join" -> (a04 _),
    "a05_assoc_rules" -> (a05 _),
  )

  val oracleSql: Map[String, String] = Map(
    // identical capped-basket distinct incidence -> directional pair
    // counts -> exact ppm floor-divisions (`//` on HUGEINT ≡ Spark
    // `div` on DECIMAL(38,0) for these non-negative operands) ->
    // global lift ranking; row_number cast to INT (Spark rank type)
    "a05_assoc_rules" ->
      ("WITH okg AS (SELECT l_orderkey FROM lineitem " +
        "GROUP BY l_orderkey HAVING count(*) <= 100000), " +
        "inc AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i " +
        "FROM lineitem JOIN okg USING (l_orderkey)), " +
        "nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_baskets " +
        "FROM inc), " +
        "pc AS (SELECT x.i AS a, y.i AS b, " +
        "CAST(count(*) AS BIGINT) AS pair_cnt FROM inc x JOIN inc y " +
        "ON x.g = y.g AND x.i <> y.i GROUP BY 1, 2 " +
        "HAVING count(*) >= 3), " +
        "base AS (SELECT i, CAST(count(*) AS BIGINT) AS item_cnt " +
        "FROM inc GROUP BY 1), " +
        "scored AS (SELECT a AS antecedent, b AS consequent, pair_cnt, " +
        "ba.item_cnt AS ante_cnt, bb.item_cnt AS cons_cnt, " +
        "(1000000 * pair_cnt) // n_baskets AS support_ppm, " +
        "(1000000 * pair_cnt) // ba.item_cnt AS confidence_ppm, " +
        "CAST((CAST(1000000 AS HUGEINT) * pair_cnt * n_baskets) // " +
        "(CAST(ba.item_cnt AS HUGEINT) * bb.item_cnt) AS BIGINT) " +
        "AS lift_ppm FROM pc " +
        "JOIN base ba ON ba.i = pc.a JOIN base bb ON bb.i = pc.b " +
        "CROSS JOIN nb) " +
        "SELECT antecedent, consequent, pair_cnt, ante_cnt, cons_cnt, " +
        "support_ppm, confidence_ppm, lift_ppm, " +
        "CAST(row_number() OVER (ORDER BY lift_ppm DESC, " +
        "confidence_ppm DESC, antecedent, consequent) AS INT) AS rank " +
        "FROM scored ORDER BY lift_ppm DESC, confidence_ppm DESC, " +
        "antecedent, consequent LIMIT 100"),
    // exact-integer ppm scores -> ranks replay; row_number cast to INT
    // to match Spark's rank type. ok replicates topK's maxGroupRows
    // hot-group guard (never bites at fixture scale — max order line
    // count is 7 — but keeps gate and oracle semantics identical)
    "a03_item_cooccur" ->
      ("WITH ok AS (SELECT l_orderkey FROM lineitem " +
        "GROUP BY l_orderkey HAVING count(*) <= 100000), " +
        "inc AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i " +
        "FROM lineitem JOIN ok USING (l_orderkey)), " +
        "pab AS (SELECT x.i AS a, y.i AS b FROM inc x JOIN inc y " +
        "ON x.g = y.g AND x.i < y.i), " +
        "p2 AS (SELECT a, b FROM pab UNION ALL SELECT b, a FROM pab), " +
        "pc AS (SELECT a, b, count(*) AS pair_cnt FROM p2 GROUP BY a, b " +
        "HAVING count(*) >= 3), " +
        "base AS (SELECT i AS b, count(*) AS rec_cnt FROM inc GROUP BY i), " +
        "sc AS (SELECT a AS item, b AS rec, pair_cnt, rec_cnt, " +
        "(1000000 * pair_cnt) // rec_cnt AS score_ppm " +
        "FROM pc JOIN base USING (b)), " +
        "r AS (SELECT item, rec, pair_cnt, rec_cnt, score_ppm, " +
        "CAST(row_number() OVER (PARTITION BY item " +
        "ORDER BY score_ppm DESC, pair_cnt DESC, rec) AS INT) AS rank " +
        "FROM sc) " +
        "SELECT item, rec, pair_cnt, rec_cnt, score_ppm, rank FROM r " +
        "WHERE rank <= 5 ORDER BY item, rank"),
    // the bucketed layout must not change RESULTS — the oracle is the
    // plain join; the zero-Exchange plan is asserted by BucketedJoinSpec
    "a04_bucketed_join" ->
      ("SELECT o_orderpriority, count(*) AS cnt, " +
        "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) " +
        "AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "a01_asof_join" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, " +
        "event_type, value FROM events), " +
        "c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'), " +
        "v AS (SELECT user_id, ts, value FROM e WHERE event_type = 'view') " +
        "SELECT c.event_id, v.ts AS asof_ts, v.value AS asof_value " +
        "FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts " +
        "ORDER BY event_id LIMIT 500"),
    "a02_range_join" ->
      ("WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts " +
        "FROM events), " +
        "s AS (SELECT event_id AS signup_id, user_id, CAST(ts AS TIMESTAMP) AS w_start, " +
        "CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end FROM events " +
        "WHERE event_type = 'signup') " +
        "SELECT s.signup_id, count(*) AS cnt FROM e JOIN s " +
        "ON e.user_id = s.user_id AND e.ts >= s.w_start AND e.ts <= s.w_end " +
        "GROUP BY s.signup_id ORDER BY s.signup_id LIMIT 500"),
  )
}

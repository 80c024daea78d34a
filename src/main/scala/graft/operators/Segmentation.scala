package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM customer segmentation — the classic "score every customer 1–5 on
  * Recency / Frequency / Monetary and bucket them" marketing-analytics
  * operator (reference analog: the per-customer rollups its monthly sales
  * reports feed, rromero09/analytics-etl `app/services/database_service.py`
  * month/item aggregates).
  *
  * Quintile scores are GLOBAL ranks, and the naive formulation —
  * `ntile(5) OVER (ORDER BY metric)` — plans a single-partition window:
  * one task sorting every customer, the shape that cannot exist at
  * 100 TB. Here each score rides [[SequentialIds]] (range exchange +
  * per-partition numbering, driver holds P longs), and the bucket is
  * pure arithmetic on the dense rank: `rank·5 div n + 1`. Every
  * ordering appends `custkey` so ranks — and the oracle replay via
  * `row_number()` — are a total order, bit-deterministic.
  *
  * Scale shape: one groupBy(custkey) over the fact table, then three
  * range exchanges over the CUSTOMER-sized frame (each the cost of a
  * global sort of n_customers rows, all distributed), one broadcast of
  * the 1-row max-date aggregate, no driver-side data beyond partition
  * counts.
  */
object Segmentation {

  /** Per-customer RFM scores over an orders fact table.
    * Output: custkey, recency_days (days between the customer's last
    * order and the corpus-wide last order), frequency (order count),
    * monetary (total spend, rendered as STRING for engine-neutral
    * decimal comparison), r/f/m quintile scores (5 = best), and the
    * combined `rfm` code (r·100 + f·10 + m). */
  def rfm(orders: DataFrame, custKey: String, dateCol: String,
      amountCol: String): DataFrame = {
    val maxDate = orders.agg(max(col(dateCol)).as("_maxd"))
    val base = orders.groupBy(col(custKey).as("custkey"))
      .agg(max(col(dateCol)).as("_lastd"),
        count(lit(1)).as("frequency"),
        sum(col(amountCol)).cast("decimal(18,2)").cast("string")
          .as("monetary"))
      .crossJoin(broadcast(maxDate))
      .select(col("custkey"),
        datediff(col("_maxd"), col("_lastd")).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary"))
      .localCheckpoint() // three rank passes + count see one layout
    val n = base.count()
    def score(df: DataFrame, order: Seq[Column], rank: String,
        out: String): DataFrame =
      SequentialIds.assign(df, order, rank)
        .withColumn(out, expr(s"$rank * 5 div $n + 1"))
        .drop(rank)
    // larger rank = better customer = higher score: most recent / most
    // frequent / highest spend sort LAST in each order
    val scored = Seq(
      (Seq(col("recency_days").desc, col("custkey")), "_rr", "r_score"),
      (Seq(col("frequency").asc, col("custkey")), "_fr", "f_score"),
      (Seq(col("monetary").cast("decimal(18,2)").asc, col("custkey")),
        "_mr", "m_score"))
      .foldLeft(base) { case (df, (ord, rank, out)) =>
        score(df, ord, rank, out)
      }
    scored.withColumn("rfm",
      col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Smoothed mean target encoding (Micci-Barreca 2001) — the standard
  * high-cardinality categorical feature encoder: a category's code is
  * its observed target rate shrunk toward the global rate, with the
  * shrinkage weight `m` acting as a pseudo-count prior —
  * `enc = (pos + m·global_rate) / (n + m)` — so rare categories sit
  * near the prior and frequent ones near their own rate.
  *
  * Rates are parts-per-million INTEGERS (`1e6·pos + m·global_ppm`
  * over `n + m`, floor division), so the encoding replays bit-for-bit
  * in any engine — the [[CoOccurrence]] exactness discipline.
  *
  * Scale shape: one category-keyed count/sum aggregate (map-side
  * partials), then the global rate is re-aggregated from the
  * CATEGORY-sized frame (never a second scan of the input) and rides
  * every row as a broadcast 1-row cross join.
  */
object TargetEncode {

  /** (category, n, pos, enc_ppm) per distinct value of `category`;
    * `target` is a boolean Column evaluated per input row. */
  def encode(df: DataFrame, category: String, target: Column,
      m: Long): DataFrame = {
    require(m >= 0, "smoothing pseudo-count must be >= 0")
    val perCat = df
      .groupBy(col(category).as("category"))
      .agg(count(lit(1)).as("n"),
        sum(when(target, 1L).otherwise(0L)).as("pos"))
    val global = perCat
      .agg(sum(col("n")).as("gn"), sum(col("pos")).as("gpos"))
      .select(expr("(1000000 * gpos) div gn").as("global_ppm"))
    perCat.crossJoin(broadcast(global))
      .select(col("category"), col("n"), col("pos"),
        expr(s"(1000000 * pos + $m * global_ppm) div (n + $m)")
          .as("enc_ppm"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet &
  * Meunier 2007), ENGINE-PORTABLE: the hash is the first 15 hex chars
  * of md5 (a 60-bit integer both engines derive identically), so
  * registers — and the estimate — replay bit-for-bit in SQL. The
  * mergeable cardinality path next to q34's exact distinct: at 100 TB
  * the register frame is `m` rows per shard, merged by MAX — the
  * classic "count distinct users across a year of daily partitions
  * without re-scanning" sketch (CountMin/q37 is the frequency cousin,
  * q43's histogram the quantile one).
  *
  * Exactness discipline: register index and rank are integer bit
  * arithmetic (bit-length via base-2 string length — no float log2,
  * whose boundary rounding flips floor(log2(2^k − 1)) at large k);
  * ranks cap at 48 so the harmonic-mean denominator is the EXACT
  * integer `Σ 2^(48 − r)` (every term a power of two ≤ 2^47, sum well
  * under 2^63 at m ≤ 4096 — no float-order drift); the final estimate
  * is one fixed-shape double expression (mirrored textually in the
  * oracle) rounded to 2.
  */
object HyperLogLog {

  /** Per-register max rank: (j, r) — at most `2^b` rows. Mergeable
    * across shards/batches by `groupBy(j).agg(max(r))` (spec-pinned by
    * HyperLogLogSpec, gate-pinned end-to-end by q46's shard-merge ==
    * full-scan identity).
    * Rank: W − bitlen(w) + 1 for the (W = 60−b)-bit suffix w, W+1 when
    * w = 0, capped at 48 (cap keeps the estimator's denominator an
    * exact integer; ranks ≥ 48 need ~2^47 distinct values to matter).
    * Delegates to [[registersBy]] with a constant shard so the two
    * paths share ONE arithmetic spine — the full-scan and rollup
    * registers cannot drift apart by construction. */
  def registers(df: DataFrame, value: Column, b: Int): DataFrame =
    registersBy(df, value, b, lit("_all")).drop("shard")

  /** Per-(shard, register) max rank: (shard, j, r) — at most `2^b`
    * rows PER SHARD. This is the sketch's production shape at 100 TB:
    * compute registers once per partition (day/month/file batch), store
    * m tiny rows per shard, and answer any cross-shard distinct count
    * later by `groupBy(j).agg(max(r))` + [[estimate]] — no re-scan of
    * the raw rows, and the merge is associative/idempotent so rollups
    * compose (day → month → year). q46 pins the identity
    * merged-shards == full-scan bit-for-bit against DuckDB. */
  def registersBy(df: DataFrame, value: Column, b: Int,
      shard: Column): DataFrame = {
    // NULLs are excluded up front (COUNT DISTINCT semantics): md5(NULL)
    // would propagate NULL into (j, r) — and least(48, NULL) SKIPS the
    // null, manufacturing a phantom (NULL, 48) register that inflates
    // `occupied` and the estimate
    jrFrom(df.filter(value.isNotNull)
        .select(shard.as("shard"),
          conv(substring(md5(value.cast("string")), 1, 15), 16, 10)
            .cast("long").as("_h")),
        b, keep = Seq("shard"))
      .groupBy("shard", "j").agg(max(col("r")).as("r"))
  }

  /** The hash → (register index, rank) spine, shared by the batch
    * rollup above and the streaming windowed sketch
    * ([[graft.streaming.EventStreams.windowedUserRegisters]]): takes a
    * frame carrying the 60-bit hash as `_h`, returns `keep` ++ (j, r).
    * One arithmetic spine — the two paths cannot drift. */
  private[graft] def jrFrom(df: DataFrame, b: Int,
      keep: Seq[String]): DataFrame = {
    require(b >= 4 && b <= 12, "need 4 <= b <= 12 (16..4096 registers)")
    val m = 1 << b
    val w = 60 - b
    // integer div, NOT `/`: Column./ is double division, and a 60-bit
    // hash exceeds double's 53-bit exact range — the truncated quotient
    // would corrupt low bits of w (and the ranks) silently
    df.select(keep.map(col) ++ Seq(
        pmod(col("_h"), lit(m)).cast("int").as("j"),
        expr(s"_h div $m").as("_w")): _*)
      .select(keep.map(col) ++ Seq(col("j"),
        least(lit(48), when(col("_w") === 0, lit(w + 1))
          .otherwise(lit(w + 1) -
            length(conv(col("_w").cast("string"), 10, 2)))).as("r")): _*)
  }

  private def regAggs = Seq(
    count(lit(1)).as("occupied"),
    coalesce(sum(expr("shiftleft(CAST(1 AS BIGINT), " +
      "CAST(48 - r AS INT))")), lit(0L)).as("_socc"))

  /** The shared estimate read-off over an aggregated
    * (occupied, _socc) frame — one arithmetic spine for the one-sketch
    * and per-shard paths. */
  private def readOff(aggd: DataFrame, b: Int,
      keep: Seq[String]): DataFrame = {
    val m = 1 << b
    // FFGM'07 pins alpha for the small register counts; the closed form
    // 0.7213/(1 + 1.079/m) is the asymptotic constant, valid m >= 128
    val alpha = m match {
      case 16 => "0.673"
      case 32 => "0.697"
      case 64 => "0.709"
      case _ => s"(0.7213 / (1 + 1.079 / $m))"
    }
    // empty registers contribute 2^-0 = 1 → 2^48 in the scaled sum
    aggd
      .select(keep.map(col) ++ Seq(lit(m.toLong).as("m"), col("occupied"),
        (col("_socc") +
          (lit(m.toLong) - col("occupied")) * lit(1L << 48)).as("_s"),
        (lit(m.toLong) - col("occupied")).as("_v")): _*)
      .select(keep.map(col) ++ Seq(col("m"), col("occupied"),
        round(expr(s"CASE WHEN $alpha * $m * $m * " +
          s"pow(2, 48) / _s <= 2.5 * $m AND _v > 0 " +
          s"THEN $m * ln(CAST($m AS DOUBLE) / _v) " +
          s"ELSE $alpha * $m * $m * " +
          "pow(2, 48) / _s END"), 2).as("est")): _*)
  }

  /** One-row estimate from a register frame: (m, occupied, est).
    * Standard small-range correction (est0 ≤ 2.5m with empty
    * registers → linear counting `m·ln(m/V)`). A GLOBAL aggregate by
    * contract: an empty register frame still yields its one zero-
    * estimate row (a grouped read-off would yield none). */
  def estimate(reg: DataFrame, b: Int): DataFrame =
    readOff(reg.agg(regAggs.head, regAggs.tail: _*), b, Nil)

  /** Per-SHARD estimates from a (shard, j, r) register frame:
    * (shard, m, occupied, est), one row per shard — "distinct per
    * day/window/partition" read off stored registers with no re-scan
    * (the sketch family's grouped read-off; the streaming windowed
    * sketch reads its window state through this too). Shards with no
    * registers are absent (there is nothing to read off). */
  def estimateBy(reg: DataFrame, b: Int): DataFrame =
    readOff(reg.groupBy("shard").agg(regAggs.head, regAggs.tail: _*),
      b, Seq("shard"))

  /** registers + estimate in one call. */
  def distinctEstimate(df: DataFrame, value: Column, b: Int): DataFrame =
    estimate(registers(df, value, b), b)
}

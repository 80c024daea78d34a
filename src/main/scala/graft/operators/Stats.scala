package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass pairwise Pearson correlation matrix — the feature-audit
  * sweep (which numeric columns are redundant / leaking each other?)
  * run before any model or mixture decision.
  *
  * Why not `corr()`: Spark's corr aggregate accumulates DOUBLE sums,
  * which are shuffle-order dependent in the last ulp — two runs (or
  * two engines) disagree and a hash gate can't pin it.
  *
  * Why not decimal sums (the t12 recipe): a decimal whose precision
  * exceeds 18 digits leaves the compact-Long fast path, and a
  * moment sum needs ~28 digits — measured 4.2 s for the 15-moment
  * aggregate at sf0.1 vs 0.18 s for doubles, a 25× tax per scan.
  *
  * Instead: EXACT ORDER-FREE sums in pure LONG arithmetic. Values are
  * quantized to integers (`round(x · quantScale)`, default cents) and
  * every square/cross product — which can overflow a long SUM even
  * when each term fits — is split per term into
  * `hi = (p − pmod(p, k)) div k` and `lo = pmod(p, k)` with k = 10⁹;
  * both halves sum in longs (codegen'd integer adds, associative and
  * commutative, so partial aggregation and shuffle order cannot change
  * the result), and `Σp = k·Σhi + Σlo` recombines in double inside the
  * one fixed-shape Pearson expression — identical IEEE in any engine.
  * Pearson is invariant to linear scaling, so the quantization scale
  * cancels; quantization itself (2 decimal places by default) is the
  * stated measurement precision, applied identically in both engines.
  *
  * Bounds (document, don't discover at 3 a.m.): per-term products
  * must fit a long — |x·quantScale| ≤ ~3·10⁹ (ANSI mode makes an
  * overflowing multiply a loud error, not a wrap); the lo-sums need
  * n·k ≤ 9.2·10¹⁸, i.e. ~9 billion rows at k = 10⁹ — shrink k (and
  * raise the hi budget) for corpora past that.
  *
  * Scale shape: ONE aggregate scan computes all moments as long sums
  * (map-side combined, 1-row result; 50 columns = ~2,600 long sums in
  * one wide buffer, not 2,600 passes), then the melt to (col_x, col_y,
  * corr) rows explodes that single PERSISTED row — the un-materialized
  * melt let a downstream count() re-derive the whole aggregate per
  * generated row (measured 6×). Rows where ANY profiled column is
  * NULL are excluded up front (listwise deletion — the standard
  * complete-case matrix, the only definition where all pairs share
  * one n).
  */
object Stats {

  private val K: Long = 1000000000L // hi/lo split base

  /** Upper-triangle correlation matrix: one row per pair in the
    * caller's column order (col_x, col_y, n, corr), corr rounded to 4,
    * NULL when a column is constant (zero variance ⟹ undefined).
    * `quantScale` sets the measurement precision: values are rounded
    * to 1/quantScale before the exact arithmetic (default cents). */
  def corrMatrix(df: DataFrame, cols: Seq[String],
      quantScale: Long = 100L): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, "duplicate columns")
    require(quantScale > 0, "quantScale must be positive")
    val complete = df.filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        round(col(c) * quantScale).cast("long").as(s"q_$c")): _*)
    // hi = exact integer division of (p − pmod(p, K)) — a multiple of
    // K, so truncating `div` IS the exact quotient for either sign
    // (Column `/` would be DOUBLE division, inexact past 2^53)
    def splitSums(pExpr: String, name: String) = Seq(
      expr(s"sum((($pExpr) - pmod($pExpr, ${K}L)) div ${K}L)")
        .as(s"${name}_hi"),
      expr(s"sum(pmod($pExpr, ${K}L))").as(s"${name}_lo"))
    val moments =
      Seq(count(lit(1)).as("n")) ++
        cols.map(c => sum(col(s"q_$c")).as(s"s_$c")) ++
        cols.flatMap(c => splitSums(s"q_$c * q_$c", s"ss_$c")) ++
        cols.combinations(2).toSeq.flatMap { case Seq(a, b) =>
          splitSums(s"q_$a * q_$b", s"sp_${a}_$b")
        }
    // persist the 1-ROW moment frame before the melt (see scaladoc)
    val one = complete.agg(moments.head, moments.tail: _*).persist()
    def d(name: String) = s"CAST($name AS DOUBLE)"
    def rec(name: String) = // Σp = k·Σhi + Σlo, recombined in double
      s"(${d(s"${name}_hi")} * $K + ${d(s"${name}_lo")})"
    val rows = cols.combinations(2).toSeq.map { case Seq(a, b) =>
      val vx = s"(${d("n")} * ${rec(s"ss_$a")} - ${d(s"s_$a")} * ${d(s"s_$a")})"
      val vy = s"(${d("n")} * ${rec(s"ss_$b")} - ${d(s"s_$b")} * ${d(s"s_$b")})"
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        round(expr(
          s"CASE WHEN $vx > 0 AND $vy > 0 " +
            s"THEN (${d("n")} * ${rec(s"sp_${a}_$b")} - " +
            s"${d(s"s_$a")} * ${d(s"s_$b")}) / sqrt($vx * $vy) " +
            "ELSE NULL END"), 4).as("corr"))
    }
    one.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("n"), col("p.corr"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-sample proportion z-test — the experiment-analysis primitive
  * every event pipeline ends in: did variant B convert better than
  * variant A, and is the difference bigger than noise? (The classic
  * pooled two-proportion z; |z| > 1.96 ⟺ p < 0.05 two-sided.)
  *
  * Exactness: the inputs to the test are four INTEGER counts from one
  * aggregate; rates are ppm floor-division integers; the z statistic
  * is one fixed-shape double expression over those integers (divide,
  * multiply, sqrt — IEEE-identical in any engine), rounded to 4. So
  * the whole report replays bit-for-bit, unlike a float-sum path.
  *
  * Scale shape: ONE conditional-sum aggregate over the user-level
  * frame (map-side combined, 1-row result). Deriving the user-level
  * frame from events is the caller's one groupBy(user) — the gate
  * shows the composition.
  */
object AbTest {

  /** One-row report from a USER-LEVEL frame: `variant` boolean column
    * (false = A/control, true = B/treatment), `converted` boolean
    * column. Output: (n_a, conv_a, rate_a_ppm, n_b, conv_b,
    * rate_b_ppm, lift_ppm, z). `lift_ppm` = rate_b − rate_a in ppm
    * (signed). NULL variant rows are excluded (no arm); NULL converted
    * counts as not converted. z is NULL when either arm is empty or
    * the pooled rate is degenerate (0 or 1 — no variance, no test). */
  def proportionTest(users: DataFrame, variant: Column,
      converted: Column): DataFrame = {
    val agg = users.filter(variant.isNotNull)
      .agg(
        sum(when(!variant, 1L).otherwise(0L)).as("n_a"),
        sum(when(!variant && coalesce(converted, lit(false)), 1L)
          .otherwise(0L)).as("conv_a"),
        sum(when(variant, 1L).otherwise(0L)).as("n_b"),
        sum(when(variant && coalesce(converted, lit(false)), 1L)
          .otherwise(0L)).as("conv_b"))
    // fixed-shape double chain, mirrored textually in the oracle:
    // p̂ = pooled rate, z = (pb − pa) / sqrt(p̂(1−p̂)(1/na + 1/nb))
    // empty-arm guard on every division: ANSI mode makes `div 0` an
    // ERROR, not a NULL — an experiment with an unpopulated arm must
    // report NULL rates/lift, not crash the job
    val rateA = expr(
      "CASE WHEN n_a > 0 THEN (1000000 * conv_a) div n_a END")
    val rateB = expr(
      "CASE WHEN n_b > 0 THEN (1000000 * conv_b) div n_b END")
    agg.select(
      col("n_a"), col("conv_a"), rateA.as("rate_a_ppm"),
      col("n_b"), col("conv_b"), rateB.as("rate_b_ppm"),
      (rateB - rateA).as("lift_ppm"),
      round(expr(
        "CASE WHEN n_a > 0 AND n_b > 0 " +
          "AND conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b " +
          "THEN (CAST(conv_b AS DOUBLE) / n_b - " +
          "CAST(conv_a AS DOUBLE) / n_a) / " +
          "sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * " +
          "(1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) * " +
          "(1.0 / n_a + 1.0 / n_b)) " +
          "ELSE NULL END"), 4).as("z"))
  }

  private val K: Long = 1000000000L // hi/lo split base (Stats recipe)

  /** Welch's two-sample t-test on MEANS — [[proportionTest]]'s
    * continuous-metric sibling (revenue per user, latency, tokens per
    * doc), with no equal-variance assumption (the unpooled form is the
    * safe default; Welch 1947, Satterthwaite 1946 df).
    *
    * Exactness: the moments feeding the test are EXACT ORDER-FREE long
    * sums over `round(value · quantScale)` integers — squares hi/lo
    * split per term so partial aggregation and shuffle order cannot
    * move an ulp (the Stats.corrMatrix recipe; decimal sums at this
    * precision would leave the compact-Long path, measured 25×). The
    * t statistic and Satterthwaite df are one fixed-shape double chain
    * over those integers, mirrored textually by the oracle.
    *
    * Bounds (the Stats contract): |value·quantScale| ≤ ~3·10⁹ per row
    * (ANSI errors loudly past that), lo-sums safe to ~9 billion rows
    * at the default split base.
    *
    * Scale shape: ONE conditional-sum aggregate (map-side combined,
    * 1-row result) — no per-arm scan, no variance second pass.
    *
    * Output: (n_a, n_b, mean_a, mean_b, t_stat, df), means in original
    * units, everything rounded to 4. NULL variant/value rows are
    * excluded (no arm / no measurement — listwise, matching the
    * oracle's WHERE). t/df are NULL when either arm has < 2 rows or
    * both arms are constant (zero standard error — no test). */
  def welchTTest(df: DataFrame, variant: Column, value: Column,
      quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val base = df.filter(variant.isNotNull && value.isNotNull)
      .select(variant.as("_v"),
        round(value * quantScale).cast("long").as("q"))
    // integer stage: exact conditional long sums; hi = exact integer
    // quotient of (p − pmod(p, K)), a multiple of K (see Stats)
    def armSums(arm: String, pred: String) = Seq(
      expr(s"sum(CASE WHEN $pred THEN 1L ELSE 0L END)").as(s"n_$arm"),
      expr(s"sum(CASE WHEN $pred THEN q ELSE 0L END)").as(s"s_$arm"),
      expr(s"sum(CASE WHEN $pred THEN ((q * q) - pmod(q * q, ${K}L)) " +
        s"div ${K}L ELSE 0L END)").as(s"ss_${arm}_hi"),
      expr(s"sum(CASE WHEN $pred THEN pmod(q * q, ${K}L) ELSE 0L END)")
        .as(s"ss_${arm}_lo"))
    val sums = armSums("a", "NOT _v") ++ armSums("b", "_v")
    val m = base.agg(sums.head, sums.tail: _*)
    val staged = m.select(col("n_a"), col("n_b"), col("s_a"), col("s_b"),
      expr(welchVarSql("a")).as("va"), expr(welchVarSql("b")).as("vb"))
    staged.select(col("n_a"), col("n_b"),
      expr(welchMeanSql("a", quantScale)).as("mean_a"),
      expr(welchMeanSql("b", quantScale)).as("mean_b"),
      expr(welchTSql).as("t_stat"), expr(welchDfSql).as("df"))
  }

  // The double-stage expression TEXT, shared verbatim with the DuckDB
  // oracle (AnalyticsQueries f15) so the fixed-shape IEEE chains cannot
  // drift between engines. All are ANSI SQL over the integer columns
  // n_a/n_b/s_a/s_b (+ ss_*_hi/lo for the variances; t/df read the
  // staged va/vb).
  private def d(x: String) = s"CAST($x AS DOUBLE)"

  /** Sample variance of one arm in quant units² (NULL below 2 rows). */
  private[graft] def welchVarSql(arm: String): String = {
    val rec = s"(${d(s"ss_${arm}_hi")} * $K + ${d(s"ss_${arm}_lo")})"
    s"CASE WHEN n_$arm > 1 THEN (${d(s"n_$arm")} * $rec - " +
      s"${d(s"s_$arm")} * ${d(s"s_$arm")}) / " +
      s"(${d(s"n_$arm")} * (${d(s"n_$arm")} - 1.0)) END"
  }

  /** Arm mean in original units, rounded to 4. */
  private[graft] def welchMeanSql(arm: String, quantScale: Long): String =
    s"CASE WHEN n_$arm > 0 THEN round(${d(s"s_$arm")} / " +
      s"${d(s"n_$arm")} / $quantScale.0, 4) END"

  private def sea = s"(va / ${d("n_a")})"
  private def seb = s"(vb / ${d("n_b")})"
  private def se2 = s"($sea + $seb)"
  private def tested = s"va IS NOT NULL AND vb IS NOT NULL AND $se2 > 0.0"

  /** Welch t statistic (B − A), rounded to 4. */
  private[graft] def welchTSql: String =
    s"CASE WHEN $tested THEN " +
      s"round((${d("s_b")} / ${d("n_b")} - ${d("s_a")} / ${d("n_a")}) " +
      s"/ sqrt($se2), 4) END"

  /** Welch–Satterthwaite degrees of freedom, rounded to 4. */
  private[graft] def welchDfSql: String =
    s"CASE WHEN $tested THEN round(($se2 * $se2) / " +
      s"(($sea * $sea) / (${d("n_a")} - 1.0) + " +
      s"($seb * $seb) / (${d("n_b")} - 1.0)), 4) END"

  private[graft] def splitBase: Long = K

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    * Walker 2013) — [[welchTTest]]'s power upgrade: regress the
    * in-experiment metric y on a PRE-experiment covariate x (same
    * user, before assignment — guaranteed independent of treatment),
    * report the covariate-adjusted lift
    *   liftₐ = Δȳ − θ·Δx̄,  θ = cov(x,y)/var(x)  (pooled)
    * and the variance ratio 1 − ρ²(x,y) — how much narrower the
    * confidence interval gets for free.
    *
    * Exactness: same contract as [[welchTTest]] — all moments
    * (including the x·y cross term) are exact hi/lo-split long sums
    * over `round(value·quantScale)` integers from ONE conditional
    * aggregate; POOLED moments are integer SUMS of the two arms'
    * sums, so pooling costs nothing and stays exact. θ, lifts, and
    * the ratio are one fixed-shape double chain mirrored textually by
    * the oracle. Callers aggregating y upstream (e.g. revenue per
    * user) should sum pre-quantized longs and pass quantScale = 1 —
    * an upstream DOUBLE sum would already be shuffle-order dependent
    * before the operator sees it.
    *
    * Output: (n_a, n_b, lift, theta, adj_lift, var_ratio); lift and
    * adj_lift in original units rounded to 4, theta rounded to 6,
    * var_ratio rounded to 4. theta/adj_lift/var_ratio are NULL when
    * the pooled covariate (resp. either moment) has zero variance.
    * NULL variant/metric/covariate rows are excluded listwise. */
  def cuped(df: DataFrame, variant: Column, metric: Column,
      covariate: Column, quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val base = df.filter(variant.isNotNull && metric.isNotNull &&
        covariate.isNotNull)
      .select(variant.as("_v"),
        round(metric * quantScale).cast("long").as("qy"),
        round(covariate * quantScale).cast("long").as("qx"))
    def hiLo(pred: String, p: String, name: String) = Seq(
      expr(s"sum(CASE WHEN $pred THEN (($p) - pmod($p, ${K}L)) " +
        s"div ${K}L ELSE 0L END)").as(s"${name}_hi"),
      expr(s"sum(CASE WHEN $pred THEN pmod($p, ${K}L) ELSE 0L END)")
        .as(s"${name}_lo"))
    def armSums(arm: String, pred: String) = Seq(
      expr(s"sum(CASE WHEN $pred THEN 1L ELSE 0L END)").as(s"n_$arm"),
      expr(s"sum(CASE WHEN $pred THEN qy ELSE 0L END)").as(s"sy_$arm"),
      expr(s"sum(CASE WHEN $pred THEN qx ELSE 0L END)").as(s"sx_$arm")) ++
      hiLo(pred, "qy * qy", s"yy_$arm") ++
      hiLo(pred, "qx * qx", s"xx_$arm") ++
      hiLo(pred, "qx * qy", s"xy_$arm")
    val sums = armSums("a", "NOT _v") ++ armSums("b", "_v")
    base.agg(sums.head, sums.tail: _*)
      .select(col("n_a"), col("n_b"),
        expr(cupedLiftSql(quantScale)).as("lift"),
        expr(cupedThetaSql).as("theta"),
        expr(cupedAdjLiftSql(quantScale)).as("adj_lift"),
        expr(cupedVarRatioSql).as("var_ratio"))
  }

  // CUPED's shared expression text (over the 18 integer sum columns).
  // Pooled moments are long ADDS of the per-arm sums; hi/lo halves add
  // componentwise, so the recombine stays exact.
  private def rec2(name: String) =
    s"(${d(s"${name}_a_hi + ${name}_b_hi")} * $K + " +
      s"${d(s"${name}_a_lo + ${name}_b_lo")})"
  private def pooledN = d("n_a + n_b")
  private def varxNum =
    s"($pooledN * ${rec2("xx")} - ${d("sx_a + sx_b")} * ${d("sx_a + sx_b")})"
  private def varyNum =
    s"($pooledN * ${rec2("yy")} - ${d("sy_a + sy_b")} * ${d("sy_a + sy_b")})"
  private def covNum =
    s"($pooledN * ${rec2("xy")} - ${d("sx_a + sx_b")} * ${d("sy_a + sy_b")})"
  private def dMeanY = s"(${d("sy_b")} / ${d("n_b")} - ${d("sy_a")} / ${d("n_a")})"
  private def dMeanX = s"(${d("sx_b")} / ${d("n_b")} - ${d("sx_a")} / ${d("n_a")})"

  /** Raw lift Δȳ in original units, rounded to 4. */
  private[graft] def cupedLiftSql(quantScale: Long): String =
    s"CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      s"round($dMeanY / $quantScale.0, 4) END"

  /** θ = pooled cov(x,y)/var(x), rounded to 6. */
  private[graft] def cupedThetaSql: String =
    s"CASE WHEN $varxNum > 0.0 THEN round($covNum / $varxNum, 6) END"

  /** Adjusted lift Δȳ − θ·Δx̄ in original units, rounded to 4. */
  private[graft] def cupedAdjLiftSql(quantScale: Long): String =
    s"CASE WHEN n_a > 0 AND n_b > 0 AND $varxNum > 0.0 THEN " +
      s"round(($dMeanY - ($covNum / $varxNum) * $dMeanX) / " +
      s"$quantScale.0, 4) END"

  /** Variance ratio 1 − ρ²(x,y), rounded to 4. */
  private[graft] def cupedVarRatioSql: String =
    s"CASE WHEN $varxNum > 0.0 AND $varyNum > 0.0 THEN " +
      s"round(1.0 - ($covNum * $covNum) / ($varxNum * $varyNum), 4) END"

  /** Two-period difference-in-differences (Card & Krueger 1994 shape)
    * — the quasi-experimental readout when assignment ISN'T random:
    *   DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
    * the treatment effect under parallel trends, with the unpooled SE
    *   se = √(Σ_cells s²/n)  and  t = DiD/se
    * (the four-cell Welch form — no equal-variance assumption, same
    * safety rationale as [[welchTTest]]).
    *
    * Exactness: the [[welchTTest]] contract verbatim — all four cells'
    * moments come from ONE conditional aggregate as exact hi/lo-split
    * long sums over `round(value·quantScale)` integers (same bounds);
    * DiD/se/t are one fixed-shape double chain mirrored by the oracle.
    *
    * Output: per-cell (n_c0, n_c1, n_t0, n_t1) and means (original
    * units, round 4), then (did, se, t_stat) — did NULL when any cell
    * is empty; se/t NULL when any cell has < 2 rows or all variance
    * is zero. NULL group/period/value rows are excluded listwise. */
  def diffInDiff(df: DataFrame, treated: Column, post: Column,
      value: Column, quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val base = df.filter(treated.isNotNull && post.isNotNull &&
        value.isNotNull)
      .select(treated.as("_t"), post.as("_p"),
        round(value * quantScale).cast("long").as("q"))
    // coalesce(…, 0): an all-empty input must report zero counts/sums,
    // not NULL longs that throw on read (the RankTest empty-input
    // contract anovaF/srmCheck/ksTest follow)
    def cellSums(cell: String, pred: String) = Seq(
      expr(s"coalesce(sum(CASE WHEN $pred THEN 1L ELSE 0L END), 0L)")
        .as(s"n_$cell"),
      expr(s"coalesce(sum(CASE WHEN $pred THEN q ELSE 0L END), 0L)")
        .as(s"s_$cell"),
      expr(s"sum(CASE WHEN $pred THEN ((q * q) - pmod(q * q, ${K}L)) " +
        s"div ${K}L ELSE 0L END)").as(s"ss_${cell}_hi"),
      expr(s"sum(CASE WHEN $pred THEN pmod(q * q, ${K}L) ELSE 0L END)")
        .as(s"ss_${cell}_lo"))
    val sums = cellSums("c0", "NOT _t AND NOT _p") ++
      cellSums("c1", "NOT _t AND _p") ++
      cellSums("t0", "_t AND NOT _p") ++
      cellSums("t1", "_t AND _p")
    val m = base.agg(sums.head, sums.tail: _*)
    // stage the four unpooled variances once (welchVarSql's shape per
    // cell), then the report chain reads only staged columns
    val staged = m.select(
      col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
      col("s_c0"), col("s_c1"), col("s_t0"), col("s_t1"),
      expr(welchVarSql("c0")).as("v_c0"), expr(welchVarSql("c1")).as("v_c1"),
      expr(welchVarSql("t0")).as("v_t0"), expr(welchVarSql("t1")).as("v_t1"))
    staged.select(
      col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1"),
      expr(welchMeanSql("c0", quantScale)).as("mean_c0"),
      expr(welchMeanSql("c1", quantScale)).as("mean_c1"),
      expr(welchMeanSql("t0", quantScale)).as("mean_t0"),
      expr(welchMeanSql("t1", quantScale)).as("mean_t1"),
      expr(didSql(quantScale)).as("did"),
      expr(didSeSql(quantScale)).as("se"),
      expr(didTSql).as("t_stat"))
  }

  // DiD's shared expression text (over n_*/s_* and the staged v_*)
  private def didCells = Seq("c0", "c1", "t0", "t1")
  private def didAllCells = didCells.map(c => s"n_$c > 0").mkString(" AND ")
  private def didNum =
    s"((${d("s_t1")} / ${d("n_t1")} - ${d("s_t0")} / ${d("n_t0")}) - " +
      s"(${d("s_c1")} / ${d("n_c1")} - ${d("s_c0")} / ${d("n_c0")}))"
  private def didSe2 =
    didCells.map(c => s"(v_$c / ${d(s"n_$c")})").mkString(" + ")
  private def didTested =
    didCells.map(c => s"v_$c IS NOT NULL").mkString(" AND ") +
      s" AND ($didSe2) > 0.0"

  /** DiD point estimate in original units, rounded to 4. */
  private[graft] def didSql(quantScale: Long): String =
    s"CASE WHEN $didAllCells THEN round($didNum / $quantScale.0, 4) END"

  /** Unpooled four-cell standard error in original units, rounded 4. */
  private[graft] def didSeSql(quantScale: Long): String =
    s"CASE WHEN $didTested THEN " +
      s"round(sqrt($didSe2) / $quantScale.0, 4) END"

  /** t = DiD/se, rounded to 4 (unitless — quant scale cancels). */
  private[graft] def didTSql: String =
    s"CASE WHEN $didTested THEN round($didNum / sqrt($didSe2), 4) END"

  /** One-way ANOVA F-test across k groups (Fisher 1925) — does ANY
    * group mean differ? The k-arm generalization the pairwise tests
    * ([[welchTTest]], [[proportionTest]]) can't answer without
    * multiple-comparison inflation; the experiment platform's first
    * read on a k-variant test.
    *
    * Exactness: per-group moments (n, Σq, Σq² hi/lo-split) are exact
    * long sums from ONE grouped aggregate (the [[welchTTest]]
    * contract per group); each group's Σq² reconstruction and
    * s_g²/n_g contribution is then a deterministic per-group double
    * quantized to DECIMAL(28,6) BEFORE the cross-group sum (the
    * Contingency/t12 recipe — float sums don't commute, decimal sums
    * do), and
    *   SSB = Σ_g s_g²/n_g − S²/N,  SSW = Σq² − Σ_g s_g²/n_g,
    *   F = (SSB/(k−1)) / (SSW/(N−k))
    * is one fixed-shape double chain. Term bound: DECIMAL(28,6)'s 22
    * integer digits hold Σq² per group to ~10²².
    *
    * Scale shape: one map-side-combinable shuffle to the groups-sized
    * frame, a 1-row reduce. Output: (k, n, f_stat, df1, df2) — F NULL
    * when k < 2, N ≤ k, or SSW is 0 (no within-group variance).
    * NULL group/value rows are excluded listwise. */
  def anovaF(df: DataFrame, group: Column, value: Column,
      quantScale: Long = 100L): DataFrame = {
    require(quantScale > 0, "quantScale must be positive")
    val perGroup = df.filter(group.isNotNull && value.isNotNull)
      .select(group.as("_g"),
        round(value * quantScale).cast("long").as("q"))
      .groupBy("_g").agg(
        count(lit(1)).as("ng"),
        sum(col("q")).as("sg"),
        expr(s"sum(((q * q) - pmod(q * q, ${K}L)) div ${K}L)")
          .as("qq_hi"),
        expr(s"sum(pmod(q * q, ${K}L))").as("qq_lo"))
    // coalesce(…, 0): an all-empty input must report zero counts, not
    // NULL longs that throw on read (the RankTest empty-input contract)
    perGroup.agg(
        count(lit(1)).as("k"),
        coalesce(sum(col("ng")), lit(0L)).cast("long").as("n"),
        coalesce(sum(col("sg")), lit(0L)).cast("long").as("_s"),
        expr(s"sum(CAST($anovaQqTermSql AS DECIMAL(28,6)))").as("_qq"),
        expr(s"sum(CAST($anovaBTermSql AS DECIMAL(28,6)))").as("_b"))
      .select(col("k"), col("n"),
        expr(anovaFSql).as("f_stat"),
        expr("CASE WHEN k >= 2 THEN k - 1 END").as("df1"),
        expr("CASE WHEN n > k THEN n - k END").as("df2"))
  }

  /** Experiment SIZING (power analysis) — the question every team asks
    * BEFORE launching what [[proportionTest]] later reads: how many
    * users per arm to detect a relative lift of `mde` on the current
    * baseline rate with α = .05 two-sided and 80% power? The classic
    * two-proportion normal-approximation form (Fleiss, Statistical
    * Methods for Rates and Proportions):
    *   n/arm = ⌈( z_{α/2}·√(2p̄(1−p̄)) + z_β·√(p1(1−p1)+p2(1−p2)) )²
    *           / (p2−p1)²⌉,   p2 = p1(1+mde),  p̄ = (p1+p2)/2.
    *
    * Exactness: the baseline comes from ONE conditional-count aggregate
    * (exact integers); per MDE the estimate is one fixed-shape double
    * chain over (conv, n, mde_ppm) with literal z constants, mirrored
    * textually by the oracle — identical IEEE ops, so even the ⌈…⌉
    * boundary cannot drift between engines. `p1_ppm` rides as the
    * exact floor-division integer.
    *
    * Scale shape: one map-side-combinable aggregate to a 1-row frame,
    * crossJoined with the |mdes|-row literal rider (the f10 class).
    * Output per mde: (mde_ppm, n, conv, p1_ppm, n_per_arm); n_per_arm
    * NULL when the baseline is degenerate (no users, rate 0 or 1, or
    * p2 ≥ 1 — no test exists). NULL converted counts as not converted;
    * the caller's user frame decides who is in scope. */
  def powerMde(users: DataFrame, converted: Column,
      mdesPpm: Seq[Long]): DataFrame = {
    // no upper bound: a >100% relative lift is a well-posed sizing
    // question on a low baseline (p2 = p1·(1+mde) just has to stay
    // below 1, and the chain's p2 < 1.0 guard NULLs the rest)
    require(mdesPpm.nonEmpty && mdesPpm.forall(_ > 0),
      "relative MDEs must be positive ppm")
    val spark = users.sparkSession
    import spark.implicits._
    val base = users.agg(
      coalesce(sum(when(coalesce(converted, lit(false)), 1L)
        .otherwise(0L)), lit(0L)).as("conv"),
      count(lit(1)).as("n"))
    base.crossJoin(broadcast(mdesPpm.toDF("mde_ppm")))
      .select(col("mde_ppm"), col("n"), col("conv"),
        expr("CASE WHEN n > 0 THEN (1000000 * conv) div n END")
          .as("p1_ppm"),
        expr(powerNArmSql).as("n_per_arm"))
      .orderBy("mde_ppm")
  }

  // power's shared expression text over (conv, n, mde_ppm); z_{.025}
  // and z_{.20} as literals — the chain must be char-identical in both
  // engines for the ceil boundary to be safe
  private def p1D = s"(${d("conv")} / ${d("n")})"
  private def p2D = s"($p1D * (1.0 + ${d("mde_ppm")} / 1000000.0))"
  private def pbD = s"(($p1D + $p2D) / 2.0)"
  // the numerator is squared EXPLICITLY ((e)*(e), not pow(e, 2)):
  // pow is not a correctly-rounded IEEE op, so two libms may disagree
  // by an ulp — +,*,/ and sqrt are exactly rounded everywhere, which
  // is what keeps the ceil boundary engine-safe
  private def powerNumE: String =
    s"(1.959964 * sqrt(2.0 * $pbD * (1.0 - $pbD)) + " +
      s"0.841621 * sqrt($p1D * (1.0 - $p1D) + $p2D * (1.0 - $p2D)))"
  private[graft] def powerNArmSql: String =
    s"CASE WHEN n > 0 AND conv > 0 AND conv < n AND $p2D < 1.0 THEN " +
      s"CAST(ceil(($powerNumE * $powerNumE) " +
      s"/ (($p2D - $p1D) * ($p2D - $p1D))) AS BIGINT) END"

  /** Always-valid sequential monitoring (mSPRT; Johari, Koomen,
    * Pekelis & Walsh 2017 — "peeking" made safe): the per-look readout
    * an experiment DASHBOARD needs, where [[proportionTest]]'s fixed-n
    * p-value is invalid the moment anyone acts on an interim look.
    * Normal-mixture sequential probability ratio per look d:
    *   Λ_d = √(V_d/(V_d+τ²)) · exp(Δ_d²·τ² / (2·V_d·(V_d+τ²))),
    * with Δ_d the arms' rate difference, V_d the pooled two-proportion
    * variance at look d, τ² the mixture prior; the always-valid
    * p-value is the running min over looks of 1/Λ (capped at 1) —
    * valid at EVERY look simultaneously, by construction.
    *
    * Exactness: per-look cumulative counts are exact integers (one
    * (day, arm) count shuffle, then a cumulative window over the
    * DAY-sized frame — bounded by looks, never by users); Λ and p are
    * one fixed-shape double chain over those integers, mirrored
    * textually by the oracle (√, ·, / exactly rounded; exp is the same
    * libm-ulp exposure the repo's ln-based gates already carry, hidden
    * behind round()).
    *
    * FILTRATION-ADAPTED, which is what makes the guarantee real: a
    * user enters the denominators at their `day` (enrollment) look and
    * the numerators only at `convertedDay` (when the conversion became
    * VISIBLE) — a look never counts a conversion that hadn't happened
    * yet (the ever-converted shortcut silently breaks the type-I
    * guarantee the test exists for). A convertedDay before enrollment
    * is clamped to the enrollment look.
    *
    * Output per look (looks = every day an enrollment or a conversion
    * lands): (d, n_a, conv_a, n_b, conv_b, lambda, p_av) — lambda and
    * p_av rounded 4; both NULL while a look's arms are degenerate (an
    * empty arm or pooled rate 0/1 — no test, and a NULL look
    * contributes nothing to the running min). NULL variant/day rows
    * are excluded; NULL convertedDay means never converted. */
  def msprt(users: DataFrame, variant: Column, day: Column,
      convertedDay: Column, tau2: Double = 1e-4): DataFrame = {
    require(tau2 > 0, "tau2 must be positive")
    import org.apache.spark.sql.expressions.Window
    val base = users.filter(variant.isNotNull && day.isNotNull)
      .select(day.as("_d"), variant.as("_v"),
        when(convertedDay.isNotNull, greatest(day, convertedDay))
          .as("_cd"))
    val enr = base.groupBy(col("_d").as("d")).agg(
      sum(when(!col("_v"), 1L).otherwise(0L)).as("da"),
      sum(when(col("_v"), 1L).otherwise(0L)).as("db"))
    val conv = base.filter(col("_cd").isNotNull)
      .groupBy(col("_cd").as("d")).agg(
        sum(when(!col("_v"), 1L).otherwise(0L)).as("dca"),
        sum(when(col("_v"), 1L).otherwise(0L)).as("dcb"))
    val daily = enr.join(conv, Seq("d"), "full")
      .select(col("d"),
        coalesce(col("da"), lit(0L)).as("da"),
        coalesce(col("dca"), lit(0L)).as("dca"),
        coalesce(col("db"), lit(0L)).as("db"),
        coalesce(col("dcb"), lit(0L)).as("dcb"))
    // looks-sized cumulative window (the HistogramQuantile bounded-
    // single-task discipline: one row per day, never per user)
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("d"),
      sum("da").over(w).as("n_a"), sum("dca").over(w).as("conv_a"),
      sum("db").over(w).as("n_b"), sum("dcb").over(w).as("conv_b"))
    val lam = cum.withColumn("lambda", expr(msprtLambdaSql(tau2)))
    lam.withColumn("p_av", expr(msprtPSql))
      .select(col("d"), col("n_a"), col("conv_a"), col("n_b"),
        col("conv_b"), round(col("lambda"), 4).as("lambda"),
        round(col("p_av"), 4).as("p_av"))
      .orderBy("d")
  }

  // mSPRT's shared expression text over the cumulative integer columns
  // (n_a, conv_a, n_b, conv_b) + the literal τ². V is the pooled
  // two-proportion variance (proportionTest's z denominator, squared).
  private def mDelta =
    s"(${d("conv_b")} / ${d("n_b")} - ${d("conv_a")} / ${d("n_a")})"
  private def mPool = s"(${d("conv_a + conv_b")} / ${d("n_a + n_b")})"
  private def mV =
    s"($mPool * (1.0 - $mPool) * (1.0 / ${d("n_a")} + 1.0 / ${d("n_b")}))"
  private def mTested =
    "n_a > 0 AND n_b > 0 AND conv_a + conv_b > 0 AND " +
      "conv_a + conv_b < n_a + n_b"
  private[graft] def msprtLambdaSql(tau2: Double): String =
    s"CASE WHEN $mTested THEN " +
      s"sqrt($mV / ($mV + $tau2)) * " +
      s"exp(($mDelta * $mDelta) * $tau2 / " +
      s"(2.0 * $mV * ($mV + $tau2))) END"
  /** Always-valid p at each look: min(1, 1/max_{d'≤d} Λ) via a running
    * max window over the looks-sized frame (NULL looks ignored). */
  private[graft] def msprtPSql: String =
    "CASE WHEN max(lambda) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED " +
      "PRECEDING AND CURRENT ROW) IS NOT NULL THEN " +
      "least(1.0, 1.0 / max(lambda) OVER (ORDER BY d ROWS BETWEEN " +
      "UNBOUNDED PRECEDING AND CURRENT ROW)) END"

  /** Sample-ratio-mismatch guard (Fabijan et al. 2019) — the health
    * check an experiment platform runs BEFORE reading any metric: if
    * the realized A/B split is improbably far from the assignment
    * ratio, the randomization is broken (bot filtering, redirect
    * loss, logging drop) and every downstream readout is invalid.
    * χ² goodness-of-fit with df = 1 against `expectedBppm` (B's
    * intended share in ppm):
    *   χ² = (n_a − E_a)²/E_a + (n_b − E_b)²/E_b,
    * one fixed double chain over the exact counts; `srm` flags
    * χ² > 3.84 (α = .05). Counts come from ONE conditional aggregate.
    * NULL variant rows are excluded listwise (they are themselves a
    * logging-loss signal — count them upstream). */
  def srmCheck(df: DataFrame, variant: Column,
      expectedBppm: Long = 500000L): DataFrame = {
    require(expectedBppm > 0 && expectedBppm < 1000000,
      "expectedBppm must be in (0, 1e6)")
    df.filter(variant.isNotNull).select(variant.as("_v"))
      .agg(expr("sum(CASE WHEN NOT _v THEN 1L ELSE 0L END)").as("n_a"),
        expr("sum(CASE WHEN _v THEN 1L ELSE 0L END)").as("n_b"))
      .select(
        expr("coalesce(n_a, 0L)").as("n_a"),
        expr("coalesce(n_b, 0L)").as("n_b"))
      .select(col("n_a"), col("n_b"),
        lit(expectedBppm).as("expected_b_ppm"),
        expr(srmChiSql(expectedBppm)).as("chi2"),
        expr(s"${srmChiSql(expectedBppm)} > 3.84").as("srm"))
  }

  /** SRM χ² text over (n_a, n_b) — E from the expected split. */
  private[graft] def srmChiSql(expectedBppm: Long): String = {
    val n = s"(${d("n_a")} + ${d("n_b")})"
    val eb = s"($n * $expectedBppm.0 / 1000000.0)"
    val ea = s"($n - $eb)"
    s"CASE WHEN n_a + n_b > 0 THEN " +
      s"round((${d("n_a")} - $ea) * (${d("n_a")} - $ea) / $ea + " +
      s"(${d("n_b")} - $eb) * (${d("n_b")} - $eb) / $eb, 4) END"
  }

  // ANOVA's shared expression text. Per-group terms are deterministic
  // double chains over that group's exact integers, decimal-quantized
  // before the cross-group sum; F reads the two decimal sums + the
  // exact integer totals.
  private[graft] def anovaQqTermSql: String =
    s"${d("qq_hi")} * $K + ${d("qq_lo")}"
  private[graft] def anovaBTermSql: String =
    s"(${d("sg")} * ${d("sg")}) / ${d("ng")}"
  private[graft] def anovaFSql: String = {
    val ssb = s"(${d("_b")} - (${d("_s")} * ${d("_s")}) / ${d("n")})"
    val ssw = s"(${d("_qq")} - ${d("_b")})"
    s"CASE WHEN k >= 2 AND n > k AND $ssw > 0.0 THEN " +
      s"round(($ssb / (${d("k")} - 1.0)) / ($ssw / (${d("n")} - " +
      s"${d("k")})), 4) END"
  }
}

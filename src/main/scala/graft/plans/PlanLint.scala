package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Pre-flight plan linter: the checks PlanQualitySpec enforces on the
  * engine's own queries, packaged for users' queries — run it before
  * submitting a plan that will touch 100 TB, because every finding
  * below is cheap to see in a plan string and catastrophically
  * expensive to discover in a running job.
  *
  * Heuristics on the FORMATTED physical plan (pre-execution, so AQE
  * runtime fixes are not yet visible — a finding means "the static
  * plan starts this way"):
  *  - `cartesian-product` / `nested-loop-join`: O(n·m) join paths; at
  *    fact-table sizes these never finish. (Tiny intentional riders —
  *    a 1-row corpus-stats crossJoin — are the caller's judgment; the
  *    finding reports, it does not forbid.)
  *  - `unpushed-filter`: a Filter sits in the plan while some scan
  *    reports no pushed filters — the scan reads rows the query then
  *    throws away; usually a cast/UDF wrapped the predicate column.
  *  - `no-codegen`: no WholeStageCodegen stage at all — the hot path
  *    is interpreted (typical cause: a UDF or a non-codegen expression
  *    in every projection).
  */
object PlanLint {

  case class Finding(rule: String, detail: String)

  def lint(df: DataFrame): Seq[Finding] = {
    val formatted = df.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    val out = Seq.newBuilder[Finding]
    if (formatted.contains("CartesianProduct"))
      out += Finding("cartesian-product",
        "plan contains CartesianProduct — O(n*m) pairs; add an equi-join " +
          "key or broadcast an intentionally-tiny side")
    if (formatted.contains("BroadcastNestedLoopJoin"))
      out += Finding("nested-loop-join",
        "plan contains BroadcastNestedLoopJoin — non-equi join condition; " +
          "bin/bucket the range predicate into an equi key (see RangeJoin)")
    // formatted output OMITS the PushedFilters line entirely when a file
    // scan pushes nothing, so the signal is: a Filter node present while
    // some file-scan block carries no PushedFilters line at all
    val hasFilter = formatted.linesIterator
      .exists(l => l.trim.startsWith("(") && l.contains(" Filter ") ||
        l.trim.startsWith("* Filter") || l.trim.startsWith("+- Filter") ||
        l.trim.startsWith("+- * Filter"))
    val scanBlocks = formatted.split("\n\n")
      .filter(_.linesIterator.exists(_.trim.matches("""\(\d+\) Scan (parquet|orc|csv|json).*""")))
    val unpushedScan = scanBlocks.exists(b => !b.contains("PushedFilters:"))
    if (hasFilter && scanBlocks.nonEmpty && unpushedScan)
      out += Finding("unpushed-filter",
        "a Filter runs while a file scan pushes no filters — the scan " +
          "reads rows the filter discards; check for casts/UDFs on the " +
          "predicate column")
    // codegen ids only materialize in a finalized plan: under an
    // un-finalized AdaptiveSparkPlan the absence proves nothing, so the
    // rule applies only to non-adaptive (or already-executed) plans
    if (!formatted.contains("AdaptiveSparkPlan") &&
        !formatted.contains("codegen id"))
      out += Finding("no-codegen",
        "no WholeStageCodegen stage in the plan — the hot path is " +
          "interpreted; replace UDFs/non-codegen expressions with " +
          "built-ins or a doGenCode Expression")
    out.result()
  }
}

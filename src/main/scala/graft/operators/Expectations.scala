package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite — the contract-validation report a
  * pipeline runs before trusting a load (the reference validates every
  * field before upsert and quarantines bad rows; this is the same idea
  * lifted to declared table-level expectations, in the style of
  * public expectation frameworks: not-null, uniqueness, domain ranges,
  * referential integrity).
  *
  * Scale shape: all row-level expectations on one table fold into ONE
  * conditional-sum aggregate — a single scan regardless of how many
  * checks are declared (`sum(CASE WHEN violated THEN 1 ELSE 0 END)`
  * per check, map-side combined). Uniqueness is one groupBy on the key
  * (count of over-represented keys); referential integrity is one
  * anti-join per FK (broadcast when the parent is a dim). Nothing is
  * collected; the report is checks-sized.
  */
object Expectations {

  /** One row-level expectation: `name` plus the VIOLATION predicate
    * (true ⟹ the row fails the expectation). */
  final case class RowCheck(name: String, violated: Column)

  /** Per-table report (check, violations) from declared row checks —
    * one aggregate scan for all of them. */
  def rowChecks(df: DataFrame, table: String,
      checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val sums = checks.map(c =>
      sum(when(c.violated, 1L).otherwise(0L)).as(c.name))
    val one = df.agg(sums.head, sums.tail: _*)
    // melt the 1×N aggregate row to (check, violations) rows
    one.select(explode(array(checks.map(c =>
        struct(lit(c.name).as("check"), col(c.name).as("violations"))): _*))
      .as("kv"))
      .select(lit(table).as("table_name"), col("kv.check"),
        col("kv.violations"))
  }

  /** Uniqueness: number of rows carrying a duplicated key (0 when the
    * key is unique). */
  def uniqueCheck(df: DataFrame, table: String, name: String,
      keyCols: Seq[String]): DataFrame = {
    val extra = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_c"))
      .filter(col("_c") > 1)
      .agg(coalesce(sum(col("_c") - 1), lit(0L)).as("violations"))
    extra.select(lit(table).as("table_name"), lit(name).as("check"),
      col("violations"))
  }

  /** Referential integrity: child rows whose FK value has no parent
    * (NULL FKs are exempt — that's a not-null check's job). */
  def fkCheck(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, table: String, name: String): DataFrame = {
    val orphans = child.filter(col(childCol).isNotNull)
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphans.select(lit(table).as("table_name"), lit(name).as("check"),
      col("violations"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 build (Kimball): compress an
  * observation stream into validity intervals — one row per (entity,
  * attribute-value run) with `effective_from` / `effective_to` /
  * `is_current`. The reference's sales domain observes a customer's
  * state on every order (`square_service` re-reads the customer row per
  * sync); the warehouse-side question is "what was the value WHEN",
  * which only an interval dimension answers.
  *
  * Shape: everything happens inside ONE hash partitioning by entity —
  * the change flag (lag), the run id (running sum), the run rollup
  * (groupBy entity+run), and the interval close (lead) all share the
  * same `PARTITION BY entity` layout, so Spark plans a single Exchange
  * and four window/agg passes over sorted runs. At 100 TB the entity
  * key is the natural partitioner (millions of entities, bounded
  * observations each); no global sort, no driver state.
  *
  * Determinism: observation order is (ts, tieCol) — a total order — so
  * run boundaries, and therefore every interval, replay bit-for-bit in
  * any engine.
  */
object Scd {

  /** Compress (entity, ts, value) observations to SCD2 intervals.
    * `tieCol` breaks equal-ts observations (must make the order total).
    * `effective_to` is the next run's start (NULL on the open/current
    * run); consecutive observations with equal `value` collapse into
    * one interval. */
  def type2(obs: DataFrame, entity: String, ts: String, value: String,
      tieCol: String): DataFrame = {
    // the output projects `entity` alongside fixed aliases — an entity
    // column named like one of them (or like the internal run columns)
    // would emit duplicate/shadowed columns and a silently wrong frame
    val reserved = Set("value", "version", "effective_from",
      "effective_to", "is_current", "n_obs", "_chg", "_run")
    require(!reserved(entity),
      s"entity column '$entity' collides with an output/internal name")
    val ord = Window.partitionBy(entity).orderBy(col(ts), col(tieCol))
    // change flag: first observation of the entity (EXPLICIT row_number
    // check — an entity whose first value is NULL would otherwise match
    // lag's NULL null-safely and start at version 0), or value differs
    // from the previous observation (null-safe — a NULL value run is a
    // run like any other)
    val flagged = obs.withColumn("_chg",
      when(row_number().over(ord) === 1, lit(1))
        .when(lag(col(value), 1).over(ord).eqNullSafe(col(value)), lit(0))
        .otherwise(lit(1)))
    val runs = flagged.withColumn("_run",
      sum(col("_chg")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    val intervals = runs.groupBy(col(entity), col("_run"))
      .agg(first(col(value)).as("value"), // constant within the run
        min(col(ts)).as("effective_from"),
        count(lit(1)).as("n_obs"))
    val byRun = Window.partitionBy(entity).orderBy(col("_run"))
    intervals
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byRun))
      .withColumn("is_current", col("effective_to").isNull)
      .withColumnRenamed("_run", "version")
      .select(col(entity), col("version"), col("value"),
        col("effective_from"), col("effective_to"), col("is_current"),
        col("n_obs"))
  }
}

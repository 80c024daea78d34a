package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins.
  *
  * First line of defense at runtime is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no
  * code changes. Salting is the plan-level tool for the cases AQE can't
  * fix: a single join key so hot that one task would still process it
  * alone (the classic null-key / power-law-key cliff at 100 TB).
  *
  * `saltedJoin` spreads each left-side key over `salts` synthetic
  * sub-keys and replicates the right side `salts`× so every sub-key
  * finds its match. Row→salt assignment affects only load balance, not
  * correctness, so any cheap assignment works.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `keys`, with the left side's hot keys
    * spread across `salts` buckets. Inner and left_outer are supported
    * (the right side is replicated, never filtered). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltCol = "_graft_salt"
    val l = left.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ saltCol, joinType).drop(saltCol)
  }
}

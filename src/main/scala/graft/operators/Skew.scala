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
  * result content — but it MUST be deterministic under task retry:
  * a nondeterministic salt (monotonically_increasing_id, rand) can
  * assign different salts to the same row when a lost upstream task is
  * recomputed, and shuffle replay then drops or duplicates rows. The
  * salt is therefore a hash of the row's non-key columns.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `keys`, with the left side's hot keys
    * spread across `salts` buckets. Inner and left_outer are supported
    * (the right side is replicated, never filtered).
    *
    * PRUNE BEFORE SALTING: the salt hashes every non-key column, so
    * passing an unpruned wide fact table defeats Catalyst's column
    * pruning — all columns ride through the hash and the salted
    * shuffle even if the downstream reads two. Project the left side
    * to the columns the query needs first (measured ~12% on the q29
    * gate for a 16-column fact → 2-column projection; the dominant
    * remaining cost there is the deliberate `salts`× replication). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val saltCol = "_graft_salt"
    val l = left.withColumn(saltCol, saltExpr(left, keys, salts))
    val r = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ saltCol, joinType).drop(saltCol)
  }

  /** Deterministic per-row salt in [0, salts): hash of the non-key
    * columns (falls back to all columns for a keys-only frame). Rows
    * identical in those columns share a salt — acceptable: they'd also
    * be identical join outputs, and balance only degrades if a hot KEY's
    * rows are near-duplicates in every other column too (documented
    * limitation: a hot key whose rows are constant in every non-key
    * column lands on one salt, same as unsalted).
    *
    * Map-typed columns are hashed via their string rendering: xxhash64
    * rejects MapType outright (map equality is order-insensitive, so
    * Spark disallows hashing it), which would otherwise turn a schema
    * with one map column into an AnalysisException (r2 advisor item).
    * The cast is per-row deterministic — entry order is whatever the
    * row already stores, and a retried task recomputes the same row. */
  private[operators] def saltExpr(left: DataFrame, keys: Seq[String],
      salts: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val schema = left.schema
    val nonKey = left.columns.filterNot(keys.contains)
    val pool = if (nonKey.nonEmpty) nonKey else left.columns
    val saltSrc = pool.map { c =>
      if (hasMap(schema(c).dataType)) col(c).cast("string") else col(c)
    }.toSeq
    pmod(xxhash64(saltSrc: _*), lit(salts.toLong)).cast("int")
  }
}

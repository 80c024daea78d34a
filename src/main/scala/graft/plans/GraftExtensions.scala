package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` —
  * then `SELECT cosine_sim(a, b)` works in plain SQL.
  * (The Column-level API in VectorOps does not require this.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(children(0), children(1))))
  }
}

object GraftExtensions {
  /** Runtime registration for sessions built without the extensions
    * config (it only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.classic.GraftColumnBridge.registerFunctions(spark)
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` —
  * then `SELECT cosine_sim(a, b)`, `simhash64(tokens)`,
  * `minhash_sig(shingles, 64)`, `minhash_sig_hashes(hashes, 64)`,
  * `winnow_fp(text, 5, 4)`, and the text-analysis compositions
  * `token_count(t)`, `subword_count(t)`, `quality_score(t)`,
  * `lang_id(t)`, `doc_fingerprint(t)`, `repetition_ratio(t, 2)` work
  * in plain SQL.
  * (The Column-level APIs in VectorOps/TextFunctions don't require this.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.builders

  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {
  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** Constant-fold an int argument (e.g. `minhash_sig(x, 64)`). */
  private def intArg(e: Expr, what: String): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, n: Int)(b: Seq[Expr] => Expr)
    : Seq[Expr] => Expr = es => {
    if (es.length != n) throw new IllegalArgumentException(
      s"$name requires $n argument(s), got ${es.length}")
    b(es)
  }

  /** Lift a Column→Column composition (built-ins over the argument)
    * into a SQL function builder; the composed tree resolves during
    * normal analysis like any hand-written SQL expression. */
  private def col1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
    : Seq[Expr] => Expr = { es =>
    import org.apache.spark.sql.classic.{GraftColumnBridge => bridge}
    // eager conversion: the lazy Column wrapper only resolves through
    // the Dataset API, not through FunctionRegistry-injected builders
    bridge.expressionEager(f(bridge.column(es.head)))
  }

  /** name → expression builder, shared by the extensions injection and
    * the runtime registration path. */
  val builders: Seq[(String, Seq[Expr] => Expr)] = Seq(
    "cosine_sim" -> arity("cosine_sim", 2)(es =>
      CosineSimilarity(es(0), es(1))),
    "simhash64" -> arity("simhash64", 1)(es => SimHash64(es(0))),
    "minhash_sig" -> arity("minhash_sig", 2)(es =>
      MinHashSignature(es(0), intArg(es(1), "numHashes"))),
    "minhash_sig_hashes" -> arity("minhash_sig_hashes", 2)(es =>
      MinHashSignatureOfHashes(es(0), intArg(es(1), "numHashes"))),
    "winnow_fp" -> arity("winnow_fp", 3)(es =>
      WinnowFingerprint(es(0), intArg(es(1), "k"), intArg(es(2), "w"))),
    // text-analysis compositions (pure built-ins; see TextFunctions)
    "token_count" ->
      arity("token_count", 1)(col1(graft.functions.TextFunctions.tokenCount)),
    "subword_count" ->
      arity("subword_count", 1)(col1(graft.functions.TextFunctions.subwordCount)),
    "quality_score" ->
      arity("quality_score", 1)(col1(graft.functions.TextFunctions.qualityScore)),
    "lang_id" ->
      arity("lang_id", 1)(col1(graft.functions.TextFunctions.langId)),
    "doc_fingerprint" ->
      arity("doc_fingerprint", 1)(col1(graft.functions.TextFunctions.fingerprint)),
    "repetition_ratio" -> arity("repetition_ratio", 2)(es =>
      col1(graft.functions.TextFunctions
        .repetitionRatio(_, intArg(es(1), "n")))(es.take(1))),
  )

  /** Runtime registration for sessions built without the extensions
    * config (it only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.classic.GraftColumnBridge.registerFunctions(spark)
}

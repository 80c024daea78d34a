package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizing table function (custom Catalyst `Generator` / UDTF): one
  * output row per whitespace token with its 0-based position — the
  * generator-shaped equivalent of `posexplode(split(...))`, emitted
  * lazily per row instead of materializing the token array.
  *
  * Null/empty/whitespace-only input generates zero rows (matching
  * `TextFunctions.tokens` semantics).
  */
case class Tokenize(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tokenize requires string, got ${t.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false)))

  override def prettyName: String = "tokenize"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].toString
        .split("\\s+").filter(_.nonEmpty)
      new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < toks.length
        override def next(): InternalRow = {
          val r = InternalRow(i, UTF8String.fromString(toks(i)))
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

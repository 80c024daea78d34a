package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

class CharEntropySpec extends SparkSpec {

  private def stats(texts: String*): Seq[(Long, Long, Double)] = {
    import spark.implicits._
    texts.toDF("text")
      .select(T.charEntropyStats(col("text")).as("e"))
      .select(col("e.n_chars"), col("e.n_distinct"), col("e.entropy"))
      .as[(Long, Long, Double)]
      .collect()
      .toSeq
  }

  test("counts code points and distinct code points") {
    // '语' is one code point (BMP); "ab 语c" = 5 chars, 5 distinct
    val Seq((n, nd, _)) = stats("ab 语c")
    assert(n === 5L && nd === 5L)
  }

  test("empty string yields (0, 0, 0.0) not nulls or -0.0") {
    val Seq((n, nd, e)) = stats("")
    assert(n === 0L && nd === 0L)
    assert(java.lang.Double.compare(e, 0.0) === 0)
  }

  test("single-repeated-char doc has zero entropy, rendered +0.0") {
    val Seq((n, nd, e)) = stats("aaaa")
    assert(n === 4L && nd === 1L)
    assert(java.lang.Double.compare(e, 0.0) === 0) // not -0.0
  }

  test("uniform alphabet entropy = ln(k)") {
    val Seq((_, nd, e)) = stats("abcd")
    assert(nd === 4L)
    assert(math.abs(e - math.log(4.0)) < 1e-9)
  }

  test("matches the relational explode+agg derivation on real docs") {
    import spark.implicits._
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(50).cache()
    val viaExpr = docs
      .select(col("doc_id"), T.charEntropyStats(col("text")).as("e"))
      .select(col("doc_id"), col("e.n_chars"), col("e.n_distinct"),
        round(col("e.entropy"), 4).as("entropy"))
    // relational form with the same decimal-quantized exact sum
    val ch = docs.select(col("doc_id"),
      explode(split(col("text"), "")).as("c"))
    val n = ch.groupBy("doc_id").agg(
      count(lit(1)).as("n_chars"),
      countDistinct(col("c")).as("n_distinct"))
    val viaAgg = ch.groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
      .join(n, "doc_id")
      .groupBy(col("doc_id"), col("n_chars"), col("n_distinct"))
      .agg(round(-sum(((col("k") / col("n_chars")) *
          log(col("k") / col("n_chars"))).cast("decimal(28,14)"))
        .cast("double"), 4).as("entropy"))
      .select("doc_id", "n_chars", "n_distinct", "entropy")
    assert(viaExpr.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaExpr).isEmpty)
    docs.unpersist()
  }
}

package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** Property-based invariants for the text primitives over random text
  * (mixed words, punctuation runs, whitespace runs, empties). */
class TextFunctionsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val wordGen = Gen.oneOf(
    "the", "cat", "Query", "spark!", "a", "...", "x1", "der", "le",
    "", " ", "\t", "word-with-dash")
  private val textGen: Gen[String] =
    Gen.listOfN(12, wordGen).map(_.mkString(" "))

  test("invariants: shingle count, quality range, fingerprint stability") {
    val prop = Prop.forAll(Gen.listOfN(20, textGen)) { texts =>
      val df = texts.toDF("text").select(
        T.tokenCount(col("text")).as("k"),
        size(T.wordShingles(col("text"), 3)).as("nsh"),
        T.qualityScore(col("text")).as("q"),
        T.fingerprint(col("text")).as("fp"),
        T.fingerprint(upper(concat(lit("  "), col("text"), lit(" "))))
          .as("fp_norm"))
        .collect()
      df.toSeq.map { r =>
        val (k, nsh, q) = (r.getInt(0), r.getInt(1), r.getDouble(2))
        val shingleLaw = if (k >= 3) nsh == k - 2
          else if (k > 0) nsh == 1 else nsh == 0
        val qLaw = q >= 0.0 && q <= 1.0
        // fingerprint invariant under case + outer/collapsed whitespace
        val fpLaw = r.getString(3) == r.getString(4)
        (shingleLaw :| s"shingles k=$k nsh=$nsh") &&
          (qLaw :| s"quality $q") && (fpLaw :| "fingerprint normalization")
      }.reduce(_ && _)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}

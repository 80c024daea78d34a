package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the RFC4180 semantics the src02 gate depends on: doubled
  * quotes unescape, quoted commas stay in-field, empty cells are NULL
  * for strings AND numerics, dates parse with the explicit schema. */
class CsvSourceSpec extends SparkSpec {

  private lazy val df = spark.read
    .schema("doc_id BIGINT, source STRING, lang STRING, " +
      "published DATE, title STRING, body STRING, score DOUBLE")
    .option("header", "true")
    .option("escape", "\"")
    .csv(graft.GraftSession.fixture("docs_export.csv"))

  test("doubled quotes unescape and quoted commas stay in-field") {
    val r4 = df.filter(col("doc_id") === 4).head()
    assert(r4.getString(5) ===
      "Body 4 has, commas, and \"nested \"\"quotes\"\" inside\", mixed")
    val r3 = df.filter(col("doc_id") === 3).head()
    assert(r3.getString(4) === "Doc 3, part \"3\"")
  }

  test("empty cells are NULL for strings and numerics; dates parse") {
    val r3 = df.filter(col("doc_id") === 3).head()
    assert(r3.isNullAt(2), "empty lang must read as NULL")
    val r6 = df.filter(col("doc_id") === 6).head()
    assert(r6.isNullAt(6), "empty score must read as NULL")
    assert(df.filter(col("published").isNull).count() === 0)
    assert(df.count() === 45)
  }

  test("trailing spaces inside unquoted fields survive") {
    val r1 = df.filter(col("doc_id") === 1).head()
    assert(r1.getString(5).endsWith("spaces  "))
  }
}

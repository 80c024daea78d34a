package graft.plans

import graft.SparkSpec

/** All custom expressions must be reachable from plain SQL. */
class GraftExtensionsSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("cosine_sim in SQL") {
    val r = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("simhash64 / minhash_sig / minhash_sig_hashes / winnow_fp in SQL") {
    val row = spark.sql(
      "SELECT simhash64(split('a b c', ' ')) AS sh, " +
        "minhash_sig(split('a b c', ' '), 8) AS mh, " +
        "minhash_sig_hashes(array(1L, 2L, 3L), 8) AS mhh, " +
        "winnow_fp('hello world hello', 5, 4) AS wf")
      .collect().head
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getSeq[Long](1).length === 8)
    assert(row.getSeq[Long](2).length === 8)
    assert(row.getSeq[Long](3).nonEmpty)
  }

  test("text-analysis compositions in SQL match the Column API") {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => T}
    import spark.implicits._
    val text = "The quick brown fox and the quick dog"
    val viaSql = spark.sql(
      s"SELECT token_count('$text') AS tc, subword_count('$text') AS sc, " +
        s"quality_score('$text') AS q, lang_id('$text') AS l, " +
        s"doc_fingerprint('$text') AS fp, " +
        s"repetition_ratio('$text', 2) AS rep").collect().head
    val viaApi = Seq(text).toDF("t").select(
      T.tokenCount(col("t")), T.subwordCount(col("t")),
      T.qualityScore(col("t")), T.langId(col("t")),
      T.fingerprint(col("t")), T.repetitionRatio(col("t"), 2))
      .collect().head
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql.getAs[String]("l") === "en")
  }

  test("registered SQL builder == Column API on identical input") {
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => T}
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT minhash_sig_hashes(transform(sequence(1, 5), x -> CAST(x AS LONG)), 16) AS s")
      .collect().head.getSeq[Long](0)
    val viaApi = Seq(Tuple1(Seq(1L, 2L, 3L, 4L, 5L))).toDF("h")
      .select(T.minHashSignatureOfHashes(col("h"), 16).as("s"))
      .collect().head.getSeq[Long](0)
    assert(viaSql === viaApi)
  }
}

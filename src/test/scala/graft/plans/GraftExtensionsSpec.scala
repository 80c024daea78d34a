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

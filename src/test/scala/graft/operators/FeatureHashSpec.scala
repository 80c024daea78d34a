package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  // independent reference: bucket/sign from java's own md5
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def refBucket(t: String, dim: Int): Long =
    java.lang.Long.parseLong(md5Hex(t).substring(0, 4), 16) % dim
  private def refSign(t: String): Long =
    if (java.lang.Long.parseLong(md5Hex(t).substring(4, 5), 16) % 2 == 0)
      1L else -1L

  test("bucket and sign match an independent md5 computation") {
    val toks = Seq("alpha", "beta", "gamma", "delta", "x1", "!?")
    val got = toks.toDF("token")
      .select(col("token"), FeatureHash.hashBucket(col("token"), 64),
        FeatureHash.sign(col("token")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    toks.foreach { t =>
      assert(got(t) === (refBucket(t, 64), refSign(t)), s"token $t")
    }
  }

  test("sparse vectors: repeated tokens accumulate signed counts") {
    val toks = Seq((1L, "alpha"), (1L, "alpha"), (1L, "alpha"))
      .toDF("id", "token")
    val row = FeatureHash.sparseVectors(toks, "id", "token", 64).head()
    assert(row.getLong(1) === refBucket("alpha", 64))
    assert(row.getLong(2) === 3L * refSign("alpha"))
    assert(row.getLong(3) === 3L)
  }

  test("colliding tokens of opposite sign cancel in val, not in count") {
    // find two distinct tokens hashing to the same bucket with
    // opposite signs — guaranteed to exist in a small scan
    val cands = (0 until 4000).map(i => s"tok$i")
    val byBucket = cands.groupBy(refBucket(_, 8))
    val (pos, neg) = byBucket.values.flatMap { g =>
      val p = g.find(refSign(_) == 1L)
      val n = g.find(refSign(_) == -1L)
      p.zip(n)
    }.head
    val toks = Seq((1L, pos), (1L, neg)).toDF("id", "token")
    val row = FeatureHash.sparseVectors(toks, "id", "token", 8).head()
    assert(row.getLong(2) === 0L && row.getLong(3) === 2L)
  }

  test("all buckets land inside the declared dimension") {
    val toks = (0 until 500).map(i => (1L, s"w$i")).toDF("id", "token")
    val stats = FeatureHash.sparseVectors(toks, "id", "token", 16)
      .agg(min("bucket"), max("bucket")).head()
    assert(stats.getLong(0) >= 0L && stats.getLong(1) <= 15L)
  }
}

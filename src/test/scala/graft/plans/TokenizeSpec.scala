package graft.plans

import org.apache.spark.sql.classic.{GraftColumnBridge => bridge}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private def tokenize(c: org.apache.spark.sql.Column) =
    bridge.column(Tokenize(bridge.expression(c))).as(Seq("pos", "token"))

  test("positions and tokens; empty/whitespace/null generate nothing") {
    val df = Seq((1L, "a  b\tc"), (2L, ""), (3L, "   "), (4L, null))
      .toDF("id", "t")
    val out = df.select($"id", tokenize($"t")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, 0, "a"), (1L, 1, "b"), (1L, 2, "c")))
  }

  test("agrees with posexplode(split) composition") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .limit(50)
    val gen = docs.select($"doc_id", tokenize($"text"))
    val composed = docs.select($"doc_id",
      posexplode(filter(split(trim($"text"), "\\s+"), t => t =!= "")))
      .toDF("doc_id", "pos", "token")
    assert(gen.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(gen).count() === 0)
  }
}

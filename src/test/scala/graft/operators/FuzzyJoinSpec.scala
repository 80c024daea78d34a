package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val canon = Seq(
    (1L, "grey metallic paint"),
    (2L, "green metallic paint"),
    (3L, "blue matte paint"),
    (4L, "blue matte varnish")).toDF("ck", "cname")

  test("matches within maxDist through the block; beyond-dist filtered") {
    val dirty = Seq((10L, "gery metallic paint")).toDF("dk", "dname") // swap = dist 2
    val got = FuzzyJoin.join(dirty, canon,
      col("dname"), col("cname"),
      FuzzyJoin.lastTokenBlock(col("dname")),
      FuzzyJoin.lastTokenBlock(col("cname")), maxDist = 2)
      .select("dk", "ck", "dist").as[(Long, Long, Int)].collect().toSet
    // "grey metallic paint" at dist 2 (transposition = 2 edits);
    // "green metallic paint" needs 3 edits; "blue matte paint" shares
    // the block but fails the length band
    assert(got === Set((10L, 1L, 2)))
  }

  test("different block never compared, even at dist 0") {
    val dirty = Seq((11L, "blue matte paint!")).toDF("dk", "dname")
    val got = FuzzyJoin.join(dirty, canon,
      col("dname"), col("cname"),
      FuzzyJoin.lastTokenBlock(col("dname")),
      FuzzyJoin.lastTokenBlock(col("cname")), maxDist = 2)
      .count()
    assert(got === 0L) // last token "paint!" != "paint"
  }

  test("length band prunes before levenshtein in the plan") {
    val dirty = Seq((12L, "x paint")).toDF("dk", "dname")
    val df = FuzzyJoin.join(dirty, canon,
      col("dname"), col("cname"),
      FuzzyJoin.lastTokenBlock(col("dname")),
      FuzzyJoin.lastTokenBlock(col("cname")), maxDist = 1)
    val plan = df.queryExecution.optimizedPlan.toString
    // the cheap length filter must appear (it guards the O(n*m) DP)
    assert(plan.contains("length"), plan)
    assert(df.count() === 0L)
  }

  test("null blocking values match nothing") {
    val dirty = Seq((13L, "   ")).toDF("dk", "dname") // no tokens → null block
    val got = FuzzyJoin.join(dirty, canon,
      col("dname"), col("cname"),
      FuzzyJoin.lastTokenBlock(col("dname")),
      FuzzyJoin.lastTokenBlock(col("cname")), maxDist = 2).count()
    assert(got === 0L)
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows of one hot key + a long tail, joined to a 3-row dim
  private lazy val facts = ((1 to 10000).map(i => ("hot", i)) ++
    (1 to 100).map(i => (s"k$i", i))).toDF("k", "v")
  private lazy val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
    .toDF("k", "label")

  test("salted inner join == plain inner join") {
    val plain = facts.join(dim, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), salts = 8)
      .groupBy("k", "label")
      .agg(count(lit(1)).as("c"), sum("v").as("s"))
      .collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(plain.size === 3)
  }

  test("salted left join preserves unmatched rows exactly once") {
    val plain = facts.join(dim, Seq("k"), "left").count()
    val salted = Skew.saltedJoin(facts, dim, Seq("k"), 8, "left").count()
    assert(salted === plain)
    assert(salted === facts.count()) // dim keys unique => no fanout
  }

  test("hot key is actually spread over multiple salt buckets") {
    val saltCounts = facts.filter($"k" === "hot")
      .withColumn("_s", Skew.saltExpr(facts, Seq("k"), 8))
      .groupBy("_s").count().count()
    assert(saltCounts > 1)
  }

  test("salt assignment is deterministic across runs (retry-safe)") {
    def assignment = facts
      .withColumn("_s", Skew.saltExpr(facts, Seq("k"), 8))
      .repartition(7) // force a different physical layout per run
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    assert(assignment === assignment)
  }
}

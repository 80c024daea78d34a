package graft.operators

import graft.SparkSpec

class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  // 6 baskets: {1,2} ×3, {1,3} ×1, {2,3} ×1, {4} ×1
  private def baskets = Seq(
    (10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2),
    (13, 1), (13, 3), (14, 2), (14, 3), (15, 4)
  ).toDF("g", "i")

  test("support, confidence, and lift are exact ppm floor-divisions") {
    val rules = AssocRules.mine(baskets, "g", "i", minPairs = 1, topN = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // rule 1 -> 2: n(1,2)=3, n(1)=4, n(2)=4, N=6
    val (p12, a12, c12, sup12, conf12, lift12) = rules((1, 2))
    assert((p12, a12, c12) === ((3L, 4L, 4L)))
    assert(sup12 === 1000000L * 3 / 6)
    assert(conf12 === 1000000L * 3 / 4)
    assert(lift12 === 1000000L * 3 * 6 / (4 * 4))
    // directional: 1 -> 3 and 3 -> 1 share the pair count but not conf
    val (_, _, _, _, conf13, _) = rules((1, 3))
    val (_, _, _, _, conf31, _) = rules((3, 1))
    assert(conf13 === 1000000L / 4)     // n(1,3)=1, n(1)=4
    assert(conf31 === 1000000L / 2)     // n(3)=2
    // the singleton item 4 appears in no rule
    assert(!rules.keySet.exists(k => k._1 == 4 || k._2 == 4))
  }

  test("minPairs prunes, topN bounds, rank follows the lift order") {
    val top = AssocRules.mine(baskets, "g", "i", minPairs = 3, topN = 10)
      .collect()
    // only the {1,2} pair reaches 3 co-occurrences; both directions
    assert(top.map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((1, 2), (2, 1)))
    val all = AssocRules.mine(baskets, "g", "i", minPairs = 1, topN = 3)
      .collect()
    assert(all.length === 3)
    assert(all.map(_.getInt(8)).toSeq === Seq(1, 2, 3))
    // ranks are ordered by (lift desc, conf desc, a, b)
    val key = all.map(r => (-r.getLong(7), -r.getLong(6),
      r.getInt(0), r.getInt(1)))
    assert(key.sorted.toSeq === key.toSeq)
  }

  test("duplicate incidence rows do not inflate counts; mega-baskets drop") {
    val dup = baskets.unionByName(Seq((10, 1), (10, 1)).toDF("g", "i"))
    val r = AssocRules.mine(dup, "g", "i", minPairs = 3, topN = 10)
      .filter("antecedent = 1 AND consequent = 2").head()
    assert(r.getLong(2) === 3L) // still 3 baskets, not 5
    // cap: a 4-row basket dies at maxGroupRows = 3; its pairs vanish
    val capped = AssocRules.mine(
      Seq((1, 1), (1, 2), (1, 3), (1, 4), (2, 1), (2, 2)).toDF("g", "i"),
      "g", "i", minPairs = 1, topN = 100, maxGroupRows = 3)
    assert(capped.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ===
      Set((1, 2), (2, 1)))
  }

  test("the basket cap costs one sort, never a second exchange (the " +
    "window shares the set-aggregate's hash partitioning)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the exact cap+collect_set shape mine() plans before materializing
    val plan = baskets.select(col("g").as("_g"), col("i").as("_i"))
      .withColumn("_gn", count(lit(1)).over(Window.partitionBy("_g")))
      .filter(col("_gn") <= 3).drop("_gn")
      .groupBy("_g").agg(array_sort(collect_set(col("_i"))).as("items"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, plan)
  }
}

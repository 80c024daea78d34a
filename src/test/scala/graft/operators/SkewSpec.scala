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

  test("map-typed columns salt via string rendering instead of " +
    "throwing (xxhash64 rejects MapType)") {
    val withMap = facts.withColumn("m",
      map(lit("a"), col("v"), lit("b"), col("v") * 2))
    val plain = withMap.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(withMap, dim, Seq("k"), salts = 8)
    assert(salted.count() === plain)
    // still deterministic and still spread: the map rider must not
    // collapse the hot key onto a single salt
    val spread = withMap.filter(col("k") === "hot")
      .withColumn("s", Skew.saltExpr(withMap, Seq("k"), 8))
      .select("s").distinct().count()
    assert(spread > 1)
  }

  test("salt assignment is deterministic across runs (retry-safe)") {
    def assignment = facts
      .withColumn("_s", Skew.saltExpr(facts, Seq("k"), 8))
      .repartition(7) // force a different physical layout per run
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2))
      .toMap
    assert(assignment === assignment)
  }

  test("AQE skew-join (the GraftSession default) splits the hot partition") {
    // manual salting (above) is for engines/joins AQE can't reach;
    // GraftSession turns on adaptive skew-join handling, and this pins
    // that the runtime re-plan ACTUALLY fires: a shuffled join with one
    // oversized partition must show skew=true in the executed plan.
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled to test data: a 200k-row hot key (~2 MB
      // shuffled) vs tail partitions of a few KB
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val big = spark.range(200000)
        .select(lit("hot").as("k"), col("id").as("v"))
        .unionByName(spark.range(200)
          .select(concat(lit("k"), col("id")).as("k"), col("id").as("v")))
      val right = spark.range(300)
        .select(concat(lit("k"), col("id")).as("k"), col("id").as("r"))
        .unionByName(Seq(("hot", 0L)).toDF("k", "r"))
      val joined = big.join(right, Seq("k"))
      // collect() drives joined's OWN query execution, so the adaptive
      // plan below is the finalized one (count() would execute a
      // different QueryExecution and leave this plan un-finalized)
      assert(joined.collect().length === 200200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew handling did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

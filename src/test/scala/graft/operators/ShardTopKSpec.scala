package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardTopKSpec extends SparkSpec {
  import spark.implicits._

  // planted skew where the bound BITES (the gate's synthetic key is
  // near-uniform, so this is where the recall theorem shows its teeth):
  //   s1: hh=10 x1=5 | x2=4 dropped (cap 4)
  //   s2: y1=9 y2=8  | hh=1 dropped (cap 1)
  //   s3: hh=10 z1=3 | nothing dropped (cap 0)       k = 2
  private def planted = {
    val rows =
      Seq.fill(10)(("s1", "hh")) ++ Seq.fill(5)(("s1", "x1")) ++
        Seq.fill(4)(("s1", "x2")) ++
        Seq.fill(9)(("s2", "y1")) ++ Seq.fill(8)(("s2", "y2")) ++
        Seq.fill(1)(("s2", "hh")) ++
        Seq.fill(10)(("s3", "hh")) ++ Seq.fill(3)(("s3", "z1"))
    rows.toDF("shard", "key")
  }

  test("bounds, caps, and candidate set match the hand-traced merge") {
    val b = ShardTopK.candidateBounds(planted, "key", col("shard"), k = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // total_caps = 4 + 1 + 0 = 5 on every row; n_shards = 3
    assert(b.values.forall(_._4 == 5L) && b.values.forall(_._5 == 3L))
    // hh dropped in s2 but recovered: lb 20 (s1+s3), ub 20+(5-4)=21
    assert(b("hh") === ((20L, 21L, 2L, 5L, 3L)))
    assert(b("x1") === ((5L, 6L, 1L, 5L, 3L)))
    assert(b("y1") === ((9L, 13L, 1L, 5L, 3L)))
    assert(b("y2") === ((8L, 12L, 1L, 5L, 3L)))
    assert(b("z1") === ((3L, 8L, 1L, 5L, 3L)))
    // x2 (exact 4 ≤ Σcaps 5) is legitimately missable — and missing
    assert(b.keySet === Set("hh", "x1", "y1", "y2", "z1"))
  }

  test("recall theorem: every key above Σcaps is a candidate; bounds sandwich") {
    // seeded zipf-ish skew: key j appears ~ (41-j) times per shard
    val rows = for {
      sh <- 1 to 4; j <- 1 to 40; _ <- 1 to (41 - j)
      if (j + sh) % 7 != 0 // punch per-shard holes so caps differ
    } yield (s"s$sh", j.toLong)
    val df = rows.toDF("shard", "key")
    val b = ShardTopK.candidateBounds(df, "key", col("shard"), k = 5)
    val exact = df.groupBy("key").agg(count(lit(1)).as("exact"))
    val joined = b.join(exact, "key")
      .select("key", "lb", "ub", "exact", "total_caps").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getLong(1) <= r.getLong(3) && r.getLong(3) <= r.getLong(2),
        s"sandwich violated: $r")
    }
    val totalCaps = joined.head.getLong(4)
    val candKeys = joined.map(_.getLong(0)).toSet
    val aboveBound = exact.filter(col("exact") > totalCaps)
      .select("key").as[Long].collect().toSet
    assert(aboveBound.nonEmpty, "fixture should have keys above the bound")
    assert(aboveBound.subsetOf(candKeys),
      s"missed heavy keys: ${aboveBound -- candKeys}")
  }

  test("short shards contribute cap 0; ties break by key ascending") {
    // one shard, 3 keys, k=3: nothing dropped, bounds are exact
    val df = Seq(("s", 1L), ("s", 1L), ("s", 2L), ("s", 3L))
      .toDF("shard", "key")
    val b = ShardTopK.candidateBounds(df, "key", col("shard"), 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(b === Map(1L -> ((2L, 2L)), 2L -> ((1L, 1L)), 3L -> ((1L, 1L))))
    // tie at the k boundary: keys 2 and 3 both count 1; with k=2 the
    // (cnt desc, key asc) tie-break keeps key 2 and caps at 1
    val b2 = ShardTopK.candidateBounds(df, "key", col("shard"), 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(b2.keySet === Set(1L, 2L))
    assert(b2(1L) === ((2L, 2L)) && b2(2L) === ((1L, 1L)))
  }

  test("the per-shard rank filter plans as WindowGroupLimit") {
    // pin the pre-checkpoint ranked frame: candidateBounds materializes
    // it, which truncates the downstream explain
    val p = ShardTopK.rankedTopK(planted, "key", col("shard"), 2)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(p.contains("WindowGroupLimit"), p)
  }
}

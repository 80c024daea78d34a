package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  // bipartite star: basket o1 carries p1,p2,p3; o2 and o3 carry only p1
  private lazy val edges = Seq(
    (1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L), (3L, 101L))
    .toDF("src", "dst")

  test("one round: exact ppm sums and max normalization") {
    val out = Hits.scores(edges, iters = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // a1 raw: p101 = 3e6 (all three hubs), p102 = p103 = 1e6 -> /3e6
    assert(out(("auth", 101L)) === 1000000L)
    assert(out(("auth", 102L)) === 333333L) // floor(1e12/3e6)
    assert(out(("auth", 103L)) === 333333L)
    // h1 raw: o1 = 1e6 + 2*333333 = 1666666; o2 = o3 = 1e6 -> /1666666
    assert(out(("hub", 1L)) === 1000000L)
    assert(out(("hub", 2L)) === 600000L) // floor(1e12/1666666)
    assert(out(("hub", 3L)) === 600000L)
  }

  test("the leader on each side sits at exactly One after every round") {
    for (it <- 1 to 3) {
      val m = Hits.scores(edges, iters = it)
        .groupBy("side").agg(org.apache.spark.sql.functions.max("score"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(m("auth") === Hits.One && m("hub") === Hits.One,
        s"iteration $it")
    }
  }

  test("authority ranking separates the shared part from the long tail") {
    val out = Hits.scores(edges, iters = 3)
      .filter(org.apache.spark.sql.functions.col("side") === "auth")
      .orderBy(org.apache.spark.sql.functions.col("score").desc,
        org.apache.spark.sql.functions.col("node"))
      .collect().map(_.getLong(1))
    assert(out.head === 101L) // the part every basket carries
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint components") {
    assert(comps((1L, 2L), (2L, 3L), (10L, 11L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain collapses to its minimum (pointer jumping)") {
    val chain = (1L until 200L).map(i => (i, i + 1))
    val c = comps(chain: _*)
    assert(c.size === 200)
    assert(c.values.toSet === Set(1L))
  }

  test("star, reversed edges, self-loops, duplicates") {
    val c = comps((5L, 9L), (9L, 5L), (7L, 5L), (5L, 5L), (5L, 8L), (7L, 5L))
    assert(c === Map(5L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L))
  }

  test("nonRepresentatives keeps exactly one doc per component, " +
    "including when greedy over-keeps") {
    // pairs (2,3) and (1,3) but NOT (1,2): greedy (drop doc_b of each
    // pair) would drop only 3 and keep both 1 and 2
    val pairs = Seq((2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val dropped = ConnectedComponents
      .nonRepresentatives(pairs, "doc_a", "doc_b")
      .as[Long].collect().toSet
    assert(dropped === Set(2L, 3L))
    val greedyDropped = pairs.select(col("doc_b")).distinct()
      .as[Long].collect().toSet
    assert(greedyDropped === Set(3L)) // the over-keep this replaces
  }
}

package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))

  private def run(e: org.apache.spark.sql.DataFrame, rounds: Int) =
    LabelPropagation.propagate(e, rounds).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("two triangles with a bridge converge to two communities") {
    // triangle {1,2,3}, triangle {7,8,9}, bridge 3-7
    val e = undirected((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    val labels = run(e, rounds = 3)
    // the left triangle coalesces on its smallest member's label; the
    // right one coalesces on a single label distinct from the left's
    assert(labels(1L) === 1L && labels(2L) === 1L && labels(3L) === 1L)
    assert(Set(labels(7L), labels(8L), labels(9L)).size === 1)
    assert(labels(7L) !== labels(1L))
  }

  test("tie-break is the smallest label: star center after one round") {
    // center 10 with leaves 1..4: every leaf label occurs once among
    // the center's neighbors — the argmax must pick the SMALLEST
    val e = undirected((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val labels = run(e, rounds = 1)
    assert(labels(10L) === 1L)
    // each leaf sees only the center, so adopts the center's own id
    assert(labels(1L) === 10L && labels(4L) === 10L)
  }

  test("synchronous update: round i reads ONLY round i-1 labels") {
    // path 1-2-3: after one synchronous round 2 sees {1,3} -> 1,
    // while 1 and 3 see only 2 -> 2. A sequential (asynchronous)
    // update would let 3 read 2's NEW label instead.
    val e = undirected((1L, 2L), (2L, 3L))
    val labels = run(e, rounds = 1)
    assert(labels === Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("communities rollup counts every node exactly once") {
    val e = undirected((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    val total = LabelPropagation.communities(e, rounds = 3)
      .agg(org.apache.spark.sql.functions.sum("size")).head().getLong(0)
    assert(total === 6L)
  }
}

package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))

  private def run(e: org.apache.spark.sql.DataFrame, k: Int, rounds: Int) =
    KCore.peel(e, k, rounds).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("K4 plus a pendant chain: 3-core is exactly the K4") {
    // complete graph on {1,2,3,4}; chain 4-5-6 hangs off it
    val e = undirected((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    assert(run(e, k = 3, rounds = 3) ===
      Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("cascading peel: removing one node triggers the next round") {
    // path 1-2-3-4-5: the 2-core is empty, but the cascade takes two
    // rounds (endpoints fall, then their neighbors, then the middle)
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(e, k = 2, rounds = 2) === Seq.empty)
    // a single round is NOT enough: node 3 still shows degree 2 within
    // the first survivor set — the rounds contract is real
    assert(run(e, k = 2, rounds = 1).map(_._1) === Seq(3L))
  }

  test("cycle survives its own 2-core intact") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(e, k = 2, rounds = 4) ===
      Seq((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("fixpoint property: one more round changes nothing (converged)") {
    val e = undirected((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 4L), (7L, 8L))
    val r3 = run(e, k = 2, rounds = 3)
    val r4 = run(e, k = 2, rounds = 4)
    assert(r3 === r4 && r3.nonEmpty)
  }
}

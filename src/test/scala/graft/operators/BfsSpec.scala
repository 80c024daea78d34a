package graft.operators

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def undirected(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))

  test("layers: path graph hop distances from one seed") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = Bfs.layers(e, Seq(1L).toDF("node"), maxHops = 3)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 3)))
  }

  test("layers: multi-source takes the shortest distance") {
    // seeds 1 and 5 on a path 1-2-3-4-5: node 3 is hop 2 from both
    val e = undirected((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val out = Bfs.layers(e, Seq(1L, 5L).toDF("node"), maxHops = 3)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 0), (2L, 1), (3L, 2), (4L, 1), (5L, 0)))
  }

  test("layers: cycle revisits don't lower an assigned hop") {
    val e = undirected((1L, 2L), (2L, 3L), (3L, 1L))
    val out = Bfs.layers(e, Seq(1L).toDF("node"), maxHops = 5)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 0), (2L, 1), (3L, 1)))
  }

  test("layers: early exit on exhausted frontier, isolated seeds stay") {
    val e = undirected((1L, 2L))
    val out = Bfs.layers(e, Seq(1L, 9L).toDF("node"), maxHops = 10)
      .orderBy("node")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 0), (2L, 1), (9L, 0)))
  }

  test("layers: maxHops 0 returns only the seed layer") {
    val e = undirected((1L, 2L))
    val out = Bfs.layers(e, Seq(1L).toDF("node"), maxHops = 0)
    assert(out.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 0)))
  }
}

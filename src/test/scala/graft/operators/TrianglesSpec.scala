package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("perNodeCounts: K4 has 3 triangles per node, 4 total") {
    // complete graph on {1,2,3,4}: C(4,3)=4 triangles, each node in 3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val out = Triangles.perNodeCounts(edges).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("perNodeCounts: triangle + pendant edge + disjoint path") {
    // triangle {1,2,3}; pendant 3-4; path 5-6-7 (no triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L),
      (6L, 7L)).toDF("a", "b")
    val out = Triangles.perNodeCounts(edges).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("coOccurrenceEdges: pairs within group, dedup across groups") {
    val inc = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 9L)).toDF("g", "i")
    val out = Triangles.coOccurrenceEdges(inc, "g", "i").orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // (1,2) appears in two groups but once here; singleton group -> none
    assert(out.toSeq === Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("high-degree hub: star graph has no triangles") {
    val edges = (2L to 40L).map(i => (1L, i)).toDF("a", "b")
    assert(Triangles.perNodeCounts(edges).count() === 0L)
  }
}

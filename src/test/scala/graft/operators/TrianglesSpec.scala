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

  test("clusteringCoefficient: K4, triangle+pendant, and a star") {
    // K4: every node cc = 1 (deg 3, 3 triangles: 2*3/(3*2) = 1)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("a", "b")
    val ccK4 = Triangles.clusteringCoefficient(k4).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(ccK4.toSeq === (1L to 4L).map(n => (n, 3L, 3L, 1000000L)))
    // triangle {1,2,3} + pendant 3-4: nodes 1,2 cc=1; node 3 deg 3 but
    // 1 triangle -> 2/(3*2) = 333333 ppm (floor); pendant 4 deg 1 ->
    // excluded (no defined coefficient)
    val tp = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val ccTp = Triangles.clusteringCoefficient(tp).orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(ccTp.toSeq === Seq((1L, 1000000L), (2L, 1000000L),
      (3L, 333333L)))
    // star: triangle-free hub reports 0, not a missing row
    val star = (2L to 6L).map(i => (1L, i)).toDF("a", "b")
    val ccStar = Triangles.clusteringCoefficient(star)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(ccStar.toSeq === Seq((1L, 0L, 0L)))
  }
}

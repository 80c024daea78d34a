package graft.operators

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  // pentagon-ish: 1-2, 1-3, 2-3, 2-4, 3-5, 4-5
  // deg: 1:2, 2:3, 3:3, 4:2, 5:2
  private def edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L),
    (3L, 5L), (4L, 5L)).toDF("a", "b")

  private val t2 = 1442695041L // round(1e9 / ln 2)
  private val t3 = 910239227L  // round(1e9 / ln 3)

  test("scores match the hand-traced wedge sums; edges are excluded") {
    val got = LinkPrediction.adamicAdar(edges)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // (3,4): witnesses 2 (deg 3) and 5 (deg 2); (2,5): 3 and 4
    assert(got === Map(
      (1L, 4L) -> ((1L, t3)), (1L, 5L) -> ((1L, t3)),
      (2L, 5L) -> ((2L, t3 + t2)), (3L, 4L) -> ((2L, t3 + t2))))
  }

  test("maxDegree caps witnesses, not endpoints") {
    val got = LinkPrediction.adamicAdar(edges, maxDegree = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // only deg-2 witnesses (1, 4, 5) survive; node 1's wedge (2,3) is
    // an edge, so the candidates are the single-witness pairs — and
    // deg-3 endpoints 2 and 3 still appear as candidate ENDPOINTS
    assert(got === Map((2L, 5L) -> ((1L, t2)), (3L, 4L) -> ((1L, t2))))
  }

  test("leaf-only graphs produce no candidates (no deg>=2 witness)") {
    val path = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    assert(LinkPrediction.adamicAdar(path).count() === 0L)
  }
}

package graft.operators

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force dominance oracle: p dominated iff some q has
    * q.x <= p.x, q.y >= p.y, one strict. */
  private def bruteFrontier(pts: Seq[(Long, Long, Long)]) = {
    val xy = pts.map(p => (p._2, p._3)).distinct
    val sky = xy.filterNot { case (x, y) =>
      xy.exists { case (qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }.toSet
    pts.filter(p => sky((p._2, p._3))).sortBy(_._1)
  }

  private def run(pts: Seq[(Long, Long, Long)]) =
    Skyline.frontier(pts.toDF("id", "x", "y"), "id", "x", "y")
      .orderBy("pid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("frontier matches the NOT EXISTS dominance definition") {
    val pts = Seq[(Long, Long, Long)](
      (1, 1, 10), (2, 2, 12), (3, 2, 8), (4, 3, 12), (5, 5, 15),
      (6, 5, 1), (7, 6, 15))
    assert(run(pts) === bruteFrontier(pts))
    // explicit: (2,12) beats (3,*) at y<=12 and (4,12); (5,15) beats (7,15)
    assert(run(pts).map(_._1) === Seq(1L, 2L, 5L))
  }

  test("duplicate points both survive (neither dominates the other)") {
    val pts = Seq[(Long, Long, Long)]((1, 1, 5), (2, 1, 5), (3, 2, 4))
    assert(run(pts).map(_._1) === Seq(1L, 2L))
  }

  test("equal x: only the max-y point survives") {
    val pts = Seq[(Long, Long, Long)]((1, 1, 5), (2, 1, 7), (3, 1, 6))
    assert(run(pts).map(_._1) === Seq(2L))
  }

  test("randomized agreement with the brute oracle") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    assert(run(pts) === bruteFrontier(pts))
  }
}

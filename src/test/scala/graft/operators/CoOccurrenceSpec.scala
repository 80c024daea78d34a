package graft.operators

import graft.SparkSpec

class CoOccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("topK: ppm scores, both directions, rank ordering") {
    // groups: {1,2} x3, {1,3} x1 -> base: 1->4, 2->3, 3->1
    val inc = Seq(
      (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L), (12L, 2L),
      (13L, 1L), (13L, 3L))
      .toDF("g", "i")
    val out = CoOccurrence.topK(inc, "g", "i", k = 5, minPairs = 1)
      .orderBy("item", "rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    // item 1: both recs tie at ppm 1e6 (3/3 and 1/1); the tie breaks
    // by pair_cnt desc, so rec 2 (3 pairs) outranks rec 3 (1 pair)
    assert(out.toSeq === Seq(
      (1L, 2L, 3L, 3L, 1000000L, 1),
      (1L, 3L, 1L, 1L, 1000000L, 2),
      (2L, 1L, 3L, 4L, 750000L, 1),
      (3L, 1L, 1L, 4L, 250000L, 1)))
  }

  test("topK: minPairs floor drops rare pairs") {
    val inc = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 3L),
      (12L, 4L)).toDF("g", "i")
    val out = CoOccurrence.topK(inc, "g", "i", k = 5, minPairs = 2)
    assert(out.select("item").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("topK: k truncates per item, rank dense from 1") {
    val inc = (1L to 6L).flatMap(o => Seq((o, 0L), (o, o))) // 0 with each
      .toDF("g", "i")
    val out = CoOccurrence.topK(inc, "g", "i", k = 3, minPairs = 1)
      .filter($"item" === 0L)
    assert(out.count() === 3)
    assert(out.select("rank").as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("topK: duplicate (group, item) rows don't inflate counts") {
    val inc = Seq((10L, 1L), (10L, 1L), (10L, 2L)).toDF("g", "i")
    val out = CoOccurrence.topK(inc, "g", "i", k = 5, minPairs = 1)
      .filter($"item" === 1L).select("pair_cnt").as[Long].collect()
    assert(out.toSeq === Seq(1L))
  }

  test("topK: maxGroupRows drops the mega-group, keeps the rest") {
    // group 1 = a 30-row glut (collect_set OOM class), group 2 = sane
    val glut = (1L to 30L).map(i => (1L, i))
    val sane = Seq((2L, 100L), (2L, 101L), (3L, 100L), (3L, 101L))
    val inc = (glut ++ sane).toDF("g", "i")
    val out = CoOccurrence
      .topK(inc, "g", "i", k = 5, minPairs = 1, maxGroupRows = 10L)
      .select("item", "rec").as[(Long, Long)].collect().toSet
    // no pair from the glut survives; the sane groups' pair does
    assert(out === Set((100L, 101L), (101L, 100L)))
  }
}

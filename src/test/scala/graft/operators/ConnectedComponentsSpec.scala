package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** localThreshold = 0 forces the distributed pointer-jumping loop. */
  private def compsDistributed(edges: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("s", "d"), "s", "d",
      localThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint components") {
    assert(comps((1L, 2L), (2L, 3L), (10L, 11L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("long chain collapses to its minimum (pointer jumping)") {
    val chain = (1L until 200L).map(i => (i, i + 1))
    val c = compsDistributed(chain: _*)
    assert(c.size === 200)
    assert(c.values.toSet === Set(1L))
  }

  test("single-task union-find path agrees with the distributed loop") {
    val chain = (1L until 120L).map(i => (i, i + 1))
    assert(comps(chain: _*) === compsDistributed(chain: _*))
  }

  test("star, reversed edges, self-loops, duplicates") {
    val c = comps((5L, 9L), (9L, 5L), (7L, 5L), (5L, 5L), (5L, 8L), (7L, 5L))
    assert(c === Map(5L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L))
  }

  test("random graphs agree with a driver-side union-find") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // normalize to min-of-component labels
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }
    }
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong)
        b <- Gen.choose(0L, n.toLong)
      } yield (a, b))
    } yield edges.filter(e => e._1 != e._2)
    val prop = Prop.forAll(edgeGen) { edges =>
      edges.nonEmpty ==> {
        val want = unionFind(edges)
        val local = comps(edges: _*)
        val dist = compsDistributed(edges: _*)
        ((local == want) :| s"local $local\nwant $want") &&
          ((dist == want) :| s"dist $dist\nwant $want")
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
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

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Local integer reference: identical fixed-point update. */
  private def local(edges: Seq[(String, String)],
      iters: Int): Map[String, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = deg.keys.map(_ -> PageRank.One).toMap
    for (_ <- 0 until iters) {
      val contrib = rank.map { case (n, r) => n -> r / deg(n) }
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => contrib(e._1)).sum
      }
      rank = in.map { case (n, s) =>
        n -> (3 * PageRank.One / 20 + (17 * s) / 20)
      }
    }
    rank
  }

  private def sym(e: Seq[(String, String)]) = e ++ e.map(_.swap)

  test("distributed == local integer reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = sym((1 to 120).map(_ =>
      (s"n${rnd.nextInt(20)}", s"m${rnd.nextInt(15)}")).distinct)
    val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === local(edges, 4))
  }

  test("star graph: the hub outranks every leaf; leaves tie exactly") {
    val edges = sym((1 to 8).map(i => (s"leaf$i", "hub")))
    val got = PageRank.ranks(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val leaves = (1 to 8).map(i => got(s"leaf$i"))
    assert(leaves.distinct.size === 1) // exact tie, integer arithmetic
    assert(got("hub") > leaves.head)
  }

  test("symmetric two-cliques rank identically across cliques") {
    def clique(tag: String) = for {
      a <- 1 to 4; b <- 1 to 4 if a != b
    } yield (s"$tag$a", s"$tag$b")
    val got = PageRank.ranks(
      (clique("x") ++ clique("y")).toDF("src", "dst"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (1 to 4).foreach(i => assert(got(s"x$i") === got(s"y$i")))
  }
}

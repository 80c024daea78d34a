package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an undirected graph — the clustering /
  * community-density signal (co-purchase "bought-together" strength in
  * the reference's sales domain; link-spam and boilerplate-cluster
  * detection in a web-corpus curation pipeline).
  *
  * Algorithm: degree orientation (Schank & Wagner 2005 / Suri &
  * Vassilvitskii 2011 "MR triangle counting"). Each undirected edge is
  * oriented from its lexicographically-smaller (degree, node) endpoint
  * to the larger; every triangle then appears EXACTLY once as a wedge
  * u→v→w closed by u→w, with ord(u) < ord(v) < ord(w). The orientation
  * is the scale lever: out-degrees are bounded by O(√m), so the wedge
  * join materializes O(m^1.5) rows worst-case instead of Σ deg² — the
  * high-degree hub that would explode a naive neighbor self-join
  * contributes only LOW-degree out-edges. All joins are equi-joins on
  * node keys (hash-partitioned); counts are exact integers, so the
  * DuckDB oracle replays the same orientation bit-for-bit.
  */
object Triangles {

  /** Undirected distinct co-occurrence edges (a < b) from an
    * (group, item) incidence frame: items sharing a group are linked.
    * Pair blowup is quadratic per GROUP — bounded when group sizes are
    * (like order line counts) small and bounded; cap or sample oversized
    * groups upstream for corpora where they aren't. */
  def coOccurrenceEdges(incidence: DataFrame, group: String,
      item: String): DataFrame = {
    val op = incidence.select(col(group).as("_g"), col(item).as("_i"))
      .distinct()
    op.as("x").join(op.as("y"),
        col("x._g") === col("y._g") && col("x._i") < col("y._i"))
      .select(col("x._i").as("a"), col("y._i").as("b"))
      .distinct()
  }

  /** Per-node triangle counts: (node, triangles) for every node in at
    * least one triangle. `edges` must be undirected-distinct with
    * a < b (see [[coOccurrenceEdges]]). */
  def perNodeCounts(edges: DataFrame): DataFrame = {
    // materialize the edge list once: the degree union reads it twice
    // and the orientation join a third time — without this the upstream
    // derivation (for co-purchase graphs, a self-join + distinct) runs
    // three times
    val e0 = edges.select(col("a"), col("b")).localCheckpoint()
    perNodeCountsOn(e0, degrees(e0))
  }

  /** Node degrees of an undirected-distinct (a, b) edge frame. */
  private def degrees(e0: DataFrame): DataFrame =
    e0.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))

  /** [[perNodeCounts]] body over a pre-materialized edge frame and its
    * degree frame — shared with [[clusteringCoefficient]] so callers
    * that already paid for both don't checkpoint or aggregate twice. */
  private def perNodeCountsOn(e0: DataFrame, deg: DataFrame): DataFrame = {
    // orient by (deg, node); materialize ONCE — the triangle join reads
    // this frame three times and re-deriving the co-occurrence self-join
    // per read would triple the dominant cost
    val ordA = struct(col("da"), col("a"))
    val ordB = struct(col("db"), col("b"))
    val eo = e0
      .join(deg.select(col("n").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("db")), "b")
      .select(
        when(ordA < ordB, col("a")).otherwise(col("b")).as("src"),
        when(ordA < ordB, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint()
    val tri = eo.as("e1")
      .join(eo.as("e2"), col("e1.dst") === col("e2.src"))
      .join(eo.as("e3"),
        col("e1.src") === col("e3.src") && col("e2.dst") === col("e3.dst"))
      .select(col("e1.src").as("u"), col("e1.dst").as("v"),
        col("e2.dst").as("w"))
    // one explode, not a 3-way unionAll of projections: Spark has no
    // cross-branch CSE, so the union form re-executed the dominant
    // wedge join once PER BRANCH (measured
    // 3.7 s -> 2.9 s at sf0.1; the waste grew with the wedge volume,
    // i.e. superlinearly in sf)
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per node — the "how clique-like is
    * this node's neighborhood" density signal (Watts & Strogatz 1998):
    * cc = 2·triangles / (deg·(deg−1)), kept EXACT in ppm integers
    * (`cc_ppm = (2_000_000·triangles) div (deg·(deg−1))`) so the gate
    * hash-replays — no float division to drift. Returns (node, deg,
    * triangles, cc_ppm) for every node with deg ≥ 2 (deg-1 nodes have
    * no defined coefficient); triangle-free nodes report 0.
    * Same inputs and scale shape as [[perNodeCounts]] — the degree
    * frame is node-sized, the join hash-partitioned. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val e0 = edges.select(col("a"), col("b")).localCheckpoint()
    val deg = degrees(e0)
    deg.filter(col("deg") >= 2)
      .withColumnRenamed("n", "node")
      .join(perNodeCountsOn(e0, deg), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        expr("(2000000 * coalesce(triangles, CAST(0 AS BIGINT))) div " +
          "(deg * (deg - 1))").as("cc_ppm"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the collapse
  * step of near-duplicate detection (a~b, b~c must yield ONE kept doc
  * even when a~c was never emitted as a pair).
  *
  * Algorithm: min-label propagation with pointer jumping. Each node
  * starts labeled with itself; each round takes the min of its own and
  * its neighbors' labels, then jumps through the label's label
  * (comp := comp(comp)). The jump is what turns O(diameter) rounds into
  * O(log diameter) — a 1M-long chain converges in ~20 rounds, not 1M.
  * Labels are monotonically non-increasing, so the fixpoint is exact:
  * every node ends labeled with the smallest id in its component.
  *
  * Scale shape: each round is two shuffled joins + an aggregation, all
  * keyed equi-joins (no cross products); `localCheckpoint` cuts the
  * lineage so plan size stays constant across rounds. Edges are
  * symmetrized once and cached. This is the DataFrame-native analogue
  * of the large-star/small-star MapReduce formulation (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14).
  */
object ConnectedComponents {

  /** Label every node appearing in `edges` with its component's
    * smallest id. Returns (id, comp). Ids may be any orderable type;
    * self-loops are ignored. */
  def components(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .persist()

    var comp = sym.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // min over neighbor labels
      val nbrMin = sym.join(comp.withColumnRenamed("id", "b"), "b")
        .groupBy("a").agg(min("comp").as("ncomp"))
        .withColumnRenamed("a", "id")
      val lowered = comp.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // pointer jump: follow the label's own label. The previous label
      // rides along as `old`, so convergence detection below is a plain
      // aggregation over this frame — no extra join against the prior
      // iteration's labels.
      val byId = lowered.select(col("id").as("jid"), col("comp").as("jcomp"))
      val jumped = lowered
        .join(byId, lowered("comp") === byId("jid"), "left")
        .select(lowered("id"), lowered("old"),
          least(lowered("comp"), coalesce(col("jcomp"), lowered("comp")))
            .as("comp"))
        .localCheckpoint(true)
      changed = jumped.filter(col("comp") =!= col("old")).count()
      comp = jumped.drop("old")
      iter += 1
    }
    sym.unpersist()
    comp
  }

  /** Dedup collapse: ids to DROP so exactly one representative (the
    * smallest id) survives per near-dup component. Strictly stronger
    * than the greedy drop-higher-of-each-pair rule, which can keep two
    * docs of one component when the pair linking them was pruned (e.g.
    * pairs (2,3),(1,3) without (1,2): greedy keeps 1 AND 2). */
  def nonRepresentatives(pairs: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    components(pairs, srcCol, dstCol)
      .filter(col("id") =!= col("comp"))
      .select(col("id"))
}

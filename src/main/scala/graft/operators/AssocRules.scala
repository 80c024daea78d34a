package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over basket incidence — the market-basket
  * classic (Agrawal & Srikant, VLDB'94, restricted to the 2-itemset
  * rules that dominate production use): for every ordered item pair
  * a → b, support (how common is the pair), confidence (P(b | a)) and
  * lift (confidence against b's base rate). [[CoOccurrence]] ranks
  * recommendations WITHIN an item; this ranks rules GLOBALLY, which is
  * the merchandising / co-marketing question ("which pairings beat
  * their base rates corpus-wide?").
  *
  * Exactness: all three metrics are exact integer ppm floor-divisions
  * over pair/item/basket counts —
  *   support_ppm    = 1e6·n(a,b) div N
  *   confidence_ppm = 1e6·n(a,b) div n(a)
  *   lift_ppm       = 1e6·n(a,b)·N div (n(a)·n(b))
  * (lift's numerator and denominator in DECIMAL(38,0) — n(a)·n(b)
  * overflows a long past ~3·10⁹ baskets per item; support/confidence
  * numerators are longs, fine to ~9·10¹² pair occurrences, ANSI
  * errors loudly past that) — so the global ranking replays
  * bit-for-bit in any engine.
  *
  * Scale shape: the [[CoOccurrence]] spine — one collect_set shuffle
  * to per-basket sorted item sets, a<b pairs expanded array-side (the
  * pair shuffle moves each unordered pair once, mirrored after the
  * minPairs prune), item base counts exploded from the same sets
  * frame, and the basket total N rides as a 1-row broadcast. Pair
  * volume is quadratic in BASKET size, not corpus size; unbounded
  * baskets take the same `maxGroupRows` cap (here mandatory — a
  * crawler mega-basket is rule noise by construction).
  */
object AssocRules {

  /** Top-`topN` rules (antecedent, consequent, pair_cnt, ante_cnt,
    * cons_cnt, support_ppm, confidence_ppm, lift_ppm, rank) by lift
    * desc (ties: confidence desc, antecedent, consequent). Pairs below
    * `minPairs` are dropped before scoring (noise floor — a 1-basket
    * pair can post an enormous lift). */
  def mine(incidence: DataFrame, group: String, item: String,
      minPairs: Long, topN: Int,
      maxGroupRows: Long = 100000L): DataFrame = {
    require(minPairs >= 1 && topN >= 1 && maxGroupRows >= 1,
      "minPairs, topN, maxGroupRows must be >= 1")
    // the cap stays a PRE-aggregation window on purpose: collect_set's
    // buffer holds a group's whole item set and does not spill, so a
    // mega-basket must be dropped BEFORE the aggregate ever sees it (a
    // post-agg size(items) filter is too late — the CoOccurrence OOM
    // rationale). The window shares the groupBy's hash partitioning:
    // one sort added, no extra exchange (plan-pinned in AssocRulesSpec).
    val inc = incidence
      .select(col(group).as("_g"), col(item).as("_i"))
      .withColumn("_gn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_g")))
      .filter(col("_gn") <= maxGroupRows).drop("_gn")
    // sets feeds three consumers (pair expansion, base counts, basket
    // total) and is deliberately LEFT LAZY: the r14 A/B measured
    // checkpointing the array-heavy basket-sized frame at 1.64 →
    // 2.4 s isolated (sf0.1) — the replayed scan+window+collect_set
    // subtrees fuse into their consumers and run in parallel for less
    // than the block-store serialize/deserialize (the CoOccurrence r12
    // lazy-vs-materialized lesson, reconfirmed here).
    val sets = inc.groupBy("_g")
      .agg(array_sort(collect_set(col("_i"))).as("items"))
    // a<b pairs array-side off the sorted set (the CoOccurrence shape);
    // counted once, mirrored after the prune — rules are directional
    // but share the unordered pair count
    val pairsAB = sets.select(explode(flatten(transform(col("items"),
        (a, i) => transform(
          slice(col("items"), i + lit(2), size(col("items"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cntAB = pairsAB
      .groupBy("a", "b").agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= minPairs)
    // ALSO left lazy: the mirror union replays the pair-expansion
    // subtree (2 of the plan's 5 source replays), but the r14 A/B
    // measured checkpointing even this tiny frame at 2.5 s vs 1.64 s
    // lazy — the eager job serializes what the lazy plan runs as one
    // 5-subtree wave across all cores. On a saturated 1000-executor
    // cluster the trade flips toward materializing; at local bench
    // scale the wide lazy plan wins decisively.
    val paired = cntAB.unionByName(
      cntAB.select(col("b").as("a"), col("a").as("b"), col("pair_cnt")))
    val base = sets.select(explode(col("items")).as("_i"))
      .groupBy("_i").agg(count(lit(1)).as("item_cnt"))
    val baskets = sets.agg(count(lit(1)).as("n_baskets"))
    val scored = paired
      .join(base.select(col("_i").as("a"), col("item_cnt").as("ante_cnt")), "a")
      .join(base.select(col("_i").as("b"), col("item_cnt").as("cons_cnt")), "b")
      .crossJoin(broadcast(baskets))
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("pair_cnt"), col("ante_cnt"), col("cons_cnt"),
        expr("(1000000 * pair_cnt) div n_baskets").as("support_ppm"),
        expr("(1000000 * pair_cnt) div ante_cnt").as("confidence_ppm"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * pair_cnt * n_baskets" +
          " div (CAST(ante_cnt AS DECIMAL(38,0)) * cons_cnt) AS BIGINT)")
          .as("lift_ppm"))
    scored
      .orderBy(col("lift_ppm").desc, col("confidence_ppm").desc,
        col("antecedent"), col("consequent"))
      .limit(topN)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          col("lift_ppm").desc, col("confidence_ppm").desc,
          col("antecedent"), col("consequent"))))
  }
}

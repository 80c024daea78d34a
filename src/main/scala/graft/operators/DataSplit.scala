package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting for training-data pipelines.
  *
  * Split assignment must be (a) deterministic under retry/re-run, (b)
  * stable when the corpus grows (a doc's split never depends on what
  * else is in the table), and (c) reproducible OUTSIDE Spark so other
  * engines agree on membership. `rand()`-based sampling fails all
  * three; a seeded xxhash fails (c). The bucket here is the first 4 hex
  * chars of md5(key) — portable to any engine with md5 (the DuckDB
  * oracle recomputes it with string functions alone).
  *
  * `assignByComponent` is the leakage-safe variant: near-duplicate
  * documents must land in the SAME split (a train/test pair of
  * near-dups is evaluation leakage), so the bucket is computed on the
  * doc's duplicate-component representative
  * ([[ConnectedComponents.components]] over the near-dup pair list)
  * rather than the doc itself.
  */
object DataSplit {

  /** Deterministic engine-portable bucket in [0, buckets): integer
    * value of the first 4 hex chars of md5(key), mod `buckets` (bias
    * from 65536 % buckets is < 0.2% per bucket at 100 — negligible
    * against corpus noise and exactly reproduced by the oracles). The
    * ONE hash definition behind splits and packing shards — change it
    * here and in every oracle together. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10)
      .cast("int") % buckets

  /** Split bucket in [0, 100). */
  def bucket(key: Column): Column = hashBucket(key, 100).as("bucket")

  /** train/val/test label from a bucket column: [0, trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. */
  private def label(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages ($trainPct, $valPct)")
    // NULL keys hash as "" (the stratifiedSample discipline): bucket(
    // NULL) is NULL, both when()s go three-valued-false, and every
    // malformed-id row would silently concentrate in 'test' — a
    // systematic eval-set bias, not a random one
    val b = bucket(coalesce(key.cast("string"), lit("")))
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Salted md5-uniform draw in [0, 1): the ONE uniform definition
    * behind the weighted/temperature samplers (each primitive salts
    * differently so draws are independent). NULL keys hash as "" —
    * a NULL would NULL the keep-comparison and silently drop the row
    * even at rate 1.0. */
  private def md5Uniform(key: Column, salt: String): Column =
    conv(substring(
      md5(concat(coalesce(key.cast("string"), lit("")), lit(salt))),
      1, 4), 16, 10)
      .cast("double") / lit(65536.0)

  /** Label rows train/val/test by md5-bucket thresholds. */
  def assign(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("split", label(col(keyCol), trainPct, valPct))

  /** Deterministic per-stratum subsampling: keep a row iff its salted
    * hash bucket falls below the stratum's percentage (strata absent
    * from `pcts` keep `defaultPct`). The key is salted with
    * `":sample"` so the keep/drop decision is INDEPENDENT of the
    * train/val/test bucket above — sampling with the unsalted hash
    * would select a biased subset of each split. Stateless per row
    * (no shuffle, no count pass), stable as the corpus grows, and
    * reproducible by the p03 DuckDB oracle via the same md5 prefix.
    * This is how a 100 TB corpus downsamples a dominant language:
    * one codegen'd projection + filter, no sort, no window. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
      pcts: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require((pcts.values ++ Seq(defaultPct)).forall(p => p >= 0 && p <= 100),
      s"sample percentages must be in [0,100]: $pcts / $defaultPct")
    // NULL keys hash as the empty string (all land in one bucket, kept
    // or dropped together per their stratum's rate) — a NULL bucket
    // would NULL the comparison and silently drop the rows even in
    // pass-through strata
    val b = hashBucket(
      concat(coalesce(col(keyCol).cast("string"), lit("")), lit(":sample")),
      100)
    val pct = pcts.foldLeft(lit(defaultPct)) { case (acc, (stratum, p)) =>
      when(col(stratumCol) === stratum, p).otherwise(acc)
    }
    df.filter(b < pct)
  }

  /** Leakage-safe split: every member of a near-dup component gets the
    * split of its component representative (smallest id). `pairs` is a
    * near-dup pair list (e.g. from [[Dedup.minHashLshPairs]]); docs in
    * no pair are their own representative. */
  def assignByComponent(df: DataFrame, idCol: String, pairs: DataFrame,
      srcCol: String, dstCol: String, trainPct: Int = 80,
      valPct: Int = 10, keepKeyAs: String = ""): DataFrame = {
    val comp = ConnectedComponents.components(pairs, srcCol, dstCol)
      .withColumnRenamed("id", idCol)
    val joined = df.join(comp, Seq(idCol), "left")
      .withColumn("split",
        label(coalesce(col("comp"), col(idCol)), trainPct, valPct))
    // keepKeyAs exposes the bucketing key (component representative, or
    // the doc's own id for singletons) for group-level audits — e.g.
    // "no group straddles splits", the leakage check itself
    if (keepKeyAs.isEmpty) joined.drop("comp")
    else joined.withColumn(keepKeyAs, coalesce(col("comp"), col(idCol)))
      .drop("comp")
  }

  /** Deterministic weighted Bernoulli sampling — the importance-
    * sampling primitive for quality-weighted data mixing: each row is
    * kept iff its own md5-uniform (first 4 hex chars of md5(id), over
    * 65536) falls below its weight (clamped to [0,1]). Selection is a
    * pure per-row predicate: engine-portable, reproducible, independent
    * of corpus size or storage order, and MONOTONE in the weight — a
    * doc kept at weight w stays kept at any w' >= w, so re-weighting a
    * mixture never churns the kept set, it only grows or shrinks it. */
  def weightedSample(df: DataFrame, idCol: String,
      weight: Column): DataFrame = {
    // ":weight"-salted like stratifiedSample's ":sample": each sampling
    // primitive draws its own independent uniform — with the UNSALTED
    // hash, composing weightedSample over a tokenBudgetSample output (or
    // a split) would re-test the same u and silently break the keep
    // probability
    val u = md5Uniform(col(idCol), ":weight")
    df.filter(u < least(lit(1.0), greatest(lit(0.0), weight.cast("double"))))
  }

  /** Token-budget sampling: keep each stratum's docs, in md5(id) order,
    * until the stratum's token budget is exhausted (a doc is kept when
    * the tokens BEFORE it are under budget, so the cut lands within one
    * doc of the target — deterministic, no count pass, reproducible by
    * an engine-portable oracle). This is data mixing's core primitive:
    * "N billion tokens of source X, M of source Y" is one window over
    * (stratum, md5-order) + a filter, not a driver-side loop.
    *
    * The md5 order makes the kept subset stable as the corpus grows
    * (existing docs keep their position hash; new docs interleave), and
    * independent of storage order. Adds `cum_tokens` (running total
    * INCLUDING the row) for audit. `idCol` must be UNIQUE within each
    * stratum (the SequentialIds total-order contract): md5 ties happen
    * only for equal ids, and two rows sharing an id would order
    * arbitrarily inside the cumulative frame — the tie-break below
    * pins the md5-collision case but cannot distinguish true
    * duplicates. With no strata the window is one
    * partition — fine for a bounded stratum list, not for a global
    * budget over 100 TB; shard first (e.g. [[Packing.packByBudget]]'s
    * md5-shard pattern) if a single stratum's candidate set exceeds one
    * task's comfort. */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, strataCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w0 =
      if (strataCols.isEmpty)
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      else
        org.apache.spark.sql.expressions.Window
          .partitionBy(strataCols.map(col): _*)
    // ":budget" salt: the draw order must be independent of the split/
    // sampling hash family (same reasoning as stratifiedSample's salt).
    // idCol tie-break (the domainQuota/shardShuffle discipline):
    // duplicate ids tie on the md5 key, and a ROWS cumulative frame
    // over a nondeterministic tie order would flip membership at the
    // budget cut between runs.
    val w = w0.orderBy(md5(concat(col(idCol).cast("string"), lit(":budget"))),
        col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .filter(col("cum_tokens") - col(tokensCol) < budget)
  }

  /** Per-domain quota cap: keep at most `maxPerDomain` rows per domain,
    * chosen by each row's salted md5 rank (a deterministic uniform draw,
    * so the kept subset is an unbiased sample of the domain and stable
    * under re-runs; the `idCol` tie-break pins order under duplicate
    * ids). The web-corpus "no single site dominates" rule: without it a
    * crawl's top domains swamp the mixture.
    *
    * Scale shape: `row_number() <= k` plans as WindowGroupLimit
    * (Spark 3.5+), so each map task discards beyond-quota rows per
    * domain BEFORE the shuffle — the exchange carries at most
    * k·domains·tasks rows, not the corpus. A million-page domain ships
    * k rows per task, never the million. */
  def domainQuota(df: DataFrame, idCol: String, domainCol: String,
      maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0, "maxPerDomain must be positive")
    // ":quota" salt: same independent-uniform reasoning as the other
    // sampling primitives — quota selection must not correlate with
    // split/sample/budget membership
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":quota"))),
        col(idCol))
    df.withColumn("qrank", row_number().over(w))
      .filter(col("qrank") <= maxPerDomain)
      .drop("qrank")
  }

  /** Temperature-flattened domain mixture: downsample each domain to a
    * share ∝ n_d^alpha (the multilingual-pretraining smoothing — at
    * alpha = 1 the mixture is untouched, at alpha → 0 it flattens to
    * uniform). Feasible pure-downsampling form: keep rate
    * (n_min / n_d)^(1−alpha), so the smallest domain keeps everything
    * and every target is ≤ its domain's size — no replication. Selection
    * is the [[weightedSample]] idiom: each row's own ":temp"-salted
    * md5-uniform against its domain's rate, so membership is
    * deterministic, engine-portable, and monotone in alpha.
    *
    * Scale shape: one small groupBy for the per-domain counts (domains,
    * not rows), a broadcast join of the rate table, one codegen'd
    * filter. NULL domains form their own stratum (null-safe join). */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    val counts = df.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).as("__nd"))
    val nmin = counts.agg(min(col("__nd")).as("__nmin"))
    val rates = counts.crossJoin(nmin)
      .select(col("__dom"),
        pow(col("__nmin").cast("double") / col("__nd"),
          lit(1.0) - lit(alpha)).as("__rate"))
    val u = md5Uniform(col(idCol), ":temp")
    df.join(broadcast(rates), col(domainCol) <=> col("__dom"), "inner")
      .filter(u < col("__rate"))
      .drop("__dom", "__rate")
  }

  /** Deterministic training-order shuffle: shard each row by a salted
    * md5 bucket, then order within the shard by an independent salted
    * md5 — a reproducible global permutation (approximated as `shards`
    * independent uniform streams) that any engine can recompute. `pos`
    * is the row's 1-based position within its shard, so a training job
    * can resume from (shard, pos) exactly.
    *
    * Scale shape: the shard is a per-row projection and the order is a
    * within-shard sort — one shuffle keyed by shard, NO global sort. At
    * 100 TB this is `repartition(shard).sortWithinPartitions(md5)` and
    * a partitioned write; the window here materializes `pos` for the
    * resumability contract. Shard count bounds the per-task sort. */
  def shardShuffle(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, "shards must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(":order"))),
        col(idCol))
    df.withColumn("shard",
      hashBucket(concat(col(idCol).cast("string"), lit(":shard")), shards))
      .withColumn("pos", row_number().over(w))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DataSplitSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")

  test("split is deterministic and independent of the rest of the corpus") {
    val full = DataSplit.assign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // same docs through a different (smaller) corpus: identical labels
    val subset = DataSplit.assign(docs.filter($"doc_id" % 3 === 0), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    subset.foreach { case (id, s) => assert(full(id) === s) }
    // and a re-run is identical
    val again = DataSplit.assign(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(again === full)
  }

  test("proportions track the requested 80/10/10 within tolerance") {
    val counts = DataSplit.assign(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(math.abs(counts("train") / n - 0.8) < 0.06,
      s"train ${counts("train") / n}")
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.1) < 0.05)
    assert(math.abs(counts.getOrElse("test", 0L) / n - 0.1) < 0.05)
  }

  test("assignByComponent: near-dup components never straddle splits") {
    // components {1,2,3} (via chain) and {10,11}; 20 is unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val df = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val out = DataSplit.assignByComponent(df, "doc_id", pairs, "a", "b")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(Set(out(1L), out(2L), out(3L)).size === 1,
      "component {1,2,3} split across partitions")
    assert(Set(out(10L), out(11L)).size === 1)
    // unpaired doc falls back to its own id's bucket
    val own = DataSplit.assign(Seq(20L).toDF("doc_id"), "doc_id")
      .select("split").as[String].collect().head
    assert(out(20L) === own)
  }

  test("assignByComponent keepKeyAs: group key = representative, " +
      "and the split is the KEY's bucket") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val df = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val out = DataSplit.assignByComponent(df, "doc_id", pairs, "a", "b",
        keepKeyAs = "gkey")
      .select("doc_id", "gkey", "split")
      .as[(Long, Long, String)].collect()
      .map { case (id, k, s) => id -> ((k, s)) }.toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(out(10L)._1 === 10L && out(11L)._1 === 10L)
    assert(out(20L)._1 === 20L)
    // every member's split equals its group key's own md5 bucket
    val keyed = out.values.map(_._1).toSeq.distinct
    val expect = DataSplit.assign(keyed.toDF("doc_id"), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    out.values.foreach { case (k, s) => assert(s === expect(k)) }
  }

  test("stratifiedSample: deterministic, per-stratum rates, split-independent") {
    val pcts = Map("en" -> 30, "de" -> 50)
    val once = DataSplit.stratifiedSample(docs, "doc_id", "lang", pcts)
      .select("doc_id").as[Long].collect().toSet
    val again = DataSplit.stratifiedSample(docs, "doc_id", "lang", pcts)
      .select("doc_id").as[Long].collect().toSet
    assert(once === again)
    val byLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = DataSplit.stratifiedSample(docs, "doc_id", "lang", pcts)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // unkeyed strata pass through untouched
    (byLang.keySet -- pcts.keySet).foreach { l =>
      assert(kept.getOrElse(l, 0L) === byLang(l), s"stratum $l altered")
    }
    // keyed strata are genuine subsets at roughly the requested rate
    assert(kept("en") < byLang("en"))
    assert(math.abs(kept("en").toDouble / byLang("en") - 0.30) < 0.25)
    // salted decision is independent of the split bucket: sampled 'en'
    // docs must not be a subset of any one split (the unsalted hash
    // would put every bucket<30 doc in 'train')
    val splits = DataSplit.assign(
      DataSplit.stratifiedSample(docs, "doc_id", "lang", pcts)
        .filter($"lang" === "en"), "doc_id")
      .select("split").distinct().as[String].collect().toSet
    assert(splits.size > 1, s"sample correlated with split: $splits")
  }

  test("stratifiedSample: membership is corpus-independent (sampling a " +
    "subset == subset of the sample)") {
    val pcts = Map("en" -> 40, "de" -> 40, "fr" -> 40, "es" -> 40, "zh" -> 40)
    val full = DataSplit.stratifiedSample(docs, "doc_id", "lang", pcts)
      .select("doc_id").as[Long].collect().toSet
    val sub = DataSplit.stratifiedSample(
      docs.filter($"doc_id" % 3 === 0), "doc_id", "lang", pcts)
      .select("doc_id").as[Long].collect().toSet
    val expected = full.filter(_ % 3 == 0)
    assert(sub === expected,
      "a doc's keep decision changed when the rest of the corpus shrank")
  }

  test("stratifiedSample: NULL keys are kept in pass-through strata") {
    val df = Seq((Some(1L), "en"), (None, "en"), (None, "zh"))
      .toDF("doc_id", "lang")
    // zh passes through at 100% — its null-key row must survive
    val kept = DataSplit.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0)) // en fully dropped, nulls included
      .select("lang").as[String].collect().toSeq
    assert(kept === Seq("zh"))
  }

  test("tokenBudgetSample: cut lands within one doc of the budget, " +
    "per stratum, stable under corpus growth") {
    val df = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L))
      .toDF("doc_id", "src", "n_tokens")
    val kept = DataSplit.tokenBudgetSample(df, "doc_id", "n_tokens",
      budget = 95L, strataCols = Seq("src"))
    // 10-token docs against a 95 budget: exactly 10 kept per stratum
    // (the 10th starts at 90 < 95), cum audit column rides along
    val bySrc = kept.groupBy("src")
      .agg(count(lit(1)).as("n"), max("cum_tokens").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(bySrc === Set(("a", 10L, 100L), ("b", 10L, 100L)))
    // kept set is a function of each doc's own hash position: docs kept
    // from a half-size corpus are a SUBSET decided by the same ordering
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val again = DataSplit.tokenBudgetSample(df, "doc_id", "n_tokens",
      budget = 95L, strataCols = Seq("src"))
      .select("doc_id").as[Long].collect().toSet
    assert(again === keptIds)
    // zero/negative budget rejected
    intercept[IllegalArgumentException] {
      DataSplit.tokenBudgetSample(df, "doc_id", "n_tokens", 0L)
    }
  }
  test("weightedSample: deterministic, monotone in weight, bounds exact") {
    val df = (1L to 400L).map(i => (i, i % 250)).toDF("doc_id", "len")
    def kept(scale: Double) = DataSplit
      .weightedSample(df, "doc_id", col("len") / lit(scale))
      .select("doc_id").as[Long].collect().toSet
    val k200 = kept(200.0)
    assert(kept(200.0) === k200) // deterministic
    assert(k200.subsetOf(kept(100.0))) // higher weight => superset
    assert(DataSplit.weightedSample(df, "doc_id", lit(0.0)).count() === 0)
    assert(DataSplit.weightedSample(df, "doc_id", lit(1.0)).count() === 400)
    assert(DataSplit.weightedSample(df, "doc_id", lit(-5.0)).count() === 0)
    assert(DataSplit.weightedSample(df, "doc_id", lit(9.0)).count() === 400)
  }

  test("domainQuota: caps per domain, nested under a raise, map-side limited") {
    def kept(k: Int) = DataSplit.domainQuota(docs, "doc_id", "source", k)
      .select("doc_id").as[Long].collect().toSet
    val k5 = kept(5)
    val perDomain = DataSplit.domainQuota(docs, "doc_id", "source", 5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perDomain.values.forall(_ <= 5), perDomain)
    // under-quota domains pass through whole
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.filter(_._2 <= 5).foreach { case (d, n) =>
      assert(perDomain.getOrElse(d, 0L) === n)
    }
    assert(kept(5) === k5) // deterministic
    assert(k5.subsetOf(kept(8))) // raising the quota only adds rows
    // the rank<=k filter must plan as a map-side group limit
    val p = DataSplit.domainQuota(docs, "doc_id", "source", 5)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("extended"))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("shardShuffle: dense 1..n positions per shard, deterministic, shuffled") {
    val out = DataSplit.shardShuffle(docs, "doc_id", shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(out.length === docs.count())
    // positions are exactly 1..count within every shard
    out.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"shard $sh positions not dense")
    }
    // deterministic across runs
    val again = DataSplit.shardShuffle(docs, "doc_id", shards = 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(again.sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    // genuinely shuffled: within-shard order must not be doc_id order
    val inversions = out.groupBy(_._2).values.map { rows =>
      val byPos = rows.sortBy(_._3).map(_._1)
      byPos.zip(byPos.tail).count { case (a, b) => a > b }
    }.sum
    assert(inversions > 0, "shardShuffle preserved input order")
  }

  test("temperatureSample: smallest domain kept whole, larger flattened, " +
      "alpha=1 is identity, deterministic") {
    val before = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val nmin = before.values.min
    val after = DataSplit.temperatureSample(docs, "doc_id", "source", 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // expected rate per domain: (nmin/nd)^(1-alpha); kept counts land
    // within binomial noise (4 sigma) of rate*nd
    before.foreach { case (src, nd) =>
      val rate = math.pow(nmin.toDouble / nd, 0.5)
      val kept = after.getOrElse(src, 0L).toDouble
      val sigma = math.sqrt(nd * rate * (1 - rate))
      assert(math.abs(kept - rate * nd) <= 4 * sigma + 1,
        s"$src: kept $kept, expected ~${rate * nd}")
    }
    // smallest domain keeps everything (rate exactly 1)
    val smallest = before.minBy(_._2)._1
    assert(after(smallest) === before(smallest))
    // alpha = 1: untouched mixture
    val id = DataSplit.temperatureSample(docs, "doc_id", "source", 1.0)
    assert(id.count() === docs.count())
    // deterministic across runs
    val again = DataSplit.temperatureSample(docs, "doc_id", "source", 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === after)
  }

  test("NULL ids: samplers keep rate-1 rows, assign spreads, no drops") {
    // r7 review fix: NULL keys hash as "" everywhere — before, a NULL
    // id NULL'd the uniform draw and the row silently vanished from
    // weightedSample/temperatureSample even at rate 1.0, and assign()
    // routed every NULL-key row to 'test' (systematic eval-set bias)
    val docs = Seq((Some(1L), "a"), (None, "a"), (Some(3L), "a"))
      .toDF("doc_id", "source")
    assert(DataSplit.weightedSample(docs, "doc_id", lit(1.0)).count() === 3)
    assert(DataSplit
      .temperatureSample(docs, "doc_id", "source", 1.0).count() === 3)
    val s = DataSplit.assign(docs, "doc_id").filter($"doc_id".isNull)
      .select("split").as[String].collect()
    // the NULL row gets md5("")'s bucket (1 -> train at 80/10), not a
    // hardwired 'test'
    assert(s.toSeq === Seq("train"))
  }
}

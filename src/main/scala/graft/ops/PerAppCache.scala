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
  * variants. */
private[ops] object PerAppCache {
  type RelCache =
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]

  def newCache: RelCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  def cachedPerApp(cache: RelCache, s: SparkSession, d: String)(
      build: => DataFrame): DataFrame = {
    val appId = s.sparkContext.applicationId
    cache.keys.filter(_._1 != appId).foreach(cache.remove)
    cache.getOrElseUpdate((appId, d), build)
  }
}

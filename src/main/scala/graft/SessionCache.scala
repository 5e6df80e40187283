package graft

import org.apache.spark.sql.SparkSession

/** Shared hygiene for session-scoped memo caches (analyzed scans,
  * materialized pair graphs): entries die with their SparkContext,
  * and the map is hard-bounded so a long-lived driver churning
  * through `newSession()` instances cannot grow it forever. Values
  * must be cheap to rebuild — eviction clears the whole map.
  */
final class SessionCache[K, V](maxEntries: Int) {
  private val m = scala.collection.concurrent.TrieMap.empty[(SparkSession, K), V]

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    m.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    if (m.size > maxEntries) m.clear()
    m.getOrElseUpdate((spark, key), build)
  }

  /** drop entries whose key matches `pred` — the invalidation hook for
    * flows that rewrite data a cached value points at */
  def invalidate(pred: K => Boolean): Unit =
    m.filterInPlace((k, _) => !pred(k._2))
}

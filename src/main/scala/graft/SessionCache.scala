package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Shared hygiene for session-scoped memo caches (analyzed scans,
  * materialized pair graphs): entries die with their SparkContext,
  * and the map is hard-bounded so a long-lived driver churning
  * through `newSession()` instances cannot grow it forever.
  *
  * Overflow evicts the OLDEST entries (by insertion order) down to
  * half capacity and hands each evicted value to `onEvict` — the
  * hook where checkpoint-backed DataFrames release their pinned
  * executor storage (see [[org.apache.spark.sql.GraftBridge
  * .unpersistPlanRdds]]). Without it, eviction would silently drop
  * the only reference to blocks that then live until RDD GC; and
  * clearing wholesale would evict other sessions' live entries.
  */
final class SessionCache[K, V](maxEntries: Int, onEvict: V => Unit = (_: V) => ()) {
  private val m = scala.collection.concurrent.TrieMap.empty[(SparkSession, K), (V, Long)]
  private val seq = new AtomicLong()

  private def evict(k: (SparkSession, K), v: V): Unit =
    if (m.remove(k).isDefined) {
      // best-effort: an eviction must never fail the lookup that
      // triggered it (the value may belong to a dying session)
      try onEvict(v) catch { case _: Throwable => () }
    }

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    // dead-session entries: their SparkContext (and with it every
    // cached block) is already gone — drop without onEvict
    m.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    if (m.size > maxEntries)
      m.toSeq.sortBy(_._2._2).dropRight(maxEntries / 2).foreach {
        case (k, (v, _)) => evict(k, v)
      }
    m.getOrElseUpdate((spark, key), (build, seq.incrementAndGet()))._1
  }

  /** drop entries whose key matches `pred` — the invalidation hook for
    * flows that rewrite data a cached value points at */
  def invalidate(pred: K => Boolean): Unit =
    m.toSeq.foreach { case (k, (v, _)) => if (pred(k._2)) evict(k, v) }
}

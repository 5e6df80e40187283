package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession

/** Shared hygiene for session-scoped memo caches (analyzed scans,
  * materialized pair graphs): entries die with their SparkContext,
  * and the map is hard-bounded so a long-lived driver churning
  * through `newSession()` instances cannot grow it forever.
  *
  * Two removal paths with DIFFERENT cleanup semantics:
  *
  *  - `invalidate` (data the value points at was rewritten): evicted
  *    values go to `onEvict` — for checkpoint-backed DataFrames that
  *    unpersists the pinned blocks immediately. Outstanding handles
  *    were already meaningless (they referenced the old data).
  *  - overflow eviction (cache grew past `maxEntries`): the OLDEST
  *    entries are dropped by reference only, WITHOUT `onEvict` — a
  *    caller may still hold the returned DataFrame, and a
  *    localCheckpoint-backed frame cannot be recomputed once its
  *    blocks are unpersisted. Dropping the reference lets Spark's
  *    ContextCleaner reclaim the blocks when the last handle goes
  *    out of scope; eager unpersist here would break live handles.
  */
final class SessionCache[K, V](maxEntries: Int, onEvict: V => Unit = (_: V) => ()) {
  private val m = scala.collection.concurrent.TrieMap.empty[(SparkSession, K), (V, Long)]
  private val seq = new AtomicLong()

  def getOrElseUpdate(spark: SparkSession, key: K)(build: => V): V = {
    // dead-session entries: their SparkContext (and with it every
    // cached block) is already gone — drop without onEvict
    m.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    if (m.size > maxEntries)
      // oldest-first, down to half capacity; reference-drop only (see
      // class doc — live handles must keep working)
      m.toSeq.sortBy(_._2._2).dropRight(maxEntries / 2).foreach {
        case (k, _) => m.remove(k): Unit
      }
    m.getOrElseUpdate((spark, key), (build, seq.incrementAndGet()))._1
  }

  /** drop entries whose key matches `pred` — the invalidation hook for
    * flows that rewrite data a cached value points at. Values are
    * handed to `onEvict` (their backing storage is released: any
    * outstanding handle already referenced stale data). */
  def invalidate(pred: K => Boolean): Unit =
    m.toSeq.foreach { case (k, (v, _)) =>
      if (pred(k._2) && m.remove(k).isDefined) {
        // best-effort: invalidation must not fail the caller
        try onEvict(v) catch { case _: Throwable => () }
      }
    }
}

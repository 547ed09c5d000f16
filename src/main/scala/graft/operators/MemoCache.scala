package graft.operators

import org.apache.spark.sql.DataFrame

/** Bounded LRU over persisted/checkpointed memo frames — the shared
  * backing for the cross-query memo pattern (EntityResolution's scored
  * candidates, Calibration's centered base + trained weights,
  * TokenizerTrain's merge tables): one frame per distinct
  * (session identity, source-plan semantic hash, params) key, reused by
  * every query in the family within a session.
  *
  * An unbounded map leaks cached frames in a long-lived session that
  * scores many distinct corpora/configs — the defect class
  * CacheHygieneSpec gates for the graph family. Hits refresh recency;
  * overflow RELEASES (via [[graft.FrameRelease]] — plain `unpersist` is
  * a no-op for the localCheckpoint-backed entries like TokenizerTrain's
  * merge tables) and drops the least recently used entry. A new REQUEST
  * for an evicted key recomputes, so correctness across calls holds; but
  * a checkpoint-backed frame HELD from an earlier getOrElseUpdate dies
  * with its blocks (lineage is truncated — nothing to recompute from),
  * so consumers must finish with a returned frame before the session can
  * touch `maxEntries` further distinct configs, and `maxEntries` is
  * sized above any query family's concurrent working set. `build` runs
  * inside the lock so one thread pays each miss.
  *
  * Every instance self-registers so harnesses that blanket-unpersist the
  * session's RDDs between query families ([[graft.Bench]]) can first
  * flush the memo maps through [[LruFrameCache.clearAll]] — otherwise a
  * later memo HIT would hand back a frame whose checkpoint blocks the
  * blanket clear already destroyed, and acting on it throws
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
  */
private[graft] final class LruFrameCache(maxEntries: Int) {
  require(maxEntries >= 1)
  private val entries = scala.collection.mutable
    .LinkedHashMap.empty[(Int, String, String), DataFrame]
  LruFrameCache.register(this)

  def getOrElseUpdate(key: (Int, String, String),
      build: => DataFrame): DataFrame = synchronized {
    entries.remove(key) match {
      case Some(hit) => entries.put(key, hit); hit
      case None =>
        val built = build
        entries.put(key, built)
        while (entries.size > maxEntries) {
          val (oldest, frame) = entries.head
          entries.remove(oldest)
          graft.FrameRelease.release(frame)
        }
        built
    }
  }

  /** Release every entry and empty the map (see [[LruFrameCache.clearAll]]).
    * Per-entry release failures are swallowed: entries may belong to an
    * already-STOPPED SparkSession (test suites, session-per-request
    * services), where touching the frame throws IllegalStateException —
    * the flush must still drop the map entries so the dead references go. */
  def clear(): Unit = synchronized {
    entries.valuesIterator.foreach { f =>
      try graft.FrameRelease.release(f)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    entries.clear()
  }
}

private[graft] object LruFrameCache {
  private val registry =
    scala.collection.mutable.ArrayBuffer.empty[LruFrameCache]

  private def register(c: LruFrameCache): Unit =
    synchronized { registry += c }

  /** Flush EVERY memo cache in the process. Harness-only: call before a
    * blanket `getPersistentRDDs.foreach(_.unpersist)` so no memo map is
    * left holding a frame whose backing blocks were just destroyed. */
  def clearAll(): Unit = {
    val caches = synchronized { registry.toVector }
    caches.foreach(_.clear())
  }
}

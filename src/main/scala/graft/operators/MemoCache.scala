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
  * overflow unpersists and drops the least recently used entry.
  * Correctness is unaffected: an evicted frame recomputes on next use.
  * `build` runs inside the lock so one thread pays each miss.
  */
private[operators] final class LruFrameCache(maxEntries: Int) {
  require(maxEntries >= 1)
  private val entries = scala.collection.mutable
    .LinkedHashMap.empty[(Int, String, String), DataFrame]

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
          frame.unpersist(false)
        }
        built
    }
  }
}

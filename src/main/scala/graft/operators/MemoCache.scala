package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Bounded LRU over persisted/checkpointed memo frames — the shared
  * backing for the cross-query memo pattern (EntityResolution's scored
  * candidates, Calibration's centered base + trained weights,
  * TokenizerTrain's merge tables): one frame per distinct
  * (session key, source-plan semantic hash, params) key, reused by
  * every query in the family within a session. The session component
  * comes from [[graft.SessionKey]] — a per-instance UUID, never
  * `identityHashCode` (a GC'd session's address can be reused and would
  * silently serve a dead session's frame to a new one).
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
  * With [[LruFrameCache.debug]] on (tests, diagnosis), every eviction of
  * a checkpoint-backed frame leaves a TOMBSTONE keyed by the destroyed
  * RDD id; a held-frame touch that then dies with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND can be attributed to the exact
  * evicted memo key via [[LruFrameCache.evictionTombstone]] instead of
  * reading as an unexplained storage failure.
  *
  * Every instance self-registers (weakly — a per-session/per-request
  * instance becomes collectable once its owner drops it) so harnesses
  * that blanket-unpersist the session's RDDs between query families
  * ([[graft.Bench]]) can first flush the memo maps through
  * [[LruFrameCache.clearAll]] — otherwise a later memo HIT would hand
  * back a frame whose checkpoint blocks the blanket clear already
  * destroyed, and acting on it throws CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND.
  */
private[graft] final class LruFrameCache(maxEntries: Int) {
  require(maxEntries >= 1)
  private val entries = scala.collection.mutable
    .LinkedHashMap.empty[(String, String, String), DataFrame]
  LruFrameCache.register(this)

  def getOrElseUpdate(key: (String, String, String),
      build: => DataFrame): DataFrame = synchronized {
    entries.remove(key) match {
      case Some(hit) => entries.put(key, hit); hit
      case None =>
        val built = build
        entries.put(key, built)
        while (entries.size > maxEntries) {
          val (oldest, frame) = entries.head
          entries.remove(oldest)
          LruFrameCache.recordTombstone(oldest, frame)
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
    entries.foreach { case (key, f) =>
      try {
        LruFrameCache.recordTombstone(key, f)
        graft.FrameRelease.release(f)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    entries.clear()
  }
}

/** Plan-keyed persist for intra-operator SHARED subtrees (a self-join's
  * two sides, a frame feeding both a df cap and a join) — the house
  * alternative to a raw `.persist()` whose lifetime nothing owns.
  *
  * A raw persist inside an operator relies on a caller-cleanup contract
  * ("run `spark.catalog.clearCache()` when done") that a library call
  * has no way to honor per-frame: each distinct corpus scored in a
  * long-lived session pins a corpus-sized MEMORY_AND_DISK entry until a
  * harness-level blanket flush. Routing through the bounded
  * [[LruFrameCache]] gives every such persist an owned lifetime:
  * repeated calls on the same input reuse one entry (keyed by session
  * UUID + operator tag + the subtree's semantic plan hash), overflow
  * RELEASES the least-recently-used entry, and
  * [[LruFrameCache.clearAll]] reaches them all.
  *
  * Eviction is always SAFE here, unlike for checkpoint-backed memo
  * frames: these entries are plain persist-backed (lineage intact), so
  * a consumer holding an evicted frame simply recomputes. */
private[graft] object PlanPersist {
  // 32, not 16: the round-11 sweep routed every returned-lifetime
  // intra-operator persist through here (~35 tags); a composite operator
  // like the curation pipeline holds ~7 live entries at once and a bench
  // family runs several such queries between flushes — a too-small bound
  // would evict entries still feeding live frames (correct but silently
  // recomputes). 32 covers the deepest family working set with headroom;
  // overflow is still bounded and safe.
  private val cache = new LruFrameCache(maxEntries = 32)

  /** Wall-seconds each tag's first materialization cost (min over
    * builds, the bench's min-of-N discipline). A memoized build vanishes
    * from every steady-state per-query timing — min-of-N discards the
    * first-touch run that paid it — so the builds are reported as
    * explicit artifact entries ([[graft.Bench]] merges this map into
    * `memo_build_secs`) instead of leaving a shared-pass regression
    * invisible to the trend guard (r11 verdict item 1). */
  val buildSecs =
    scala.collection.concurrent.TrieMap.empty[String, Double]

  def apply(tag: String, df: DataFrame): DataFrame =
    cache.getOrElseUpdate(
      (graft.SessionKey(df.sparkSession), tag,
        df.queryExecution.analyzed.semanticHash().toString), {
        // materialize EAGERLY on the miss path so the build is timed
        // where it happens: lazily-persisted entries charged their whole
        // upstream pipeline to whichever consumer touched them first,
        // which min-of-N then discarded — the shared-build cost vanished
        // from the artifact entirely. count() on a freshly-persisted
        // frame fills the cache with full-row batches (InMemoryRelation
        // materializes every column regardless of the action's
        // projection), so consumers read exactly what they read before.
        val t0 = System.nanoTime()
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        val sec = (System.nanoTime() - t0) / 1e9
        buildSecs.updateWith(tag) {
          case Some(prev) => Some(math.min(prev, sec))
          case None => Some(sec)
        }
        p
      })
}

private[graft] object LruFrameCache {
  private val registry = scala.collection.mutable
    .ArrayBuffer.empty[java.lang.ref.WeakReference[LruFrameCache]]

  private def register(c: LruFrameCache): Unit = synchronized {
    registry.filterInPlace(_.get != null) // prune collected instances
    registry += new java.lang.ref.WeakReference(c)
  }

  /** Flush EVERY live memo cache in the process. Harness-only: call
    * before a blanket `getPersistentRDDs.foreach(_.unpersist)` so no memo
    * map is left holding a frame whose backing blocks were just
    * destroyed. */
  def clearAll(): Unit = {
    val caches = synchronized { registry.flatMap(r => Option(r.get)).toVector }
    caches.foreach(_.clear())
  }

  /** Eviction tombstones (debug/test only): destroyed-checkpoint RDD id →
    * the memo key whose eviction destroyed it. Bounded by eviction count
    * in a debug run; off (and empty) in production. */
  @volatile var debug: Boolean = java.lang.Boolean.getBoolean("graft.memo.debug")
  private val tombstones =
    scala.collection.concurrent.TrieMap.empty[Int, String]

  private def recordTombstone(key: (String, String, String),
      frame: DataFrame): Unit =
    if (debug) {
      try {
        frame.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            tombstones.put(lr.rdd.id, key.toString())
          case _ => ()
        }
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** If `df` is a checkpoint-backed frame whose blocks a memo eviction
    * destroyed (debug mode), return the evicting key — turns a cryptic
    * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND into "you held frame X past its
    * eviction". None for live frames, non-checkpoint roots, or with
    * debug off. */
  def evictionTombstone(df: Dataset[_]): Option[String] =
    try {
      df.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          tombstones.get(lr.rdd.id)
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}

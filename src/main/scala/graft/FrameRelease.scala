package graft

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Releases a superseded materialized frame regardless of HOW it was
  * materialized.
  *
  * `Dataset.unpersist` only removes CacheManager entries created by
  * `Dataset.persist`. A frame returned by `localCheckpoint` is backed by
  * a directly-persisted RDD the CacheManager never sees — calling
  * `unpersist` on it is a silent no-op and the checkpoint blocks live
  * until driver GC + ContextCleaner get around to them (verified on this
  * Spark build: `getPersistentRDDs.size` is unchanged after `unpersist`
  * on a localCheckpointed frame). Every "drop the superseded checkpoint"
  * site (streaming state folds, iterative round frames, LRU memo
  * eviction) must release through here instead.
  *
  * Only the analyzed plan's ROOT is matched: a frame that merely DERIVES
  * from a checkpoint must not release its parent's blocks. A released
  * checkpoint frame is dead (localCheckpoint truncates lineage, so there
  * is nothing to recompute from) — callers release only frames that are
  * provably superseded, after the successor was EAGERLY materialized.
  */
object FrameRelease {
  def release(df: Dataset[_]): Unit = {
    if (df == null) return
    // best-effort by contract: the frame is already superseded, so a
    // failed release (e.g. the owning SparkContext was stopped between
    // materialization and cleanup) must never abort the caller's work
    try {
      df.unpersist(false)
      df.queryExecution.analyzed match {
        case lr: LogicalRDD => lr.rdd.unpersist(false)
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}

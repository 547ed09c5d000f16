package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the other join Spark lacks natively
  * (alongside as-of). A naive `points JOIN intervals ON p >= lo AND p < hi`
  * has no equi-key, so Spark plans a BroadcastNestedLoopJoin: O(|P| x |I|)
  * comparisons, the textbook scale-killer.
  *
  * The scale shape is bucketization: intervals are exploded onto the
  * fixed-width buckets they overlap, points map to their single bucket,
  * candidates come from an EQUI-join on the bucket id, and the exact
  * containment predicate filters candidates. Shuffle keys are bucket
  * longs; interval replication is ceil(span / bucketWidth) rows — pick
  * the width near the median interval span so replication stays O(1)
  * per interval while a bucket holds few unrelated intervals.
  */
object RangeJoin {

  /** Each point row joined to every interval row with
    * lo <= point < hi (half-open). Intervals where lo >= hi are empty by
    * definition and dropped. Output = point columns ++ interval columns.
    */
  /** Replication guard: an interval spanning more than this many buckets
    * (a sentinel "open-ended" hi, or a bucketWidth wildly below the span
    * scale) would explode into a pathological sequence — fail loudly at
    * the offending ROW instead of OOMing an executor. The guard rides
    * inside the sequence bound so the optimizer can't prune it away. */
  private def boundedHiBucket(
      loB: org.apache.spark.sql.Column, hiB: org.apache.spark.sql.Column,
      maxBuckets: Int): org.apache.spark.sql.Column =
    when(hiB - loB < lit(maxBuckets.toLong), hiB)
      .otherwise(raise_error(format_string(
        s"interval spans more than $maxBuckets buckets " +
          "(bucket %d..%d); raise bucketWidth or maxBucketsPerInterval",
        loB, hiB)).cast("long"))

  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double, maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    // hi is exclusive but floor(hi/w) may still be the last overlapped
    // bucket (when hi is not on a boundary); the containment filter
    // discards the at-most-one superfluous bucket's candidates
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    val ib = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("__b", explode(sequence(loB,
        boundedHiBucket(loB, hiB, maxBucketsPerInterval))))
    val pb = points.withColumn("__b",
      floor(col(pCol) / bucketWidth).cast("long"))
    pb.join(ib, "__b")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__b")
  }

  /** Interval-overlap join: every (a, b) pair whose half-open intervals
    * intersect (a.lo < b.hi AND b.lo < a.hi). Both sides explode onto
    * their buckets; a pair overlapping k shared buckets would surface k
    * times from the equi-join, so each candidate is emitted ONLY in the
    * first bucket both intervals share — floor(max(lo_a, lo_b)/width) —
    * the standard spatial-join dedup that avoids a distinct shuffle over
    * the (much larger) candidate set entirely.
    */
  def intervalOverlap(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      bucketWidth: Double, maxBucketsPerInterval: Int = 10000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def explodeBuckets(df: DataFrame, lo: String, hi: String): DataFrame = {
      val loB = floor(col(lo) / bucketWidth).cast("long")
      val hiB = floor(col(hi) / bucketWidth).cast("long")
      df.filter(col(lo) < col(hi))
        .withColumn("__b", explode(sequence(loB,
          boundedHiBucket(loB, hiB, maxBucketsPerInterval))))
    }
    explodeBuckets(a, aLo, aHi).join(explodeBuckets(b, bLo, bHi), "__b")
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__b") ===
        floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long"))
      .drop("__b")
  }
}

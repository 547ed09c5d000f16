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
  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ib = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("__b", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive but floor(hi/w) may still be the last overlapped
        // bucket (when hi is not on a boundary); the containment filter
        // discards the at-most-one superfluous bucket's candidates
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pb = points.withColumn("__b",
      floor(col(pCol) / bucketWidth).cast("long"))
    pb.join(ib, "__b")
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop("__b")
  }
}

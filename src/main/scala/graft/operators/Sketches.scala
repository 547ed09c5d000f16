package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the pre-aggregation algebra a 100 TB
  * pipeline runs on: sketch each ingest window ONCE at write time, then
  * answer cross-window frequency questions by merging the tiny sketch
  * artifacts instead of re-scanning raw data. The reference re-reads its
  * source tables for every run (`/root/reference/osarchiver/source/
  * db.py:279-298`); at scale the only affordable shape is "reduce each
  * day to a constant-size summary, reaggregate summaries".
  *
  * The Count-Min sketch (Cormode & Muthukrishnan 2005) is LINEAR: the
  * sketch of a union is the cell-wise sum of the sketches, exactly. All
  * arithmetic is integer (md5-derived bucket hashes, BIGINT cell
  * counts), so a merged sketch is bit-identical to the sketch built
  * directly over the union on any engine and any partitioning — the
  * same q67 discipline, factored into a reusable build/merge/probe
  * algebra.
  */
object Sketches {

  /** Row `depth`'s bucket for `key`: 8 md5 hex chars -> BIGINT mod
    * width. Engine-portable integer hashing (no murmur seed drift). */
  private[operators] def cmsBucket(depth: Column, key: Column,
      width: Int): Column =
    conv(substring(md5(concat(depth.cast("string"), lit(":"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % width

  /** One Count-Min sketch PER GROUP (e.g. per ingest day): output
    * (grp, d, bucket, cell) with at most depth*width rows per group
    * regardless of key cardinality. One explode(depth) pass + one
    * map-side-combinable aggregation — this is the artifact a pipeline
    * persists beside each window's raw data. */
  def countMinByGroup(df: DataFrame, groupCol: String, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1, width >= 2")
    df.select(col(groupCol).as("grp"), col(keyCol).as("k"))
      .select(col("grp"), col("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("k"), width))
      .groupBy("grp", "d", "bucket").agg(count(lit(1)).as("cell"))
  }

  /** Merge per-group sketches into one sketch over their union — CMS
    * linearity: cell-wise BIGINT sum, bit-equal to sketching the union
    * directly. Input is groups * depth * width rows AT MOST (constant
    * per group); the rollup never touches raw data. */
  def mergeCountMin(sketches: DataFrame): DataFrame =
    sketches.groupBy("d", "bucket").agg(sum(col("cell")).as("cell"))

  /** Point-frequency estimates for each probe row's `keyCol`: min over
    * the depth rows' cells — never an underestimate. The sketch is
    * <= depth*width rows, so the probe join broadcasts it; probe columns
    * pass through unchanged. */
  def probeCountMin(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val passThrough = probes.columns.map(col)
    probes
      .select(passThrough :+
        explode(sequence(lit(0), lit(depth - 1))).as("d"): _*)
      .withColumn("bucket", cmsBucket(col("d"), col(keyCol), width))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(passThrough: _*)
      .agg(min(col("cell")).as("cms_estimate"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Archive maintenance: compact a parquet directory to a target file size.
  *
  * Long-running archival produces many small files (one batch = one or
  * more part files); at 100 TB that turns every downstream scan into a
  * listing/open-latency problem. Compaction rewrites the directory with
  * partition count sized from the actual bytes on storage, using the same
  * backup-rename swap as the upsert sink so a crash never loses the
  * archive.
  */
object Compaction {

  /** Rewrite `path` so each output file targets `targetBytes` (default
    * 128 MB — one HDFS/object-store block). Returns the new file count. */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.__compact__")
    val backup = new org.apache.hadoop.fs.Path(s"$path.__old__")
    df.repartition(parts).write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(backup)) fs.delete(backup, true)
    fs.rename(p, backup)
    if (!fs.rename(tmp, p)) {
      fs.rename(backup, p)
      throw new java.io.IOException(s"compaction rename failed for $path")
    }
    fs.delete(backup, true)
    parts
  }

  /** Cluster-and-write: range-partition on `clusterCols`, sort within each
    * partition, write parquet. Every output file then owns a DISJOINT key
    * range, so parquet min/max column statistics let any later scan skip
    * every file (and row group) outside its predicate range — the
    * data-layout investment that turns a 100 TB archive scan into a
    * few-file read for time- or key-bounded queries. The single-dimension
    * cousin of Z-ordering; pay the one range shuffle at write time, save
    * it on every read after.
    *
    * `parts` sizes the files (aim for ~128 MB each); the range partitioner
    * samples the data, so file boundaries follow the actual distribution
    * (a skewed key space still yields even files).
    */
  def clusteredWrite(
      df: DataFrame, path: String, clusterCols: Seq[String],
      parts: Int): Unit = {
    require(clusterCols.nonEmpty, "at least one cluster column")
    df.repartitionByRange(parts, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }
}

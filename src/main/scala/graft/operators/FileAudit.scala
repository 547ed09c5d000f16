package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout inventory — the small-files audit a table owner runs
  * before scheduling compaction: per table, one row per underlying data
  * file with its row count, derived entirely from `input_file_name()`
  * during a normal scan (no driver-side filesystem walking, so the audit
  * scales exactly like any other query and works on any Hadoop FS URI).
  *
  * Thousands of tiny files mean task-scheduling overhead dominates scan
  * time and footer/open costs multiply; the fix is
  * [[Compaction.compactTo]] / `clusteredWrite`, and this report is the
  * signal deciding when. The reference rewrites whole tables blindly
  * (`osarchiver/source/db.py` delete-then-rewrite has no notion of file
  * granularity); file-level observability is part of the SURVEY.md 2.8
  * layout surface.
  *
  * Oracle note: file BASENAMES carry a per-write UUID, so they cannot
  * reach a SQL oracle; the `file_dir` column (the file's immediate
  * parent — a `partitionBy` value dir or the table dir) IS
  * deterministic, which is how `s22_file_inventory` earns a bit-exact
  * oracle: write a hash-bucketed `partitionBy` layout, inventory it,
  * and project (tbl, file_dir, n_rows). FileAuditSpec additionally
  * gates arbitrary layouts including the basenames.
  */
object FileAudit {

  /** One row per (table, data file): (tbl, file_dir, file_name, n_rows);
    * `file_name` is the basename and `file_dir` its immediate parent
    * directory name, so the report is location-portable while still
    * distinguishing files of a `partitionBy` layout whose basenames
    * could repeat across value directories. */
  def fileInventory(spark: SparkSession,
      tables: Seq[(String, String)]): DataFrame = {
    require(tables.nonEmpty, "fileInventory needs at least one table")
    tables.map { case (name, path) =>
      spark.read.parquet(path)
        .groupBy(
          regexp_extract(input_file_name(), "([^/]+)/[^/]+$", 1)
            .as("file_dir"),
          regexp_extract(input_file_name(), "[^/]+$", 0)
            .as("file_name"))
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(name).as("tbl"), col("file_dir"), col("file_name"),
          col("n_rows"))
    }.reduce(_ unionAll _)
  }

  /** The per-table compaction signal: file count, total rows, smallest /
    * mean file in rows, and a small-file flag when the MEAN file holds
    * fewer than `smallRowThreshold` rows (integer comparison:
    * n_rows < threshold * n_files). */
  def compactionReport(spark: SparkSession, tables: Seq[(String, String)],
      smallRowThreshold: Long): DataFrame =
    fileInventory(spark, tables)
      .groupBy("tbl")
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
        min(col("n_rows")).as("min_file_rows"))
      .withColumn("needs_compaction",
        col("n_rows") < lit(smallRowThreshold) * col("n_files"))
}

package graft.catalog

import graft.Tables
import graft.Tables.TableSpec
import org.apache.spark.sql.SparkSession

/** Catalog discovery + table election — the reference's plan-time pruning.
  *
  * These are the Spark-side equivalents of SURVEY.md §2.1 S1–S5 and §2.2
  * T1–T5: everything here prunes whole tables/databases *before any row is
  * read*, i.e. it is plan-time work on the driver, deliberately not
  * expressed as Spark jobs. Reference behavior being mirrored:
  *  - DB discovery + exclusion regex incl. hardwired system DBs
  *    (/root/reference/osarchiver/source/db.py:19,76-120)
  *  - table include/exclude lists split on `,;\n` with `*` wildcard
  *    (/root/reference/osarchiver/source/db.py:45-50,146-174)
  *  - deleted-column gate (/root/reference/osarchiver/source/db.py:153-166)
  */
object Catalog {

  /** System databases never archived, regardless of config.
    * Mirrors NOT_OS_DB (/root/reference/osarchiver/source/db.py:19). */
  val systemDatabases: Seq[String] =
    Seq("mysql", "performance_schema", "information_schema", "sys")

  /** Split a config list on the reference's separators `,` `;` newline
    * (/root/reference/osarchiver/source/db.py:45-50). */
  def splitList(value: String): Seq[String] =
    value.split("[,;\n]").map(_.trim).filter(_.nonEmpty).toSeq

  /** Anchored whole-name exclusion regex, union of configured patterns +
    * system DBs (/root/reference/osarchiver/source/db.py:76-85). */
  def excluded(name: String, patterns: Seq[String]): Boolean = {
    val all = patterns.filter(_.nonEmpty)
    all.nonEmpty && ("^(" + all.mkString("|") + ")$").r.matches(name)
  }

  /** S1/S2 — discovery scan over the parquet testbed: tables are the
    * `*.parquet` entries in the source directory (JDBC deployments read
    * information_schema instead). Hadoop FileSystem, not java.io.File, so
    * object-store/HDFS source dirs discover correctly instead of silently
    * electing nothing. */
  def discoverTables(
      dir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  }

  /** T1/T2 — database election: `*` means "all discovered", then prune by
    * exclusion regex + hardwired system DBs. */
  def electDatabases(
      discovered: Seq[String],
      include: String,
      excludeRegexes: Seq[String]): Seq[String] = {
    val wanted =
      if (include.trim == "*") discovered
      else splitList(include).filter(discovered.contains)
    wanted.filterNot(db => excluded(db, excludeRegexes ++ systemDatabases))
  }

  /** T3/T4/T5 — table election: include list/wildcard, exclusion regex, and
    * the soft-delete-column gate (a table with no retention column cannot be
    * archived and is skipped). Returns elected specs in FK-topological
    * (child-first) order, exactly as the reference archives them. */
  def electTables(
      spark: SparkSession,
      dir: String,
      specs: Seq[TableSpec],
      include: String = "*",
      excludeRegexes: Seq[String] = Nil,
      deletedColumnRequired: Boolean = true): Seq[TableSpec] = {
    val wanted =
      if (include.trim == "*") specs
      else {
        val names = splitList(include).toSet
        specs.filter(s => names.contains(s.name))
      }
    val afterExclude = wanted.filterNot(s => excluded(s.name, excludeRegexes))
    // S3 gate: verify the declared retention column actually exists in the
    // physical schema (schema check, not a row scan).
    val gated =
      if (!deletedColumnRequired) afterExclude
      else afterExclude.filter { s =>
        s.deletedColumn.exists { c =>
          Tables.load(spark, dir, s.name).schema.fieldNames.contains(c)
        }
      }
    val order = TopoSort.childFirst(specs)
    gated.sortBy(s => order.indexOf(s.name))
  }
}

package graft.config

import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

/** INI configuration loader + archiver pipeline factory (SURVEY.md X5).
  *
  * Mirrors the reference's configparser-with-ExtendedInterpolation loader
  * (/root/reference/osarchiver/config.py:16,25-156): `[DEFAULT]` fallbacks,
  * `${key}` / `${section:key}` interpolation, list values split on `,;\n`,
  * boolean coercion, and the `[archiver:*]` / `[src:*]` / `[dst:*]` section
  * naming scheme. Factories are a sealed-trait match instead of the
  * reference's reflective dynamic import
  * (/root/reference/osarchiver/common/__init__.py:11-28).
  */
object Ini {

  final case class Parsed(sections: Map[String, Map[String, String]]) {

    /** Value lookup with [DEFAULT] fallback + ${...} interpolation. */
    def get(section: String, key: String): Option[String] =
      raw(section, key).map(v => interpolate(section, v, depth = 0))

    def getOrElse(section: String, key: String, default: String): String =
      get(section, key).getOrElse(default)

    def bool(section: String, key: String, default: Boolean = false): Boolean =
      get(section, key).map(_.trim.toLowerCase) match {
        case Some("true") | Some("yes") | Some("on") | Some("1") => true
        case Some("false") | Some("no") | Some("off") | Some("0") => false
        case Some(other) => throw new IllegalArgumentException(
          s"not a boolean: [$section] $key = $other")
        case None => default
      }

    def int(section: String, key: String, default: Int): Int =
      get(section, key).map(_.trim.toInt).getOrElse(default)

    def list(section: String, key: String): Seq[String] =
      get(section, key).toSeq.flatMap(_.split("[,;\n]")).map(_.trim).filter(_.nonEmpty)

    def sectionNames: Seq[String] = sections.keys.toSeq.sorted

    private def raw(section: String, key: String): Option[String] =
      sections.get(section).flatMap(_.get(key))
        .orElse(sections.get("DEFAULT").flatMap(_.get(key)))

    // ${key} resolves in the same section (with DEFAULT fallback);
    // ${section:key} resolves across sections (split on the LAST colon —
    // section names like "src:live" contain colons themselves).
    private val Ref = raw"\$$\{([^}]+)\}".r
    private def interpolate(section: String, value: String, depth: Int): String = {
      if (depth > 10)
        throw new IllegalArgumentException(s"interpolation loop in [$section]: $value")
      Ref.replaceAllIn(value, m => {
        val inner = m.group(1)
        val idx = inner.lastIndexOf(':')
        val (sec, key) =
          if (idx < 0) (section, inner) else (inner.take(idx), inner.drop(idx + 1))
        val resolved = raw(sec, key).getOrElse(throw new IllegalArgumentException(
          s"unresolvable interpolation $${$inner} in [$section]"))
        java.util.regex.Matcher.quoteReplacement(interpolate(sec, resolved, depth + 1))
      })
    }
  }

  /** Parse INI text: `[section]` headers, `key = value` / `key: value`
    * entries, `#`/`;` comment lines, blank lines ignored. */
  def parse(text: String): Parsed = {
    val sections = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, String]]()
    var current = "DEFAULT"
    sections.getOrElseUpdate(current, scala.collection.mutable.LinkedHashMap())
    text.linesIterator.foreach { line =>
      val t = line.trim
      if (t.isEmpty || t.startsWith("#") || t.startsWith(";")) ()
      else if (t.startsWith("[") && t.endsWith("]")) {
        current = t.substring(1, t.length - 1).trim
        sections.getOrElseUpdate(current, scala.collection.mutable.LinkedHashMap())
      } else {
        val idx = {
          val e = t.indexOf('='); val c = t.indexOf(':')
          if (e < 0) c else if (c < 0) e else math.min(e, c)
        }
        if (idx <= 0)
          throw new IllegalArgumentException(s"unparseable config line: $line")
        sections(current).put(t.take(idx).trim, t.drop(idx + 1).trim)
      }
    }
    Parsed(sections.view.mapValues(_.toMap).toMap)
  }
}

/** One source definition (the live store being archived). */
final case class SourceConfig(
    name: String,
    dir: String,                       // parquet root (JDBC URL in a real deployment)
    databases: String = "*",
    tables: String = "*",
    excludedDatabases: Seq[String] = Nil,
    excludedTables: Seq[String] = Nil,
    deletedColumn: String = "deleted_at",
    retention: String = "12 MONTH",    // SQL interval, as the reference's `${retention}`
    whereTemplate: Option[String] = None) // overrides the default retention predicate

/** One destination definition. */
sealed trait DestinationConfig { def name: String }
final case class ParquetDestination(name: String, directory: String,
    evolveSchema: Boolean = false) extends DestinationConfig
final case class CsvDestination(name: String, directory: String,
    compression: Option[String] = None) extends DestinationConfig
final case class SqlDumpDestination(name: String, directory: String,
    compression: Option[String] = None) extends DestinationConfig
final case class JdbcDestination(name: String, url: String,
    dialect: String = "ansi", batchSize: Int = 1000) extends DestinationConfig

/** One archiver = source + fan-out destinations + delete policy
  * (reference `[archiver:*]` section + Archiver object,
  * /root/reference/osarchiver/config.py:120-154). */
final case class ArchiverConfig(
    name: String,
    source: SourceConfig,
    destinations: Seq[DestinationConfig],
    archiveData: Boolean = true,
    deleteData: Boolean = false,
    dryRun: Boolean = false)

object Config {

  private val DateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm-ss")
    .withZone(ZoneOffset.UTC)

  /** Runtime `{now}` / `{date}` template interpolation — `{now}` is a single
    * per-run snapshot so every table sees a consistent cut
    * (/root/reference/osarchiver/source/db.py:58-65;
    * `{date}` in output paths, destination/file/base.py:49-50). */
  def interpolateRuntime(value: String, now: Instant): String =
    value
      .replace("{now}", now.toString)
      .replace("{date}", DateFmt.format(now))

  /** Build archiver pipelines from parsed INI (sections `[archiver:x]`,
    * `[src:y]`, `[dst:z]`; `enable=false` archivers skipped). */
  def archivers(ini: Ini.Parsed, dryRun: Boolean = false): Seq[ArchiverConfig] = {
    ini.sectionNames.filter(_.startsWith("archiver:")).flatMap { sec =>
      if (!ini.bool(sec, "enable", default = true)) None
      else {
        val srcName = ini.get(sec, "src").getOrElse(
          throw new IllegalArgumentException(s"[$sec] missing src"))
        val src = sourceConfig(ini, s"src:$srcName")
        val dsts = ini.list(sec, "dst").map(d => destinationConfig(ini, s"dst:$d"))
        Some(ArchiverConfig(
          name = sec.stripPrefix("archiver:"),
          source = src,
          destinations = dsts,
          archiveData = ini.bool(sec, "archive_data", default = true),
          deleteData = ini.bool(sec, "delete_data", default = false),
          dryRun = dryRun))
      }
    }
  }

  private def sourceConfig(ini: Ini.Parsed, sec: String): SourceConfig =
    SourceConfig(
      name = sec.stripPrefix("src:"),
      dir = ini.get(sec, "dir").getOrElse(
        throw new IllegalArgumentException(s"[$sec] missing dir")),
      databases = ini.getOrElse(sec, "databases", "*"),
      tables = ini.getOrElse(sec, "tables", "*"),
      excludedDatabases = ini.list(sec, "excluded_databases"),
      excludedTables = ini.list(sec, "excluded_tables"),
      deletedColumn = ini.getOrElse(sec, "deleted_column", "deleted_at"),
      retention = ini.getOrElse(sec, "retention", "12 MONTH"),
      whereTemplate = ini.get(sec, "where"))

  private def destinationConfig(ini: Ini.Parsed, sec: String): DestinationConfig = {
    val name = sec.stripPrefix("dst:")
    def dir = ini.get(sec, "directory").getOrElse(
      throw new IllegalArgumentException(s"[$sec] missing directory"))
    val compression = ini.get(sec, "compression")
    ini.getOrElse(sec, "type", "parquet") match {
      case "parquet" => ParquetDestination(name, dir,
        // evolve_schema=yes switches the W4 drift guard to additive
        // evolution (new/dropped columns merge; type changes still fail)
        evolveSchema = ini.bool(sec, "evolve_schema", default = false))
      case "csv" => CsvDestination(name, dir, compression)
      case "sql" => SqlDumpDestination(name, dir, compression)
      case "jdbc" => JdbcDestination(name,
        url = ini.get(sec, "url").getOrElse(
          throw new IllegalArgumentException(s"[$sec] missing url")),
        dialect = ini.getOrElse(sec, "dialect", "ansi"),
        batchSize = ini.int(sec, "batch_size", 1000))
      case other => throw new IllegalArgumentException(
        s"[$sec] unknown destination type $other")
    }
  }
}

package graft.operators

import java.time.Instant

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The retention (soft-delete) row predicate — SURVEY.md P2.
  *
  * Reference semantics: a row is archivable iff its soft-delete column is
  * non-NULL and at or before `now - retention`, where the WHERE text is a
  * configurable template defaulting to
  * `${deleted_column} <= SUBDATE('{now}', INTERVAL ${retention})` and `{now}`
  * is captured once per run (/root/reference/archiver_sample.ini:35,
  * /root/reference/osarchiver/source/db.py:33,58-65); a NULL deleted column
  * means "live, never archive" (/root/reference/README.md:11).
  *
  * Spark-first: the predicate is a plain `Column`, so Catalyst pushes it
  * into the parquet/JDBC scan (PushedFilters) — no client-side filtering, no
  * custom Expression needed.
  */
object Retention {

  /** Render an instant as a session-timezone-correct TIMESTAMP literal.
    * NOT java.sql.Timestamp.toString — that renders in the JVM default
    * timezone, which silently shifts the cutoff when the driver host TZ
    * differs from the (UTC) Spark session timezone. */
  private def utcLiteral(now: Instant): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(now)

  /** `deletedCol IS NOT NULL AND deletedCol <= now - INTERVAL retention`.
    * `retention` is a SQL interval string like "12 MONTH". */
  def predicate(deletedCol: String, now: Instant, retention: String): Column = {
    val cutoffExpr =
      expr(s"TIMESTAMP '${utcLiteral(now)}' - INTERVAL $retention")
    col(deletedCol).isNotNull && col(deletedCol) <= cutoffExpr
  }

  /** Fixed-cutoff form used by deterministic tests/oracle queries. */
  def predicateAt(deletedCol: String, cutoff: String): Column =
    col(deletedCol).isNotNull && col(deletedCol) <= expr(s"TIMESTAMP '$cutoff'")

  /** Custom WHERE template support (reference `where=` config,
    * `${deleted_column} <= SUBDATE('{now}', …)`): `{now}` and
    * `{deleted_column}` are substituted before `expr(...)` parses it.
    * This is the engine's user-extensible predicate hook — an expression
    * string, not code injection into the planner. */
  def fromTemplate(template: String, now: Instant, deletedColumn: String = ""): Column =
    expr(template
      .replace("{now}", utcLiteral(now))
      .replace("{deleted_column}", deletedColumn))
}

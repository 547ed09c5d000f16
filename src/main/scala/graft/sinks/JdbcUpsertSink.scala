package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException, Timestamp}

import graft.Tables.TableSpec

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The archive-DB destination — SURVEY.md W2/W3/W4/X1/X2 re-expressed for
  * Spark's execution model.
  *
  * Reference behavior being preserved
  * (/root/reference/osarchiver/destination/db/db.py:327-414,
  * /root/reference/osarchiver/common/db.py:305-391):
  *  - idempotent keyed writes (`INSERT … ON DUPLICATE KEY UPDATE pk = pk`):
  *    re-archiving rows already present must be a no-op, which also makes
  *    Spark task retries exactly-once in effect;
  *  - batched commits (`bulk_insert`, executemany) — here JDBC addBatch /
  *    executeBatch per `batchSize` rows inside `foreachPartition`;
  *  - DDL bootstrap: archive table created from the source schema on first
  *    write; subsequent writes verify structural equality (drift guard);
  *  - bounded retry with backoff for transient errors; integrity errors
  *    (duplicate key) are handled by the idempotence strategy instead.
  *
  * Scale notes: one connection per partition (X2's cursor cache becomes
  * connection-per-task), writes stream through executors — the driver never
  * sees a row. Works against any JDBC store; the duplicate-key SQLSTATE and
  * upsert statement come from the [[JdbcDialect]].
  */
final case class JdbcSinkConfig(
    url: String,
    driver: String = "",
    batchSize: Int = 1000,       // reference bulk_insert default (common/db.py:41)
    maxRetries: Int = 5,         // reference max_retries (common/db.py:40)
    retryDelayMs: Long = 2000,   // reference retry_time_limit (common/db.py:42)
    sessionInitSql: Seq[String] = Nil) // e.g. SET FOREIGN_KEY_CHECKS=0 (D4)

/** Engine-specific SQL shapes and error classification. */
trait JdbcDialect extends Serializable {
  /** Identifier quoting — identity by default (Derby folds unquoted
    * names to uppercase and the e2e suite relies on that); MySQL
    * backtick-quotes, matching the reference's column rendering
    * (`destination/db/db.py:393` builds backticked column lists). */
  def quoteId(id: String): String = id
  /** Plain parameterized INSERT. */
  def insertSql(table: String, cols: Seq[String]): String =
    s"INSERT INTO $table (${cols.map(quoteId).mkString(", ")})" +
      s" VALUES (${cols.map(_ => "?").mkString(", ")})"
  /** Native upsert statement, if the engine has one (used when non-empty). */
  def upsertSql(table: String, cols: Seq[String], pk: Seq[String]): Option[String] = None
  /** Duplicate-key violation? (fallback idempotence path) */
  def isDuplicateKey(e: SQLException): Boolean = e.getSQLState == "23505"
  /** FK/integrity violation? (delete dichotomy trigger) */
  def isIntegrityViolation(e: SQLException): Boolean = e.getSQLState == "23503"
  /** Deterministic errors — never retried. */
  def isDeterministic(e: SQLException): Boolean =
    isDuplicateKey(e) || isIntegrityViolation(e)
  /** Connection lost / unusable — retry must re-establish the connection
    * first (X1; the reference closes and reopens on MySQL 2003,
    * common/db.py:377-381). SQLSTATE class 08 = connection exception. */
  def isConnectionLoss(e: SQLException): Boolean =
    Option(e.getSQLState).exists(_.startsWith("08"))
  def columnType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "VARCHAR(4000)"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(s"no JDBC type for $other")
  }
}

/** MySQL/MariaDB — the reference's native upsert. MySQL maps both
  * duplicate-key and FK violations to SQLSTATE 23000, so classification
  * uses the vendor error codes (1062 dup; 1451/1452 FK — the same codes
  * the reference special-cases, common/db.py:330-340). */
object MySqlDialect extends JdbcDialect {
  /** Backtick-quoted with embedded backticks doubled — the reference's
    * identifier escaping (destination/db/db.py:393, same convention as
    * the W7 SQL-dump sink), so reserved-word or oddly-named columns
    * survive the round trip. */
  override def quoteId(id: String): String =
    "`" + id.replace("`", "``") + "`"
  /** The reference's idempotent no-op upsert
    * (destination/db/db.py:394-400): `INSERT … ON DUPLICATE KEY UPDATE
    * pk = pk` — a duplicate key updates the PK to itself, turning the
    * re-archive of an already-archived row into a no-op instead of an
    * error. Golden-string-pinned in JdbcSinkSpec (no live MySQL in the
    * test environment; the Derby e2e exercises the ANSI branch). */
  override def upsertSql(table: String, cols: Seq[String], pk: Seq[String]): Option[String] =
    Some(insertSql(table, cols) +
      s" ON DUPLICATE KEY UPDATE ${quoteId(pk.head)} = ${quoteId(pk.head)}")
  override def isDuplicateKey(e: SQLException): Boolean = e.getErrorCode == 1062
  override def isIntegrityViolation(e: SQLException): Boolean =
    e.getErrorCode == 1451 || e.getErrorCode == 1452
  /** 2003 can't-connect, 2006 server-gone, 2013 lost-during-query. */
  override def isConnectionLoss(e: SQLException): Boolean =
    super.isConnectionLoss(e) ||
      e.getErrorCode == 2003 || e.getErrorCode == 2006 || e.getErrorCode == 2013
}

/** ANSI-ish engines without upsert (Derby etc.): INSERT + ignore-dup-key. */
object AnsiDialect extends JdbcDialect

object Jdbc {
  /** X1: bounded retry with fixed backoff; deterministic errors (duplicate
    * key, integrity violation — dialect-classified) are never retried.
    * Connection-loss errors (dialect-classified) invoke `onConnectionLoss`
    * before the next attempt so callers can re-establish a dead connection
    * instead of deterministically failing every retry on it. */
  def withRetry[A](
      cfg: JdbcSinkConfig, noRetry: SQLException => Boolean,
      isConnectionLoss: SQLException => Boolean = _ => false,
      onConnectionLoss: () => Unit = () => ())(f: => A): A = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: SQLException if noRetry(e) => throw e
        case e: SQLException if attempt < cfg.maxRetries =>
          attempt += 1
          Thread.sleep(cfg.retryDelayMs)
          // a failed reconnect must not escape the loop — the next attempt
          // will hit the dead connection, classify again, and re-try the
          // reconnect until the retry budget is spent
          if (isConnectionLoss(e)) {
            try onConnectionLoss() catch { case _: SQLException => () }
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** A reconnectable connection slot for the retry loop: `reconnect()`
    * swaps in a fresh connection (old one closed best-effort); callers must
    * re-derive prepared statements after a reconnect. */
  final class ConnectionHolder(cfg: JdbcSinkConfig) extends AutoCloseable {
    private var conn: Connection = Jdbc.connect(cfg)
    def get: Connection = conn
    def reconnect(): Unit = { Jdbc.close(conn); conn = Jdbc.connect(cfg) }
    override def close(): Unit = Jdbc.close(conn)
  }

  def connect(cfg: JdbcSinkConfig): Connection = {
    if (cfg.driver.nonEmpty) Class.forName(cfg.driver)
    val c = DriverManager.getConnection(cfg.url)
    c.setAutoCommit(false)
    cfg.sessionInitSql.foreach { sql =>
      val st = c.createStatement(); try st.execute(sql) finally st.close()
    }
    c
  }

  /** Rollback-then-close: clears any open transaction (the reference's
    * rollback-in-finally, which also caps server undo logs —
    * common/db.py:386-390). */
  def close(c: Connection): Unit = {
    try c.rollback() catch { case _: SQLException => () }
    try c.close() catch { case _: SQLException => () }
  }

  def bind(ps: PreparedStatement, i: Int, dt: DataType, v: Any): Unit =
    if (v == null) ps.setObject(i, null)
    else dt match {
      case LongType => ps.setLong(i, v.asInstanceOf[Long])
      case IntegerType => ps.setInt(i, v.asInstanceOf[Int])
      case DoubleType => ps.setDouble(i, v.asInstanceOf[Double])
      case FloatType => ps.setFloat(i, v.asInstanceOf[Float])
      case BooleanType => ps.setBoolean(i, v.asInstanceOf[Boolean])
      case StringType => ps.setString(i, v.toString)
      case TimestampType | TimestampNTZType => v match {
        case t: Timestamp => ps.setTimestamp(i, t)
        case ldt: java.time.LocalDateTime => ps.setTimestamp(i, Timestamp.valueOf(ldt))
        case inst: java.time.Instant => ps.setTimestamp(i, Timestamp.from(inst))
        case other => ps.setObject(i, other)
      }
      case DateType => ps.setDate(i, v.asInstanceOf[java.sql.Date])
      case d: DecimalType => ps.setBigDecimal(i, v.asInstanceOf[java.math.BigDecimal])
      case BinaryType => ps.setBytes(i, v.asInstanceOf[Array[Byte]])
      case other => ps.setObject(i, v)
    }
}

/** Coarse type families for cross-engine schema comparison. */
object JdbcTypeFamily {
  import java.sql.{Types => T}
  def ofSqlType(t: Int): String = t match {
    case T.TINYINT | T.SMALLINT | T.INTEGER | T.BIGINT | T.BIT | T.BOOLEAN => "integral"
    case T.FLOAT | T.REAL | T.DOUBLE | T.DECIMAL | T.NUMERIC => "fractional"
    case T.CHAR | T.VARCHAR | T.LONGVARCHAR | T.NCHAR | T.NVARCHAR |
         T.LONGNVARCHAR | T.CLOB => "text"
    case T.TIMESTAMP | T.TIMESTAMP_WITH_TIMEZONE => "timestamp"
    case T.DATE => "date"
    case T.BINARY | T.VARBINARY | T.LONGVARBINARY | T.BLOB => "binary"
    case _ => "other"
  }
  def ofDataType(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType | BooleanType => "integral"
    case DoubleType | FloatType | _: DecimalType => "fractional"
    case StringType => "text"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType => "date"
    case BinaryType => "binary"
    case _ => "other"
  }
}

final class JdbcUpsertSink(
    cfg: JdbcSinkConfig,
    dialect: JdbcDialect = AnsiDialect) extends Sink {

  override def name: String = s"jdbc:${cfg.url}"

  /** W4 — DDL bootstrap + drift guard: create the archive table from the
    * source StructType on first write; on re-runs compare the live column
    * (name, type) list structurally. */
  private def ensureTable(
      conn: Connection, table: String, schema: StructType, pk: Seq[String]): Unit = {
    val meta = conn.getMetaData
    // identifier folding is engine-specific (Derby uppercases, MySQL on
    // Linux keeps case) — probe every folding until one matches
    // scope the probe to the CONNECTED catalog/schema — a null catalog can
    // match a same-named table in another database on some drivers
    val (cat, sch) = (
      try conn.getCatalog catch { case _: SQLException => null },
      try conn.getSchema catch { case _: SQLException => null })
    // getColumns treats the table name as a LIKE pattern: escape _ and %
    // with the driver's search-string escape so `a_b` can't match a
    // different live table and trigger a false drift comparison
    val esc = try meta.getSearchStringEscape catch { case _: SQLException => "\\" }
    def escapePattern(name: String): String =
      name.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
    val existing = Seq(table, table.toUpperCase, table.toLowerCase).distinct
      .map { probe =>
        val rs = meta.getColumns(cat, sch, escapePattern(probe), null)
        try Iterator.continually(rs).takeWhile(_.next())
          .map(r => (r.getString("COLUMN_NAME").toLowerCase,
            r.getInt("DATA_TYPE"))).toSeq
        finally rs.close()
      }.find(_.nonEmpty).getOrElse(Seq.empty)
    if (existing.isEmpty) {
      // PK constraint is what makes the upsert/ignore-dup idempotence work
      val pkSet = pk.toSet
      val ddl = schema.fields.map { f =>
        val notNull = if (pkSet.contains(f.name)) " NOT NULL" else ""
        s"${dialect.quoteId(f.name)} ${dialect.columnType(f.dataType)}$notNull"
      }.mkString(", ") +
        s", PRIMARY KEY (${pk.map(dialect.quoteId).mkString(", ")})"
      val st = conn.createStatement()
      try st.execute(s"CREATE TABLE $table ($ddl)") finally st.close()
      conn.commit()
    } else {
      // drift guard: column names AND type families must match (W4's
      // structural comparison; exact java.sql.Types vary by engine, so
      // compare at family granularity — numeric vs text drift is caught,
      // engine-internal width aliases are not false positives)
      val incoming = schema.fields
        .map(f => (f.name.toLowerCase, JdbcTypeFamily.ofDataType(f.dataType))).toSeq
      val live = existing.map { case (n, t) => (n, JdbcTypeFamily.ofSqlType(t)) }
      if (live.sortBy(_._1) != incoming.sortBy(_._1))
        throw new SchemaDriftException(
          s"jdbc archive table $table columns $live != source $incoming")
    }
  }

  override def write(db: String, spec: TableSpec, df: DataFrame, dryRun: Boolean): Unit = {
    if (dryRun) { df.count(); return }
    val schema = df.schema
    val table = spec.name
    val cols = schema.fields.map(_.name).toSeq
    val sql = dialect.upsertSql(table, cols, spec.pk)
      .getOrElse(dialect.insertSql(table, cols))
    val nativeUpsert = dialect.upsertSql(table, cols, spec.pk).isDefined
    val localCfg = cfg
    val localDialect = dialect
    // bootstrap once from the driver (prerequisites memoization, W4)
    val boot = Jdbc.connect(localCfg)
    try ensureTable(boot, table, schema, spec.pk) finally Jdbc.close(boot)

    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val holder = new Jdbc.ConnectionHolder(localCfg)
        // the prepared statement is tied to the live connection: a
        // reconnect invalidates it, so it is lazily re-prepared (X1)
        var ps: PreparedStatement = null
        def prepared(): PreparedStatement = {
          if (ps == null) ps = holder.get.prepareStatement(sql)
          ps
        }
        def onLoss(): Unit = {
          // best-effort close before dropping the reference: not every
          // driver cascade-closes statements when the connection dies
          if (ps != null) { try ps.close() catch { case _: SQLException => () } }
          ps = null; holder.reconnect()
        }
        try {
          var batch = Vector.empty[Row]
          def flush(): Unit = if (batch.nonEmpty) {
            Jdbc.withRetry(localCfg, localDialect.isDeterministic,
                localDialect.isConnectionLoss, () => onLoss()) {
              val conn = holder.get
              val p = prepared()
              // a retried attempt must start from a clean slate: clear any
              // half-added statement batch and roll back the aborted txn
              p.clearBatch()
              try conn.rollback() catch { case _: SQLException => () }
              try {
                batch.foreach { row =>
                  cols.indices.foreach(i =>
                    Jdbc.bind(p, i + 1, schema(i).dataType, row.get(i)))
                  p.addBatch()
                }
                p.executeBatch()
                conn.commit()
              } catch {
                case e: SQLException if !nativeUpsert =>
                  // W2 fallback idempotence: replay the batch row-by-row,
                  // skipping duplicate-key rows (the pk = pk no-op)
                  conn.rollback()
                  p.clearBatch()
                  batch.foreach { row =>
                    cols.indices.foreach(i =>
                      Jdbc.bind(p, i + 1, schema(i).dataType, row.get(i)))
                    try p.executeUpdate()
                    catch {
                      case d: SQLException if localDialect.isDuplicateKey(d) => ()
                    }
                  }
                  conn.commit()
              }
            }
            batch = Vector.empty
          }
          rows.foreach { row =>
            batch :+= row
            if (batch.size >= localCfg.batchSize) flush()
          }
          flush() // forced tail flush (db.py:407-413)
        } finally holder.close()
      }
    }
  }
}

/** D3 remediation-SQL generation: parse an FK-violation error message and
  * produce (a) the diagnostic SELECT that shows the offending child rows
  * and (b) a candidate `UPDATE … INNER JOIN` that soft-deletes them in
  * lockstep with the parent — the same operator strings the reference
  * prints for manual remediation
  * (/root/reference/osarchiver/common/db.py:478-547).
  */
object IntegrityRemediation {

  final case class FkViolation(
      db: String, table: String, fk: String, refTable: String, refColumn: String)

  // MySQL/InnoDB FK-violation message shape, e.g.:
  //   ... a foreign key constraint fails (`db`.`child`, CONSTRAINT `c_fk`
  //   FOREIGN KEY (`parent_id`) REFERENCES `parent` (`id`))
  private val FkFail =
    ("""^.+fails \(`(.+)`\.`(.+)`, CONSTRAINT `.+` FOREIGN KEY """ +
      """\(`(.+)`\) REFERENCES `(.+)` \(`(.+)`\)\)$""").r

  def parse(error: String): Option[FkViolation] =
    Option(error).map(_.replace('\n', ' ')).collect {
      case FkFail(db, table, fk, refTable, refColumn) =>
        FkViolation(db, table, fk, refTable, refColumn)
    }

  /** Numeric key values are rendered bare, everything else quoted — the
    * reference's isdigit() rule — with embedded backslashes and quotes
    * escaped (MySQL-style, matching the W7 SqlDump sink) so a string PK
    * containing a quote can't break or redirect the generated statement. */
  private def render(v: Any): String = {
    val s = String.valueOf(v)
    if (s.nonEmpty && s.forall(_.isDigit)) s
    else "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  }

  /** SELECT retrieving the child rows that blocked the parent delete. */
  def diagnosticSelect(error: String, refValue: Any): Option[String] =
    parse(error).map { f =>
      s"SELECT * FROM `${f.db}`.`${f.table}` WHERE `${f.fk}` = ${render(refValue)}"
    }

  /** Candidate fix: mark the still-live children as deleted in lockstep
    * with their (already soft-deleted) parent. */
  def potentialFix(
      error: String, refValue: Any, deletedColumn: String): Option[String] =
    parse(error).map { f =>
      s"UPDATE `${f.db}`.`${f.table}` INNER JOIN `${f.db}`.`${f.refTable}` ON " +
        s"`${f.db}`.`${f.refTable}`.`${f.refColumn}` = `${f.db}`.`${f.table}`.`${f.fk}` " +
        s"SET `${f.db}`.`${f.table}`.`$deletedColumn` = " +
        s"`${f.db}`.`${f.refTable}`.`$deletedColumn` " +
        s"WHERE ${f.fk} = ${render(refValue)} " +
        s"AND `${f.db}`.`${f.table}`.`$deletedColumn` IS NULL"
    }
}

/** Per-run delete-back outcome: rows deleted, FK-blocked keys left in
  * place, and the generated remediation SQL for each blocked key (empty
  * when the engine's error message is not FK-parseable). */
final case class DeleteBackResult(
    deleted: Long, poisonKeys: Seq[Any], remediation: Seq[String])

/** D1/D3 — keyed chunked delete-back against a JDBC live store.
  *
  * `DELETE FROM t WHERE pk IN (…)` in chunks of `deleteLimit` with a
  * throttle sleep between chunks (protecting a live OLTP store is the
  * point — the reference's delete_loop_delay, common/db.py:43). On an
  * integrity violation the chunk is split in half recursively (the
  * reference's numpy.array_split dichotomy, source/db.py:376-426) until the
  * poison rows are isolated; those are left undeleted and reported along
  * with generated remediation SQL (diagnostic SELECT + candidate UPDATE).
  */
object JdbcDeleteBack {

  def delete(
      keys: DataFrame, pkCol: String, table: String,
      cfg: JdbcSinkConfig, dialect: JdbcDialect = AnsiDialect,
      deleteLimit: Int = 500, loopDelayMs: Long = 0,
      deletedColumn: String = "deleted_at"): DeleteBackResult = {
    val spark = keys.sparkSession
    val deleted = spark.sparkContext.longAccumulator("graft.deleted")
    val poison = spark.sparkContext.collectionAccumulator[Any]("graft.poison")
    val remedy = spark.sparkContext.collectionAccumulator[String]("graft.remedy")
    val localCfg = cfg
    keys.select(pkCol).foreachPartition { (rows: Iterator[Row]) =>
      val ids = rows.map(_.get(0)).toVector
      if (ids.nonEmpty) {
        val holder = new Jdbc.ConnectionHolder(localCfg)
        try {
          def deleteChunk(chunk: Vector[Any]): Unit = if (chunk.nonEmpty) {
            val sql = s"DELETE FROM $table WHERE " +
              s"${dialect.quoteId(pkCol)} IN (" +
              chunk.map(_ => "?").mkString(", ") + ")"
            try {
              val n = Jdbc.withRetry(localCfg, dialect.isIntegrityViolation,
                  dialect.isConnectionLoss, () => holder.reconnect()) {
                val conn = holder.get
                // clean slate per attempt: an aborted txn poisons every
                // subsequent statement on engines like PostgreSQL (25P02),
                // which would make the retries deterministically fail
                try conn.rollback() catch { case _: SQLException => () }
                val ps = conn.prepareStatement(sql)
                try {
                  chunk.zipWithIndex.foreach { case (v, i) => ps.setObject(i + 1, v) }
                  val count = ps.executeUpdate()
                  conn.commit()
                  count
                } finally ps.close()
              }
              deleted.add(n)
            } catch {
              case e: SQLException if dialect.isIntegrityViolation(e) =>
                try holder.get.rollback() catch { case _: SQLException => () }
                if (chunk.size == 1) { // isolated poison row
                  poison.add(chunk.head)
                  val msg = Option(e.getMessage).getOrElse("")
                  IntegrityRemediation.diagnosticSelect(msg, chunk.head)
                    .foreach(remedy.add)
                  IntegrityRemediation.potentialFix(msg, chunk.head, deletedColumn)
                    .foreach(remedy.add)
                } else { // dichotomy: split and retry halves
                  val (l, r) = chunk.splitAt(chunk.size / 2)
                  deleteChunk(l); deleteChunk(r)
                }
            }
          }
          ids.grouped(deleteLimit).foreach { chunk =>
            deleteChunk(chunk)
            if (loopDelayMs > 0) Thread.sleep(loopDelayMs)
          }
        } finally holder.close()
      }
    }
    import scala.jdk.CollectionConverters._
    DeleteBackResult(deleted.value, poison.value.asScala.toSeq,
      remedy.value.asScala.toSeq)
  }
}

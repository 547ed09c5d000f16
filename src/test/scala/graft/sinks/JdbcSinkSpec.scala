package graft.sinks

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The JDBC archive path end-to-end against embedded Derby (same JVM as the
  * local[4] executors, so foreachPartition tasks hit the same store). */
class JdbcSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def cfg(dbName: String, batch: Int = 1000) = JdbcSinkConfig(
    url = s"jdbc:derby:memory:$dbName;create=true",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    batchSize = batch, maxRetries = 1, retryDelayMs = 10)

  private def query[A](c: JdbcSinkConfig, sql: String)(f: java.sql.ResultSet => A): A = {
    val conn = Jdbc.connect(c)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      rs.next(); f(rs)
    } finally Jdbc.close(conn)
  }

  test("upsert sink bootstraps DDL, batches, and re-runs are idempotent") {
    val c = cfg("upsert1", batch = 7) // deliberately tiny batch
    val sink = new JdbcUpsertSink(c)
    val spec = Tables.byName("orders")
    val rows = Tables.load(spark, TestSpark.sf0001, "orders")
      .filter(col("o_orderkey") < 100)
    sink.write("db", spec, rows, dryRun = false)
    assert(query(c, "SELECT count(*) FROM orders")(_.getLong(1)) === rows.count())
    // second write of the same rows: duplicate keys skipped, count unchanged
    sink.write("db", spec, rows, dryRun = false)
    assert(query(c, "SELECT count(*) FROM orders")(_.getLong(1)) === rows.count())
    // overlapping superset: only new keys land
    val more = Tables.load(spark, TestSpark.sf0001, "orders")
      .filter(col("o_orderkey") < 150)
    sink.write("db", spec, more, dryRun = false)
    assert(query(c, "SELECT count(*) FROM orders")(_.getLong(1)) === more.count())
  }

  test("schema drift against an existing jdbc table is rejected") {
    val c = cfg("drift1")
    val sink = new JdbcUpsertSink(c)
    val spec = Tables.byName("region")
    val region = Tables.load(spark, TestSpark.sf0001, "region")
    sink.write("db", spec, region, dryRun = false)
    assertThrows[SchemaDriftException] {
      sink.write("db", spec, region.withColumnRenamed("r_name", "r_label"),
        dryRun = false)
    }
    // type drift with unchanged names must also be rejected
    assertThrows[SchemaDriftException] {
      sink.write("db", spec,
        region.withColumn("r_regionkey", col("r_regionkey").cast("string")),
        dryRun = false)
    }
  }

  test("keyed chunked delete-back deletes everything in limit-sized chunks") {
    val c = cfg("del1")
    val sink = new JdbcUpsertSink(c)
    val spec = Tables.byName("orders")
    val rows = Tables.load(spark, TestSpark.sf0001, "orders")
      .filter(col("o_orderkey") < 200)
    sink.write("db", spec, rows, dryRun = false)
    val keys = rows.select(col("o_orderkey"))
    val DeleteBackResult(deleted, poison, _) = JdbcDeleteBack.delete(
      keys, "o_orderkey", "orders", c, deleteLimit = 33)
    assert(deleted === rows.count())
    assert(poison.isEmpty)
    assert(query(c, "SELECT count(*) FROM orders")(_.getLong(1)) === 0L)
  }

  test("retry wrapper retries transient errors, never integrity errors (X1)") {
    val c = cfg("retry1").copy(maxRetries = 3, retryDelayMs = 1)
    var attempts = 0
    val out = Jdbc.withRetry(c, AnsiDialect.isDeterministic) {
      attempts += 1
      if (attempts < 3) throw new java.sql.SQLException("transient", "08S01")
      "ok"
    }
    assert(out === "ok" && attempts === 3)
    var integrityAttempts = 0
    assertThrows[java.sql.SQLException] {
      Jdbc.withRetry(c, AnsiDialect.isDeterministic) {
        integrityAttempts += 1
        throw new java.sql.SQLException("dup", "23505")
      }
    }
    assert(integrityAttempts === 1, "integrity errors are deterministic; no retry")
    // MySQL folds both dup-key and FK violations into SQLSTATE 23000;
    // classification must use vendor codes
    assert(MySqlDialect.isDuplicateKey(
      new java.sql.SQLException("dup", "23000", 1062)))
    assert(MySqlDialect.isIntegrityViolation(
      new java.sql.SQLException("fk", "23000", 1451)))
    assert(!MySqlDialect.isDuplicateKey(
      new java.sql.SQLException("fk", "23000", 1451)))
  }

  test("MySQL dialect generates the reference's upsert SQL (golden)") {
    // reference destination/db/db.py:392-400: backticked columns,
    // `INSERT INTO <table> (…) VALUES (…) ON DUPLICATE KEY UPDATE
    // pk = pk` — the self-assignment makes re-archiving a no-op. No live
    // MySQL exists here, so the generated text is pinned exactly.
    assert(MySqlDialect.upsertSql("archive.orders",
        Seq("o_orderkey", "o_custkey", "o_comment"),
        Seq("o_orderkey")).get ===
      "INSERT INTO archive.orders (`o_orderkey`, `o_custkey`, " +
        "`o_comment`) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE `o_orderkey` = `o_orderkey`")
    // embedded backticks double (MySQL identifier escaping)
    assert(MySqlDialect.insertSql("t", Seq("weird`col")) ===
      "INSERT INTO t (`weird``col`) VALUES (?)")
    // the ANSI dialect stays unquoted: Derby folds unquoted identifiers
    // to uppercase and the e2e suite depends on that
    assert(AnsiDialect.insertSql("t", Seq("a", "b")) ===
      "INSERT INTO t (a, b) VALUES (?, ?)")
    assert(AnsiDialect.upsertSql("t", Seq("a"), Seq("a")).isEmpty)
  }

  test("session init SQL runs on every connection (D4 hook)") {
    val c = cfg("init1").copy(sessionInitSql = Seq("SET SCHEMA APP"))
    val conn = Jdbc.connect(c)
    try {
      val rs = conn.createStatement().executeQuery("VALUES CURRENT SCHEMA")
      rs.next()
      assert(rs.getString(1) === "APP")
    } finally Jdbc.close(conn)
  }

  test("dichotomy isolates FK-referenced rows as poison, deletes the rest") {
    val c = cfg("dich1")
    val conn = Jdbc.connect(c)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE parent (id BIGINT PRIMARY KEY)")
      st.execute("CREATE TABLE child (id BIGINT, pid BIGINT REFERENCES parent(id))")
      (1 to 50).foreach(i => st.execute(s"INSERT INTO parent VALUES ($i)"))
      // children reference parents 7, 23, 41 — those deletes must fail
      Seq(7, 23, 41).zipWithIndex.foreach { case (p, i) =>
        st.execute(s"INSERT INTO child VALUES ($i, $p)") }
      conn.commit()
    } finally Jdbc.close(conn)
    import spark.implicits._
    val keys = (1L to 50L).toDF("id")
    val DeleteBackResult(deleted, poison, remediation) = JdbcDeleteBack.delete(
      keys, "id", "parent", c, deleteLimit = 16)
    assert(poison.map(_.toString.toLong).sorted === Seq(7L, 23L, 41L))
    assert(deleted === 47)
    assert(query(c, "SELECT count(*) FROM parent")(_.getLong(1)) === 3L)
    // Derby's FK message is not MySQL-shaped, so no remediation SQL here —
    // the parseable-message path is covered by the dedicated D3 test
    assert(remediation.isEmpty)
  }

  test("FK poison rows generate reference-equivalent remediation SQL (D3)") {
    val msg = "Cannot delete or update a parent row: a foreign key " +
      "constraint fails (`nova`.`instance_metadata`, CONSTRAINT " +
      "`instance_metadata_ibfk_1` FOREIGN KEY (`instance_uuid`) " +
      "REFERENCES `instances` (`uuid`))"
    assert(IntegrityRemediation.diagnosticSelect(msg, "abc-123") === Some(
      "SELECT * FROM `nova`.`instance_metadata` WHERE `instance_uuid` = 'abc-123'"))
    // numeric key values render bare (the reference's isdigit rule)
    assert(IntegrityRemediation.potentialFix(msg, 42, "deleted_at") === Some(
      "UPDATE `nova`.`instance_metadata` INNER JOIN `nova`.`instances` ON " +
        "`nova`.`instances`.`uuid` = `nova`.`instance_metadata`.`instance_uuid` " +
        "SET `nova`.`instance_metadata`.`deleted_at` = " +
        "`nova`.`instances`.`deleted_at` " +
        "WHERE instance_uuid = 42 " +
        "AND `nova`.`instance_metadata`.`deleted_at` IS NULL"))
    assert(IntegrityRemediation.parse("some unrelated error") === None)
    // string key values escape embedded quotes/backslashes (MySQL-style)
    assert(IntegrityRemediation.diagnosticSelect(msg, "O'Brien\\x") === Some(
      "SELECT * FROM `nova`.`instance_metadata` WHERE `instance_uuid` = " +
        "'O\\'Brien\\\\x'"))
  }

  test("retry re-establishes a dead connection mid-write (X1 reconnect)") {
    val c = cfg("reconn1").copy(maxRetries = 2, retryDelayMs = 1)
    val holder = new Jdbc.ConnectionHolder(c)
    try {
      holder.get.close() // simulate the server killing the connection
      var reconnects = 0
      val out = Jdbc.withRetry(c, AnsiDialect.isDeterministic,
          AnsiDialect.isConnectionLoss,
          () => { reconnects += 1; holder.reconnect() }) {
        val st = holder.get.createStatement()
        try { val rs = st.executeQuery("VALUES 1"); rs.next(); rs.getInt(1) }
        finally st.close()
      }
      assert(out === 1)
      assert(reconnects === 1, "exactly one reconnect re-established the session")
    } finally holder.close()
    // connection-loss classification: SQLSTATE class 08 + MySQL vendor codes
    assert(AnsiDialect.isConnectionLoss(new java.sql.SQLException("gone", "08003")))
    assert(MySqlDialect.isConnectionLoss(new java.sql.SQLException("gone", "HY000", 2013)))
    assert(!AnsiDialect.isConnectionLoss(new java.sql.SQLException("dup", "23505")))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front-end surface: every fixture table registered as a temp view
  * and queried through spark.sql, equivalent to the DataFrame API — a user
  * of the engine can stay in pure SQL (including the custom functions). */
class SqlInterfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def registerViews(): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, TestSpark.sf0001, t).createOrReplaceTempView(t)
    }

  test("TPC-H-style SQL over registered views matches the DataFrame plan") {
    registerViews()
    val sql = spark.sql(
      """SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
        |count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
    val api = SparkEntry.queries("q2_join_agg")(spark, TestSpark.sf0001)
    assert(sql.exceptAll(api).count() === 0)
    assert(api.exceptAll(sql).count() === 0)
  }

  test("custom expressions compose with SQL over views") {
    registerViews()
    graft.functions.GraftExtensions.register(spark)
    val top = spark.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |          CAST(b.embedding AS ARRAY<DOUBLE>)) AS dot
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 5 AND b.vec_id < 5
        |ORDER BY dot DESC LIMIT 3""".stripMargin)
    assert(top.count() === 3)
    assert(!top.head.isNullAt(2))
  }
}

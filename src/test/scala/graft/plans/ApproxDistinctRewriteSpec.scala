package graft.plans

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxDistinctRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val flag = "graft.approxCountDistinct.enabled"

  private def withFlag[A](on: Boolean)(f: => A): A = {
    graft.functions.GraftExtensions.register(spark)
    spark.conf.set(flag, on.toString)
    try f finally spark.conf.unset(flag)
  }

  private def df = (1L to 10000L).map(i => (i % 257, i % 7))
    .toDF("v", "g")

  test("off by default: exact count(distinct) plan and exact result") {
    withFlag(on = false) {
      val q = df.agg(countDistinct(col("v")).as("d"))
      assert(q.queryExecution.optimizedPlan.toString.contains("count(distinct"))
      assert(q.as[Long].head() === 257L)
    }
  }

  test("flag on: rewrite to HLL++, approximate answer within rsd") {
    withFlag(on = true) {
      val q = df.agg(countDistinct(col("v")).as("d"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct"),
        s"expected the HLL++ rewrite:\n$opt")
      assert(!opt.contains("count(distinct"))
      val got = q.as[Long].head()
      assert(math.abs(got - 257L) <= 257 * 0.1,
        s"approximation drifted: $got vs 257")
      // grouped form rewrites too, and output column names are preserved
      val g = df.groupBy("g").agg(countDistinct(col("v")).as("d"))
      assert(g.columns.toSeq === Seq("g", "d"))
      assert(g.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
    }
  }

  test("filtered and multi-argument distinct counts are left exact") {
    withFlag(on = true) {
      // FILTER clause: conservative subset only — no approx rewrite (the
      // core RewriteDistinctAggregates expansion may run first; what
      // matters is that no HLL++ appears and the answer stays exact)
      df.createOrReplaceTempView("adr_t")
      val f = spark.sql(
        "SELECT count(DISTINCT v) FILTER (WHERE g = 1) FROM adr_t")
      assert(!f.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(f.as[Long].head() ===
        df.filter(col("g") === 1).select("v").distinct().count())
      // multi-argument distinct: no rewrite
      val m = df.agg(countDistinct(col("v"), col("g")))
      assert(!m.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(m.as[Long].head() === df.select("v", "g").distinct().count())
    }
  }
}

package graft.plans

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LevenshteinPrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val flag = "graft.levenshteinPrefilter.enabled"

  private def withFlag[A](on: Boolean)(f: => A): A = {
    graft.functions.GraftExtensions.register(spark)
    spark.conf.set(flag, on.toString)
    try f finally spark.conf.unset(flag)
  }

  // parquet-backed: a literal LocalRelation would be constant-folded by
  // ConvertToLocalRelation and there would be no Filter left to rewrite
  private lazy val path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
    Seq(
      ("kitten", "sitting"),   // lev 3, len diff 1
      ("abc", "abcdefghij"),   // lev 7, len diff 7
      ("same", "same"),        // lev 0
      ("a", "abcdefgh"))       // lev 7, len diff 7
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    dir
  }
  private def df = spark.read.parquet(path)

  test("on by default: the implied length bound is injected before the DP") {
    withFlag(on = true) {
      val q = df.filter(expr("levenshtein(a, b) <= 3"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("abs(") && opt.contains("length("),
        s"expected the length pre-filter conjunct:\n$opt")
      // semantics unchanged
      assert(q.select("a").as[String].collect().toSet === Set("kitten", "same"))
      // mirrored comparison form
      val m = df.filter(expr("3 >= levenshtein(a, b)"))
      assert(m.queryExecution.optimizedPlan.toString.contains("length("))
      assert(m.count() === 2)
    }
  }

  test("idempotent under the optimizer's fixed point: one bound, not many") {
    withFlag(on = true) {
      val opt = df.filter(expr("levenshtein(a, b) < 4"))
        .queryExecution.optimizedPlan.toString
      val bounds = "abs\\(\\(length\\(".r.findAllIn(opt).length
      assert(bounds === 1, s"bound must be injected exactly once:\n$opt")
    }
  }

  test("kill switch and the conservative subset") {
    withFlag(on = false) {
      val opt = df.filter(expr("levenshtein(a, b) <= 3"))
        .queryExecution.optimizedPlan.toString
      assert(!opt.contains("abs("), s"flag off must leave the filter alone:\n$opt")
    }
    withFlag(on = true) {
      // the three-argument threshold form already bounds its own DP
      val t = df.filter(expr("levenshtein(a, b, 3) <= 3"))
      assert(!t.queryExecution.optimizedPlan.toString.contains("abs("))
      // lower bounds are not strengthened (implication goes the other way)
      val g = df.filter(expr("levenshtein(a, b) >= 3"))
      assert(!g.queryExecution.optimizedPlan.toString.contains("abs("))
      assert(g.count() === 3)
    }
  }
}

package graft.plans

import graft.TestSpark
import graft.functions.{NumericFunctions, TextFunctions}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JaroWinklerPrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val flag = "graft.jaroWinklerPrefilter.enabled"

  private def withFlag[A](on: Boolean)(f: => A): A = {
    graft.functions.GraftExtensions.register(spark)
    spark.conf.set(flag, on.toString)
    try f finally spark.conf.unset(flag)
  }

  // parquet-backed so ConvertToLocalRelation cannot fold the Filter away
  private lazy val path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jw").toString
    Seq(
      ("martha", "marhta"),        // jw ~0.96, lengths equal
      ("abcde", "abcde"),          // jw 1.0
      ("ab", "abcdefghijklmnop"),  // len ratio 2/16 < 0.5: prefiltered
      ("x", "completely"))         // len ratio 1/10 < 0.5: prefiltered
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    dir
  }
  private def df = spark.read.parquet(path)

  test("raw, fround and integer-unit threshold forms all gain the " +
      "length-ratio bound; results unchanged") {
    withFlag(on = true) {
      // raw form
      val raw = df.filter(TextFunctions.jaroWinkler(col("a"), col("b")) >= 0.9)
      val optRaw = raw.queryExecution.optimizedPlan.toString
      assert(optRaw.contains("least(") && optRaw.contains("greatest("),
        s"expected the ratio pre-filter:\n$optRaw")
      assert(raw.select("a").as[String].collect().toSet ===
        Set("martha", "abcde"))
      // fround form (the er1/er2 shape)
      val fr = df.filter(NumericFunctions.fround(
        TextFunctions.jaroWinkler(col("a"), col("b")), 4) >= 0.9)
      assert(fr.queryExecution.optimizedPlan.toString.contains("least("))
      assert(fr.select("a").as[String].collect().toSet ===
        Set("martha", "abcde"))
      // integer-unit form (the jw_u >= 9000 shape)
      val iu = df.filter(floor(TextFunctions.jaroWinkler(col("a"), col("b"))
        * 10000.0).cast("long") >= 9000L)
      assert(iu.queryExecution.optimizedPlan.toString.contains("least("))
      assert(iu.select("a").as[String].collect().toSet ===
        Set("martha", "abcde"))
    }
  }

  test("prefilter is implied, never stronger: equal result sets across a " +
      "threshold sweep on the part fixture") {
    val part = spark.read.parquet(s"${TestSpark.sf0001}/part.parquet")
      .select(col("p_partkey"), col("p_name"), col("p_brand"))
    val tk = part.select(col("p_partkey").as("pk"), col("p_name").as("nm"),
      col("p_brand").as("bl"))
    def pairs(t: Double, on: Boolean) = withFlag(on) {
      tk.as("x").join(tk.as("y"),
          col("x.bl") === col("y.bl") && col("x.pk") < col("y.pk"))
        .filter(NumericFunctions.fround(TextFunctions.jaroWinkler(
          col("x.nm"), col("y.nm")), 4) >= t)
        .select(col("x.pk"), col("y.pk")).collect().toSet
    }
    for (t <- Seq(0.85, 0.9, 0.95)) {
      assert(pairs(t, on = true) === pairs(t, on = false),
        s"rule must not change results at t=$t")
    }
  }

  test("kill switch, sub-0.8 thresholds and lower-bound forms left alone; " +
      "idempotent injection") {
    withFlag(on = false) {
      val opt = df.filter(TextFunctions.jaroWinkler(col("a"), col("b"))
        >= 0.9).queryExecution.optimizedPlan.toString
      assert(!opt.contains("least("), s"flag off must be a no-op:\n$opt")
    }
    withFlag(on = true) {
      // t = 0.7: 5t - 4 < 0, the bound is vacuous and must not be added
      val low = df.filter(TextFunctions.jaroWinkler(col("a"), col("b"))
        >= 0.7).queryExecution.optimizedPlan.toString
      assert(!low.contains("least("))
      // upper bounds are not strengthened (implication is one-way)
      val ub = df.filter(TextFunctions.jaroWinkler(col("a"), col("b"))
        <= 0.9).queryExecution.optimizedPlan.toString
      assert(!ub.contains("least("))
      // exactly one bound after the optimizer's fixed point
      val opt = df.filter(TextFunctions.jaroWinkler(col("a"), col("b"))
        >= 0.9).queryExecution.optimizedPlan.toString
      assert("least\\(".r.findAllIn(opt).length === 1,
        s"bound injected exactly once:\n$opt")
    }
  }
}

package graft.functions

import graft.TestSpark
import graft.functions.expressions.JaroWinkler

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook values match the DuckDB/RapidFuzz convention") {
    // constants cross-checked against duckdb 1.0 jaro_winkler_similarity
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    assert(jw("aaaaaaaaaa", "aaaaaaaaab") === 0.96)
    assert(jw("appel", "applet") === 0.9144444444444445)
  }

  test("empty/no-match semantics: 0.0, like DuckDB (NOT 1.0 for two empties)") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "xyz") === 0.0)
    assert(jw("x", "y") === 0.0)
    assert(jw("ab", "ba") === 0.0, "window bound 0 at len 2: no matches")
  }

  test("prefix bonus applies only above the 0.7 jaro threshold") {
    // jaro = 0.4667 <= 0.7: shared 2-char prefix must NOT boost
    assert(jw("abxxxxxxxx", "abyyyyyyyy") === 0.4666666666666666)
    // jaro = 0.6 <= 0.7: shared 4-char prefix must NOT boost
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6)
    // above threshold the bonus caps at 4 prefix chars
    val base = jw("prefix_same".drop(0), "prefix_diff") // jaro > 0.7
    assert(base === 0.8545454545454545)
  }

  test("properties: symmetry, range, identity") {
    val gen = Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(gen, gen) { (a: String, b: String) =>
        val s = jw(a, b)
        s >= 0.0 && s <= 1.0 && s == jw(b, a) &&
          (a.isEmpty || jw(a, a) == 1.0)
      })
    assert(res.passed, res.status.toString)
  }

  test("codegen and interpreted paths agree; SQL registration works") {
    val df = Seq(("MARTHA", "MARHTA"), ("small ring", "small king"),
      ("", ""), ("blue bolt", "blue bolts")).toDF("a", "b")
    val viaColumn = df.select(
      TextFunctions.jaroWinkler(col("a"), col("b"))).as[Double].collect()
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM jw_pairs").as[Double].collect()
    assert(viaColumn.toSeq === viaSql.toSeq)
    assert(viaColumn(0) === 0.9611111111111111)
    // interpreted (no-codegen) path: direct eval
    assert(jw("small ring", "small king") === viaColumn(1))
  }
}

package graft.functions

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(dot === 32.0)
    val fp = spark.sql("SELECT graft_rolling_minhash('hello world hello', 8) AS h")
      .head().getLong(0)
    // same text -> same fingerprint; different text -> different
    val fp2 = spark.sql("SELECT graft_rolling_minhash('hello world hello', 8) AS h")
      .head().getLong(0)
    val other = spark.sql("SELECT graft_rolling_minhash('entirely different', 8) AS h")
      .head().getLong(0)
    assert(fp === fp2)
    assert(fp !== other)
    assert(fp >= 0 && fp < 1000000007L)
    val lang = spark.sql(
      "SELECT graft_langid(array('the', 'cat', 'of')) AS l").head().getString(0)
    assert(lang === "en")
    val nrm = spark.sql(
      "SELECT graft_normalize('  Hello \t WORLD ') AS n").head().getString(0)
    assert(nrm === "hello world")

    val und = spark.sql(
      "SELECT graft_langid(array('xyz')) AS l").head().getString(0)
    assert(und === "und")
  }

  test("graft_word_shingles is SQL-callable in distinct and multiset forms") {
    GraftExtensions.register(spark)
    def arr(sql: String): Seq[String] = {
      import spark.implicits._
      spark.sql(s"SELECT $sql AS a").as[Seq[String]].head()
    }
    assert(arr("graft_word_shingles(array('a','b','a','b'), 2)") ===
      Seq("a b", "b a"))
    assert(arr("graft_word_shingles(array('a','b','a','b'), 2, false)") ===
      Seq("a b", "b a", "a b"))
  }

  test("graft_dot matches aggregate(zip_with(...)) on degenerate input too") {
    GraftExtensions.register(spark)
    // length mismatch and null elements yield NULL — identical to the HOF
    // form (zip_with pads with nulls, aggregate propagates them), never a
    // silently-truncated dot product
    def one(sql: String): Any = spark.sql(s"SELECT $sql AS d").head().get(0)
    assert(one("graft_dot(array(1.0d, 2.0d), array(3.0d))") === null)
    assert(one("graft_dot(array(1.0d, cast(null as double)), array(3.0d, 4.0d))") === null)
    assert(one(
      "aggregate(zip_with(array(1.0d, 2.0d), array(3.0d), (x, y) -> x*y), 0d, (a, v) -> a + v)")
      === null)
    assert(one("graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))") === 11.0)
  }

  test("sql form matches the column API form") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.load(spark, TestSpark.sf0001, "documents").limit(20)
    val viaSql = docs.selectExpr("doc_id",
      "graft_rolling_minhash(regexp_replace(lower(text), '[^a-z0-9]+', ' '), 8) AS h")
    val viaApi = docs.select(col("doc_id"),
      TextFunctions.rollingFingerprint(col("text"), 8).as("h"))
    assert(viaSql.exceptAll(viaApi).count() === 0)
  }
}

package graft.functions

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class KmvBottomKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(df: DataFrame, k: Int): Seq[Long] = {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("kmv_input")
    spark.sql(s"SELECT graft_kmv(v, $k) AS s FROM kmv_input")
      .head().getSeq[Long](0)
  }

  test("k smallest DISTINCT values, ascending, duplicates collapsed, " +
      "nulls ignored") {
    val df = Seq[java.lang.Long](9L, 3L, 3L, 7L, null, 1L, 9L, 5L, 1L)
      .toDF("v")
    assert(sketch(df, 3) === Seq(1L, 3L, 5L))
    // k larger than the distinct count returns everything
    assert(sketch(df, 100) === Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("merge-order independence: any partitioning yields the same " +
      "sketch (bottom-k of union = bottom-k of per-part bottom-ks)") {
    val xs = (1 to 5000).map(i => ((i.toLong * 48271L) % 2953L))
    val base = sketch(xs.toDF("v"), 16)
    assert(base === xs.distinct.sorted.take(16))
    assert(sketch(xs.toDF("v").repartition(32), 16) === base)
    assert(sketch(xs.toDF("v").repartition(1), 16) === base)
  }

  test("grouped aggregation keeps per-group sketches independent") {
    GraftExtensions.register(spark)
    val df = (1 to 100).map(i => (i % 3, i.toLong)).toDF("g", "v")
    df.createOrReplaceTempView("kmv_grp")
    val r = spark.sql(
        "SELECT g, graft_kmv(v, 2) AS s FROM kmv_grp GROUP BY g ORDER BY g")
      .as[(Int, Seq[Long])].collect()
    // group 0: {3,6,...}, group 1: {1,4,...}, group 2: {2,5,...}
    assert(r === Array((0, Seq(3L, 6L)), (1, Seq(1L, 4L)),
      (2, Seq(2L, 5L))))
  }

  test("negative values order correctly (signed comparison, not " +
      "unsigned)") {
    val df = Seq(-5L, 10L, -1L, 0L, 7L).toDF("v")
    assert(sketch(df, 3) === Seq(-5L, -1L, 0L))
  }

  test("buffer serialization round-trips exactly (the shuffle wire " +
      "format of partial sketches)") {
    val agg = graft.functions.expressions.KmvBottomK(
      org.apache.spark.sql.GraftColumnBridge.expression(
        org.apache.spark.sql.functions.col("v")), k = 4)
    val buf = agg.createAggregationBuffer()
    Seq(9L, -3L, 7L, 0L, 5L).foreach(x => buf.add(x))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back === buf)
    val empty = agg.createAggregationBuffer()
    assert(agg.deserialize(agg.serialize(empty)).isEmpty)
  }

  test("non-BIGINT input fails analysis loudly") {
    GraftExtensions.register(spark)
    Seq("a").toDF("v").createOrReplaceTempView("kmv_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_kmv(v, 4) FROM kmv_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }
}

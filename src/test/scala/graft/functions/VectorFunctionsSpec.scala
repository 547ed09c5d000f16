package graft.functions

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("JL projection preserves squared norms in expectation (fixture corpus)") {
    val emb = Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(VectorFunctions.toDouble(col("embedding")).as("v"))
    val ratio = emb.select(
        (VectorFunctions.dot(VectorFunctions.jlProject(col("v"), 8),
          VectorFunctions.jlProject(col("v"), 8)) /
          VectorFunctions.dot(col("v"), col("v"))).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    // E[||Pv||^2] = ||v||^2 for the Achlioptas sign matrix; with k=8 the
    // corpus average concentrates well inside [0.7, 1.3]
    assert(ratio > 0.7 && ratio < 1.3, s"norm-preservation ratio $ratio")
  }

  test("JL projection is deterministic and identical for identical vectors") {
    val a = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "v")
      .select(col("id"),
        VectorFunctions.jlProject(VectorFunctions.toDouble(col("v")), 4).as("p"))
      .as[(Long, Array[Double])].collect().toMap
    assert(a(1L).toSeq === a(2L).toSeq)
    assert(a(1L).length === 4)
  }
}

package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // brute-force dominance check mirroring the oracle's NOT EXISTS
  private def bruteSkyline(rows: Seq[(Long, Double, Int)]): Set[Long] =
    rows.filter { case (_, p, s) =>
      !rows.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }
    }.map(_._1).toSet

  test("pareto2 equals the quadratic NOT EXISTS dominance definition") {
    // ties on price, ties on size, duplicate (price, size) points
    val data = Seq(
      (1L, 10.0, 5), (2L, 10.0, 8), (3L, 12.0, 8), (4L, 12.0, 9),
      (5L, 15.0, 9), (6L, 15.0, 12), (7L, 20.0, 12), (8L, 20.0, 1),
      (9L, 10.0, 8), // duplicate of id=2's point: both survive
      (10L, 9.0, 1))
    val df = data.toDF("id", "price", "size")
    val got = Skyline.pareto2(df, "price", "size")
      .select("id").as[Long].collect().toSet
    assert(got === bruteSkyline(data))
    // duplicates of a frontier point all survive; dominated rows don't
    assert(got.contains(2L) && got.contains(9L) && !got.contains(1L))
  }

  test("pareto2 matches brute force on random point sets") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val data = (1L to 200L).map(i =>
        (i, (rnd.nextInt(50) + 1).toDouble, rnd.nextInt(40)))
      val got = Skyline.pareto2(data.toDF("id", "price", "size"),
        "price", "size").select("id").as[Long].collect().toSet
      assert(got === bruteSkyline(data))
    }
  }

  test("pareto2 keeps all input columns and is partitioning-invariant") {
    val df = Seq((1L, 5.0, 3, "x"), (2L, 4.0, 3, "y"), (3L, 6.0, 9, "z"))
      .toDF("id", "price", "size", "tag")
    val out = Skyline.pareto2(df, "price", "size")
    assert(out.columns.toSeq === df.columns.toSeq)
    val again = Skyline.pareto2(df.repartition(5), "price", "size")
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
  }
}

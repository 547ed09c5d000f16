package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class MarketBasketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // b1 {1,2,3}, b2 {1,2}, b3 {1,2}, b4 {3,4}, b5 {1}
  private def baskets = Seq(
    (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
    (3L, 1L), (3L, 2L), (4L, 3L), (4L, 4L), (5L, 1L))
    .toDF("bk", "it")

  test("hand-computed support/confidence/lift; apriori and pair floors " +
      "prune; lift is direction-symmetric") {
    // item freq: 1->4, 2->3, 3->2, 4->1 (4 pruned by minItem).
    // frequent pairs: (1,2) in b1,b2,b3 -> 3; (1,3) and (2,3) have
    // support 1 -> pruned by minPair. Rules:
    // 1->2: sup 3/5, conf 3/4 = 750000, P(B)=3/5 -> lift 1250000
    // 2->1: conf 3/3 = 1000000, P(B)=4/5 -> lift 1250000
    val r = MarketBasket.pairRules(baskets, "bk", "it", 2, 2, 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r === Seq(
      (1L, 2L, 3L, 600000L, 750000L, 1250000L),
      (2L, 1L, 3L, 600000L, 1000000L, 1250000L)))
  }

  test("duplicate item lines in one basket count once") {
    val dup = baskets.unionAll(Seq((1L, 2L), (2L, 1L)).toDF("bk", "it"))
    val a = MarketBasket.pairRules(baskets, "bk", "it", 2, 2, 10)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    val b = MarketBasket.pairRules(dup, "bk", "it", 2, 2, 10)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(a === b)
  }

  test("topK cut is deterministic under a total order and " +
      "partitioning-invariant") {
    val many = (1 to 200).flatMap { b =>
      (0 until 3).map(j => (b.toLong, ((b + j * 7) % 20).toLong))
    }.toDF("bk", "it")
    def run(df: org.apache.spark.sql.DataFrame) =
      MarketBasket.pairRules(df, "bk", "it", 2, 2, 15)
        .collect().map(_.toSeq).toSeq
    assert(run(many) === run(many.repartition(13)))
  }
}

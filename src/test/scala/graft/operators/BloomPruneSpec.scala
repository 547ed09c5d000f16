package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def big = (1L to 10000L).map(i => (i, i % 97)).toDF("k", "v")
  private def small = (1L to 10000L).filter(_ % 37 == 0).map(i => Tuple1(i))
    .toDF("sk")

  test("bloom-pruned semi join equals the exact semi join") {
    val pruned = BloomPrune.bloomPrunedSemiJoin(big, small, "k", "sk",
      expectedItems = 1000L, fpp = 0.01)
    val exact = big.join(small.select(col("sk").as("k")), Seq("k"), "left_semi")
    assert(pruned.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(pruned).count() === 0)
    assert(pruned.count() === 10000L / 37)
  }

  test("bloom has no false negatives: every true key passes the probe") {
    val bloom = BloomPrune.buildBloom(small, "sk", 1000L, 0.01)
    val missed = small
      .filter(!BloomPrune.mightContain(bloom, col("sk"))).count()
    assert(missed === 0, "a true key must never be pruned")
  }

  test("bloom prunes most non-matching rows at 1% fpp") {
    val bloom = BloomPrune.buildBloom(small, "sk", 1000L, 0.01)
    val passed = big.filter(BloomPrune.mightContain(bloom, col("k"))).count()
    val matches = 10000L / 37
    // fp tail should be a few percent of the 9730 non-matching rows
    assert(passed >= matches)
    assert(passed <= matches + 500,
      s"bloom passed $passed rows; expected close to $matches true matches")
  }

  test("empty small side yields an empty result, schema preserved") {
    val r = BloomPrune.bloomPrunedSemiJoin(big, small.limit(0), "k", "sk")
    assert(r.count() === 0)
    assert(r.columns.toSeq === Seq("k", "v"))
  }

  test("the probe appears as a native might_contain filter in the plan") {
    // a LocalRelation's filter is folded away by ConvertToLocalRelation, so
    // gate the plan shape on a Range source (what a real scan looks like)
    val bigScan = spark.range(1L, 10001L).toDF("k")
    val plan = BloomPrune.bloomPrunedSemiJoin(bigScan, small, "k", "sk",
      expectedItems = 1000L, fpp = 0.01).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a native bloom probe in the plan:\n$plan")
  }
}

package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bench = Seq(
    (100L, "alpha beta gamma delta epsilon zeta")
  ).toDF("doc_id", "text")

  private def train = Seq(
    // leaks the benchmark's 5-gram twice-shifted window -> 2 shared shingles
    (1L, "intro words alpha beta gamma delta epsilon zeta outro"),
    // shares only a 3-word run: no 5-gram overlap
    (2L, "alpha beta gamma unrelated tail words here now"),
    (3L, "completely different content with no shared phrases at all")
  ).toDF("doc_id", "text")

  test("docs sharing an n-gram with the benchmark are flagged, others not") {
    val r = Decontaminate.contaminationReport(train, bench, "doc_id", "text",
        n = 5, minOverlap = 1L)
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    // "alpha beta gamma delta epsilon" and "beta gamma delta epsilon zeta"
    assert(r(1L) === ((2L, true)))
    assert(r(2L) === ((0L, false)))
    assert(r(3L) === ((0L, false)))
    // one row per training doc, benchmark rows never appear
    assert(r.size === 3 && !r.contains(100L))
  }

  test("minOverlap raises the flagging threshold without changing counts") {
    val r = Decontaminate.contaminationReport(train, bench, "doc_id", "text",
        n = 5, minOverlap = 3L)
      .select("doc_id", "n_overlap", "contaminated")
      .as[(Long, Long, Boolean)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(1L) === ((2L, false))) // still 2 overlaps, now below threshold
  }

  test("contamination join broadcasts the benchmark side") {
    val plan = Decontaminate.contaminationReport(train, bench, "doc_id", "text",
      n = 5, minOverlap = 1L).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark shingle set should broadcast:\n$plan")
  }
}

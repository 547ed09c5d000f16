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

  test("semantic decontamination flags by cosine radius with per-doc " +
      "hit counts and rounded max cosine") {
    // bench: two copies of the x axis. train: the x axis itself (cos 1
    // to both), the diagonal (cos 1/sqrt(2) ~ 0.707), the y axis (cos 0)
    val bench2 = Seq((100L, Array(1f, 0f)), (200L, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val train2 = Seq((1L, Array(1f, 0f)), (2L, Array(1f, 1f)),
      (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val r = Decontaminate.semanticContaminationReport(train2, bench2,
        "vec_id", "embedding", minCos = 0.5)
      .as[(Long, Long, Option[Double], Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) === ((2L, Some(1.0), true)))
    assert(r(2L) === ((2L, Some(0.707), true))) // floor-rounded, 3 dp
    assert(r(3L) === ((0L, None, false)))
    assert(r.size === 3)
  }

  test("contamination matrix classifies verdict combinations and keeps " +
      "docs either report missed") {
    val spark2 = spark; import spark2.implicits._
    val lex = Seq((1L, true), (2L, false), (3L, true), (4L, false))
      .toDF("doc_id", "contaminated")
    val sem = Seq((1L, true), (2L, true), (3L, false), (5L, true))
      .toDF("doc_id", "contaminated")
    val got = Decontaminate.contaminationMatrix(lex, sem)
      .as[(String, Long)].collect().toMap
    // 1 both; 2 sem-only; 3 lex-only; 4 clean; 5 (sem report only) sem
    assert(got === Map("both" -> 1L, "semantic_only" -> 2L,
      "ngram_only" -> 1L, "clean" -> 1L))
  }
}

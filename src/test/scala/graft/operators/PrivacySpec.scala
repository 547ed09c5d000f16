package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (age_band, zip, disease): one safe diverse class, one small class,
  // one large-but-homogeneous class
  private def patients = Seq(
    ("30s", "75001", "flu"), ("30s", "75001", "cold"),
    ("30s", "75001", "flu"), ("30s", "75001", "asthma"),
    ("40s", "75002", "cancer"), // class of 1 — k-violation
    ("50s", "75003", "flu"), ("50s", "75003", "flu"),
    ("50s", "75003", "flu"), ("50s", "75003", "flu") // homogeneous — l-violation
  ).toDF("age_band", "zip", "disease")

  test("kAnonymityReport flags small and homogeneous classes") {
    val rep = Privacy.kAnonymityReport(patients, Seq("age_band", "zip"),
      "disease", k = 3, l = 2)
    val byClass = rep.as[(String, String, Long, Long, Boolean, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val safe = byClass(("30s", "75001"))
    assert(safe._3 === 4L && safe._4 === 3L && safe._5 && safe._6)
    val small = byClass(("40s", "75002"))
    assert(small._3 === 1L && !small._5)
    val homog = byClass(("50s", "75003"))
    assert(homog._3 === 4L && homog._4 === 1L && homog._5 && !homog._6)
    assertThrows[IllegalArgumentException] {
      Privacy.kAnonymityReport(patients, Nil, "disease", 3, 2)
    }
  }

  test("suppressBelowK removes exactly the rows of under-k classes") {
    val kept = Privacy.suppressBelowK(patients, Seq("age_band", "zip"), k = 3)
    assert(kept.count() === 8L) // the lone 40s/75002 row is suppressed
    assert(kept.filter(col("zip") === "75002").count() === 0L)
    assert(kept.columns.toSeq === patients.columns.toSeq)
    // every surviving class is k-anonymous
    val sizes = kept.groupBy("age_band", "zip").count()
      .as[(String, String, Long)].collect()
    assert(sizes.forall(_._3 >= 3))
    // idempotent: suppressing an already-clean table changes nothing
    val again = Privacy.suppressBelowK(kept, Seq("age_band", "zip"), 3)
    assert(again.exceptAll(kept).count() === 0)
    assert(kept.exceptAll(again).count() === 0)
  }
}

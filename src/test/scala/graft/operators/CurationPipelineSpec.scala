package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longText = ("the quick brown fox jumps over the lazy dog and " +
    "then runs far away to find some interesting food in the old barn ") * 3

  private def docs = Seq(
    (1L, longText, "a"),                       // passes gopher
    (2L, longText, "a"),                       // exact dup of 1
    (3L, longText + "with one extra tail sentence here", "a"), // near dup of 1
    (4L, "tiny", "a"),                         // fails gopher (too short)
    (5L, longText + " unique middle content appears only here with many extra " +
      "different words to break every shingle band so no candidate forms at all " +
      "completely novel vocabulary everywhere calm ocean breeze mountain valley", "b")
  ).toDF("doc_id", "text", "source")

  private def run(df: org.apache.spark.sql.DataFrame, cap: Int = 100) =
    CurationPipeline.curate(df, "doc_id", "text", "source",
      minTokens = 10, cap = cap,
      rates256 = Map.empty, default256 = 256) // keep-all sampling
      .select("doc_id", "status").as[(Long, String)].collect().toMap

  test("every document gets exactly one status; stages fire in order") {
    val r = run(docs)
    assert(r.size === 5)
    assert(r(4L) === "gopher")
    assert(r(1L) === "kept")      // first copy survives everything
    assert(r(2L) === "exact_dup") // identical text, higher id
    assert(r(3L) === "near_dup")  // verified high-jaccard pair with 1
    assert(r(5L) === "kept")
  }

  test("domain cap truncates a hot source after dedup") {
    // mostly-unique vocabulary per doc: no near-dup pair ever verifies
    val hot = (1L to 6L).map(i => (i,
      "the of " + (1 to 10).map(j =>
        s"alpha${i}x$j beta${i}y$j gamma${i}z$j").mkString(" "), "hot"))
      .toDF("doc_id", "text", "source")
    val r = run(hot, cap = 4)
    assert(r.values.count(_ == "domain_cap") === 2)
    assert(r.values.count(_ == "kept") === 4)
  }

  test("disposition is deterministic under repartitioning") {
    assert(run(docs.repartition(7)) === run(docs.repartition(1)))
  }

  test("empty corpus flows through every stage to an empty ledger") {
    assert(run(docs.filter(col("doc_id") < 0)).isEmpty)
  }
}

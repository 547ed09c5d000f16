package graft.operators

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Gates the graph family's cache-release discipline: every operator
  * persists exactly its RESULT (callers reuse it) and must release every
  * INTERNAL cache before returning — a long-lived session calling these
  * over distinct graphs must not accumulate entries (the contract each
  * scaladoc states). The check runs each op, unpersists the returned
  * frame, and asserts the session's persistent-RDD registry is back at
  * (or, if the async ContextCleaner reclaimed older entries meanwhile,
  * below) its baseline.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two triangles bridged by an edge, plus a pendant — every op has work
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (3L, 4L),
    (4L, 5L), (5L, 6L), (4L, 6L),
    (6L, 7L)).toDF("a", "b")
  private def wedges = edges.withColumn("w",
    org.apache.spark.sql.functions.lit(2L))
  private def seeds = Seq(1L, 4L).toDF("s")

  private def persisted(): Int = spark.sparkContext.getPersistentRDDs.size

  private def assertNoLeak(name: String)(run: => DataFrame): Unit = {
    val base = persisted()
    val result = run
    result.count()
    result.unpersist(true)
    val after = persisted()
    assert(after <= base,
      s"$name leaked ${after - base} cached frame(s) beyond its result " +
        s"(baseline $base, after unpersisting the result $after)")
  }

  test("pageRankInt releases every internal cache (plain and personalized)") {
    assertNoLeak("pageRankInt") {
      Graph.pageRankInt(wedges, "a", "b", "w", iterations = 3)
    }
    assertNoLeak("pageRankInt(seeds)") {
      Graph.pageRankInt(wedges, "a", "b", "w", iterations = 3,
        seeds = Some(seeds))
    }
  }

  test("triangle family releases every internal cache") {
    assertNoLeak("triangleCounts") { Graph.triangleCounts(edges, "a", "b") }
    assertNoLeak("triangleCountsDegree") {
      Graph.triangleCountsDegree(edges, "a", "b")
    }
    // regression: clusteringCoefficient used to leak the triangle-count
    // frame its internal triangleCounts call persisted
    assertNoLeak("clusteringCoefficient") {
      Graph.clusteringCoefficient(edges, "a", "b")
    }
  }

  test("peeling / propagation / projection ops release every internal cache") {
    assertNoLeak("kCore") { Graph.kCore(edges, "a", "b", k = 2, rounds = 5) }
    assertNoLeak("labelPropagation") {
      Graph.labelPropagation(edges, "a", "b", rounds = 3)
    }
    assertNoLeak("linkPrediction") { Graph.linkPrediction(edges, "a", "b") }
    assertNoLeak("bipartiteProject") {
      Graph.bipartiteProject(edges, "a", "b")
    }
    assertNoLeak("assortativity") { Graph.assortativity(edges, "a", "b") }
    assertNoLeak("hitsInt") { Graph.hitsInt(wedges, "a", "b", "w", 3) }
  }

  test("frontier-iteration ops release every internal cache") {
    assertNoLeak("bfsLevels") {
      Graph.bfsLevels(edges, "a", "b", seeds, "s", maxHops = 4)
    }
    assertNoLeak("harmonicCentrality") {
      Graph.harmonicCentrality(edges, "a", "b", seeds, "s", maxHops = 4)
    }
    assertNoLeak("betweennessCentrality") {
      Graph.betweennessCentrality(edges, "a", "b", seeds, "s", maxHops = 4)
    }
  }
}

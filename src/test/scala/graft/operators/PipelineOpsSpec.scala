package graft.operators

import graft.{SparkEntry, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant gates for the round-4 pipeline operators (tx20, st6, dd24,
  * pk3, ss12). The oracle proves value parity; these prove the structural
  * contracts a user relies on (mass conservation, dense ranks, session
  * accounting) and partition-invariance where the operator claims it.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf0001

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("tx20: Zipf slope is negative, bounded, and deterministic") {
    val row = q("tx20_zipf_audit").head()
    val slope = row.getAs[Double]("zipf_slope")
    // a natural-ish corpus decays: slope strictly negative, not a cliff
    assert(slope < 0.0 && slope > -10.0, s"slope=$slope")
    assert(row.getAs[Long]("n_terms") <= 200)
    // OLS sums are BIGINT micro-nats: a fresh plan (new shuffles, new
    // task order) must reproduce the same bits
    assert(q("tx20_zipf_audit").head().getAs[Double]("zipf_slope") === slope)
  }

  test("st6: session windows partition the event stream exactly") {
    val sessions = q("st6_session_window").persist()
    val events = graft.Tables.load(spark, sf, "events")
    // every event lands in exactly one session
    assert(sessions.agg(sum("n_events")).head().getLong(0) === events.count())
    // island count matches the window-function formulation (q16)
    assert(sessions.count() === q("q16_sessionize").count())
    // a session's end is the last event + the 30-minute gap, so the span
    // is always at least the gap and the windows of one user never overlap
    val bad = sessions.filter(
      col("session_end") < col("session_start") + expr("INTERVAL 30 MINUTES"))
    assert(bad.count() === 0)
    val overlaps = sessions.as("a").join(sessions.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.session_start") < col("b.session_start") &&
        col("b.session_start") < col("a.session_end"))
    assert(overlaps.count() === 0, "watermark-mergeable sessions must not overlap")
    sessions.unpersist()
    ()
  }

  test("dd24: soft-dedup weights conserve one unit of mass per cluster") {
    val w = q("dd24_soft_dedup_weight").persist()
    val docs = graft.Tables.load(spark, sf, "documents")
    // every document appears exactly once
    assert(w.count() === docs.count())
    assert(w.select("doc_id").distinct().count() === docs.count())
    // each cluster's total weight is ~1 (floor truncation loses < n/1e6)
    val perCluster = w.groupBy("cluster_id")
      .agg(sum("weight").as("mass"), count(lit(1)).as("n"))
    val off = perCluster.filter(
      abs(col("mass") - 1.0) > col("n").cast("double") / 1e6)
    assert(off.count() === 0, "cluster mass must stay ~1")
    // weight is exactly 1/cluster_size (floored to 1e-6)
    val wrong = w.filter(
      col("weight") =!= floor(lit(1e6) / col("cluster_size")) / 1e6)
    assert(wrong.count() === 0)
    w.unpersist()
    ()
  }

  test("pk3: curriculum phases are balanced and positions are dense") {
    val c = q("pk3_curriculum").persist()
    val n = c.count()
    val sizes = c.groupBy("phase").agg(count(lit(1)).as("sz"))
      .collect().map(r => r.getAs[Long]("phase") -> r.getAs[Long]("sz")).toMap
    assert(sizes.keySet === Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1, s"ntile balance: $sizes")
    // positions are a dense 1..size permutation within each phase
    val dense = c.groupBy("phase").agg(
      count(lit(1)).as("sz"), max("phase_pos").as("mx"),
      countDistinct("phase_pos").as("dn"))
    assert(dense.filter(col("mx") =!= col("sz") || col("dn") =!= col("sz"))
      .count() === 0)
    // phase 1 holds the best quality: its MIN q >= phase 4's MAX q minus
    // ties (ntile splits ties across boundaries, so compare quantile order
    // loosely via means)
    val m = c.groupBy("phase").agg(avg("q").as("mq")).collect()
      .map(r => r.getAs[Long]("phase") -> r.getAs[Double]("mq")).toMap
    assert(m(1L) >= m(4L), s"phase means must be ordered: $m")
    assert(n > 0)
    c.unpersist()
    ()
  }

  test("ss12: kNN graph has no self-loops, dense ranks, valid cosines") {
    val g = q("ss12_knn_graph").persist()
    assert(g.filter(col("query_id") === col("neighbor_id")).count() === 0)
    assert(g.filter(col("rank") < 1 || col("rank") > 3).count() === 0)
    // ranks dense per query: max(rank) == count(rank)
    val byQ = g.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"))
    assert(byQ.filter(col("n") =!= col("mx")).count() === 0)
    assert(g.filter(col("cos") > 1.0001 || col("cos") < -1.0001).count() === 0)
    g.unpersist()
    ()
  }
}

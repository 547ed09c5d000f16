package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stratified hash sample applies per-stratum rates deterministically") {
    val rows = (1L to 4000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val sampled = Sampling.stratifiedHashSample(
      rows, "id", "lang", Map("en" -> 64), default256 = 256)
    // the internal bucket column must not leak into the output schema
    assert(sampled.columns.toSeq === rows.columns.toSeq)
    assert(Sampling.stratifiedHashSample(rows, "id", "lang", Map("en" -> 64),
      default256 = 256, keepBucket = true).columns.contains("bucket"))
    val counts = sampled.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // fr untouched; en ~ 25% (md5 buckets are uniform; allow 5 points)
    assert(counts("fr") === 2000L)
    assert(math.abs(counts("en") - 500L) < 100,
      s"en keep count ${counts("en")} far from the 64/256 rate")
    // identical membership on a re-run (no RNG state anywhere)
    val again = Sampling.stratifiedHashSample(
      rows.repartition(7), "id", "lang", Map("en" -> 64), default256 = 256)
    assert(sampled.select("id").exceptAll(again.select("id")).count() === 0)
    assert(again.select("id").exceptAll(sampled.select("id")).count() === 0)
    // rate 0 drops the stratum entirely
    assert(Sampling.stratifiedHashSample(
      rows, "id", "lang", Map("en" -> 0), 256)
      .filter(col("lang") === "en").count() === 0)
    // a pre-existing 'bucket' column would be silently clobbered: reject
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedHashSample(
        rows.withColumn("bucket", lit(1)), "id", "lang", Map.empty, 256)
    }
  }

  test("rateLookup equals a when-chain reference on random strata and rates") {
    val rnd = new scala.util.Random(42)
    val strata = (0 until 50).map(i => s"s$i")
    val rates = strata.filter(_ => rnd.nextBoolean())
      .map(_ -> rnd.nextInt(257)).toMap
    val default = 77
    val df = (strata ++ Seq("unseen1", "unseen2")).toDF("lang")
    val ref = rates.foldLeft(lit(default): org.apache.spark.sql.Column) {
      case (acc, (k, r)) => when(col("lang") === k, lit(r)).otherwise(acc)
    }
    val got = df.select(
      Sampling.rateLookup(rates, default, col("lang")).as("a"), ref.as("b"))
    assert(got.filter(col("a") =!= col("b")).count() === 0)
    assert(got.filter(col("a").isNull).count() === 0)
  }

  test("domain cap keeps at most cap rows per stratum, preferring the order") {
    val docs = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 50L)
    ).toDF("doc_id", "source", "n_chars")
    val kept = Sampling.domainCap(docs, "source", col("n_chars").desc,
        "doc_id", cap = 2)
      .select("doc_id", "source", "cap_rank")
      .as[(Long, String, Int)].collect().toSet
    // source a: n_chars 300 ties between docs 2 and 4 -> id ascending wins
    assert(kept === Set((2L, "a", 1), (4L, "a", 2), (5L, "b", 1)))
    // deterministic under repartitioning
    val again = Sampling.domainCap(docs.repartition(7), "source",
        col("n_chars").desc, "doc_id", cap = 2)
      .select("doc_id", "source", "cap_rank")
      .as[(Long, String, Int)].collect().toSet
    assert(again === kept)
    assertThrows[IllegalArgumentException] {
      Sampling.domainCap(docs, "source", col("n_chars").desc, "doc_id", 0)
    }
  }

  test("weighted top-k sample favors heavy rows and is partition-invariant") {
    // weights 1 vs 1000: the heavy half should dominate a k=20 sample
    val rows = (1L to 200L)
      .map(i => (i, if (i <= 100) 1000L else 1L)).toDF("id", "w")
    val picked = Sampling.weightedTopKSample(rows, "id", "w", k = 20)
    assert(picked.count() === 20)
    val heavy = picked.filter(col("w") === 1000L).count()
    assert(heavy >= 17, s"only $heavy of 20 picks were heavy-weight rows")
    // identical membership on any partitioning (md5 keys, no RNG)
    val again = Sampling.weightedTopKSample(rows.repartition(7), "id", "w", 20)
    assert(picked.select("id").exceptAll(again.select("id")).count() === 0)
    // zero/negative weights can never be selected
    val withZero = rows.union(Seq((999L, 0L), (998L, -5L)).toDF("id", "w"))
    assert(Sampling.weightedTopKSample(withZero, "id", "w", 300)
      .filter(col("id") >= 998L).count() === 0)
    assertThrows[IllegalArgumentException] {
      Sampling.weightedTopKSample(rows, "id", "w", 0)
    }
  }

  test("stratified exact split hits integer-exact per-stratum proportions") {
    // strata of deliberately awkward sizes (including n=1 and n=5)
    val rows = ((1L to 1000L).map(i => (i, "big")) ++
      (1001L to 1005L).map(i => (i, "tiny")) ++
      Seq((2000L, "single"))).toDF("id", "src")
    val split = Sampling.stratifiedExactSplit(rows, "id", "src",
      train256 = 204, val256 = 26)
    val counts = split.groupBy("src", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (s, sp, n) => (s, sp) -> n }.toMap
    // big: floor-exact boundaries — rn*256 <= n*204 → 796 train,
    // rn*256 <= n*230 → 898 cumulative → 102 val, 102 test
    assert(counts(("big", "train")) === 796L)
    assert(counts(("big", "val")) === 102L)
    assert(counts(("big", "test")) === 102L)
    // tiny (n=5): 5*204/256 = 3.98 → 3 train; 5*230/256 = 4.49 → 1 val
    assert(counts(("tiny", "train")) === 3L)
    assert(counts(("tiny", "val")) === 1L)
    assert(counts(("tiny", "test")) === 1L)
    // n=1: 204/256 < 1 → the lone row is test (never train by rounding up)
    assert(counts(("single", "test")) === 1L)
    // deterministic on any partitioning (md5 ranking, no RNG)
    val again = Sampling.stratifiedExactSplit(rows.repartition(7), "id",
      "src", 204, 26)
    assert(split.exceptAll(again).count() === 0)
    assert(again.exceptAll(split).count() === 0)
    assertThrows[IllegalArgumentException] {
      Sampling.stratifiedExactSplit(rows, "id", "src", 200, 100)
    }
  }

  test("coherent sampling keeps full FK chains: every sampled child has " +
      "its parent, and the root fraction tracks the hex cut") {
    val cust = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/customer.parquet")
    val ord = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/orders.parquet")
    val sc = Sampling.hashPrefixSample(cust, "c_custkey", "1a")
    // '1a' = 26/256 of the 2-hex space; md5 is uniform
    val frac = sc.count().toDouble / cust.count()
    assert(frac > 0.04 && frac < 0.17, s"~10% expected, got $frac")
    // deterministic: same keys on a rerun and under repartitioning
    val again = Sampling
      .hashPrefixSample(cust.repartition(7), "c_custkey", "1a")
    assert(again.select("c_custkey").exceptAll(
      sc.select("c_custkey")).isEmpty)
    // coherence: sampled orders' customers are all in the sampled set
    val so = ord.join(sc.selectExpr("c_custkey AS o_custkey"),
      Seq("o_custkey"), "left_semi")
    val orphans = so.join(sc.selectExpr("c_custkey AS o_custkey"),
      Seq("o_custkey"), "left_anti")
    assert(orphans.isEmpty)
  }

  test("budget waterfill: hand-computed redistribution, saturation, " +
      "degenerate budgets") {
    val spark2 = spark; import spark2.implicits._
    // token counts: A=10, B=100, C=5 (whitespace tokens); budget 30:
    // round1 quota 10 -> A sat at 10, B 10, C sat at 5 (spent 25);
    // round2 remaining 5, only B unsaturated -> B 15; round3 no-op
    val docs = Seq(
      ("A", (1 to 10).map(i => s"a$i").mkString(" ")),
      ("B", (1 to 100).map(i => s"b$i").mkString(" ")),
      ("C", (1 to 5).map(i => s"c$i").mkString(" "))
    ).toDF("source", "text")
    val r = Sampling.budgetWaterfill(docs, "source", "text", 30L)
      .as[(String, Long, Long, Boolean, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("A") === (("A", 10L, 10L, true, 1000000L)), r)
    assert(r("B") === (("B", 100L, 15L, false, 150000L)), r)
    assert(r("C") === (("C", 5L, 5L, true, 1000000L)), r)
    // budget above total availability: everything saturates, nothing over
    val all = Sampling.budgetWaterfill(docs, "source", "text", 1000L)
      .as[(String, Long, Long, Boolean, Long)].collect()
    assert(all.forall(x => x._3 == x._2 && x._4))
    // zero budget: zero allocations, zero fill
    val zero = Sampling.budgetWaterfill(docs, "source", "text", 0L)
      .as[(String, Long, Long, Boolean, Long)].collect()
    assert(zero.forall(x => x._3 == 0L && !x._4 && x._5 == 0L))
  }
}

package graft.operators

import graft.TestSpark
import graft.functions.VectorFunctions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("brute-force top-k ranks the clone first, orthogonal last") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (13L, Array(0.5f, 0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id", "cos")
      .as[(Long, Double)].collect()
    assert(r.map(_._1).toSeq === Seq(10L, 11L, 13L)) // 12 (orthogonal) excluded
    assert(r.head._2 === 1.0)
  }

  test("matryoshka rerank: full shortlist equals brute force; a tight " +
      "shortlist evicts prefix-misranked true neighbors") {
    val q = Seq((100L, Array(1.0f, 0f, 0f, 0f, 1.0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0f, 1.0f, 0f, 0f, 1.0f, 0f, 0f, 0f)), // prefix 0, full .5
      (2L, Array(1.0f, 0f, 0f, 0f, -1.0f, 0f, 0f, 0f)), // prefix 1, full 0
      (3L, Array(0.5f, 0f, 0f, 0f, 0.5f, 0f, 0f, 0f))  // prefix 1, full 1
    ).toDF("vec_id", "embedding")
    def run(shortlist: Int, k: Int) =
      Similarity.matryoshkaRerank(q, corpus, "vec_id", "embedding",
          k = k, prefixDim = 4, shortlist = shortlist)
        .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // shortlist 2 keeps prefix winners {2, 3}; the true #2 neighbor (1,
    // full cos .5) was prefix-misranked out — the documented trade
    assert(run(2, 2) === Seq(3L, 2L))
    // widening the shortlist buys the recall back
    assert(run(3, 2) === Seq(3L, 1L))
    // full shortlist == brute force on the same fixture
    val brute = Similarity.bruteForceTopK(q, corpus, "vec_id",
        "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(run(3, 3) === brute)
    val again = Similarity.matryoshkaRerank(q, corpus.repartition(5),
        "vec_id", "embedding", k = 3, prefixDim = 4, shortlist = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(again === run(3, 3))
  }

  test("radius search returns exactly the neighbors above the cosine floor") {
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // cos 1.0
      (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // cos ~0.994
      (12L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // cos 0.0
      (13L, Array(0.5f, 0.5f, 0.0f, 0.0f)),   // cos ~0.707
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f))     // self — excluded by id
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.radiusSearch(queries, corpus, "vec_id", "embedding",
      minCos = 0.7).select("neighbor_id").as[Long].collect().toSet
    assert(got === Set(10L, 11L, 13L))
    // completeness vs top-k truncation: k=2 would have dropped 13
    val all = Similarity.radiusSearch(queries, corpus, "vec_id", "embedding",
      minCos = -1.0).count()
    assert(all === 4L) // everything but the self-pair
  }

  test("MMR re-rank demotes an exact duplicate below a diverse candidate") {
    // a and b are identical (rel 0.9 to the query); c has the same
    // relevance but points the other way. Pure top-3 would order by id
    // (a, b, c); MMR round 2 penalizes b by sim(b, a) = 1 and picks c
    val corpus = Seq(
      (1L, Array(0.9f, 0.436f)),   // a
      (2L, Array(0.9f, 0.436f)),   // b = exact dup of a
      (3L, Array(0.9f, -0.436f))   // c: equally relevant, diverse
    ).toDF("vec_id", "embedding")
    val r = Similarity.mmrTopK(corpus, "vec_id", "embedding",
        Seq(1.0, 0.0), k = 3)
      .orderBy("rank").select("rank", "cand_id")
      .as[(Long, Long)].collect()
    assert(r.map(_._2).toSeq === Seq(1L, 3L, 2L),
      s"expected diverse pick before the duplicate, got ${r.toSeq}")
    // k larger than the pool: returns the whole pool, no crash
    assert(Similarity.mmrTopK(corpus, "vec_id", "embedding",
      Seq(1.0, 0.0), k = 10).count() === 3)
    // hard job ceiling: each round is a driver-coordinated Spark job,
    // so k past 128 must refuse rather than launch thousands of jobs
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrTopK(corpus, "vec_id", "embedding",
        Seq(1.0, 0.0), k = 129)
    }
    assert(e.getMessage.contains("[1, 128]"))
    // lineage checkpoint path (>16 rounds) stays correct: ranks all 20
    val big = (1 to 20).map(i =>
      (i.toLong, Array((1.0 / i).toFloat, (1.0 - 1.0 / i).toFloat)))
      .toDF("vec_id", "embedding")
    val r20 = Similarity.mmrTopK(big, "vec_id", "embedding",
      Seq(1.0, 0.0), k = 20).as[(Long, Long, Double)].collect()
    assert(r20.length === 20)
    assert(r20.map(_._2).toSet === (1L to 20L).toSet)
    assert(r20.head._2 === 1L) // most relevant first
  }

  test("srp bucket is deterministic and within range") {
    val emb = graft.Tables.load(spark, TestSpark.sf0001, "embeddings")
      .limit(50)
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("v"))
    val b1 = emb.select(col("vec_id"),
      VectorFunctions.srpBucket(col("v"), 4).as("b")).as[(Long, Long)].collect().toMap
    val b2 = emb.select(col("vec_id"),
      VectorFunctions.srpBucket(col("v"), 4).as("b")).as[(Long, Long)].collect().toMap
    assert(b1 === b2)
    assert(b1.values.forall(b => b >= 0 && b < 16))
  }

  test("multi-probe LSH improves recall against the exact ground truth") {
    val emb = graft.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 30)
    val c = emb.filter(col("vec_id") >= 30)
    val truth = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(probes: Int): Double = {
      val got = Similarity.lshTopK(q, c, "vec_id", "embedding", k = 5,
          planes = 4, probes = probes)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      truth.count(got.contains).toDouble / truth.size
    }
    val r1 = recall(1); val r3 = recall(3); val r5 = recall(5)
    assert(r3 >= r1, s"recall must not drop with more probes: p1=$r1 p3=$r3")
    assert(r5 > r1, s"probing all-but-strongest planes must beat one bucket: p1=$r1 p5=$r5")
  }

  test("k-means training reduces the quantization objective deterministically") {
    import spark.implicits._
    // three planted clusters around orthogonal anchors + deterministic noise
    val pts = for {
      c <- 0 until 3; i <- 0 until 30
    } yield {
      val base = Array.fill(4)(0.0f)
      base(c) = 10.0f
      base((c + 1) % 4) = (i % 7) * 0.1f // small in-cluster spread
      ((c * 30 + i).toLong, base)
    }
    val df = pts.toDF("vec_id", "embedding")
    def objective(cents: org.apache.spark.sql.DataFrame): Double = {
      val cs = cents.select("centv").as[Seq[Double]].collect()
      pts.map { case (_, v) =>
        cs.map(c => c.zip(v.map(_.toDouble)).map { case (a, b) =>
          (a - b) * (a - b) }.sum).min
      }.sum
    }
    val init = Similarity.trainKMeans(df, "vec_id", "embedding", k = 3, iters = 0)
    val trained = Similarity.trainKMeans(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(objective(trained) < objective(init) * 0.5,
      "Lloyd iterations must substantially reduce the planted-cluster objective")
    // determinism: identical centroids on a re-run
    val again = Similarity.trainKMeans(df, "vec_id", "embedding", k = 3, iters = 4)
    assert(trained.select("cent_id", "centv").as[(Long, Seq[Double])].collect().toMap
      === again.select("cent_id", "centv").as[(Long, Seq[Double])].collect().toMap)
    // trained centroids drive IVF search end-to-end
    val res = Similarity.ivfTopKWithCentroids(
      df.filter(col("vec_id") < 3), df.filter(col("vec_id") >= 3),
      "vec_id", "embedding", k = 2, trained, nProbe = 1)
    assert(res.count() === 6) // 3 queries x k=2, neighbors from the home cell
  }

  test("k-means counts every row of a duplicated id; zero vectors quantize to zeros") {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    // two distinct vectors sharing one id: the k=1 centroid must be their
    // MEAN — a window keyed on the id would silently drop one of them
    val dup = Seq((7L, Array(0.0f, 0.0f)), (7L, Array(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val c = Similarity.trainKMeans(dup, "vec_id", "embedding", k = 1, iters = 1)
      .select("centv").as[Seq[Double]].head()
    assert(c === Seq(1.0, 1.0), s"duplicate-id row was dropped: centroid $c")
    // zero-vector quantization: all-zero output, not NaN garbage
    val z = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      .select(toDouble(col("embedding")).as("v"))
      .select(quantizeInt8(col("v"), quantScale(col("v"))).as("q"))
      .as[Seq[Double]].head()
    assert(z === Seq(0.0, 0.0, 0.0))
  }

  test("int8 quantization stays in range and keeps cosine within 1e-3") {
    import graft.functions.VectorFunctions._
    val emb = graft.Tables.load(spark, TestSpark.sf0001, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("sc", quantScale(col("v")))
      .withColumn("q", quantizeInt8(col("v"), col("sc")))
    val bad = emb.filter(exists(col("q"),
      x => abs(x) > 127.0 || x =!= floor(x))).count()
    assert(bad === 0, "quantized values must be integers in [-127, 127]")
    val cos = emb
      .withColumn("dv", dequantizeInt8(col("q"), col("sc")))
      .select((dot(col("v"), col("dv")) /
        (norm2(col("v")) * norm2(col("dv")))).as("c"))
      .agg(min(col("c"))).head.getDouble(0)
    assert(cos >= 0.999, s"worst-case dequantized cosine $cos below 1e-3 budget")
  }

  test("lsh top-k returns a subset of brute-force candidates with same scores") {
    val emb = graft.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", k = 1000)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshTopK(q, c, "vec_id", "embedding", k = 3, planes = 4)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (qid, nid, cos) =>
      assert(brute((qid, nid)) === cos) // same pair scores identically
    }
  }

  test("quantized rerank emits exact final scores and stays bucket-joined") {
    val emb = graft.Tables.load(spark, TestSpark.sf0001, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", k = 1000)
      .select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val rr = Similarity.quantizedRerankTopK(q, c, "vec_id", "embedding",
      k = 3, planes = 4, shortlist = 10)
    val rows = rr.select("query_id", "neighbor_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    // stage 2 is FULL precision: every returned score must equal the
    // brute-force cosine for that pair (quantization affects candidate
    // ordering only, never the reported value)
    rows.foreach { case (qid, nid, cos) =>
      assert(brute((qid, nid)) === cos)
    }
    // the candidate join must be the bucket equi-join, not all-pairs
    val plan = rr.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"quantized rerank must stay bucket-joined:\n$plan")
  }

  test("quantized rerank shortlist recovers the exact top-k on same-bucket pairs") {
    // clone + small perturbations land in the query's bucket; the int8
    // stage-1 ordering may shuffle the shortlist but the exact re-rank
    // must restore the true order
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
      (12L, Array(0.95f, 0.05f, 0.0f, 0.0f)),
      (13L, Array(0.90f, 0.10f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.quantizedRerankTopK(queries, corpus, "vec_id",
        "embedding", k = 3, planes = 2, shortlist = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(r.toSeq === Seq(10L, 11L, 12L))
  }

  test("pqAdcTopK: codebook self-query ranks itself first with zero distance") {
    // 20 vectors of dim 8, 2 subspaces x 4 dims, 4 codes; vector 0 is both
    // a codebook entry and a query, so its own code distance is exactly 0
    val vecs = (0L until 20L).map { i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat / 10f))
    }.toDF("vec_id", "embedding")
    val r = Similarity.pqAdcTopK(vecs, "vec_id", "embedding",
      nSub = 2, subDim = 4, nCodes = 4, queryMaxId = 1, k = 5)
    val rows = r.select("query_id", "vec_id", "adc_u", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(rows.length === 5)
    assert(rows.head === ((0L, 0L, 0L, 1)), s"self not first: ${rows.head}")
    // ADC scores are non-decreasing with rank and non-negative
    assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
    assert(rows.forall(_._3 >= 0L))
    // partition-invariant (integer arithmetic end to end)
    val again = Similarity.pqAdcTopK(vecs.repartition(7), "vec_id",
        "embedding", nSub = 2, subDim = 4, nCodes = 4, queryMaxId = 1, k = 5)
      .select("query_id", "vec_id", "adc_u", "rank")
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    assert(again.toSeq === rows.toSeq)
  }

  test("ivfAppendReport: batch lands in nearest cells, hot flag fires above 2x mean") {
    // four well-separated cells on the axes; one indexed vector per cell,
    // then a skewed batch of 5 all landing in cell 0: totals (6,1,1,1),
    // mean 9/4 — only cell 0 clears the 2x-mean hot line (6*4 > 9*2)
    def vec(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val indexed = Seq((0L, vec(10, 0)), (1L, vec(0, 10)),
      (2L, vec(-10, 0)), (3L, vec(0, -10))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(10.0, 0.0)), (1L, Array(0.0, 10.0)),
      (2L, Array(-10.0, 0.0)), (3L, Array(0.0, -10.0)))
      .toDF("cent_id", "centv")
    val batch = Seq((100L, vec(11, 0)), (101L, vec(9.5, 0.2)),
      (102L, vec(12, 1)), (103L, vec(9, -1)), (104L, vec(8, 0.5)))
      .toDF("vec_id", "embedding")
    val r = Similarity.ivfAppendReport(indexed, batch, "embedding", cents)
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(r === Seq((0L, 1L, 5L, 6L, true), (1L, 1L, 0L, 1L, false),
      (2L, 1L, 0L, 1L, false), (3L, 1L, 0L, 1L, false)),
      s"unexpected report: $r")
  }

  test("multi-probe recall is monotonically non-decreasing in the probe " +
      "count (each extra probe only widens the candidate set)") {
    val emb = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 3, 4).map { m =>
      val got = Similarity.lshTopK(q, c, "vec_id", "embedding",
          k = 3, planes = 4, probes = m)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact intersect got).size.toDouble / exact.size
    }
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"recall must not drop with more probes: $recalls")
    }
    // all 5 probe buckets = the full 16-bucket space is NOT covered, so
    // perfect recall is not guaranteed — but more probes found more here
    assert(recalls.last >= recalls.head)
  }

  test("IVF-PQ: probed-cell candidates only, cluster-faithful retrieval, " +
      "dense ranks, deterministic under repartitioning") {
    val spark2 = spark; import spark2.implicits._
    // two well-separated clusters; ids 2,3 (the first corpus ids) are the
    // cluster prototypes and become the coarse centroids; ids 4..7 feed
    // the PQ codebook; queries 0,1 sit near cluster A/B respectively
    def vecA(j: Double) = Array(10.0f, 0f, 0f, 0f, 0f, 0f, 0f, j.toFloat)
    def vecB(j: Double) = Array(0f, 10.0f, 0f, 0f, 0f, j.toFloat, 0f, 0f)
    val rows = Seq(
      0L -> vecA(0.1), 1L -> vecB(0.1),           // queries
      2L -> vecA(0.0), 3L -> vecB(0.0)) ++        // centroids
      (4L to 11L).map(i =>
        if (i % 2 == 0) i -> vecA(0.01 * i) else i -> vecB(0.01 * i))
    val emb = rows.toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      queryMaxId = 2, nCells = 2, nProbe = 1, nSub = 2, subDim = 4,
      nCodes = 4, k = 5)
    val got = r.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    // query 0 probes only cluster A's cell: every neighbor is an A vector
    val aIds = rows.collect { case (id, v) if id >= 2 && v(0) == 10.0f => id }.toSet
    val bIds = rows.collect { case (id, v) if id >= 2 && v(1) == 10.0f => id }.toSet
    assert(got.filter(_._1 == 0L).forall(x => aIds.contains(x._3)), got.toSeq)
    assert(got.filter(_._1 == 1L).forall(x => bIds.contains(x._3)), got.toSeq)
    // dense 1..n ranks with non-decreasing integer distance
    for (qid <- Seq(0L, 1L)) {
      val ranks = got.filter(_._1 == qid).map(_._2).sorted
      assert(ranks === (1 to ranks.length).toArray, s"q$qid ranks: ${ranks.toSeq}")
    }
    val adc = r.select("query_id", "rank", "adc_u")
      .as[(Long, Int, Long)].collect().groupBy(_._1)
    adc.values.foreach { rs =>
      val byRank = rs.sortBy(_._2).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
    // bit-exact determinism under a reshuffle
    val r2 = graft.operators.Similarity.ivfPqTopK(emb.repartition(7),
      "vec_id", "embedding", 2, 2, 1, 2, 4, 4, 5)
    assert(r.exceptAll(r2).count() === 0 && r2.exceptAll(r).count() === 0)
  }

  test("dim audit: exact micro-unit stats per dimension, collapsed flags, " +
      "negative values floor correctly") {
    val spark2 = spark; import spark2.implicits._
    // dim0 constant (dead unit), dim1 spread incl. a negative, dim2
    // near-constant (range 499 micro-units < the 1000 collapse floor)
    val embs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.5f, 2.0f, 0.25f)),
      (3L, Array(0.5f, 3.0f, 0.2505f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.dimAudit(embs, "embedding")
      .as[(Long, Long, Long, Long, Long, Long, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(0L) === ((0L, 3L, 1500000L, 500000L, 500000L, 1L, true)))
    // floor(-1.0 * 1e6) = -1000000 exactly; sum = -1e6 + 2e6 + 3e6
    assert(r(1L) === ((1L, 3L, 4000000L, -1000000L, 3000000L, 3L, false)))
    // 0.2505f widens to ~0.2504999935 -> floors to 250499; range 499
    assert(r(2L) === ((2L, 3L, 750499L, 250000L, 250499L, 2L, true)))
    // partitioning invariance: same exact integers under a reshuffle
    val r2 = Similarity.dimAudit(embs.repartition(7), "embedding")
    assert(Similarity.dimAudit(embs, "embedding").exceptAll(r2).count() === 0)
  }
}

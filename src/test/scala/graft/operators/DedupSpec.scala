package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words entirely unrelated content here now"),
    (5L, "short")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_docs").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 2L))) // docs 1+2 collapse, representative is 1
    assert(r.count(_._2 == 1L) === 3)
  }

  test("ngram jaccard finds exact and near dup pairs, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) === 1.0) // identical => jaccard 1
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("prefix-filtered join equals the brute self-join (lossless pruning)") {
    // a corpus with a hot boilerplate phrase shared by many docs, plus
    // genuine near-dups — the shape where prefix filtering prunes
    val corpus = ((1L to 30L).map(i =>
        (i, s"all rights reserved copyright notice unique token$i body$i tail$i")) ++
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
        (101L, "alpha beta gamma delta epsilon zeta eta iota"),
        (102L, "alpha beta gamma delta epsilon zeta eta theta"))).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val brute = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 3, t)
      val pref = Dedup.prefixFilterJaccardPairs(corpus, "doc_id", "text", 3, t)
      assert(pref.exceptAll(brute).count() === 0, s"extra pairs at t=$t")
      assert(brute.exceptAll(pref).count() === 0, s"missed pairs at t=$t")
    }
    assertThrows[IllegalArgumentException] {
      Dedup.prefixFilterJaccardPairs(corpus, "doc_id", "text", 3, 0.0)
    }
  }

  test("short docs produce no shingles and no pairs") {
    val sh = Dedup.shingleSet(docs.filter($"doc_id" === 5L), "doc_id", "text", 3)
    assert(sh.count() === 0)
  }

  test("shingleSet precondition: unique ids give distinct rows; duplicate " +
      "ids visibly violate it (the documented contract)") {
    // the r11 removal of the trailing .distinct() rests on idCol being a
    // table key: per-doc distinctness comes from WordShingles alone. This
    // gate pins BOTH sides of that contract so a future caller passing a
    // non-keyed frame cannot silently shift Jaccard/containment counts.
    val keyed = Dedup.shingleSet(docs, "doc_id", "text", 3)
    assert(keyed.count() === keyed.distinct().count(),
      "keyed corpus must yield one row per (doc_id, shingle)")
    val dup = docs.unionAll(docs.filter($"doc_id" === 1L)) // id 1 twice
    val viol = Dedup.shingleSet(dup, "doc_id", "text", 3)
    assert(viol.count() > viol.distinct().count(),
      "duplicate ids MUST surface as duplicate rows — if this starts " +
        "passing distinct, the operator re-added a dedup pass and the " +
        "r11 shuffle-removal rationale no longer holds")
  }

  test("chunk dedup drops repeated chunks, keeps first occurrence, reassembles") {
    val d = Seq(
      (1L, "a b c d e f"),   // chunks(3): "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" repeats doc 1 -> dropped
      (3L, "d e f")          // whole doc is a repeat -> empty survivor
    ).toDF("doc_id", "text")
    val r = Dedup.chunkDedup(d, "doc_id", "text", chunkWords = 3)
      .select("doc_id", "n_chunks", "n_kept", "dedup_text")
      .as[(Long, Long, Long, String)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 2L, 2L, "a b c d e f")))
    assert(r(2L) === ((2L, 2L, 1L, "x y z")))
    assert(r(3L) === ((3L, 1L, 0L, "")))
  }

  test("chunk dedup keeps short and partial-tail documents intact") {
    val d = Seq(
      (1L, "only two"),            // single sub-width chunk
      (2L, "one two three four")   // chunk "one two three" + tail "four"
    ).toDF("doc_id", "text")
    val r = Dedup.chunkDedup(d, "doc_id", "text", chunkWords = 3)
      .select("doc_id", "dedup_text").as[(Long, String)].collect().toMap
    assert(r(1L) === "only two")
    assert(r(2L) === "one two three four")
  }

  test("minhash LSH catches exact dups as candidates") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, numHashes = 16, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical docs always share all bands
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash is equal for identical docs, differs for unrelated") {
    val sh = Dedup.simhash(docs, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(4L))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("connected components resolve chained pairs into one cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("doc_a", "doc_b")
    // both paths must agree: driver union-find and distributed propagation
    for (cc <- Seq(
        Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap,
        Dedup.distributedComponents(pairs, 20).as[(Long, Long)].collect().toMap)) {
      assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L && cc(9L) === 1L)
      assert(cc(5L) === 5L && cc(6L) === 5L)
      assert(cc.size === 6) // only pair members are labeled
    }
  }

  test("LSH candidates achieve high recall of truly-similar pairs") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val candidates = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, numHashes = 16, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture must contain planted near-dups")
    val recall = truth.count(candidates.contains).toDouble / truth.size
    assert(recall >= 0.9,
      s"LSH recall $recall too low (16 hashes, 4 bands, jaccard>=0.7 truth)")
  }

  test("LSH-verified pipeline: exact jaccard values on LSH candidates only") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    val verified = Dedup.lshVerifiedJaccardPairs(docs, "doc_id", "text",
      n = 2, numHashes = 16, rowsPerBand = 4, threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // precision is exact: every verified pair carries the true jaccard
    verified.foreach { case (pair, j) => assert(exact(pair) === j) }
    // identical docs share all bands, so the exact dup always survives
    assert(verified.contains((1L, 2L)) && verified((1L, 2L)) === 1.0)
  }

  test("shingle df-cap bounds candidate pairs on a skewed corpus") {
    // 30 docs all sharing a 5-token prefix (2 hot shingles with df=30) but
    // otherwise unique: uncapped, the hot shingles alone make every pair a
    // candidate (C(30,2) join rows per hot shingle); with the cap the hot
    // shingles are dropped and the candidate set collapses to nothing
    val skewed = (1 to 30)
      .map(i => (i.toLong, s"the quick brown fox jumps uniq$i tail$i end$i"))
      .toSeq.toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(skewed, "doc_id", "text",
      n = 3, threshold = 0.1).count()
    val capped = Dedup.ngramJaccardPairs(skewed, "doc_id", "text",
      n = 3, threshold = 0.1, maxShingleDf = 5L).count()
    assert(uncapped === 435L, "every pair shares the hot shingles uncapped")
    assert(capped === 0L, "df-cap must eliminate hot-shingle-only candidates")
  }

  private def unionFindLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(id => id -> find(id)).toMap
  }

  test("large/small-star components match union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val dist = Dedup.distributedComponents(
        edges.toDF("doc_a", "doc_b"), maxIter = 20)
        .as[(Long, Long)].collect().toMap
      assert(dist === unionFindLabels(edges))
    }
  }

  test("components handle empty input and non-integral (string) ids") {
    import org.apache.spark.sql.types._
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))
    assert(Dedup.distributedComponents(emptyPairs, maxIter = 5).count() === 0)
    assert(Dedup.connectedComponents(emptyPairs).count() === 0)
    // string ids take the distributed path (no union-find shortcut) and
    // label by lexicographic min; a self-loop names a singleton node on
    // BOTH paths (union-find keeps it implicitly, star contraction must
    // not silently drop it with the edge)
    val strPairs = Seq(("b", "c"), ("c", "a"), ("x", "y"), ("z", "z"), ("a", "a"))
      .toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(strPairs)
      .as[(String, String)].collect().toMap
    assert(cc("a") === "a" && cc("b") === "a" && cc("c") === "a")
    assert(cc("x") === "x" && cc("y") === "x")
    assert(cc("z") === "z", "self-loop singleton must stay labeled")
    assert(cc.size === 6)
    val intPairs = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    for (m <- Seq(
        Dedup.connectedComponents(intPairs).as[(Long, Long)].collect().toMap,
        Dedup.distributedComponents(intPairs, 5).as[(Long, Long)].collect().toMap))
      assert(m === Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("star contraction converges on a deep chain within few rounds") {
    // a 50-node path has diameter 49: min-label propagation would need 49
    // rounds; large/small-star contraction halves depth every round, so a
    // tight budget suffices and every node lands on the component min
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val cc = Dedup.distributedComponents(chain, maxIter = 10)
      .as[(Long, Long)].collect().toMap
    assert(cc.size === 50 && cc.values.forall(_ === 0L))
  }

  test("embedding near-dup finds the planted duplicate vector") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),    // same direction as 1
      (3L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (4L, Array(0.9f, 0.1f, 0.0f))     // close to 1
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // cos ≈ 0.994
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("bucketed embedding near-dup is a subset of brute force and keeps exact dups") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),    // same direction as 1: same SRP bucket
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.9f, 0.1f, 0.0f))
    ).toDF("vec_id", "embedding")
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val bucketed = Dedup.embeddingNearDupPairsBucketed(
      emb, "vec_id", "embedding", 0.95, planes = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(bucketed.subsetOf(brute),
      "LSH candidates must never add pairs brute force rejects")
    assert(bucketed.contains((1L, 2L)),
      "identical vectors always share every SRP bucket")
  }

  test("incremental dedup classifies batch docs exact/near/novel against the corpus") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog every day"),
      (2L, "completely different corpus content with other words here now")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog every day"), // exact of 1
      (11L, "the quick brown fox jumps over the lazy dog every night"), // near of 1
      (12L, "entirely novel material nothing shared with anything else at all")
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalDedupReport(corpus, batch, "doc_id", "text",
        n = 2, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .select("doc_id", "match_id", "kind")
      .as[(Long, Option[Long], String)].collect().map(x => x._1 -> x).toMap
    assert(r(10L) === ((10L, Some(1L), "exact")))
    assert(r(11L) === ((11L, Some(1L), "near")))
    assert(r(12L) === ((12L, None, "novel")))
    assert(r.size === 3) // one row per batch doc, corpus never reported
  }

  test("bloom-gated incremental dedup equals the unpruned exact join") {
    val corpus = Seq(
      (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma"),   // dup of corpus 1 (min id over 1,3)
      (11L, "eta theta iota"),     // novel
      (12L, "delta epsilon zeta")  // dup of corpus 2
    ).toDF("doc_id", "text")
    val r = Dedup.bloomIncrementalDedup(corpus, batch, "doc_id", "text",
        expectedItems = 16, fpp = 0.01)
      .as[(Long, Option[Long], Boolean)].collect().map(x => x._1 -> x).toMap
    assert(r(10L) === ((10L, Some(1L), true)))
    assert(r(11L) === ((11L, None, false)))
    assert(r(12L) === ((12L, Some(2L), true)))
    assert(r.size === 3)
    // empty corpus: bloom is empty, everything unique — and no crash
    val none = corpus.filter($"doc_id" < 0)
    val allNew = Dedup.bloomIncrementalDedup(none, batch, "doc_id", "text")
      .as[(Long, Option[Long], Boolean)].collect()
    assert(allNew.length === 3 && allNew.forall(x => x._2.isEmpty && !x._3))
  }

  test("incremental dedup: empty corpus means all-novel; empty batch means no rows") {
    val docs = Seq(
      (1L, "some document text with enough words to shingle properly here")
    ).toDF("doc_id", "text")
    val none = docs.filter($"doc_id" < 0)
    val allNovel = Dedup.incrementalDedupReport(none, docs, "doc_id", "text",
      n = 2, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
    assert(allNovel.select("kind").as[String].collect().toSeq === Seq("novel"))
    val empty = Dedup.incrementalDedupReport(docs, none, "doc_id", "text",
      n = 2, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
    assert(empty.count() === 0)
  }

  test("semantic dedup finds within-cell pairs only, a subset of brute force") {
    // two tight clusters around orthogonal directions; centroids = first 2
    // vectors by id, one per cluster, so cells align with the clusters
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.99f, 0.02f, 0.0f)),
      (4L, Array(0.98f, 0.01f, 0.0f)),
      (5L, Array(0.01f, 0.97f, 0.0f)),
      (6L, Array(0.5f, 0.5f, 0.0f)) // between clusters: lands in one cell
    ).toDF("vec_id", "embedding")
    val sem = Dedup.semanticNearDupPairs(emb, "vec_id", "embedding",
      nCells = 2, threshold = 0.95)
    val pairs = sem.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val brute = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(brute),
      "within-cell pairs must never add pairs brute force rejects")
    assert(pairs.contains((1L, 3L)) && pairs.contains((1L, 4L)) &&
      pairs.contains((3L, 4L)), "cluster-1 near-dups missed")
    assert(pairs.contains((2L, 5L)), "cluster-2 near-dup missed")
    assert(!pairs.exists { case (a, b) => a == 6L || b == 6L },
      "the between-clusters vector is no one's 0.95 near-dup")
    // candidate generation must be the cell equi-join, never an unbounded
    // all-pairs product. (The centroid ASSIGNMENT is a broadcast nested
    // loop by design — its small side is the `nCells` centroid table, a
    // size bounded by configuration, not by data.)
    val plan = sem.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"semantic dedup degraded to a cartesian pair join:\n$plan")
    assert(plan.linesIterator.exists(l =>
      (l.contains("SortMergeJoin") || l.contains("HashJoin")) &&
        l.contains("cell")),
      s"pair generation is not an equi-join on the cell id:\n$plan")
  }

  test("tfidfCosinePairs: twins score 1, disjoint docs never pair, cap drops stop terms") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // exact twin of 1
      (3L, "epsilon zeta eta theta"),   // disjoint from 1/2
      (4L, "alpha beta epsilon zeta")   // half-overlaps both groups
    ).toDF("doc_id", "text")
    val pairs = Dedup.tfidfCosinePairs(docs, "doc_id", "text",
        dfCapShare = 1.0, threshold = 0.0)
      .select("doc_a", "doc_b", "cosine")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(pairs((1L, 2L)) - 1.0) < 1e-9, s"twin cosine ${pairs.get((1L, 2L))}")
    assert(!pairs.contains((1L, 3L)), "disjoint docs share no postings")
    assert(pairs((1L, 4L)) > 0.0 && pairs((1L, 4L)) < 1.0)
    // a 25% df-cap (cap = 1 of 4 docs) drops every term appearing twice ->
    // only unique terms left, so no pair shares a term at all
    assert(Dedup.tfidfCosinePairs(docs, "doc_id", "text",
      dfCapShare = 0.25, threshold = 0.0).count() === 0)
  }

  test("simhash hamming pairs: twins at distance 0, disjoint docs filtered") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),  // exact twin
      (3L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashHammingPairs(docs, "doc_id", "text",
        bits = 32, bands = 4, maxHamming = 2)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Int)].collect()
    assert(pairs.contains((1L, 2L, 0)), s"twins must pair at distance 0: ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 2))
    // partition-invariant (integer signatures)
    val again = Dedup.simhashHammingPairs(docs.repartition(5), "doc_id",
        "text", 32, 4, 2)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(again.toSet === pairs.toSet)
    assertThrows[IllegalArgumentException] {
      Dedup.simhashHammingPairs(docs, "doc_id", "text", 32, 4, maxHamming = 4)
    }
  }

  test("idf weighting demotes boilerplate agreement and promotes " +
      "rare-content agreement vs plain jaccard") {
    import spark.implicits._
    val template = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    // 20 template-only docs make the template shingles common (low idf)
    val filler = (100L to 119L).map(i => (i, s"$template filler$i"))
    // A/B share ONLY the template; C/D share a unique passage
    val rare = "quasar pulsar nebula magnetar blazar quark gluon hadron"
    val docs = (filler ++ Seq(
      (1L, s"$template uniqueone"),
      (2L, s"$template uniquetwo"),
      (3L, s"$rare tail3"),
      (4L, s"$rare tail4"))).toDF("doc_id", "text")
    val w = Dedup.weightedJaccardPairs(docs, "doc_id", "text",
        n = 2, numHashes = 16, rowsPerBand = 4, threshold = 0.0)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val plain = Dedup.lshVerifiedJaccardPairs(docs, "doc_id", "text",
        2, 16, 4, 0.0)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(w.contains((1L, 2L)) && w.contains((3L, 4L)))
    // plain jaccard scores the two pairs similarly (similar overlap
    // fractions); idf weighting splits them decisively
    assert(w((3L, 4L)) > w((1L, 2L)),
      s"rare-content pair must outscore the boilerplate pair: $w")
    assert(w((3L, 4L)) - w((1L, 2L)) >
      plain((3L, 4L)) - plain((1L, 2L)) - 0.0001,
      "weighting must widen the gap vs plain jaccard")
    w.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("leak-free split: test membership is exactly the hash split, only " +
      "leaky train/val docs relabel, non-leaky docs keep their split") {
    import spark.implicits._
    val docs = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/documents.parquet")
    val split = Dedup.leakFreeSplit(docs, "doc_id", "text",
        n = 2, numHashes = 16, rowsPerBand = 4, threshold = 0.5)
      .as[(Long, String)].collect().toMap
    assert(split.size === docs.count())
    val base = docs.select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 2) < "cc",
          "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 2) < "e6",
            "val")
          .otherwise("test").as("s"))
      .as[(Long, String)].collect().toMap
    // test set identical to the pure hash split — held-out membership
    // never changes
    assert(split.filter(_._2 == "test").keySet ===
      base.filter(_._2 == "test").keySet)
    // every relabeled doc was train/val, and every leaky one pairs with a
    // test doc at >= 0.5 verified jaccard
    val dropped = split.filter(_._2 == "dropped_leak").keySet
    dropped.foreach(id => assert(base(id) != "test"))
    val pairs = Dedup.lshVerifiedJaccardPairs(docs, "doc_id", "text",
        2, 16, 4, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val expectedLeaky = pairs.flatMap { case (a, b) =>
      (base(a) == "test", base(b) == "test") match {
        case (false, true) => Some(a)
        case (true, false) => Some(b)
        case _ => None
      }
    }.toSet
    assert(dropped === expectedLeaky)
    // everyone else keeps the base label
    (split.keySet -- dropped).foreach(id => assert(split(id) === base(id)))
  }

  test("exact-substring spans are maximal, position-correct, and length-" +
      "gated; disjoint docs emit nothing") {
    import spark.implicits._
    // b embeds a's tokens 2..9 (8 shared tokens) at offset 3; with k=4 and
    // minTokens=6 the maximal span must come back exactly once, not as the
    // individual k-gram matches
    val a = "a0 a1 s0 s1 s2 s3 s4 s5 s6 s7 z0 z1"
    val b = "b0 b1 b2 s0 s1 s2 s3 s4 s5 s6 s7 y0"
    val c = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(d, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.toSet === Set((1L, 2L, 2L, 3L, 8L)),
      s"one maximal span, token-exact positions: ${spans.toSeq}")
    // below the length gate: the same pair with minTokens above the span
    assert(Dedup.exactSubstrSpans(d, "doc_id", "text",
      k = 4, minTokens = 9, maxGramDf = 64).count() === 0)
    // two separate shared spans in one pair stay two rows (different
    // diagonals): e shares a's first 6 tokens AND last 6 tokens, reordered
    val e = "s2 s3 s4 s5 s6 s7 x0 x1 a0 a1 s0 s1 s2 s3"
    val d2 = Seq((1L, a), (4L, e)).toDF("doc_id", "text")
    val spans2 = Dedup.exactSubstrSpans(d2, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans2 === Set((1L, 4L, 4L, 0L, 6L), (1L, 4L, 0L, 8L, 6L)),
      s"independent diagonals stay independent spans: $spans2")
    // determinism under repartitioning
    val r1 = Dedup.exactSubstrSpans(d, "doc_id", "text", 4, 6, 64)
    val r2 = Dedup.exactSubstrSpans(d.repartition(7), "doc_id", "text",
      4, 6, 64)
    assert(r1.exceptAll(r2).count() === 0 && r2.exceptAll(r1).count() === 0)
  }

  test("exact-substring cut merges overlapping intervals — a region " +
      "shared with several earlier docs never double-counts") {
    import spark.implicits._
    // doc3 shares [0,8) with doc1 and [4,12) with doc2 — overlapping
    // intervals must merge to [0,12): n_cut 12, NOT 8+8=16 > n_tokens
    val d = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7"),
      (2L, "t4 t5 t6 t7 t8 t9 ta tb"),
      (3L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 ta tb")
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstrCut(d, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nt, nc, nk) => id -> ((nt, nc, nk)) }.toMap
    // (1,2) share only 4 tokens < minTokens -> doc2 uncut, absent
    assert(r === Map(3L -> (12L, 12L, 0L)),
      s"overlap must merge before counting: $r")
  }

  test("exact-substring apply: cut spans removed from the text, " +
      "earliest/uncut docs verbatim, n_kept consistent with the audit") {
    import spark.implicits._
    val d = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (2L, "w2 w3 w4 w5 w6 w7"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 r0 r1"),
      (4L, "z0 z1 z2 z3 z4 z5")
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstrApply(d, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, String)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L), "one row per input doc")
    assert(r(1L) === ((10L, 10L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")),
      "earliest copy keeps its text verbatim")
    assert(r(2L) === ((6L, 0L, "")), "fully-shared later doc empties")
    assert(r(3L) === ((12L, 2L, "r0 r1")),
      "nested spans merge; only the unshared tail survives")
    assert(r(4L) === ((6L, 6L, "z0 z1 z2 z3 z4 z5")),
      "uncut docs pass through")
    // apply and audit agree on every affected doc
    val cut = Dedup.exactSubstrCut(d, "doc_id", "text", 4, 6, 64)
      .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    cut.foreach { case (id, nCut) =>
      assert(r(id)._1 - r(id)._2 === nCut, s"apply/audit disagree on $id")
    }
    val again = Dedup.exactSubstrApply(d.repartition(7), "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, String)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(again === r)
  }

  test("exact-substring cut: nested and duplicate intervals, lowest doc " +
      "survives untouched") {
    import spark.implicits._
    // doc3 nests doc2's span inside doc1's ([0,10) contains [2,8));
    // doc2 itself is cut by its pair with doc1
    val d = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"),
      (2L, "w2 w3 w4 w5 w6 w7"),
      (3L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 r0 r1")
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstrCut(d, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nt, nc, nk) => id -> ((nt, nc, nk)) }.toMap
    // doc2: whole doc shared with doc1 -> fully cut; doc3: [0,10) u [2,8)
    // merges to [0,10) -> 2 tokens kept; doc1 (lowest id) never cut
    assert(r === Map(2L -> (6L, 6L, 0L), 3L -> (12L, 10L, 2L)),
      s"nested interval must not double-count: $r")
    assert(!r.contains(1L), "the earliest copy keeps its text")
  }

  test("exact-substring cut: adjacent intervals merge into one island " +
      "and invariants hold on the corpus fixture") {
    import spark.implicits._
    // docD's first 6 tokens come from doc1, last 6 from doc2 — adjacent
    // [0,6) + [6,12) merge to one island covering the whole doc
    val d = Seq(
      (1L, "u0 u1 u2 u3 u4 u5 p0 p1"),
      (2L, "v0 v1 v2 v3 v4 v5 q0 q1"),
      (3L, "u0 u1 u2 u3 u4 u5 v0 v1 v2 v3 v4 v5")
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstrCut(d, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nt, nc, nk) => id -> ((nt, nc, nk)) }.toMap
    assert(r === Map(3L -> (12L, 12L, 0L)), s"adjacent spans: $r")
    // invariants on the real table: 0 < n_cut <= n_tokens, n_kept
    // consistent, and every cut doc appears as a doc_b in the span set
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val cut = Dedup.exactSubstrCut(docs, "doc_id", "text",
      k = 8, minTokens = 16, maxGramDf = 256)
    assert(cut.filter(col("n_cut") <= 0 || col("n_cut") > col("n_tokens") ||
      col("n_kept") =!= col("n_tokens") - col("n_cut")).count() === 0)
    val spanBs = Dedup.exactSubstrSpans(docs, "doc_id", "text",
      k = 8, minTokens = 16, maxGramDf = 256).select(col("doc_b"))
    assert(cut.select(col("doc_id")).exceptAll(spanBs.distinct()).count()
      === 0, "every cut doc is some span's later copy")
  }

  test("incremental exact-substring equals the union run restricted to " +
      "cross pairs; corpus never self-joins; empty sides behave") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "s0 s1 s2 s3 s4 s5 s6 s7 a0 a1"),
      (3L, "x0 x1 s0 s1 s2 s3 s4 s5 s6 s7")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "b0 b1 s0 s1 s2 s3 s4 s5 s6 s7"),
      (20L, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9")).toDF("doc_id", "text")
    val inc = Dedup.exactSubstrSpansIncremental(corpus, batch,
      "doc_id", "text", k = 4, minTokens = 6, maxGramDf = 64)
    // defining equivalence: dd38 on the merged corpus, cross pairs only
    // (corpus ids here sort below batch ids, so doc_a is the corpus side)
    val expect = Dedup.exactSubstrSpans(corpus.unionAll(batch),
        "doc_id", "text", k = 4, minTokens = 6, maxGramDf = 64)
      .filter(col("doc_a").isin(1L, 3L) && col("doc_b").isin(10L, 20L))
      .select(col("doc_a").as("corpus_id"), col("doc_b").as("batch_id"),
        col("a_start").as("corpus_start"), col("b_start").as("batch_start"),
        col("len"))
    assert(inc.count() > 0)
    assert(inc.exceptAll(expect).count() === 0 &&
      expect.exceptAll(inc).count() === 0,
      "incremental must equal the union run restricted to cross pairs")
    // the corpus-corpus pair (1,3) shares the same span but must not emit
    assert(inc.filter(col("batch_id").isin(1L, 3L)).count() === 0)
    // df cap counts over the UNION: the span lives in 3 docs, cap 2 kills
    assert(Dedup.exactSubstrSpansIncremental(corpus, batch,
      "doc_id", "text", 4, 6, maxGramDf = 2).count() === 0)
    // empty sides
    assert(Dedup.exactSubstrSpansIncremental(corpus, batch.limit(0),
      "doc_id", "text", 4, 6, 64).count() === 0)
    assert(Dedup.exactSubstrSpansIncremental(corpus.limit(0), batch,
      "doc_id", "text", 4, 6, 64).count() === 0)
  }

  test("exact-substring pair overlap: per-pair merged coverage ppm of " +
      "the later doc, quotation vs near-copy separation") {
    import spark.implicits._
    val d = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7"),
      (2L, "t4 t5 t6 t7 t8 t9 ta tb"),
      (3L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 ta tb")
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstrOverlap(d, "doc_id", "text",
        k = 4, minTokens = 6, maxGramDf = 64)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    // doc3 shares [0,8) with doc1 and [4,12) with doc2 — per PAIR the
    // coverage stays un-merged across pairs: 8/12 each
    assert(r === Map((1L, 3L) -> ((8L, 12L, 666666L)),
      (2L, 3L) -> ((8L, 12L, 666666L))), r)
  }

  test("exact-substring df cap drops hot-gram candidates deterministically") {
    import spark.implicits._
    // the same 6-token span appears in 5 docs -> each gram has df 5;
    // cap 4 suppresses ALL pairs, cap 5 restores all 10
    val span = "s0 s1 s2 s3 s4 s5"
    val d = (1L to 5L).map(i => (i, s"p$i q$i $span t$i"))
      .toDF("doc_id", "text")
    assert(Dedup.exactSubstrSpans(d, "doc_id", "text",
      k = 4, minTokens = 6, maxGramDf = 4).count() === 0)
    assert(Dedup.exactSubstrSpans(d, "doc_id", "text",
      k = 4, minTokens = 6, maxGramDf = 5).count() === 10)
  }

  test("cdcChunkDedup: identical docs fully dup; token counts conserve") {
    import spark.implicits._
    val text = (1 to 120).map(i => s"w${i * 7 % 53}").mkString(" ")
    val d = Seq((1L, text), (2L, text), (3L, "a b c")).toDF("doc_id", "text")
    val r = Dedup.cdcChunkDedup(d, "doc_id", "text", k = 4, divisor = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // doc 2 = doc 1 verbatim: every chunk is a dup, all tokens dup
    val (c1, t1, _, _) = r(1L)
    assert(r(2L) === ((c1, t1, c1, t1)))
    assert(t1 === 120L)
    assert(r(1L)._3 === 0L) // first occurrence is never a dup
    // sub-window doc: one forced whole-doc chunk, unique
    assert(r(3L) === ((1L, 3L, 0L, 0L)))
  }

  test("cdcChunkDedup: boundaries survive a prepend (the anti-dd11 " +
      "property); partition-invariant") {
    import spark.implicits._
    val base = (1 to 150).map(i => s"t${i * 11 % 97}").mkString(" ")
    val d = Seq((1L, base), (2L, "zzz " + base)).toDF("doc_id", "text")
    val r = Dedup.cdcChunkDedup(d, "doc_id", "text", k = 4, divisor = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // every doc-2 chunk after the first doc-1-derived boundary is
    // verbatim a doc-1 chunk: content decides boundaries, so the +1
    // token shift realigns there (fixed-size chunking would share
    // nothing). At most the 1-2 chunks before that point differ.
    val (c2, _, dup2, dupTok2) = r(2L)
    assert(dup2 >= c2 - 2, s"expected >= ${c2 - 2} dup chunks, got $dup2")
    assert(dupTok2 >= 80L, s"shift killed chunk sharing: $dupTok2")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.cdcChunkDedup(df, "doc_id", "text", k = 4, divisor = 8)
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(run(d) === run(d.repartition(5)))
  }

  test("captureRecapture: Chapman estimate, canonicalized pair keys") {
    import spark.implicits._
    // A = {12, 34, 56} (with a reversed+repeated 12 that must collapse),
    // B = {12, 78}: n_a=3, n_b=2, m=1 -> est = 4*3 div 2 - 1 = 5,
    // undetected = 5 - (3+2-1) = 1
    val a = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val b = Seq((2L, 1L), (7L, 8L)).toDF("doc_a", "doc_b")
    val r = Dedup.captureRecapture(a, b)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r === ((3L, 2L, 1L, 5L, 1L)))
  }

  test("captureRecapture: disjoint detectors and empty inputs") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val b = Seq((3L, 4L)).toDF("doc_a", "doc_b")
    // (2*2) div 1 - 1 = 3 estimated, 2 seen -> 1 missed
    assert(Dedup.captureRecapture(a, b)
      .as[(Long, Long, Long, Long, Long)].head() === ((1L, 1L, 0L, 3L, 1L)))
    val e = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.captureRecapture(e, e)
      .as[(Long, Long, Long, Long, Long)].head() === ((0L, 0L, 0L, 0L, 0L)))
  }

  test("property: prefix-filtered join equals the brute self-join on " +
      "random corpora and thresholds") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // small vocabulary forces shared shingles; doc lengths straddle the
    // n=2 shingle boundary so empty-shingle docs are exercised too
    val vocab = Vector("red", "green", "blue", "cyan", "teal")
    val genDocs = for {
      n <- Gen.choose(3, 9)
      texts <- Gen.listOfN(n, Gen.choose(1, 8).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab))))
    } yield texts.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val prop = Prop.forAll(genDocs, Gen.oneOf(0.3, 0.5, 0.7, 0.9)) { (rows, t) =>
      val df = rows.toDF("doc_id", "text")
      val brute = Dedup.ngramJaccardPairs(df, "doc_id", "text", 2, t)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.prefixFilterJaccardPairs(df, "doc_id", "text", 2, t)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      pref == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: banded hamming pairs equal brute-force popcount pairs " +
      "on random corpora (pigeonhole losslessness)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // docs drawn from a 6-word vocabulary so signatures collide at small
    // hamming distances — the regime the pigeonhole claim is about
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val genDocs = for {
      n <- Gen.choose(4, 10)
      texts <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf(vocab)))
    } yield texts.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
    val prop = Prop.forAll(genDocs, Gen.choose(1, 3)) { (rows, maxH) =>
      val df = rows.toDF("doc_id", "text")
      val sigs = Dedup.simhash(df, "doc_id", "text", bits = 16)
        .as[(Long, Long)].collect().toMap
      val brute = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= maxH
      } yield (a, b, java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong)).toSet
      val banded = Dedup.simhashHammingPairs(df, "doc_id", "text",
          bits = 16, bands = 4, maxHamming = maxH)
        .as[(Long, Long, Long)].collect().toSet
      banded == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: exact-substring spans equal a naive token-level reference " +
      "on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny vocabulary + short docs: shared k-gram runs appear often, and
    // the naive O(n^2 * len^2) reference stays cheap
    val vocab = Vector("a", "b", "c")
    val genDocs = for {
      n <- Gen.choose(2, 5)
      texts <- Gen.listOfN(n, Gen.choose(2, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab))))
    } yield texts.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
    val k = 2
    val minTokens = 3
    val prop = Prop.forAll(genDocs) { rows =>
      val df = rows.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      // naive reference: for every doc pair and alignment (diagonal),
      // maximal runs of consecutive equal k-grams, kept at len >= minTokens
      val naive = (for {
        (ida, ta) <- rows; (idb, tb) <- rows if ida < idb
        diag <- (-(tb.length - k)) to (ta.length - k)
      } yield {
        val matches = (math.max(0, diag) to
            math.min(ta.length - k, tb.length - k + diag))
          .filter(pa => ta.slice(pa, pa + k) == tb.slice(pa - diag, pa - diag + k))
        // islands: group consecutive pa into maximal runs
        matches.foldLeft(List.empty[(Int, Int)]) { // (start, lastPa)
          case ((s, last) :: rest, pa) if pa == last + 1 => (s, pa) :: rest
          case (acc, pa) => (pa, pa) :: acc
        }.map { case (s, last) => (ida, idb, s.toLong,
          (s - diag).toLong, (last - s + k).toLong) }
      }).flatten.filter(_._5 >= minTokens).toSet
      val spans = Dedup.exactSubstrSpans(df, "doc_id", "text",
          k = k, minTokens = minTokens, maxGramDf = 1000L)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      spans == naive
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

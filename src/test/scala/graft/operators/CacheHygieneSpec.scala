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

  test("frontier-iteration ops release every per-call cache; the shared " +
      "edge frame is PlanPersist-owned and freed by clearAll") {
    // r11: the cleaned edge list moved from a per-call reroot to a
    // PlanPersist entry shared across frontier ops walking the same
    // graph (g10/g12/g13), so after a call exactly that ONE entry may
    // outlive it — and clearAll must free it (the standalone-leaves-
    // nothing contract the dedup family already carries).
    def frontierLeavesOnlySharedEdges(name: String)(run: => DataFrame): Unit = {
      LruFrameCache.clearAll()
      spark.catalog.clearCache()
      val base = persisted()
      val result = run
      result.count()
      result.unpersist(true)
      assert(persisted() <= base + 1,
        s"$name may keep only the shared PlanPersist edge frame alive " +
          s"(baseline $base, after ${persisted()})")
      LruFrameCache.clearAll()
      assert(persisted() <= base,
        s"$name left ${persisted() - base} persistent RDD(s) after " +
          "clearAll — an internal cache escaped both the per-call " +
          "release and the house LRU")
    }
    frontierLeavesOnlySharedEdges("bfsLevels") {
      Graph.bfsLevels(edges, "a", "b", seeds, "s", maxHops = 4)
    }
    frontierLeavesOnlySharedEdges("harmonicCentrality") {
      Graph.harmonicCentrality(edges, "a", "b", seeds, "s", maxHops = 4)
    }
    frontierLeavesOnlySharedEdges("betweennessCentrality") {
      Graph.betweennessCentrality(edges, "a", "b", seeds, "s", maxHops = 4)
    }
    // sharing: two frontier ops over the SAME edge plan reuse one entry
    locally {
      LruFrameCache.clearAll()
      val base = persisted()
      Graph.bfsLevels(edges, "a", "b", seeds, "s", maxHops = 2)
        .unpersist(true)
      val afterFirst = persisted()
      Graph.harmonicCentrality(edges, "a", "b", seeds, "s", maxHops = 2)
        .unpersist(true)
      assert(persisted() <= afterFirst,
        "a second frontier op over the same edge plan must hit the " +
          "shared PlanPersist entry, not persist a second edge frame")
      LruFrameCache.clearAll()
      assert(persisted() <= base)
    }
  }

  // ---- FrameRelease: the checkpoint-aware release discipline ----------
  //
  // Dataset.unpersist only clears CacheManager entries (persist()-backed
  // frames). A localCheckpoint-backed frame persists its RDD directly —
  // unpersist on it is a silent NO-OP, which is exactly how the round-8
  // "release the superseded checkpoint" fix shipped dead code. These
  // gates pin the real semantics so the defect class cannot return.

  /** The checkpoint's backing RDD id — registry membership by ID is
    * flake-proof against the async ContextCleaner touching OTHER entries,
    * where raw registry counts are not. */
  private def ckptRddId(df: DataFrame): Int =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      case other => fail(s"expected a LogicalRDD root, got $other")
    }
  private def registered(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.contains(id)

  test("Dataset.unpersist is a no-op on a localCheckpointed frame; " +
      "FrameRelease.release actually frees it") {
    val ck = spark.range(0, 100).toDF("id").localCheckpoint(true)
    val id = ckptRddId(ck)
    assert(registered(id),
      "localCheckpoint(true) should register a persisted RDD")
    ck.unpersist(true)
    assert(registered(id),
      "if plain unpersist ever starts working on checkpoints, the " +
        "FrameRelease indirection can be retired — update this gate")
    graft.FrameRelease.release(ck)
    assert(!registered(id),
      "FrameRelease must unpersist the checkpoint's backing RDD")
  }

  test("FrameRelease leaves a DERIVED frame's parent checkpoint alone " +
      "and tolerates null / plain frames") {
    val ck = spark.range(0, 100).toDF("id").localCheckpoint(true)
    val id = ckptRddId(ck)
    val derived = ck.filter($"id" % 2 === 0)
    graft.FrameRelease.release(derived) // root is Filter, not LogicalRDD
    assert(registered(id) && derived.count() == 50L,
      "releasing a derived frame must not kill its parent's blocks")
    graft.FrameRelease.release(null)
    graft.FrameRelease.release(spark.range(3).toDF("id")) // un-materialized
    graft.FrameRelease.release(ck)
    assert(!registered(id))
  }

  test("iterative checkpoint loops release every superseded round") {
    // distributedComponents: one localCheckpoint per star-contraction
    // round; ALL round checkpoints (including the final one) release
    // before return — the result is itself an EAGER checkpoint whose
    // lineage no longer references any round frame (a persist-backed
    // result would keep the released final checkpoint in its recompute
    // lineage — a lost cached partition would then throw
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Callers free it through
    // FrameRelease like every other materialized operator result.
    locally {
      val base = persisted()
      val pairs = (1L to 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      val labels = Dedup.distributedComponents(pairs, maxIter = 20)
      assert(labels.count() == 41L)
      assert(persisted() <= base + 1,
        "a 40-node chain runs several contraction rounds; superseded " +
          "round checkpoints must be released eagerly")
      assert(ckptRddId(labels) >= 0,
        "labels must be lineage-free (LogicalRDD root): a lazy plan over " +
          "the released final round's checkpoint dies on block loss")
      graft.FrameRelease.release(labels)
      assert(persisted() <= base,
        "releasing the labels frame must leave no round residue")
    }
    // trainKMeans: one checkpoint per round; final centroids remain
    locally {
      val base = persisted()
      val corpus = (0L until 32L)
        .map(i => (i, Array.fill(4)((i % 7).toFloat)))
        .toDF("id", "v")
      val cents = Similarity.trainKMeans(corpus, "id", "v", k = 3, iters = 4)
      cents.count()
      assert(persisted() <= base + 1,
        "4 k-means rounds must leave at most the final centroid checkpoint")
      graft.FrameRelease.release(cents)
      assert(persisted() <= base)
    }
  }

  test("LruFrameCache eviction and clearAll free checkpoint-backed entries") {
    val cache = new LruFrameCache(maxEntries = 1)
    def ck(n: Int) = spark.range(0, n.toLong).toDF("id").localCheckpoint(true)
    val first = cache.getOrElseUpdate(("s", "a", "p"), ck(10))
    val second = cache.getOrElseUpdate(("s", "b", "p"), ck(20)) // evicts first
    assert(!registered(ckptRddId(first)),
      "eviction must release the evicted entry's checkpoint blocks")
    assert(registered(ckptRddId(second)))
    LruFrameCache.clearAll()
    assert(!registered(ckptRddId(second)),
      "clearAll must flush every registered cache and free its frames")
    // a cleared cache rebuilds on the next request (no dead-frame hits)
    val rebuilt = cache.getOrElseUpdate(("s", "b", "p"), ck(20))
    assert(rebuilt.count() == 20L)
    cache.clear()
  }

  test("debug tombstones attribute a held-past-eviction frame touch to " +
      "the evicting memo key") {
    // the defect this gates: a consumer HOLDS a frame returned by
    // getOrElseUpdate, the session then touches maxEntries further
    // distinct configs, and the held frame's checkpoint blocks are
    // destroyed by the eviction — the later touch dies deep in execution
    // with a storage error that names an RDD id, not the memo that freed
    // it. Debug mode turns that into an attributable tombstone.
    val prevDebug = LruFrameCache.debug
    LruFrameCache.debug = true
    try {
      val cache = new LruFrameCache(maxEntries = 1)
      def ck(n: Int) =
        spark.range(0, n.toLong).toDF("id").localCheckpoint(true)
      val held = cache.getOrElseUpdate(("s", "corpusA", "cfg"), ck(10))
      assert(LruFrameCache.evictionTombstone(held).isEmpty,
        "a live entry has no tombstone")
      cache.getOrElseUpdate(("s", "corpusB", "cfg"), ck(20)) // evicts held
      assert(!registered(ckptRddId(held)))
      val tomb = LruFrameCache.evictionTombstone(held)
      assert(tomb.exists(_.contains("corpusA")),
        s"the tombstone must name the evicted key, got $tomb")
      // the touch itself fails loudly (blocks are gone, lineage truncated)
      val thrown = intercept[Exception] { held.count() }
      assert(LruFrameCache.evictionTombstone(held).isDefined,
        s"after ${thrown.getClass.getSimpleName} the tombstone still " +
          "attributes the dead frame")
      // eviction-then-REQUEST (not hold) stays correct: recomputes fresh
      val fresh = cache.getOrElseUpdate(("s", "corpusA", "cfg"), ck(10))
      assert(fresh.count() == 10L &&
        LruFrameCache.evictionTombstone(fresh).isEmpty)
      cache.clear()
    } finally LruFrameCache.debug = prevDebug
  }

  test("PlanPersist-routed intra-operator persists are memoized, bounded, " +
      "and fully released by clearAll (no caller-cleanup contract)") {
    // the round-10 debt class: exactSubstrSpans / bandedHammingPairs /
    // minhashLshPairs persisted shared subtrees raw, relying on a
    // documented "callers should clearCache()" contract — as a library
    // call each distinct corpus pinned a corpus-token-sized entry until
    // a harness-level blanket flush. Routed through PlanPersist, a
    // standalone call leaves ZERO persistent RDDs after clearAll.
    val docs = (1L to 30L).map(i =>
        (i, s"alpha beta gamma delta epsilon tok$i zeta eta theta iota"))
      .toDF("doc_id", "text")
    def standaloneLeavesNothing(name: String)(run: => DataFrame): Unit = {
      LruFrameCache.clearAll()
      spark.catalog.clearCache()
      val base = persisted()
      run.count()
      assert(persisted() > base,
        s"$name should persist its shared subtree while live")
      LruFrameCache.clearAll()
      assert(persisted() <= base,
        s"$name left ${persisted() - base} persistent RDD(s) after " +
          "clearAll — its intra-op persist escaped the house cache")
    }
    standaloneLeavesNothing("exactSubstrSpans") {
      Dedup.exactSubstrSpans(docs, "doc_id", "text",
        k = 3, minTokens = 3, maxGramDf = 50)
    }
    standaloneLeavesNothing("simhashHammingPairs") {
      Dedup.simhashHammingPairs(docs, "doc_id", "text",
        bits = 60, bands = 4, maxHamming = 3)
    }
    standaloneLeavesNothing("minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 12, rowsPerBand = 3)
    }
    // round-11 sweep: every remaining returned-lifetime intra-operator
    // persist was routed through PlanPersist — one representative per
    // family gates the discipline
    standaloneLeavesNothing("ngramJaccardPairs") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3,
        threshold = 0.1)
    }
    standaloneLeavesNothing("chunkDedup") {
      Dedup.chunkDedup(docs, "doc_id", "text", chunkWords = 4)
    }
    standaloneLeavesNothing("tfidfCosinePairs") {
      Dedup.tfidfCosinePairs(docs, "doc_id", "text", dfCapShare = 1.0,
        threshold = 0.1)
    }
    standaloneLeavesNothing("knBigramNll") {
      LanguageModel.knBigramNll(docs, "doc_id", "text")
    }
    standaloneLeavesNothing("curate") {
      CurationPipeline.curate(
        docs.withColumn("src",
          org.apache.spark.sql.functions.lit("s0")),
        "doc_id", "text", "src", minTokens = 1, cap = 100)
    }
    // memoization: a repeated call on the same input reuses ONE entry
    // (same session + tag + semantic plan hash), not one per call
    LruFrameCache.clearAll()
    val base = persisted()
    Dedup.exactSubstrSpans(docs, "doc_id", "text", 3, 3, 50).count()
    val afterFirst = persisted()
    Dedup.exactSubstrSpans(docs, "doc_id", "text", 3, 3, 50).count()
    assert(persisted() === afterFirst,
      "a repeated identical call must hit the PlanPersist memo, not " +
        "persist a second copy")
    LruFrameCache.clearAll()
    assert(persisted() <= base)
  }

  test("SessionKey is stable per session, unique across sessions, and " +
      "memo keys built from it cannot alias") {
    // the round-9 keying used identityHashCode(session): a GC'd
    // session's address can be REUSED by a new session, silently serving
    // it a dead session's memoized frame. A per-instance UUID cannot
    // collide; stability makes repeated lookups hit.
    val k1 = graft.SessionKey(spark)
    assert(graft.SessionKey(spark) === k1, "same session, same key")
    val other = spark.newSession()
    val k2 = graft.SessionKey(other)
    assert(k2 !== k1, "distinct session instances must never share a key")
    assert(graft.SessionKey(other) === k2)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph operators over edge-list DataFrames.
  *
  * The reference's only graph is the FK dependency graph it topologically
  * sorts on the driver (`/root/reference/osarchiver/source/db.py:187-214`) —
  * small enough to collect. These operators cover the other regime a
  * training-data pipeline hits: graphs whose EDGE LIST is itself data-scale
  * (similarity edges between documents, entity co-occurrence), where every
  * step must stay a distributed join/aggregation.
  */
object Graph {

  /** Persist bookkeeping shared by the frontier-iteration family
    * ([[bfsLevels]] / [[harmonicCentrality]] / [[betweennessCentrality]]):
    * `reroot` persists + counts + lineage-reroots a per-round frame
    * (count kept in `lastCount` for the loop-exit test); `rerootLazy`
    * skips the count for frames with no loop-exit test; `settle` folds
    * the ONE cumulative settled frame with deferred two-generation
    * release, so peak cache stays ~3x the settled set rather than h
    * copies and no settle pays a count job;
    * `unpersistAll` releases every tracked cache at the end (eager drops
    * re-appear here — double unpersist is a no-op). */
  private final class FrontierCaches {
    private val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private var prevSettled: DataFrame = null
    private var olderSettled: DataFrame = null
    var lastCount: Long = -1L
    def reroot(df: DataFrame): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      lastCount = cached.count()
      caches += cached
      df.sparkSession.createDataFrame(cached.rdd, cached.schema)
    }
    /** Persist + lineage-reroot WITHOUT an eager count — for frames that
      * need no loop-exit count and are materialized by their first
      * consumer anyway (the betweenness backward phase): each eager
      * count was one extra job per hop, pure scheduling overhead on a
      * 2*maxHops-round operator (r12; the r11 scaling block measured the
      * per-job floor, not the operators, dominating these queries). */
    def rerootLazy(df: DataFrame): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      caches += cached
      df.sparkSession.createDataFrame(cached.rdd, cached.schema)
    }
    /** Fold of the ONE cumulative settled frame. No eager count (r12):
      * the frame is materialized as a side effect of the NEXT hop's
      * reroot count (the anti-join reads it in full), so the count here
      * was one redundant job per hop. Unpersist of the superseded copy
      * is therefore DEFERRED one generation — settle(n) drops
      * settled(n-2), whose successor settled(n-1) was materialized by
      * the intervening reroot; dropping settled(n-1) here instead would
      * force the not-yet-materialized settled(n) to recompute its whole
      * union lineage on first touch. Peak cache is ~3x the settled set
      * (was 2x) — still constant in the hop count. */
    def settle(df: DataFrame): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      caches += cached
      if (olderSettled != null) olderSettled.unpersist(false)
      olderSettled = prevSettled
      prevSettled = cached
      df.sparkSession.createDataFrame(cached.rdd, cached.schema)
    }
    def unpersistAll(): Unit = caches.foreach(_.unpersist(false))
  }

  /** The cleaned (src, dst) edge frame the frontier family iterates
    * over: self-loops dropped, distinct, plan-keyed-persisted. One
    * PlanPersist entry serves every frontier op fed the same edge plan
    * (g10's BFS, g12's harmonic and g13's betweenness all walk the same
    * kNN graph), where the old per-call reroot built three identical
    * caches and paid three distinct shuffles. Lifetime is the house LRU
    * discipline: LruFrameCache.clearAll releases it; eviction under
    * pressure recomputes on next touch. */
  private def frontierEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    PlanPersist("graph.frontierEdges", edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src") =!= col("dst")).distinct())

  /** Fixed-iteration PageRank carried in integer micro-units.
    *
    * Ranks live as BIGINT micro-units (`Unit1` = rank 1.0) and every
    * per-edge contribution is an integral division, so the per-node sum is
    * order-independent — the result is bit-identical on any partitioning,
    * any engine (the DuckDB oracle reproduces it exactly). A production
    * float variant just drops the quantization; the plan shape is the same.
    *
    * Variant notes (both sides implement the same one): teleport term
    * `(1-d)/N`, no dangling-mass redistribution (a node without out-edges
    * leaks its damped mass), weighted edges normalized by the source's
    * total out-weight.
    *
    * Scale shape: the edge list is materialized ONCE (with out-weights
    * pre-joined) and persisted; each iteration is then
    * `join(ranks) -> groupBy(dst)` — a shuffle bounded by |V| on the rank
    * side while the heavy |E| side keeps its partitioning. Ranks are tiny
    * (|V| rows) so the per-iteration join broadcasts them. On a real
    * cluster, checkpoint every ~5 iterations to truncate lineage.
    *
    * Overflow guard: `r * w` with r <= Unit1 requires max edge weight
    * below ~9e6 for Long; `require`d so a bigger corpus fails loudly
    * rather than wrapping.
    */
  /** `seeds`: when set, runs PERSONALIZED PageRank (random walk with
    * restart): the teleport mass lands only on the seed set — uniform
    * `(1-d)/|S|` per seed, zero elsewhere — and the walk starts at the
    * seeds (`1/|S|` each). Ranks then measure proximity TO THE SEEDS,
    * the similar-item / related-entity discovery primitive (Page et al.
    * 1999 §6 personalized vector; the PPR of Jeh & Widom 2003). Seeds
    * not present in the graph are ignored; at least one must remain.
    * Unreachable nodes publish exact rank 0. The `None` path is plain
    * PageRank, bit-identical to the pre-seed implementation. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, dampingPct: Int = 85,
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iterations >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val spark = edges.sparkSession
    // materialize the (aggregated) edge list FIRST: nodes, max-weight and
    // out-weights all derive from it, and without the cache each would
    // re-run the caller's upstream plan (often a fact-table join) from
    // scratch — measured 3 full rebuilds on the nation trade graph
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    val unit1 = 1000000000000L
    val maxW = e0.agg(max(col("w"))).head().getLong(0)
    require(maxW < Long.MaxValue / unit1,
      s"edge weight $maxW would overflow rank arithmetic")
    val outW = e0.groupBy("src").agg(sum(col("w")).as("out_w"))
    val e = e0.join(outW, "src").persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize once; every iteration reuses the same blocks
    e0.unpersist(false)
    // seed frame (personalized mode): distinct seeds restricted to graph
    // nodes; tiny (broadcast in every use)
    val seedF = seeds.map { sd =>
      sd.select(col(sd.columns.head).as("node")).distinct()
        .join(nodes, Seq("node"), "left_semi")
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val nSeed = seedF.map(_.count()).getOrElse(0L)
    seeds.foreach(_ => require(nSeed > 0,
      "personalized PageRank needs at least one seed present in the graph"))
    val teleBase = unit1 * (100 - dampingPct) / 100
    val teleport = teleBase / n
    var ranks = seedF match {
      case None => nodes.select(col("node"), lit(unit1 / n).as("r"))
      case Some(sf) => nodes
        .join(broadcast(sf.withColumn("is_seed", lit(true))), Seq("node"), "left")
        .select(col("node"),
          when(col("is_seed"), lit(unit1 / nSeed)).otherwise(lit(0L)).as("r"))
    }
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(broadcast(ranks.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node"))
        // integral DIV per edge keeps the sum order-independent
        .agg(sum(expr("r * w DIV out_w")).as("s"))
      // NO per-iteration persist: each iteration's subtree is referenced
      // exactly once (ranks_k lives only inside contrib_{k+1}'s broadcast),
      // so the nested broadcast builds execute every e-join once and total
      // work is already linear in the iteration count. Persisting each
      // tiny rank frame was measured 10x SLOWER: cached plans keep their
      // pre-AQE shuffle partitioning (canChangeCachedPlanOutputPartitioning
      // is off by default), so every iteration became a 32-task scan over
      // 32 near-empty cached blocks instead of one AQE-coalesced task.
      // (On a many-iteration production run, checkpoint() every ~10 rounds
      // to truncate lineage — persist still isn't the tool here.)
      val damped = expr(s"coalesce(s, 0L) * $dampingPct DIV 100")
      ranks = seedF match {
        case None => nodes
          .join(broadcast(contrib), Seq("node"), "left")
          .select(col("node"), (lit(teleport) + damped).as("r"))
        case Some(sf) => nodes
          .join(broadcast(contrib), Seq("node"), "left")
          .join(broadcast(sf.withColumn("is_seed", lit(true))),
            Seq("node"), "left")
          .select(col("node"),
            (when(col("is_seed"), lit(teleBase / nSeed)).otherwise(lit(0L))
              + damped).as("r"))
      }
    }
    // Materialize the FINAL ranks (one job pulls the whole broadcast
    // chain), then release the upstream caches — a long-lived session
    // calling over distinct graphs must not accumulate entries. The final
    // frame stays persisted (callers typically reuse it).
    val result = ranks.select(col("node"), col("r").as("rank_u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    nodes.unpersist(false)
    e.unpersist(false)
    seedF.foreach(_.unpersist(false))
    result
  }

  /** Triangle count per node over an UNDIRECTED graph given as canonical
    * (a < b) edge pairs. Classic two-join motif counting: for each wedge
    * (a<b, b<c) probe the closing edge (a, c); every triangle is found
    * exactly once in its canonical orientation, then credited to all three
    * corners. Scale shape: two equi-joins on node ids — shuffle-partitioned
    * by join key, no Cartesian anywhere; at 100 TB the standard
    * degree-ordering trick (orient edges low-degree -> high-degree) bounds
    * the wedge fan-out and drops in here without changing the contract.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // persist the canonical list: it feeds all THREE join legs (e1/e2/e3),
    // and without the cache the caller's upstream plan (often an LSH
    // candidate join) re-runs once per leg — measured 4.6x on the document
    // similarity graph. Same discipline as triangleCountsDegree's oriented
    // list: materialize counts, then release the edge cache.
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct() // canonicalize; drop self-loops
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val result = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    e.unpersist(false)
    result
  }

  /** k-core decomposition by iterative peeling: repeatedly delete nodes
    * whose degree (within the surviving subgraph) is below `k`; what
    * remains after convergence is the k-core — in a near-dup candidate
    * graph, the tightly inter-duplicated boilerplate clusters that survive
    * even after their loosely-attached neighbors are peeled away.
    *
    * Runs AT MOST `rounds` peel iterations, exiting early once the alive
    * set stops shrinking (an unchanged count under monotone peeling IS the
    * fixpoint, so the early exit never changes the output — it only skips
    * rounds that would be no-op passes over |E|). Deterministic and
    * oracle-able by unrolling the same rounds as chained CTEs; `rounds`
    * >= the graph's peel depth reaches the true fixpoint — peel depth is
    * bounded by the degeneracy, tiny for real dup graphs. Each round is one pass over
    * the persisted edge list semi-joined against the eagerly-materialized
    * surviving-node set, then a degree aggregation: O(rounds * |E|) total,
    * every step an equi-join/aggregation on node ids — no Cartesian, no
    * driver-side graph. The alive set is materialized per round AND its
    * logical lineage is cut (re-rooted as a LogicalRDD leaf over the
    * cached data): it is referenced by BOTH endpoint joins, so keeping
    * lineage would double the analyzed plan every round — 2^rounds copies
    * of the caller's upstream plan by the end, which melts Catalyst
    * analysis long before any data is touched. (The same re-rooting trick
    * GraphFrames-style iterative algorithms use; on a cluster that must
    * survive executor loss, swap the wrapper for checkpoint().)
    *
    * Output: (node, core_degree) for k-core members — core_degree is the
    * node's degree within the core (>= k by construction).
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val spark = edges.sparkSession
    // materialize + cut lineage: later plans see a leaf, not the subtree
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var lastCount = -1L
    def reroot(df: DataFrame): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      lastCount = cached.count()
      caches += cached
      spark.createDataFrame(cached.rdd, cached.schema)
    }
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    // both directions once: degree = out-degree in the doubled list
    val und = reroot(e.union(e.select(col("b").as("a"), col("a").as("b"))))
    var alive = reroot(und.select(col("a").as("node")).distinct())
    // Convergence early-exit: peeling is monotone (alive' ⊆ alive), so an
    // unchanged count means an unchanged SET means the fixpoint — every
    // remaining round would be a no-op pass over |E|. The count compare is
    // free (reroot already pays a count() to materialize), so `rounds`
    // becomes an upper bound rather than a paid-in-full budget; output is
    // identical either way (GraphSpec's brute-peel property covers this).
    var aliveCount = lastCount
    var converged = false
    var round = 0
    while (round < rounds && !converged) {
      round += 1
      alive = reroot(und
        .join(alive.withColumnRenamed("node", "a"), "a")
        .join(alive.select(col("node").as("b")), "b")
        .groupBy(col("a").as("node")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("node"))
      converged = lastCount == aliveCount
      aliveCount = lastCount
    }
    val core = und
      .join(alive.withColumnRenamed("node", "a"), "a")
      .join(alive.select(col("node").as("b")), "b")
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("core_degree"))
    val result = core.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    caches.foreach(_.unpersist(false))
    result
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007) over an UNDIRECTED edge list: every node starts in its own
    * community (label = node id); each round a node adopts the label most
    * frequent among its neighbors plus itself, ties broken by the
    * SMALLEST label — a deterministic total rule, so the result is
    * engine- and partitioning-exact and the oracle can unroll the rounds
    * as chained CTEs. On a near-dup candidate graph the communities after
    * a few rounds are the boilerplate families (tighter than connected
    * components, which merge everything reachable).
    *
    * Synchronous LPA can oscillate on bipartite structures; the FIXED
    * `rounds` budget makes the output well-defined regardless (the
    * async/randomized variant converges but is not reproducible — wrong
    * trade for a data-pipeline audit).
    *
    * Scale shape: per round one equi-join of the doubled edge list
    * against the |V|-row label frame plus a two-level (node,label) count
    * — the same bounded-join/agg discipline as [[kCore]], with the same
    * per-round lineage re-rooting (labels feed the next round twice; an
    * uncut plan doubles every round).
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1)
    val spark = edges.sparkSession
    val caches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def reroot(df: DataFrame): DataFrame = {
      val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
      cached.count()
      caches += cached
      spark.createDataFrame(cached.rdd, cached.schema)
    }
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    val und = reroot(e.union(e.select(col("b").as("a"), col("a").as("b"))))
    var labels = reroot(und.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    for (_ <- 1 to rounds) {
      val votes = und
        .join(labels.select(col("node").as("b"), col("lbl")), "b")
        .select(col("a").as("node"), col("lbl"))
        .unionByName(labels.select("node", "lbl")) // self-vote
      labels = reroot(votes
        .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
        .groupBy("node")
        // min over (-count, label) = highest count, then smallest label
        .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("m"))
        .select(col("node"), col("m.lbl").as("lbl")))
    }
    val result = labels.select(col("node"), col("lbl").as("community"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    caches.foreach(_.unpersist(false))
    result
  }

  /** Degree-ordered triangle counting — the skew-proof scale path.
    *
    * [[triangleCounts]] builds wedges at the id-canonical low endpoint: a
    * hub of degree d (a boilerplate near-dup cluster, a celebrity node)
    * generates O(d²) wedge rows in one partition. Orienting every edge
    * from its lower-(degree, id) endpoint to the higher one caps each
    * node's out-degree at O(sqrt(|E|)) (a node of degree d only points to
    * neighbors of degree >= d, and there are at most 2·sqrt(|E|) nodes of
    * degree >= sqrt(|E|)), so wedge fan-out is bounded by |E|^1.5 total
    * REGARDLESS of skew — the classic Suri-Vassilvitskii / Schank bound.
    * Same contract and bit-identical output as [[triangleCounts]]; the
    * plan is still degrees + two equi-joins, no Cartesian anywhere.
    */
  def triangleCountsDegree(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
      .select(col("a").as("node"), col("d"))
    // orient each edge toward the higher-(degree, id) endpoint; carry the
    // destination's rank so wedges can be ordered by rank, matching the
    // orientation of the closing edge
    // persist: the oriented list feeds BOTH wedge legs and the closing-
    // edge probe; without the cache the whole upstream plan (often an
    // LSH candidate join) runs three times
    val o = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .filter(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("a").as("u"), col("b").as("v"),
        col("db").as("dv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = o.as("e1").join(o.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") ||
            (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v"))))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val tri = wedges.join(o.as("e3"),
        col("e3.u") === col("y") && col("e3.v") === col("z"))
      .select(col("x"), col("y"), col("z"))
    // materialize the counts so the oriented list can be released here —
    // otherwise each call over a distinct graph leaks its cache entry in a
    // long-lived session (the pageRankInt/kCore discipline)
    val result = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    o.unpersist(false)
    result
  }

  /** Neighborhood link prediction: for every non-adjacent node pair that
    * shares at least one neighbor, the common-neighbor count and the
    * Resource Allocation index (Zhou, Lu, Zhang 2009) — the sum over
    * common neighbors c of 1/deg(c), which down-weights evidence routed
    * through hubs. In a dedup pipeline this surfaces document pairs the
    * LSH candidate graph MISSED but whose shared near-dup neighborhoods
    * say should have been candidates (band-boundary false negatives).
    *
    * Determinism: the RA score is carried in integer micro-units
    * (`1_000_000 / deg(c)` with integral division, summed as BIGINT), so
    * the aggregate is order-independent and engine-exact — no float sums.
    *
    * Scale shape: degrees are one aggregation; wedge enumeration is one
    * self-equi-join on the center node; the existing-edge subtraction is a
    * left-anti join. Wedge fan-out through a center of degree d is d^2/2,
    * so centers above `maxCenterDegree` are excluded from evidence —
    * the standard hub cap (a stop-word-like shingle hub contributes ~0 RA
    * mass anyway: 1e6/d rounds toward 0). That bounds the join output by
    * |V| * cap^2 / 2 regardless of skew; the cap is part of the operator's
    * contract and the oracle mirrors it.
    */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
      maxCenterDegree: Int = 64, topK: Int = 100): DataFrame = {
    require(maxCenterDegree >= 1 && topK >= 1)
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
    val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
      .select(col("a").as("c"), col("d"))
    // centers: nodes allowed to contribute wedge evidence, with their
    // integral RA mass precomputed once per center
    // floor(1e6/d) == integral division for d <= the degree cap (the fp
    // quotient is > 1/d away from any integer boundary, far above ulp)
    val centers = deg.filter(col("d") <= maxCenterDegree)
      .select(col("c"),
        floor(lit(1000000.0) / col("d")).cast("long").as("ra_micro"))
    val byCenter = und.select(col("b").as("c"), col("a").as("x"))
      .join(centers, "c")
    val wedges = byCenter.as("l").join(byCenter.as("r"),
        col("l.c") === col("r.c") && col("l.x") < col("r.x"))
      .select(col("l.x").as("a"), col("r.x").as("b"),
        col("l.ra_micro").as("ra_micro"))
    val scored = wedges
      .join(e, Seq("a", "b"), "left_anti")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("ra_micro")).as("ra_score_micro"))
    val result = scored
      .orderBy(col("common_neighbors").desc, col("ra_score_micro").desc,
        col("a"), col("b"))
      .limit(topK)
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    e.unpersist(false)
    result
  }

  /** Bipartite projection with a hub cap — the co-occurrence graph
    * builder (users x event types -> "types that share audiences",
    * docs x entities -> entity co-mention): two right-nodes are linked
    * with weight = number of DISTINCT left-nodes adjacent to both.
    *
    * The scale hazard is the projection's quadratic fan-out: one
    * left-node of degree d emits d*(d-1)/2 pairs, so a single hub (a
    * user who touches everything, a stopword-like entity) can dominate
    * the whole join. [[linkPrediction]]'s discipline applies: left-nodes
    * above `maxLeftDegree` are EXCLUDED from evidence (their
    * co-occurrence signal is near-uniform noise anyway — the tf-idf
    * argument), bounding output by |L| * cap^2 / 2 regardless of skew.
    * The cap is part of the contract; right-degrees are counted over the
    * same capped universe so the overlap coefficient stays internally
    * consistent.
    *
    * Output per co-occurring pair (a < b): (node_a, node_b, n_shared,
    * deg_a, deg_b, overlap_ppm) with overlap_ppm = n_shared * 1e6 div
    * min(deg_a, deg_b) — the Szymkiewicz-Simpson overlap coefficient in
    * exact integer ppm. Shuffles: one distinct, one degree agg, one
    * self-equi-join on the left key, one pair reduce — no Cartesian. */
  def bipartiteProject(edges: DataFrame, leftCol: String,
      rightCol: String, maxLeftDegree: Int = 64): DataFrame = {
    require(maxLeftDegree >= 2, "projection needs left degree >= 2")
    val e = edges.select(col(leftCol).as("l"), col(rightCol).as("r"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val keptL = e.groupBy("l").agg(count(lit(1)).as("dl"))
      .filter(col("dl") <= maxLeftDegree).select("l")
    val ke = e.join(keptL, "l")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val degR = ke.groupBy("r").agg(count(lit(1)).as("deg"))
    val pairs = ke.as("a").join(ke.as("b"),
        col("a.l") === col("b.l") && col("a.r") < col("b.r"))
      .groupBy(col("a.r").as("node_a"), col("b.r").as("node_b"))
      .agg(count(lit(1)).as("n_shared"))
    val result = pairs
      .join(degR.select(col("r").as("node_a"), col("deg").as("deg_a")),
        "node_a")
      .join(degR.select(col("r").as("node_b"), col("deg").as("deg_b")),
        "node_b")
      .select(col("node_a"), col("node_b"), col("n_shared"),
        col("deg_a"), col("deg_b"),
        expr("n_shared * 1000000 div least(deg_a, deg_b)")
          .as("overlap_ppm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    e.unpersist(false)
    ke.unpersist(false)
    result
  }

  /** Fixed-iteration HITS (Kleinberg 1999) hubs-and-authorities carried
    * in integer units — [[pageRankInt]]'s discipline applied to the
    * two-score mutual recursion: a directed graph's authority score is
    * the (weighted) sum of the hub scores pointing at it, and vice versa.
    * On a data-pipeline graph (source domain -> referenced domain,
    * citing doc -> cited doc) hubs surface the aggregator/index pages and
    * authorities the canonical content — two different curation signals
    * PageRank's single score conflates.
    *
    * Determinism: scores are BIGINT `unit`-scaled shares, L1-normalized
    * each half-step (`s * unit div total` — Kleinberg's L2 norm needs a
    * sqrt; L1 changes only the scale of the fixpoint, not the ranking),
    * so every sum is an exact integer reduce and the result is
    * bit-identical on any partitioning and any engine. Nodes without
    * in-edges publish authority 0; without out-edges, hub 0.
    *
    * Overflow guard: after normalization every score <= `unit`, so the
    * largest raw sum is bounded by unit * totalW and the normalization
    * multiply by unit^2 * totalW; `require`d under Long.MaxValue so a
    * bigger corpus fails loudly rather than wrapping (drop `unit` an
    * order of magnitude to trade precision for headroom).
    *
    * Scale shape, per [[pageRankInt]]: the edge list is materialized
    * once and keeps its partitioning; each half-iteration joins the
    * tiny |V|-row score frame (broadcast) against it and reduces by the
    * opposite endpoint. The L1 total is folded in as a single-partition
    * window over that |V|-row raw frame — NOT a separate 1-row
    * aggregate crossed back, which would reference the raw frame twice
    * and (with no per-iteration persist, pageRankInt's measured rule)
    * multiply the un-materialized edge-join lineage ~4x per half-step:
    * measured 18.7 s for 3 iterations vs ~2 s with the window form.
    * Each half-step references its predecessor exactly once, so total
    * work stays linear in the iteration count; checkpoint every ~10
    * rounds on a long production run. */
  def hitsInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int, unit: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "at least one HITS iteration")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "HITS on an empty graph")
    val totalW = e.agg(sum(col("w"))).head().getLong(0)
    require(totalW > 0 && totalW < Long.MaxValue / unit / unit,
      s"total edge weight $totalW would overflow score arithmetic")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    var h = nodes.select(col("node"), lit(unit / n).as("h"))
    var a: DataFrame = null
    for (_ <- 1 to iterations) {
      val aRaw = e
        .join(broadcast(h.withColumnRenamed("node", "src")), "src")
        .groupBy(col("dst").as("node")).agg(sum(expr("h * w")).as("s"))
        .withColumn("ts", sum(col("s")).over(wAll))
      a = nodes.join(broadcast(aRaw), Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(s * $unit div greatest(ts, 1), 0L)").as("a"))
      val hRaw = e
        .join(broadcast(a.withColumnRenamed("node", "dst")), "dst")
        .groupBy(col("src").as("node")).agg(sum(expr("a * w")).as("s"))
        .withColumn("ts", sum(col("s")).over(wAll))
      h = nodes.join(broadcast(hRaw), Seq("node"), "left")
        .select(col("node"),
          expr(s"coalesce(s * $unit div greatest(ts, 1), 0L)").as("h"))
    }
    val result = h
      .join(a.withColumnRenamed("a", "auth_u"), "node")
      .select(col("node"), col("h").as("hub_u"), col("auth_u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    nodes.unpersist(false)
    e.unpersist(false)
    result
  }

  /** Directed degree assortativity (Newman 2002/2003): the Pearson
    * correlation, over EDGES, of the source's out-degree with the
    * target's in-degree. Positive r = busy sources link to popular
    * targets (hub-hub "rich club"); negative r = hubs fan out to leaves
    * (the usual shape of catalog/purchase graphs). One number that tells
    * a curation pipeline whether degree capping (g8's hub exclusion)
    * will bite.
    *
    * Determinism: degrees and the five moment sums (M, sum_j, sum_k,
    * sum_jk, sum_j2, sum_k2) are exact BIGINT aggregates; the Pearson
    * combination runs in DECIMAL(38,0) (products of two ~1e18 moments
    * overflow BIGINT long before 100 TB), and only the final ratio
    * drops to double — where multiply, divide and sqrt are all IEEE
    * correctly-rounded, so any engine computes the identical double
    * from the identical integers.
    *
    * Scale shape: one `distinct` on the edge list, two map-side-combined
    * degree aggregations, then the degree maps join back onto the edges
    * (both sides shuffled by key once; the degree frames are |V|-sized
    * and hash-join cheaply) and everything collapses into a single
    * 1-row moment aggregate — nothing after the distinct grows with
    * |E|. Self-loops (src == dst after projection) stay in, per
    * Newman's edge-list convention. */
  def assortativity(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("j"))
    val inDeg = e.groupBy("dst").agg(count(lit(1)).as("k"))
    val m = e.join(outDeg, "src").join(inDeg, "dst")
      .agg(count(lit(1)).as("m_edges"),
        sum(col("j")).as("sum_j"), sum(col("k")).as("sum_k"),
        sum(expr("j * k")).as("sum_jk"),
        sum(expr("j * j")).as("sum_j2"),
        sum(expr("k * k")).as("sum_k2"))
    val num = expr("""cast(cast(m_edges as decimal(38,0)) * sum_jk
          - cast(sum_j as decimal(38,0)) * sum_k as double)""")
    val denJ = expr("""cast(cast(m_edges as decimal(38,0)) * sum_j2
          - cast(sum_j as decimal(38,0)) * sum_j as double)""")
    val denK = expr("""cast(cast(m_edges as decimal(38,0)) * sum_k2
          - cast(sum_k as decimal(38,0)) * sum_k as double)""")
    val result = m.select(col("m_edges"), col("sum_j"), col("sum_k"),
        col("sum_jk"),
        graft.functions.NumericFunctions
          .fround(num / sqrt(denJ * denK), 6).as("assortativity"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    e.unpersist(false)
    result
  }

  /** Multi-source BFS hop levels over a DIRECTED edge list: every node
    * reachable from the seed set within `maxHops` hops, labeled with its
    * exact hop distance (the minimum number of edges from any seed).
    *
    * The training-data use is seed-set expansion: start from a trusted or
    * flagged subset (curated docs, known-contaminated ids, a labeled
    * embedding cohort) and propagate along a similarity/co-occurrence
    * graph, with the hop level recording propagation confidence. The
    * reference walks its FK graph the same way, on the driver
    * (`/root/reference/osarchiver/source/db.py:187-214`); this is the
    * data-scale form.
    *
    * Algorithm: classic frontier expansion. `dist` holds settled
    * `(node, hop)` rows; each round joins the CURRENT frontier (not the
    * whole settled set) against the edge list, dedups the targets, and
    * anti-joins the settled set so a node keeps its first (= minimal) hop.
    * Frontiers are persisted and lineage-rerooted per round (the kCore
    * discipline), and the loop exits early on an empty frontier — on a
    * graph of diameter d only d+1 rounds run regardless of `maxHops`.
    *
    * Scale shape: per round one equi-join |frontier| x |E| on the edge
    * key plus a distinct and an anti-join against at most |V| settled
    * rows — all key-partitioned, no broadcast of anything unbounded, no
    * driver-side state. The settled set is ONE incrementally persisted
    * cumulative frame (folded `settled union frontier` per round, the
    * superseded copy dropped eagerly), so every round's anti-join reads
    * a single cached leaf and the plan stays flat and constant-size in
    * the hop count instead of re-unioning h leaves on round h.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val fc = new FrontierCaches
    import fc.{reroot, settle}
    // the cleaned edge list EVERY round joins against: PlanPersist-owned
    // (r11) rather than per-call rerooted — the frontier ops g10/g12/g13
    // feed the SAME kNN edge frame, so the plan-keyed entry is built
    // once and shared across all three instead of each paying its own
    // distinct+persist+count; lifetime follows the house LRU discipline
    // (clearAll at bench family boundaries; eviction recomputes).
    val e = frontierEdges(edges, srcCol, dstCol)
    var frontier = reroot(seeds
      .select(col(seedCol).as("node")).distinct()
      .withColumn("hop", lit(0L)))
    var settled = frontier
    var hop = 0
    while (hop < maxHops && fc.lastCount > 0) {
      hop += 1
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(settled.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(hop.toLong))
      frontier = reroot(next)
      if (fc.lastCount > 0) settled = settle(settled.union(frontier))
    }
    val result = settled.persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    fc.unpersistAll()
    result
  }

  /** Harmonic centrality (Marchiori & Latora 2000; the Boldi-Vigna
    * axiomatically-preferred closeness variant) for a BOUNDED panel of
    * seed nodes over a directed edge list:
    *
    *   H(s) = sum over reachable t != s of 1 / d(s, t)
    *
    * emitted as exact floored milli-units: harmonic_milli = sum of
    * (1000 div hop) — per-term floor BEFORE the sum, the house integer
    * discipline, so the score is partitioning-exact. Unreachable nodes
    * contribute 0 (harmonic's whole advantage over classic closeness on
    * disconnected graphs). The training-data read: which curated seed
    * docs sit centrally in the near-dup/kNN neighborhood graph vs on its
    * periphery — a centrality-weighted curation priority.
    *
    * This is [[bfsLevels]] with the seed identity CARRIED through the
    * frontier (per-seed distances, not min-over-seed-set): state rows
    * are (seed, node, hop) and the settle rule is first-arrival per
    * (seed, node). Exact per-seed BFS costs |seeds| x |reach| state —
    * the Eppstein-Wang sampling regime: callers pass a sampled panel
    * (tens to hundreds of seeds), NEVER the full vertex set; at 100 TB
    * the panel rides the same frontier joins, key-partitioned on node,
    * with zero driver state or broadcasts.
    *
    * Output: (seed, n_reached, harmonic_milli) — one row per input
    * seed, zeros for isolated ones. */
  def harmonicCentrality(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1)
    val fc = new FrontierCaches
    import fc.{reroot, settle}
    val e = frontierEdges(edges, srcCol, dstCol) // shared, see bfsLevels
    val seedSet = reroot(seeds.select(col(seedCol).as("seed")).distinct())
    var frontier = reroot(seedSet
      .withColumn("node", col("seed")).withColumn("hop", lit(0L)))
    var settled = frontier
    var hop = 0
    while (hop < maxHops && fc.lastCount > 0) {
      hop += 1
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("seed"), col("dst").as("node")).distinct()
        .join(settled.select("seed", "node"),
          Seq("seed", "node"), "left_anti")
        .withColumn("hop", lit(hop.toLong))
      frontier = reroot(next)
      if (fc.lastCount > 0) settled = settle(settled.union(frontier))
    }
    val result = seedSet
      .join(settled.where(col("hop") > 0L)
          .groupBy("seed").agg(count(lit(1)).as("n_reached"),
            sum(expr("1000 div hop")).as("harmonic_milli")),
        Seq("seed"), "left")
      .select(col("seed"),
        coalesce(col("n_reached"), lit(0L)).as("n_reached"),
        coalesce(col("harmonic_milli"), lit(0L)).as("harmonic_milli"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    fc.unpersistAll()
    result
  }

  /** Seed-sampled betweenness centrality (Brandes 2001 accumulation over
    * the Brandes-Pich 2007 / Bader et al. sampling regime): how much
    * shortest-path traffic flows THROUGH each node, from a BOUNDED panel
    * of source seeds — the broker/bridge detector (which docs stitch
    * otherwise-separate semantic neighborhoods together; removing them
    * fragments the graph) that degree and closeness both miss.
    *
    * Forward phase: level-synchronous BFS per seed carrying the
    * shortest-path COUNT — sigma(s, w) = sum of sigma(s, u) over
    * in-neighbors u on the previous level (exact for unweighted graphs).
    * Backward phase: Brandes' dependency accumulation by DESCENDING
    * level,
    *
    *   delta(s,v) = sum over DAG edges v->w of
    *                floor(sigma_v * (1000 + delta_w) / sigma_w)
    *
    * in exact milli-units with the floor INSIDE each term, so every sum
    * is order-free and the result is partitioning-exact (the house
    * integer discipline; real-valued Brandes would be float-summation-
    * order-dependent across engines). bc_milli(v) = sum over seeds of
    * delta(s, v). maxHops truncates both phases — the k-bounded
    * betweenness standard in sampling approximations.
    *
    * Scale: per level ONE frontier equi-join + one (seed, node)
    * aggregation forward, one three-way level join backward — 2*maxHops
    * bounded rounds total, every shuffle keyed on node, per-seed state
    * rides the same joins (|seeds| x |reach| rows, the panel is a
    * constant). No driver state, no broadcasts, no path enumeration
    * (sigma/delta recurrences carry path COUNTS, never paths).
    *
    * Output: (node, bc_milli) for every node reached at hop >= 1 from
    * any seed (nodes with zero accumulated dependency report 0). */
  def betweennessCentrality(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1)
    val fc = new FrontierCaches
    import fc.{reroot, rerootLazy, settle}
    // the cumulative (seed, node) settled frame means the per-level
    // anti-join reads a single cached leaf instead of re-unioning every
    // prior level; `levels` itself is kept, the backward phase walks it
    val e = frontierEdges(edges, srcCol, dstCol) // shared, see bfsLevels
    // forward: levels(h) = (seed, node, sigma) settled at distance h
    val lvl0 = reroot(seeds.select(col(seedCol).as("seed")).distinct()
      .withColumn("node", col("seed")).withColumn("sigma", lit(1L)))
    val levels = scala.collection.mutable.ArrayBuffer(lvl0)
    var settled = lvl0.select("seed", "node")
    var h = 0
    while (h < maxHops && fc.lastCount > 0) {
      h += 1
      val next = levels.last.join(e, col("node") === col("src"))
        .groupBy(col("seed"), col("dst").as("node"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(settled, Seq("seed", "node"), "left_anti")
      levels += reroot(next)
      if (fc.lastCount == 0) levels.remove(levels.size - 1)
      else settled = settle(
        settled.union(levels.last.select("seed", "node")))
    }
    // backward: delta at the deepest level is 0; walk levels up through
    // the BFS DAG (edges v -> w with lvl(w) = lvl(v) + 1)
    var deltas = List.empty[DataFrame] // deltas.head = level i+1's delta
    // per-level bc contributions are COLLECTED, not folded: every frame
    // derives from an already-persisted delta, so deferring to a single
    // union + groupBy at the end runs ONE node-keyed shuffle instead of
    // one re-aggregation of the whole accumulator per level
    var contribs = List.empty[DataFrame]
    for (i <- levels.size - 2 to 0 by -1) {
      val wLvl = levels(i + 1).withColumnRenamed("node", "w")
        .withColumnRenamed("sigma", "sigma_w")
      val wDelta = (deltas.headOption match {
        case Some(d) => wLvl.join(d, Seq("seed", "w"), "left")
        case None => wLvl.withColumn("delta", lit(0L))
      }).withColumn("delta",
        coalesce(col("delta"), lit(0L)).cast("decimal(38,0)"))
      val dI = levels(i)
        .withColumnRenamed("seed", "vseed")
        .join(e, col("node") === col("src"))
        .join(wDelta, col("vseed") === col("seed") &&
          col("dst") === col("w"))
        // sigma * (1000 + delta) in DECIMAL(38,0): path counts times
        // accumulated milli-dependencies overflow BIGINT on dense DAGs
        .select(col("vseed").as("seed"), col("node"),
          expr("cast(sigma as decimal(38,0)) * (1000 + delta) " +
            "div sigma_w").as("term"))
        .groupBy("seed", "node").agg(sum(col("term")).as("delta"))
      // lazy reroot (r12): the backward recurrence needs no loop-exit
      // count; each delta is materialized (and cache-filled) inside the
      // single final job, by its two consumers — the next level's join
      // and the contribution union — so the whole backward phase costs
      // ONE job instead of one count job per level.
      val dcached = rerootLazy(dI.withColumnRenamed("node", "w"))
      deltas = dcached :: deltas
      contribs ::= dcached.where(col("seed") =!= col("w"))
        .select(col("w").as("node"), col("delta").as("bc"))
    }
    val acc = if (contribs.isEmpty) null
      else contribs.reduce(_ union _)
        .groupBy("node").agg(sum(col("bc")).as("bc"))
    if (levels.size == 1) {
      // nothing reachable: empty (node, bc_milli) frame
      fc.unpersistAll()
      return lvl0.limit(0).select(col("node"),
        lit(0L).as("bc_milli"))
    }
    val reached = levels.drop(1).map(_.select("node")).reduce(_ union _)
      .distinct()
    val result = reached
      .join(if (acc == null) reached.limit(0)
          .withColumn("bc", lit(0L)) else acc,
        Seq("node"), "left")
      .select(col("node"),
        coalesce(col("bc"), lit(0L)).cast("long").as("bc_milli"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    fc.unpersistAll()
    result
  }

  /** Local clustering coefficient per node (Watts & Strogatz 1998) over
    * an UNDIRECTED edge list: cc(v) = 2 * tri(v) / (deg(v) * (deg(v)-1)),
    * the fraction of a node's neighbor pairs that are themselves linked.
    * On a near-dup candidate graph this separates coherent duplicate
    * families (cc near 1: everyone matches everyone — safe to collapse to
    * one survivor) from hub-shaped false-positive stars (cc near 0: a
    * template fragment links many mutually-unrelated docs — collapsing
    * would merge distinct content). The g2/g3/g4 cluster diagnostics
    * report WHERE density is; this reports whether it is clique-like.
    *
    * Integer ppm output: cc_ppm = (2 * tri * 1e6) div (deg * (deg-1)),
    * exact on any partitioning. Only nodes with deg >= 2 have a defined
    * coefficient (a degree-1 node has no neighbor pairs) — they are
    * emitted with their triangle count and cc; deg < 2 nodes are omitted.
    *
    * Scale shape: [[triangleCounts]]' two equi-joins (wedge + closure)
    * plus one degree aggregation over the doubled edge list and a
    * node-keyed join — everything hash-partitioned on node ids. Skew
    * note: for hub-heavy graphs substitute [[triangleCountsDegree]]'s
    * oriented wedge build; counts are bit-identical.
    */
  def clusteringCoefficient(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") < col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count()
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(e, "a", "b")
    val result = deg.filter(col("degree") >= 2L)
      .join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("coalesce(n_triangles, 0L) * 2000000 div (degree * (degree - 1))")
          .as("cc_ppm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count()
    e.unpersist(false)
    // triangleCounts persists ITS result for callers that reuse it; here it
    // is internal — release it, or every clusteringCoefficient call leaks
    // one cached frame into a long-lived session
    tri.unpersist(false)
    result
  }
}

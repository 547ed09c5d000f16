package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val unit1 = 1000000000000L

  test("pageRankInt: symmetric cycle stays uniform and is partition-invariant") {
    // 4-node directed cycle, equal weights: perfect symmetry, so every
    // iteration must return exactly unit/4-derived ranks on every node
    val edges = Seq(("a", "b", 2L), ("b", "c", 2L), ("c", "d", 2L),
      ("d", "a", 2L)).toDF("src", "dst", "w")
    val ranks = Graph.pageRankInt(edges, "src", "dst", "w", iterations = 5)
      .as[(String, Long)].collect().toMap
    assert(ranks.size === 4)
    assert(ranks.values.toSet.size === 1, s"cycle ranks diverged: $ranks")
    // integer recurrence fixed point: r = 0.15/4 + 0.85*r (to quantization)
    val r = ranks("a")
    assert(math.abs(r - unit1 / 4) <= 5L, s"uniform rank drifted: $r")
    // bit-identical on a different partitioning (order-independent sums)
    val again = Graph.pageRankInt(edges.repartition(7), "src", "dst", "w", 5)
      .as[(String, Long)].collect().toMap
    assert(again === ranks)
  }

  test("pageRankInt: hub of a star accumulates rank; spokes keep teleport") {
    // spokes -> hub only; hub has no out-edges (dangling, mass leaks —
    // the documented variant), spokes receive teleport only
    val edges = (1 to 4).map(i => (s"s$i", "hub", 1L)).toDF("src", "dst", "w")
    val ranks = Graph.pageRankInt(edges, "src", "dst", "w", iterations = 3)
      .as[(String, Long)].collect().toMap
    val teleport = (unit1 * 15 / 100) / 5
    (1 to 4).foreach(i => assert(ranks(s"s$i") === teleport))
    assert(ranks("hub") > 2 * teleport, s"hub rank too small: ${ranks("hub")}")
  }

  test("pageRankInt: weighted split follows edge weights") {
    // a sends 3/4 of its damped mass to b, 1/4 to c
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L)).toDF("src", "dst", "w")
    val ranks = Graph.pageRankInt(edges, "src", "dst", "w", iterations = 8)
      .as[(String, Long)].collect().toMap
    assert(ranks("b") > ranks("c"))
    assert(ranks("a") > ranks("b"), "both feeders return mass to a")
  }

  test("triangleCounts: K4 gives 3 per node; square gives none") {
    val k4 = (for {
      a <- 1 to 4; b <- 1 to 4 if a < b
    } yield (a.toLong, b.toLong)).toDF("a", "b")
    val counts = Graph.triangleCounts(k4, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    assert(Graph.triangleCounts(square, "a", "b").count() === 0)

    // non-canonical + duplicate edges are normalized, not double-counted
    val messy = k4.union(k4.select(col("b").as("a"), col("a").as("b")))
    val again = Graph.triangleCounts(messy, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(again === counts)
  }

  test("property: pagerank is bit-identical under repartitioning on random graphs") {
    val genGraph = for {
      n <- Gen.choose(2, 7)
      extra <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
        w <- Gen.choose(1L, 9L)
      } yield (s"n$a", s"n$b", w))
      ring = (0 until n).map(i => (s"n$i", s"n${(i + 1) % n}", 1L))
    } yield ring ++ extra
    val prop = Prop.forAll(genGraph) { edges =>
      val base = Graph.pageRankInt(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 3).as[(String, Long)].collect().toMap
      val repart = Graph.pageRankInt(
        edges.toDF("src", "dst", "w").repartition(5),
        "src", "dst", "w", iterations = 3).as[(String, Long)].collect().toMap
      base == repart
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: rank mass stays within [teleport * n, unit] on random graphs") {
    val genGraph = for {
      n <- Gen.choose(2, 8)
      extra <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
        w <- Gen.choose(1L, 5L)
      } yield (s"n$a", s"n$b", w))
      // a ring so every node has an out-edge (no dangling leak in the base)
      ring = (0 until n).map(i => (s"n$i", s"n${(i + 1) % n}", 1L))
    } yield ring ++ extra
    val prop = Prop.forAll(genGraph) { edges =>
      val ranks = Graph.pageRankInt(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 4).as[(String, Long)].collect()
      val n = ranks.length
      val teleport = (unit1 * 15 / 100) / n
      val total = ranks.map(_._2).sum
      // every node keeps at least the teleport mass; integral floors only
      // ever LOSE mass, so the total never exceeds the unit and never
      // drops below the pure-teleport floor
      ranks.forall(_._2 >= teleport) && total <= unit1 && total >= teleport * n
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  /** Plain-Scala replica of pageRankInt's documented integer recurrence
    * (the FormulaReplicaSpec third-implementation discipline): unit
    * 1e12, ranks start unit/n (or unit/nSeed on seeds), per-EDGE
    * contribution r(src)*w div outW(src) summed per dst, damped
    * s*d div 100, teleport (unit*(100-d)/100)/n — or, personalized,
    * teleBase/nSeed on seeds and 0 elsewhere. All divisions truncate
    * (Java Long `/` = Spark `div` on non-negative operands). Written
    * from the scaladoc, no Spark. */
  private def pageRankReplica(edges: Seq[(String, String, Long)],
      iters: Int, dampingPct: Int,
      seeds: Option[Set[String]]): Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val outW = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum }
    val seedSet = seeds.map(_.intersect(nodes.toSet))
    val nSeed = seedSet.map(_.size.toLong).getOrElse(0L)
    val teleBase = unit1 * (100 - dampingPct) / 100
    val teleport = teleBase / n
    var r: Map[String, Long] = seedSet match {
      case None => nodes.map(_ -> unit1 / n).toMap
      case Some(ss) =>
        nodes.map(v => v -> (if (ss(v)) unit1 / nSeed else 0L)).toMap
    }
    for (_ <- 1 to iters) {
      val s = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => r(src) * w / outW(src) }.sum
      }
      r = seedSet match {
        case None => nodes.map(v =>
          v -> (teleport + s.getOrElse(v, 0L) * dampingPct / 100)).toMap
        case Some(ss) => nodes.map(v =>
          v -> ((if (ss(v)) teleBase / nSeed else 0L) +
            s.getOrElse(v, 0L) * dampingPct / 100)).toMap
      }
    }
    r
  }

  test("property: pageRankInt equals the plain-Scala integer power " +
      "recurrence exactly on random graphs (plain, pure-power, and " +
      "personalized)") {
    // the repartition/mass properties above check INVARIANTS; this one
    // checks exact VALUES against an independent third implementation,
    // the shared-formula gate hand-computed cases can't give on random
    // structures (q90 rides dampingPct=100, g6 rides the seeded path)
    val genCase = for {
      n <- Gen.choose(2, 6)
      extra <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
        w <- Gen.choose(1L, 5L)
      } yield (s"n$a", s"n$b", w))
      ring = (0 until n).map(i => (s"n$i", s"n${(i + 1) % n}", 1L))
      damping <- Gen.oneOf(85, 100, 60)
      nSeeds <- Gen.choose(0, n - 1)
    } yield (ring ++ extra, damping,
      // seeds drawn from ring nodes (guaranteed present); empty -> plain
      if (nSeeds == 0) None else Some((0 until nSeeds).map(i => s"n$i").toSet))
    val prop = Prop.forAll(genCase) { case (edges, damping, seeds) =>
      val got = Graph.pageRankInt(edges.toDF("src", "dst", "w"),
          "src", "dst", "w", iterations = 3, dampingPct = damping,
          seeds = seeds.map(_.toSeq.toDF("s")))
        .as[(String, Long)].collect().toMap
      got == pageRankReplica(edges, 3, damping, seeds)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("pageRankInt at dampingPct=100 is the pure power method: a " +
      "2-cycle holds the exact uniform stationary distribution") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L)).toDF("src", "dst", "w")
    val r = Graph.pageRankInt(edges, "src", "dst", "w", iterations = 5,
        dampingPct = 100)
      .as[(String, Long)].collect().toMap
    // teleport 0, damped x*100 div 100 = x: mass circulates losslessly
    assert(r === Map("a" -> unit1 / 2, "b" -> unit1 / 2))
  }

  test("hitsInt: hand-computed two-iteration scores; partition-invariant") {
    // A->B, A->C, B->C with unit 600: n=3, h0=200 each.
    // it1: a_raw B=200 C=400 (ts 600) -> a B=200 C=400;
    //      h_raw A=600 B=400 (ts 1000) -> h A=360 B=240 C=0.
    // it2: a_raw B=360 C=600 (ts 960) -> a B=225 C=375;
    //      h_raw A=600 B=375 (ts 975) -> h A=369 B=230 (floored).
    val edges = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "C", 1L))
      .toDF("src", "dst", "w")
    val r = Graph.hitsInt(edges, "src", "dst", "w", iterations = 2,
        unit = 600L)
      .as[(String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r === Map("A" -> ((369L, 0L)), "B" -> ((230L, 225L)),
      "C" -> ((0L, 375L))))
    val again = Graph.hitsInt(edges.repartition(7), "src", "dst", "w", 2,
        unit = 600L)
      .as[(String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(again === r)
  }

  test("hitsInt: edge weights split authority proportionally; " +
      "sink nodes publish hub 0, source nodes authority 0") {
    val edges = Seq(("A", "B", 2L), ("A", "C", 1L)).toDF("src", "dst", "w")
    val r = Graph.hitsInt(edges, "src", "dst", "w", iterations = 3,
        unit = 600L)
      .as[(String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // single hub holds the whole L1 hub mass; authorities follow weights
    assert(r("A") === ((600L, 0L)))
    assert(r("B")._1 === 0L && r("C")._1 === 0L)
    assert(r("B")._2 === 400L && r("C")._2 === 200L)
    assert(r("B")._2 === 2L * r("C")._2)
  }

  test("bipartiteProject: hand-computed co-occurrence with hub-cap " +
      "exclusion; partition-invariant") {
    val edges = Seq(
      ("u1", "A"), ("u1", "B"), ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "C"), ("u4", "C"), ("u4", "D"),
      ("u6", "B"), ("u6", "D"),
      ("hub", "A"), ("hub", "B"), ("hub", "C"), ("hub", "D")
    ).toDF("l", "r")
    val r = Graph.bipartiteProject(edges, "l", "r", maxLeftDegree = 3)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5, x._6))).toMap
    // hub (degree 4 > cap 3) contributes no evidence; capped degrees
    // A=3 B=3 C=2 D=2
    assert(r.keySet === Set(("A", "B"), ("A", "C"), ("C", "D"),
      ("B", "D")), r)
    assert(r(("A", "B")) === ((2L, 3L, 3L, 666666L)))
    assert(r(("A", "C")) === ((1L, 3L, 2L, 500000L)))
    assert(r(("C", "D")) === ((1L, 2L, 2L, 500000L)))
    assert(r(("B", "D")) === ((1L, 3L, 2L, 500000L)))
    val again = Graph.bipartiteProject(edges.repartition(7), "l", "r", 3)
      .as[(String, String, Long, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5, x._6))).toMap
    assert(again === r)
    // without the cap the hub links every pair (including B-C)
    val uncapped = Graph.bipartiteProject(edges, "l", "r", 10)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(uncapped.map(x => (x._1, x._2)).toSet.contains(("B", "C")))
  }

  test("kCore: triangle with a pendant chain peels to the triangle") {
    // d-e pendant chain and c-d bridge peel away round by round; the
    // triangle is the 2-core, every member with core-degree 2
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e"))
      .toDF("a", "b")
    val core = Graph.kCore(edges, "a", "b", k = 2, rounds = 4)
      .as[(String, Long)].collect().toMap
    assert(core === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k=3 empties it: no node has 3 neighbors
    assert(Graph.kCore(edges, "a", "b", k = 3, rounds = 4).count() === 0)
  }

  test("property: kCore equals brute-force iterative peeling on random graphs") {
    val genEdges = for {
      n <- Gen.choose(3, 10)
      edges <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter { case (a, b) => a != b }
    val prop = Prop.forAll(genEdges, Gen.choose(1, 3)) { (edges, k) =>
      val canon = edges.map { case (a, b) => (a min b, a max b) }.toSet
      // brute peel to fixpoint, counting the rounds actually needed
      var alive = canon.flatMap { case (a, b) => Seq(a, b) }
      var bruteRounds = 0
      var changed = true
      while (changed) {
        val deg = alive.map { v =>
          v -> canon.count { case (a, b) =>
            (a == v && alive(b)) || (b == v && alive(a)) }
        }.toMap
        val next = alive.filter(deg(_) >= k)
        changed = next != alive
        alive = next
        bruteRounds += 1
      }
      val expected = alive.map { v =>
        v -> canon.count { case (a, b) =>
          (a == v && alive(b)) || (b == v && alive(a)) }.toLong
      }.toMap
      // the brute peel just measured the exact convergence depth — run
      // the operator at that depth (it must land on the same fixpoint)
      val got = Graph.kCore(edges.toDF("a", "b"), "a", "b", k,
          rounds = math.max(1, bruteRounds))
        .as[(String, Long)].collect().toMap
        .map { case (n, d) => (n.toLong, d) }
      got == expected
    }
    // each sample runs up to |V| materialized peel rounds — 8 samples
    // keeps the property meaningful without dominating the suite's time
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: triangle counts equal brute-force enumeration on random graphs") {
    val genEdges = for {
      n <- Gen.choose(3, 9)
      edges <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter { case (a, b) => a != b }
    val prop = Prop.forAll(genEdges) { edges =>
      val canon = edges.map { case (a, b) => (a min b, a max b) }.toSet
      val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
      val brute = nodes.map { v =>
        v -> (for {
          x <- nodes; y <- nodes; z <- nodes
          if x < y && y < z && Seq(x, y, z).contains(v)
          if canon((x, y)) && canon((y, z)) && canon((x, z))
        } yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      // the degree-ordered formulation must agree bit for bit — it only
      // changes WHERE wedges are built (skew-proof orientation), never
      // which triangles exist
      val gotDeg = Graph.triangleCountsDegree(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      got == brute && gotDeg == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("labelPropagation: two triangles with a bridge resolve to two communities") {
    // triangle {1,2,3} -- bridge (3,4) -- triangle {4,5,6}: after enough
    // rounds each triangle converges to its minimum label; the bridge is
    // outvoted by the triangle majorities
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(got(1L), got(2L), got(3L)).size === 1, s"left triangle split: $got")
    assert(Set(got(4L), got(5L), got(6L)).size === 1, s"right triangle split: $got")
  }

  test("property: labelPropagation equals brute synchronous LPA on random graphs") {
    val genEdges = for {
      n <- Gen.choose(3, 10)
      edges <- Gen.listOf(for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield edges.filter { case (a, b) => a != b }
    val prop = Prop.forAll(genEdges, Gen.choose(1, 3)) { (edges, rounds) =>
      val canon = edges.map { case (a, b) => (a min b, a max b) }.toSet
      canon.isEmpty || {
        val nodes = canon.flatMap { case (a, b) => Seq(a, b) }
        val nbrs = nodes.map { v =>
          v -> canon.collect {
            case (a, b) if a == v => b
            case (a, b) if b == v => a
          }
        }.toMap
        var lbl = nodes.map(v => v -> v).toMap
        for (_ <- 1 to rounds) {
          lbl = nodes.map { v =>
            val votes = (nbrs(v).toSeq.map(lbl) :+ lbl(v))
              .groupBy(identity).map { case (l, vs) => (l, vs.size) }
            // highest count, then smallest label — the operator's rule
            v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
          }.toMap
        }
        val got = Graph.labelPropagation(edges.toDF("a", "b"), "a", "b", rounds)
          .as[(Long, Long)].collect().toMap
        got == lbl
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("linkPrediction: path predicts the missing closing edge, clique predicts nothing") {
    // path a-b-c: the only wedge is (a,c) through b (deg 2) -> RA 500000
    val path = Seq((1L, 2L), (2L, 3L)).toDF("x", "y")
    val got = Graph.linkPrediction(path, "x", "y")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 3L, 1L, 500000L)))
    // triangle: every wedge closes, nothing left to predict
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("x", "y")
    assert(Graph.linkPrediction(tri, "x", "y").count() === 0L)
  }

  test("linkPrediction: hub centers above the degree cap contribute no evidence") {
    // star hub h connected to 5 spokes; spoke pairs share only the hub.
    // cap=4 < deg(h)=5 -> zero predictions; cap=5 -> all C(5,2) pairs
    val star = (1L to 5L).map(i => (0L, i)).toDF("x", "y")
    assert(Graph.linkPrediction(star, "x", "y", maxCenterDegree = 4)
      .count() === 0L)
    val open = Graph.linkPrediction(star, "x", "y", maxCenterDegree = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(open.length === 10)
    assert(open.forall { case (_, _, cn, ra) => cn == 1L && ra == 200000L })
  }

  test("linkPrediction: common-neighbor count beats RA in the ranking; output is partition-invariant") {
    // (1,2) share centers {10, 11}; (3,4) share only low-degree center 20
    val edges = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 20L), (4L, 20L)).toDF("x", "y")
    val got = Graph.linkPrediction(edges, "x", "y")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.head._1 === 1L && got.head._2 === 2L && got.head._3 === 2L)
    val again = Graph.linkPrediction(edges.repartition(7), "x", "y")
      .as[(Long, Long, Long, Long)].collect()
    assert(again.toSeq === got.toSeq)
  }

  test("personalized PageRank: hand-computed chain, component isolation, " +
      "absent seeds filtered, all-absent seeds rejected") {
    // chain a -> b, seed {a}: r0 = (1e12, 0);
    // iter1: a = 0.15e12, b = 0.85 * 1e12; iter2: b = 0.85 * 0.15e12
    val chain = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val seedsA = Seq(Tuple1("a")).toDF("node")
    val r2 = Graph.pageRankInt(chain, "src", "dst", "w", iterations = 2,
        seeds = Some(seedsA))
      .as[(String, Long)].collect().toMap
    assert(r2 === Map("a" -> 150000000000L, "b" -> 127500000000L), r2)
    // disconnected component gets EXACT zero (no uniform teleport)
    val twoComp = Seq(("a", "b", 1L), ("x", "y", 1L))
      .toDF("src", "dst", "w")
    val rc = Graph.pageRankInt(twoComp, "src", "dst", "w", iterations = 3,
        seeds = Some(seedsA))
      .as[(String, Long)].collect().toMap
    assert(rc("x") === 0L && rc("y") === 0L, rc)
    assert(rc("a") > 0L && rc("b") > 0L)
    // seeds not present in the graph are ignored, not counted in |S|
    val withGhost = Graph.pageRankInt(twoComp, "src", "dst", "w", 3,
        seeds = Some(Seq(Tuple1("a"), Tuple1("zz")).toDF("node")))
      .as[(String, Long)].collect().toMap
    assert(withGhost === rc, "ghost seed must not change |S| or ranks")
    // every seed absent -> loud failure
    assertThrows[IllegalArgumentException] {
      Graph.pageRankInt(twoComp, "src", "dst", "w", 1,
        seeds = Some(Seq(Tuple1("zz")).toDF("node")))
    }
    // partitioning invariance in seeded mode
    val again = Graph.pageRankInt(twoComp.repartition(5), "src", "dst",
        "w", 3, seeds = Some(seedsA))
      .as[(String, Long)].collect().toMap
    assert(again === rc)
  }

  test("assortativity: hand-computed Pearson, perfect extremes, " +
      "duplicate-edge dedup, partition invariance") {
    // (a->x, a->y, b->x): out-deg a=2 b=1; in-deg x=2 y=1.
    // Edge (j,k) tuples (2,2) (2,1) (1,2): M=3, sum_j=sum_k=5,
    // sum_jk=8, sum_j2=sum_k2=9 -> r = (24-25)/sqrt(2*2) = -0.5
    val e1 = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("s", "d")
    val r1 = Graph.assortativity(e1, "s", "d")
      .select("m_edges", "sum_jk", "assortativity")
      .as[(Long, Long, Double)].collect().head
    assert(r1 === ((3L, 8L, -0.5)))
    // perfectly assortative: both hubs link both popular targets, the
    // leaf links the leaf -> every edge has j == k -> r = +1
    val ePos = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"),
      ("c", "z")).toDF("s", "d")
    assert(Graph.assortativity(ePos, "s", "d")
      .select("assortativity").as[Double].collect().head === 1.0)
    // perfectly disassortative: hubs fan to leaves only -> r = -1
    val eNeg = Seq(("a", "x"), ("a", "y"), ("b", "z"), ("c", "z"))
      .toDF("s", "d")
    assert(Graph.assortativity(eNeg, "s", "d")
      .select("assortativity").as[Double].collect().head === -1.0)
    // duplicate edges collapse before degrees are counted
    val dup = Graph.assortativity(e1.unionAll(e1).repartition(5),
        "s", "d")
      .select("m_edges", "sum_jk", "assortativity")
      .as[(Long, Long, Double)].collect().head
    assert(dup === r1)
  }

  test("clusteringCoefficient: triangle + pendant gives exact ppm") {
    // triangle 1-2-3 plus pendant edge 3-4: nodes 1,2 have cc = 1
    // (their single neighbor pair is linked), node 3 has 1 of 3 neighbor
    // pairs linked (2*1e6 div 6 = 333333), node 4 (deg 1) is omitted
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val got = Graph.clusteringCoefficient(edges, "a", "b")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === Map(
      1L -> (2L, 1L, 1000000L),
      2L -> (2L, 1L, 1000000L),
      3L -> (3L, 1L, 333333L)))
    // duplicate/reversed edges canonicalize away
    val dup = Graph.clusteringCoefficient(
      edges.union(Seq((2L, 1L), (3L, 2L)).toDF("a", "b")), "a", "b")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(dup === got)
  }

  test("clusteringCoefficient: star hub scores 0 (no closed wedges)") {
    val star = (2L to 5L).map(i => (1L, i)).toDF("a", "b")
    val got = Graph.clusteringCoefficient(star, "a", "b")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // spokes have deg 1 -> omitted; the hub's 6 neighbor pairs share no edge
    assert(got === Map(1L -> 0L))
  }

  test("bfsLevels: path + back-cycle yields exact hop levels; unreachable absent") {
    // 1 -> 2 -> 3 -> 4, back-edge 4 -> 2 (cycle must not relabel 2),
    // disconnected 9 -> 10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (9L, 10L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val levels = Graph.bfsLevels(edges, "src", "dst", seeds, "id", maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(levels === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("bfsLevels: multi-source takes the minimum hop over all seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 5L).toDF("id")
    val levels = Graph.bfsLevels(edges, "src", "dst", seeds, "id", maxHops = 10)
      .as[(Long, Long)].collect().toMap
    // 4 is 3 hops from seed 1 but 1 hop from seed 5
    assert(levels === Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }

  test("bfsLevels: maxHops truncates; early-exit beyond the diameter is identical") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val capped = Graph.bfsLevels(edges, "src", "dst", seeds, "id", maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // a huge budget runs only diameter+1 rounds and returns the full set
    val full = Graph.bfsLevels(edges, "src", "dst", seeds, "id", maxHops = 1000)
      .as[(Long, Long)].collect().toMap
    assert(full === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // partition-invariance: same result on a different layout
    val again = Graph.bfsLevels(edges.repartition(5), "src", "dst",
      seeds.repartition(3), "id", maxHops = 1000)
      .as[(Long, Long)].collect().toMap
    assert(again === full)
  }

  test("harmonicCentrality: hand-computed path, per-seed distances " +
      "(not min over the seed set), isolated seed zeros") {
    // 1 -> 2 -> 3 -> 4; seeds 1 and 3 and isolated 9.
    // H(1) = 1000/1 + 1000/2 + floor(1000/3) = 1833 over {2,3,4}
    // H(3) = 1000/1 = 1000 over {4}  (per-seed: NOT relabeled by seed 1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 3L, 9L).toDF("id")
    val h = Graph.harmonicCentrality(edges, "src", "dst", seeds, "id",
        maxHops = 10)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(h === Map(1L -> ((3L, 1833L)), 3L -> ((1L, 1000L)),
      9L -> ((0L, 0L))))
  }

  test("betweennessCentrality: diamond splits dependency, path chains it") {
    // diamond 1->{2,3}->4: sigma(4)=2, delta(2)=delta(3)=floor(1500/... )
    //   = floor(1*(1000+0)/2) = 500; 4 carries nothing
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val s1 = Seq(1L).toDF("id")
    val d = Graph.betweennessCentrality(diamond, "src", "dst", s1, "id",
        maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(d === Map(2L -> 500L, 3L -> 500L, 4L -> 0L))
    // path 1->2->3->4: delta(3) = 1000, delta(2) = floor(1*(2000)/1)
    //   = 2000 (Brandes: 2 pair-dependencies through 2)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Graph.betweennessCentrality(path, "src", "dst", s1, "id",
        maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(p === Map(2L -> 2000L, 3L -> 1000L, 4L -> 0L))
  }

  test("betweennessCentrality: multi-seed sums, truncation zeroes " +
      "interior, partition-invariant") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 2L).toDF("id")
    val b = Graph.betweennessCentrality(path, "src", "dst", seeds, "id",
        maxHops = 10).as[(Long, Long)].collect().toMap
    // bc(2) = delta(1,2) = 2000; bc(3) = delta(1,3) + delta(2,3)
    //   = 1000 + 1000
    assert(b === Map(2L -> 2000L, 3L -> 2000L, 4L -> 0L))
    // maxHops = 1: no node ever sits between a seed and a deeper node
    val t = Graph.betweennessCentrality(path, "src", "dst", seeds, "id",
        maxHops = 1).as[(Long, Long)].collect().toMap
    assert(t === Map(2L -> 0L, 3L -> 0L))
    val again = Graph.betweennessCentrality(path.repartition(5), "src",
        "dst", seeds.repartition(3), "id", maxHops = 10)
      .as[(Long, Long)].collect().toMap
    assert(again === b)
  }

  test("harmonicCentrality: cycle symmetry, maxHops truncation, " +
      "partition-invariance") {
    // directed 4-cycle: every seed reaches 3 nodes at hops 1,2,3
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 2L, 3L, 4L).toDF("id")
    val h = Graph.harmonicCentrality(edges, "src", "dst", seeds, "id",
        maxHops = 10).as[(Long, Long, Long)].collect()
    assert(h.length === 4)
    assert(h.forall(r => r._2 == 3L && r._3 == 1833L))
    // truncation at 1 hop: each seed sees only its direct successor
    val h1 = Graph.harmonicCentrality(edges, "src", "dst", seeds, "id",
        maxHops = 1).as[(Long, Long, Long)].collect()
    assert(h1.forall(r => r._2 == 1L && r._3 == 1000L))
    val again = Graph.harmonicCentrality(edges.repartition(5), "src",
        "dst", seeds.repartition(3), "id", maxHops = 10)
      .as[(Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === h.sortBy(_._1).toSeq)
  }

  // directed random graph + seed panel shared by the frontier-family
  // properties below (the settled-frame fold was refactored twice in one
  // round — these gate the shared machinery against a plain Scala BFS)
  private val genFrontierCase = for {
    n <- Gen.choose(2, 9)
    edges <- Gen.listOf(for {
      a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
    } yield (a.toLong, b.toLong))
    seeds <- Gen.nonEmptyListOf(Gen.choose(0, n - 1).map(_.toLong))
    hops <- Gen.choose(1, 4)
  } yield (edges.filter { case (a, b) => a != b }, seeds.distinct, hops)

  /** hop map of a plain BFS from `seed` over directed `edges`, depth
    * <= maxHops; seed itself at hop 0. */
  private def bruteBfs(edges: Seq[(Long, Long)], seed: Long,
      maxHops: Int): Map[Long, Int] = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = Map(seed -> 0)
    var frontier = Set(seed)
    var hop = 0
    while (hop < maxHops && frontier.nonEmpty) {
      hop += 1
      val next = frontier.flatMap(v => out.getOrElse(v, Nil))
        .diff(dist.keySet)
      dist ++= next.map(_ -> hop)
      frontier = next
    }
    dist
  }

  test("property: bfsLevels equals min-over-seeds brute BFS on random graphs") {
    val prop = Prop.forAll(genFrontierCase) { case (edges, seeds, hops) =>
      val expect = seeds.map(s => bruteBfs(edges, s, hops))
        .reduce((a, b) => (a.keySet ++ b.keySet).map(k =>
          k -> math.min(a.getOrElse(k, Int.MaxValue),
            b.getOrElse(k, Int.MaxValue))).toMap)
        .map { case (k, v) => k -> v.toLong }
      val got = Graph.bfsLevels(
          if (edges.isEmpty) Seq((-1L, -2L)).toDF("src", "dst")
          else edges.toDF("src", "dst"),
          "src", "dst", seeds.toDF("id"), "id", hops)
        .as[(Long, Long)].collect().toMap
      got == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: harmonicCentrality equals per-seed brute BFS on random graphs") {
    val prop = Prop.forAll(genFrontierCase) { case (edges, seeds, hops) =>
      val expect = seeds.map { s =>
        val d = bruteBfs(edges, s, hops) - s
        (s, d.size.toLong, d.values.map(h => 1000L / h).sum)
      }.toSet
      val got = Graph.harmonicCentrality(
          if (edges.isEmpty) Seq((-1L, -2L)).toDF("src", "dst")
          else edges.toDF("src", "dst"),
          "src", "dst", seeds.toDF("id"), "id", hops)
        .as[(Long, Long, Long)].collect().toSet
      got == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

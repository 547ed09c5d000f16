package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // plain-Scala replica of the exact integer recurrence — an independent
  // in-test oracle (same role as the hand-computed EM spec for er6)
  private def replica(xy: Seq[(Long, Long)], steps: Int): Seq[(Int, Long, Long, Long, Long)] = {
    val n = xy.size.toLong
    val xbar = xy.map(_._1).sum / n
    val xc = xy.map { case (x, y) => (x - xbar, y) }
    var w0 = 0L; var w1 = 0L
    (1 to steps).map { k =>
      val g = xc.map { case (x, y) =>
        val z = (w0 + w1 * x).toDouble / 1e6
        val sig = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        val g0 = math.floor((y.toDouble - sig) * 1e6).toLong
        (g0, g0 * x)
      }
      val s0 = g.map(_._1).sum; val s1 = g.map(_._2).sum
      w0 = w0 + s0 / (2 * n)   // Long / truncates like Spark div
      w1 = w1 + s1 / (128 * n)
      (k, s0, s1, w0, w1)
    }
  }

  test("domain calibration: engine trajectory equals the plain-Scala " +
      "integer recurrence; gradients push toward the base rate") {
    // token counts 2/4/6/8; only the x=8 doc is the target domain
    val docs = Seq(
      ("src1", "a b"), ("src1", "a b c d"), ("src1", "a b c d e f"),
      ("src0", "a b c d e f g h")
    ).toDF("source", "text")
    val got = Calibration
      .domainClassifierSteps(docs, "source", "text", "src0", steps = 3)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = replica(Seq((2L, 0L), (4L, 0L), (6L, 0L), (8L, 1L)), 3)
    assert(got === want, s"got $got\nwant $want")
    // 25% positives: intercept must move DOWN from 0 (sigmoid(0)=0.5
    // over-predicts), and the slope up (longest doc is the positive)
    assert(got.last._4 < 0L && got.last._5 > 0L)
    // partitioning invariance
    val again = Calibration
      .domainClassifierSteps(docs.repartition(5), "source", "text", "src0", 3)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === got)
  }

  test("property: engine GD trajectory equals the plain-Scala replica " +
      "on random corpora (the FormulaReplicaSpec discipline)") {
    // the fixed-fixture test above pins one trajectory; this drives the
    // same third implementation over randomized corpora so a recurrence
    // transcription error shared by engine and oracle cannot hide in a
    // structure the hand case happens not to exercise
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCorpus = for {
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 10)
        pos <- Gen.oneOf(true, false)
      } yield (len.toLong, if (pos) 1L else 0L))
      steps <- Gen.choose(1, 4)
    } yield (rows, steps)
    val prop = Prop.forAll(genCorpus) { case (rows, steps) =>
      val docs = rows.map { case (len, y) =>
        (if (y == 1L) "src0" else "src1", Seq.fill(len.toInt)("w").mkString(" "))
      }.toDF("source", "text")
      val got = Calibration
        .domainClassifierSteps(docs, "source", "text", "src0", steps)
        .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      got == replica(rows, steps)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("domain calibration: all-negative corpus drives weights negative, " +
      "step bound enforced") {
    val docs = Seq(("s1", "a b c"), ("s1", "d e f")).toDF("source", "text")
    val r = Calibration
      .domainClassifierSteps(docs, "source", "text", "src0", steps = 2)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.length === 2)
    assert(r.forall(_._2 < 0L), "no positives: every residual negative")
    assert(r.last._4 < 0L)
    assertThrows[IllegalArgumentException] {
      Calibration.domainClassifierSteps(docs, "source", "text", "src0", 0)
    }
  }

  test("calibration report: balanced uniform corpus is perfectly " +
      "calibrated at p=0.5 in the single middle bin") {
    // every doc has 3 tokens -> xc = 0 everywhere, gradients cancel on a
    // balanced corpus, weights stay 0 -> every p_u = 500000, bin 5, and
    // observed rate = 1/2 exactly: the zero-gap fixed point, by hand
    val docs = Seq(("src0", "a b c"), ("src0", "d e f"),
      ("s1", "g h i"), ("s1", "j k l")).toDF("source", "text")
    val r = Calibration.calibrationReport(docs, "source", "text", "src0", 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(r.toSeq === Seq((5L, 4L, 500000L, 500000L, 0L)))
  }

  test("calibration report: bins partition the corpus, values stay in " +
      "micro-unit range, result is partitioning-invariant") {
    val docs = Seq(
      ("src0", "a b c d e f g h"), ("src0", "a b"), ("s1", "a b c"),
      ("s1", "a b c d e"), ("s1", "a"), ("s1", "a b c d e f g h i j k l")
    ).toDF("source", "text")
    val r = Calibration.calibrationReport(docs, "source", "text", "src0", 3)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(r.map(_._2).sum === 6L, "bins must partition all docs")
    r.foreach { case (bin, _, conf, acc, gap) =>
      assert(bin >= 0L && bin <= 9L)
      assert(conf >= bin * 100000L && conf < (bin + 1) * 100000L,
        "mean confidence must lie inside its bin")
      assert(acc >= 0L && acc <= 1000000L)
      assert(gap === math.abs(conf - acc))
    }
    val again = Calibration
      .calibrationReport(docs.repartition(5), "source", "text", "src0", 3)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again === r)
  }

  test("lift table: hand-computed deciles from tied value groups") {
    // 10 docs, 4 positives. cb (exclusive higher-score count): 0,2,4,7
    // -> deciles 0,2,4,7; base rate 400000 ppm
    val scored = (Seq.fill(2)((900000L, 1L)) ++
      Seq((800000L, 1L), (800000L, 0L)) ++
      Seq((500000L, 1L), (500000L, 0L), (500000L, 0L)) ++
      Seq.fill(3)((100000L, 0L))).toDF("p_u", "y")
    val r = Calibration.liftFromScores(scored)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5, x._6))).toMap
    assert(r.keySet === Set(0L, 2L, 4L, 7L), r)
    assert(r(0L) === ((2L, 2L, 1000000L, 2500000L, 500000L)))
    assert(r(2L) === ((2L, 1L, 500000L, 1250000L, 750000L)))
    // 1000000 div 3 = 333333; 333333 * 1e6 div 400000 = 833332 (floored)
    assert(r(4L) === ((3L, 1L, 333333L, 833332L, 1000000L)))
    assert(r(7L) === ((3L, 0L, 0L, 0L, 1000000L)))
    val again = Calibration.liftFromScores(scored.repartition(7))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5, x._6))).toMap
    assert(again === r)
  }

  test("lift table over the trained filter: deciles partition the " +
      "corpus, capture is monotone to exactly 1e6") {
    val docs = Seq(
      ("src0", "a b c d e f g h"), ("src0", "a b"), ("s1", "a b c"),
      ("s1", "a b c d e"), ("s1", "a"), ("s1", "a b c d e f g h i j k l")
    ).toDF("source", "text")
    val r = Calibration.liftTable(docs, "source", "text", "src0", 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r.map(_._2).sum === 6L, "deciles must partition all docs")
    assert(r.map(_._3).sum === 2L, "positives accounted once")
    assert(r.last._6 === 1000000L, "gains curve ends at full capture")
    assert(r.map(_._6).toSeq === r.map(_._6).toSeq.sorted,
      "cumulative capture must be monotone")
    r.foreach { case (d, _, _, rate, _, _) =>
      assert(d >= 0L && d <= 9L && rate >= 0L && rate <= 1000000L)
    }
  }
}

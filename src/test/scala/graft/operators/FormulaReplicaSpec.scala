package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Third-implementation property gates for the formula-heavy families.
  *
  * Dual-engine (Spark vs DuckDB) agreement cannot catch a SHARED-formula
  * bug: both sides of the oracle were written from the same reading of
  * the recurrence, so a transcription error passes bit-exact (the
  * round-8 correlation/ANOVA findings were exactly this class). Each
  * test here replays the operator's documented integer recurrence in
  * plain driver-side Scala — written from the docs, no Spark, no SQL —
  * over RANDOMIZED ScalaCheck fixtures and requires the engine to match
  * element-for-element. Together with the existing GD (CalibrationSpec),
  * BFS (GraphSpec) and bench-fold replicas, every sequential-fold family
  * now has an independent third implementation.
  *
  * Arithmetic conventions replicated exactly: Spark's `div` truncates
  * toward zero, which is Java's Long `/` (pinned by CalibrationSpec and
  * by TimeSeriesSpec's negative-trend fixture); floor(ln(a/b)/ln 2 * 10)
  * computes the integer products FIRST and converts once to double.
  */
class FormulaReplicaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------- KM

  /** Kaplan-Meier + Nelson-Aalen from the estimator conventions in
    * [[Survival]]'s scaladoc: deaths-before-losses risk sets, ppm floor
    * hazards, nano-unit product with a per-step floor. */
  private def kmReplica(obs: Seq[(Long, Long)])
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val total = obs.size.toLong
    var prior = 0L; var s = 1000000000L; var na = 0L
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Long)]
    obs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (t, rows) =>
      val d = rows.count(_._2 == 1L).toLong
      val c = rows.count(_._2 == 0L).toLong
      val nRisk = total - prior
      prior += d + c
      if (d >= 1L) {
        val hazard = d * 1000000L / nRisk
        na += hazard
        s = s * (nRisk - d) / nRisk
        out += ((t, nRisk, d, c, hazard, na, s / 1000L))
      }
    }
    out.toSeq
  }

  test("property: kaplanMeier equals the plain-Scala product-limit " +
      "recurrence on random censored cohorts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genObs = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        t <- Gen.choose(0L, 8L)
        ev <- Gen.oneOf(0L, 1L)
      } yield (t, ev))
    } yield rows
    val prop = Prop.forAll(genObs) { rows =>
      val got = Survival
        .kaplanMeier(rows.toDF("dur", "event"), "dur", "event")
        .as[(Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      got == kmReplica(rows)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  /** Aalen-Johansen from [[Survival.cumulativeIncidence]]'s scaladoc:
    * CIF mass allocated from the PRE-step overall survival. */
  private def ajReplica(obs: Seq[(Long, Long)])
      : Seq[(Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val total = obs.size.toLong
    var prior = 0L; var s = 1000000000L; var c1 = 0L; var c2 = 0L
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Long, Long)]
    obs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (t, rows) =>
      val d1 = rows.count(_._2 == 1L).toLong
      val d2 = rows.count(_._2 == 2L).toLong
      val cen = rows.count(_._2 == 0L).toLong
      val nRisk = total - prior
      prior += d1 + d2 + cen
      if (d1 + d2 >= 1L) {
        c1 += s * d1 / nRisk
        c2 += s * d2 / nRisk
        s = s * (nRisk - d1 - d2) / nRisk
        out += ((t, nRisk, d1, d2, cen, s / 1000L, c1 / 1000L, c2 / 1000L))
      }
    }
    out.toSeq
  }

  test("property: cumulativeIncidence equals the plain-Scala " +
      "Aalen-Johansen recurrence on random competing-risk cohorts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genObs = for {
      n <- Gen.choose(1, 40)
      rows <- Gen.listOfN(n, for {
        t <- Gen.choose(0L, 8L)
        typ <- Gen.oneOf(0L, 1L, 2L)
      } yield (t, typ))
    } yield rows
    val prop = Prop.forAll(genObs) { rows =>
      val got = Survival
        .cumulativeIncidence(rows.toDF("dur", "typ"), "dur", "typ")
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      got == ajReplica(rows)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------ Holt-Winters

  /** The q102/q107 fold from [[TimeSeries]]'s hwFold SQL, re-derived
    * from the additive HW update equations in plain Scala. xs is the
    * series at contiguous indices 1..n. Returns (fitted trajectory for
    * i in [m+1, n], final (l, b, seasonal ring)). */
  private def hwReplica(xs: Seq[Long], m: Int, aInv: Int, bInv: Int,
      gInv: Int): (Seq[(Long, Long)], (Long, Long, Seq[Long])) = {
    var l = xs.take(m).sum / m
    var b = (xs.slice(m, 2 * m).sum - xs.take(m).sum) / (m.toLong * m)
    val s = scala.collection.mutable.Queue(xs.take(m).map(_ - l): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (t <- (m + 1) to xs.length) {
      val x = xs(t - 1)
      val s1 = s.head
      out += ((t.toLong, l + b + s1))
      val lNew = ((x - s1) + (aInv - 1).toLong * (l + b)) / aInv
      val bNew = ((lNew - l) + (bInv - 1).toLong * b) / bInv
      val sNew = ((x - lNew) + (gInv - 1).toLong * s1) / gInv
      s.dequeue(); s.enqueue(sNew)
      l = lNew; b = bNew
    }
    (out.toSeq, (l, b, s.toSeq))
  }

  test("property: holtWintersAdditive fitted trajectory and " +
      "holtWintersForecast horizon equal the plain-Scala fold on random " +
      "series (negative values exercise truncate-toward-zero)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      m <- Gen.choose(2, 4)
      extra <- Gen.choose(0, 10)
      xs <- Gen.listOfN(2 * m + extra, Gen.choose(-50000L, 100000L))
      aInv <- Gen.choose(2, 6)
      bInv <- Gen.choose(2, 6)
      gInv <- Gen.choose(2, 6)
      h <- Gen.choose(1, 5)
    } yield (m, xs, aInv, bInv, gInv, h)
    val prop = Prop.forAll(genCase) { case (m, xs, aInv, bInv, gInv, h) =>
      val df = xs.zipWithIndex
        .map { case (x, i) => ((i + 1).toLong, x) }.toDF("i", "x")
      val (wantFit, (l, b, s)) = hwReplica(xs, m, aInv, bInv, gInv)
      val gotFit = TimeSeries
        .holtWintersAdditive(df, "i", "x", m, aInv, bInv, gInv)
        .select("idx", "fitted")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
      val gotFc = TimeSeries
        .holtWintersForecast(df, "i", "x", m, aInv, bInv, gInv, h)
        .select("h", "idx", "forecast")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val wantFc = (1 to h).map(k => (k.toLong, (xs.length + k).toLong,
        l + k * b + s((k - 1) % m)))
      gotFit == wantFit && gotFc == wantFc
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  // -------------------------------------------------------------- FS-EM

  /** The er9 classification-EM trajectory from
    * [[EntityResolution.fellegiSunterEmIterated]]'s scaladoc, replayed
    * in plain Scala over a COLLECTED candidate feature set: add-one
    * smoothed rates as integer ppm, ln-of-integer-products floored to
    * deci-units, hard reassignment under the refreshed weights (match
    * iff the summed weights exceed 0). Input rows:
    * (f_name, f_size, f_cat, f_price, fs_deci). */
  private def emReplica(rows: Seq[(Int, Int, Int, Int, Long)], steps: Int)
      : Seq[(Int, String, Long, Long, Long, Long, Long)] = {
    val feats = Seq("name", "size", "cat", "price")
    def fOf(r: (Int, Int, Int, Int, Long), f: String): Int = f match {
      case "name" => r._1; case "size" => r._2
      case "cat" => r._3; case "price" => r._4
    }
    var isM: Seq[Int] = rows.map(r => if (r._5 >= 60L) 1 else 0)
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Int, String, Long, Long, Long, Long, Long)]
    for (k <- 1 to steps) {
      val nM = isM.sum.toLong
      val nU = rows.size.toLong - nM
      val w = feats.map { f =>
        val am = rows.zip(isM).collect {
          case (r, 1) => fOf(r, f).toLong }.sum
        val au = rows.zip(isM).collect {
          case (r, 0) => fOf(r, f).toLong }.sum
        val mPpm = (am + 1) * 1000000L / (nM + 2)
        val uPpm = (au + 1) * 1000000L / (nU + 2)
        val wA = math.floor(math.log(
          ((am + 1) * (nU + 2)).toDouble / ((nM + 2) * (au + 1)).toDouble)
          / math.log(2.0) * 10.0).toLong
        val wD = math.floor(math.log(
          ((nM + 1 - am) * (nU + 2)).toDouble
            / ((nM + 2) * (nU + 1 - au)).toDouble)
          / math.log(2.0) * 10.0).toLong
        f -> (mPpm, uPpm, wA, wD)
      }
      w.foreach { case (f, (mPpm, uPpm, wA, wD)) =>
        out += ((k, f, mPpm, uPpm, wA, wD, nM))
      }
      if (k < steps) {
        val wMap = w.toMap
        isM = rows.map { r =>
          val score = feats.map { f =>
            val (_, _, wA, wD) = wMap(f)
            if (fOf(r, f) == 1) wA else wD
          }.sum
          if (score > 0L) 1 else 0
        }
      }
    }
    out.toSeq
  }

  test("property: fellegiSunterEmIterated trajectory equals the " +
      "plain-Scala classification-EM replay on random record sets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = Vector("acme", "corp", "widget")
    val genRecords = for {
      n <- Gen.choose(4, 10)
      rows <- Gen.listOfN(n, for {
        nTok <- Gen.choose(1, 2)
        toks <- Gen.listOfN(nTok, Gen.oneOf(vocab))
        block <- Gen.oneOf("b1", "b2")
        size <- Gen.choose(1, 4)
        cat <- Gen.oneOf("x", "y")
        price <- Gen.oneOf(10.0, 30.0, 80.0)
      } yield (toks.mkString(" "), block, size, cat, price))
      steps <- Gen.choose(1, 3)
    } yield (rows.zipWithIndex.map { case (r, i) =>
      ((i + 1).toLong, r._1, r._2, r._3, r._4, r._5) }, steps)
    val prop = Prop.forAll(genRecords) { case (rows, steps) =>
      val df = rows.toDF("pk", "name", "block", "size", "cat", "price")
      // the engine's own scorer supplies the candidate features (JW has
      // its own definition-level gates); what this property checks is
      // the EM recurrence DOWNSTREAM of scoring — the shared-formula
      // surface dual-engine oracles cannot probe
      val scored = EntityResolution
        .fellegiSunterScored(df, "pk", "name", "block", "size", "cat",
          "price", sizeTol = 1, priceTol = 25.0)
        .select(col("pk_a"), col("pk_b"), col("jw_u"), col("f_size"),
          col("f_cat"), col("f_price"), col("fs_deci"))
        .distinct()
        .withColumn("f_name", when(col("jw_u") >= 9000, 1).otherwise(0))
        .select(col("f_name"), col("f_size"), col("f_cat"),
          col("f_price"), col("fs_deci").cast("long"))
        .as[(Int, Int, Int, Int, Long)].collect().toSeq
      if (scored.isEmpty) true // no candidates: nothing to iterate
      else {
        val got = EntityResolution
          .fellegiSunterEmIterated(df, "pk", "name", "block", "size",
            "cat", "price", steps = steps, sizeTol = 1, priceTol = 25.0)
          .as[(Int, String, Long, Long, Long, Long, Long)]
          .collect().sortBy(r => (r._1, r._2)).toSeq
        got == emReplica(scored, steps).sortBy(r => (r._1, r._2))
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------- KN bigram (tx37)

  /** Interpolated Kneser-Ney bigram NLL from [[LanguageModel.knBigramNll]]'s
    * scaladoc, D = 3/4 as one exact BIGINT ratio:
    *   p = (max(4·c12 − 3, 0)·B + 3·N1l·N1r) / (4·c1·B),  B = N1+(·,·)
    * per-bigram ln floored to micro-nats BEFORE the per-doc sum. Docs
    * with < 2 tokens are absent (no bigrams). */
  private def knReplica(docs: Seq[(Long, Seq[String])])
      : Seq[(Long, Long, Double)] = {
    val withBigrams = docs
      .map { case (id, t) =>
        id -> t.sliding(2).filter(_.size == 2)
          .map(p => (p.head, p(1))).toSeq
      }
      .filter(_._2.nonEmpty)
    val all = withBigrams.flatMap(_._2)
    val c12 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = c12.toSeq.groupBy(_._1._1)
      .map { case (w1, xs) => w1 -> xs.map(_._2).sum }
    val n1l = c12.keys.toSeq.groupBy(_._1)
      .map { case (w1, ks) => w1 -> ks.size.toLong }
    val n1r = c12.keys.toSeq.groupBy(_._2)
      .map { case (w2, ks) => w2 -> ks.size.toLong }
    val nbg = c12.size.toLong
    withBigrams.map { case (id, bgs) =>
      val lpSum = bgs.map { case bg @ (w1, w2) =>
        val num = math.max(4L * c12(bg) - 3L, 0L) * nbg +
          3L * n1l(w1) * n1r(w2)
        val den = c1(w1) * 4L * nbg
        math.floor(math.log(num.toDouble / den.toDouble) * 1e6).toLong
      }.sum
      val n = bgs.size.toLong
      val nll = math.floor(
        -(lpSum.toDouble / 1e6) / n.toDouble * 1000.0) / 1000.0
      (id, n, nll)
    }.sortBy(_._1)
  }

  test("property: knBigramNll equals the plain-Scala Kneser-Ney " +
      "recurrence on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // lowercase-alnum single-space words: the engine tokenizer is the
    // identity on them, so the replica's token stream is the fixture's
    val word = Gen.choose(0, 7).map(i => s"w$i")
    val genDocs = for {
      n <- Gen.choose(1, 10)
      rows <- Gen.listOfN(n, Gen.choose(1, 10)
        .flatMap(len => Gen.listOfN(len, word)))
    } yield rows.zipWithIndex.map { case (t, i) => ((i + 1).toLong, t.toSeq) }
    val prop = Prop.forAll(genDocs) { docs =>
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = LanguageModel.knBigramNll(df, "doc_id", "text")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      got == knReplica(docs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  // --------------------------------------------- Heaps growth (tx40)

  /** Heaps vocabulary-growth from tx40's documented basis: cutoffs are
    * doc-id quartiles (m·k div 4, truncating div), a word belongs to a
    * prefix iff its FIRST (min) doc_id falls inside, and a (k, cutoff)
    * row exists only when both the doc count and the vocab count are
    * non-zero (inner join of two grouped aggregates). */
  private def heapsReplica(docs: Seq[(Long, Seq[String])])
      : Seq[(Long, Long, Long, Long)] = {
    val m = docs.map(_._1).max
    val firstDoc = docs.flatMap { case (id, t) => t.map(w => (w, id)) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).min }
    (1 to 4).map { k =>
      val cutoff = m * k / 4
      val nd = docs.count(_._1 <= cutoff).toLong
      val vs = firstDoc.values.count(_ <= cutoff).toLong
      (k.toLong, cutoff, nd, vs)
    }.filter(r => r._3 > 0 && r._4 > 0)
  }

  test("property: tx40 vocab growth equals the plain-Scala first-" +
      "occurrence prefix recurrence on random corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val word = Gen.choose(0, 7).map(i => s"w$i")
    val genDocs = for {
      n <- Gen.choose(1, 10)
      rows <- Gen.listOfN(n, Gen.choose(1, 8)
        .flatMap(len => Gen.listOfN(len, word)))
      // non-contiguous ids exercise the quartile arithmetic (cutoffs
      // need not hit an existing doc_id)
      gap <- Gen.choose(1, 3)
    } yield rows.zipWithIndex.map { case (t, i) =>
      ((i.toLong * gap + 1L), t.toSeq)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft-heaps-replica").toString
    val prop = Prop.forAll(genDocs) { docs =>
      docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      val got = graft.SparkEntry.queries("tx40_vocab_growth")(spark, dir)
        .select(col("k"), col("cutoff"), col("n_docs"), col("vocab_size"))
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      got == heapsReplica(docs)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}

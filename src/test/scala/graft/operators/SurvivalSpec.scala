package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10 subjects; events at t = 1 (x2), 3, 5, 7; censored at 2, 4, 5, 6, 8.
  // Hand-computed KM/NA table (nano-unit product with per-step floor):
  //   t=1: n=10 d=2  hazard=200000  na=200000
  //        s = 1e9*8 div 10         = 800000000  -> km 800000
  //   t=3: n=7  d=1  hazard=142857  na=342857
  //        s = 800000000*6 div 7    = 685714285  -> km 685714
  //   t=5: n=5  d=1  hazard=200000  na=542857
  //        s = 685714285*4 div 5    = 548571428  -> km 548571
  //   t=7: n=2  d=1  hazard=500000  na=1042857
  //        s = 548571428*1 div 2    = 274285714  -> km 274285
  private val obs = Seq(
    (1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L),
    (5L, 1L), (5L, 0L), (6L, 0L), (7L, 1L), (8L, 0L))

  test("kaplanMeier: hand-computed censored fixture, exact integer table") {
    val rows = Survival
      .kaplanMeier(obs.toDF("dur", "event"), "dur", "event")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, 10L, 2L, 0L, 200000L, 200000L, 800000L),
      (3L, 7L, 1L, 0L, 142857L, 342857L, 685714L),
      (5L, 5L, 1L, 1L, 200000L, 542857L, 548571L),
      (7L, 2L, 1L, 0L, 500000L, 1042857L, 274285L)))
  }

  test("kaplanMeier: no censoring telescopes to n_remaining/n_total") {
    // events at 1..4, one each, no censoring: KM after t=k is (4-k)/4
    // exactly (modulo the nano floor), NA accumulates floor(1e6/n)
    val all = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L))
    val rows = Survival
      .kaplanMeier(all.toDF("dur", "event"), "dur", "event")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._7)) === Seq(
      (1L, 4L, 750000L), (2L, 3L, 500000L),
      (3L, 2L, 250000L), (4L, 1L, 0L)))
  }

  test("cumulativeIncidence: hand-computed competing-risks fixture") {
    // 6 subjects; type 1 at t=1,3; type 2 at t=1,4; censored at 2, 5.
    //   t=1: n=6 d1=1 d2=1 -> c1 = c2 = 1e9 div 6 = 166666666,
    //        s = 1e9*4 div 6 = 666666666
    //   t=3: n=3 d1=1      -> c1 += 666666666 div 3 = 388888888,
    //        s = 666666666*2 div 3 = 444444444
    //   t=4: n=2 d2=1      -> c2 += 444444444 div 2 = 388888888,
    //        s = 444444444 div 2 = 222222222
    val obs2 = Seq((1L, 1L), (1L, 2L), (2L, 0L), (3L, 1L), (4L, 2L),
      (5L, 0L))
    val rows = Survival
      .cumulativeIncidence(obs2.toDF("dur", "typ"), "dur", "typ")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(rows === Seq(
      (1L, 6L, 1L, 1L, 0L, 666666L, 166666L, 166666L),
      (3L, 3L, 1L, 0L, 0L, 444444L, 388888L, 166666L),
      (4L, 2L, 0L, 1L, 0L, 222222L, 388888L, 388888L)))
    // conservation: mass is only ever moved, never created — every row's
    // surv + cif1 + cif2 sits within floor drift of exactly 1e6
    rows.foreach { r =>
      val mass = r._6 + r._7 + r._8
      assert(mass <= 1000000L && mass >= 999990L, s"mass leak: $r")
    }
  }

  test("cumulativeIncidence: single risk degenerates to 1 - KM") {
    // with no type-2 events, cif1 = 1e6 - surv (same floors), and surv
    // matches kaplanMeier's km_ppm on the same observations
    val one = Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L))
    val aj = Survival
      .cumulativeIncidence(one.toDF("dur", "typ"), "dur", "typ")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    val km = Survival
      .kaplanMeier(one.map { case (d, t) => (d, t) }
        .toDF("dur", "event"), "dur", "event")
      .orderBy("t").as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(aj.map(_._6) === km.map(_._7))
    aj.foreach(r => assert(r._8 === 0L))
  }

  test("kaplanMeier: partition-invariant (exact integers)") {
    val df = obs.toDF("dur", "event")
    val a = Survival.kaplanMeier(df, "dur", "event")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val b = Survival.kaplanMeier(df.repartition(7), "dur", "event")
      .orderBy("t")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(a === b)
  }
}

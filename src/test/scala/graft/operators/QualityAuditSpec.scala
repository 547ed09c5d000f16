package graft.operators

import graft.TestSpark
import graft.operators.QualityAudit._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def report(checks: Seq[Check],
      tabs: Map[String, org.apache.spark.sql.DataFrame]) =
    QualityAudit.run(spark, tabs, checks)
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap

  test("clean table passes every check kind") {
    val parent = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val child = Seq((10L, 1L, 5.0), (11L, 2L, 6.0)).toDF("cid", "pid", "amt")
    val got = report(Seq(
      Unique("parent", Seq("id")), NotNull("child", "pid"),
      Fk("child", "pid", "parent", "id"),
      InRange("child", "amt", 0.0, 10.0)),
      Map("parent" -> parent, "child" -> child))
    assert(got.values.forall { case (_, v, ok) => v == 0L && ok })
    assert(got("fk_pid_to_parent")._1 === 2L)
  }

  test("violations are counted, not just flagged") {
    val parent = Seq((1L, "x"), (1L, "x2"), (2L, "y"), (2L, "y2"), (3L, "z"))
      .toDF("id", "v")
    val child = Seq(
      (10L, Some(1L), 5.0), (11L, Some(9L), -1.0), (12L, None, 99.0),
      (13L, Some(8L), 3.0)
    ).toDF("cid", "pid", "amt")
    val got = report(Seq(
      Unique("parent", Seq("id")),       // 2 surplus rows
      NotNull("child", "pid"),           // 1 null
      Fk("child", "pid", "parent", "id"),// 9 and 8 are orphans
      InRange("child", "amt", 0.0, 10.0) // -1 and 99 out of range
    ), Map("parent" -> parent, "child" -> child))
    assert(got("unique_id") === ((5L, 2L, false)))
    assert(got("not_null_pid") === ((4L, 1L, false)))
    // FK checks only non-NULL children: 3 checked, 2 orphans
    assert(got("fk_pid_to_parent") === ((3L, 2L, false)))
    assert(got("range_amt") === ((4L, 2L, false)))
  }

  test("composite unique key counts surplus rows per full key") {
    val t = Seq((1L, 1, "a"), (1L, 2, "b"), (1L, 2, "c"), (1L, 2, "d"))
      .toDF("k1", "k2", "v")
    val got = report(Seq(Unique("t", Seq("k1", "k2"))), Map("t" -> t))
    assert(got("unique_k1_k2") === ((4L, 2L, false)))
  }

  test("empty table: zero checked, zero violations, ok") {
    val t = Seq.empty[(Long, Double)].toDF("id", "amt")
    val got = report(Seq(NotNull("t", "id"), Unique("t", Seq("id")),
      InRange("t", "amt", 0, 1)), Map("t" -> t))
    assert(got.values.forall { case (c, v, ok) => c == 0L && v == 0L && ok })
  }

  test("FK check prunes the parent scan to the key column") {
    val parent = (1L to 100L).map(i => (i, s"pad$i" * 10)).toDF("id", "pad")
    val child = (1L to 50L).map(i => (i * 3 % 120, i)).toDF("pid", "cid")
    val df = QualityAudit.run(spark,
      Map("p" -> parent, "c" -> child), Seq(Fk("c", "pid", "p", "id")))
    val scans = df.queryExecution.optimizedPlan.collect {
      case p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
          if p.children.isEmpty => p.output.map(_.name)
    }
    // no leaf relation under the FK check carries the parent's payload
    assert(scans.forall(cols => !cols.contains("pad")),
      s"parent payload column read: $scans")
  }

  test("psi drift: hand-computed bins, open edge bins, add-1 smoothing, " +
      "ln-floored nano contributions") {
    val spark2 = spark; import spark2.implicits._
    val base = Seq(0.0, 1.0, 2.0, 4.0).map(Tuple1(_)).toDF("v")
    val cur = Seq(-1.0, 0.5, 5.0, 5.0).map(Tuple1(_)).toDF("v")
    val r = QualityAudit.psiDrift(base, cur, "v", bins = 2)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5, x._6))).toMap
    // baseline lo=0 hi=4, width 2: 0,1 -> bin0; 2 -> bin1; the hi value 4
    // clamps into the last interior bin. Current: -1 below range -> bin -1,
    // 0.5 -> bin0, 5,5 above range -> bin 2 (= bins)
    assert(r.keySet === Set(-1, 0, 1, 2), r)
    assert(r(-1)._1 === 0L && r(-1)._2 === 1L)
    assert(r(0)._1 === 2L && r(0)._2 === 1L)
    assert(r(1)._1 === 2L && r(1)._2 === 0L)
    assert(r(2)._1 === 0L && r(2)._2 === 2L)
    // add-1 smoothing over a fixed bins+2=4 universe: denominators 4+4=8
    assert(r(0)._3 === 375000L && r(0)._4 === 250000L)
    assert(r(1)._3 === 375000L && r(1)._4 === 125000L)
    // same smoothed doubles the engine sees, floored once to nano
    def nano(nb: Long, nc: Long): Long = {
      val pa = (nb + 1).toDouble / 8.0; val pc = (nc + 1).toDouble / 8.0
      math.floor((pa - pc) * math.log(pa / pc) * 1e9).toLong
    }
    assert(r(-1)._5 === nano(0, 1))
    assert(r(1)._5 === nano(2, 0))
    assert(r(2)._5 === nano(0, 2))
    // (p-q) and ln(p/q) always share sign: every contribution >= 0
    assert(r.values.forall(_._5 >= 0L), r)
  }

  test("psi drift: degenerate single-value baseline collapses to bin 0; " +
      "partitioning invariance") {
    val spark2 = spark; import spark2.implicits._
    val base = Seq(7.0, 7.0, 7.0).map(Tuple1(_)).toDF("v")
    val cur = Seq(3.0, 7.0, 11.0).map(Tuple1(_)).toDF("v")
    val one = QualityAudit.psiDrift(base, cur, "v").collect()
    assert(one.length === 1 && one.head.getInt(0) === 0)
    assert(one.head.getLong(1) === 3L && one.head.getLong(2) === 3L)
    val o = Seq.tabulate(64)(i => (i % 7).toDouble).map(Tuple1(_)).toDF("v")
    val c = Seq.tabulate(64)(i => (i % 5).toDouble).map(Tuple1(_)).toDF("v")
    val a = QualityAudit.psiDrift(o, c, "v", bins = 4)
    val b = QualityAudit.psiDrift(
      o.repartition(7), c.repartition(3), "v", bins = 4)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("ks drift: hand-computed binned CDF gaps, exact ppm") {
    val spark2 = spark; import spark2.implicits._
    val base = Seq(0.0, 1.0, 2.0, 4.0).map(Tuple1(_)).toDF("v")
    val cur = Seq(-1.0, 0.5, 5.0, 5.0).map(Tuple1(_)).toDF("v")
    val r = QualityAudit.ksDrift(base, cur, "v", bins = 2)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5, x._6))).toMap
    // same binning as the psi spec: cum_base 0,2,4,4 / cum_cur 1,2,2,4
    assert(r.keySet === Set(-1, 0, 1, 2), r)
    assert(r(-1) === ((0L, 1L, 0L, 250000L, 250000L)))
    assert(r(0) === ((2L, 1L, 500000L, 500000L, 0L)))
    assert(r(1) === ((2L, 0L, 1000000L, 500000L, 500000L)))
    assert(r(2) === ((0L, 2L, 1000000L, 1000000L, 0L)))
    // decision scalar: D = max gap = 0.5 at bin 1
    assert(r.values.map(_._5).max === 500000L)
  }

  test("ks drift: identical sides gap 0; empty current side guarded; " +
      "partitioning invariance") {
    val spark2 = spark; import spark2.implicits._
    val d = Seq.tabulate(50)(i => (i % 11).toDouble).map(Tuple1(_)).toDF("v")
    val same = QualityAudit.ksDrift(d, d, "v", bins = 5).collect()
    assert(same.nonEmpty && same.forall(_.getLong(5) === 0L))
    // top bin closes both CDFs at exactly 1e6 (integer div is exact there)
    assert(same.map(_.getLong(3)).max === 1000000L)
    val none = Seq.empty[Double].toDF("v")
    val e = QualityAudit.ksDrift(d, none, "v", bins = 5).collect()
    assert(e.nonEmpty && e.forall(r => r.getLong(4) === 0L &&
      r.getLong(5) === r.getLong(3)), e.mkString(","))
    val c = Seq.tabulate(50)(i => (i % 7).toDouble).map(Tuple1(_)).toDF("v")
    val a = QualityAudit.ksDrift(d, c, "v", bins = 5)
    val b = QualityAudit.ksDrift(d.repartition(7), c.repartition(3), "v",
      bins = 5)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("column profile: nulls/distincts/top-share/entropy hand-computed, " +
      "largest-value tie-break, partitioning invariance") {
    val spark2 = spark; import spark2.implicits._
    // col a: b,b,a,a,c,NULL -> 5 valid, 3 distinct, tie 2-2 -> top 'b'
    // col k: constant -> entropy exactly 0
    val df = Seq(
      (Some("b"), 1L), (Some("b"), 1L), (Some("a"), 1L), (Some("a"), 1L),
      (Some("c"), 1L), (None, 1L)
    ).toDF("a", "k")
    val r = QualityAudit.columnProfile(df, Seq("a", "k"))
      .as[(String, Long, Long, Long, String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5, x._6, x._7))).toMap
    val ent = {
      def term(c: Long) =
        math.floor((c.toDouble / 5.0) * math.log(5.0 / c) * 1e9).toLong
      term(2) + term(2) + term(1)
    }
    assert(r("a") === ((6L, 1L, 3L, "b", 400000L, ent)))
    assert(r("k") === ((6L, 0L, 1L, "1", 1000000L, 0L)))
    val again = QualityAudit.columnProfile(df.repartition(5), Seq("a", "k"))
      .as[(String, Long, Long, Long, String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5, x._6, x._7))).toMap
    assert(again === r)
  }

  test("fd audit: violations counted per key, nulls excluded on the " +
      "determinant and ignored on the dependent") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq[(Option[Int], Option[String])](
      (Some(1), Some("a")), (Some(1), Some("a")), (Some(2), Some("a")),
      (Some(2), Some("b")), (Some(3), None), (None, Some("c"))
    ).toDF("k", "v")
    val r = QualityAudit.fdAudit(df, Seq(("k", "v"), ("v", "k")))
      .as[(String, String, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    // k->v: keys 1 (nd 1), 2 (nd 2, violates), 3 (all-NULL dep, nd 0)
    assert(r(("k", "v")) === ((3L, 1L, 333333L)))
    // v->k: a {1,2} violates, b {2}, c (NULL dep ignored -> nd 0)
    assert(r(("v", "k")) === ((3L, 1L, 333333L)))
    val again = QualityAudit.fdAudit(df.repartition(5),
      Seq(("k", "v"), ("v", "k")))
      .as[(String, String, Long, Long, Long)].collect()
      .map(x => (x._1, x._2) -> ((x._3, x._4, x._5))).toMap
    assert(again === r)
  }

  test("benford audit: string-derived first digits, exact ppm, " +
      "non-positive values excluded") {
    val spark2 = spark; import spark2.implicits._
    // one value per digit (uniform observed 1/9), plus excluded junk:
    // zero, negative, and a sub-cent positive that floors to cents 0
    val vals = Seq(1.00, 23.45, 345.0, 4.99, 0.05, 678.9, 7e6, 0.80, 9999.99,
      0.0, -5.0, 0.001)
    val df = vals.map(Tuple1(_)).toDF("v")
    val r = QualityAudit.benfordAudit(df, "v")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    // digits: 100->1, 2345->2, 34500->3, 499->4, 5->5, 67890->6, 7e8->7,
    // 80->8, 999999->9; nine observations, one each
    assert(r.keySet === (1L to 9L).toSet, r)
    assert(r.values.forall(_._1 == 1L), r)
    assert(r.values.forall(_._2 == 111111L), "uniform obs_ppm = 1e6 div 9")
    assert(r(1L)._3 === 301029L && r(9L)._3 === 45757L)
    assert(r(1L)._4 === 111111L - 301029L, "signed deviation")
    // partitioning invariance
    val r2 = QualityAudit.benfordAudit(df.repartition(5), "v")
    assert(QualityAudit.benfordAudit(df, "v").exceptAll(r2).count() === 0)
  }

  test("rateControlChart: hand-computed 3-sigma verdicts on both sides") {
    // three 100-row days with 10 / 50 / 0 defects: center = 60/300 =
    // 200000 ppm; sigma^2 test boundary 9*c*(1e6-c) = 1.44e12.
    // day1 d=-1e5 -> d^2*n = 1e12 (in); day2 d=3e5 -> 9e12 (out high);
    // day3 d=-2e5 -> 4e12 (out low)
    val rows = (1 to 100).map(i => ("d1", i <= 10)) ++
      (1 to 100).map(i => ("d2", i <= 50)) ++
      (1 to 100).map(i => ("d3", false))
    val df = rows.toDF("bucket", "bad")
    val r = QualityAudit.rateControlChart(df, col("bucket"), col("bad"))
      .select("bucket", "rate_ppm", "center_ppm", "out_of_control",
        "side")
      .as[(String, Long, Long, Boolean, String)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("d1") === (("d1", 100000L, 200000L, false, "in")))
    assert(r("d2") === (("d2", 500000L, 200000L, true, "high")))
    assert(r("d3") === (("d3", 0L, 200000L, true, "low")))
  }

  test("rateControlChart: uniform rates are all in control; single " +
      "bucket sits exactly on its own center line") {
    val uni = (1 to 3).flatMap(d =>
      (1 to 40).map(i => (s"d$d", i <= 4))).toDF("bucket", "bad")
    val ru = QualityAudit.rateControlChart(uni, col("bucket"),
      col("bad"))
    assert(ru.filter(col("out_of_control")).count() === 0)
    assert(ru.select("side").as[String].collect().forall(_ == "in"))
    val one = (1 to 40).map(i => ("only", i <= 7)).toDF("bucket", "bad")
    val ro = QualityAudit.rateControlChart(one, col("bucket"),
        col("bad"))
      .select("rate_ppm", "center_ppm", "out_of_control")
      .as[(Long, Long, Boolean)].collect().head
    assert(ro._1 === ro._2 && !ro._3)
  }

  test("chi2: exactly independent table scores zero on every cell") {
    // O(x,u)=2 O(x,v)=2 O(y,u)=1 O(y,v)=1: every E equals its O
    val rows = Seq.fill(2)(("x", "u")) ++ Seq.fill(2)(("x", "v")) ++
      Seq(("y", "u"), ("y", "v"))
    val r = QualityAudit.chi2Independence(rows.toDF("a", "b"), "a", "b")
    assert(r.filter($"contrib_micro" =!= 0L).count() === 0)
    assert(r.select("chi2_micro").as[Long].head() === 0L)
    assert(r.select("dof").as[Long].head() === 1L)
  }

  test("chi2: perfect 2x2 association scores chi2 = n, with structural " +
      "zeros present as real cells") {
    // only (x,u) and (y,v) occur; classic result chi2 = n = 4
    val rows = Seq.fill(2)(("x", "u")) ++ Seq.fill(2)(("y", "v"))
    val r = QualityAudit.chi2Independence(rows.toDF("a", "b"), "a", "b")
    assert(r.count() === 4) // includes the two zero cells
    assert(r.filter($"observed" === 0L).count() === 2)
    // every cell: E = 1 -> E_micro 1e6, diff 1e6, contrib 1e6
    assert(r.select("contrib_micro").as[Long].collect().toSeq ===
      Seq.fill(4)(1000000L))
    assert(r.select("chi2_micro").as[Long].head() === 4000000L)
  }

  test("constraint audit: one pass, FALSE violates, NULL does not") {
    val df = Seq[(java.lang.Long, String)](
      (5L, "a"), (-1L, "b"), (null, "a"), (200L, "a"))
      .toDF("v", "tag")
    val r = QualityAudit.constraintAudit(df, Seq(
        "v_positive" -> ($"v" > 0L),
        "v_under_100" -> ($"v" < 100L),
        "v_not_null" -> $"v".isNotNull,
        "tag_in_domain" -> $"tag".isin("a", "b")))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(r === Seq(
      ("tag_in_domain", 0L, 4L, 0L),
      // null v: > and < are NULL, not violations; isNotNull is FALSE
      ("v_not_null", 1L, 4L, 250000L),
      ("v_positive", 1L, 4L, 250000L),
      ("v_under_100", 1L, 4L, 250000L)))
  }

  test("constraint audit: single aggregate pass — no scan per rule") {
    val rules = (1 to 8).map(i => (s"r$i", $"v" =!= i.toLong))
    val plan = QualityAudit.constraintAudit(
        Seq(1L, 2L).toDF("v"), rules)
      .queryExecution.executedPlan.toString
    // one scan feeding one aggregate chain; 8 rules never mean 8 scans
    assert("LocalTableScan".r.findAllIn(plan).size === 1)
  }

  test("correlation matrix: hand-computed pair, perfect and inverse") {
    // x=(1,2,3) y=(1,3,4): cov=3*19-6*8=9, vx=3*14-36=6, vy=3*26-64=14
    // r2_ppm = ((9e9 div 6)*9 div 14) div 1000
    //        = 13_500_000_000 div 14 div 1000 = 964_285
    val df = Seq((1L, 1L, 1L, 3L), (2L, 3L, 2L, 2L), (3L, 4L, 3L, 1L))
      .toDF("x", "y", "ident", "neg")
    val r = QualityAudit.correlationMatrix(df,
        Seq("x", "y", "ident", "neg"))
      .as[(String, String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._4, t._5))).toMap
    assert(r.size === 6)
    assert(r(("x", "y")) === ((964285L, 1L)))
    assert(r(("x", "ident")) === ((1000000L, 1L)))  // y = x exactly
    assert(r(("x", "neg")) === ((1000000L, -1L)))   // y = 4 - x
    assert(r(("ident", "neg")) === ((1000000L, -1L)))
  }

  test("correlation matrix: mixed-scale pair does not underflow to 0") {
    // big = 1e7 * small: vx/|cov| = 1e7, so a 1e6-scaled first quotient
    // would floor to 0 and report r2 = 0 for a PERFECT correlation; the
    // 1e9 first-step scale keeps 3 digits of headroom (ADVICE r8)
    val df = Seq((10000000L, 1L), (20000000L, 2L), (30000000L, 3L))
      .toDF("big", "small")
    val r = QualityAudit.correlationMatrix(df, Seq("big", "small"))
      .as[(String, String, Long, Long, Long)].head()
    assert((r._4, r._5) === ((1000000L, 1L)))
  }

  test("correlation matrix: constant column reports 0 with sign 0") {
    val df = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "c")
    val r = QualityAudit.correlationMatrix(df, Seq("x", "c"))
      .as[(String, String, Long, Long, Long)].head()
    assert((r._4, r._5) === ((0L, 0L)))
  }

  test("correlation matrix: one aggregate pass — no scan per pair") {
    val df = Seq((1L, 2L, 3L, 4L), (5L, 6L, 7L, 8L))
      .toDF("a", "b", "c", "d")
    val plan = QualityAudit.correlationMatrix(df, Seq("a", "b", "c", "d"))
      .queryExecution.executedPlan.toString
    // 6 pairs never mean 6 scans: one LocalTableScan feeds one agg chain
    assert("LocalTableScan".r.findAllIn(plan).size === 1)
  }

  test("correlation matrix: partitioning-invariant") {
    val rows = (1 to 97).map(i =>
      (i.toLong, (i * i % 31).toLong, (97 - i).toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityAudit.correlationMatrix(df, Seq("a", "b", "c"))
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(run(rows.toDF("a", "b", "c")) ===
      run(rows.toDF("a", "b", "c").repartition(13)))
  }

  test("sprtMonitor: hand-computed crossings in both directions") {
    // increments +100 per defect, -50 per clean, bound 120
    // day a: 2 defects, 1 clean -> +150 -> reject
    // day b (starts fresh series below): cum continues: 150 - 200 = -50
    //   -> continue; day c: -50 - 150 = -200 -> accept
    val rows = Seq(("a", true), ("a", true), ("a", false),
      ("b", false), ("b", false), ("b", false), ("b", false),
      ("c", false), ("c", false), ("c", false))
    val df = rows.toDF("day", "bad")
    val r = QualityAudit.sprtMonitor(df, col("day"), col("bad"),
        llr1Milli = 100L, llr0Milli = -50L, boundMilli = 120L)
      .as[(String, Long, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._4, t._5))).toMap
    assert(r === Map("a" -> ((150L, "reject_h0")),
      "b" -> ((-50L, "continue")), "c" -> ((-200L, "accept_h0"))))
  }

  test("sprtMonitor: partitioning-invariant") {
    val rows = (1 to 300).map(i => (s"d${i % 9}", i % 4 == 0))
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityAudit.sprtMonitor(df, col("day"), col("bad"),
        510L, -126L, 2944L)
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(run(rows.toDF("day", "bad")) ===
      run(rows.toDF("day", "bad").repartition(13)))
  }

  test("chi2: partitioning-invariant") {
    val rows = (1 to 60).map(i => (s"a${i % 3}", s"b${i % 4}"))
    def run(df: org.apache.spark.sql.DataFrame) =
      QualityAudit.chi2Independence(df, "a", "b")
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(run(rows.toDF("a", "b")) ===
      run(rows.toDF("a", "b").repartition(11)))
  }
}

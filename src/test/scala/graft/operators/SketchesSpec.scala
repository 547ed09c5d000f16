package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq.tabulate(300)(i =>
    (s"g${i % 3}", (i % 17).toLong)).toDF("grp", "k")

  test("CMS linearity: merged per-group sketches equal the sketch " +
      "built directly over the union, bit for bit") {
    val perGroup = Sketches.countMinByGroup(corpus, "grp", "k")
    val merged = Sketches.mergeCountMin(perGroup)
    val direct = Sketches.mergeCountMin(
      Sketches.countMinByGroup(corpus.withColumn("one", lit("all")),
        "one", "k"))
    assert(merged.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(merged).count() === 0)
  }

  test("sketch size is bounded by depth*width per group regardless of " +
      "key cardinality") {
    val wide = Seq.tabulate(5000)(i => ("g", i.toLong)).toDF("grp", "k")
    val sk = Sketches.countMinByGroup(wide, "grp", "k", depth = 4,
      width = 64)
    assert(sk.count() <= 4L * 64)
    assert(sk.agg(sum("cell")).head().getLong(0) === 4L * 5000)
  }

  test("probe never underestimates and is exact when keys don't collide") {
    val probes = corpus.groupBy("k").agg(count(lit(1)).as("exact"))
    val merged = Sketches.mergeCountMin(
      Sketches.countMinByGroup(corpus, "grp", "k"))
    val est = Sketches.probeCountMin(merged, probes, "k")
      .as[(Long, Long, Long)].collect()
    assert(est.length === 17)
    assert(est.forall { case (_, exact, cms) => cms >= exact })
    // 17 keys into 64 buckets x 4 rows: at least one depth row separates
    // every key pair with overwhelming probability on this fixed corpus,
    // so the min-over-depth estimate is exact here
    assert(est.forall { case (_, exact, cms) => cms === exact },
      est.mkString(","))
  }

  test("column stats: KMV merge of per-group sketches equals the " +
      "single-group sketch; counts/extrema fold") {
    val df = Seq.tabulate(200)(i =>
      (s"d${i % 4}", if (i % 19 == 0) None else Some((i % 37).toLong)))
      .toDF("grp", "v")
    val perGroup = Sketches.columnStatsByGroup(df, "grp", "v")
    val merged = Sketches.mergeColumnStats(perGroup)
    val direct = Sketches.mergeColumnStats(
      Sketches.columnStatsByGroup(df.withColumn("one", lit("all")),
        "one", "v"))
    assert(merged.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(merged).count() === 0)
    val row = merged.head()
    assert(row.getLong(0) === 200L)
    assert(row.getLong(1) === Seq.range(0, 200).count(_ % 19 == 0).toLong)
    // i=37 contributes v=0 (37 % 19 != 0), so the min is 0
    assert(row.getLong(2) === 0L && row.getLong(3) === 36L)
  }

  test("column stats: fewer distinct hashes than k makes est_distinct " +
      "exact; all-null group carries an empty sketch") {
    val spark2 = spark; import spark2.implicits._
    val df = Seq[(String, Option[Long])](
      ("a", Some(1L)), ("a", Some(2L)), ("a", Some(1L)),
      ("b", None), ("b", None)).toDF("grp", "v")
    val per = Sketches.columnStatsByGroup(df, "grp", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(per("b").getLong(1) === 2L && per("b").getSeq[Long](5).isEmpty)
    assert(per("a").getSeq[Long](5).length === 2)
    val m = Sketches.mergeColumnStats(
      Sketches.columnStatsByGroup(df, "grp", "v")).head()
    assert(m.getDouble(5) === 2.0) // < k distinct -> sketch size, exact
  }

  test("incremental micro-batch fold (the st13 foreachBatch shape) " +
      "equals the direct one-shot sketch regardless of batch boundaries") {
    val spark2 = spark; import spark2.implicits._
    val all = Seq.tabulate(90)(i => (i % 13).toLong)
    def sk(xs: Seq[Long]) = Sketches.countMinByGroup(
      xs.map(x => (0, x)).toDF("one", "k"), "one", "k")
      .select("d", "bucket", "cell")
    val direct = sk(all)
    def fold(batches: Seq[Seq[Long]]) =
      batches.map(sk).reduce((st, b) =>
        Sketches.mergeCountMin(st.unionAll(b)))
    val even = fold(Seq(all.take(30), all.slice(30, 60), all.drop(60)))
    val skewed = fold(Seq(all.take(1), all.drop(1)))
    assert(even.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(even).count() === 0)
    assert(skewed.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(skewed).count() === 0)
  }

  test("partitioning invariance of build + merge + probe") {
    val probes = corpus.select("k").distinct()
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.probeCountMin(
        Sketches.mergeCountMin(Sketches.countMinByGroup(df, "grp", "k")),
        probes, "k")
    val a = run(corpus)
    val b = run(corpus.repartition(13))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  // day 1: users {1,2}; day 2: {2,3}; day 4: {9} — day 3 absent
  private def dailyEvents = Seq(
    (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (4L, 9L))
    .toDF("day", "uid")

  test("slidingNdv: windows anchor only at present days; below-k " +
      "windows report the exact union size") {
    val art = Sketches.columnStatsByGroup(dailyEvents, "day", "uid", 16)
    val r = Sketches.slidingNdv(art, "grp", windowDays = 7, k = 16)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // wd=1: day1 only -> {1,2}; wd=2: day1+2 -> {1,2,3};
    // wd=4: day1+2+4 -> {1,2,3,9}; wd=3 never appears
    assert(r === Seq((1L, 1L, 2L, 2.0), (2L, 2L, 4L, 3.0),
      (4L, 3L, 5L, 4.0)))
  }

  test("slidingNdv: a window never reaches back further than " +
      "windowDays") {
    val art = Sketches.columnStatsByGroup(dailyEvents, "day", "uid", 16)
    val r = Sketches.slidingNdv(art, "grp", windowDays = 2, k = 16)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // wd=4 with W=2 sees only day 4 (day 2 is 2 back, outside [3,4])
    assert(r === Seq((1L, 1L, 2L, 2.0), (2L, 2L, 4L, 3.0),
      (4L, 1L, 1L, 1.0)))
  }

  test("slidingNdv: merged window bottom-k equals the bottom-k of the " +
      "union (k smaller than the union)") {
    val many = (1L to 40L).map(u => (1L, u)) ++
      (41L to 80L).map(u => (2L, u))
    val art = Sketches.columnStatsByGroup(
      many.toDF("day", "uid"), "day", "uid", 4)
    val win = Sketches.slidingNdv(art, "grp", 7, 4)
      .filter($"d" === 2L).select("est_distinct").as[Double].head()
    // ground truth: 3 * 2^31 / h_4 over the union of BOTH days' hashes
    val h4 = (1L to 80L).map(u => (u * 2654435761L) % 2147483648L)
      .distinct.sorted.apply(3)
    assert(win === math.floor(3.0 * 2147483648.0 / h4 * 100.0) / 100.0)
  }

  test("foldColumnStats is closed: folding split artifacts equals " +
      "sketching the whole input, any split, any order") {
    // > k distinct per group so the bottom-k genuinely truncates
    val rows = (1 to 400).map(i => ((i % 3).toLong, (i * 48271L) % 977L))
    val df = rows.toDF("day", "uid")
    val whole = Sketches.columnStatsByGroup(df, "day", "uid", 4)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    def part(p: Long => Boolean) = Sketches.columnStatsByGroup(
      rows.filter(r => p(r._2)).toDF("day", "uid"), "day", "uid", 4)
    val foldedAB = Sketches.foldColumnStats(
      part(_ % 2 == 0).unionAll(part(_ % 2 == 1)), 4)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(foldedAB === whole)
    // re-folding an already-folded artifact is a no-op (closure)
    val refold = Sketches.foldColumnStats(
      Sketches.foldColumnStats(
        part(_ % 2 == 0).unionAll(part(_ % 2 == 1)), 4), 4)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(refold === whole)
  }

  test("columnStatsByGroup builds its sketch via the k-capped partial " +
      "aggregate — no distinct + rank window on the hash stream") {
    val plan = Sketches.columnStatsByGroup(dailyEvents, "day", "uid", 4)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("kmvbottomk"))
    assert(!plan.contains("Window"))
  }

  test("slidingNdv: partitioning-invariant") {
    val df = dailyEvents
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.slidingNdv(
        Sketches.columnStatsByGroup(d, "day", "uid", 16), "grp", 7, 16)
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(run(df) === run(df.repartition(7)))
  }

  test("slidingQuantile: hand-computed buckets, saturation clamp, " +
      "ceil-k pick") {
    import spark.implicits._
    // width 10, 4 buckets (clamp at 3): day1 cents {5, -7 -> b0, 15 ->
    // b1, 100 -> clamped b3}, day2 {25 -> b2}; window 2 days
    val d = Seq((1L, 5L), (1L, -7L), (1L, 15L), (1L, 100L), (2L, 25L))
      .toDF("day", "cents")
    val daily = Sketches.histogramByGroup(d, "day", "cents", 10L, 4)
    val r = Sketches.slidingQuantile(daily, "grp", windowDays = 2,
        bucketWidth = 10L, quantilesPc = Seq(50, 100))
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    // wd1 = day1 alone (n=4): k50=ceil(2)=2 -> b0, k100=4 -> b3 (lo 30)
    // wd2 = day1+day2 (n=5): k50=ceil(2.5)=3 -> b1 (lo 10), k100=5 -> b3
    assert(r === Map((1L, 50L) -> ((4L, 0L)), (1L, 100L) -> ((4L, 30L)),
      (2L, 50L) -> ((5L, 10L)), (2L, 100L) -> ((5L, 30L))))
  }

  test("slidingQuantile: histogram merge = count addition; " +
      "partitioning-invariant") {
    import spark.implicits._
    val rows = (1 to 400).map(i =>
      ((i % 10).toLong + 1L, (i * 37 % 500).toLong))
    val df = rows.toDF("day", "cents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.slidingQuantile(
        Sketches.histogramByGroup(d, "day", "cents", 16L, 64),
        "grp", 3, 16L, Seq(25, 50, 95))
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(run(df) === run(df.repartition(9)))
    // merging two disjoint halves' histograms = histogram of the union
    val h = Sketches.histogramByGroup(df, "day", "cents", 16L, 64)
    val parts = Seq(0, 1).map(p => Sketches.histogramByGroup(
      df.where(col("cents") % 2 === p), "day", "cents", 16L, 64))
    val folded = parts.reduce(_ unionAll _)
      .groupBy("grp", "bucket")
      .agg(sum(col("cnt")).as("cnt"))
    assert(folded.collect().map(_.toSeq).sortBy(_.mkString).toSeq ===
      h.collect().map(_.toSeq).sortBy(_.mkString).toSeq)
  }
}

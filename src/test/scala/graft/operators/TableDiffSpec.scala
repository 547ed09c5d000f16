package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies added/removed/changed and drops unchanged keys") {
    val before = Seq(
      (1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"), (4L, 40.0, "D")
    ).toDF("pk", "price", "status")
    val after = Seq(
      (1L, 10.0, "A"),   // unchanged
      (2L, 25.0, "B"),   // price changed
      (4L, 40.0, "E"),   // status changed
      (5L, 50.0, "F")    // added
    ).toDF("pk", "price", "status")
    val got = TableDiff.diff(before, after, "pk", Seq("price", "status"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added"))
  }

  test("diff treats nulls with null-safe equality") {
    val before = Seq((1L, Some(1.0)), (2L, None: Option[Double]))
      .toDF("pk", "v")
    val sameNull = Seq((1L, Some(1.0)), (2L, None: Option[Double]))
      .toDF("pk", "v")
    assert(TableDiff.diff(before, sameNull, "pk", Seq("v")).count() === 0,
      "null == null under null-safe compare")
    val nullToValue = Seq((1L, Some(1.0)), (2L, Some(2.0))).toDF("pk", "v")
    val got = TableDiff.diff(before, nullToValue, "pk", Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(2L -> "changed"))
    assertThrows[IllegalArgumentException] {
      TableDiff.diff(before, sameNull, "pk", Nil)
    }
  }

  test("identical snapshots produce an empty diff on any partitioning") {
    val t0 = (1L to 1000L).map(i => (i, i * 1.5, s"s${i % 7}"))
      .toDF("pk", "v", "s")
    assert(TableDiff.diff(t0, t0.repartition(13), "pk", Seq("v", "s"))
      .count() === 0)
  }

  test("null primary keys classify by side presence, not by pk nullness") {
    val before = Seq((Some(1L), 1.0), (None: Option[Long], 9.0)).toDF("pk", "v")
    val after = Seq((Some(1L), 1.0), (None: Option[Long], 9.0)).toDF("pk", "v")
    // null pks never join: the before-side null is a removal, the
    // after-side null an addition — classified by origin, not pk value
    val got = TableDiff.diff(before, after, "pk", Seq("v"))
      .groupBy("diff_status").count()
      .as[(String, Long)].collect().toMap
    assert(got === Map("removed" -> 1L, "added" -> 1L))
  }

  test("reconcile: identical sides match; any lost key flips the " +
      "checksum; result is partition-invariant") {
    import spark.implicits._
    val t = (1L to 500L).map(i => (i, i % 7)).toDF("k", "sub")
    val same = TableDiff.reconcile(t, t.repartition(9), Seq("k", "sub"))
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().head
    assert(same._5 && same._6, s"identical sides must reconcile: $same")
    assert(same._3 === same._4)
    val lossy = TableDiff.reconcile(t, t.filter($"k" =!= 250L),
        Seq("k", "sub"))
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().head
    assert(!lossy._5 && !lossy._6, s"one lost row must fail both: $lossy")
    // same count but different keys: rows_match true, checksum catches it
    val swapped = TableDiff.reconcile(t,
        t.withColumn("k", when($"k" === 250L, 9999L).otherwise($"k")),
        Seq("k", "sub"))
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().head
    assert(swapped._5 && !swapped._6,
      s"count alone must not vouch for completeness: $swapped")
  }

  test("chainManifest: tampering any batch changes every LATER chain " +
      "hash and no earlier one") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (i, s"d${i % 5}"))
    val t = rows.toDF("k", "day")
    def chain(df: org.apache.spark.sql.DataFrame) =
      TableDiff.chainManifest(df, col("day"), Seq("k"))
        .as[(String, Long, Long, String)].collect().sortBy(_._1).toSeq
    val base = chain(t)
    assert(base.map(_._1) === Seq("d0", "d1", "d2", "d3", "d4"))
    assert(base.map(_._4).distinct.size === 5) // chains all distinct
    // edit ONE row inside day d2 (k=7 -> k=9999)
    val tampered = chain(t.withColumn("k",
      when($"k" === 7L, 9999L).otherwise($"k")))
    val diff = base.zip(tampered).map { case (a, b) => a._4 != b._4 }
    // d0, d1 untouched; d2 and every later day's chain hash changes
    assert(diff === Seq(false, false, true, true, true), s"$diff")
    // dropping a whole day shifts every later chain too
    val dropped = chain(t.where($"day" =!= "d1"))
    assert(dropped.map(_._1) === Seq("d0", "d2", "d3", "d4"))
    assert(dropped.head._4 === base.head._4)
    assert(dropped(1)._4 !== base(2)._4)
  }

  test("dayFingerprints fold is CLOSED: folding disjoint splits " +
      "bit-equals the one-shot chain (micro-batch boundaries invisible)") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i, s"d${i % 6}"))
    val t = rows.toDF("k", "day")
    val direct = TableDiff.chainManifest(t, col("day"), Seq("k"))
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    // three disjoint "micro-batches", folded pairwise like foreachBatch
    val parts = Seq(0L, 1L, 2L).map(r =>
      TableDiff.dayFingerprints(t.where($"k" % 3 === r), col("day"),
        Seq("k")))
    val folded = parts.reduce((a, b) =>
      TableDiff.foldDailyFingerprints(a.unionAll(b)))
    val streamed = TableDiff.chainFromDaily(folded)
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(streamed === direct)
  }

  test("chainManifest: partitioning-invariant (order-free XOR + " +
      "sorted fold)") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i * 13 % 997, s"b${i % 7}"))
    val t = rows.toDF("k", "day")
    def run(df: org.apache.spark.sql.DataFrame) =
      TableDiff.chainManifest(df, col("day"), Seq("k"))
        .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(run(t) === run(t.repartition(11)))
  }
}

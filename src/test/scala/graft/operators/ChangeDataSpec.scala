package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChangeDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("pk", "name", "bal")

  test("latest op per key wins: U updates, D deletes, I inserts") {
    val log = Seq(
      (1L, 1L, "U", 11.0),  // superseded
      (1L, 5L, "U", 15.0),  // winner for key 1
      (2L, 2L, "D", 0.0),   // delete key 2
      (4L, 3L, "I", 40.0)   // fresh insert
    ).toDF("pk", "seq", "op", "bal")
    val got = ChangeData.applyChangelog(snap, log, "pk", "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, "a", 15.0),        // payload applied, snapshot name carried
      (3L, "c", 30.0),        // untouched
      (4L, null, 40.0)))      // insert: snapshot-only column is NULL
  }

  test("delete then later re-insert resurrects the key") {
    val log = Seq(
      (2L, 1L, "D", 0.0),
      (2L, 9L, "I", 99.0)
    ).toDF("pk", "seq", "op", "bal")
    val got = ChangeData.applyChangelog(snap, log, "pk", "seq", "op")
      .filter($"pk" === 2L).as[(Long, String, Double)].collect()
    assert(got.toSeq === Seq((2L, "b", 99.0)))
  }

  test("sequence tie: D outranks U outranks I (conservative read)") {
    val log = Seq(
      (1L, 7L, "U", 99.0),
      (1L, 7L, "D", 0.0)
    ).toDF("pk", "seq", "op", "bal")
    val got = ChangeData.applyChangelog(snap, log, "pk", "seq", "op")
    assert(got.filter($"pk" === 1L).count() === 0, "D wins the tie")
  }

  test("empty changelog is the identity") {
    val log = Seq.empty[(Long, Long, String, Double)]
      .toDF("pk", "seq", "op", "bal")
    val got = ChangeData.applyChangelog(snap, log, "pk", "seq", "op")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", 10.0), (2L, "b", 20.0),
      (3L, "c", 30.0)))
  }

  test("versioned apply: any batch order converges to the global apply") {
    val log = (1L to 300L).map { i =>
      (i % 25, i, Seq("I", "U", "D")((i % 3).toInt), i * 1.0)
    }.toDF("pk", "seq", "op", "bal")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], log.schema)
    val global = ChangeData.applyVersioned(empty, log, "pk", "seq", "op")
      .orderBy("pk").collect().toSeq
    // three different batchings, including out-of-order sequence ranges
    val batchings = Seq(
      Seq(log.filter($"seq" % 2 === 0), log.filter($"seq" % 2 === 1)),
      Seq(log.filter($"seq" > 200), log.filter($"seq" <= 100),
        log.filter($"seq" > 100 && $"seq" <= 200)),
      Seq(log))
    batchings.foreach { batches =>
      val folded = batches.foldLeft(empty)((st, b) =>
        ChangeData.applyVersioned(st, b, "pk", "seq", "op")
          .localCheckpoint(true))
      assert(folded.orderBy("pk").collect().toSeq === global)
    }
  }

  test("tombstone blocks a late lower-seq update from resurrecting") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Seq((1L, 1L, "I", 0.0)).toDF("pk", "seq", "op", "bal").schema)
    val b1 = Seq((7L, 10L, "D", 0.0)).toDF("pk", "seq", "op", "bal")
    val b2 = Seq((7L, 3L, "U", 33.0)).toDF("pk", "seq", "op", "bal")
    val st = ChangeData.applyVersioned(
      ChangeData.applyVersioned(empty, b1, "pk", "seq", "op"),
      b2, "pk", "seq", "op")
    assert(ChangeData.snapshot(st, "op").count() === 0,
      "late seq-3 update must not outrace the seq-10 tombstone")
    // horizon 5: ops with seq in [5, 10) may still arrive and must find
    // the seq-10 tombstone — it stays. horizon 11: nothing below 11 can
    // arrive, the tombstone can never be outraced — compacted away.
    assert(ChangeData.compactTombstones(st, "seq", "op", 5L).count() === 1,
      "tombstone at/above horizon is kept")
    assert(ChangeData.compactTombstones(st, "seq", "op", 11L).count() === 0,
      "tombstone below horizon is dropped once no older op can arrive")
  }

  test("result is invariant under changelog partitioning") {
    val log = (1L to 500L).map { i =>
      (i % 40, i, Seq("I", "U", "D")((i % 3).toInt), i * 1.0)
    }.toDF("pk", "seq", "op", "bal")
    val s2 = (0L until 40L).map(i => (i, s"n$i", i * 1.0))
      .toDF("pk", "name", "bal")
    val a = ChangeData.applyChangelog(s2, log.repartition(1), "pk", "seq", "op")
      .orderBy("pk").collect()
    val b = ChangeData.applyChangelog(s2, log.repartition(13), "pk", "seq", "op")
      .orderBy("pk").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("maintainSumCount equals a from-scratch recompute of the rollup") {
    import org.apache.spark.sql.functions._
    val facts = (1L to 300L).map(i => (i, s"k${i % 7}", i * 0.25))
      .toDF("row_id", "k", "v")
    val base = facts.filter(col("row_id") % 3 =!= 0)
    val baseAgg = base.groupBy("k").agg(count(lit(1)).as("n_rows"),
      sum(col("v").cast("decimal(18,2)")).as("sum_val"))
    // delta: delete every 5th base row, insert the rows held out above
    val delta = base.filter(col("row_id") % 5 === 0)
        .select(col("k"), lit("D").as("op"), col("v"))
      .unionByName(facts.filter(col("row_id") % 3 === 0)
        .select(col("k"), lit("I").as("op"), col("v")))
    val maintained = ChangeData.maintainSumCount(
      baseAgg, delta, Seq("k"), "op", "v")
    val truth = facts
      .filter(col("row_id") % 3 === 0 ||
        (col("row_id") % 3 =!= 0 && col("row_id") % 5 =!= 0))
      .groupBy("k").agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(18,2)")).as("sum_val"))
    assert(maintained.exceptAll(truth).count() === 0)
    assert(truth.exceptAll(maintained).count() === 0)
  }

  test("maintainSumCount drops groups whose count reaches zero") {
    import org.apache.spark.sql.functions._
    val baseAgg = Seq(("a", 2L), ("b", 1L)).toDF("k", "n_rows")
      .withColumn("sum_val", (col("n_rows") * 10).cast("decimal(18,2)"))
    val delta = Seq(("b", "D", 10.0), ("c", "I", 5.0)).toDF("k", "op", "v")
    val out = ChangeData.maintainSumCount(baseAgg, delta, Seq("k"), "op", "v")
      .orderBy("k").as[(String, Long, java.math.BigDecimal)].collect()
    assert(out.map(_._1).toSeq === Seq("a", "c")) // b vanished, c was born
    assert(out.find(_._1 == "c").get._2 === 1L)
  }
}

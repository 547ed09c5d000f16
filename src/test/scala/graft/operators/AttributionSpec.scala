package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, et) => (u, t * 1000000L, et) }
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("us").as("event_id"), col("event_type"))

  private def trans(df: org.apache.spark.sql.DataFrame) =
    Attribution.journeyTransitions(df, "user_id", "ts", "event_id",
      "event_type", "purchase")

  test("journeyTransitions: truncation at first conversion, terminal " +
      "states, zero-touch converts") {
    // u1: click, view, purchase, click -> the post-purchase click is
    // outside the journey. u2: view only -> NULL journey.
    // u3: purchase with no prior touch -> START->CONV.
    val df = ev((1L, 1L, "click"), (1L, 2L, "view"), (1L, 3L, "purchase"),
      (1L, 4L, "click"), (2L, 1L, "view"), (3L, 1L, "purchase"))
    val m = trans(df).as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m === Map(
      ("START", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "CONV") -> 1L, ("START", "view") -> 1L,
      ("view", "NULL") -> 1L, ("START", "CONV") -> 1L))
  }

  test("removalEffects: single-path chain attributes everything to " +
      "the only channel") {
    val df = ev((1L, 1L, "click"), (1L, 2L, "purchase"))
    val r = Attribution.removalEffects(trans(df))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r === Array(("click", 1000000L, 0L, 1000000L, 1000000L)))
  }

  test("removalEffects: converting channel takes all credit over a " +
      "null-journey channel; halves split exactly") {
    // u1: click -> purchase; u2: view -> (end). p_full = 1/2 in
    // micro-units; removing click kills it, removing view is free.
    val df = ev((1L, 1L, "click"), (1L, 2L, "purchase"),
      (2L, 1L, "view"))
    val r = Attribution.removalEffects(trans(df))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r("click") === (("click", 500000L, 0L, 500000L, 1000000L)))
    assert(r("view") === (("view", 500000L, 500000L, 0L, 0L)))
  }

  test("removalEffects: self-loop chain matches a plain-Scala replica " +
      "of the floored fixed point; invariants hold") {
    // u1: click,click,purchase / u2: click,(end) gives the chain
    // START->click, click->click, click->CONV, click->NULL — a loop
    // whose K-step value the spec replicates in plain Scala
    val df = ev((1L, 1L, "click"), (1L, 2L, "click"),
      (1L, 3L, "purchase"), (2L, 1L, "click"))
    // counts: START->click 2, click->click 1, click->CONV 1,
    // click->NULL 1; out(START)=2, out(click)=3
    var vClick = 0L
    var vStart = 0L
    for (_ <- 1 to 16) {
      val nc = (1L * vClick + 1L * 1000000L + 1L * 0L) / 3L
      val ns = (2L * vClick) / 2L
      vClick = nc; vStart = ns
    }
    val r = Attribution.removalEffects(trans(df))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.length === 1)
    assert(r.head._2 === vStart, "p_full mismatch vs replica")
    assert(r.head._3 === 0L)
    // invariants: removal never exceeds the full probability and the
    // normalized credits never exceed 1e6 in total
    assert(r.forall(x => x._3 <= x._2 && x._4 === x._2 - x._3))
    assert(r.map(_._5).sum <= 1000000L)
  }

  test("removalEffects: state-count guard fails loudly") {
    val df = ev((1L to 70L).map(i => (i, 1L, s"ch$i")): _*)
    intercept[IllegalArgumentException] {
      Attribution.removalEffects(trans(df), maxStates = 16)
    }
  }
}

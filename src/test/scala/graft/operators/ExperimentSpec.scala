package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class ExperimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // exact integer replica of the CUPED recurrence (truncating division,
  // like Spark `div`) — the independent in-test oracle
  private def replica(users: Seq[(Long, Long, Long)])
      : Map[String, (Long, Long, Long, Long, Long, Long, Long)] = {
    val n = users.size.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(u => u._2 * u._3).sum
    val sxx = users.map(u => u._2 * u._2).sum
    val xbar = sx / n
    val theta = ((n * sxy - sx * sy) * 1000000L) /
      math.max(n * sxx - sx * sx, 1L)
    users.map { case (uid, x, y) =>
      val arm = if (uid % 2 == 0) "control" else "treatment"
      (arm, y * 100L, y * 100L - (theta * (x - xbar)) / 10000L)
    }.groupBy(_._1).map { case (arm, rs) =>
      val m = rs.size.toLong
      val syc = rs.map(_._2).sum; val sycc = rs.map(r => r._2 * r._2).sum
      val sac = rs.map(_._3).sum; val sacc = rs.map(r => r._3 * r._3).sum
      val vy = (m * sycc - syc * syc) / (m * m)
      val va = (m * sacc - sac * sac) / (m * m)
      arm -> ((m, theta, syc / m, vy, sac / m, va,
        ((vy - va) * 1000000L) / math.max(vy, 1L)))
    }
  }

  test("CUPED readout equals the exact integer replica on a hand fixture " +
      "and reduces variance when the covariate predicts the metric") {
    // midpoint splits [t0, t0+100s] at +50s; per user: x = events before
    // mid, y = purchases at/after mid. Covariate strongly predicts the
    // metric (y ~ x), so adjustment must shrink variance in both arms.
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // (user, x pre-events, y post-purchases); parity picks the arm
    val shape = Seq((2L, 1L, 0L), (4L, 5L, 3L), (6L, 9L, 5L),
      (1L, 2L, 1L), (3L, 6L, 3L), (5L, 10L, 6L))
    val rows = shape.flatMap { case (u, x, y) =>
      (1L to x).map(i => (u, "view", ts(i))) ++
        (1L to y).map(i => (u, "purchase", ts(50L + i))) :+
        ((u, "view", ts(0L))) // shared t0 anchors the span for every user
    } ++ Seq((99L, "view", ts(100L))) // anchors hi; 99 has x=0 (t=100>=mid)
    val events = rows.toDF("user_id", "event_type", "ts")
    val got = Experiment
      .cupedReadout(events, "user_id", "ts", "event_type", "purchase")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    // replica input: x counts events strictly before +50s (the x views
    // at 1..x plus the t0 anchor); y = purchases at/after mid
    val want = replica(shape.map { case (u, x, y) => (u, x + 1, y) } :+
      ((99L, 0L, 0L)))
    assert(got === want, s"got $got\nwant $want")
    got.values.foreach { case (_, _, _, vy, _, va, red) =>
      assert(va < vy && red > 0L,
        s"covariate-predicted metric must shrink variance: vy=$vy va=$va")
    }
    // determinism under repartitioning
    val again = Experiment
      .cupedReadout(events.repartition(7), "user_id", "ts", "event_type",
        "purchase")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    assert(again === got)
  }

  test("CUPED: null timestamps excluded; constant covariate yields " +
      "theta guarded by the zero-variance denominator") {
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // every user has exactly one pre event -> var(x) = 0 -> theta via
    // greatest(den, 1); adjustment then subtracts 0 (x == xbar)
    val events = (Seq((2L, "view", ts(0L)), (2L, "purchase", ts(90L)),
      (3L, "view", ts(10L)), (3L, "view", ts(80L))) :+
      ((4L, "view", null.asInstanceOf[java.sql.Timestamp])))
      .toDF("user_id", "event_type", "ts")
    val got = Experiment
      .cupedReadout(events, "user_id", "ts", "event_type", "purchase")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    // user 4's only event is null-ts: excluded entirely -> 2 users total
    assert(got.map(_._2).sum === 2L)
    got.foreach { r => assert(r._4 === r._6 && r._5 === r._7,
      "x constant: adjusted stats must equal raw stats") }
  }
}

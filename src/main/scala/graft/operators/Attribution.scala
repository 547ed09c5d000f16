package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov removal-effect attribution (Anderl et al. 2014) — the
  * data-driven multi-touch model that complements the rule-based ones
  * already in the surface (q74 last-touch, q80 position-based): build the
  * first-order Markov chain over user journeys, then credit each channel
  * by how much the conversion probability DROPS when that channel is
  * removed from the chain.
  *
  * The reference has no attribution at all — its analytics end at row
  * archival (`/root/reference/osarchiver/archiver.py:35-42`); this is
  * north-star §2.8 surface.
  *
  * Two-tier shape, the house discipline for "heavy count, tiny solve"
  * (the T6 topo-sort / dd6 union-find precedent): the JOURNEY
  * construction and transition counting are fully distributed (per-user
  * windows + one map-side-combined aggregation — the q55 plan), while
  * the absorption fixed point runs on the collected transition matrix —
  * bounded by (distinct event types + 3)^2 rows BY CONSTRUCTION
  * (`require`d <= maxStates), never by the data.
  *
  * Determinism: probabilities are BIGINT micro-units; each iteration
  * divides exact integer sum-products by the source's out-count with
  * truncating division, so the K-step vector is bit-identical on any
  * engine — the DuckDB oracle reproduces the whole fixed point with an
  * unrolled-CTE chain (the g1/g7 discipline).
  */
object Attribution {

  val Start = "START"
  val Conv = "CONV"
  val Null = "NULL"

  /** First-order journey transition counts: per user, order events by
    * (ts, id), truncate at the FIRST conversion, and emit
    * START -> first touch, touch -> next touch, last touch -> CONV/NULL
    * (plus START -> CONV for users who convert with no prior touch).
    * One window pass over the events + one aggregation. */
  def journeyTransitions(events: DataFrame, userCol: String,
      tsCol: String, idCol: String, typeCol: String,
      convType: String): DataFrame = {
    val ev = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(idCol).as("eid"), col(typeCol).as("et"))
    val wU = Window.partitionBy("u").orderBy(col("ts"), col("eid"))
    val fp = ev.filter(col("et") === convType)
      .withColumn("rn", row_number().over(wU)).filter(col("rn") === 1)
      .select(col("u"), col("ts").as("fp_ts"), col("eid").as("fp_id"))
    val touches = ev.filter(col("et") =!= convType)
      .join(fp, Seq("u"), "left")
      .filter(col("fp_ts").isNull || col("ts") < col("fp_ts") ||
        (col("ts") === col("fp_ts") && col("eid") < col("fp_id")))
      .withColumn("converted", col("fp_ts").isNotNull)
    val seq = touches
      .withColumn("prev", lag(col("et"), 1).over(wU))
      .withColumn("i", row_number().over(wU))
      .withColumn("m", count(lit(1)).over(Window.partitionBy("u")))
    val steps = seq.select(
      coalesce(col("prev"), lit(Start)).as("src"), col("et").as("dst"))
    val terminals = seq.filter(col("i") === col("m"))
      .select(col("et").as("src"),
        when(col("converted"), Conv).otherwise(Null).as("dst"))
    val zeroTouch = fp
      .join(touches.select("u").distinct(), Seq("u"), "left_anti")
      .select(lit(Start).as("src"), lit(Conv).as("dst"))
    steps.unionAll(terminals).unionAll(zeroTouch)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** Removal-effect attribution from a transition-count frame.
    *
    * For the full chain and for each channel-removed chain, the
    * conversion probability from START is the K-step absorption value
    * `v_{k+1}(s) = floor(sum_t n(s,t) * v_k(t) / out(s))` with
    * v(CONV) = 1e6, v(NULL) = 0 pinned, and removal of channel c
    * implemented as pinning v(c) = 0 (any path through c contributes 0 —
    * exactly the "redirect into-c edges to NULL" editing, without
    * editing). Floors are monotone, so p_removed <= p_full holds
    * EXACTLY, not just in expectation.
    *
    * Output one row per channel: (channel, p_full_u, p_removed_u,
    * removal_u, attribution_ppm), attribution normalized over the total
    * removal mass with a greatest(1) zero-guard. */
  def removalEffects(transitions: DataFrame, iterations: Int = 16,
      maxStates: Int = 64): DataFrame = {
    require(iterations >= 1, "at least one absorption iteration")
    val spark = transitions.sparkSession
    // bounded collect BY CONSTRUCTION: the matrix is (event types + 3)^2
    val rows = transitions
      .select(col("src").cast("string"), col("dst").cast("string"),
        col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val states = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    require(states.length <= maxStates,
      s"${states.length} chain states exceed $maxStates — cap the " +
        "channel vocabulary upstream")
    val unit = 1000000L
    val out = rows.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._3).sum }
    val bySrc = rows.groupBy(_._1)
    def absorption(removed: Option[String]): Long = {
      def clamp(s: String, v: Long): Long =
        if (s == Conv) unit
        else if (s == Null || removed.contains(s)) 0L
        else v
      var v = states.map(s => s -> clamp(s, 0L)).toMap
      for (_ <- 1 to iterations) {
        v = states.map { s =>
          val raw = bySrc.get(s) match {
            case Some(es) if out(s) > 0L =>
              es.map { case (_, t, n) => n * v(t) }.sum / out(s)
            case _ => 0L
          }
          s -> clamp(s, raw)
        }.toMap
      }
      v.getOrElse(Start, 0L)
    }
    val pFull = absorption(None)
    val channels = states.filterNot(Set(Start, Conv, Null))
    val removals = channels.map(c => (c, pFull - absorption(Some(c))))
    val tot = math.max(removals.map(_._2).sum, 1L)
    val data = removals.map { case (c, r) =>
      Row(c, pFull, pFull - r, r, r * unit / tot)
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("p_full_u", LongType, nullable = false),
      StructField("p_removed_u", LongType, nullable = false),
      StructField("removal_u", LongType, nullable = false),
      StructField("attribution_ppm", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
  }
}

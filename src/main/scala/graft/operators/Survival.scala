package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Right-censored survival estimation: the Kaplan-Meier product-limit
  * curve (Kaplan & Meier 1958) and the Nelson-Aalen cumulative hazard,
  * both carried in exact integer arithmetic so the result is
  * bit-identical on any partitioning and any engine.
  *
  * The reference archives rows by age (`osarchiver`'s retention predicate
  * selects rows older than a cutoff); the survival curve is the analytic
  * complement — "how long do rows/users LIVE before the terminal event,
  * given that many are still alive when we look". The training-data uses
  * are conversion/time-to-label curves and churn-adjusted cohort
  * weighting, where naive averages are censoring-biased.
  *
  * Estimator conventions (both sides of the oracle implement these):
  *   - input is one row per subject: an integral duration and an event
  *     flag (1 = event at `dur`, 0 = censored at `dur`);
  *   - ties: subjects censored at t are still AT RISK for events at t
  *     (the standard "deaths before losses" rule);
  *   - output rows are EVENT times only (hazard is exactly 0 elsewhere);
  *   - `hazard_ppm` = floor(1e6 * d_i / n_i);
  *   - `na_cum_ppm` (Nelson-Aalen) = running sum of `hazard_ppm`;
  *   - `km_ppm` (Kaplan-Meier) = the product Π (n_i - d_i)/n_i carried
  *     as a nano-unit integer with a floor after each factor:
  *     s_0 = 1e9, s_i = s_{i-1} * (n_i - d_i) div n_i, emitted as
  *     s_i div 1000. The per-step floor makes the sequential product
  *     exactly reproducible (a float product is order-fragile); s stays
  *     ≤ 1e9 so the intermediate product is safe for risk sets up to
  *     ~9e9 subjects.
  *
  * Scale shape: ONE data-sized shuffle (the groupBy on the duration).
  * Everything downstream — the risk-set windows, the 1-row fold that
  * carries the product, the explode and the join back — runs on the
  * duration DOMAIN (calendar days/weeks of the observation window), which
  * is bounded by construction, not by data volume. The fold deliberately
  * collects only `(t, n_risk, d)` per distinct event time.
  */
object Survival {

  /** Kaplan-Meier + Nelson-Aalen over one-row-per-subject observations.
    *
    * @param obs      one row per subject
    * @param durCol   integral duration (>= 0) at which the subject exits
    * @param eventCol 1 if the exit is the event, 0 if censored
    * @return (t, n_risk, n_event, n_censored, hazard_ppm, na_cum_ppm,
    *         km_ppm), one row per distinct event time, ordered windows
    */
  def kaplanMeier(obs: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val exits = obs
      .select(col(durCol).cast("long").as("t"),
        col(eventCol).cast("long").as("ev"))
      .groupBy("t")
      .agg(sum(col("ev")).as("n_event"),
        sum(lit(1L) - col("ev")).as("n_censored"))
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy("t")
    // risk set at t = everyone who exits at t or later; computed over ALL
    // exit times (censor-only rows count), then event-only rows survive
    val risk = exits
      .withColumn("total",
        sum(col("n_event") + col("n_censored")).over(wAll))
      .withColumn("prior", coalesce(
        sum(col("n_event") + col("n_censored"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("total") - col("prior"))
      .filter(col("n_event") >= 1L)
      .select("t", "n_risk", "n_event", "n_censored")
    // the sequential product: fold the (tiny, duration-domain-sized)
    // sorted step list once, emitting the running nano-unit survival
    val folded = risk
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("n_event")))).as("steps"))
      .select(explode(expr(
        """aggregate(steps,
          |  named_struct('s', 1000000000L,
          |    'out', cast(array() as array<struct<t: bigint, km: bigint>>)),
          |  (acc, x) -> named_struct(
          |    's', acc.s * (x.n_risk - x.n_event) div x.n_risk,
          |    'out', array_append(acc.out, named_struct(
          |      't', x.t,
          |      'km', acc.s * (x.n_risk - x.n_event) div x.n_risk))),
          |  acc -> acc.out)""".stripMargin)).as("k"))
      .select(col("k.t").as("t"), col("k.km").as("km_nano"))
    risk
      .join(broadcast(folded), Seq("t"))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        expr("n_event * 1000000 div n_risk").as("hazard_ppm"),
        sum(expr("n_event * 1000000 div n_risk"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, 0))
          .as("na_cum_ppm"),
        expr("km_nano div 1000").as("km_ppm"))
  }

  /** Aalen-Johansen cumulative incidence under two COMPETING risks
    * (Aalen & Johansen 1978): when a subject can exit by either of two
    * terminal events (converted vs churned, deduped-away vs quarantined),
    * the naive "1 - KM of event k alone" overstates incidence because it
    * treats the competing event as censoring. The correct estimator
    * allocates the probability mass of each step to the event that took
    * it: CIF_k(t) = Σ_{t_i <= t} S(t_{i-1}) * d_{k,i} / n_i, with S the
    * OVERALL survival (all event types count as exits).
    *
    * Same integer discipline as [[kaplanMeier]]: the fold carries the
    * nano-unit overall survival `s` plus both incidence accumulators;
    * each step adds floor(s * d_k / n) to CIF_k BEFORE s is stepped, so
    * `surv_ppm + cif1_ppm + cif2_ppm` stays within floor-drift of 1e6 —
    * an invariant the spec pins.
    *
    * Input is one row per subject: duration and a type code — 0 =
    * censored, 1 / 2 = the two competing events. Output rows are times
    * where ANY event fires. Scale shape identical to [[kaplanMeier]]:
    * one duration-grain shuffle, then duration-domain-sized frames.
    */
  def cumulativeIncidence(obs: DataFrame, durCol: String,
      typeCol: String): DataFrame = {
    val exits = obs
      .select(col(durCol).cast("long").as("t"),
        col(typeCol).cast("long").as("typ"))
      .groupBy("t")
      .agg(sum(when(col("typ") === 1L, 1L).otherwise(0L)).as("d1"),
        sum(when(col("typ") === 2L, 1L).otherwise(0L)).as("d2"),
        sum(when(col("typ") === 0L, 1L).otherwise(0L)).as("n_censored"))
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy("t")
    val risk = exits
      .withColumn("total",
        sum(col("d1") + col("d2") + col("n_censored")).over(wAll))
      .withColumn("prior", coalesce(
        sum(col("d1") + col("d2") + col("n_censored"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("total") - col("prior"))
      .filter(col("d1") + col("d2") >= 1L)
      .select("t", "n_risk", "d1", "d2", "n_censored")
    val folded = risk
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("d1"), col("d2")))).as("steps"))
      .select(explode(expr(
        """aggregate(steps,
          |  named_struct('s', 1000000000L, 'c1', 0L, 'c2', 0L,
          |    'out', cast(array() as
          |      array<struct<t: bigint, s: bigint, c1: bigint, c2: bigint>>)),
          |  (acc, x) -> named_struct(
          |    's', acc.s * (x.n_risk - x.d1 - x.d2) div x.n_risk,
          |    'c1', acc.c1 + acc.s * x.d1 div x.n_risk,
          |    'c2', acc.c2 + acc.s * x.d2 div x.n_risk,
          |    'out', array_append(acc.out, named_struct(
          |      't', x.t,
          |      's', acc.s * (x.n_risk - x.d1 - x.d2) div x.n_risk,
          |      'c1', acc.c1 + acc.s * x.d1 div x.n_risk,
          |      'c2', acc.c2 + acc.s * x.d2 div x.n_risk))),
          |  acc -> acc.out)""".stripMargin)).as("k"))
      .select(col("k.t").as("t"), col("k.s").as("s_nano"),
        col("k.c1").as("c1_nano"), col("k.c2").as("c2_nano"))
    risk
      .join(broadcast(folded), Seq("t"))
      .select(col("t"), col("n_risk"), col("d1"), col("d2"),
        col("n_censored"),
        expr("s_nano div 1000").as("surv_ppm"),
        expr("c1_nano div 1000").as("cif1_ppm"),
        expr("c2_nano div 1000").as("cif2_ppm"))
  }
}

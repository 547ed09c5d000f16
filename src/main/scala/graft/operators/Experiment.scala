package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Experimentation readouts beyond the plain two-proportion z-test (q73):
  * the variance-reduction machinery a production experimentation platform
  * applies before deciding a test.
  *
  * Reference behavior: none (osarchiver has no analytics); SURVEY.md §2.8
  * event-analytics surface.
  */
object Experiment {

  /** CUPED readout (Deng et al. 2013, "Improving the Sensitivity of
    * Online Controlled Experiments by Utilizing Pre-Experiment Data"):
    * per-user post-period conversions adjusted by the pre-period
    * activity covariate, y_adj = y - theta * (x - xbar), with theta the
    * pooled cov(x,y)/var(x). Reports per arm the raw and adjusted
    * mean/variance and the achieved variance reduction — the number
    * that says how much extra traffic CUPED bought you.
    *
    * Integer discipline: the experiment midpoint is exact BIGINT
    * microseconds; per-user x (pre-period events) and y (post-period
    * conversions) are exact counts; theta publishes as integer ppm via
    * one truncating division of exact BIGINT moment sums (Spark `div`
    * and DuckDB `//` agree on signed operands); adjusted metrics are
    * integer centi-units; per-arm variances use the (n*sum_sq - sum^2)
    * div n^2 form — everything order-free and partitioning-exact.
    * Range bound: moment products stay in BIGINT for corpora up to
    * ~1e6 users x ~1e3 events/user; a 1e9-user deployment lifts the
    * sums to DECIMAL(38,0) without changing the plan.
    *
    * Scale shape: one span aggregation (1-row broadcast), one user-grain
    * map-side-combined aggregation, one 1-row pooled-moments cross, one
    * arm-grain aggregation. Nothing after the user grain grows with
    * |events|. Arms: user_id parity (q73's deterministic stand-in for
    * the assignment hash). Output one row per arm. */
  def cupedReadout(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, convertType: String): DataFrame = {
    val ev = events.filter(col(tsCol).isNotNull)
      .select(col(userCol).as("user_id"), col(typeCol).as("et"),
        unix_micros(col(tsCol)).as("tu"))
    val span = ev.agg(min(col("tu")).as("lo"), max(col("tu")).as("hi"))
      .select(expr("lo + (hi - lo) div 2").as("mid"))
    val perUser = ev.crossJoin(broadcast(span))
      .groupBy("user_id")
      .agg(sum(when(col("tu") < col("mid"), 1L).otherwise(0L)).as("x"),
        sum(when(col("tu") >= col("mid") && col("et") === convertType, 1L)
          .otherwise(0L)).as("y"))
    val pooled = perUser.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), expr("sx div greatest(n, 1)").as("xbar"),
        expr("((n * sxy - sx * sy) * 1000000)" +
          " div greatest(n * sxx - sx * sx, 1)").as("theta_ppm"))
    perUser.crossJoin(broadcast(pooled))
      .select(
        when(col("user_id") % 2 === 0, "control").otherwise("treatment")
          .as("arm"),
        col("theta_ppm"),
        (col("y") * 100L).as("y_c"),
        (col("y") * 100L -
          expr("(theta_ppm * (x - xbar)) div 10000")).as("yadj_c"))
      .groupBy("arm", "theta_ppm")
      .agg(count(lit(1)).as("n_users"),
        sum(col("y_c")).as("syc"), sum(col("y_c") * col("y_c")).as("sycc"),
        sum(col("yadj_c")).as("sac"),
        sum(col("yadj_c") * col("yadj_c")).as("sacc"))
      .select(col("arm"), col("n_users"), col("theta_ppm"),
        expr("syc div n_users").as("mean_y_centi"),
        expr("(n_users * sycc - syc * syc) div (n_users * n_users)")
          .as("var_y_centi2"),
        expr("sac div n_users").as("mean_yadj_centi"),
        expr("(n_users * sacc - sac * sac) div (n_users * n_users)")
          .as("var_yadj_centi2"))
      .withColumn("var_reduction_ppm",
        expr("((var_y_centi2 - var_yadj_centi2) * 1000000)" +
          " div greatest(var_y_centi2, 1)"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constraint audit — machine-checkable table invariants, reported as one
  * long-format violation table.
  *
  * The reference trusts the live store's own constraints and discovers
  * only PK/FK *structure* (`/root/reference/osarchiver/common/db.py:
  * 407-450`); it has no way to ASSERT that the data it is about to
  * archive or delete actually satisfies them. At 100 TB that assertion
  * is the difference between "delete-back removed archived rows" and
  * "delete-back removed rows whose children still reference them": this
  * operator runs the checks the archiver's safety depends on — PK
  * uniqueness, key non-nullness, FK orphan counts (exactly what D3's
  * dichotomy recovery repairs after the fact), and value-range sanity —
  * BEFORE any destructive step.
  *
  * Scale, per check kind:
  *  - NotNull / InRange: a scan-local conditional count (partial agg,
  *    no shuffle beyond the final 1-row reduce);
  *  - Unique: `groupBy(key).count` — one shuffle with map-side combine;
  *    violations = rows in excess of one per key;
  *  - Fk: LEFT ANTI join child→parent on the key — broadcastable when
  *    the parent's key projection is small, shuffle-hash otherwise, and
  *    the parent side is pruned to the single key column so the scan
  *    never reads its payload.
  * Every check reduces to one row; the report union is trivially cheap
  * and each check remains an independent job (fail-fast or run-all both
  * work).
  */
object QualityAudit {

  sealed trait Check { def table: String; def name: String }
  /** `column` must never be NULL. */
  final case class NotNull(table: String, column: String) extends Check {
    def name = s"not_null_$column"
  }
  /** `columns` form a unique key; violations counts surplus rows. */
  final case class Unique(table: String, columns: Seq[String]) extends Check {
    def name = s"unique_${columns.mkString("_")}"
  }
  /** every non-NULL `column` must exist in `parentTable.parentColumn`. */
  final case class Fk(table: String, column: String, parentTable: String,
      parentColumn: String) extends Check {
    def name = s"fk_${column}_to_$parentTable"
  }
  /** `column` must lie in [lo, hi] (inclusive); NULLs are NotNull's job. */
  final case class InRange(table: String, column: String, lo: Double,
      hi: Double) extends Check {
    def name = s"range_$column"
  }

  /** Run every check; one output row per check:
    * (table_name, check_name, checked_rows, violations, ok). */
  def run(spark: SparkSession, tables: Map[String, DataFrame],
      checks: Seq[Check]): DataFrame = {
    val reports = checks.map { c =>
      val df = tables(c.table)
      val report = c match {
        case NotNull(_, col0) =>
          df.agg(count(lit(1)).as("checked_rows"),
            count(when(col(col0).isNull, 1)).as("violations"))
        case Unique(_, cols) =>
          df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
            .agg(sum(col("n")).as("checked_rows"),
              sum(col("n") - 1).as("violations"))
        case Fk(_, child, parentT, parentC) =>
          val parent = tables(parentT).select(col(parentC))
          df.select(col(child)).filter(col(child).isNotNull)
            .join(parent, col(child) === col(parentC), "left_anti")
            .agg(count(lit(1)).as("violations"))
            .crossJoin(df.agg(count(when(col(child).isNotNull, 1))
              .as("checked_rows")))
        case InRange(_, col0, lo, hi) =>
          df.agg(count(when(col(col0).isNotNull, 1)).as("checked_rows"),
            count(when(col(col0) < lo || col(col0) > hi, 1))
              .as("violations"))
      }
      report.select(lit(c.table).as("table_name"),
        lit(c.name).as("check_name"),
        coalesce(col("checked_rows"), lit(0L)).cast("long")
          .as("checked_rows"),
        coalesce(col("violations"), lit(0L)).cast("long").as("violations"),
        (coalesce(col("violations"), lit(0L)) === 0).as("ok"))
    }
    reports.reduce(_.unionByName(_))
  }

  /** Row-level quarantine routing (the dead-letter half of a validation
    * pass): evaluate named per-row predicates and emit the REJECTED rows'
    * keys with a '|'-joined reason list, in the checks' declaration
    * order. The caller materializes join-derived facts (FK membership
    * flags from a left join, lookup results) as columns first — checks
    * here are pure row predicates, so the routing itself is one
    * shuffle-free projection + filter over the validated scan.
    *
    * The passing complement is `df.join(quarantined, keys, "left_anti")`
    * — membership, not content, is what the verdict changes.
    *
    * NULL semantics: a predicate that evaluates to NULL (e.g.
    * `price > 0` on a NULL price) counts as a FAILURE — a dead-letter
    * gate must never wave a row through on three-valued-logic unknowns,
    * so the check is `coalesce(ok, false)`. */
  def quarantineRows(df: DataFrame, keyCols: Seq[String],
      checks: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(keyCols.nonEmpty && checks.nonEmpty)
    df.select(keyCols.map(col) :+
        concat_ws("|", checks.map { case (name, ok) =>
          when(!coalesce(ok, lit(false)), lit(name)) }: _*).as("reasons"): _*)
      .filter(col("reasons") =!= "")
  }

  /** Benford first-significant-digit audit (Benford 1938; the standard
    * fabricated-data / corrupted-feed screen for naturally-occurring
    * monetary or count columns): observed first-digit frequencies in
    * integer ppm against the Benford expectation floor(log10(1+1/d)*1e6),
    * one row per digit 1-9 with the signed deviation.
    *
    * Determinism discipline: the value quantizes ONCE to integer cents
    * (floor(x*100), IEEE-identical across engines on double inputs) and
    * the first digit comes from the cents' DECIMAL STRING length —
    * integer division by 10^(len-1) — never from a float log10 whose
    * ulp could flip a power-of-ten boundary. Non-positive cents are
    * excluded (Benford is defined on positive magnitudes). ppm via
    * integer div with greatest(total, 1) — the dq convention.
    *
    * Scale shape: one narrow projection + one 9-row hash aggregation
    * (map-side combined) + a 1-row total broadcast cross. */
  /** Population-stability-index (PSI) feature-drift monitor — the
    * standard model-monitoring screen for "has this numeric column's
    * distribution moved since the baseline snapshot" (credit-scoring
    * lineage; the convention thresholds are 0.1 warn / 0.25 act).
    *
    * Binning is 10 equal-WIDTH bins over the BASELINE min..max (a 1-row
    * broadcast) — the value-domain discipline tx31 uses: exact decile
    * edges would demand a global sort/percentile of the baseline at
    * 100 TB, while min/max reduce map-side. Current-side values outside
    * the baseline range land in open-ended edge bins -1 / `bins` (new
    * out-of-range mass is exactly the drift PSI must not hide). Bin
    * boundary arithmetic is the same IEEE expression on both engines;
    * ties at the top edge clamp into the last interior bin.
    *
    * Shares are add-1-smoothed over a fixed bins+2 universe so empty
    * sides stay finite; per-bin contributions floor ONCE to nano-units
    * from the same smoothed doubles the ln sees (the tx21/dd31
    * ln-floored pattern), so the report is order-free and
    * partitioning-exact. Scalar PSI = sum(psi_nano)/1e9.
    *
    * Scale shape: one map-side min/max reduce on the baseline + one
    * narrow binning scan per side collapsing to <=bins+2-row hash aggs,
    * a tiny full-outer bin join, and a 1-row totals broadcast. Output,
    * one row per OBSERVED bin: (bin, n_base, n_cur, p_base_ppm,
    * p_cur_ppm, psi_nano). */
  /** Non-NULL values of `valueCol` as double column `v`. */
  private def driftVals(df: DataFrame, valueCol: String): DataFrame = df
    .select(col(valueCol).cast("double").as("v"))
    .filter(col("v").isNotNull)

  /** Equal-width bin counts over a 1-row broadcast (lo, hi) range frame:
    * interior bins 0..bins-1, open-ended edge bins -1 / `bins` for
    * out-of-range values, everything in bin 0 when the range is
    * degenerate (hi = lo). Shared by [[psiDrift]] and [[ksDrift]] so the
    * two monitors can never disagree on bin boundaries. */
  private def binnedCounts(vals: DataFrame, rng: DataFrame, bins: Int,
      cnt: String): DataFrame = vals
    .crossJoin(broadcast(rng))
    .select(
      when(col("hi") === col("lo"), lit(0))
        .when(col("v") < col("lo"), lit(-1))
        .when(col("v") > col("hi"), lit(bins))
        .otherwise(least(
          floor((col("v") - col("lo")) /
            ((col("hi") - col("lo")) / lit(bins.toDouble))).cast("int"),
          lit(bins - 1)))
        .as("bin"))
    .groupBy("bin").agg(count(lit(1)).as(cnt))

  /** Per-bin base/cur counts over the shared baseline range: full-outer
    * joined, NULL-backfilled. One narrow scan per side collapsing to
    * <=bins+2-row aggregates. */
  private def driftBinTable(base: DataFrame, cur: DataFrame,
      valueCol: String, bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 1000, "2 <= bins <= 1000")
    val rng = driftVals(base, valueCol)
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    binnedCounts(driftVals(base, valueCol), rng, bins, "n_base")
      .join(binnedCounts(driftVals(cur, valueCol), rng, bins, "n_cur"),
        Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
  }

  def psiDrift(base: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 10): DataFrame = {
    val joined = driftBinTable(base, cur, valueCol, bins)
    val totals = joined.agg(sum(col("n_base")).as("ta"),
      sum(col("n_cur")).as("tc"))
    val universe = lit((bins + 2).toLong)
    val pa = (col("n_base") + 1).cast("double") /
      (col("ta") + universe).cast("double")
    val pc = (col("n_cur") + 1).cast("double") /
      (col("tc") + universe).cast("double")
    joined.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        expr(s"(n_base + 1) * 1000000 div (ta + ${bins + 2})")
          .as("p_base_ppm"),
        expr(s"(n_cur + 1) * 1000000 div (tc + ${bins + 2})")
          .as("p_cur_ppm"),
        floor((pa - pc) * log(pa / pc) * lit(1e9)).cast("long")
          .as("psi_nano"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic over the SAME binned
    * value domain as [[psiDrift]] — the companion monitor: PSI weighs
    * per-bin mass shifts, KS catches a location/shape shift that many
    * small same-sign gaps accumulate into (each individually below PSI's
    * noise floor). D = max over bins of |CDF_base - CDF_cur|.
    *
    * This is binned KS — the production form: exact KS needs the globally
    * ORDERED empirical CDF (a full sort, or a single-partition running
    * window, of every distinct value — the thing a 100 TB monitor must
    * not do). Binning to the baseline's equal-width grid (same open edge
    * bins -1 / `bins` as PSI) makes the CDF a <=bins+2-row frame; the
    * unavoidable ordered cumulative window then runs on that tiny frame
    * (single partition BY CONSTRUCTION — bounded by `bins`+2 <= 1002
    * rows, not by data volume). Binned D lower-bounds exact D; a finer
    * grid tightens it.
    *
    * CDF shares are exact integer ppm (cum * 1e6 div total — no
    * smoothing: KS is a ratio of raw cumulative counts; empty sides are
    * guarded to div-by-1 and read as all-mass-at-no-bin). Output, one row
    * per observed bin in bin order: (bin, n_base, n_cur, cdf_base_ppm,
    * cdf_cur_ppm, gap_ppm); the decision scalar is max(gap_ppm)/1e6
    * against the classical c(alpha)*sqrt((n+m)/(n*m)) threshold.
    *
    * Scale shape: one narrow binning scan per side to <=bins+2-row
    * aggregates, a tiny full-outer bin join, a bounded ordered window,
    * and a 1-row totals broadcast. */
  def ksDrift(base: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int = 100): DataFrame = {
    val joined = driftBinTable(base, cur, valueCol, bins)
    val totals = joined.agg(sum(col("n_base")).as("ta"),
      sum(col("n_cur")).as("tc"))
    val wCum = org.apache.spark.sql.expressions.Window.orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    joined
      .withColumn("cum_base", sum(col("n_base")).over(wCum))
      .withColumn("cum_cur", sum(col("n_cur")).over(wCum))
      .crossJoin(broadcast(totals))
      .select(col("bin"), col("n_base"), col("n_cur"),
        expr("cum_base * 1000000 div greatest(ta, 1)").as("cdf_base_ppm"),
        expr("cum_cur * 1000000 div greatest(tc, 1)").as("cdf_cur_ppm"),
        expr("abs(cum_base * 1000000 div greatest(ta, 1) - " +
          "cum_cur * 1000000 div greatest(tc, 1))").as("gap_ppm"))
  }

  /** Long-format column profiler — the per-column catalog card (what
    * ANALYZE min/max/ndv doesn't say): null count, distinct count, the
    * dominant value and its share, and the Shannon entropy of the value
    * distribution. Near-zero entropy with a ~1e6 top share is a
    * constant/degenerate column; high entropy with tiny top share is a
    * key — the two ends of the "is this column informative" axis a
    * curation pipeline profiles before feature selection.
    *
    * Exactness: values are profiled AS STRINGS (one casting rule for
    * every column type); entropy contributions floor per VALUE to
    * nano-nats from shares over the non-null total — order-free BIGINT
    * sums, engine-identical doubles inside the single ln. The top value
    * ties break to the LARGEST value at the max count (struct max —
    * deterministic on any partitioning). NULLs count separately and
    * join neither the top pick nor the entropy.
    *
    * Scale shape, per column: one value-domain aggregation (map-side
    * combined) + a 1-row totals broadcast + a 1-row final reduce; the
    * profiled frame is scanned once per column. Output, one row per
    * column: (column_name, n_rows, n_nulls, n_distinct, top_value,
    * top_share_ppm, entropy_nano). */
  def columnProfile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile at least one column")
    columns.map { c =>
      val g = df.select(col(c).cast("string").as("v"))
        .groupBy("v").agg(count(lit(1)).as("cnt"))
      val tot = g.agg(sum(col("cnt")).as("n"),
        coalesce(sum(when(col("v").isNotNull, col("cnt"))), lit(0L))
          .as("nv"))
      g.crossJoin(broadcast(tot))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
            .as("n_nulls"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
          max(when(col("v").isNotNull, struct(col("cnt"), col("v"))))
            .as("top"),
          coalesce(sum(when(col("v").isNotNull,
            floor((col("cnt").cast("double") / col("nv").cast("double")) *
              log(col("nv").cast("double") / col("cnt").cast("double")) *
              lit(1e9)).cast("long"))), lit(0L)).as("entropy_nano"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("top.v").as("top_value"),
          expr("top.cnt * 1000000 div greatest(n_rows - n_nulls, 1)")
            .as("top_share_ppm"),
          col("entropy_nano"))
    }.reduce(_.unionAll(_))
  }

  /** Functional-dependency audit — does `determinant -> dependent`
    * actually hold in the data? A clean FD (0 violations) certifies a
    * denormalization / join-elimination opportunity; a NEAR-clean one
    * (violation_ppm just above 0) is the classic smell of corrupted or
    * hand-edited rows, and the violating-key count sizes the cleanup. The
    * reference trusts the live schema's declared constraints
    * (`/root/reference/osarchiver/common/db.py:461-482`); real FDs at
    * 100 TB are a property of the DATA and have to be measured.
    *
    * Per declared pair: one value-domain aggregation (determinant ->
    * distinct dependent count; strings, the dq6 casting rule; NULL
    * determinants excluded, NULL dependents ignored by the distinct
    * count — an all-NULL key can never violate) collapsing
    * to a 1-row summary — map-side combined, one scan per pair. Output:
    * (determinant, dependent, n_keys, n_violating, violation_ppm). */
  def fdAudit(df: DataFrame, deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "audit at least one dependency")
    deps.map { case (det, dep) =>
      df.select(col(det).cast("string").as("a"),
          col(dep).cast("string").as("b"))
        .filter(col("a").isNotNull)
        .groupBy("a").agg(countDistinct(col("b")).as("nd"))
        .agg(count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("nd") > 1, 1L)), lit(0L))
            .as("n_violating"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_keys"), col("n_violating"),
          expr("n_violating * 1000000 div greatest(n_keys, 1)")
            .as("violation_ppm"))
    }.reduce(_.unionAll(_))
  }

  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val expected: Seq[(Int, Long)] = Seq(1 -> 301029L, 2 -> 176091L,
      3 -> 124938L, 4 -> 96910L, 5 -> 79181L, 6 -> 66946L, 7 -> 57991L,
      8 -> 51152L, 9 -> 45757L)
    val expMap = map(expected.flatMap { case (d, p) =>
      Seq(lit(d.toLong), lit(p)) }: _*)
    val g = df
      .select(floor(col(valueCol).cast("double") * 100.0).cast("long")
        .as("c"))
      .filter(col("c") > 0)
      .select(expr(
        "c div cast(pow(10, length(cast(c as string)) - 1) as bigint)")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = g.agg(sum(col("n_obs")).as("n_total"))
    g.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        expr("n_obs * 1000000 div greatest(n_total, 1)").as("obs_ppm"),
        element_at(expMap, col("digit")).as("expected_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("expected_ppm"))
  }

  /** Shewhart p-chart over a per-bucket defect rate (Shewhart 1931; the
    * SPC chart ops teams run on daily error share): each bucket's rate
    * is tested against the pooled center line at 3 sigma under the
    * binomial model, with per-bucket limits (small days get wide
    * limits, big days tight ones).
    *
    * sqrt-free integer test: out-of-control iff
    * `(p_i - pbar)^2 > 9 * pbar(1-pbar)/n_i`, which in floored-ppm
    * units is `d_ppm^2 * n_i > 9 * c_ppm * (1e6 - c_ppm)` — every
    * quantity an exact integer, the one comparison that matters never
    * touching libm. `d_ppm` floors each side's rate independently
    * (<=1 ppm quantization at the boundary, identically on every
    * engine). The square times n_i runs in DECIMAL(38,0): 1e12 * a
    * per-bucket count overflows BIGINT at real scale.
    *
    * Scale shape: one map-side-combined aggregation to the bucket
    * grain, a 1-row totals aggregate broadcast back over the bucket
    * frame (bounded by the calendar, never the data), and a per-row
    * verdict. */
  def rateControlChart(df: DataFrame, bucketCol: Column,
      defect: Column): DataFrame = {
    val daily = df
      .select(bucketCol.cast("string").as("bucket"),
        when(defect, 1L).otherwise(0L).as("is_defect"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), sum(col("is_defect")).as("n_defects"))
    val tot = daily.agg(sum(col("n_rows")).as("tn"),
      sum(col("n_defects")).as("tx"))
    daily.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_rows"), col("n_defects"),
        expr("n_defects * 1000000 div n_rows").as("rate_ppm"),
        expr("tx * 1000000 div greatest(tn, 1)").as("center_ppm"))
      .withColumn("out_of_control",
        expr("""cast(rate_ppm - center_ppm as decimal(38,0))
            * (rate_ppm - center_ppm) * n_rows
            > cast(9 as decimal(38,0)) * center_ppm
            * (1000000 - center_ppm)"""))
      .withColumn("side",
        when(!col("out_of_control"), "in")
          .when(col("rate_ppm") > col("center_ppm"), "high")
          .otherwise("low"))
  }

  /** Declarative constraint-suite audit (the Deequ/"expectations" shape):
    * evaluate every rule over the table in ONE map-side pass — a single
    * aggregate computes all violation counters, then the 1-row result
    * unpivots to a long-format report. N rules never mean N scans.
    *
    * Contract: a row violates a rule iff the predicate evaluates to
    * FALSE; a NULL predicate (null inputs) is NOT a violation — pair
    * with an explicit IS NOT NULL rule when nulls should fail. Rates in
    * floored ppm.
    *
    * Output: one row per rule — (rule, n_violations, n_rows,
    * violation_ppm). */
  def constraintAudit(df: DataFrame,
      rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.zipWithIndex.map { case ((_, c), i) =>
        count(when(!c, lit(1))).as(s"v_$i") }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col(s"v_$i").as("n_violations"),
          col("n_rows").as("n_rows")) }: _*)).as("r"))
      .select(col("r.rule").as("rule"), col("r.n_violations"),
        col("r.n_rows"))
      .withColumn("violation_ppm",
        expr("n_violations * 1000000 div greatest(n_rows, 1)"))
  }

  /** Pearson chi-square independence audit of two categorical columns —
    * "is the language mix the same across sources, or does some source
    * skew" (the categorical sibling of the PSI/KS drift monitors; also
    * the standard sampling-bias check after any filtering stage).
    *
    * Integer-exact, libm-free: expected counts in floored micro-units
    * E_micro = row_tot * col_tot * 1e6 div n (the product runs in
    * DECIMAL(38,0) — n^2 * 1e6 overflows BIGINT at real scale), each
    * cell's contribution (O*1e6 - E_micro)^2 div E_micro lands back in
    * micro-units of the chi-square statistic, and the scalar statistic
    * is an exact BIGINT sum of per-cell BIGINTs (no float summation
    * order anywhere). Structural zeros are REAL cells: the margins
    * cross-join materializes every (a, b) combination, observed 0 where
    * the pair never occurs — omitting them understates the statistic.
    *
    * Scale shape: one map-side-combined agg to the contingency grain,
    * margin rollups of that tiny frame, a margins cross bounded by
    * |dom(a)| * |dom(b)|, and a 1-row totals broadcast. Fact rows are
    * touched exactly once.
    *
    * Output: one row per contingency cell — (a, b, observed,
    * expected_micro, contrib_micro, chi2_micro, dof); chi2_micro and
    * dof = (|dom a|-1)(|dom b|-1) repeat on every row. */
  def chi2Independence(df: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val cells = df
      .select(col(aCol).cast("string").as("a"),
        col(bCol).cast("string").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy("a").agg(sum(col("observed")).as("row_tot"))
    val colTot = cells.groupBy("b").agg(sum(col("observed")).as("col_tot"))
    val tot = cells.agg(sum(col("observed")).as("n"),
      countDistinct(col("a")).as("nr"), countDistinct(col("b")).as("nc"))
    rowTot.crossJoin(colTot)
      .join(cells, Seq("a", "b"), "left")
      .withColumn("observed", coalesce(col("observed"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("expected_micro",
        expr("cast(row_tot as decimal(38,0)) * col_tot * 1000000 div n"))
      .withColumn("diff_micro",
        expr("observed * 1000000 - expected_micro"))
      .withColumn("contrib_micro",
        expr("cast(diff_micro as decimal(38,0)) * diff_micro " +
          "div greatest(expected_micro, 1)"))
      .withColumn("chi2_micro",
        sum(col("contrib_micro")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("dof", expr("(nr - 1) * (nc - 1)"))
      .select(col("a"), col("b"), col("observed"), col("expected_micro"),
        col("contrib_micro"), col("chi2_micro"), col("dof"))
  }

  /** Pairwise Pearson correlation audit over a fixed list of numeric
    * columns — the multivariate sibling of [[columnProfile]]: which
    * feature pairs move together (redundant features, leakage suspects,
    * derived-column drift like price no longer tracking quantity).
    *
    * Integer-exact, sqrt-free: callers pass PRE-SCALED integer columns
    * (whole units — the unit contract every house audit states). One
    * map-side-combined aggregation computes every moment — n, each
    * column sum, and each pairwise product sum — in DECIMAL(38,0), so
    * fact rows are touched exactly once and the result is one row
    * regardless of corpus size. Per pair (i, j):
    *
    *   cov = n·S_ij − S_i·S_j,  vx = n·S_ii − S_i²,  vy = n·S_jj − S_j²
    *
    * and instead of r (whose sqrt would drag in libm), the audit emits
    * r² in floored ppm plus the sign of cov — exactly the information a
    * redundancy screen reads, with zero float anywhere:
    *
    *   r2_ppm = ((|cov|·1e9 div vx) · |cov| div vy) div 1000
    *
    * The two-step floored division is the house overflow-free form (cf.
    * q96's lift), and the FIRST quotient is scaled by 1e9 — not the
    * output's 1e6 — with the extra 1e3 shed at the end, so a pair whose
    * variances sit ~1e6 apart (mixed units: micro-cents vs counts) does
    * not floor the first step to 0-1 and under-report a real
    * correlation. Both engines state the identical floor sequence. All
    * intermediates non-negative, so trunc-vs-floor division semantics
    * can never diverge. Constant columns (vx = 0 or vy = 0) force
    * cov = 0 and report r2_ppm = 0, sign 0 via the greatest(·, 1)
    * guard. Headroom (Cauchy-Schwarz bounds the intermediate by
    * 1e9·vy): n²·max|x|²·max|y|² · 1e9 < 1e38, i.e. moments below
    * ~1e29 — at 100 TB keep unit choice coarse enough (the audit is
    * about direction and strength, not the 7th decimal); beyond that
    * Spark's non-ANSI decimal overflow NULLs while DuckDB's HUGEINT
    * errors, so the bound is a contract, not a suggestion.
    *
    * Output: one row per unordered pair — (x_col, y_col, n, r2_ppm,
    * corr_sign in {-1, 0, 1}). */
  def correlationMatrix(df: DataFrame,
      columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, "need at least two columns to correlate")
    require(columns.distinct.size == columns.size, "duplicate column")
    val pairs = for {
      i <- columns.indices; j <- columns.indices if i <= j
    } yield (i, j)
    val aggs = count(lit(1)).cast("decimal(38,0)").as("n") +:
      (columns.zipWithIndex.map { case (c, i) =>
        sum(col(c).cast("decimal(38,0)")).as(s"s_$i") } ++
       pairs.map { case (i, j) =>
         sum((col(columns(i)).cast("decimal(38,0)") *
           col(columns(j))).cast("decimal(38,0)")).as(s"p_${i}_$j") })
    val moments = df.agg(aggs.head, aggs.tail: _*)
    val out = pairs.filter { case (i, j) => i < j }.map { case (i, j) =>
      struct(lit(columns(i)).as("x_col"), lit(columns(j)).as("y_col"),
        col("n").cast("long").as("n"),
        (col("n") * col(s"p_${i}_$j") - col(s"s_$i") * col(s"s_$j"))
          .as("cov"),
        (col("n") * col(s"p_${i}_$i") - col(s"s_$i") * col(s"s_$i"))
          .as("vx"),
        (col("n") * col(s"p_${j}_$j") - col(s"s_$j") * col(s"s_$j"))
          .as("vy"))
    }
    moments.select(explode(array(out: _*)).as("r"))
      .select(col("r.x_col").as("x_col"), col("r.y_col").as("y_col"),
        col("r.n").as("n"), col("r.cov"), col("r.vx"), col("r.vy"))
      // two-step floored division: scale the FIRST quotient by 1e9 (not
      // the output's 1e6) and shed the extra 1e3 at the end, so a pair
      // whose variances differ by ~1e6x no longer floors the first step
      // to 0-1 and under-reports a real correlation (ADVICE r8). Range:
      // the intermediate is bounded by 1e9 * vy (Cauchy-Schwarz), so
      // decimal(38,0)/HUGEINT holds while vy < 1e29 — far beyond any
      // 64-bit input moment
      .withColumn("r2_ppm",
        expr("cast((abs(cov) * 1000000000 div greatest(vx, 1)) * abs(cov)" +
          " div greatest(vy, 1) div 1000 as bigint)"))
      .withColumn("corr_sign",
        when(col("cov") > 0, 1L).when(col("cov") < 0, -1L)
          .otherwise(0L))
      .select("x_col", "y_col", "n", "r2_ppm", "corr_sign")
  }

  /** Wald's sequential probability ratio test (SPRT, Wald 1945) tracked
    * over ordered buckets — the SEQUENTIAL companion to the fixed-sample
    * p-chart ([[rateControlChart]]): instead of testing each bucket
    * alone, evidence accumulates until it is DECISIVE either way, with
    * both error rates controlled by construction. The "when did the
    * alarm become statistically settled" readout.
    *
    * Callers pass the per-observation log-likelihood-ratio increments
    * as PRE-FLOORED milli-nat constants (llr1Milli for a defect, i.e.
    * floor(1000·ln(p1/p0)); llr0Milli for a non-defect, i.e.
    * floor(1000·ln((1-p1)/(1-p0)))) plus the decision bound
    * floor(1000·ln((1-err)/err)) — log-free at runtime, exactly the
    * Benford-constant discipline, so cum sums are engine- and
    * partitioning-exact. Per bucket:
    *
    *   cum = sum over buckets so far of (x·llr1 + (n-x)·llr0)
    *   verdict: cum >= bound -> reject_h0 (rate is at p1 or worse),
    *            cum <= -bound -> accept_h0, else continue
    *
    * One map-side bucket aggregation over fact rows; the cumulative
    * window runs on the CALENDAR-sized bucket frame (single-partition
    * by design, like every house calendar fold).
    *
    * Output ascending: (bucket, n, n_defect, cum_llr_milli, verdict). */
  def sprtMonitor(df: DataFrame, bucketCol: Column, defect: Column,
      llr1Milli: Long, llr0Milli: Long, boundMilli: Long): DataFrame = {
    require(boundMilli > 0, "decision bound must be positive")
    df.select(bucketCol.cast("string").as("bucket"),
        when(defect, 1L).otherwise(0L).as("d"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("d")).as("n_defect"))
      .withColumn("cum_llr_milli",
        sum(col("n_defect") * llr1Milli +
          (col("n") - col("n_defect")) * llr0Milli)
          .over(org.apache.spark.sql.expressions.Window.orderBy("bucket")))
      .withColumn("verdict",
        when(col("cum_llr_milli") >= boundMilli, "reject_h0")
          .when(col("cum_llr_milli") <= -boundMilli, "accept_h0")
          .otherwise("continue"))
      .select("bucket", "n", "n_defect", "cum_llr_milli", "verdict")
  }
}

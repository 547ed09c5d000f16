package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the pre-aggregation algebra a 100 TB
  * pipeline runs on: sketch each ingest window ONCE at write time, then
  * answer cross-window frequency questions by merging the tiny sketch
  * artifacts instead of re-scanning raw data. The reference re-reads its
  * source tables for every run (`/root/reference/osarchiver/source/
  * db.py:279-298`); at scale the only affordable shape is "reduce each
  * day to a constant-size summary, reaggregate summaries".
  *
  * The Count-Min sketch (Cormode & Muthukrishnan 2005) is LINEAR: the
  * sketch of a union is the cell-wise sum of the sketches, exactly. All
  * arithmetic is integer (md5-derived bucket hashes, BIGINT cell
  * counts), so a merged sketch is bit-identical to the sketch built
  * directly over the union on any engine and any partitioning — the
  * same q67 discipline, factored into a reusable build/merge/probe
  * algebra.
  */
object Sketches {

  /** Row `depth`'s bucket for `key`: 8 md5 hex chars -> BIGINT mod
    * width. Engine-portable integer hashing (no murmur seed drift). */
  private[operators] def cmsBucket(depth: Column, key: Column,
      width: Int): Column =
    conv(substring(md5(concat(depth.cast("string"), lit(":"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % width

  /** One Count-Min sketch PER GROUP (e.g. per ingest day): output
    * (grp, d, bucket, cell) with at most depth*width rows per group
    * regardless of key cardinality. One explode(depth) pass + one
    * map-side-combinable aggregation — this is the artifact a pipeline
    * persists beside each window's raw data. */
  def countMinByGroup(df: DataFrame, groupCol: String, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1, width >= 2")
    df.select(col(groupCol).as("grp"), col(keyCol).as("k"))
      .select(col("grp"), col("k"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .withColumn("bucket", cmsBucket(col("d"), col("k"), width))
      .groupBy("grp", "d", "bucket").agg(count(lit(1)).as("cell"))
  }

  /** Merge per-group sketches into one sketch over their union — CMS
    * linearity: cell-wise BIGINT sum, bit-equal to sketching the union
    * directly. Input is groups * depth * width rows AT MOST (constant
    * per group); the rollup never touches raw data. */
  def mergeCountMin(sketches: DataFrame): DataFrame =
    sketches.groupBy("d", "bucket").agg(sum(col("cell")).as("cell"))

  /** ANALYZE-style column statistics PER GROUP, as a mergeable artifact:
    * (grp, n_rows, n_nulls, min_v, max_v, kmv) — counts and extrema
    * merge by sum/min/max trivially, and the distinct count travels as
    * a KMV bottom-k sketch (the k smallest `h(v) = v*2654435761 mod
    * 2^31` values, q45's engine-portable integer hash): bottom-k of a
    * UNION is the bottom-k of the per-part bottom-k's, exactly, so NDV
    * survives reaggregation with zero raw re-scan. This is the
    * file/partition-footer statistic a 100 TB catalog maintains
    * incrementally.
    *
    * Scale shape: one grouped aggregate for counts/extrema + one
    * rank-limited window over DISTINCT hashes for the bottom-k (bounded
    * per-group state — never a collect_set of every distinct value),
    * joined on the group key. */
  def columnStatsByGroup(df: DataFrame, groupCol: String,
      valueCol: String, k: Int = 16): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val vals = df.select(col(groupCol).as("grp"),
      col(valueCol).cast("long").as("v"))
    val base = vals.groupBy("grp").agg(
      count(lit(1)).as("n_rows"),
      count(when(col("v").isNull, lit(1))).as("n_nulls"),
      min(col("v")).as("min_v"), max(col("v")).as("max_v"))
    // native KMV aggregate: partial buffers are k-capped per partition
    // (map-side combine), so the exchange carries |groups| * k longs —
    // the declarative distinct + rank-window form shuffles EVERY
    // distinct hash first, which is the whole job at 100 TB
    val bottomK = vals.filter(col("v").isNotNull)
      .select(col("grp"),
        pmod(col("v") * lit(2654435761L), lit(2147483648L)).as("h"))
      .groupBy("grp").agg(
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.expressions.KmvBottomK(
            org.apache.spark.sql.GraftColumnBridge.expression(col("h")), k)
            .toAggregateExpression()).as("kmv"))
    base.join(bottomK, Seq("grp"), "left")
      .select(col("grp"), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        coalesce(col("kmv"), array().cast("array<long>")).as("kmv"))
  }

  /** Merge per-group column-stats artifacts into whole-table statistics
    * WITHOUT touching raw data: counts sum, extrema min/max, and the
    * merged KMV is the bottom-k of the union of the per-group sketches
    * (exact — see [[columnStatsByGroup]]). `est_distinct` is the
    * classic (k-1) * M / h_k estimator, or the exact sketch size when
    * fewer than k distinct hashes exist. Input is |groups| * (k+4)-ish
    * values; everything here is driver-scale. */
  def mergeColumnStats(stats: DataFrame, k: Int = 16): DataFrame = {
    val totals = stats.agg(
      sum(col("n_rows")).as("n_rows"), sum(col("n_nulls")).as("n_nulls"),
      min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
    val merged = stats.select(explode(col("kmv")).as("h")).distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("h")))
      .filter(col("rn") <= k)
      .agg(sort_array(collect_list(col("h"))).as("kmv"))
    totals.crossJoin(broadcast(merged))
      .select(col("n_rows"), col("n_nulls"), col("min_v"), col("max_v"),
        array_join(transform(col("kmv"), x => x.cast("string")), ",")
          .as("kmv_sketch"),
        graft.functions.NumericFunctions.fround(
          when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(2147483648.0) /
              element_at(col("kmv"), k).cast("double")), 2)
          .as("est_distinct"))
  }

  /** Re-aggregate per-group column-stats artifacts BY GROUP — the fold a
    * streaming maintainer runs per micro-batch (st14), and the rollup a
    * partitioned catalog runs when files merge: counts sum, extrema
    * min/max, and the merged KMV is the native bottom-k aggregate over
    * the unioned sketch entries (exact — bottom-k of a union is the
    * bottom-k of the per-part bottom-k's). Output schema is identical to
    * [[columnStatsByGroup]], so folding is closed: fold(fold(a, b), c)
    * == stats(a + b + c) bit-for-bit, any grouping, any order.
    * Everything is artifact-sized. */
  def foldColumnStats(stats: DataFrame, k: Int = 16): DataFrame = {
    val base = stats.groupBy("grp").agg(
      sum(col("n_rows")).as("n_rows"), sum(col("n_nulls")).as("n_nulls"),
      min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
    val merged = stats.select(col("grp"), explode(col("kmv")).as("h"))
      .groupBy("grp").agg(
        org.apache.spark.sql.GraftColumnBridge.column(
          graft.functions.expressions.KmvBottomK(
            org.apache.spark.sql.GraftColumnBridge.expression(col("h")), k)
            .toAggregateExpression()).as("kmv"))
    base.join(merged, Seq("grp"), "left")
      .select(col("grp"), col("n_rows"), col("n_nulls"),
        col("min_v"), col("max_v"),
        coalesce(col("kmv"), array().cast("array<long>")).as("kmv"))
  }

  /** Trailing-window NDV for EVERY day from the per-day KMV artifacts —
    * "distinct users in the last W days, daily" without re-scanning any
    * raw history: bottom-k of a union is the bottom-k of the per-part
    * bottom-k's (see [[columnStatsByGroup]]), so a W-day window merges W
    * constant-size sketches. The raw-data alternative re-reads W days of
    * facts per window — W x the corpus across the full report; this
    * never touches fact rows at all.
    *
    * Input: per-day artifacts from [[columnStatsByGroup]] keyed by a
    * NUMERIC day (e.g. days-since-epoch). Every stage is |days| * k
    * sized: each day's sketch fans out to the <= W windows it feeds
    * (sequence + explode), anchors restrict to days present in the
    * input (absent days neither anchor nor contribute), then one
    * rank-limited window per anchor re-derives the merged bottom-k.
    *
    * Output: (d, n_days, n_rows_win, est_distinct) — est is the classic
    * (k-1) * M / h_k, or the exact union size when fewer than k distinct
    * hashes exist in the window. */
  def slidingNdv(stats: DataFrame, dayCol: String, windowDays: Int,
      k: Int = 16): DataFrame = {
    require(windowDays >= 1 && windowDays <= 64, "1 <= windowDays <= 64")
    require(k >= 2, "KMV needs k >= 2")
    val s = stats.select(col(dayCol).cast("long").as("d"),
      col("n_rows"), col("kmv"))
    val expanded = s.select(col("n_rows"), col("kmv"),
      explode(sequence(col("d"), col("d") + lit((windowDays - 1).toLong)))
        .as("wd"))
    val anchored = expanded
      .join(s.select(col("d").as("wd")).distinct(), Seq("wd"))
    val base = anchored.groupBy("wd").agg(
      count(lit(1)).as("n_days"), sum(col("n_rows")).as("n_rows_win"))
    val bk = anchored.select(col("wd"), explode(col("kmv")).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("wd").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("wd").agg(sort_array(collect_list(col("h"))).as("kmv"))
    base.join(bk, Seq("wd"), "left")
      .select(col("wd").as("d"), col("n_days"), col("n_rows_win"),
        graft.functions.NumericFunctions.fround(
          when(col("kmv").isNull, lit(0.0))
            .when(size(col("kmv")) < k, size(col("kmv")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(2147483648.0) /
              element_at(col("kmv"), k).cast("double")), 2)
          .as("est_distinct"))
  }

  /** Per-group fixed-grid histogram — the MERGEABLE quantile artifact
    * completing the per-window sketch algebra (counts -> CMS, NDV ->
    * KMV, heavy hitters -> MG, quantiles -> this): one (grp, bucket,
    * cnt) frame bounded by nBuckets per group, mergeable across
    * windows by plain count addition. Bucket = cents div bucketWidth,
    * clamped into [0, nBuckets-1] (out-of-grid mass lands in the edge
    * buckets — the documented saturation convention; size the grid to
    * the domain). */
  def histogramByGroup(df: DataFrame, grpCol: String, centsCol: String,
      bucketWidth: Long, nBuckets: Int): DataFrame = {
    require(bucketWidth >= 1 && nBuckets >= 2)
    df.select(col(grpCol).as("grp"),
        least(greatest(expr(s"cast($centsCol as bigint) div $bucketWidth"),
          lit(0L)), lit(nBuckets - 1L)).as("bucket"))
      .groupBy("grp", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Trailing-window quantiles answered ENTIRELY from merged per-day
    * histograms (the s26 shape for percentiles): a W-day window merges
    * W constant-size histograms by count addition — no raw re-scan per
    * window — then each requested quantile reads the smallest bucket
    * whose running count reaches k = ceil(n * pc / 100). The answer is
    * the bucket's LOWER EDGE in cents (grid-quantized by design; the
    * exact path is Quantile.exactQuantiles when raw rows are at hand).
    *
    * Input `daily` = [[histogramByGroup]] keyed by an integer day.
    * Output long-format: (d, q_pc, n_window, lo_cents), one row per
    * (window anchor day, quantile). */
  def slidingQuantile(daily: DataFrame, dayCol: String, windowDays: Int,
      bucketWidth: Long, quantilesPc: Seq[Int]): DataFrame = {
    require(windowDays >= 1 && windowDays <= 64, "1 <= windowDays <= 64")
    require(quantilesPc.nonEmpty &&
      quantilesPc.forall(p => p >= 1 && p <= 100))
    val s = daily.select(col(dayCol).cast("long").as("d"),
      col("bucket"), col("cnt"))
    // each day's histogram serves the next windowDays anchor days;
    // anchors restricted to days that exist (the s26 convention)
    val expanded = s.select(col("bucket"), col("cnt"),
      explode(sequence(col("d"), col("d") + lit((windowDays - 1).toLong)))
        .as("wd"))
    val anchored = expanded
      .join(s.select(col("d").as("wd")).distinct(), Seq("wd"))
    val merged = anchored.groupBy("wd", "bucket")
      .agg(sum(col("cnt")).as("cnt"))
    val cum = merged
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("wd").orderBy("bucket")))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("wd")))
    quantilesPc.map { pc =>
      cum.where(col("cum") >= expr(s"(n * $pc + 99) div 100"))
        .groupBy("wd")
        .agg(max(col("n")).as("n_window"), min(col("bucket")).as("b"))
        .select(col("wd").as("d"), lit(pc.toLong).as("q_pc"),
          col("n_window"), (col("b") * bucketWidth).as("lo_cents"))
    }.reduce(_ unionAll _)
  }

  /** Point-frequency estimates for each probe row's `keyCol`: min over
    * the depth rows' cells — never an underestimate. The sketch is
    * <= depth*width rows, so the probe join broadcasts it; probe columns
    * pass through unchanged. */
  def probeCountMin(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    val passThrough = probes.columns.map(col)
    probes
      .select(passThrough :+
        explode(sequence(lit(0), lit(depth - 1))).as("d"): _*)
      .withColumn("bucket", cmsBucket(col("d"), col(keyCol), width))
      .join(broadcast(sketch), Seq("d", "bucket"))
      .groupBy(passThrough: _*)
      .agg(min(col("cell")).as("cms_estimate"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, RNG-free sampling operators for training-data pipelines.
  *
  * Every decision derives from an md5 bucket of the row's id — the same
  * trick as the dd8 train/val/test split: no random state to seed or
  * broadcast, identical keep/drop decisions on any engine, any cluster
  * size, and any partitioning, and the sample is stable across re-runs
  * (critical when a 100 TB corpus is re-materialized incrementally —
  * a seeded `sample()` changes membership whenever partitioning shifts).
  */
object Sampling {

  /** Bucket in [0, 256): first two hex chars of md5(id). */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")

  /** Deterministic key-hash sampling: keep rows whose md5(key) 2-hex
    * prefix sorts below `hexCut` (e.g. "1a" keeps ~26/256 ~ 10%).
    * RNG-free, so the SAME keys are kept on any engine, partitioning, or
    * rerun — the root-table sampler for coherent (referential-integrity-
    * preserving) subsetting: sample the root by hash, semi-join each
    * child level down the FK chain, and every sampled child row still
    * has its parent — the dev-fixture / debugging subset a naive
    * per-table Bernoulli sample can never give you. */
  def hashPrefixSample(df: DataFrame, keyCol: String,
      hexCut: String): DataFrame =
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 2) < hexCut)

  /** Per-stratum rate as a MAP-LITERAL lookup, not a when-chain: a chain of
    * `WHEN strata = k` branches references the strata column once per
    * stratum, and when the strata value is itself a computed expression
    * (langId is a ~30-term CASE over tokenization), filter pushdown inlines
    * that expression at EVERY reference — measured ~3x the whole query's
    * cost at 256 strata. element_at(map, strata) evaluates the strata
    * expression exactly once. Shared by the stratified sampler and the
    * curation pipeline so the lookup semantics cannot drift. */
  private[operators] def rateLookup(
      rates256: Map[String, Int], default256: Int, strata: Column): Column =
    if (rates256.isEmpty) lit(default256)
    else coalesce(
      element_at(
        map(rates256.toSeq.flatMap { case (k, r) => Seq(lit(k), lit(r)) }: _*),
        strata),
      lit(default256))

  /** Per-stratum keep rates in 1/256ths: rows whose bucket falls below
    * their stratum's rate survive. `rates256` maps stratum values to
    * rates (256 = keep all, 128 = keep half); unlisted strata use
    * `default256`. The canonical data-mixing operator: up/down-weight
    * languages, sources, or quality bands with exact, reproducible
    * proportions.
    *
    * Output schema equals the input's unless `keepBucket` is set, which
    * appends the internal `bucket` column (int in [0, 256)) for consumers
    * that audit the sampling decision (e.g. the dd10 oracle query).
    */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, strataCol: String,
      rates256: Map[String, Int], default256: Int,
      keepBucket: Boolean = false): DataFrame = {
    require((rates256.values ++ Seq(default256)).forall(r => r >= 0 && r <= 256),
      "rates are in [0, 256]")
    require(!df.columns.contains("bucket"),
      "input already has a 'bucket' column — it would be silently " +
        "overwritten by the sample bucket; rename or drop it first")
    val rate = rateLookup(rates256, default256, col(strataCol))
    val sampled = df.withColumn("bucket", hashBucket(col(idCol)))
      .filter(col("bucket") < rate)
    if (keepBucket) sampled else sampled.drop("bucket")
  }

  /** Per-domain cap: keep at most `cap` rows per stratum, preferring rows
    * by `orderBy` (then `idCol` ascending as the deterministic tiebreak).
    * The C4/RefinedWeb-style guard against any one domain dominating a web
    * corpus: a single hot source (a crawler trap, a mirror farm) is
    * truncated to its best `cap` documents instead of swamping the mixture.
    *
    * One window over the stratum — a single hash shuffle on `strataCol`;
    * per-stratum state is the top-`cap` heap inside the window sort, never
    * the whole stratum in memory. Skew note: a stratum with billions of
    * rows makes this window the hot partition; at that scale pre-filter
    * with a per-stratum count and only window the offenders, or salt the
    * stratum and take per-salt caps followed by a cap over the union.
    *
    * Output: the kept rows plus a `cap_rank` column (1 = best).
    */
  def domainCap(
      df: DataFrame, strataCol: String, orderBy: Column, idCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, "cap >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(orderBy, col(idCol))
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= cap)
  }

  /** Exact-proportion per-stratum train/val/test split. The hash split
    * (dd8) is stateless and engine-portable but only approximates its
    * fractions — each stratum's actual rate wobbles by O(1/sqrt(n)), so a
    * 50-document language may land 70/30 instead of 80/20. Here rows are
    * ranked within their stratum by md5(id) (a deterministic shuffle
    * order — no RNG, stable across engines and re-runs) and the split
    * boundaries are integer-exact per stratum: rank*256 <= n*train256 is
    * train, rank*256 <= n*(train256+val256) is val, the rest test. Every
    * stratum hits its target counts exactly (floor semantics), which is
    * what held-out evaluation over rare strata needs.
    *
    * One window per stratum = a single hash shuffle on `strataCol`; the
    * same hot-stratum caveat as [[domainCap]] (salt or pre-split a
    * billion-row stratum; the md5 ranking is order-free so per-salt
    * ranks + offset merge is exact).
    */
  def stratifiedExactSplit(
      df: DataFrame, idCol: String, strataCol: String,
      train256: Int, val256: Int): DataFrame = {
    require(train256 >= 0 && val256 >= 0 && train256 + val256 <= 256,
      "train256 + val256 <= 256")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val n = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("split",
        when(col("__rn") * 256 <= col("__n") * train256, "train")
          .when(col("__rn") * 256 <= col("__n") * (train256 + val256), "val")
          .otherwise("test"))
      .drop("__rn", "__n")
  }

  /** Weighted sample WITHOUT replacement of size k (Efraimidis–Spirakis
    * A-Res), RNG-free: the per-row uniform u comes from the first 32 md5
    * bits of the id (shifted into (0, 1]), the selection key is ln(u)/w
    * — a monotone transform of the classical u^(1/w) — and the k largest
    * keys win, ties broken by id. Inclusion probability is proportional
    * to weight, membership is identical on any engine/partitioning/rerun,
    * and selection is a top-k (per-partition bounded heaps + one merge),
    * never a global sort. Rows with non-positive weight are excluded (a
    * zero-weight row can never win).
    *
    * FP caveat (same class as dd5b's): keys are transcendental doubles, so
    * two rows whose keys agree to within one ulp could order differently
    * across libm implementations. The top-k boundary gap on real corpora
    * is ~1/n — astronomically wider than an ulp.
    */
  def weightedTopKSample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val h32 = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (h32 + lit(1L)).cast("double") / lit(4294967296.0)
    df.filter(col(weightCol) > 0)
      .withColumn("es_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Uniform token-budget waterfilling across sources — the allocation
    * step of data mixing under a hard budget: each source gets an equal
    * share of the remaining budget each round, capped at what it has;
    * saturated (fully-taken) sources drop out and their unused share
    * redistributes to the rest. `rounds` fixed iterations (full
    * convergence needs at most |sources| rounds; any un-redistributed
    * remainder after the last round is deliberately left unspent — the
    * deterministic, documented contract, same fixed-iteration discipline
    * as g1/g4). All integer token arithmetic: per-round quota is
    * remaining div |unsaturated|, so quota * |unsaturated| never exceeds
    * the remaining budget and the allocation can never overshoot.
    *
    * Scale shape: ONE tokenize+aggregate pass over the corpus collapses
    * it to |sources| rows; every round after that is a 1-row stats
    * broadcast cross on that tiny frame. Output per source: (source,
    * avail, alloc, saturated, fill_ppm). */
  def budgetWaterfill(docs: DataFrame, sourceCol: String, textCol: String,
      budgetTokens: Long, rounds: Int = 3): DataFrame = {
    require(budgetTokens >= 0 && rounds >= 1)
    var alloc = docs
      .select(col(sourceCol).as("source"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).as("nt"))
      .groupBy("source").agg(sum(col("nt")).as("avail"))
      .withColumn("alloc", lit(0L))
    for (_ <- 1 to rounds) {
      val stats = alloc.agg(sum(col("alloc")).as("spent"),
        count(when(col("alloc") < col("avail"), 1)).as("nu"))
      alloc = alloc.crossJoin(broadcast(stats))
        .select(col("source"), col("avail"),
          when(col("alloc") < col("avail"),
            least(col("avail"), col("alloc") +
              expr(s"(${budgetTokens}L - spent) div greatest(nu, 1)")))
            .otherwise(col("alloc")).as("alloc"))
    }
    alloc.select(col("source"), col("avail"), col("alloc"),
      (col("alloc") >= col("avail")).as("saturated"),
      expr("alloc * 1000000 div greatest(avail, 1)").as("fill_ppm"))
  }
}

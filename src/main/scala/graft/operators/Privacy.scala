package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-risk audits for data about to leave the trust boundary.
  *
  * The reference moves rows out of a production database into archives
  * readable by a wider audience (files, object stores —
  * `/root/reference/osarchiver/destination/file/__init__.py`), but has no
  * notion of whether those rows are safe to release. These operators add
  * the standard structural-privacy checks a release pipeline runs first:
  * k-anonymity (no quasi-identifier combination may isolate fewer than k
  * rows) and l-diversity (each combination must carry at least l distinct
  * sensitive values, or the sensitive attribute is disclosed even without
  * row isolation — Machanavajjhala et al. 2007).
  *
  * Scale shape: both audits are ONE hash aggregation over the
  * quasi-identifier tuple with map-side combine — the same plan as any
  * groupBy/count, no joins, no windows. The distinct-sensitive count is
  * exact via a two-level aggregation (QI+sensitive, then QI), which
  * Spark plans as two exchanges of pre-combined partials; at extreme
  * cardinality swap in approx_count_distinct for the l-check (the k-check
  * is already a plain count).
  */
object Privacy {

  /** Per-equivalence-class k-anonymity/l-diversity report: one row per
    * distinct quasi-identifier combination with its class size, its
    * number of distinct sensitive values, and the pass flags.
    *
    * Release gate usage: rows in classes with `k_ok = false` must be
    * suppressed or generalized before export; `l_ok = false` classes leak
    * the sensitive attribute by homogeneity.
    */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 1 && l >= 1, "k >= 1 and l >= 1")
    df.groupBy(qiCols.map(col) :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(qiCols.map(col): _*)
      .agg(sum(col("__n")).as("class_size"),
        count(lit(1)).as("n_sensitive"))
      .select(qiCols.map(col) ++ Seq(
        col("class_size"),
        col("n_sensitive"),
        (col("class_size") >= k).as("k_ok"),
        (col("n_sensitive") >= l).as("l_ok")): _*)
  }

  /** The enforcement half: drop every row whose quasi-identifier class is
    * smaller than k (suppression — the conservative fix; generalization
    * is the caller coarsening its QI columns and re-running). Implemented
    * as an inner join against the passing classes, broadcastable when the
    * QI space is small; identical row content, only membership changes.
    */
  def suppressBelowK(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1)
    val ok = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("__class_size"))
      .filter(col("__class_size") >= k)
      .drop("__class_size")
    df.join(ok, qiCols, "left_semi")
  }
}

package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation pipeline — the composition the individual
  * operators exist for, in the order a pretraining data pipeline runs them:
  *
  *   1. quality gate (Gopher rules)            → status 'gopher'
  *   2. exact dedup (content hash, keep min id)→ status 'exact_dup'
  *   3. near-dup dedup (MinHash-LSH candidates + exact Jaccard verify;
  *      drop the later doc of each verified pair) → status 'near_dup'
  *   4. per-domain cap (longest-first)         → status 'domain_cap'
  *   5. language mixture sampling (hash-based) → status 'sampled_out'
  *   otherwise                                 → status 'kept'
  *
  * Every input document receives exactly one status — the first stage that
  * drops it — so the output is a complete, auditable disposition ledger
  * (what a 100 TB curation run reports to its operators).
  *
  * Scale shape: stages 1/2/5 are narrow or single-shuffle; stage 3 is the
  * LSH pipeline (equi-joins on fixed-width signatures, no corpus
  * self-join); stage 4 is one window. Stage inputs chain as filters, so
  * each stage processes only prior survivors. No driver-side state.
  */
object CurationPipeline {

  def curate(
      docs: DataFrame, idCol: String, textCol: String, sourceCol: String,
      minTokens: Int = 50,
      shingleN: Int = 2, numHashes: Int = 16, rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5,
      cap: Int = 1000,
      rates256: Map[String, Int] = Map("en" -> 128, "und" -> 256),
      default256: Int = 204): DataFrame = {
    // feeds the gopher-drop branch and every later stage
    val scored = PlanPersist("curate.scored", docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"),
        col(sourceCol).as("source"))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
      .withColumn("gopher_keep",
        TextFunctions.gopherRules(col("text"), minTokens)))

    // stage 1: quality gate
    val g = scored.filter(col("gopher_keep"))
    // stage 2: exact dedup — first (min-id) copy survives
    val wDup = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val e = g.withColumn("dup_rn", row_number().over(wDup))
    val exactSurv = PlanPersist("curate.exactSurv",
      e.filter(col("dup_rn") === 1))
    // stage 3: near-dup — LSH candidates, exact-verified; the later doc of
    // each verified pair is dropped (doc_a < doc_b canonicalization makes
    // "later" well-defined and keeps the rule engine-portable without a
    // transitive-closure step)
    // tiny, but its lineage is the whole LSH pipeline — four output
    // branches read it, so cache the drop set, not the pipeline re-run
    val nearDrops = PlanPersist("curate.nearDrops",
      Dedup.lshVerifiedJaccardPairs(
          exactSurv, "doc_id", "text", shingleN, numHashes, rowsPerBand,
          jaccardThreshold)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("near_drop", lit(true)))
    val n = exactSurv.join(nearDrops, Seq("doc_id"), "left")
    val nearSurv = n.filter(col("near_drop").isNull)
    // stage 4: per-domain cap, longest-first
    val wCap = Window.partitionBy("source")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    val c = nearSurv.withColumn("cap_rank", row_number().over(wCap))
    val capSurv = c.filter(col("cap_rank") <= cap)
    // stage 5: language mixture sampling (deterministic hash buckets);
    // shared map-literal rate lookup (see Sampling.rateLookup scaladoc)
    val rate = Sampling.rateLookup(rates256, default256, col("lang"))
    // both the sampled-out and kept branches read this; langId is the
    // expensive part — evaluate it once
    val sampled = PlanPersist("curate.sampled", capSurv
      .withColumn("lang", TextFunctions.langId(col("text")))
      .withColumn("bucket", Sampling.hashBucket(col("doc_id"))))

    def out(df: DataFrame, status: String): DataFrame =
      df.select(col("doc_id"), col("n_tokens"), lit(status).as("status"))
    out(scored.filter(!col("gopher_keep")), "gopher")
      .unionByName(out(e.filter(col("dup_rn") > 1), "exact_dup"))
      .unionByName(out(n.filter(col("near_drop")), "near_dup"))
      .unionByName(out(c.filter(col("cap_rank") > cap), "domain_cap"))
      .unionByName(out(sampled.filter(col("bucket") >= rate), "sampled_out"))
      .unionByName(out(sampled.filter(col("bucket") < rate), "kept"))
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming document-corpus operators — the continuous-ingest face of the
  * dedup family: classify each arriving document batch against the
  * EXISTING corpus without ever rescanning it per batch.
  *
  * Reference behavior: none (osarchiver is batch-only); SURVEY.md §2.8
  * streaming + dedup surface (the dd15/dd28/dd40 incremental discipline,
  * now as a Structured Streaming source).
  */
object DocsStreaming {

  /** Stream-static novelty classification: arriving documents join the
    * static corpus fingerprint set (md5 of the text — dd1's exact-dup
    * key) and publish (doc_id, status) with status `exact_dup` or
    * `novel`. The ingest gate a continuously-growing training corpus
    * runs before admitting a crawl batch.
    *
    * Scale shape: the join is STATELESS stream-static (no watermark
    * state; each micro-batch joins the corpus side and is done), and the
    * corpus side is a fingerprint PROJECTION — one narrow column,
    * broadcast when small, hash-joined when not; the stream side never
    * accumulates. maxFilesPerTrigger=1 makes each arriving file one
    * micro-batch, the ingest-batch granularity the dd15 ledger uses. */
  def noveltyStream(spark: SparkSession, streamDocsPath: String,
      corpus: DataFrame, idCol: String, textCol: String,
      queryName: String, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val schema: StructType = spark.read.parquet(streamDocsPath).schema
    val fps = corpus.select(md5(col(textCol)).as("fp")).distinct()
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(streamDocsPath)
    stream
      .select(col(idCol).as("doc_id"), md5(col(textCol)).as("fp"))
      .join(fps.withColumn("hit", lit(true)), Seq("fp"), "left")
      .select(col("doc_id"),
        when(col("hit"), lit("exact_dup")).otherwise(lit("novel"))
          .as("status"))
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}

package graft.streaming

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocsStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("novelty stream equals the batch classification, arrives over " +
      "multiple micro-batches, and holds no state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-st12-spec")
    val corpus = Seq(
      (1L, "shared text one"), (2L, "shared text two"), (3L, "only corpus")
    ).toDF("doc_id", "text")
    // three stream files -> three micro-batches: a dup of corpus 1, a
    // novel doc, and a file holding one dup (of 2) plus one novel
    Seq(
      ("a", Seq((10L, "shared text one"))),
      ("b", Seq((20L, "never seen before"))),
      ("c", Seq((30L, "shared text two"), (31L, "also brand new")))
    ).foreach { case (n, rows) =>
      val sub = tmp.resolve(n).toString
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(sub)
      java.nio.file.Files.copy(
        new java.io.File(sub).listFiles()
          .filter(_.getName.endsWith(".parquet")).head.toPath,
        tmp.resolve(s"$n.parquet"))
    }
    Seq("a", "b", "c").foreach { n =>
      org.apache.commons.io.FileUtils.deleteDirectory(
        tmp.resolve(n).toFile)
    }
    val q = DocsStreaming.noveltyStream(spark, tmp.toString, corpus,
      "doc_id", "text", "st12_spec")
    q.awaitTermination()
    val got = spark.table("st12_spec")
      .as[(Long, String)].collect().toMap
    assert(got === Map(10L -> "exact_dup", 20L -> "novel",
      30L -> "exact_dup", 31L -> "novel"), got)
    // stateless: the progress log reports no state store rows
    assert(q.lastProgress == null ||
      q.recentProgress.forall(p => p.stateOperators.isEmpty ||
        p.stateOperators.forall(_.numRowsTotal == 0L)),
      "stream-static novelty join must keep no streaming state")
    // three files -> at least two distinct micro-batches processed
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      q.recentProgress.map(_.numInputRows).toSeq.toString)
    org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}

package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words entirely unrelated content here now"),
    (5L, "short")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_docs").as[(Long, Long)].collect().toSet
    assert(r.contains((1L, 2L))) // docs 1+2 collapse, representative is 1
    assert(r.count(_._2 == 1L) === 3)
  }

  test("ngram jaccard finds exact and near dup pairs, not unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 2L)) === 1.0) // identical => jaccard 1
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("short docs produce no shingles and no pairs") {
    val sh = Dedup.shingleSet(docs.filter($"doc_id" === 5L), "doc_id", "text", 3)
    assert(sh.count() === 0)
  }

  test("minhash LSH catches exact dups as candidates") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, numHashes = 16, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L))) // identical docs always share all bands
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash is equal for identical docs, differs for unrelated") {
    val sh = Dedup.simhash(docs, "doc_id", "text", bits = 16)
      .as[(Long, Long)].collect().toMap
    assert(sh(1L) === sh(2L))
    assert(sh(1L) !== sh(4L))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("connected components resolve chained pairs into one cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (9L, 3L))
      .toDF("doc_a", "doc_b")
    // both paths must agree: driver union-find and distributed propagation
    for (cc <- Seq(
        Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap,
        Dedup.distributedComponents(pairs, 20).as[(Long, Long)].collect().toMap)) {
      assert(cc(1L) === 1L && cc(2L) === 1L && cc(3L) === 1L && cc(9L) === 1L)
      assert(cc(5L) === 5L && cc(6L) === 5L)
      assert(cc.size === 6) // only pair members are labeled
    }
  }

  test("LSH candidates achieve high recall of truly-similar pairs") {
    val docs = graft.Tables.load(spark, graft.TestSpark.sf0001, "documents")
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, threshold = 0.7)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val candidates = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleN = 2, numHashes = 16, rowsPerBand = 4)
      .as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture must contain planted near-dups")
    val recall = truth.count(candidates.contains).toDouble / truth.size
    assert(recall >= 0.9,
      s"LSH recall $recall too low (16 hashes, 4 bands, jaccard>=0.7 truth)")
  }

  test("embedding near-dup finds the planted duplicate vector") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),    // same direction as 1
      (3L, Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (4L, Array(0.9f, 0.1f, 0.0f))     // close to 1
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // cos ≈ 0.994
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }
}

package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // corpus of 4 equal-length docs (dl = 4 = avgdl, so the length
  // normalizer is exactly 1 and scores reduce to idf * tf(k1+1)/(tf+k1)):
  //   doc1: spark spark spark spark   tf(spark)=4
  //   doc2: spark join x y            tf(spark)=1, tf(join)=1
  //   doc3: join join x y             tf(join)=2
  //   doc4: x y x y                   no query terms
  private def docs = Seq(
    (1L, "spark spark spark spark"),
    (2L, "spark join x y"),
    (3L, "join join x y"),
    (4L, "x y x y")
  ).toDF("doc_id", "text")

  private def run(terms: Seq[String], k: Int = 10) =
    Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = k)
      .as[(Int, Long, Double)].collect()

  test("bm25 matches hand computation when dl = avgdl") {
    // N=4; df(spark)=2, df(join)=2 -> idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    // tf-term (k1=1.2): tf=1 -> 2.2/2.2 = 1;  tf=2 -> 4.4/3.2 = 1.375;
    //                   tf=4 -> 8.8/5.2 = 1.6923...
    // doc2 scores both terms: 2 * floor(ln(2)*1e6)  = 1386294 u
    // doc3: floor(ln(2)*1.375*1e6)                  =  953077 u
    // doc1: floor(ln(2)*(4.4/2.6)*1e6)              = 1173172 u
    val r = run(Seq("spark", "join"))
    assert(r.map(t => (t._1, t._2)).toSeq ===
      Seq((1, 2L), (2, 1L), (3, 3L)))
    val byDoc = r.map(t => t._2 -> t._3).toMap
    assert(byDoc(2L) === 1.386)
    assert(byDoc(1L) === 1.173)
    assert(byDoc(3L) === 0.953)
  }

  test("k bounds the result and ties break by doc id") {
    val r = run(Seq("spark", "join"), k = 2)
    assert(r.length === 2)
    assert(r.map(_._1).toSeq === Seq(1, 2))
    // two docs with identical score (tf=1 of the same term): lower id first
    val tied = Retrieval.bm25TopK(
      Seq((7L, "join a b c"), (5L, "join a b c")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("join"))
      .as[(Int, Long, Double)].collect()
    assert(tied.map(_._2).toSeq === Seq(5L, 7L))
  }

  test("documents without any query term never appear") {
    val r = run(Seq("spark"))
    assert(!r.map(_._2).contains(4L) && !r.map(_._2).contains(3L))
  }
}

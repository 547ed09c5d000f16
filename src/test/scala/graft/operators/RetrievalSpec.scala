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

  // ----- reciprocal-rank fusion -----

  private def leg(rows: (Long, Int)*) = rows.toDF("doc_id", "rank")

  test("rrfFuse matches hand-computed integer contributions") {
    // c=60: rank 1 -> 1e9 div 61 = 16393442, rank 2 -> 16129032 (div 62),
    // rank 3 -> 15873015 (div 63)
    val lex = leg(10L -> 1, 20L -> 2, 30L -> 3)
    val vec = leg(20L -> 1, 30L -> 2, 40L -> 3)
    val r = Retrieval.rrfFuse(Seq("lex" -> lex, "vec" -> vec),
        "doc_id", "rank", c = 60, k = 10)
      .as[(Int, Long, Long, Option[Long], Option[Long])].collect()
    val byDoc = r.map(t => t._2 -> t).toMap
    // 20 appears rank2+rank1 = 16129032+16393442 = 32522474 — the winner
    assert(byDoc(20L)._3 === 16129032L + 16393442L)
    // 30: rank3+rank2 = 15873015+16129032 = 32002047
    assert(byDoc(30L)._3 === 15873015L + 16129032L)
    // singles: 10 at 16393442, 40 at 15873015
    assert(byDoc(10L)._3 === 16393442L)
    assert(byDoc(40L)._3 === 15873015L)
    assert(r.sortBy(_._1).map(_._2).toSeq === Seq(20L, 30L, 10L, 40L))
    // per-leg ranks survive; a missed leg is NULL
    assert(byDoc(20L)._4 === Some(2L) && byDoc(20L)._5 === Some(1L))
    assert(byDoc(10L)._4 === Some(1L) && byDoc(10L)._5 === None)
    assert(byDoc(40L)._4 === None && byDoc(40L)._5 === Some(3L))
  }

  test("rrfFuse ties break by id and k bounds the output") {
    // symmetric legs -> 10 and 20 tie exactly; lower id must rank first
    val a = leg(10L -> 1, 20L -> 2)
    val b = leg(20L -> 1, 10L -> 2)
    val r = Retrieval.rrfFuse(Seq("a" -> a, "b" -> b), "doc_id", "rank",
        k = 1)
      .as[(Int, Long, Long, Option[Long], Option[Long])].collect()
    assert(r.length === 1 && r.head._2 === 10L)
  }

  test("rrfFuse rejects duplicate leg names and empty legs") {
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq.empty, "doc_id", "rank")
    }
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("x" -> leg(1L -> 1), "x" -> leg(2L -> 1)),
        "doc_id", "rank")
    }
  }
}

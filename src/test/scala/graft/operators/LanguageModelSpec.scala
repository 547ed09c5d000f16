package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class LanguageModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand-computable corpus:
  //   bigrams: doc1 (a,b)(b,a)(a,b); doc2 (a,b); doc3 (c,c)
  //   c12: (a,b)=3 (b,a)=1 (c,c)=1 ; c1: a=3 b=1 c=1 ; V=3
  //   p(a,b)=(3+1)/(3+3)=2/3  p(b,a)=p(c,c)=(1+1)/(1+3)=1/2
  private def docs = Seq(
    (1L, "a b a b"),
    (2L, "a b"),
    (3L, "c c"),
    (4L, "solo") // < 2 tokens: no bigrams, dropped
  ).toDF("doc_id", "text")

  private def run(df: org.apache.spark.sql.DataFrame) =
    LanguageModel.bigramNll(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("bigram NLL matches hand computation with add-one smoothing") {
    val r = run(docs)
    // ln(2/3) -> floor(-405465.1) = -405466 micro-nats; ln(1/2) -> -693148
    // doc1: -(2*(-405466) + (-693148))/1e6/3 = 0.501360 -> 0.501
    assert(r(1L) === ((3L, 0.501)))
    assert(r(2L) === ((1L, 0.405)))
    assert(r(3L) === ((1L, 0.693)))
    assert(!r.contains(4L))
  }

  test("NLL is partitioning-independent (integer micro-nat summation)") {
    assert(run(docs.repartition(5)) === run(docs.repartition(1)))
  }

  private def runKn(df: org.apache.spark.sql.DataFrame) =
    LanguageModel.knBigramNll(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("Kneser-Ney NLL matches hand computation (D = 3/4 exact ratios)") {
    // same corpus: c12 (a,b)=3 (b,a)=1 (c,c)=1; c1/n1l a=3/1 b=1/1 c=1/1;
    // n1r a=1 b=1 c=1; B=3 distinct bigrams.
    //   p(b|a) = (max(12-3,0)*3 + 3*1*1) / (4*3*3) = 30/36
    //   p(a|b) = p(c|c) = (max(4-3,0)*3 + 3*1*1) / (4*1*3) = 6/12
    // ln(30/36) -> floor(-182321.6) = -182322; ln(1/2) -> -693148
    // doc1: -(2*(-182322) - 693148)/1e6/3 = 0.352597 -> 0.352
    val r = runKn(docs)
    assert(r(1L) === ((3L, 0.352)))
    assert(r(2L) === ((1L, 0.182)))
    assert(r(3L) === ((1L, 0.693)))
    assert(!r.contains(4L))
    // KN trusts the high-count bigram more than add-one does (5/6 > 2/3):
    // doc2's single (a,b) bigram scores cheaper than under bigramNll
    assert(r(2L)._2 < run(docs)(2L)._2)
  }

  test("Kneser-Ney NLL is partitioning-independent") {
    assert(runKn(docs.repartition(5)) === runKn(docs.repartition(1)))
  }

  test("repetitive text scores lower NLL than novel combinations") {
    val corpus = (1L to 20L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
      .unionByName(Seq((99L, "mat the on sat cat the")).toDF("doc_id", "text"))
    val r = run(corpus)
    // the 20 identical docs share high-count bigrams; the scrambled doc
    // pays unseen-bigram smoothing penalties
    assert(r(1L)._2 < r(99L)._2)
  }

  test("perplexity buckets: head <= middle <= tail by nll, every scored " +
      "doc bucketed, cutoffs at the cume-dist tercile boundaries") {
    // 90 docs with varied texts (plus a <2-token doc that drops)
    val corpus = ((1L to 90L).map(i =>
        (i, s"w${i % 7} w${i % 11} w${i % 5} w${i % 3} end")) :+
        (999L, "solo")).toDF("doc_id", "text")
    val r = LanguageModel.perplexityBuckets(corpus, "doc_id", "text")
      .as[(Long, Double, String)].collect()
    assert(r.length === 90) // the 1-token doc has no bigrams to score
    val byBucket = r.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // cume-dist semantics: head holds at least a third (ties included),
    // head+middle at least two thirds
    assert(byBucket("head").size * 3 >= 90)
    assert((byBucket("head").size + byBucket("middle").size) * 3 >= 180)
    // ties share a bucket: no nll value may appear in two buckets
    val perValue = r.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    assert(perValue.values.forall(_.size == 1))
  }

  // PMI fixture:
  //   doc1 "new york is big"  -> (new,york)(york,is)(is,big)
  //   doc2 "new york city"    -> (new,york)(york,city)
  //   doc3 "the city is new"  -> (the,city)(city,is)(is,new)
  //   N=8; c12(new,york)=2; margins: c1(new)=2, c2(york)=2
  //   PMI(new,york) = log2(2*8 / (2*2)) = 2 -> 2000 milli-bits
  private def pmiDocs = Seq(
    (1L, "new york is big"),
    (2L, "new york city"),
    (3L, "the city is new")).toDF("doc_id", "text")

  test("pmiCollocations: hand-computed PMI, minCount filter") {
    val strong = LanguageModel.pmiCollocations(pmiDocs, "doc_id", "text",
        minCount = 2)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(strong === Seq(("new", "york", 2L, 2000L)))
    val all = LanguageModel.pmiCollocations(pmiDocs, "doc_id", "text",
        minCount = 1)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // every distinct bigram in this corpus is positively associated
    assert(all.size === 7)
    // (the,city): 1*8/(1*2) = 4 -> 2000; (york,is): 8/(2*2) = 2 -> 1000
    assert(all(("the", "city")) === (1L, 2000L))
    assert(all(("york", "is")) === (1L, 1000L))
    assert(all.values.forall(_._2 > 0L))
  }

  test("pmiCollocations: partition-invariant") {
    val a = LanguageModel.pmiCollocations(pmiDocs, "doc_id", "text", 1)
      .orderBy("w1", "w2").as[(String, String, Long, Long)].collect().toSeq
    val b = LanguageModel.pmiCollocations(pmiDocs.repartition(5), "doc_id",
        "text", 1)
      .orderBy("w1", "w2").as[(String, String, Long, Long)].collect().toSeq
    assert(a === b)
  }
}

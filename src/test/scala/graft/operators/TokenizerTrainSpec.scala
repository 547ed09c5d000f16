package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class TokenizerTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the Sennrich et al. 2016 worked example: low x5, lower x2,
  // newest x6, widest x3
  private def corpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)
  ).toDF("doc_id", "text")

  test("bpe trainer reproduces the classic merge sequence with " +
      "deterministic tie-breaks") {
    val r = TokenizerTrain.bpeTrain(corpus, "text", nMerges = 3)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // hand-computed: e-s and s-t both count 9 (newest 6 + widest 3);
    // 'e s' < 's t' breaks the tie. After the (e,s) merge, 'es t' (9)
    // beats 'w es' (9) on string order. Then l-o and o-w tie at 7
    // (low 5 + lower 2); 'l o' wins.
    assert(r === Seq((1L, "e s", 9L), (2L, "es t", 9L), (3L, "l o", 7L)))
  }

  test("merge application is left-to-right non-overlapping: " +
      "a a a a merges to aa aa, never aa a a") {
    val d = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val r = TokenizerTrain.bpeTrain(d, "text", nMerges = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    // word 'aaaa' freq 2: round 1 pair 'a a' has 3 adjacencies x 2 = 6;
    // after merging, each word is [aa, aa] -> round 2 pair 'aa aa' cnt 2.
    // An overlapping merge would leave [aa, a, a] and report 'aa a'.
    assert(r === Seq((1L, "a a", 6L), (2L, "aa aa", 2L)))
  }

  test("result is partitioning-invariant") {
    val base = TokenizerTrain.bpeTrain(corpus, "text", 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    val repart = TokenizerTrain.bpeTrain(corpus.repartition(7), "text", 3)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(base === repart)
  }

  test("vocabulary with no adjacent pairs yields an empty merge table") {
    val d = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(TokenizerTrain.bpeTrain(d, "text", 2).count() === 0)
  }

  // Sennrich corpus with per-doc sources; training is corpus-GLOBAL,
  // encoding aggregates per source.
  private def sourced = Seq(
    (1L, ("low " * 5).trim, "a"),
    (2L, ("lower " * 2).trim, "a"),
    (3L, ("newest " * 6).trim, "b"),
    (4L, ("widest " * 3).trim, "b")
  ).toDF("doc_id", "text", "source")

  test("bpe encode reports hand-computed per-source token compression " +
      "under the corpus-global merge table") {
    // merges after 3 rounds: (e,s), (es,t), (l,o). Encoded token counts:
    // low -> [lo, w] = 2; lower -> [lo, w, e, r] = 4;
    // newest -> [n, e, w, est] = 4; widest -> [w, i, d, est] = 4.
    val r = TokenizerTrain
      .bpeEncodeReport(sourced, "text", "source", nMerges = 3)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(r === Seq(
      // a: words 7, chars 5*3+2*5=25, tokens 5*2+2*4=18, 18000 div 25
      ("a", 7L, 25L, 18L, 720L),
      // b: words 9, chars 6*6+3*6=54, tokens 6*4+3*4=36, 36000 div 54
      ("b", 9L, 54L, 36L, 666L)))
  }

  test("bpe encode is partitioning-invariant") {
    val base = TokenizerTrain
      .bpeEncodeReport(sourced, "text", "source", 3)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val repart = TokenizerTrain
      .bpeEncodeReport(sourced.repartition(5), "text", "source", 3)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base === repart)
  }

  test("zero merges applied leaves every word at its character count") {
    // vocabulary exhausts after 1 merge ('a a'); unmatched words encode
    // to their full symbol length under the partial table
    val d = Seq((1L, "aa bc", "s")).toDF("doc_id", "text", "source")
    val r = TokenizerTrain.bpeEncodeReport(d, "text", "source", 1)
      .as[(String, Long, Long, Long, Long)].collect()
    // aa -> [aa] = 1 token; bc -> [b, c] = 2 tokens; chars 4, words 2
    assert(r === Array(("s", 2L, 4L, 3L, 750L)))
  }
}

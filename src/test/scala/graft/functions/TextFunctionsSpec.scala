package graft.functions

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens lowercase, strip punctuation, split on whitespace runs") {
    val t = one("Hello,  WORLD! it's 42")
      .select(TextFunctions.tokens($"text")).as[Seq[String]].head()
    assert(t === Seq("hello", "world", "it", "s", "42"))
  }

  test("shingles of short docs are empty, not inverted sequences") {
    val sh = one("only two")
      .select(TextFunctions.shingles($"text", 3)).as[Seq[String]].head()
    assert(sh === Seq.empty)
    val ok = one("one two three four")
      .select(TextFunctions.shingles($"text", 3)).as[Seq[String]].head()
    assert(ok === Seq("one two three", "two three four"))
  }

  test("stopword ratio and quality bounds") {
    val r = one("the a of and the")
      .select(TextFunctions.stopwordRatio($"text")).as[Double].head()
    assert(r === 1.0)
    val q = graft.Tables.load(spark, TestSpark.sf0001, "documents")
      .select(TextFunctions.qualityScore($"text").as("q"))
      .agg(min("q"), max("q")).as[(Double, Double)].head()
    assert(q._1 >= 0.0 && q._2 <= 1.0)
  }

  test("langId votes on marker words with precedence, und fallback") {
    assert(one("the cat sat of a mat")
      .select(TextFunctions.langId($"text")).as[String].head() === "en")
    assert(one("le chat et la table")
      .select(TextFunctions.langId($"text")).as[String].head() === "fr")
    assert(one("xyz qqq zzz")
      .select(TextFunctions.langId($"text")).as[String].head() === "und")
    // tie between en ('the') and fr ('le') -> declaration precedence: en
    assert(one("the le")
      .select(TextFunctions.langId($"text")).as[String].head() === "en")
  }

  test("non-ascii input degrades cleanly (stripped, never crashes)") {
    val t = one("Héllo wörld 北京 test123 ")
      .select(TextFunctions.tokens($"text")).as[Seq[String]].head()
    // non-[a-z0-9] codepoints are treated as separators by design
    assert(t === Seq("h", "llo", "w", "rld", "test123"))
    val fp = one("北京 only unicode £€¥")
      .select(TextFunctions.fingerprint($"text")).as[String].head()
    assert(fp.nonEmpty)
    val rfp = one("北京").select(
      TextFunctions.rollingFingerprint($"text", 8)).as[Long].head()
    assert(rfp >= 0)
  }

  test("PII redaction replaces urls, emails, and long digit runs, in that order") {
    val r = one("mail me at bob.smith+x@example.co.uk or call 5551234567, " +
        "docs at https://example.com/a?id=1234567 ok")
      .select(TextFunctions.redactPii($"text")).as[String].head()
    assert(r === "mail me at <EMAIL> or call <NUM>, docs at <URL> ok")
    // short numbers and bare words survive
    assert(one("room 404 code 42").select(TextFunctions.redactPii($"text"))
      .as[String].head() === "room 404 code 42")
  }

  test("gopher rules reject short, symbol-heavy, and stopword-free docs") {
    val good = ("the quick brown fox and the lazy dog walk to town in peace " * 6)
    assert(one(good).select(TextFunctions.gopherRules($"text")).as[Boolean].head())
    // too short
    assert(!one("the cat sat on a mat")
      .select(TextFunctions.gopherRules($"text")).as[Boolean].head())
    // no stopwords (threshold: fewer than two)
    val noStops = "alpha beta gamma delta epsilon zeta eta theta " * 10
    assert(!one(noStops).select(TextFunctions.gopherRules($"text")).as[Boolean].head())
    // symbol-heavy
    val symbols = (good.take(200) + "!@#$%^&*()" * 20)
    assert(!one(symbols).select(TextFunctions.gopherRules($"text")).as[Boolean].head())
  }

  test("non-distinct shingles preserve the repetition multiset") {
    val t = one("a b a b a b")
      .select(TextFunctions.shinglesOfTokens(
        TextFunctions.tokens($"text"), 2, distinct = false))
      .as[Seq[String]].head()
    assert(t === Seq("a b", "b a", "a b", "b a", "a b"))
    val d = one("a b a b a b")
      .select(TextFunctions.shinglesOfTokens(TextFunctions.tokens($"text"), 2))
      .as[Seq[String]].head()
    assert(d === Seq("a b", "b a"))
  }

  test("fingerprint is stable and insensitive to punctuation noise") {
    val a = one("the quick brown fox jumps over the lazy dog")
      .select(TextFunctions.fingerprint($"text")).as[String].head()
    val b = one("The quick brown fox... jumps over the lazy dog")
      .select(TextFunctions.fingerprint($"text")).as[String].head()
    assert(a.nonEmpty)
    // same min-shingle survives the punctuation edit in this sample
    assert(a === b)
  }

  test("single-pass langId is bit-identical to the composed spec on the corpus") {
    // the LangIdVote expression replaced the 35-evaluations-per-row
    // composed form on hot paths; this gate keeps them in lockstep
    val docs = graft.Tables.load(spark, TestSpark.sf0001, "documents")
    val mismatches = docs.select(
        TextFunctions.langId($"text").as("fast"),
        TextFunctions.langIdComposed($"text").as("spec"))
      .filter($"fast" =!= $"spec").count()
    assert(mismatches === 0)
    // edge cases: empty, whitespace-only, null, multi-lang ties
    val edge = Seq("", "   ", null, "the le", "le la et der die und",
      "de de shi le le", "el que los la").toDF("text")
    val bad = edge.select(
        TextFunctions.langId($"text").as("fast"),
        TextFunctions.langIdComposed($"text").as("spec"))
      .filter(!($"fast" <=> $"spec")).count()
    assert(bad === 0)
  }

  test("normalizeText: NFC-collides combining accents, lowers, collapses whitespace") {
    def norm(s: String): String =
      one(s).select(TextFunctions.normalizeText($"text")).as[String].head()
    // U+00E9 (precomposed) vs e + U+0301 (combining) — the silent
    // near-dup miss NFC exists to close
    assert(norm("café") === norm("café"))
    assert(norm("  Hello\t\n WORLD  ") === "hello world")
    assert(norm("ÉTAT") === "état")
    assert(norm("") === "")
    assert(norm(" \t ") === "")
    // null flows through (UnaryExpression null semantics)
    val n = Seq[Option[String]](None).toDF("text")
      .select(TextFunctions.normalizeText($"text")).as[Option[String]].head()
    assert(n.isEmpty)
    // astral plane survives the codepoint walk
    assert(norm("a 😀 b") === "a 😀 b")
  }
}

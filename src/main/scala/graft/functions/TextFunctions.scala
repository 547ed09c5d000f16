package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface.
  *
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * no UDFs, fully pushdown/prune-friendly. Each has an exact ANSI-SQL
  * equivalent so the DuckDB oracle can verify it (FIXTURES.md oracle
  * protocol). Hashing primitives use md5 because it is bit-identical across
  * engines — that makes MinHash/SimHash/fingerprints oracle-checkable while
  * staying deterministic at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization after lowercasing + punctuation strip.
    * (The fixtures are clean space-separated word bags; the regexp keeps the
    * same function correct on dirty text.) */
  def tokens(text: Column): Column =
    split(trim(regexp_replace(lower(text), "[^a-z0-9 ]+", " ")), " +")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish pre-tokenization pattern (GPT-2 style): contraction pieces,
    * space-prefixed letter/digit runs, punctuation runs. Shared verbatim
    * with the oracle's RE2 — only constructs valid in both dialects. */
  val bpePattern: String =
    "'[a-z]+|[a-z]+|[0-9]+|[^a-z0-9\\s']+"

  /** Count of BPE-ish pre-tokens — a cheap proxy for LLM token counts
    * (letter runs, digit runs, punctuation runs, contraction suffixes). */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0)))

  /** n-token shingles as space-joined strings; empty array when the doc has
    * fewer than n tokens. */
  /** n-token shingles from an ALREADY-MATERIALIZED token array column.
    *
    * Callers must project `tokens(text)` into its own column first: lambda
    * bodies re-evaluate captured expressions per element, so shingling
    * directly over `tokens(text)` would re-run the regexp tokenizer once
    * per shingle (measured 20× slowdown at 5k docs).
    */
  def shinglesOfTokens(t: Column, n: Int, distinct: Boolean = true): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.WordShingles(
      GraftColumnBridge.expression(t), n, distinct))
  }

  /** Convenience form over raw text — only for one-shot/small inputs; hot
    * paths should project tokens first and use [[shinglesOfTokens]]. */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(lower(text), "[^a-z0-9 ]", "")))
      .cast("double") / greatest(length(text), lit(1))

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Fraction of tokens that are stopwords — a standard quality signal. */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    size(filter(t, w => w.isInCollection(stopwords))).cast("double") /
      greatest(size(t), lit(1))
  }

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(size(t), lit(1))
  }

  /** Composite quality score in [0,1]: long-enough docs with low punctuation
    * and a sane stopword rate score high. Deterministic arithmetic only. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(100.0), lit(1.0))
    val punctPenalty = punctRatio(text)
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    least(greatest(
      lenScore * lit(0.5) + stopScore * lit(0.3) + (lit(1.0) - punctPenalty) * lit(0.2),
      lit(0.0)), lit(1.0))
  }

  /** Language-ID via marker-token voting (n-gram heuristic): count
    * language-specific function words, pick the argmax with a fixed
    * precedence order, `und` when no marker hits. */
  val langMarkers: Seq[(String, Seq[String])] =
    graft.functions.expressions.LangIdVote.markers

  def langScores(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    langMarkers.map { case (lang, markers) =>
      lang -> size(filter(t, w => w.isInCollection(markers)))
    }
  }

  /** Composed (reference-semantics) form: kept as the executable spec the
    * single-pass expression below is tested against. Do NOT use on hot
    * paths — `filter` is CodegenFallback and every score re-embeds the
    * tokenizer, ~35 evaluations per row.
    */
  def langIdComposed(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    // precedence = declaration order on ties
    scores.reverse.foldLeft(lit("und")) { case (acc, (lang, s)) =>
      when(s > lit(0) && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Single-pass marker vote over a token array column (the hot-path
    * form) — one scan per row, codegen'd, bit-identical to
    * [[langIdComposed]]. */
  def langIdOfTokens(t: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.LangIdVote(
      GraftColumnBridge.expression(t)))
  }

  def langId(text: Column): Column =
    // null text: tokens() is null, the expression null-propagates, and
    // coalesce restores the composed form's `und` answer
    coalesce(langIdOfTokens(tokens(text)), lit("und"))

  // PII / boilerplate patterns — RE2-safe (no backrefs/lookaround) so the
  // DuckDB oracle runs the identical expressions
  val urlPattern = "https?://[^\\s]+"
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val longNumberPattern = "[0-9]{7,}"

  /** PII scrubbing for training corpora: URLs, emails, then long digit
    * runs (phone numbers, account ids) are replaced with typed placeholder
    * tokens. Order matters — URLs are replaced first so their embedded
    * digits/at-signs don't half-match the later patterns. Pure
    * regexp_replace chain: codegen'd, engine-portable. */
  def redactPii(text: Column): Column = {
    val noUrl = regexp_replace(text, urlPattern, "<URL>")
    val noEmail = regexp_replace(noUrl, emailPattern, "<EMAIL>")
    regexp_replace(noEmail, longNumberPattern, "<NUM>")
  }

  /** Gopher-style document filter rules (Rae et al. 2021, table A1 subset):
    * token count in [minTokens, maxTokens], mean token length in [3, 10],
    * at least two stopwords, symbol ratio below 10%. Each rule is a cheap
    * column predicate; the conjunction is the keep/drop gate a pretraining
    * pipeline applies before dedup. */
  def gopherRules(
      text: Column, minTokens: Int = 50, maxTokens: Int = 100000): Column = {
    val t = tokens(text)
    val n = size(t)
    val mtl = aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(n, lit(1))
    val stops = size(filter(t, w => w.isInCollection(stopwords)))
    n.geq(minTokens) && n.leq(maxTokens) &&
      mtl.geq(3.0) && mtl.leq(10.0) &&
      stops.geq(2) && punctRatio(text) < 0.1
  }

  /** Sentence count via terminal-punctuation runs, clamped to >= 1 (a
    * fragment with no terminal punctuation is one sentence). */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))), lit(1))

  /** Syllable proxy: vowel-group runs (the standard cheap approximation —
    * exact syllabification needs a dictionary). */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /** Flesch reading-ease score: 206.835 − 1.015·(words/sentences)
    * − 84.6·(syllables/words). Higher = simpler text; a standard
    * readability feature for corpus quality filtering. Pure column
    * arithmetic over the regex counts — engine-portable. */
  def fleschScore(text: Column): Column = {
    val w = greatest(tokenCount(text), lit(1)).cast("double")
    val s = sentenceCount(text).cast("double")
    val sy = syllableCount(text).cast("double")
    lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (sy / w)
  }

  /** Jaro-Winkler similarity in [0,1] (native codegen'd expression) —
    * transposition-tolerant fuzzy matching for entity-resolution dedup;
    * DuckDB/RapidFuzz-compatible semantics (see
    * [[expressions.JaroWinkler]]). Generate candidate pairs with a
    * blocking equi-join first; this is the verify step, not the pair
    * generator. */
  def jaroWinkler(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.JaroWinkler(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Canonical normalization (native codegen'd expression): Unicode NFC +
    * ROOT-locale lower + whitespace-run collapse — the dedup-key
    * normalizer (see [[expressions.NormalizeText]]). */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.expressions.NormalizeText(
      GraftColumnBridge.expression(text)))
  }

  /** Karp-Rabin rolling fingerprint (native codegen'd expression): min
    * base-31 polynomial hash over 8-byte windows of the normalized text.
    * The scale path — O(n) per doc, zero allocation per window. */
  def rollingFingerprint(text: Column, width: Int = 8): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val norm = regexp_replace(lower(text), "[^a-z0-9]+", " ")
    GraftColumnBridge.column(graft.functions.expressions.RollingMinHash(
      GraftColumnBridge.expression(norm), width))
  }

  /** Document fingerprint: minimum md5 over character 8-gram shingles of the
    * normalized text — a winnowing-style content fingerprint that is stable
    * under token reordering-free edits and identical across engines.
    *
    * The normalized text is bound ONCE per row as a lambda variable (the
    * single-element-array `transform` below) before the per-window
    * transform runs. Referencing the `regexp_replace` expression directly
    * inside the window lambda would splice the whole normalization tree
    * into the lambda body, and higher-order lambdas re-evaluate their
    * body per element — an O(n) regex pass per window, O(n^2) per doc
    * (measured 20 s for the sf0.1 corpus vs 0.7 s bound; invisible under
    * count()-based timing, which pruned the column — the round-10 dd22
    * class). PlanSpec gates the shape: no RegExpReplace may appear under
    * a per-window LambdaFunction. */
  def fingerprint(text: Column): Column = {
    // native one-pass expression (r12): the declarative HOF form — even
    // with the normalization correctly bound once per row — still
    // allocated a start array, a substring, a digest and a hex string
    // PER WINDOW (~n windows/doc). Md5MinShingle computes the identical
    // min-md5-hex with a per-thread MessageDigest and two 16-byte
    // buffers; the normalization stays a codegen'd Catalyst projection.
    import org.apache.spark.sql.GraftColumnBridge
    val norm = regexp_replace(lower(text), "[^a-z0-9]+", " ")
    GraftColumnBridge.column(graft.functions.expressions.Md5MinShingle(
      GraftColumnBridge.expression(norm), 8))
  }
}

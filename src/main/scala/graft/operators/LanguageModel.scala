package graft.operators

import graft.functions.TextFunctions.tokens

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the CCNet/KenLM-style
  * "perplexity filter" of an LLM data pipeline, reduced to its distributed
  * essentials: train a word-bigram model on the corpus itself (one
  * aggregation), then score every document by its mean negative
  * log-likelihood under that model. High-NLL documents are the gibberish /
  * boilerplate / wrong-language tail a pretraining pipeline drops.
  *
  * Scale shape: bigram extraction is one narrow pass (slice + zip, no
  * self-join); the model is two aggregations over the bigram stream
  * (map-side combined); scoring is an equi-join of the bigram stream
  * against the (much smaller) model table — each row matches exactly one
  * model row, so the join cannot blow up. No driver-side state: the vocab
  * size joins in as a broadcast scalar.
  *
  * Determinism across engines and partitionings: per-bigram log-probs are
  * truncated to integer micro-nats (floor(lp * 1e6) as BIGINT) BEFORE the
  * per-document aggregation, so the sum is exact integer arithmetic —
  * immune to floating-point addition order, which a plain avg() over
  * doubles is not.
  */
object LanguageModel {

  /** Add-one-smoothed word-bigram NLL per document.
    *
    * p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + V), V = corpus vocabulary size.
    * Output: (doc_id, n_bigrams, nll) — nll in nats, truncated to 3
    * decimals; documents with fewer than 2 tokens are dropped (no bigrams
    * to score).
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // one cheap shuffle on the id spreads few-large-file corpora across the
    // cluster before the expensive tokenize/explode stages (see shingleSet)
    val toks = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    // the bigram stream feeds three consumers (c12, vocab, scoring);
    // PlanPersist so all three read one materialization (owned lifetime)
    val bigr = PlanPersist("lm.bigramNll.bigr", toks
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val c12 = bigr.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // c(w1,·) folds from the bigram counts — no second pass over the corpus
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val vocab = bigr.select(col("w1").as("w"))
      .unionAll(bigr.select(col("w2").as("w")))
      .agg(countDistinct(col("w")).as("v"))
    val scored = bigr
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      // integer micro-nats: exact, order-independent summation
      .withColumn("lp_u",
        floor(log((col("c12") + lit(1)).cast("double") /
          (col("c1") + col("v")).cast("double")) * lit(1e6)).cast("long"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_u")).as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.functions.NumericFunctions.fround(
          -(col("lp_sum").cast("double") / lit(1e6)) /
            col("n_bigrams").cast("double"), 3).as("nll"))
  }

  /** Interpolated Kneser-Ney bigram NLL per document (Kneser & Ney 1995;
    * the interpolated form of Chen & Goodman 1999), absolute discount
    * D = 3/4:
    *
    *   p(w2|w1) = max(c(w1,w2) - D, 0) / c(w1,·)
    *            + D · N1+(w1,·)/c(w1,·) · N1+(·,w2)/N1+(·,·)
    *
    * The add-one model ([[bigramNll]]) over-smooths — it hands unseen
    * mass to every vocabulary word equally. KN's continuation
    * probability asks "after how many DISTINCT contexts does w2 appear"
    * (the classic fix: "Francisco" is frequent but follows only "San",
    * so it deserves almost no unseen-context mass). This is the model
    * quality filters actually want.
    *
    * Exactness: every KN quantity is an integer count, and D = 3/4
    * keeps the probability one exact BIGINT ratio:
    *
    *   p = (max(4·c12 − 3, 0)·B + 3·N1l·N1r) / (4·c1·B),  B = N1+(·,·)
    *
    * so the single ln call sees the identical double quotient on every
    * engine and partitioning; per-bigram log-probs floor to micro-nats
    * BEFORE the per-document sum (the house integer-sum discipline).
    * Seen bigrams always score: c12 >= 1 makes the numerator >= B + 3.
    * Long headroom: numerator <= 4·c12·B; fine while (corpus bigrams) ×
    * (distinct bigrams) < ~2.3e18 — shard the model beyond that.
    *
    * Scale shape identical to [[bigramNll]]: one bigram pass, model =
    * two aggregations of the c12 table (distinct-successor /
    * distinct-predecessor counts fold from c12, no extra corpus pass),
    * scoring joins each bigram to exactly one model row; the 1-row
    * distinct-bigram total broadcasts. Output: (doc_id, n_bigrams, nll).
    */
  def knBigramNll(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bigr = PlanPersist("lm.kn.bigr", toks
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    // the bigram-type table feeds four consumers; owned plan-keyed persist
    val c12 = PlanPersist("lm.kn.c12",
      bigr.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val left = c12.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1l"))
    val right = c12.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val totalTypes = c12.agg(count(lit(1)).as("nbg"))
    val scored = bigr
      .join(c12, Seq("w1", "w2"))
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(totalTypes))
      .withColumn("lp_u", floor(log(
        (greatest(col("c12") * 4 - 3, lit(0L)) * col("nbg")
          + lit(3L) * col("n1l") * col("n1r")).cast("double") /
        (col("c1") * 4 * col("nbg")).cast("double")) * lit(1e6))
        .cast("long"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_u")).as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.functions.NumericFunctions.fround(
          -(col("lp_sum").cast("double") / lit(1e6)) /
            col("n_bigrams").cast("double"), 3).as("nll"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * split the corpus into head / middle / tail terciles by LM score —
    * head (lowest perplexity) trains as-is, tail is usually dropped.
    *
    * Scale shape: a naive ntile(3) is a GLOBAL row sort — one reducer
    * owns the whole corpus. Instead the cutoffs come from the VALUE
    * domain: nll is already floored to 3 decimals, so group by nll (a
    * small discrete domain), cumulate counts over ordered values (a
    * window over thousands of rows, not billions), pick the smallest
    * value where 3*cum >= k*N, and broadcast the two cutoffs back over
    * the corpus. Ties share a value and therefore a bucket —
    * cume_dist-style semantics that both engines state identically in
    * integer arithmetic.
    *
    * Output: (doc_id, nll, ppl_bucket in {head, middle, tail}). */
  def perplexityBuckets(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val scored = PlanPersist("lm.ppl.scored",
      bigramNll(docs, idCol, textCol))
    val byVal = scored.groupBy("nll").agg(count(lit(1)).as("c"))
    val cum = byVal.withColumn("cum",
      sum(col("c")).over(org.apache.spark.sql.expressions.Window
        .orderBy("nll")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    val tot = byVal.agg(sum(col("c")).as("n"))
    val cuts = cum.crossJoin(broadcast(tot))
      .agg(min(when(col("cum") * 3 >= col("n"), col("nll"))).as("c1"),
        min(when(col("cum") * 3 >= col("n") * 2, col("nll"))).as("c2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("nll"),
        when(col("nll") <= col("c1"), "head")
          .when(col("nll") <= col("c2"), "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Pointwise-mutual-information collocation mining (Church & Hanks
    * 1990): bigrams whose joint frequency beats the independence
    * expectation — the phrase/multi-word-expression detector that seeds
    * tokenizer merge candidates (compare tx35's frequency-greedy BPE)
    * and phrase-aware dedup shingles.
    *
    * PMI = log2( p(w1,w2) / (p(w1,·) p(·,w2)) ) with all probabilities
    * estimated from the bigram stream: p(w1,w2) = c12/N, p(w1,·) =
    * c1/N, p(·,w2) = c2/N, N = total bigram count. Emitted as
    * floor(1000 * ln(ratio)/ln(2)) — the house ln-ratio form (an
    * engine's std::log2 can differ from ln/ln2 in the last ulp exactly
    * where the floor flips). The ratio is computed as a quotient of
    * DOUBLE products of BIGINTs in one fixed association — both engines
    * evaluate the identical expression tree.
    *
    * `minCount` guards the classic PMI pathology (hapax pairs score
    * highest); only positive-PMI collocations survive.
    *
    * Scale shape: one narrow bigram pass, one (w1,w2) aggregation, two
    * vocabulary-sized margin folds OF THAT aggregate (no second corpus
    * pass), margin joins keyed on w1/w2, and a 1-row total broadcast.
    * Output: (w1, w2, c12, pmi_milli), collocations only.
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1L)
    val toks = docs.repartition(col(idCol))
      .select(tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 2)
    val bigr = toks
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // feeds both margins, the total and the output — one materialization
    val c12 = PlanPersist("lm.pmi.c12",
      bigr.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val c1 = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val c2 = c12.groupBy("w2").agg(sum(col("c12")).as("c2"))
    val n = c12.agg(sum(col("c12")).as("n"))
    c12.filter(col("c12") >= minCount)
      .join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(n))
      .withColumn("pmi_milli",
        floor(log((col("c12").cast("double") * col("n").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))) /
          log(lit(2.0)) * 1000).cast("long"))
      .filter(col("pmi_milli") > 0L)
      .select("w1", "w2", "c12", "pmi_milli")
  }
}

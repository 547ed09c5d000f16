package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface.
  *
  * Scale design notes (the point of each algorithm at 100 TB):
  *  - exact: one hash-shuffle on a 128-bit content hash — never on the raw
  *    text (shuffle bytes ∝ hash, not document size).
  *  - MinHash/LSH: signatures are computed in a narrow pass; candidate
  *    generation is an equi-join on (band, signature) — the only shuffle
  *    keys are tiny fixed-width strings. No all-pairs comparison ever runs.
  *  - SimHash: one narrow pass to a 64-bit-ish signature; near-dup lookup is
  *    an equi-join on the signature (or banded substrings for hamming>0).
  *  - n-gram Jaccard: explode-join on shingle equality; the join key is a
  *    shingle hash, and pairs are verified with exact set math afterwards.
  *  - embedding cosine: either LSH-bucketed (srpBucket) or blocked
  *    brute-force; thresholded pairs only.
  *
  * Hash primitive is md5 throughout: engine-portable (the DuckDB oracle
  * reproduces every signature bit-for-bit) and deterministic across
  * executors with zero broadcast state.
  */
object Dedup {

  /** Exact dedup groups: content fingerprint -> surviving doc (min id) +
    * duplicate count. Deterministic representative selection (min id), not
    * dropDuplicates' arbitrary first-seen. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** (doc_id, shingle) pairs, distinct — shared by Jaccard and MinHash.
    *
    * The input is repartitioned on the id first: document corpora often
    * arrive as few large files, and without the spread the whole
    * tokenize/shingle/hash pipeline runs in as many tasks as there are
    * input splits. One cheap shuffle of the raw docs unlocks full-cluster
    * parallelism for the expensive narrow stages. */
  /** Distinct (doc_id, shingle) rows. PRECONDITION: `idCol` is unique in
    * `docs` (a table key) — every caller passes a corpus keyed by id.
    * Distinctness then comes entirely from WordShingles' per-row
    * LinkedHashSet (distinct = true), so NO row-level `.distinct()` is
    * needed: the old trailing distinct re-shuffled every exploded
    * shingle row to dedupe pairs that were already unique (r11: one full
    * exchange removed from every shingle-family consumer; the output
    * keeps the doc_id hash partitioning, which downstream per-doc
    * aggregations reuse). */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.repartition(col(idCol))
      // tokenize in its own projection so the regexp tokenizer runs once
      // per doc, not once per shingle (see shinglesOfTokens scaladoc)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("toks"), n)).as("sh"))

  /** Sub-document exact dedup (the "paragraph-level" pass of an LLM data
    * pipeline, à la deduplicating-training-data): each document is chopped
    * into consecutive `chunkWords`-word chunks, every chunk that already
    * appeared earlier in the corpus (first occurrence = lowest
    * (doc_id, chunk_idx)) is dropped, and the survivors are reassembled
    * in order. Catches boilerplate shared across otherwise-distinct
    * documents that whole-document dedup (dd1) cannot see.
    *
    * Scale shape: one shuffle keyed on the 128-bit chunk hash decides
    * survivorship; one shuffle on doc_id reassembles. No joins between
    * documents, no all-pairs anything; chunk text rides the shuffle here
    * for reassembly — a footprint-sensitive deployment would dedup on
    * hashes alone and re-slice surviving chunks from the source.
    *
    * Output: (doc_id, n_chunks, n_kept, dedup_text).
    */
  /** (doc_id, chunk_idx, chunk): consecutive `chunkWords`-word chunks —
    * ONE definition shared by the in-corpus and incremental forms so
    * chunk boundaries can never drift between them (their oracles mirror
    * this expression exactly). */
  private def chunkRows(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), posexplode(transform(
          // (n-1) div chunkWords, clamped at 0: Column./ is double division,
          // so truncate back to int (exact: token counts << 2^31)
          sequence(lit(0),
            greatest(((size(col("toks")) - 1) / lit(chunkWords)).cast("int"),
              lit(0))),
          i => array_join(
            slice(col("toks"), i * chunkWords + 1, lit(chunkWords)), " ")))
        .as(Seq("chunk_idx", "chunk")))
      .filter(length(col("chunk")) > 0)

  def chunkDedup(
      docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int): DataFrame = {
    require(chunkWords >= 1, "chunkWords >= 1")
    val chunks = PlanPersist("dedup.chunkDedup.chunks",
      chunkRows(docs.repartition(col(idCol)), idCol, textCol, chunkWords))
    val w = Window.partitionBy(md5(col("chunk")))
      .orderBy(col("doc_id"), col("chunk_idx"))
    val kept = chunks.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val base = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
        s => s.getField("chunk")), " ").as("dedup_text"))
    base.join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /** n-gram Jaccard near-dup pairs with similarity >= threshold.
    * Exact set semantics: |A∩B| via the shingle equi-join, |A∪B| via
    * per-doc sizes. Join key is the shingle string (hash-partitioned);
    * doc_a < doc_b canonicalizes pairs. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double, maxShingleDf: Long = Long.MaxValue): DataFrame = {
    // The shingle set feeds three plan branches (both join sides + sizes).
    // PlanPersist (owned, bounded, releasable — deliberately not
    // localCheckpoint): entries are keyed by the semantic plan, so (a)
    // repeated calls with the same inputs reuse one entry (no per-call
    // growth — only distinct configurations add entries), and (b)
    // sibling operators over the same shingle set (LSH, cluster
    // resolution) hit the same entry across queries.
    val shAll = shingleSet(docs, idCol, textCol, n)
    // Scale configuration: cap the document frequency of join-key shingles.
    // A single stop-shingle shared by k documents contributes k^2/2 join
    // rows — at corpus scale one hot shingle is a quadratic blowup and a
    // one-partition straggler. Dropping shingles with df > maxShingleDf
    // bounds every join key's output at maxShingleDf^2/2 and, because such
    // shingles carry ~zero discriminative signal, leaves the Jaccard
    // estimate over the remaining (informative) shingle space. Exact mode
    // (the oracle baseline) is maxShingleDf = Long.MaxValue.
    // Tag note (r11): every raw-shingleSet persist in this file uses the
    // SAME "dedup.shingleSet" tag on purpose — the cache key includes the
    // plan's semantic hash, so operators shingling the same corpus at the
    // same n (dd2/dd19/dd30 at n = 3) share ONE cached frame instead of
    // materializing three identical ones; different (corpus, n) or a
    // df-capped variant hashes differently and never collides.
    val sh = PlanPersist("dedup.shingleSet",
      if (maxShingleDf == Long.MaxValue) shAll
      else {
        val rare = shAll.groupBy("sh")
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf)
          .select("sh")
        shAll.join(rare, "sh").select("doc_id", "sh")
      })
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    // Persist the thresholded pairs too (same plan-keyed discipline as the
    // shingle set above): the self-join is the expensive stage, its output
    // is tiny (near-dup pairs only), and the downstream cluster operators
    // (connected components, survivor selection, soft weighting) all start
    // from this exact plan — one materialization serves them all.
    PlanPersist("dedup.ngram.pairs", scoreJaccard(inter, sizes, threshold))
  }

  /** AllPairs/PPJoin-style prefix-filtered EXACT Jaccard join — the scale
    * path that keeps exact results (unlike MinHash-LSH, which trades
    * recall for pruning). Every doc's shingles are ordered rarest-first
    * by global document frequency (ties on the shingle string — one
    * deterministic total order); for threshold t only the first
    * `sz - ceil(t*sz) + 1` shingles (the PREFIX) join. The prefix-filter
    * principle (Bayardo et al. 2007 "Scaling Up All Pairs"; Xiao et al.
    * 2008 PPJoin): two sets with Jaccard >= t share at least
    * ceil(t*max(|A|,|B|)) elements, so if their prefixes were disjoint
    * the intersection would have to fit inside both (t-scaled) suffixes —
    * too small. Joining prefixes is therefore LOSSLESS: the output is
    * bit-identical to [[ngramJaccardPairs]] at the same threshold, which
    * is exactly what the oracle checks.
    *
    * Scale shape vs the plain self-join: join keys are only prefix
    * tokens — the rarest ~(1-t) fraction of each doc — and hot
    * stop-shingles sit at the END of the df order, so they fall OUT of
    * prefixes instead of fanning out k² candidate rows; a length filter
    * (t*|a| <= |b| <= |a|/t) prunes cross-size pairs inside the join. The
    * verify stage re-joins full shingle sets restricted to candidates
    * (cost proportional to candidates, not corpus²).
    *
    * PPJoin POSITIONAL filter (Xiao et al. 2008 §3.2), applied during
    * candidate dedup: a shingle matching at (1-based, df-ordered)
    * positions (pa, pb) caps the achievable overlap at
    * `1 + min(|A|-pa, |B|-pb)` — everything before the match in either
    * prefix is provably outside the intersection *via this alignment*.
    * A pair survives only if SOME match allows
    * overlap >= ceil(t/(1+t)·(|A|+|B|)) (the Jaccard-equivalent overlap
    * bound), i.e. max over matches of the cap clears it — a per-pair
    * aggregate on the join output, no extra shuffle (it rides the same
    * groupBy that deduped candidates anyway), and still lossless: only
    * pairs whose TRUE overlap cannot reach t are cut before verify.
    */
  def prefixFilterJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0, 1]")
    val sh = PlanPersist("dedup.shingleSet",
      shingleSet(docs, idCol, textCol, n))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val dfs = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val prefix = sh.join(dfs, "sh")
      .withColumn("pos", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
      .join(sizes, "doc_id")
      .filter(col("pos") <=
        col("sz") - ceil(col("sz") * lit(threshold)) + 1)
      .select(col("doc_id"), col("sh"), col("sz"), col("pos"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * lit(threshold) <= col("b.sz") &&
          col("b.sz") * lit(threshold) <= col("a.sz"))
      // one groupBy both dedups candidates AND evaluates the positional
      // filter: ubound = best achievable overlap over all prefix matches
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(
        max(lit(1) + least(col("a.sz") - col("a.pos"),
          col("b.sz") - col("b.pos"))).as("ubound"),
        first(col("a.sz")).as("sz_a"), first(col("b.sz")).as("sz_b"))
      .filter(col("ubound") >=
        ceil((col("sz_a") + col("sz_b")) * lit(threshold / (1.0 + threshold))))
      .select("doc_a", "doc_b")
    // verify WITHOUT re-exploding to shingle rows: the two joins below
    // are doc-keyed over candidate PAIRS (rows ∝ candidates), each pair
    // intersecting two document-bounded arrays in place —
    // size(array_intersect) over distinct shingle sets equals the exact
    // |A∩B| the former shingle-level join+groupBy counted, but the heavy
    // exchange drops from |cand| x doc-size exploded rows hashed on
    // (doc, shingle) to |cand| pair rows (bench A/B at sf0.1: 3.5-3.8 s
    // -> 2.9-3.0 s for dd30, the round-6 watch item). At 100 TB the
    // arrays stay document-bounded; candidates stay ∝ true duplication
    val docSh = sh.groupBy("doc_id").agg(collect_list(col("sh")).as("shs"))
    val inter = cand
      .join(docSh.select(col("doc_id").as("doc_a"), col("shs").as("sha")),
        "doc_a")
      .join(docSh.select(col("doc_id").as("doc_b"), col("shs").as("shb")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long")
          .as("inter"))
    scoreJaccard(inter, sizes, threshold)
  }

  /** Shared exact-Jaccard scoring tail: |A∩B| / (|A| + |B| - |A∩B|) from
    * pair intersection counts + per-doc shingle-set sizes, truncated to 4
    * decimals (engine-portable fround), thresholded. One definition so the
    * exact self-join form and the LSH-gated form can't drift apart. */
  private def scoreJaccard(
      inter: DataFrame, sizes: DataFrame, threshold: Double): DataFrame =
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        graft.functions.NumericFunctions.fround(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** MinHash signatures as one wide row per doc: mh_j = min over shingles of
    * md5(j + ":" + shingle). Computed as `numHashes` partial-aggregated mins
    * in a single groupBy — no row explosion, one shuffle of the shingle set
    * (vs. numHashes× the rows with an explode-based layout). */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    // evaluate the md5s in a Project (whole-stage codegen) — string-buffer
    // aggregates fall back to SortAggregate, which would evaluate the
    // hashes interpreted if they lived inside the agg expressions
    val hashed = sh.select(col("doc_id") +: (0 until numHashes).map { j =>
      md5(concat(lit(s"$j:"), col("sh"))).as(s"h$j")
    }: _*)
    val mins = (0 until numHashes).map(j => min(col(s"h$j")).as(s"mh$j"))
    // persist the PRE-banding signatures (via PlanPersist: owned,
    // bounded, releasable lifetime): the plan is independent of the band
    // layout, so every consumer re-banding the same (shingles,
    // numHashes) pass — dd20's r=2/4/8 sweep, dd3/dd9/dd17's candidate
    // joins — shares one cache entry instead of recomputing the corpus
    // hash pass per configuration
    PlanPersist("dedup.minhashSignatures",
      hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*))
  }

  /** (doc_id, band, sig) rows from a shingle set: `numHashes` minhashes
    * folded into numHashes/rowsPerBand band signatures (j-ordered concat).
    * The LSH candidate key — shared by the self-join (near-dup pairs) and
    * the batch-vs-corpus (incremental dedup) forms. */
  private[operators] def bandSignatures(
      sh: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    val numBands = numHashes / rowsPerBand
    val sigs = minhashSignatures(sh, numHashes)
    val bandCols = (0 until numBands).map { b =>
      concat((b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j")): _*)
        .as(s"band$b")
    }
    sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), expr(
        s"stack($numBands, " +
          (0 until numBands).map(b => s"$b, band$b").mkString(", ") +
          ") as (band, sig)"))
  }

  /** MinHash-LSH candidate pairs: docs sharing at least one band signature
    * (bands of `rowsPerBand` hashes, signature = j-ordered concat of the
    * band's minhashes). Output distinct (doc_a, doc_b). The only shuffles
    * are the signature groupBy and the equi-join on (band, sig) — tiny
    * fixed-width keys, the LSH scale path. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    // both self-join sides read this subtree; PlanPersist so the
    // signature computation runs once, with an owned releasable lifetime
    val stacked = PlanPersist("dedup.minhashLsh.stacked", bandSignatures(
      shingleSet(docs, idCol, textCol, shingleN), numHashes, rowsPerBand))
    val a = stacked.as("a"); val b = stacked.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** The production two-stage near-dup pipeline: MinHash-LSH candidate
    * generation followed by EXACT n-gram Jaccard verification restricted to
    * the candidates. This is the 100 TB shape end-to-end — the exact
    * shingle self-join (quadratic on hot shingles) never runs; the shingle
    * join is gated by the candidate pair list, so its cost is
    * O(|candidates| · shingles-per-doc) instead of O(corpus²). Recall is
    * the LSH band recall; precision is exact (every emitted pair's Jaccard
    * is the true value, not an estimate).
    */
  def lshVerifiedJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val cand = minhashLshPairs(docs, idCol, textCol, n, numHashes, rowsPerBand)
    val sh = PlanPersist("dedup.shingleSet",
      shingleSet(docs, idCol, textCol, n))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = cand.join(a, "doc_a").join(b, Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    scoreJaccard(inter, sizes, threshold)
  }

  /** IDF-weighted Jaccard over LSH candidates: rare shingles count more
    * than boilerplate ones, so two docs sharing a distinctive passage
    * score high even when one also carries lots of template filler that
    * plain Jaccard would dilute (and conversely, docs agreeing only on
    * ubiquitous boilerplate stop qualifying). w(s) = ln(N/df_s) truncated
    * to integer micro-nats BEFORE any aggregation, so the intersection /
    * union weight sums are exact integer arithmetic (the tx14/BM25
    * discipline) and the score is engine- and partitioning-identical.
    *
    * Candidates ride the banded MinHash join (never all-pairs); weights
    * need one df aggregation the plain-Jaccard path computes anyway.
    * Output: (doc_a, doc_b, wjaccard >= threshold). */
  def weightedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val cand = minhashLshPairs(docs, idCol, textCol, n, numHashes,
      rowsPerBand)
    val sh = PlanPersist("dedup.shingleSet",
      shingleSet(docs, idCol, textCol, n))
    val nDocs = sh.agg(countDistinct(col("doc_id")).as("n_docs"))
    val wts = sh.groupBy("sh").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .withColumn("w_u", floor(
        log(col("n_docs").cast("double") / col("df")) * 1e6).cast("long"))
      .select("sh", "w_u")
    val shw = sh.join(wts, "sh")
    val tw = shw.groupBy("doc_id").agg(sum(col("w_u")).as("tw"))
    val iw = cand
      .join(shw.select(col("doc_id").as("doc_a"), col("sh"),
        col("w_u")), "doc_a")
      .join(shw.select(col("doc_id").as("doc_b"), col("sh")),
        Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b").agg(sum(col("w_u")).as("iw"))
    iw
      .join(tw.select(col("doc_id").as("doc_a"), col("tw").as("tw_a")),
        "doc_a")
      .join(tw.select(col("doc_id").as("doc_b"), col("tw").as("tw_b")),
        "doc_b")
      // degenerate pair guard: when EVERY shingle of both docs is
      // corpus-ubiquitous (w_u = 0 throughout), the union weight is 0 and
      // the score would be 0/0 = NaN — which Spark's NaN ordering ranks
      // ABOVE the threshold while SQL engines rank it false. Zero shared
      // signal is not a match: drop the pair before dividing.
      .filter(col("tw_a") + col("tw_b") - col("iw") > 0)
      .withColumn("wjaccard", graft.functions.NumericFunctions.fround(
        col("iw").cast("double") /
          (col("tw_a") + col("tw_b") - col("iw")), 4))
      .filter(col("wjaccard") >= threshold)
      .select("doc_a", "doc_b", "wjaccard")
  }

  /** Exact-substring duplication spans (the ExactSubstr recipe of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): find every maximal verbatim token span of at least
    * `minTokens` tokens shared between two documents, with its position
    * in BOTH — the duplication family doc-level (dd1) and chunk-level
    * (dd11) dedup cannot see, and the one production pre-training
    * corpora actually cut on (shared >=50-token spans get one copy).
    *
    * The reference recipe builds a corpus suffix array; the Spark-first
    * equivalent keeps the same O(total tokens) working set as three
    * declarative stages:
    *  1. position-indexed k-gram fingerprints: one row per (doc, pos)
    *     with md5 of the k tokens starting there (narrow, codegen'd);
    *  2. candidate position pairs: an EQUI-join on the fingerprint
    *     (doc_a < doc_b) — any shared span of length L >= k contributes
    *     exactly L-k+1 aligned gram matches, so candidates are
    *     proportional to ACTUAL duplication, not to the corpus square;
    *  3. span assembly: matches of one shared span all lie on one
    *     diagonal (pa - pb constant), at consecutive pa — the standard
    *     islands trick (pa - row_number per (pair, diagonal) ordered by
    *     pa) groups each maximal run; span length = max(pa)-min(pa)+k.
    *
    * `maxGramDf` caps the document frequency of join-key grams exactly
    * like [[ngramJaccardPairs]]'s maxShingleDf: a corpus-ubiquitous
    * k-gram (licence boilerplate) would contribute df^2 position pairs;
    * dropping grams with more than maxGramDf occurrences bounds every
    * join key's fan-out. The cap can split a span that contains a hot
    * gram into two reported spans — the deterministic, documented
    * trade; the oracle applies the identical cap so results stay
    * bit-equal.
    *
    * Shuffles: gram fingerprint (join + df cap) and (doc_a, doc_b,
    * diagonal) — the islands window and the span aggregation share the
    * second exchange. Output: (doc_a, doc_b, a_start, b_start, len),
    * token-indexed, 0-based. */
  /** Position-indexed k-gram fingerprints: one row (doc_id, pos, g) per
    * token position, g = md5 of the k tokens starting there. Shared by
    * the in-corpus and incremental exact-substring forms so gram
    * boundaries can never drift between them. */
  private def posGrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), size(col("t")) - k),
          i => md5(array_join(slice(col("t"), i + 1, lit(k)), " ")))))
      .select(col("doc_id"), col("pos"), col("col").as("g"))

  def exactSubstrSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minTokens: Int, maxGramDf: Long): DataFrame = {
    require(k >= 2, "gram width k >= 2")
    require(minTokens >= k, "minTokens >= k (spans are assembled from k-grams)")
    require(maxGramDf >= 2, "maxGramDf >= 2 (df-1 grams never pair)")
    // Feeds the df cap AND both join sides: one materialization. Cache
    // lifetime is OWNED by the bounded plan-keyed [[PlanPersist]] store
    // (no caller-cleanup contract): it is corpus-token-sized (one md5
    // per token position) and MEMORY_AND_DISK so it spills rather than
    // evicts hot executor memory; LRU overflow releases it, and a
    // holder of an evicted frame recomputes (lineage intact).
    val grams = PlanPersist("dedup.exactSubstr.grams",
      posGrams(docs, idCol, textCol, k))
    val rare = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxGramDf).select("g")
    val gg = grams.join(rare, "g")
    val m = gg.as("a").join(gg.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), (col("a.pos") - col("b.pos")).as("diag"))
    // the assembled spans are ALSO PlanPersist-shared (r11): the cut
    // (dd39), apply (dd42) and overlap (dd41) operators each re-derive
    // their intervals from this exact frame, so without the memo every
    // family member re-paid the gram self-join + islands window the
    // spans already cost (the er-family scoredDistinct precedent: one
    // shared pass, duplication-bounded rows, house LRU lifetime).
    PlanPersist("dedup.exactSubstr.spans", assembleSpans(m, k, minTokens))
  }

  /** Diagonal-islands span assembly shared by the in-corpus and
    * incremental forms: matches of one shared span lie on one diagonal at
    * consecutive pa; islands (pa - row_number) group each maximal run.
    * Input m: (doc_a, doc_b, pa, diag); one shuffle on (doc_a, doc_b,
    * diag) serves both the window and the aggregation. */
  private def assembleSpans(m: DataFrame, k: Int, minTokens: Int): DataFrame = {
    val wI = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    m.withColumn("isl", col("pa") - row_number().over(wI))
      .groupBy("doc_a", "doc_b", "diag", "isl")
      .agg(min(col("pa")).as("a_start"),
        (max(col("pa")) - min(col("pa")) + k).as("len"))
      .filter(col("len") >= minTokens)
      .select(col("doc_a"), col("doc_b"), col("a_start"),
        (col("a_start") - col("diag")).as("b_start"), col("len"))
  }

  /** Incremental ExactSubstr — the continuous-ingest form (the dd15/dd28/
    * er5 discipline applied to span dedup): a NEW batch's shared spans
    * against the EXISTING corpus, without ever re-joining the corpus with
    * itself. The gram fingerprints, df cap and islands assembly are the
    * in-corpus dd38 machinery verbatim ([[posGrams]] /
    * [[assembleSpans]]); only the candidate join changes — corpus grams
    * x batch grams, so candidate volume is proportional to the BATCH's
    * duplication against the corpus, the incremental cost a daily ingest
    * actually pays.
    *
    * The df cap is computed over the UNION of corpus and batch grams —
    * exactly the population dd38 would see on the merged corpus — so
    * (for disjoint id spaces) this returns precisely dd38-on-the-union
    * restricted to (corpus, batch) pairs: the equivalence DedupSpec
    * gates. Output: (corpus_id, batch_id, corpus_start, batch_start,
    * len), token-indexed, 0-based. */
  def exactSubstrSpansIncremental(corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, k: Int, minTokens: Int,
      maxGramDf: Long): DataFrame = {
    require(k >= 2, "gram width k >= 2")
    require(minTokens >= k, "minTokens >= k (spans are assembled from k-grams)")
    require(maxGramDf >= 2, "maxGramDf >= 2 (df-1 grams never pair)")
    // one materialization feeds the df cap and both join sides (cache
    // lifetime: same PlanPersist discipline as dd38's grams, documented
    // there)
    val grams = PlanPersist("dedup.exactSubstrInc.grams",
      posGrams(corpus, idCol, textCol, k)
        .withColumn("is_batch", lit(false))
        .unionAll(posGrams(batch, idCol, textCol, k)
          .withColumn("is_batch", lit(true))))
    val rare = grams.groupBy("g").agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxGramDf).select("g")
    val gg = grams.join(rare, "g")
    val m = gg.filter(!col("is_batch")).as("a")
      .join(gg.filter(col("is_batch")).as("b"), col("a.g") === col("b.g"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), (col("a.pos") - col("b.pos")).as("diag"))
    assembleSpans(m, k, minTokens)
      .select(col("doc_a").as("corpus_id"), col("doc_b").as("batch_id"),
        col("a_start").as("corpus_start"), col("b_start").as("batch_start"),
        col("len"))
  }

  /** Apply [[exactSubstrSpans]] as a dedup decision — the second half of
    * the Lee et al. 2022 recipe: of every shared span, the occurrence in
    * the LOWEST doc id survives and every other occurrence is cut, so a
    * document's cut set is the union of the b-side intervals of its spans
    * (doc_a < doc_b means doc_b holds the later copy). Overlapping spans
    * (the same region shared with several earlier docs) must not
    * double-count, so per doc the intervals are merged first — the
    * classic sweep: order by start, a new island opens where start
    * exceeds the running max end (one window over the per-doc interval
    * list, which is span-count-bounded, never corpus-bounded).
    *
    * Output per affected document: (doc_id, n_tokens, n_cut, n_kept) —
    * the audit row a curation pipeline reports before re-slicing
    * surviving text. Shuffles: dd38's two plus one window on doc_id. */
  /** Merged-interval coverage per key group — the classic sweep (order by
    * start, a new island opens where start exceeds the running max end)
    * shared by the per-doc cut (dd39) and the per-pair overlap (dd41):
    * input (partCols..., lo, hi) distinct intervals, output (partCols...,
    * covered) with covered = total length of the union of intervals. */
  /** The merged (maximal, disjoint) intervals themselves — one row per
    * island: (partCols..., lo, hi). Callers either sum coverage
    * ([[mergedCoverage]]) or apply the intervals to data (dd42). */
  private def mergedIntervals(iv: DataFrame, partCols: Seq[String]): DataFrame = {
    val pc = partCols.map(col)
    val wPrev = Window.partitionBy(pc: _*).orderBy(col("lo"), col("hi"))
      .rowsBetween(Window.unboundedPreceding, -1L)
    val wIsl = Window.partitionBy(pc: _*).orderBy(col("lo"), col("hi"))
    iv.withColumn("prev_max_hi", max(col("hi")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max_hi").isNull ||
          col("lo") > col("prev_max_hi"), 1).otherwise(0))
      .withColumn("isl", sum(col("new_island")).over(
        wIsl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(pc :+ col("isl"): _*)
      .agg(min(col("lo")).as("lo"), max(col("hi")).as("hi"))
  }

  private def mergedCoverage(iv: DataFrame, partCols: Seq[String]): DataFrame =
    mergedIntervals(iv, partCols)
      .groupBy(partCols.map(col): _*)
      .agg(sum(col("hi") - col("lo")).as("covered"))

  def exactSubstrCut(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minTokens: Int, maxGramDf: Long): DataFrame = {
    val spans = exactSubstrSpans(docs, idCol, textCol, k, minTokens,
        maxGramDf)
      .select(col("doc_b").as("doc_id"), col("b_start").as("lo"),
        (col("b_start") + col("len")).as("hi"))
      .distinct()
    val merged = mergedCoverage(spans, Seq("doc_id"))
      .withColumnRenamed("covered", "n_cut")
    docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(merged, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_cut"),
        (col("n_tokens") - col("n_cut")).as("n_kept"))
  }

  /** Apply the cut decision to the TEXT — the final step of the Lee et
    * al. 2022 recipe that [[exactSubstrCut]] only audits: re-emit every
    * document with its cut spans removed (tokens at positions inside any
    * merged b-side interval dropped, survivors re-joined in order). The
    * earliest copy of every span survives verbatim; later copies lose
    * exactly the shared region, not the whole document — the property
    * that makes span-level dedup safer than document-level dropping.
    *
    * Scale shape: dd38's span machinery, the per-doc interval merge, then
    * ONE ordered higher-order-function pass over each document's token
    * array (filter-with-index against the doc's own merged cut list — a
    * per-row codegen'd loop over tokens x its few merged intervals; no
    * explode, no token-level shuffle). Uncut documents pass through on
    * the left join with their text intact.
    *
    * Output, one row per INPUT document: (doc_id, n_tokens, n_kept,
    * text_dedup). n_tokens - n_kept equals exactSubstrCut's n_cut for
    * affected docs (spec-gated). */
  def exactSubstrApply(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minTokens: Int, maxGramDf: Long): DataFrame = {
    val iv = exactSubstrSpans(docs, idCol, textCol, k, minTokens,
        maxGramDf)
      .select(col("doc_b").as("doc_id"), col("b_start").as("lo"),
        (col("b_start") + col("len")).as("hi"))
      .distinct()
    val cuts = mergedIntervals(iv, Seq("doc_id"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("lo"), col("hi"))))
        .as("cuts"))
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .join(cuts, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        when(col("cuts").isNull, col("t")).otherwise(
          filter(col("t"), (_, i) =>
            !exists(col("cuts"), c => i.cast("long") >= c.getField("lo")
              && i.cast("long") < c.getField("hi")))).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), " ").as("text_dedup"))
  }

  /** Pair-level verbatim overlap ratio — the ExactSubstr analogue of a
    * similarity score: per candidate pair, the fraction of the LATER
    * document covered by the union of its shared spans with the earlier
    * one (merged per pair so overlapping spans never double-count). The
    * signal that separates "quotes a paragraph" from "is a shingled
    * near-copy" — position-aware where Jaccard (dd2) is bag-level.
    * Integer ppm; pairs only exist where dd38 found spans, so output
    * volume is proportional to actual duplication. */
  def exactSubstrOverlap(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minTokens: Int, maxGramDf: Long): DataFrame = {
    val iv = exactSubstrSpans(docs, idCol, textCol, k, minTokens, maxGramDf)
      .select(col("doc_a"), col("doc_b"), col("b_start").as("lo"),
        (col("b_start") + col("len")).as("hi"))
      .distinct()
    val cov = mergedCoverage(iv, Seq("doc_a", "doc_b"))
      .withColumnRenamed("covered", "n_shared_tokens")
    docs.select(col(idCol).as("doc_b"), tokens(col(textCol)).as("t"))
      .select(col("doc_b"), size(col("t")).cast("long").as("n_tokens_b"))
      .join(cov, "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared_tokens"),
        col("n_tokens_b"),
        expr("n_shared_tokens * 1000000 div greatest(n_tokens_b, 1)")
          .as("overlap_ppm"))
  }

  /** Leakage-free held-out splitting: the md5 hash split (dd8) composed
    * with LSH-verified near-dup detection, so no train/val document that
    * is a near-duplicate of a TEST document survives — the cross-split
    * contamination that silently inflates eval scores (the self-corpus
    * analogue of benchmark decontamination, dc1). Test membership never
    * changes (the held-out set stays exactly the hash split); leaky
    * train/val members are relabeled `dropped_leak` so the caller can
    * count the cost of cleanliness.
    *
    * Scale shape: the split is a pure projection; leakage detection rides
    * the banded-LSH candidate join (never all-pairs) plus one broadcast
    * of the leaky-id set. Output: (doc_id, split in
    * train/val/test/dropped_leak). */
  def leakFreeSplit(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int,
      threshold: Double): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      when(substring(md5(col(idCol).cast("string")), 1, 2) < "cc", "train")
        .when(substring(md5(col(idCol).cast("string")), 1, 2) < "e6", "val")
        .otherwise("test").as("split0"))
    val pairs = lshVerifiedJaccardPairs(docs, idCol, textCol, n,
        numHashes, rowsPerBand, threshold)
      .select("doc_a", "doc_b")
    val withSplits = pairs
      .join(base.select(col("doc_id").as("doc_a"), col("split0").as("sa")),
        "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("split0").as("sb")),
        "doc_b")
      .filter((col("sa") === "test") =!= (col("sb") === "test"))
    val leaky = withSplits
      .select(when(col("sb") === "test", col("doc_a"))
        .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
      .withColumn("leak", lit(true))
    base.join(leaky, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(coalesce(col("leak"), lit(false)) && col("split0") =!= "test",
          "dropped_leak").otherwise(col("split0")).as("split"))
  }

  /** Incremental dedup: classify each NEW batch document against an
    * already-ingested corpus — the continuous-ingest shape, where the
    * corpus×corpus comparison never runs (it was paid when those documents
    * were ingested) and each increment costs only batch-side work plus
    * batch↔corpus equi-joins.
    *
    *   - 'exact': content hash matches a corpus doc (cheap pass, first);
    *   - 'near':  best LSH-candidate corpus doc with verified exact
    *              Jaccard >= threshold (ties: lowest corpus id), computed
    *              only for batch docs with no exact match;
    *   - 'novel': everything else.
    *
    * One row per batch document: (doc_id, match_id, kind, jaccard) —
    * match_id/jaccard are null for 'novel', jaccard is 1.0 for 'exact'.
    * Shuffle keys are hashes and fixed-width band signatures throughout;
    * at 100 TB the corpus-side shingle/signature pass is the incremental
    * cost to amortize by persisting corpus signatures between ingests.
    */
  def incrementalDedupReport(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val b = PlanPersist("dedup.incr.batch",
      batch.select(col(idCol).as("doc_id"), col(textCol).as("text")))
    val c = corpus.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    // exact pass: min corpus id per content hash
    val cHash = c.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("match_id"))
    val exact = PlanPersist("dedup.incr.exact",
      b.select(col("doc_id"), md5(col("text")).as("fp"))
        .join(cHash, "fp")
        .select(col("doc_id"), col("match_id"),
          lit("exact").as("kind"), lit(1.0).as("jaccard")))
    // near pass over the exact-miss remainder only
    val rest = PlanPersist("dedup.incr.rest",
      b.join(exact.select("doc_id"), Seq("doc_id"), "left_anti"))
    val bSh = PlanPersist("dedup.incr.bSh",
      shingleSet(rest, "doc_id", "text", n))
    val cSh = PlanPersist("dedup.incr.cSh",
      shingleSet(c, "doc_id", "text", n))
    val bBands = bandSignatures(bSh, numHashes, rowsPerBand)
    val cBands = bandSignatures(cSh, numHashes, rowsPerBand)
      .withColumnRenamed("doc_id", "match_id")
    val cand = bBands.join(cBands, Seq("band", "sig"))
      .select("doc_id", "match_id").distinct()
    val bSizes = bSh.groupBy("doc_id").agg(count(lit(1)).as("bsz"))
    val cSizes = cSh.groupBy(col("doc_id").as("match_id"))
      .agg(count(lit(1)).as("csz"))
    val inter = cand
      .join(bSh, "doc_id")
      .join(cSh.select(col("doc_id").as("match_id"), col("sh")),
        Seq("match_id", "sh"))
      .groupBy("doc_id", "match_id").agg(count(lit(1)).as("inter"))
    val scored = inter.join(bSizes, "doc_id").join(cSizes, "match_id")
      .withColumn("jaccard",
        graft.functions.NumericFunctions.fround(col("inter").cast("double") /
          (col("bsz") + col("csz") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
    val wBest = Window.partitionBy("doc_id")
      .orderBy(col("jaccard").desc, col("match_id"))
    val near = PlanPersist("dedup.incr.near",
      scored.withColumn("rk", row_number().over(wBest))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("match_id"),
          lit("near").as("kind"), col("jaccard")))
    // null match_id typed as the CALLER's id type (string ids are
    // supported, as in the components API) — a hardcoded bigint would
    // widen or break the union for non-numeric ids
    val idType = corpus.schema(idCol).dataType
    val novel = rest.join(near.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(null).cast(idType).as("match_id"),
        lit("novel").as("kind"), lit(null).cast("double").as("jaccard"))
    exact.unionByName(near).unionByName(novel)
  }

  /** SimHash signature per doc over `bits` bits. Per-token hash
    * h64 = integer value of the FIRST 15 HEX NIBBLES of md5(token)
    * (a 60-bit non-negative long); bit b of the signature is the
    * majority vote of ((h64 >> b) & 1 ? +1 : -1) over the doc's tokens
    * (ties vote 0, i.e. the bit clears). This h64 formulation is the
    * documented recurrence the DuckDB oracle and any third-
    * implementation replica must encode — NOT the retired 32-bit
    * per-nibble derivation. One narrow pass; returns (doc_id, simhash). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    // <= 60: bit 63 would make the signature sum overflow-prone on both
    // engines (1L << 63 is the sign bit); 60 bits = 15 md5 nibbles keeps
    // every partial sum a positive BIGINT and is wide enough for 15-bit
    // pigeonhole bands (see simhashHammingPairs' collision-floor note)
    require(bits % 4 == 0 && bits <= 60, "bits must be a multiple of 4, <= 60")
    // one row per token; the `bits` weight columns are projected (codegen)
    // instead of exploding the token set `bits`-fold — one groupBy with
    // `bits` integer sums, no row blowup, map-side partial aggregation
    val tok = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      // ONE hex parse per token (60 bits = 15 md5 nibbles as a positive
      // long); per-bit weights are then long bitwise ops, not 15 separate
      // string conv/substring evaluations — measured ~2x on the signature
      // stage, which dominates dd22/dd44
      .withColumn("h64",
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long"))
    val weights = (0 until bits).map { b =>
      when(shiftright(col("h64"), b).bitwiseAND(lit(1L)) === 1L, lit(1))
        .otherwise(lit(-1)).as(s"w$b")
    }
    val votes = (0 until bits).map(b => sum(col(s"w$b")).as(s"v$b"))
    tok.select(col("doc_id") +: weights: _*)
      .groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(b =>
          when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Incremental CHUNK-level dedup: the new batch's chunks are probed
    * against the corpus's chunk-fingerprint set. The continuous-ingest
    * form of [[chunkDedup]]: the corpus side contributes only distinct
    * 128-bit hashes (never text, never a self-compare), so at scale it is
    * a maintained append-only fingerprint store, not a corpus rescan, and
    * the probe is one hash equi-join. Output per batch doc:
    * (doc_id, n_chunks, n_dup_vs_corpus, n_novel). */
  def incrementalChunkDedup(
      corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, chunkWords: Int): DataFrame = {
    require(chunkWords >= 1, "chunkWords >= 1")
    def chunkHashes(df: DataFrame) = chunkRows(df, idCol, textCol, chunkWords)
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("ch"))
    val corpusHashes = chunkHashes(corpus).select("ch").distinct()
      .withColumn("dup", lit(1))
    chunkHashes(batch)
      .join(corpusHashes, Seq("ch"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("dup").isNotNull, 1L).otherwise(0L))
          .as("n_dup_vs_corpus"))
      .select(col("doc_id"), col("n_chunks"), col("n_dup_vs_corpus"),
        (col("n_chunks") - col("n_dup_vs_corpus")).as("n_novel"))
  }

  /** SimHash near-dup pairs within `maxHamming` bit flips: banded
    * signature equi-join (pigeonhole: two signatures within d flips share
    * at least one of bands > d bands), candidates verified with an exact
    * popcount on the XOR. Completes the SimHash path beyond [[simhash]]'s
    * exact-signature grouping — same tiny-fixed-width-key equi-join scale
    * shape as MinHash-LSH, no pairwise text comparison anywhere. */
  def simhashHammingPairs(
      docs: DataFrame, idCol: String, textCol: String,
      bits: Int, bands: Int, maxHamming: Int): DataFrame =
    bandedHammingPairs(simhash(docs, idCol, textCol, bits), "doc_id",
      "simhash", bits, bands, maxHamming)

  /** Generic pigeonhole banded-Hamming pair join over ANY precomputed
    * fixed-width bit signature column (SimHash, perceptual hash, ...):
    * a pair within `maxHamming` of `bits` differs in at most `maxHamming`
    * bands, so with `maxHamming < bands` it agrees EXACTLY on at least
    * one band — candidate generation is a band-value equi-join (lossless
    * vs the exhaustive ≤-maxHamming join), verification an exact popcount
    * on the XOR. Output: (doc_a, doc_b, hamming), doc_a < doc_b. */
  def bandedHammingPairs(
      sigs: DataFrame, idCol: String, sigCol: String,
      bits: Int, bands: Int, maxHamming: Int): DataFrame = {
    require(bands > 0 && bits % bands == 0, "bits must divide into bands")
    require(maxHamming < bands,
      "pigeonhole needs maxHamming < bands for full recall")
    val w = bits / bands
    val sig = sigs.select(col(idCol).as("doc_id"), col(sigCol).as("sig"))
    val bandArr = array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * w)
          .bitwiseAND(lit(if (w == 64) -1L else (1L << w) - 1)).as("bsig"))
    }: _*)
    // both self-join sides read this subtree; PlanPersist (the
    // minhashLshPairs discipline) so the signature computation — the
    // expensive upstream for SimHash inputs: tokenize, hash, and a
    // bit-width-wide vote aggregation — runs once, not once per side
    // (measured 6.5 -> ~2 s on dd22 at sf0.1), with an owned, bounded,
    // releasable lifetime
    val banded = PlanPersist("dedup.bandedHamming.banded", sig
      .select(col("doc_id"), col("sig"), explode(bandArr).as("bs"))
      .select(col("doc_id"), col("sig"),
        col("bs.band").as("band"), col("bs.bsig").as("bsig")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
          .as("hamming"))
      // verify BEFORE the dedup shuffle: candidates failing the popcount
      // are discarded map-side instead of riding the distinct() exchange
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over near-dup candidate pairs: resolves pairwise
    * matches into dedup clusters, labeling every member with the minimum
    * doc id of its component (the canonical survivor).
    *
    * Small pair sets (the common case after LSH/jaccard filtering) resolve
    * in one driver-side union-find pass; larger or non-integral-id inputs
    * take [[distributedComponents]] — alternating large-star/small-star
    * contraction, O(log^2 n) rounds independent of component diameter.
    * Both paths emit identical labels: one row per node appearing in
    * `pairs`, cluster_id = component minimum.
    */
  def connectedComponents(
      pairs: DataFrame, maxIter: Int = 20,
      driverThreshold: Long = 4L * 1000 * 1000): DataFrame = {
    // Candidate pairs after LSH/jaccard filtering are orders of magnitude
    // smaller than the corpus; below the threshold a driver-side union-find
    // resolves them in one pass instead of paying one Spark job per
    // contraction round. Above it — or for non-integral id types — fall
    // through to distributed star contraction (same labels either way:
    // min id per component).
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralIds = pairs.schema.fields.take(2).forall(f =>
      Seq(ByteType, ShortType, IntegerType, LongType).contains(f.dataType))
    val cached = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairCount = cached.count()
    if (integralIds && pairCount <= driverThreshold) {
      val spark = cached.sparkSession
      import spark.implicits._
      val edgeList = cached.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
        .as[(Long, Long)].collect()
      cached.unpersist()
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edgeList.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      return parent.keys.toSeq.sorted.map(id => (id, find(id)))
        .toDF("doc_id", "cluster_id")
    }
    val out = distributedComponents(cached, maxIter)
    // labels were materialized inside distributedComponents; the raw pairs
    // cache is no longer needed
    cached.unpersist()
    out
  }

  /** Distributed connected components via alternating large-star/small-star
    * contractions (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"). Converges in O(log^2 n) rounds regardless of component
    * diameter — min-label propagation needs O(diameter) rounds and silently
    * under-merges deep chains at a fixed iteration budget; star contraction
    * halves path lengths every round, so `maxIter` = 20 covers any
    * realistic graph. Throws if the edge set has not reached its fixpoint
    * within the budget instead of returning wrong labels.
    *
    * Each round is two groupBy-min + join passes over the (shrinking) edge
    * list; ids only need to be orderable (works for string keys too).
    * Output: (doc_id, cluster_id = min id of the component), one row per
    * node appearing in `pairs` — identical labels to a union-find.
    */
  private[operators] def distributedComponents(
      pairs: DataFrame, maxIter: Int): DataFrame = {
    // Iterative rounds MUST truncate lineage: smallStar(largeStar(e))
    // references `e` five times, so without truncation the logical plan
    // grows ~6x per round (exponential — the plan string alone OOMs after
    // a handful of rounds). localCheckpoint materializes each round and
    // cuts the plan back to a leaf; superseded round RDDs are released
    // eagerly via FrameRelease (plain unpersist no-ops on checkpoints),
    // so only the FINAL round's checkpoint — the result's backing — stays.
    // Self-loop pairs (a, a) carry no edge but DO name a node: keep them
    // aside as singleton labels so the output matches the union-find path
    // (one row per node appearing in `pairs`).
    val selfNodes = pairs.filter(col("doc_a") === col("doc_b"))
      .select(col("doc_a").as("doc_id"), col("doc_a").as("cluster_id"))
      .distinct()
    // canonical orientation: u = larger endpoint, v = smaller
    var edges = pairs.select(
        greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)

    // large-star: every neighbor larger than u re-links to the minimum of
    // u's closed neighborhood (operates on the symmetric edge view)
    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = nb.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u").as("mu"), least(col("mn"), col("u")).as("m"))
      nb.filter(col("v") > col("u"))
        .join(m, col("u") === col("mu"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star: u and all its (smaller) neighbors re-link to their min
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min(col("v")).as("m"))
      val relinked = e.join(m, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      relinked.unionByName(m.select(col("u"), col("m").as("v"))).distinct()
    }

    // fixpoint detection: (row count, order-independent hash fold) — one
    // aggregation job per round instead of two except() scans. bit_xor is
    // commutative/associative (partitioning-independent) and cannot
    // overflow under ANSI arithmetic; a collision masking non-convergence
    // needs an xxhash64 xor-collision on equal-cardinality DISTINCT edge
    // sets (astronomically unlikely).
    def checksum(e: DataFrame): (Long, Any) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), r.get(1))
    }

    var cs = checksum(edges)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val ncs = checksum(next)
      // `next` is eagerly materialized: the superseded round's checkpoint
      // blocks release here (plain unpersist is a no-op on checkpoints)
      graft.FrameRelease.release(edges)
      edges = next
      converged = ncs == cs
      cs = ncs
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter large/small-star rounds")
    // at the fixpoint the edge set is a star per component: u -> component
    // min. A self-loop node that also has real edges gets its component
    // label via the min (component min <= own id); a pure singleton keeps
    // itself. The labels are EAGERLY checkpointed (lineage-free LogicalRDD
    // root) BEFORE the final round's checkpoint is released — a persist
    // here would keep the released checkpoint in the labels' recompute
    // lineage, so any lost cached partition would recompute through
    // destroyed checkpoint blocks and throw
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND mid-query. With the lineage cut
    // there is nothing left referencing the round frames; callers release
    // the returned frame with [[graft.FrameRelease]] (the house pattern
    // for every materialized operator result — plain Dataset.unpersist is
    // a no-op on checkpoint-backed frames).
    val labels = edges
      .select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .unionByName(
        edges.select(col("v")).distinct()
          .select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .unionByName(selfNodes)
      .groupBy("doc_id").agg(min(col("cluster_id")).as("cluster_id"))
      .localCheckpoint(true)
    graft.FrameRelease.release(edges)
    labels
  }

  /** Embedding near-dup pairs: cosine >= threshold, canonical (a < b).
    * Brute-force form (the oracle-checkable baseline); the LSH-bucketed
    * scale path reuses [[VectorFunctions.srpBucket]] to restrict the join.
    *
    * Norms are computed once per vector before the pair join (the join
    * evaluates only one native dot per pair, not three interpreted folds) —
    * numerically identical to cosine() since the fold order is unchanged. */
  def embeddingNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
        VectorFunctions.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", VectorFunctions.norm2(col("v")))
    val a = v.as("a"); val b = v.as("b")
    a.join(b, col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.NumericFunctions.fround(
          VectorFunctions.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm")), 3).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The 100 TB embedding near-dup path: SRP-bucketed candidate generation.
    *
    * Every vector gets a `planes`-bit signed-random-projection bucket
    * (deterministic md5 hyperplanes — no random state, engine-reproducible);
    * the left side additionally probes every Hamming-1 bucket variant
    * (multi-probe, recovers pairs whose signatures differ by one plane).
    * Candidates come from an EQUI-JOIN on the bucket id — shuffle keys are
    * 8-byte longs and no all-pairs comparison ever runs, vs. the brute-force
    * form's O(n^2) BroadcastNestedLoopJoin (kept only as the small-n oracle
    * baseline). Each qualifying pair matches exactly one probe (its Hamming
    * distance picks the probe), so no distinct is needed before the
    * threshold filter.
    *
    * Recall is the standard SRP-LSH tradeoff: a pair at cosine >= threshold
    * collides with probability [1 - acos(cos)/pi]^planes, amortized up by
    * the Hamming-1 probes; tune `planes` down / band the signature for
    * higher recall, up for fewer candidates.
    */
  /** SemDeDup-style semantic dedup (Abbas et al. 2023): embeddings are
    * clustered into `nCells` coarse cells, and near-duplicate pairs are
    * searched ONLY within a cell — the clustering bounds candidate
    * generation the way LSH buckets do, but follows the data distribution
    * instead of random hyperplanes (dense regions, where semantic dups
    * live, get their own cells).
    *
    * Cells here come from the same deterministic first-N-by-id centroid
    * stand-in as [[Similarity.ivfTopK]] (swap in [[Similarity.trainKMeans]]
    * output for the production path — the pair-generation shape is
    * identical). Assignment is one broadcast-centroid pass; candidates are
    * an EQUI-JOIN on the cell id (no corpus self-join); only within-cell
    * pairs pay the cosine. Missed pairs are exactly the cross-cell ones —
    * the SemDeDup recall tradeoff.
    *
    * Output: (cell, id_a, id_b, cos) with id_a < id_b, cos >= threshold.
    */
  def semanticNearDupPairs(
      emb: DataFrame, idCol: String, vecCol: String,
      nCells: Int, threshold: Double): DataFrame = {
    Similarity.requireNumericId(emb, idCol)
    val v = emb.select(col(idCol).as("id"),
        VectorFunctions.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", VectorFunctions.norm2(col("v")))
    val cents = v.orderBy("id").limit(nCells)
      .select(col("id").cast("long").as("cent_id"), col("v").as("centv"))
    // assignment is the expensive narrow pass; PlanPersist so both join
    // sides compute it once (owned lifetime, shared across sibling calls)
    val assigned = PlanPersist("dedup.semantic.assigned",
      Similarity.assignCells(v, "v", cents, keep = 1)
        .withColumnRenamed("cent_id", "cell"))
    val a = assigned.as("a"); val b = assigned.as("b")
    a.join(b, col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.cell").as("cell"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.NumericFunctions.fround(
          VectorFunctions.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm")), 3).as("cos"))
      .filter(col("cos") >= threshold)
  }

  def embeddingNearDupPairsBucketed(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      planes: Int = 4): DataFrame = {
    require(planes >= 1 && planes <= 62, "planes in [1,62]")
    // bucket assignment is the expensive narrow pass (one projection fold
    // per plane); PlanPersist so both join sides compute it once
    val v = PlanPersist("dedup.embedLsh.v",
      emb.select(col(idCol).as("id"),
          VectorFunctions.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", VectorFunctions.norm2(col("v")))
        .withColumn("bucket", VectorFunctions.srpBucket(col("v"), planes)))
    val probeBuckets = array(col("bucket") +: (0 until planes).map(p =>
      col("bucket").bitwiseXOR(lit(1L << p))): _*)
    val a = v.withColumn("pb", explode(probeBuckets))
      .select(col("id"), col("v"), col("nrm"), col("pb")).as("a")
    val b = v.as("b")
    a.join(b, col("a.pb") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.NumericFunctions.fround(
          VectorFunctions.dot(col("a.v"), col("b.v")) /
            (col("a.nrm") * col("b.nrm")), 3).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Asymmetric n-gram containment pairs: containment(A in B) =
    * |shingles(A) ∩ shingles(B)| / |shingles(A)| — catches quoting/subset
    * duplication that symmetric Jaccard under-scores (a short document
    * fully embedded in a long one has low Jaccard but containment 1.0).
    * Output is DIRECTED: (doc_a, doc_b, containment) with doc_a the
    * contained side; both directions of a pair can appear.
    *
    * Same postings-equi-join scale shape as [[ngramJaccardPairs]],
    * including the hot-shingle df cap; containment divides exact integer
    * counts, so the score is engine-identical.
    */
  def ngramContainmentPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double,
      maxShingleDf: Long = Long.MaxValue): DataFrame = {
    val shAll = shingleSet(docs, idCol, textCol, n)
    val sh = PlanPersist("dedup.shingleSet",
      if (maxShingleDf == Long.MaxValue) shAll
      else {
        val rare = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("sh")
        shAll.join(rare, "sh").select("doc_id", "sh")
      })
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    // Intersection counts are symmetric: join each unordered pair ONCE
    // (doc_a < doc_b) and mirror after the aggregation — the directed
    // =!= join would push 2x the rows through the pair aggregation and
    // its shuffle for identical counts.
    val interU = sh.as("a").join(sh.as("b"), col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val inter = interU.unionByName(interU.select(
      col("doc_b").as("doc_a"), col("doc_a").as("doc_b"), col("inter")))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        "doc_a")
      .withColumn("c", col("inter").cast("double") / col("sz_a"))
      .filter(col("c") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        graft.functions.NumericFunctions.fround(col("c"), 4).as("containment"))
  }

  /** Sparse TF-IDF cosine similarity between documents via an inverted
    * index — the term-postings join every sparse-vector engine runs:
    * postings are (term, doc, weight) rows, candidate pairs come from an
    * equi-join on the term, and only documents sharing a term are ever
    * compared. Terms are `ngramSize`-token shingles (use > 1 when the
    * unigram vocabulary is too small/dense to discriminate). The
    * FRACTIONAL document-frequency cap (`dfCapShare` of the corpus)
    * drops corpus-wide stop terms BEFORE the join, which is the scale
    * guarantee: a term shared by df documents contributes df^2 join rows,
    * so bounding df at share*N bounds the worst-case candidate blow-up
    * exactly like dd2b's shingle cap, and the cap keeps its meaning as
    * the corpus grows (cosine is then defined over the capped vocabulary
    * — standard stop-term semantics, applied to weights and norms alike).
    *
    * Determinism contract: weights are quantized to integer milli-units
    * after the idf product, so dots and norms are exact BIGINT sums
    * (order-free); the final cosine divides exact integers under IEEE
    * division — bit-identical on both engines.
    */
  def tfidfCosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      dfCapShare: Double, threshold: Double,
      ngramSize: Int = 1): DataFrame = {
    require(dfCapShare > 0.0 && dfCapShare <= 1.0, "dfCapShare in (0, 1]")
    require(ngramSize >= 1, "ngramSize >= 1")
    val toks = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks"))
    val tok =
      if (ngramSize == 1) toks.select(col("doc_id"),
        explode(col("toks")).as("term"))
      else toks.select(col("doc_id"),
        explode(shinglesOfTokens(col("toks"), ngramSize, distinct = false))
          .as("term"))
    val tf = PlanPersist("dedup.tfidf.tf",
      tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count()
    val dfCap = math.max(1L, (dfCapShare * n).toLong)
    val w = PlanPersist("dedup.tfidf.w",
      tf.join(dfr, "term").filter(col("df") <= dfCap)
        .select(col("doc_id"), col("term"),
          floor(col("tf") * log(lit(n.toDouble) / col("df")) * 1000.0)
            .cast("long").as("wm")))
    val norm = w.groupBy("doc_id").agg(sum(col("wm") * col("wm")).as("n2"))
    val dot = w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.wm") * col("b.wm")).as("d"))
    dot
      .join(norm.select(col("doc_id").as("doc_a"), col("n2").as("na")), "doc_a")
      .join(norm.select(col("doc_id").as("doc_b"), col("n2").as("nb")), "doc_b")
      .withColumn("c", col("d").cast("double") /
        sqrt(col("na").cast("double") * col("nb").cast("double")))
      .filter(col("c") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        graft.functions.NumericFunctions.fround(col("c"), 6).as("cosine"))
  }

  /** Inter-group shingle-overlap matrix from MERGEABLE MinHash sketches.
    *
    * A group's signature is the slotwise MIN of its members' document
    * signatures — min is associative and commutative, so the group
    * signature equals the MinHash of the union of the group's shingle
    * sets and the aggregation map-side combines to `numHashes` values
    * per group per partition. The slot-agreement fraction between two
    * group signatures estimates the Jaccard overlap of the groups'
    * shingle sets. At 100 TB this is the inter-source redundancy matrix
    * a curation pass consults before setting mixture weights: one
    * shuffle of fixed-width sketches, never a document-level cross
    * compare. The final pairing is a |groups|² cross over one sketch row
    * per group — bounded and driver-visible, not data-scale.
    */
  def groupMinhashOverlap(
      docs: DataFrame, idCol: String, textCol: String, groupCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val sigs = minhashSignatures(shingleSet(docs, idCol, textCol, n), numHashes)
      .join(docs.select(col(idCol).as("doc_id"), col(groupCol).as("grp")),
        "doc_id")
    val mins = (0 until numHashes).map(j => min(col(s"mh$j")).as(s"mh$j"))
    val g = sigs.groupBy("grp").agg(mins.head, mins.tail: _*)
    val a = g.select(col("grp").as("src_a") +:
      (0 until numHashes).map(j => col(s"mh$j").as(s"a$j")): _*)
    val b = g.select(col("grp").as("src_b") +:
      (0 until numHashes).map(j => col(s"mh$j").as(s"b$j")): _*)
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        graft.functions.NumericFunctions.fround(
          (0 until numHashes).map(j =>
            when(col(s"a$j") === col(s"b$j"), 1).otherwise(0))
            .reduce(_ + _).cast("double") / numHashes.toDouble, 4)
          .as("jaccard_est"))
  }

  /** Bloom-gated incremental exact dedup: classify each NEW batch document
    * as duplicate-of-corpus or unique, with a bloom-filter membership probe
    * pruning the batch BEFORE the exact join.
    *
    * The 100 TB point: in steady-state ingest almost every batch document
    * is novel, so the expensive part of dd15's exact pass — shuffling the
    * batch↔corpus hash join — is wasted on rows that match nothing. A
    * bloom filter over the corpus content hashes (built once per ingest
    * window, ~1.2 MB per million docs at 1% fpp) is probed MAP-SIDE with
    * the codegen'd `BloomFilterMightContain`, so only probable duplicates
    * (true matches + the fp tail) reach the join at all. Blooms have no
    * false negatives and every survivor is re-verified by the exact join,
    * so the output is bit-identical to the unpruned join — the filter
    * only removes shuffle volume.
    *
    * Output: one row per batch doc — (doc_id, match_id, is_dup) with
    * match_id the lowest-id corpus doc of identical content (null when
    * unique).
    */
  def bloomIncrementalDedup(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val cFp = corpus.select(md5(col(textCol)).as("fp"), col(idCol).as("cid"))
    val bloom = BloomPrune.buildBloom(cFp, "fp", expectedItems, fpp)
    val bFp = batch.select(col(idCol).as("doc_id"), md5(col(textCol)).as("fp"))
    val matches =
      if (bloom.isEmpty) bFp.limit(0).select(col("doc_id"), lit(null).cast("long").as("match_id"))
      else bFp.filter(BloomPrune.mightContain(bloom, col("fp")))
        .join(cFp.groupBy("fp").agg(min(col("cid")).as("match_id")), "fp")
        .select("doc_id", "match_id")
    bFp.join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("match_id"),
        col("match_id").isNotNull.as("is_dup"))
  }

  /** Content-defined chunking dedup report (Muthitacharoen et al. 2001,
    * LBFS; the rsync/storage-dedup trick applied to corpus text): chunk
    * boundaries fall where the rolling k-token window's fingerprint
    * satisfies `hash mod divisor == 0`, so boundaries are decided by
    * CONTENT, not offset — prepending one token shifts every fixed-size
    * chunk (dd11 finds nothing) but leaves every content-defined chunk
    * after the first boundary identical. This is the dedup form that
    * catches "same boilerplate, shifted by an edit" without the full
    * ExactSubstr position join.
    *
    * Expected chunk length = divisor tokens (boundary probability
    * 1/divisor per position, read from the last md5 nibble — the same
    * single-hex-digit integerization dd22's oracle uses, so both
    * engines state the identical draw). The whole chunker is ONE
    * projection of nested array functions — boundaries, spans and chunk
    * fingerprints all materialize per row with ZERO shuffle; the only
    * exchanges are the chunk-fingerprint groupBy (md5 keys, never text)
    * and the per-doc verdict aggregation, exactly dd1's shape.
    *
    * First-occurrence discipline (tx40): a chunk instance is a
    * duplicate iff some LOWER-id doc contains the same chunk
    * fingerprint. Output: (doc_id, n_chunks, n_tokens, n_dup_chunks,
    * n_dup_tokens) — n_dup_tokens/n_tokens is the reclaimable share. */
  def cdcChunkDedup(docs: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Int): DataFrame = {
    require(k >= 1, "window k >= 1")
    require(divisor >= 2 && divisor <= 16,
      "divisor in [2, 16] (one md5 nibble drives the boundary draw)")
    val chunks = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 1)
      // 1-based END positions of chunks: content-defined boundaries
      // (windows of k tokens whose last md5 nibble mod divisor == 0)
      // plus the forced end-of-doc sentinel
      .withColumn("ends", expr(
        s"""array_distinct(concat(
           |  CASE WHEN size(t) >= $k THEN
           |    filter(sequence(${k}L, cast(size(t) as long)), e ->
           |      cast(conv(substring(md5(array_join(
           |        slice(t, cast(e as int) - $k + 1, $k), ' ')), 32, 1),
           |        16, 10) as int) % $divisor = 0)
           |  ELSE array() END,
           |  array(cast(size(t) as long))))""".stripMargin))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ends)), j -> named_struct(
          |  'start', CASE WHEN j = 1 THEN 1L
          |    ELSE element_at(ends, j - 1) + 1L END,
          |  'end', element_at(ends, j)))""".stripMargin)).as("c"),
        col("t"))
      .select(col("doc_id"),
        md5(array_join(expr(
          "slice(t, cast(c.start as int), cast(c.end - c.start + 1 as int))"),
          " ")).as("fp"),
        (col("c.end") - col("c.start") + 1L).as("ntok"))
    // first_doc via a window, not groupBy+join-back: the join form
    // evaluates the whole chunking pipeline (per-window md5 boundary
    // draws) TWICE — once under the aggregate, once under the probe —
    // because the aggregate side shuffles partial-agg rows, so the two
    // exchanges never unify and ReuseExchange cannot fire (r11 plan
    // audit: 2 parquet scans -> 1). min() over the fp partition computes
    // the identical first_doc in ONE pass and one fp-keyed shuffle.
    chunks
      .withColumn("first_doc",
        min("doc_id").over(Window.partitionBy("fp")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum(col("ntok")).as("n_tokens"),
        sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L))
          .as("n_dup_chunks"),
        sum(when(col("doc_id") > col("first_doc"), col("ntok"))
          .otherwise(0L)).as("n_dup_tokens"))
  }

  /** Capture-recapture residual-duplicate estimate: how many duplicate
    * pairs did BOTH detectors miss? Two independent near-dup passes
    * (e.g. MinHash-verified Jaccard and SimHash Hamming) are two
    * "captures" of the same closed population of true duplicate pairs;
    * the bias-corrected Chapman (1951) form of Lincoln-Petersen
    * estimates the population from the overlap:
    *
    *   est_total = (n_a + 1)(n_b + 1) div (n_both + 1) - 1
    *
    * and est_undetected = est_total - |union| — the "should we run a
    * third pass" decision number no single detector can produce.
    * Integer-exact (one floored division; est_undetected is provably
    * >= 0 since (na+1)(nb+1) - (m+1)(na+nb-m+1) = (na-m)(nb-m) >= 0).
    *
    * Scale: the two pair sets are the detectors' own outputs (candidate-
    * bounded); this adds one canonicalizing distinct each and one
    * full-outer equi-join on the pair key, collapsing straight to ONE
    * row. Independence caveat (Petersen's): correlated detectors bias
    * est_total low — pick mechanistically different passes.
    *
    * Output: 1 row — (n_a, n_b, n_both, est_total, est_undetected). */
  def captureRecapture(pairsA: DataFrame, pairsB: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame = {
    def canon(df: DataFrame, flag: String) = df.select(
        least(col(aCol), col(bCol)).as("pa"),
        greatest(col(aCol), col(bCol)).as("pb"))
      .distinct().withColumn(flag, lit(1L))
    canon(pairsA, "in_a")
      .join(canon(pairsB, "in_b"), Seq("pa", "pb"), "full_outer")
      .agg(count(col("in_a")).as("n_a"), count(col("in_b")).as("n_b"),
        count(when(col("in_a").isNotNull && col("in_b").isNotNull, 1))
          .as("n_both"))
      .select(col("n_a"), col("n_b"), col("n_both"),
        expr("cast(cast(n_a + 1 as decimal(38,0)) * (n_b + 1) " +
          "div (n_both + 1) - 1 as bigint)").as("est_total"),
        expr("cast(cast(n_a + 1 as decimal(38,0)) * (n_b + 1) " +
          "div (n_both + 1) - 1 - (n_a + n_b - n_both) as bigint)")
          .as("est_undetected"))
  }
}

package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing for LLM pre-training: assign every
  * document a (bucket, sequence, offset) slot in a virtual concatenated
  * token stream chopped into fixed-size training sequences — the
  * concat-and-chunk packing scheme (documents may straddle sequence
  * boundaries; the trainer masks across them).
  *
  * Scale design: a single global running sum would serialize the corpus
  * through one task. Instead the corpus is hash-bucketed (deterministic
  * md5 bucket of the id — same RNG-free trick as [[Sampling]]) and packing
  * runs independently per bucket: the window ordering is only within a
  * bucket, so parallelism = `buckets` and each task's state is one
  * running counter. At 100 TB raise `buckets` so each bucket's document
  * stream fits a task comfortably; sequence ids stay globally unique as
  * (bucket, seq_in_bucket) pairs. All arithmetic is integral — bit-for-bit
  * reproducible on any engine, cluster size, or partitioning.
  */
object Packing {

  /** Output: (doc_id, bucket, n_tokens, seq_in_bucket, tok_offset) where
    * `seq_in_bucket` is the training sequence the document STARTS in and
    * `tok_offset` its first token's position inside that sequence.
    */
  def sequencePack(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, buckets: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens > 0")
    require(buckets > 0 && buckets <= 256, "buckets in [1, 256]")
    val d = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", pmod(Sampling.hashBucket(col("doc_id")), lit(buckets)))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("prev", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"),
        expr(s"prev div $budgetTokens").as("seq_in_bucket"),
        (col("prev") % budgetTokens).as("tok_offset"))
  }

  /** Overlapping token windows (size `window`, stride `stride`) per
    * document — the standard context-window chunking for embedding /
    * retrieval corpora, where consecutive chunks share `window - stride`
    * tokens so no span is split across a boundary unseen.
    *
    * Emits one row per chunk: (doc_id, chunk_idx, n_tokens, chunk_md5).
    * The md5 is over the space-joined window — a content fingerprint the
    * downstream chunk-level dedup (dd11) can key on directly. A document
    * shorter than `window` yields its single truncated chunk. Purely
    * narrow work (tokenize once, sequence fan-out, no shuffle at all);
    * chunk counts are data-bounded: ceil((n_tokens - window)/stride) + 1.
    */
  def strideChunks(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("t"))
    // chunk start positions 0, stride, 2*stride ... while start < n
    // (at least one chunk even for empty docs' single empty token slot)
    val nChunks = greatest(
      ceil((size(col("t")) - lit(window)).cast("double") / stride)
        .cast("int") + 1,
      lit(1))
    toks
      .select(col("doc_id"), col("t"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("t"), i * stride + 1, lit(window)))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        size(col("col")).cast("long").as("n_tokens"),
        md5(array_join(col("col"), " ")).as("chunk_md5"))
  }

  /** Best-fit-decreasing bin packing — the packing scheme that does NOT
    * split documents across sequences (vs [[sequencePack]]'s
    * concat-and-chunk): within each hash bucket, documents sort by token
    * count descending and each takes the tightest bin that still fits
    * (opening a new bin otherwise). BFD is the classic 11/9 OPT + 6/9
    * guarantee (Johnson 1973); in practice it packs pre-training bins to
    * ~95%+ utilization without ever truncating or straddling a document.
    * Documents longer than the budget get a singleton bin (the trainer
    * truncates those explicitly, not silently).
    *
    * Scale shape: same bucket decomposition as [[sequencePack]] — the
    * greedy scan is inherently sequential, so parallelism comes from
    * independent hash buckets (raise `buckets` with the corpus; any
    * positive count works). The decreasing order comes from Spark's own
    * SPILLABLE sort (`repartition(bucket)` + `sortWithinPartitions`),
    * never a task-memory `toArray`: the streaming `mapPartitions` scan
    * holds ONLY the current bucket's open-bin remaining capacities —
    * task memory is bins-per-bucket, not docs-per-bucket, so a bucket
    * whose document stream exceeds RAM still packs (the sort spills,
    * the scan is O(open bins)). Bin search is a linear scan per
    * document — swap in a TreeMap keyed on remaining capacity if
    * bins-per-bucket grows past ~10^4. Fully deterministic (md5 bucket,
    * total sort order, greedy tie to the lowest bin id): identical
    * packing on any partitioning or rerun.
    *
    * Oracle: the greedy recurrence has no single-pass relational form,
    * but it IS expressible as a recursive CTE that advances every
    * bucket one document per iteration, carrying each bucket's open-bin
    * free list as a LIST column (best fit = `list_min(list_filter(free,
    * x -> x >= n))`, lowest-index tie via `list_position`) — so
    * `pk7_bestfit_pack` is bit-exact oracle-checked in DuckDB, the same
    * unrolling trick tx35 uses for BPE. PackingSpec additionally gates
    * capacity, completeness, the singleton rule, determinism,
    * bounded-memory at 1e5 docs/4 buckets, and a utilization floor.
    *
    * Output: (doc_id, bucket, n_tokens, bin_in_bucket). */
  def bestFitPack(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Int, buckets: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens > 0")
    require(buckets > 0, "buckets > 0")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket",
        pmod(Sampling.hashBucket(col("doc_id")), lit(buckets)).cast("int"))
      // one shuffle partition may carry several buckets; sorting by
      // (bucket, -n_tokens, doc_id) makes each bucket a contiguous,
      // BFD-ordered run the streaming scan below consumes in one pass
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("n_tokens").desc,
        col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var cur = Int.MinValue
        val binFree = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { case (id, n, b) =>
          if (b != cur) { cur = b; binFree.clear() }
          var best = -1
          var bestFree = Long.MaxValue
          var i = 0
          while (i < binFree.length) {
            val f = binFree(i)
            if (f >= n && f < bestFree) { best = i; bestFree = f }
            i += 1
          }
          val bin = if (best >= 0) { binFree(best) -= n; best }
            else { binFree += (budgetTokens - n); binFree.length - 1 }
          (id, b, n, bin.toLong)
        }
      }
      .toDF("doc_id", "bucket", "n_tokens", "bin_in_bucket")
  }

  /** Fill-in-the-middle training-example generation (Bavarian et al.
    * 2022, "Efficient Training of Language Models to Fill in the
    * Middle"): for a deterministic fraction of documents, split the text
    * at two RNG-free offsets into (prefix, middle, suffix) and emit the
    * PSM rearrangement `<PRE>prefix<SUF>suffix<MID>middle`; the rest pass
    * through untransformed (the paper's joint FIM+AR recipe). All
    * randomness is md5-derived from the document id — the same corpus
    * yields the identical example set on any engine, cluster size, or
    * rerun, which is what makes the training run reproducible.
    *
    * Output is narrow on purpose: split offsets, span lengths, and the
    * md5 of the rearranged example (not the example text itself), so the
    * audit row stays ~100 bytes regardless of document size. Zero
    * shuffles — pure per-row column arithmetic.
    */
  /** T5-style span-corruption PLAN (Raffel et al. 2020 §3.1.4): which
    * token spans each document masks for a denoising objective. Position
    * p is selected iff its md5-derived draw lands under `maskPpm`
    * (deterministic, seedless, per (doc, p) — the dd8 hash discipline,
    * so the plan is reproducible across runs and engines); consecutive
    * selected positions merge into one span (pos - row_number islands,
    * the q54 trick), giving the mean-span-length ~1/(1-rate) geometric
    * shape the objective wants without any sequential sampling loop.
    *
    * Output, one row per span: (doc_id, span_idx, start, len) —
    * span_idx orders sentinels <extra_id_k> within the doc. Everything
    * is integer arithmetic; the oracle reproduces the identical plan.
    *
    * Scale shape: one tokenize + posexplode pass (narrow), one window
    * per doc for the islands — a single doc_id shuffle; output volume
    * ~ maskPpm x corpus tokens. */
  def spanCorruptionPlan(docs: DataFrame, idCol: String, textCol: String,
      maskPpm: Long = 150000L): DataFrame = {
    require(maskPpm > 0 && maskPpm < 1000000L, "0 < maskPpm < 1e6")
    val sel = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "w")))
      .withColumn("draw", pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"))), 1, 8), 16, 10).cast("long"),
        lit(1000000L)))
      .filter(col("draw") < maskPpm)
    val wI = Window.partitionBy("doc_id").orderBy("pos")
    sel
      .withColumn("isl", col("pos") - row_number().over(wI))
      .groupBy("doc_id", "isl")
      .agg(min(col("pos")).cast("long").as("start"),
        count(lit(1)).as("len"))
      .withColumn("span_idx", row_number().over(
        Window.partitionBy("doc_id").orderBy("start")).cast("long"))
      .select(col("doc_id"), col("span_idx"), col("start"), col("len"))
  }

  def fimSplit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def h32(salt: String) =
      conv(substring(md5(concat(lit(salt + ":"),
        col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("n", length(col("text")).cast("long"))
      .withColumn("fim_applied", pmod(h32("fim_g"), lit(2L)) === 0)
      .withColumn("a", pmod(h32("fim_a"), col("n") + 1))
      .withColumn("b", pmod(h32("fim_b"), col("n") + 1))
      .withColumn("split_start", least(col("a"), col("b")))
      .withColumn("split_end", greatest(col("a"), col("b")))
    d.select(col("doc_id"), col("fim_applied"),
        when(col("fim_applied"), col("split_start")).as("split_start"),
        when(col("fim_applied"), col("split_end")).as("split_end"),
        when(col("fim_applied"), col("split_start")).as("n_prefix"),
        when(col("fim_applied"), col("split_end") - col("split_start"))
          .as("n_middle"),
        when(col("fim_applied"), col("n") - col("split_end")).as("n_suffix"),
        when(col("fim_applied"),
            md5(concat(lit("<PRE>"),
              col("text").substr(lit(1),
                col("split_start").cast("int")),
              lit("<SUF>"),
              col("text").substr((col("split_end") + 1).cast("int"),
                (col("n") - col("split_end")).cast("int")),
              lit("<MID>"),
              col("text").substr((col("split_start") + 1).cast("int"),
                (col("split_end") - col("split_start")).cast("int")))))
          .otherwise(md5(col("text"))).as("example_md5"))
  }
}

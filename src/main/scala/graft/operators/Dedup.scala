package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

import org.apache.spark.sql.DataFrame
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
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.repartition(col(idCol))
      // tokenize in its own projection so the regexp tokenizer runs once
      // per doc, not once per shingle (see shinglesOfTokens scaladoc)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("toks"), n)).as("sh"))
      .distinct()

  /** n-gram Jaccard near-dup pairs with similarity >= threshold.
    * Exact set semantics: |A∩B| via the shingle equi-join, |A∪B| via
    * per-doc sizes. Join key is the shingle string (hash-partitioned);
    * doc_a < doc_b canonicalizes pairs. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame = {
    // The shingle set feeds three plan branches (both join sides + sizes).
    // persist, deliberately not localCheckpoint: the CacheManager keys the
    // cache by logical plan, so (a) repeated calls with the same inputs
    // reuse one entry (no per-call growth — only distinct configurations
    // add entries), and (b) sibling operators over the same shingle set
    // (LSH, cluster resolution) hit the same cache across queries.
    val sh = shingleSet(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val a = sh.as("a"); val b = sh.as("b")
    val inter = a.join(b, col("a.sh") === col("b.sh") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        graft.functions.NumericFunctions.fround(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

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
    hashed.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** MinHash-LSH candidate pairs: docs sharing at least one band signature
    * (bands of `rowsPerBand` hashes, signature = j-ordered concat of the
    * band's minhashes). Output distinct (doc_a, doc_b). The only shuffles
    * are the signature groupBy and the equi-join on (band, sig) — tiny
    * fixed-width keys, the LSH scale path. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must be divisible by rowsPerBand")
    val numBands = numHashes / rowsPerBand
    val sigs = minhashSignatures(shingleSet(docs, idCol, textCol, shingleN), numHashes)
    val bandCols = (0 until numBands).map { b =>
      concat((b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j")): _*)
        .as(s"band$b")
    }
    val stacked = sigs.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), expr(
        s"stack($numBands, " +
          (0 until numBands).map(b => s"$b, band$b").mkString(", ") +
          ") as (band, sig)"))
      // both self-join sides read this subtree; persist (plan-keyed, see
      // shingle note) so the signature computation runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = stacked.as("a"); val b = stacked.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** SimHash signature per doc over `bits` bits (bit b of md5(token) nibble
    * (b/4)+1, weight +1/-1, majority vote). One narrow pass; returns
    * (doc_id, simhash). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits % 4 == 0 && bits <= 32, "bits must be a multiple of 4, <= 32")
    // one row per token; the `bits` weight columns are projected (codegen)
    // instead of exploding the token set `bits`-fold — one groupBy with
    // `bits` integer sums, no row blowup, map-side partial aggregation
    val tok = docs.repartition(col(idCol))
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
      .withColumn("h", md5(col("t")))
    val weights = (0 until bits).map { b =>
      val nib = conv(substring(col("h"), b / 4 + 1, 1), 16, 10).cast("int")
      when(shiftright(nib, b % 4).bitwiseAND(lit(1)) === 1, lit(1))
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

  /** Connected components over near-dup candidate pairs: resolves pairwise
    * matches into dedup clusters, labeling every member with the minimum
    * doc id of its component (the canonical survivor).
    *
    * Iterative min-label propagation: each round joins labels to the edge
    * list and takes the min over neighbors — one shuffle per round,
    * converging in O(component diameter) rounds. Near-dup clusters are
    * shallow (dups of a common source), so rounds stay single-digit; for
    * adversarial graph shapes swap in the large-star/small-star variant —
    * the join/groupBy skeleton is the same.
    */
  def connectedComponents(
      pairs: DataFrame, maxIter: Int = 20,
      driverThreshold: Long = 4L * 1000 * 1000): DataFrame = {
    // Candidate pairs after LSH/jaccard filtering are orders of magnitude
    // smaller than the corpus; below the threshold a driver-side union-find
    // resolves them in one pass instead of paying one Spark job per
    // propagation round. Above it — or for non-integral id types — fall
    // through to distributed min-label propagation (same labels either
    // way: min id per component).
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

  /** Distributed min-label propagation (the >threshold path). */
  private[operators] def distributedComponents(
      pairs: DataFrame, maxIter: Int): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min("label").as("nlabel"))
      val updated = labels.join(neighborMin, labels("id") === neighborMin("src"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("newlabel"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = updated.filter(col("newlabel") =!= col("label")).count()
      val old = labels
      labels = updated.select(col("id"), col("newlabel").as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      labels.count()
      old.unpersist(); updated.unpersist()
      i += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
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
}

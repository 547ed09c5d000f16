package graft.operators

import graft.functions.VectorFunctions._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the engine contract:
  *  - [[bruteForceTopK]]: exact cosine top-k, the correctness baseline.
  *    queries × corpus is a broadcast-able nested-loop when the query set is
  *    small (the common "probe a batch of queries" shape); the per-pair math
  *    is a codegen'd double fold, never a UDF.
  *  - [[lshTopK]]: the 100 TB path — corpus and queries are bucketed by a
  *    deterministic signed-random-projection hash (no random state, no
  *    broadcast matrix), candidates come from an equi-join on the bucket id,
  *    and only candidates pay the cosine. Multi-probe = OR over `probes`
  *    bucket variants (bit flips) to recover recall.
  */
object Similarity {

  /** Two-stage prefix-dimension search — the Matryoshka retrieval
    * pattern (Kusupati et al. 2022 MRL): embeddings trained
    * front-loaded let stage 1 score on only the first `prefixDim`
    * components (a d/prefixDim cheaper scan — at 100 TB, the stage that
    * reads 4x less vector data per candidate), keep a per-query
    * `shortlist`, and stage 2 rerank only the shortlist with the
    * full-dimension cosine. Recall loss is confined to true neighbors
    * whose PREFIX cosine falls past the shortlist boundary — widening
    * `shortlist` buys it back linearly; with shortlist >= |corpus| the
    * result provably equals [[bruteForceTopK]] (spec-gated).
    *
    * Deterministic: both stages rank (cos desc, neighbor_id). Scale
    * shape: bounded query-batch broadcast against the corpus scan (the
    * ss1/ss17 contract), a rank-limited window per stage
    * (WindowGroupLimit bounds the shuffle to shortlist rows per query);
    * the full-dimension work touches |Q| x shortlist rows only. */
  def matryoshkaRerank(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, prefixDim: Int,
      shortlist: Int): DataFrame = {
    require(k >= 1 && shortlist >= k && prefixDim >= 1,
      "k >= 1, shortlist >= k, prefixDim >= 1")
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      toDouble(col(vecCol)).as("cv"))
    val pre = c.crossJoin(broadcast(q))
      .withColumn("qp", slice(col("qv"), 1, prefixDim))
      .withColumn("cp", slice(col("cv"), 1, prefixDim))
      .withColumn("cos_pre",
        dot(col("qp"), col("cp")) / (norm2(col("qp")) * norm2(col("cp"))))
      .withColumn("prerank", row_number().over(Window
        .partitionBy("query_id")
        .orderBy(desc("cos_pre"), col("neighbor_id"))))
      .filter(col("prerank") <= shortlist)
    pre
      .withColumn("cosraw",
        dot(col("qv"), col("cv")) / (norm2(col("qv")) * norm2(col("cv"))))
      .withColumn("rank", row_number().over(Window
        .partitionBy("query_id")
        .orderBy(desc("cosraw"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cosraw") * 1000.0, 0)
          .cast("long").as("cos_milli"))
  }

  /** Exact top-k neighbors by cosine for each query vector.
    * Deterministic: ties broken by neighbor id.
    *
    * Scale shape: the QUERY batch is the small side — it is collected and
    * broadcast; the corpus streams through `mapPartitions`, each task
    * keeping a bounded per-query candidate set (|Q| x k entries, not the
    * partition). Only |parts| x |Q| x k rows reach the final global-merge
    * window, so a 1000-executor corpus scan shuffles kilobytes. (The naive
    * alternative — broadcast the corpus or window over all |Q| x |C| scored
    * pairs — dies at exactly the scale this operator exists for.)
    */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])].collect()
    val qB = spark.sparkContext.broadcast(
      qRows.map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(s))
      })
    val localTopK = corpus
      .select(col(idCol).cast("long").as("neighbor_id"),
        toDouble(col(vecCol)).as("cv"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val qs = qB.value
        // per-query bounded candidate sets (worst kept at the head)
        val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue
          .empty[(Double, Long)](Ordering.by[(Double, Long), (Double, Double)] {
            case (cos, id) => (-cos, id.toDouble)
          }))
        rows.foreach { case (nid, cv) =>
          var ns = 0.0
          var i = 0
          while (i < cv.length) { ns += cv(i) * cv(i); i += 1 }
          val nn = math.sqrt(ns)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qn) = qs(qi)
            if (qid != nid) {
              var d = 0.0; var j = 0
              val n = math.min(qv.length, cv.length)
              while (j < n) { d += qv(j) * cv(j); j += 1 }
              val cos = d / (qn * nn)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cos, nid))
              else {
                val worst = h.head
                if (cos > worst._1 || (cos == worst._1 && nid < worst._2)) {
                  h.dequeue(); h.enqueue((cos, nid))
                }
              }
            }
            qi += 1
          }
        }
        qs.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _), h) =>
          h.iterator.map { case (cos, nid) => (qid, nid, cos) }
        }
      }
      .toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    localTopK.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** Radius (range) search: every corpus vector whose cosine similarity to
    * a query is >= `minCos` — the "find ALL near neighbors" contract that
    * top-k cannot express (k truncates dense neighborhoods and pads sparse
    * ones). This is the retrieval primitive behind duplicate-sweep jobs
    * ("everything within 0.9 of these flagged items") where completeness,
    * not ranking, is the requirement.
    *
    * Scale shape: the query batch is the bounded broadcast side; the
    * corpus streams through one mapPartitions pass with ZERO shuffle —
    * output volume is threshold-bounded, each emitted row already final
    * (no merge stage at all, unlike top-k which needs the global window).
    * For corpus-scale query sets, the bucketed paths (lshTopK / ivfTopK
    * with a similarity floor) replace the broadcast.
    */
  def radiusSearch(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, minCos: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Array[Double])].collect()
    val qB = spark.sparkContext.broadcast(
      qRows.map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(s))
      })
    corpus
      .select(col(idCol).cast("long").as("neighbor_id"),
        toDouble(col(vecCol)).as("cv"))
      .as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val qs = qB.value
        rows.flatMap { case (nid, cv) =>
          var ns = 0.0
          var i = 0
          while (i < cv.length) { ns += cv(i) * cv(i); i += 1 }
          val nn = math.sqrt(ns)
          qs.iterator.flatMap { case (qid, qv, qn) =>
            if (qid == nid) Iterator.empty
            else {
              var d = 0.0; var j = 0
              val n = math.min(qv.length, cv.length)
              while (j < n) { d += qv(j) * cv(j); j += 1 }
              val cos = d / (qn * nn)
              if (cos >= minCos) Iterator.single((qid, nid, cos))
              else Iterator.empty
            }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cos")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** Hard-negative mining for contrastive training: for each query vector
    * the top-k most-cosine-similar corpus vectors with a DIFFERENT label
    * (same-label neighbors are positives, not negatives — the
    * highest-similarity cross-label items are exactly the "hard" negatives
    * a contrastive objective learns most from; Robinson et al. 2021).
    *
    * Same scale contract as [[bruteForceTopK]]: the query batch is
    * bounded and broadcast (documented driver state), the corpus streams
    * once through a per-partition bounded heap (map-side top-k, k rows
    * per query per partition), then one tiny window merge. The label
    * filter runs inside the partition scan, so excluded pairs never
    * materialize. For corpus-scale query sets use the bucketed paths
    * (lshTopK/ivfTopK) with the label predicate pushed into the candidate
    * join instead.
    */
  def hardNegativeTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows: Array[(Long, Array[Double], Int)] = queries
      .select(col(idCol).cast("long"), toDouble(col(vecCol)),
        col(labelCol).cast("int"))
      .as[(Long, Array[Double], Int)].collect()
    val qB = spark.sparkContext.broadcast(
      qRows.map { case (id, v, lbl) =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (id, v, math.sqrt(s), lbl)
      })
    val localTopK = corpus
      .select(col(idCol).cast("long").as("neighbor_id"),
        toDouble(col(vecCol)).as("cv"), col(labelCol).cast("int").as("clbl"))
      .as[(Long, Array[Double], Int)]
      .mapPartitions { rows =>
        val qs = qB.value
        val heaps = qs.map(_ => scala.collection.mutable.PriorityQueue
          .empty[(Double, Long)](Ordering.by[(Double, Long), (Double, Double)] {
            case (cos, id) => (-cos, id.toDouble)
          }))
        rows.foreach { case (nid, cv, clbl) =>
          var ns = 0.0
          var i = 0
          while (i < cv.length) { ns += cv(i) * cv(i); i += 1 }
          val nn = math.sqrt(ns)
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv, qn, qlbl) = qs(qi)
            // negatives only: different id AND different label
            if (qid != nid && qlbl != clbl) {
              var d = 0.0; var j = 0
              val n = math.min(qv.length, cv.length)
              while (j < n) { d += qv(j) * cv(j); j += 1 }
              val cos = d / (qn * nn)
              val h = heaps(qi)
              if (h.size < k) h.enqueue((cos, nid))
              else {
                val worst = h.head
                if (cos > worst._1 || (cos == worst._1 && nid < worst._2)) {
                  h.dequeue(); h.enqueue((cos, nid))
                }
              }
            }
            qi += 1
          }
        }
        qs.iterator.zip(heaps.iterator).flatMap { case ((qid, _, _, _), h) =>
          h.iterator.map { case (cos, nid) => (qid, nid, cos) }
        }
      }
      .toDF("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    localTopK.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** IVF-style ANN: corpus vectors are assigned to their nearest coarse
    * centroid ("cell"); queries probe the `nProbe` nearest cells and rank
    * only those candidates. Centroids here are the first `nCentroids`
    * corpus vectors by id — a deterministic stand-in for an offline-trained
    * quantizer (the assignment/probing machinery is what matters; swap the
    * centroid source for k-means output in production).
    *
    * Scale: centroids are broadcast (tiny), assignment is one narrow pass,
    * candidate generation is an equi-join on cell id — corpus never
    * self-joins. argmin-L2 is computed as argmax of dot(v, c) - |c|²/2
    * (equivalent since |v|² is constant per vector), so the inner loop is
    * the same codegen'd dot product as everywhere else. */
  /** cent_id derives from `cast(idCol as long)`; under non-ANSI mode a
    * non-numeric id would cast to null and silently collapse every
    * centroid into one null-keyed cell — fail loudly at call time
    * instead. */
  private[operators] def requireNumericId(df: DataFrame, idCol: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"id column '$idCol' must be numeric to derive cent_id (got $dt)")
  }

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    requireNumericId(corpus, idCol)
    val cents = corpus.orderBy(idCol).limit(nCentroids)
      .select(col(idCol).cast("long").as("cent_id"), toDouble(col(vecCol)).as("centv"))
    ivfTopKWithCentroids(queries, corpus, idCol, vecCol, k, cents, nProbe)
  }

  /** Nearest-cell assignment against a broadcast centroid table: keeps the
    * `keep` best cells per ROW (argmax of dot(v, c) - |c|^2/2 — the
    * argmin-L2 identity). Shared by IVF search and k-means training.
    *
    * The keep-best window partitions on a per-row nonce, NOT the caller's
    * id column: ids are not guaranteed unique (the sf0.1 fixtures reuse
    * PKs), and partitioning on a duplicated id would silently collapse
    * distinct vectors to one, corrupting k-means means. The nonce value
    * never leaves this function — each single-row partition's ranking
    * depends only on row content, so results stay deterministic. */
  private[operators] def assignCells(
      df: DataFrame, vc: String, cents: DataFrame, keep: Int): DataFrame = {
    val withHalf = cents.withColumn("cent_half_sq",
      dot(col("centv"), col("centv")) / 2)
    val scored = df.withColumn("__rid", monotonically_increasing_id())
      .join(broadcast(withHalf), lit(true))
      .withColumn("score", dot(col(vc), col("centv")) - col("cent_half_sq"))
    val w = Window.partitionBy("__rid")
      .orderBy(col("score").desc, col("cent_id"))
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= keep)
      .drop("centv", "cent_half_sq", "score", "crank", "__rid")
  }

  /** IVF search against an externally-trained centroid table
    * (cent_id, centv) — pair with [[trainKMeans]] for the production path;
    * [[ivfTopK]] keeps the deterministic first-N stand-in the oracle
    * mirrors. */
  def ivfTopKWithCentroids(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cents: DataFrame, nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm2(col("cv")))
    def assign(df: DataFrame, vc: String, keep: Int): DataFrame =
      assignCells(df, vc, cents, keep)
    val corpusCells = assign(c, "cv", 1).withColumnRenamed("cent_id", "cell")
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm2(col("qv")))
    val queryCells = assign(q, "qv", nProbe).withColumnRenamed("cent_id", "cell")
    val scored = queryCells.join(corpusCells, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** Incremental IVF index maintenance (the append path a production ANN
    * service runs between retrains): a NEW embedding batch is assigned to
    * the EXISTING coarse cells — one broadcast-centroid pass over only the
    * new rows, cost proportional to the batch, indexed vectors untouched —
    * and the per-cell report (indexed / added / total, hot flag when a
    * cell exceeds 2x the mean) is the ops signal that decides when the
    * quantizer needs retraining. The indexed-side counts are recomputed
    * here so the oracle can check them; a deployed index maintains them as
    * metadata and the append still never rescans the corpus.
    *
    * The hot flag compares in integers (n_total * n_cells > 2 * sum_total)
    * so the report is engine- and partitioning-exact.
    */
  def ivfAppendReport(indexed: DataFrame, batch: DataFrame,
      vecCol: String, cents: DataFrame): DataFrame = {
    def cellCounts(df: DataFrame, as: String): DataFrame =
      assignCells(df.select(toDouble(col(vecCol)).as("v")), "v", cents, 1)
        .groupBy(col("cent_id").as("cell")).agg(count(lit(1)).as(as))
    val cells = cents.select(col("cent_id").as("cell"))
      .join(broadcast(cellCounts(indexed, "n_indexed")), Seq("cell"), "left")
      .join(broadcast(cellCounts(batch, "n_added")), Seq("cell"), "left")
      .select(col("cell"),
        coalesce(col("n_indexed"), lit(0L)).as("n_indexed"),
        coalesce(col("n_added"), lit(0L)).as("n_added"))
      .withColumn("n_total", col("n_indexed") + col("n_added"))
    val tot = cells.agg(sum(col("n_total")).as("sum_total"),
      count(lit(1)).as("n_cells"))
    cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_indexed"), col("n_added"), col("n_total"),
        (col("n_total") * col("n_cells") > col("sum_total") * 2).as("hot"))
  }

  /** The delete path of IVF index maintenance (complement of
    * [[ivfAppendReport]]'s append path): deletions are TOMBSTONES — the
    * indexed vectors stay in their cells and the ids join against a
    * delete list at query time, so a delete costs one row in a side
    * table, never an index rewrite. This report is the ops signal for
    * when tombstones should be compacted away: per cell, live vs deleted
    * counts and a flag when deletions exceed 1/6 of the live set
    * (integer comparison: n_deleted * 5 > n_live). One broadcast-centroid
    * assignment pass + one broadcast semi-join against the (small) delete
    * list — the corpus never self-joins and never rewrites. */
  def ivfDeleteReport(indexed: DataFrame, deletes: DataFrame,
      idCol: String, vecCol: String, nCentroids: Int): DataFrame = {
    requireNumericId(indexed, idCol)
    val cents = indexed.orderBy(idCol).limit(nCentroids)
      .select(col(idCol).cast("long").as("cent_id"),
        toDouble(col(vecCol)).as("centv"))
    val assigned = assignCells(
        indexed.select(col(idCol).as("vid"), toDouble(col(vecCol)).as("v")),
        "v", cents, 1)
      .withColumnRenamed("cent_id", "cell")
    val flagged = assigned.join(
        broadcast(deletes.select(col(deletes.columns.head).as("vid"),
          lit(true).as("del"))),
        Seq("vid"), "left")
    flagged.groupBy("cell")
      .agg(count(when(col("del").isNull, 1)).as("n_live"),
        count(col("del")).as("n_deleted"))
      .select(col("cell"), col("n_live"), col("n_deleted"),
        (col("n_deleted") * 5 > col("n_live")).as("needs_compact"))
  }

  /** LSH-bucketed ANN: candidates share an SRP bucket with the query; top-k
    * within candidates. `planes` controls bucket granularity (2^planes
    * buckets). Same output schema as brute force; recall < 1 by design.
    *
    * `probes` = number of buckets each query examines (multi-probe LSH):
    * 1 probes only the query's own bucket; p probes additionally flip the
    * p-1 LOWEST-MARGIN hyperplane bits — the planes the query sits closest
    * to, i.e. the buckets its true neighbors most likely fell into. Recall
    * recovers at the cost of p× the candidate volume, still with zero
    * corpus self-join. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int,
      probes: Int = 1): DataFrame = {
    require(probes >= 1 && probes <= planes + 1, "probes in [1, planes+1]")
    val q0 = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket0", srpBucket(col("qv"), planes))
      .withColumn("qn", norm2(col("qv")))
    // candidate flips ranked by |projection| ascending (margin to the
    // hyperplane; ties by plane index) — deterministic probe order
    val flipCands = array((0 until planes).map { p =>
      struct(abs(srpProjection(col("qv"), p)).as("m"), lit(p).as("p"),
        col("bucket0").bitwiseXOR(lit(1L << p)).as("b"))
    }: _*)
    val probeBuckets = concat(array(col("bucket0")),
      transform(slice(sort_array(flipCands), 1, probes - 1), s => s.getField("b")))
    val q = q0.withColumn("bucket", explode(probeBuckets)).drop("bucket0")
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
      .withColumn("cn", norm2(col("cv")))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** Two-stage retrieval: SRP-bucketed candidates are first scored against
    * the INT8-DEQUANTIZED corpus vectors (stage 1 — at scale the quantized
    * store is 4x smaller than float32, so the candidate scan is memory-
    * bandwidth-cheap), the per-query `shortlist` best advance, and only
    * those pay the exact full-precision cosine re-rank (stage 2). The
    * production retrieval shape: approximate-score wide, exact-score
    * narrow.
    *
    * Scale: candidates come from the same bucket equi-join as [[lshTopK]]
    * (no corpus self-join); stage 2 touches |Q| x shortlist rows only.
    * Same output schema as the other topK operators. Shortlist >> k keeps
    * quantization-induced boundary swaps away from the final top-k. */
  def quantizedRerankTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int,
      shortlist: Int): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", srpBucket(col("qv"), planes))
      .withColumn("qn", norm2(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", srpBucket(col("cv"), planes))
      .withColumn("cn", norm2(col("cv")))
      .withColumn("sc", quantScale(col("cv")))
      .withColumn("dv", dequantizeInt8(quantizeInt8(col("cv"), col("sc")), col("sc")))
      .withColumn("dn", norm2(col("dv")))
    val cand = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      // stage 1: approximate cosine on the dequantized vector
      .withColumn("acos",
        when(col("dn") === 0.0, lit(0.0))
          .otherwise(dot(col("qv"), col("dv")) / (col("qn") * col("dn"))))
    val w1 = Window.partitionBy("query_id")
      .orderBy(col("acos").desc, col("neighbor_id"))
    val short = cand.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= shortlist)
    // stage 2: exact full-precision re-rank of the shortlist
    val exact = short.withColumn("cos",
      dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w2 = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        graft.functions.NumericFunctions.fround(col("cos"), 3).as("cos"))
  }

  /** Deterministic distributed Lloyd's k-means over an embedding column —
    * the offline coarse-quantizer trainer for [[ivfTopKWithCentroids]].
    *
    * Determinism (same centroids on any cluster size / partitioning):
    * init = first k vectors by id; assignment ties break by cent_id; the
    * centroid mean sums each dimension in DECIMAL (order-independent
    * exact addition) before one final double division — a plain double
    * sum would drift with partition order and make training
    * non-reproducible. Each round is: one broadcast-join assignment pass,
    * one (cell, dim) aggregation — no all-pairs anything; rounds
    * localCheckpoint to keep the iterative plan flat.
    *
    * Returns (cent_id, centv). Cells that lose all members keep their
    * previous centroid (the standard empty-cluster fallback).
    */
  def trainKMeans(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    requireNumericId(corpus, idCol)
    val v = corpus.select(col(idCol).as("vid"), toDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var cents = v.orderBy("vid").limit(k)
      .select(col("vid").cast("long").as("cent_id"), col("v").as("centv"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val assigned = assignCells(v, "v", cents, keep = 1)
      val means = assigned
        .select(col("cent_id"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cent_id", "pos")
        .agg((sum(col("x").cast("decimal(28,12)")) / count(lit(1)))
          .cast("double").as("m"))
        .groupBy("cent_id")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("newv"))
      val next = cents.join(means, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("newv"), col("centv")).as("centv"))
        .localCheckpoint(true)
      // the new round is EAGERLY materialized, so the superseded round's
      // checkpoint blocks can be released (plain unpersist would no-op)
      graft.FrameRelease.release(cents)
      cents = next
      i += 1
    }
    v.unpersist()
    cents
  }

  /** Product-quantization encode + asymmetric-distance (ADC) top-k — the
    * memory-compressed ANN path: each vector is stored as `nSub` one-byte
    * codes (here 4 bits: `nCodes`=16) instead of `nSub * subDim` floats, a
    * 64x compression at the fixture shape, and query scoring touches only
    * the tiny per-query lookup table, never the original vectors.
    *
    * Determinism contract: subspace distances are element-quantized to
    * integer nano-units (each squared-diff floored to BIGINT before the
    * sum), so every distance, code assignment (ties to the lowest code)
    * and ADC score is exact integer arithmetic — bit-identical on any
    * partitioning and reproduced exactly by the oracle. The codebook is
    * the deterministic first-`nCodes`-by-id stand-in (ss3 precedent);
    * production swaps an offline-trained one without touching the plan.
    *
    * Scale shape: codebook and query tables are broadcast (nCodes * nSub
    * rows); the corpus makes ONE narrow pass to encode (no shuffle until
    * the |corpus| x 1 code rows aggregate), and ADC is an equi-join on
    * (subspace, code) followed by a k-bounded window. No pairwise vector
    * math anywhere after encoding.
    */
  def pqAdcTopK(
      emb: DataFrame, idCol: String, vecCol: String,
      nSub: Int, subDim: Int, nCodes: Int, queryMaxId: Long,
      k: Int): DataFrame = {
    require(nSub > 0 && subDim > 0 && nCodes > 1 && k > 0)
    requireNumericId(emb, idCol)
    val v = emb.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val cb = v.filter(col("vec_id") < nCodes)
      .select(col("vec_id").as("code"), col("v").as("cv"))
    val subIdx = sequence(lit(0), lit(nSub - 1))
    def subspaces(vc: org.apache.spark.sql.Column) =
      transform(subIdx, sIdx => slice(vc, sIdx * subDim + 1, lit(subDim)))
    val expanded = v.select(col("vec_id"), posexplode(subspaces(col("v"))))
      .select(col("vec_id"), col("pos").as("s"), col("col").as("sv"))
    val cbExp = cb.select(col("code"), posexplode(subspaces(col("cv"))))
      .select(col("code"), col("pos").as("s"), col("col").as("csv"))
    // per (vector, subspace, code): integer nano-unit squared distance;
    // the fold is over BIGINTs, so evaluation order cannot matter
    val dist = PlanPersist("similarity.pqAdc.dist",
      expanded.join(broadcast(cbExp), "s")
        .select(col("vec_id"), col("s"), col("code"),
          aggregate(zip_with(col("sv"), col("csv"),
              (a, b) => floor((a - b) * (a - b) * lit(1e9)).cast("long")),
            lit(0L), (acc, x) => acc + x).as("d_u")))
    val encW = Window.partitionBy("vec_id", "s").orderBy(col("d_u"), col("code"))
    val enc = dist.withColumn("rn", row_number().over(encW))
      .filter(col("rn") === 1).select("vec_id", "s", "code")
    val qd = dist.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("s"), col("code"), col("d_u"))
    val adc = enc.join(broadcast(qd), Seq("s", "code"))
      .groupBy("query_id", "vec_id").agg(sum("d_u").as("adc_u"))
    val rankW = Window.partitionBy("query_id").orderBy(col("adc_u"), col("vec_id"))
    adc.withColumn("rank", row_number().over(rankW)).filter(col("rank") <= k)
      .select("query_id", "vec_id", "adc_u", "rank")
  }

  /** IVF-PQ composed ANN — the production 100 TB index architecture
    * (Jegou et al. 2011, "Product Quantization for Nearest Neighbor
    * Search", the IVFADC variant): a coarse quantizer partitions the
    * corpus into cells, and within each cell vectors are stored as
    * `nSub` product-quantization codes of their RESIDUAL (v - centroid)
    * — the residual's variance is a fraction of the vector's, so the
    * same code budget quantizes far more precisely than flat PQ (ss9).
    * Queries probe `nProbe` nearest cells; in each probed cell the
    * query's OWN residual against that cell's centroid builds the ADC
    * lookup table, and candidates are scored by summing per-subspace
    * table entries — never touching a stored vector.
    *
    * Determinism contract (ss3 + ss9 precedents composed): cell
    * assignment is argmax dot(v,c) - |c|^2/2 with ties to the lowest
    * centroid id; every PQ distance element-quantizes to integer
    * nano-units (floor((a-b)^2 * 1e9) per element) before BIGINT
    * summation, so codes, lookup tables and ADC scores are exact
    * integer arithmetic on any partitioning, reproduced bit-for-bit by
    * the oracle. Centroids are the deterministic first-`nCells`
    * corpus ids; the PQ codebook is the residuals of the NEXT `nCodes`
    * corpus ids (skipping the centroids themselves, whose residuals
    * are degenerate zeros); production swaps offline-trained tables
    * without touching the plan.
    *
    * Scale shape: centroids (nCells rows), the codebook (nCodes x nSub
    * subspace rows) and the query lookup tables (|Q| x nProbe x nSub x
    * nCodes rows) are all broadcast; the corpus makes one narrow
    * assign+encode pass (cost |corpus| x nCodes subspace distances, all
    * map-side), and ADC is a broadcast equi-join on (cell, subspace,
    * code) feeding one map-side-combined (query, vector) sum — the
    * only shuffle of corpus cardinality. Memory per indexed vector:
    * nSub codes + one cell id, vs nSub*subDim floats raw.
    *
    * Output: (query_id, rank, neighbor_id, adc_u) — rank by ascending
    * integer ADC distance, ties to the lowest neighbor id. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryMaxId: Long, nCells: Int, nProbe: Int,
      nSub: Int, subDim: Int, nCodes: Int, k: Int): DataFrame = {
    require(nCells > 0 && nProbe > 0 && nSub > 0 && subDim > 0 &&
      nCodes > 1 && k > 0)
    requireNumericId(emb, idCol)
    val v = emb.select(col(idCol).cast("long").as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val corpus = v.filter(col("vec_id") >= queryMaxId)
    val queries = v.filter(col("vec_id") < queryMaxId)
    val cents = corpus.orderBy("vec_id").limit(nCells)
      .select(col("vec_id").as("cent_id"), col("v").as("centv"))
    def withResidual(assigned: DataFrame, vc: String): DataFrame =
      assigned.join(broadcast(cents), "cent_id")
        .withColumn("rv", zip_with(col(vc), col("centv"), (a, b) => a - b))
        .drop("centv")
    val cAss = withResidual(assignCells(corpus, "v", cents, 1), "v")
      .select(col("vec_id"), col("cent_id").as("cell"), col("rv"))
    // codebook: residuals of the next nCodes corpus ids after the
    // centroid prefix (both prefixes of the same id order, so the
    // anti-join leaves exactly nCodes rows)
    val cb = cAss
      .join(broadcast(corpus.orderBy("vec_id").limit(nCells + nCodes)
        .select(col("vec_id"))), Seq("vec_id"), "left_semi")
      .join(broadcast(cents.select(col("cent_id").as("vec_id"))),
        Seq("vec_id"), "left_anti")
      .select(col("vec_id").as("code"), col("rv").as("cbv"))
    val subIdx = sequence(lit(0), lit(nSub - 1))
    def subspaces(vc: Column): Column =
      transform(subIdx, s => slice(vc, s * subDim + 1, lit(subDim)))
    val cbExp = cb.select(col("code"), posexplode(subspaces(col("cbv"))))
      .select(col("code"), col("pos").as("s"), col("col").as("csv"))
    def pqDist(a: Column, b: Column): Column =
      aggregate(zip_with(a, b,
          (x, y) => floor((x - y) * (x - y) * lit(1e9)).cast("long")),
        lit(0L), (acc, x) => acc + x)
    // encode: per (corpus vector, subspace) the argmin-distance code
    val cExp = cAss.select(col("vec_id"), col("cell"),
        posexplode(subspaces(col("rv"))))
      .select(col("vec_id"), col("cell"), col("pos").as("s"),
        col("col").as("rsv"))
    val encW = Window.partitionBy("vec_id", "s")
      .orderBy(col("d_u"), col("code"))
    val enc = cExp.join(broadcast(cbExp), "s")
      .select(col("vec_id"), col("cell"), col("s"), col("code"),
        pqDist(col("rsv"), col("csv")).as("d_u"))
      .withColumn("rn", row_number().over(encW))
      .filter(col("rn") === 1)
      .select("vec_id", "cell", "s", "code")
    // query side: nProbe cells, per-cell residual, per-cell ADC table
    val qAss = withResidual(
        assignCells(queries.withColumnRenamed("vec_id", "query_id"),
          "v", cents, nProbe), "v")
      .select(col("query_id"), col("cent_id").as("cell"), col("rv"))
    val qLut = qAss.select(col("query_id"), col("cell"),
        posexplode(subspaces(col("rv"))))
      .select(col("query_id"), col("cell"), col("pos").as("s"),
        col("col").as("qsv"))
      .join(broadcast(cbExp), "s")
      .select(col("query_id"), col("cell"), col("s"), col("code"),
        pqDist(col("qsv"), col("csv")).as("d_u"))
    val adc = enc.join(broadcast(qLut), Seq("cell", "s", "code"))
      .groupBy("query_id", "vec_id").agg(sum(col("d_u")).as("adc_u"))
    val rankW = Window.partitionBy("query_id")
      .orderBy(col("adc_u"), col("vec_id"))
    adc.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("adc_u"))
  }

  /** Maximal-marginal-relevance diversified top-k: greedily pick the
    * candidate maximizing `relevance - λ · max-similarity-to-selected` —
    * the standard diversity re-rank (Carbonell–Goldstein) a training-data
    * pipeline uses to sample VARIED exemplars instead of k near-copies of
    * the single best match. λ = lambdaNum/lambdaDen with a power-of-two
    * denominator so the product is FP-exact on every engine.
    *
    * Scale shape: the candidate pool stays distributed; each of the k
    * greedy rounds is one pool scan (update the running max-similarity
    * against the latest pick, take the arg-max). Only the k selected
    * vectors ever reach the driver — the same bounded-driver-state
    * contract as [[bruteForceTopK]]'s query batch. k passes over the pool
    * is the honest cost of exact greedy MMR; cheaper approximations
    * (cluster-then-pick) trade away the guarantee. k is hard-capped at
    * 128 (one Spark job per round), and the growing filter+greatest
    * lineage is truncated by a local checkpoint every 16 rounds.
    *
    * Output: (rank, cand_id, mmr) — mmr is round 1's plain relevance,
    * later rounds' penalized score, floor-rounded to 4 decimals.
    */
  def mmrTopK(
      candidates: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int,
      lambdaNum: Int = 1, lambdaDen: Int = 2): DataFrame = {
    // each greedy round is one driver-coordinated Spark job over the
    // pool — a hard ceiling so a caller cannot accidentally ask for
    // thousands of jobs (the contract is "re-rank a shortlist", k<=128;
    // for bigger k use a bucketed diversifier, not exact MMR)
    require(k >= 1 && k <= 128,
      s"k=$k out of [1, 128]: each MMR round is one Spark job")
    require(lambdaNum >= 0 && lambdaDen > 0)
    require(Integer.bitCount(lambdaDen) == 1, "lambdaDen must be a power of 2")
    val spark = candidates.sparkSession
    import spark.implicits._
    val lam = lit(lambdaNum.toDouble / lambdaDen.toDouble)
    val qLit = array(queryVec.map(lit): _*)
    val pool0 = candidates
      .select(col(idCol).cast("long").as("cand_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("rel", cosine(col("v"), qLit))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // maxsim starts below any cosine so round 1 ranks by pure relevance
    var pool = pool0.withColumn("maxsim", lit(-2.0))
    var lastCkpt: DataFrame = null
    val picked = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Double, Array[Double])]
    var r = 0
    var exhausted = false
    while (r < k && !exhausted) {
      val mmr = when(col("maxsim") === -2.0, col("rel"))
        .otherwise(col("rel") - lam * col("maxsim"))
      val top = pool.withColumn("mmr", mmr)
        .orderBy(col("mmr").desc, col("cand_id")).limit(1)
        .select("cand_id", "mmr", "v")
        .as[(Long, Double, Array[Double])].collect()
      if (top.isEmpty) exhausted = true
      else {
        val (id, score, vec) = top.head
        picked += ((id, score, vec))
        val vLit = array(vec.toSeq.map(lit): _*)
        pool = pool.filter(col("cand_id") =!= id)
          .withColumn("maxsim", greatest(col("maxsim"), cosine(col("v"), vLit)))
        // the pool lineage grows one filter+greatest per round on top
        // of the cached pool0 — truncate it every 16 rounds (and drop
        // the superseded checkpoint) so late rounds re-evaluate a
        // constant-depth plan instead of an O(k) expression stack
        if (picked.size % 16 == 0) {
          val ck = pool.localCheckpoint(true)
          graft.FrameRelease.release(lastCkpt)
          lastCkpt = ck
          pool = ck
        }
      }
      r += 1
    }
    graft.FrameRelease.release(lastCkpt)
    pool0.unpersist(false)
    picked.zipWithIndex.map { case ((id, score, _), i) =>
      (i + 1L, id, math.floor(score * 10000.0) / 10000.0)
    }.toSeq.toDF("rank", "cand_id", "mmr")
  }

  /** Per-dimension embedding health audit — the QC pass an embedding
    * corpus earns before any ANN index is built on it: a COLLAPSED
    * dimension (constant or near-constant across the corpus — a dead
    * encoder unit, a zero-initialized pad, a truncated export) silently
    * wastes index bits and distorts every distance. One row per
    * dimension with exact integer stats.
    *
    * Determinism discipline: each float widens to double (IEEE-exact) and
    * floors to micro-units once; everything downstream is integer
    * min/max/sum/count-distinct — no float summation order anywhere, so
    * the result is partitioning-invariant and oracle-bit-exact. The mean
    * is published as the exact integer sum (consumers divide); floored
    * integer division of a possibly-negative sum is the one step Spark
    * (`div`, truncating) and other engines (floor semantics) disagree
    * on, so it stays out of the contract.
    *
    * Scale shape: posexplode fans each vector into |dims| narrow rows,
    * then TWO-LEVEL aggregation — first on (dim, value) so the exact
    * distinct count never needs Catalyst's Expand (which would double
    * the scanned rows before the first shuffle), then on dim. Map-side
    * combine collapses each partition to its distinct (dim, value)
    * pairs before the first exchange; the second exchange carries at
    * most |dims| x |distinct values| pre-combined rows. Output: (dim, n,
    * sum_mu, min_mu, max_mu, n_distinct_mu, collapsed) — collapsed when
    * the dimension's whole corpus range is below 1e-3. */
  def dimAudit(embs: DataFrame, vecCol: String): DataFrame =
    embs.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim"),
        floor(col("x").cast("double") * 1000000.0).cast("long").as("x_mu"))
      .groupBy("dim", "x_mu").agg(count(lit(1)).as("c"))
      .groupBy("dim")
      .agg(sum(col("c")).as("n"),
        sum(col("x_mu") * col("c")).as("sum_mu"),
        min(col("x_mu")).as("min_mu"),
        max(col("x_mu")).as("max_mu"),
        count(lit(1)).as("n_distinct_mu"))
      .select(col("dim").cast("long").as("dim"), col("n"), col("sum_mu"),
        col("min_mu"), col("max_mu"), col("n_distinct_mu"),
        (col("max_mu") - col("min_mu") < 1000).as("collapsed"))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embeddings.
  *
  * Pure `functions._` compositions (`zip_with`/`aggregate`/`transform`) so
  * the math stays inside whole-stage codegen — no UDF boxing per element.
  * All arithmetic is promoted to double *before* accumulation and folds
  * strictly left-to-right, which makes results bit-deterministic and
  * engine-comparable (the DuckDB oracle computes the same fold).
  */
object VectorFunctions {

  /** Cast array<float> -> array<double> once, up front (native Cast —
    * codegen'd, unlike a transform lambda). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd dot product (see [[expressions.ArrayDot]]); same
    * strict left-to-right fold as the interpreted form it replaces. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(expressions.ArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Max vector dimensionality the precomputed hyperplanes cover. */
  private val MaxPlaneDims = 1024

  /** ±1 hyperplane coefficients for plane p over dims 1..MaxPlaneDims,
    * derived from md5("p:d") — +1 iff the first md5 hex nibble is >= 8 —
    * exactly the derivation the previous per-row expression used (and the
    * one the DuckDB oracle reproduces), but evaluated ONCE on the driver
    * and shipped as a literal array. Every engine/executor still sees
    * identical hyperplanes with no random state to broadcast, and the
    * per-row cost drops from (dims × planes) md5 calls to a single
    * codegen'd dot product. */
  private val planeCoefs =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Double]]
  private def coefs(plane: Int): Array[Double] =
    planeCoefs.getOrElseUpdate(plane, {
      val md = java.security.MessageDigest.getInstance("MD5")
      (1 to MaxPlaneDims).map { d =>
        md.reset()
        val h = md.digest(s"$plane:$d".getBytes("UTF-8"))
        // first hex nibble >= '8' — in hex chars '8'..'9','a'..'f' all
        // compare >= "8", i.e. the high bit of the first byte is set
        if ((h(0) & 0x80) != 0) 1.0 else -1.0
      }.toArray
    })

  /** Signed-random-projection value of `vec` (double array, up to
    * MaxPlaneDims dims) onto plane p: a pure dot product against the
    * precomputed ±1 coefficients, sliced to the vector's length so the
    * strict left-to-right fold matches the previous per-row form
    * bit for bit. */
  def srpProjection(vec: Column, plane: Int): Column =
    dot(vec, slice(lit(coefs(plane)), lit(1), size(vec)))

  /** LSH bucket id in [0, 2^planes): bit p set iff projection on plane p is
    * positive. The scale path for ANN — one narrow pass to bucket, then a
    * shuffle/join on the bucket id instead of an all-pairs cross join. */
  def srpBucket(vec: Column, planes: Int): Column =
    (0 until planes).map { p =>
      when(srpProjection(vec, p) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Johnson-Lindenstrauss random projection to `outDims` dimensions using
    * the same deterministic md5 ±1 hyperplanes as [[srpProjection]], scaled
    * by 1/sqrt(outDims) so expected squared norms are preserved (Achlioptas
    * 2003 sign-matrix construction). The embedding-pipeline dimensionality
    * reducer: one narrow pass, no trained state, no broadcast matrix —
    * every engine/executor reproduces the identical projection. */
  def jlProject(vec: Column, outDims: Int): Column = {
    require(outDims >= 1, "outDims >= 1")
    val s = math.sqrt(outDims.toDouble)
    array((0 until outDims).map(p => srpProjection(vec, p) / lit(s)): _*)
  }

  /** Symmetric int8 quantization scale: max|x| / 127. At 100 TB an
    * embedding store is usually the largest single asset — int8 cuts it 4x
    * against float32 (8x vs double) with ~1e-3 cosine loss. max is
    * order-independent, so the scale is deterministic on any partitioning. */
  def quantScale(v: Column): Column =
    aggregate(v, lit(0.0), (a, x) => greatest(a, abs(x))) / lit(127.0)

  /** Quantize to integers in [-127, 127]: floor(x/scale + 0.5) — explicit
    * floor-based half-up rounding because engines disagree on native
    * round() halves (the repo-wide fround rule). An all-zero vector has
    * scale 0; guarding it to all-zero output (instead of 0/0 = NaN, which
    * Spark's floor would then silently turn into 0 while other engines
    * propagate NaN) keeps the result sane and engine-identical. */
  def quantizeInt8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0.0)))
      .otherwise(transform(v, x => floor(x / scale + lit(0.5))))

  /** Reconstruct doubles from quantized values (q * scale). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x * scale)
}

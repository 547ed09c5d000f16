package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DataType, LongType}

/** HyperLogLog distinct-count sketch as a TypedImperativeAggregate — the
  * mutable-buffer custom-aggregate API (SURVEY.md §4's flagged stretch
  * goal; Spark's own approx_count_distinct is the same shape).
  *
  * Deterministic by construction: values hash through XxHash64 with a fixed
  * seed and registers keep per-bucket maxima, so the estimate is identical
  * under any partitioning, task order, or retry — unlike sampling-based
  * sketches there is no run-to-run jitter to reconcile across engines.
  *
  * Buffer = 2^precision byte registers; merge = element-wise max (the
  * property that makes it a one-pass, shuffle-light distributed aggregate:
  * each partition ships 2^p bytes regardless of row count).
  */
case class HyperLogLog(
    child: Expression,
    precision: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(precision >= 4 && precision <= 16, "precision in [4,16]")
  private val m = 1 << precision

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XxHash64Function.hash(v, child.dataType, 42L)
      val bucket = (h >>> (64 - precision)).toInt
      val rest = h << precision
      val rank = (if (rest == 0) 64 - precision
        else java.lang.Long.numberOfLeadingZeros(rest)) + 1
      if (rank > (buf(bucket) & 0xff)) buf(bucket) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      sum += math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HyperLogLog =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") sketch as a
  * TypedImperativeAggregate — the bounded-memory distributed answer to
  * "what are the hot keys?" that an exact groupBy-count can't give on a
  * high-cardinality column without materializing every key.
  *
  * The summary keeps at most `capacity` counters. The classic guarantees
  * (Misra & Gries 1982; merge bound per Agarwal et al., "Mergeable
  * Summaries") hold under ANY merge order — the property that makes the
  * sketch safe as a distributed aggregate where partition count and merge
  * topology are scheduler-chosen:
  *
  *  - every reported count is an UNDERESTIMATE of the true count,
  *  - by at most N / (capacity + 1) (N = total rows aggregated),
  *  - every key with true count > N / (capacity + 1) is present.
  *
  * Individual estimates may vary with merge order inside that band, so the
  * oracle contract is the bound, not the exact counts — except when
  * `capacity` >= the column's distinct count, where no counter is ever
  * evicted and the sketch IS the exact count table (deterministic on any
  * partitioning; that mode is what the q44 oracle pins down).
  *
  * Buffer = hash map of key -> counter; merge = counter sum followed by a
  * shrink back to `capacity` (subtract the (capacity+1)-th largest count,
  * drop non-positives). Each partition ships at most `capacity` entries
  * regardless of row count.
  */
case class MisraGries(
    child: Expression,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1 && capacity <= 100000, "capacity in [1, 100000]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1
        case None if buf.size < capacity => buf(key) = 1L
        case None =>
          // decrement-all step: O(capacity), amortized O(1) per eviction
          val dead = mutable.ArrayBuffer.empty[String]
          buf.keysIterator.foreach { k =>
            val nc = buf(k) - 1
            if (nc <= 0) dead += k else buf(k) = nc
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, v) => a(k) = a.getOrElse(k, 0L) + v }
    if (a.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone; keys
      // strictly above it (at most `capacity` of them) survive
      val t = a.values.toArray.sortBy(-_).apply(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      a.keysIterator.foreach { k =>
        val nc = a(k) - t
        if (nc <= 0) dead += k else a(k) = nc
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // deterministic key order in the rendered map
    val entries = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(_._2: Any))
  }

  // length-prefixed UTF-8 bytes, NOT writeUTF: writeUTF caps keys at 64KB
  // and this aggregate is registered over arbitrary string columns
  // (document text can exceed that)
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

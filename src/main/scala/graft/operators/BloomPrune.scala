package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: drop non-matching rows from the BIG side of
  * a semi join before they reach the shuffle. This is the explicit,
  * sink-controllable form of Spark's own runtime row-level filtering
  * (InjectRuntimeFilter) built from the same native expressions —
  * `BloomFilterAggregate` to build the sketch, `BloomFilterMightContain`
  * (codegen'd) to probe it — never a UDF.
  *
  * Scale shape: at 100 TB the big side's shuffle dominates a semi join;
  * a bloom filter with ~1% false positives removes ~99% of non-matching
  * rows map-side, so only true matches (plus the fp tail) pay shuffle
  * I/O. The sketch is built in one aggregation over the SMALL side and
  * shipped as a literal (size set by `expectedItems`/`fpp`, e.g. ~1.2 MB
  * for 1M keys at 1%) — the exact semi join still runs afterwards, so the
  * result is EXACT; the bloom only prunes.
  */
object BloomPrune {

  /** Build a bloom filter binary over xxhash64(`keyCol`) on the driver.
    * Returns an empty array when `df` has no rows. */
  def buildBloom(
      df: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    require(expectedItems > 0, "expectedItems > 0")
    require(fpp > 0 && fpp < 1, "fpp in (0, 1)")
    // standard sizing: m = -n ln(p) / (ln 2)^2
    val numBits = math.max(64L,
      (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftColumnBridge.expression(col(keyCol)))),
      Literal(expectedItems), Literal(numBits))
    val row = df.agg(GraftColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head()
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a driver-built bloom binary. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftColumnBridge.expression(key)))))

  /** Exact left-semi join with bloom pre-pruning of the big side. The
    * bloom admits false positives only, and the semi join re-checks every
    * survivor — result is identical to `big SEMI JOIN small`. */
  def bloomPrunedSemiJoin(
      big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val bloom = buildBloom(small, smallKey, expectedItems, fpp)
    if (bloom.isEmpty) return big.limit(0)
    big.filter(mightContain(bloom, col(bigKey)))
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff / audit operator: classify every primary key as
  * `added`, `removed`, or `changed` between two versions of a table —
  * the verification step after an archival run (what did delete-back
  * actually remove? did anything mutate mid-flight?) and the general
  * change-data-capture primitive for stores without a changelog.
  *
  * One full outer join on the PK; comparison is column-by-column with
  * null-safe equality (never a rendered-string row hash, whose
  * formatting differs across engines). Unchanged keys are dropped
  * before the result materializes.
  *
  * Scale shape: a single PK-partitioned shuffle join; comparison columns
  * are pruned to `compareCols`, so shuffle bytes are bounded by the
  * audited columns, not the full row. At 100 TB, pre-bucket both
  * snapshots by PK (JoinStrategies.bucketizePair) and the join is
  * exchange-free.
  */
object TableDiff {

  def diff(before: DataFrame, after: DataFrame, pk: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compare column")
    require(!(pk +: compareCols).exists(
        Set("diff_status", "__b_present", "__a_present")),
      "diff_status/__b_present/__a_present are reserved; rename the input")
    // presence MARKERS, not pk-null tests: a row whose pk itself is NULL
    // never matches in the join (null != null) and would otherwise be
    // classified by which side's pk happened to be null rather than by
    // which side the row actually came from
    val b = before.select((pk +: compareCols).map(col): _*)
      .withColumn("__b_present", lit(true)).as("b")
    val a = after.select((pk +: compareCols).map(col): _*)
      .withColumn("__a_present", lit(true)).as("a")
    val joined = b.join(a, col(s"b.$pk") === col(s"a.$pk"), "full_outer")
    val changed: Column = compareCols
      .map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduce(_ || _)
    joined
      .withColumn("diff_status",
        when(col("__a_present").isNull, "removed")
          .when(col("__b_present").isNull, "added")
          .when(changed, "changed"))
      .filter(col("diff_status").isNotNull)
      .select(coalesce(col(s"b.$pk"), col(s"a.$pk")).as(pk),
        col("diff_status"))
  }
}

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

  /** Cheap completeness reconciliation between a source and its archive:
    * per side, ONE aggregation producing (row count, order-independent
    * XOR of a key fingerprint) — no join, no shuffle of row content, so
    * both sides cost a single scan each and the comparison row is bytes.
    * This is the fast first-line check an archiver runs after every
    * fan-out ([[diff]] is the per-key forensic follow-up when it fails).
    *
    * The fingerprint is md5 over the ':'-joined KEY columns truncated to
    * 8 hex chars — engine-portable (the tx22 discipline; never a native
    * hash(), whose value differs per engine) and XOR-combined so any
    * partitioning yields the identical checksum. Key-set completeness
    * only, by design: content drift is [[diff]]'s job.
    *
    * Output one row: (src_rows, dst_rows, src_xor, dst_xor, rows_match,
    * checksum_match). */
  def reconcile(src: DataFrame, dst: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    def side(df: DataFrame, name: String): DataFrame =
      df.select(conv(substring(md5(concat_ws(":",
          keyCols.map(c => col(c).cast("string")): _*)), 1, 8), 16, 10)
          .cast("long").as("h"))
        .agg(count(lit(1)).as(s"${name}_rows"),
          coalesce(bit_xor(col("h")), lit(0L)).as(s"${name}_xor"))
    side(src, "src").crossJoin(broadcast(side(dst, "dst")))
      .select(col("src_rows"), col("dst_rows"), col("src_xor"),
        col("dst_xor"),
        (col("src_rows") === col("dst_rows")).as("rows_match"),
        (col("src_xor") === col("dst_xor")).as("checksum_match"))
  }

  /** Tamper-evident hash-chained archival manifest — [[reconcile]]'s
    * per-batch sibling with an ORDER guarantee: each bucket (archival
    * day/batch) gets the usual order-free XOR content fingerprint, and
    * the buckets then chain like a ledger,
    *
    *   chain(d) = md5(chain(d-1) || ':' || bucket || ':' || n_rows
    *              || ':' || fp_xor),     chain(before first) = ''
    *
    * so silently EDITING, DROPPING or REORDERING any historical batch
    * changes every later chain hash (reconcile alone certifies one
    * snapshot; the chain certifies the whole history against a single
    * stored head hash). The verification a regulated archive runs
    * before trusting delete-back.
    *
    * Scale: one map-side-combined bucket aggregation over fact rows
    * (the only data-sized work — shuffle keys are day strings), then
    * the sequential chain folds over the CALENDAR-sized bucket list on
    * one row, the house bounded-fold discipline (cf. Survival /
    * TimeSeries). Output: (bucket, n_rows, fp_xor, chain_hash), one
    * row per bucket, ascending. */
  def chainManifest(df: DataFrame, bucketCol: Column,
      keyCols: Seq[String]): DataFrame =
    chainFromDaily(dayFingerprints(df, bucketCol, keyCols))

  /** The per-bucket half of [[chainManifest]]: (bucket, n_rows, fp_xor).
    * CLOSED under [[foldDailyFingerprints]] — counts sum and XORs of
    * disjoint row sets compose — so a streaming ingest can maintain
    * these incrementally (st16) and the folded state is bit-equal to
    * fingerprinting the whole corpus at once. */
  def dayFingerprints(df: DataFrame, bucketCol: Column,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    df.select(bucketCol.cast("string").as("bucket"),
        conv(substring(md5(concat_ws(":",
          keyCols.map(c => col(c).cast("string")): _*)), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(bit_xor(col("h")), lit(0L)).as("fp_xor"))
  }

  /** Fold partial per-bucket fingerprints (from disjoint row subsets)
    * into one frame per bucket: counts add, XORs compose. */
  def foldDailyFingerprints(daily: DataFrame): DataFrame =
    daily.groupBy("bucket")
      .agg(sum(col("n_rows")).as("n_rows"),
        coalesce(bit_xor(col("fp_xor")), lit(0L)).as("fp_xor"))

  /** The chain half of [[chainManifest]] over a (bucket, n_rows,
    * fp_xor) frame. */
  def chainFromDaily(daily: DataFrame): DataFrame = {
    daily
      .agg(sort_array(collect_list(
        struct(col("bucket"), col("n_rows"), col("fp_xor")))).as("days"))
      .select(explode(expr(
        """aggregate(days,
          |  named_struct('prev', '', 'out', cast(array() as
          |    array<struct<bucket: string, n_rows: bigint,
          |      fp_xor: bigint, chain: string>>)),
          |  (acc, d) -> named_struct(
          |    'prev', md5(concat(acc.prev, ':', d.bucket, ':',
          |      cast(d.n_rows as string), ':', cast(d.fp_xor as string))),
          |    'out', array_append(acc.out, named_struct(
          |      'bucket', d.bucket, 'n_rows', d.n_rows,
          |      'fp_xor', d.fp_xor,
          |      'chain', md5(concat(acc.prev, ':', d.bucket, ':',
          |        cast(d.n_rows as string), ':',
          |        cast(d.fp_xor as string)))))),
          |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("r.bucket").as("bucket"), col("r.n_rows").as("n_rows"),
        col("r.fp_xor").as("fp_xor"), col("r.chain").as("chain_hash"))
  }
}

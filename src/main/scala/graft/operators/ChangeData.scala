package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog application — reconcile a keyed snapshot with a stream of
  * insert/update/delete operations.
  *
  * The reference archives by *moving* rows and re-running idempotently
  * (`/root/reference/osarchiver/destination/db.py:129-179` upserts, D1
  * deletes back); the general form of that contract is "apply a changelog
  * to a table": per primary key, the operation with the highest sequence
  * number wins — `D` removes the row, `I`/`U` upsert the payload over the
  * existing row, untouched snapshot keys pass through. This is the MERGE
  * INTO shape every CDC-fed lakehouse table needs and it subsumes the
  * reference's upsert + delete-back pair into one operator.
  *
  * Scale: resolving the winning op is `groupBy(pk).agg(max_by(...))` —
  * ONE shuffle with map-side partial aggregation (no window, no sort of
  * the full changelog; max_by merges pairwise so a key with millions of
  * ops still reduces locally). Reconciliation is a single full-outer
  * shuffle join on the pk. Both hash-partition on the same key, so AQE
  * can reuse the exchange; nothing is collected to the driver and no
  * state grows with history — only with *distinct touched keys*.
  */
object ChangeData {

  /** Apply `changelog` to `snapshot`.
    *
    * @param snapshot  current table state; must contain `pk`
    * @param changelog rows of (pk, seqCol, opCol, payload columns...);
    *                  payload columns REPLACE same-named snapshot columns
    *                  for the winning I/U op; snapshot-only columns are
    *                  carried through (NULL for fresh inserts)
    * @param pk        primary-key column name
    * @param seqCol    monotone sequence (log position); ties broken by
    *                  op descending (deterministic, D wins over U/I at
    *                  the same position — the conservative read)
    * @param opCol     operation column with values 'I' | 'U' | 'D'
    */
  def applyChangelog(snapshot: DataFrame, changelog: DataFrame, pk: String,
      seqCol: String, opCol: String): DataFrame = {
    val payloadCols =
      changelog.columns.filter(c => c != pk && c != seqCol && c != opCol)
    val snapOnly = snapshot.columns.filter(c => c != pk &&
      !payloadCols.contains(c))

    // winning op per key: ONE aggregation, map-side combinable
    val opRank = when(col(opCol) === "D", 2)
      .when(col(opCol) === "U", 1).otherwise(0)
    val latest = changelog.groupBy(col(pk))
      .agg(max_by(
        struct((col(opCol) +: payloadCols.map(col)): _*),
        struct(col(seqCol), opRank)).as("w"))
      .select(col(pk), col("w.*"))

    val joined = snapshot.as("s").join(latest.as("c"),
      snapshot(pk) === latest(pk), "full_outer")

    val touched = col(s"c.$opCol").isNotNull
    val outCols: Seq[Column] =
      coalesce(col(s"c.$pk"), col(s"s.$pk")).as(pk) +:
      (snapOnly.map(c => col(s"s.$c").as(c)) ++
        payloadCols.map(c =>
          if (snapshot.columns.contains(c))
            when(touched, col(s"c.$c")).otherwise(col(s"s.$c")).as(c)
          else col(s"c.$c").as(c)))

    joined
      .filter(!touched || col(s"c.$opCol") =!= "D") // latest D → row gone
      .select(outCols: _*)
  }

  /** Versioned state merge — the INCREMENTAL form of [[applyChangelog]].
    *
    * State and changelog share one schema (pk, seqCol, opCol, payload…);
    * the new state is simply the winning op per key over `state ∪ batch`.
    * Deletes are retained as TOMBSTONES (op = 'D' rows with their seq):
    * without them a late-arriving lower-seq update would resurrect a
    * deleted key, and incremental apply would diverge from batch apply.
    * Because "latest op per key" is associative and commutative over
    * batches, folding ANY partition of the changelog through this
    * function — in ANY batch order — yields the state of one global
    * apply. That is the property a streaming `foreachBatch` CDC sink
    * needs (micro-batch boundaries are arbitrary), and the same single
    * map-side-combinable aggregation shape as the batch form.
    */
  def applyVersioned(state: DataFrame, batch: DataFrame, pk: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload =
      state.columns.filter(c => c != pk && c != seqCol && c != opCol)
    val all = state.unionByName(batch.select(state.columns.map(col): _*))
    val opRank = when(col(opCol) === "D", 2)
      .when(col(opCol) === "U", 1).otherwise(0)
    all.groupBy(col(pk))
      .agg(max_by(
        struct((Seq(seqCol, opCol) ++ payload).map(col): _*),
        struct(col(seqCol), opRank)).as("w"))
      .select(col(pk) +: (Seq(seqCol, opCol) ++ payload)
        .map(c => col(s"w.$c").as(c)): _*)
  }

  /** The queryable snapshot of a versioned state: tombstones hidden. */
  def snapshot(state: DataFrame, opCol: String): DataFrame =
    state.filter(col(opCol) =!= "D")

  /** Drop tombstones proven unnecessary: once the ingest guarantees no
    * changelog entry with seq < `horizon` can still arrive (the CDC
    * analogue of a watermark), a 'D' row below the horizon can never be
    * out-raced by a late op and is pure storage overhead. Live rows are
    * never dropped. */
  def compactTombstones(state: DataFrame, seqCol: String, opCol: String,
      horizon: Long): DataFrame =
    state.filter(col(opCol) =!= "D" || col(seqCol) >= horizon)

  /** Incremental view maintenance of a keyed (row count, sum) rollup.
    *
    * At 100 TB the expensive thing about a materialized
    * `GROUP BY key → count, sum` is not storing it but REFRESHING it: a
    * full recompute rescans the fact table. count and sum form an abelian
    * group (every delta has an inverse), so a changelog of inserts ('I',
    * +row) and deletes ('D', -row) folds into the aggregate directly:
    * aggregate the (tiny) delta batch by key with map-side combine, then
    * one full-outer merge with the materialized aggregate on the group
    * key — cost proportional to the DELTA, the fact table is never
    * touched. Groups whose maintained count reaches zero are dropped
    * (they no longer exist in the recomputed truth). Updates arrive as
    * D(old)+I(new) pairs, the standard IVM encoding.
    *
    * The sum is maintained in DECIMAL so maintenance is EXACTLY
    * order-independent — the maintained aggregate is bit-identical to a
    * from-scratch recompute on any partitioning and any batch order
    * (a double sum would drift by merge order). Non-invertible aggregates
    * (min/max/distinct) cannot be maintained this way; they need the
    * group's full multiset or a mergeable sketch.
    *
    * `baseAgg` schema: keyCols ++ (n_rows long, sum_val decimal);
    * `delta` schema: keyCols ++ (opCol 'I'/'D', valueCol numeric).
    */
  def maintainSumCount(baseAgg: DataFrame, delta: DataFrame,
      keyCols: Seq[String], opCol: String, valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one group key")
    val sumType = baseAgg.schema("sum_val").dataType
    val sign = when(col(opCol) === "I", lit(1)).otherwise(lit(-1))
    val d = delta.groupBy(keyCols.map(col): _*)
      .agg(sum(sign.cast("long")).as("__dn"),
        sum((sign * col(valueCol)).cast(sumType)).as("__dsum"))
    baseAgg.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_val"), lit(0).cast(sumType)) +
          coalesce(col("__dsum"), lit(0).cast(sumType))).cast(sumType)
          .as("sum_val")): _*)
      .filter(col("n_rows") > 0)
  }
}

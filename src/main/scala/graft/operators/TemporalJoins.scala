package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins — as-of join and
  * banded range join — composed from existing operators so Catalyst keeps
  * full visibility (pushdown, AQE, codegen) instead of a black-box physical
  * operator. Both avoid the naive O(n·m) range-condition nested loop that a
  * direct `a.join(b, range_predicate)` plans.
  *
  * These are the two classic "custom operator" cases for an analytics
  * engine; DuckDB ships ASOF JOIN natively, which is exactly what the
  * driver oracle replays for q46.
  */
object TemporalJoins {

  /** As-of join: each left row picks up the LATEST right row (per key) with
    * `rightTs <= leftTs` — "most recent observation at or before".
    *
    * Plan: tag both sides, union, ONE shuffle on the keys, per-key sort by
    * (ts, side), and a running `last(payload, ignoreNulls)` window fills
    * every left row with the most recent right payload. This is the optimal
    * distributed as-of plan — no range explosion, no per-row binary search
    * on the driver, cost = one shuffle of |L|+|R| narrow rows. At same
    * timestamp the right row sorts first, so the match is inclusive
    * (`>=`), mirroring DuckDB's ASOF semantics.
    *
    * The right payload travels as ONE struct column: a right row whose
    * individual fields are null still counts as a match (the struct itself
    * is non-null), so null data fields cannot splice values from two
    * different right rows.
    *
    * Caller contract: (keys, rightTs) should be unique on the right side
    * (pre-aggregate if not) — as-of is only well-defined against a
    * deduplicated series. Left columns pass through unchanged; right
    * payload columns arrive as `asof_<name>`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String]): DataFrame = {
    val payload = struct(rightCols.map(col): _*)
    val payloadType = right.select(payload.as("p")).schema("p").dataType
    val leftCols = left.columns

    val rSide = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side"), payload.as("__payload")) ++
        leftCols.filterNot(keys.contains).map { c =>
          lit(null).cast(left.schema(c).dataType).as(c)
        }: _*)
    val lSide = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side"),
          lit(null).cast(payloadType).as("__payload")) ++
        leftCols.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)
  }

  /** Banded range join: all (left, right) pairs sharing `keys` with
    * `leftTs <= rightTs <= leftTs + maxGapSeconds`.
    *
    * Plan: quantize time into `maxGapSeconds`-wide buckets; a qualifying
    * right row can only sit in the left row's bucket or the next one, so
    * the left side duplicates into two (key, bucket) tags and the range
    * predicate becomes an EQUI-join plus a residual filter — one shuffle,
    * 2·|L|+|R| rows, versus the nested-loop a raw range predicate plans.
    * Each pair matches exactly one tag, so no dedup pass is needed. At
    * 100 TB, skewed keys get finer buckets + salting on the same shape.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      maxGapSeconds: Long): DataFrame = {
    def bucket(ts: String): Column = floor(col(ts).cast("long") / maxGapSeconds)
    val l = left.withColumn("__b", explode(array(bucket(leftTs), bucket(leftTs) + 1)))
    val r = right.withColumn("__b", bucket(rightTs))
    l.join(r, keys :+ "__b")
      .filter(col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxGapSeconds SECONDS"))
      .drop("__b")
  }

  /** q46: funnel attribution — every purchase joined as-of to the most
    * recent prior (or simultaneous) `view` event of the same user. The view
    * series is deduplicated per (user, ts) first (as-of contract). */
  def purchaseAttribution(t: Tables): DataFrame = {
    val views = t.events
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(
        max(col("event_id")).as("view_event_id"),
        expr("max_by(value, event_id)").as("view_value"))
      .withColumn("view_ts", col("ts"))
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("view_event_id", "view_value", "view_ts"))
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        round(col("value"), 2).as("value"),
        col("asof_view_event_id").as("view_event_id"),
        round(col("asof_view_value"), 2).as("view_value"),
        (unix_micros(col("ts")) - unix_micros(col("asof_view_ts"))).as("view_gap_us"))
      .orderBy(col("event_id"))
  }

  /** q47: event bursts — pairs of distinct events by the same user within
    * `gapSeconds` of each other (forward-looking), via the banded range
    * join. */
  def eventPairsWithin(t: Tables, gapSeconds: Long = 600): DataFrame = {
    val a = t.events.select(
      col("user_id"), col("event_id").as("event_a"), col("ts").as("ts_a"))
    val b = t.events.select(
      col("user_id"), col("event_id").as("event_b"), col("ts").as("ts_b"))
    rangeJoin(a, b, Seq("user_id"), "ts_a", "ts_b", gapSeconds)
      .filter(col("event_a") =!= col("event_b"))
      .select(
        col("user_id"), col("event_a"), col("event_b"),
        (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("gap_us"))
      .orderBy(col("user_id"), col("event_a"), col("event_b"))
  }
}

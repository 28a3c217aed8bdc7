package graft.sources

import graft.core.Tables
import graft.functions.ZOrder
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout clustering for the write path.
  *
  * The lakehouse tables are partitioned by one time dimension (reference
  * `nyc_taxi_to_iceberg.py:40-71` partitions by pickup date); queries that
  * filter on a SECOND dimension (zone, user, vendor) scan every file of
  * every matching day. Writing each partition's rows in z-order
  * ([[ZOrder]]) makes per-file min/max ranges tight in both dimensions, so
  * the parquet reader's row-group statistics skip most of the data for
  * either predicate — the `OPTIMIZE ZORDER BY` half of a table-format
  * compaction, as a plain Spark write.
  *
  * Scale shape: one range exchange on the z-value (sampled range
  * partitioner, no skew pileup on hot dimension values) + an in-partition
  * sort — the same cost as the linear `orderBy` the naive layout pays,
  * with locality in every clustered dimension instead of one.
  */
object Layout {

  /** Returns `df` re-clustered into `files` range partitions along the
    * z-curve over two numeric dimensions, each min-max scaled onto the
    * full 16-bit range from a broadcast 1-row bounds frame (domains come
    * from the DATA — a hardcoded domain clamps everything beyond it into
    * one boundary cell at the next scale-up, collapsing that dimension of
    * the curve). The shared kernel behind [[writeZOrdered]],
    * [[TableIO.saveZOrdered]], and [[TableIO.compactTableZOrdered]];
    * helper columns drive the partitioning and in-file sort but are not
    * in the output. Empty input degrades to an empty result (the bounds
    * row is all-null, the cross join of nothing is nothing). */
  def clusterZOrdered(df: DataFrame, x: Column, y: Column, files: Int): DataFrame = {
    val bounds = df.agg(
      min(x).cast("long").as("_lox"), (max(x).cast("long") + 1L).as("_hix"),
      min(y).cast("long").as("_loy"), (max(y).cast("long") + 1L).as("_hiy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("_z", ZOrder.zValue(
        ZOrder.scaleTo16(x, col("_lox"), col("_hix")),
        ZOrder.scaleTo16(y, col("_loy"), col("_hiy"))))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z", "_lox", "_hix", "_loy", "_hiy")
  }

  /** Writes `df` as `files` parquet files clustered on the z-curve over
    * two numeric dimensions (domains derived from the data — see
    * [[clusterZOrdered]]). */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String, files: Int): Unit =
    clusterZOrdered(df, x, y, files)
      .write.mode("overwrite").parquet(path)

  /** q113: the z-curve assignment itself, over the events stream's two
    * query dimensions (hour index × user) — the deterministic layout key a
    * compaction job would cluster on, exposed as a query so the bit
    * interleave is oracle-checked end to end. */
  def zOrderPreview(t: Tables): DataFrame = {
    // hours since 2024-01-01 00:00 UTC (epoch hour 473352). Dimension
    // domains come from the DATA (a compaction job reads them from
    // partition stats): a hardcoded domain that fit one scale factor
    // would clamp everything beyond it into a single boundary cell at the
    // next — collapsing that dimension of the curve entirely. Both dims
    // then scale onto the full 16-bit range so the curve splits them
    // equally (see [[ZOrder.scaleTo16]]).
    val hourIdx = floor(unix_timestamp(col("ts")) / 3600L).cast("long") - 473352L
    val ev = t.events.select(col("event_id"), hourIdx.as("hour_idx"), col("user_id"))
    val bounds = ev.agg(
      min(col("hour_idx")).as("lo_h"), (max(col("hour_idx")) + 1L).as("hi_h"),
      min(col("user_id")).as("lo_u"), (max(col("user_id")) + 1L).as("hi_u"))
    ev.crossJoin(broadcast(bounds))
      .select(
        col("event_id"),
        col("hour_idx"),
        col("user_id"),
        ZOrder.zValue(
          ZOrder.scaleTo16(col("hour_idx"), col("lo_h"), col("hi_h")),
          ZOrder.scaleTo16(col("user_id"), col("lo_u"), col("hi_u"))).as("zvalue"))
      .orderBy(col("event_id"))
  }

  /** The DuckDB mirror of [[zOrderPreview]]. */
  val zOrderPreviewSql: String = {
    val h = "(CAST(floor(epoch(ts) / 3600) AS BIGINT) - 473352)"
    val hs = ZOrder.scaleTo16Sql("hour_idx", "lo_h", "hi_h")
    val us = ZOrder.scaleTo16Sql("user_id", "lo_u", "hi_u")
    s"""WITH e AS (
       |  SELECT event_id, $h AS hour_idx, user_id FROM events),
       |b AS (
       |  SELECT min(hour_idx) AS lo_h, max(hour_idx) + 1 AS hi_h,
       |   min(user_id) AS lo_u, max(user_id) + 1 AS hi_u
       |  FROM e)
       |SELECT event_id, hour_idx, user_id,
       | ${ZOrder.zValueSql(hs, us)} AS zvalue
       |FROM e, b
       |ORDER BY event_id""".stripMargin
  }
}

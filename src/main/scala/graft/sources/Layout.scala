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

  /** Writes `df` as `files` parquet files clustered on the z-curve over two
    * binned dimensions (callers bin to [0, 65536) — see [[ZOrder]]). The
    * helper z-value column drives the range partitioning and in-file sort
    * but is not written. */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String, files: Int): Unit =
    df.withColumn("_z", ZOrder.zValue(x, y))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
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

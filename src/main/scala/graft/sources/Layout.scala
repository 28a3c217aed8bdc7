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
    // hours since 2024-01-01 00:00 UTC (epoch hour 473352) — the events
    // fixture spans one month, so this bins to [0, 720); both dimensions
    // are scaled onto the full 16-bit range so the curve splits them
    // equally (see [[ZOrder.scaleTo16]])
    val hourIdx = floor(unix_timestamp(col("ts")) / 3600L).cast("long") - 473352L
    t.events.select(
      col("event_id"),
      hourIdx.as("hour_idx"),
      col("user_id"),
      ZOrder.zValue(
        ZOrder.scaleTo16(hourIdx, 0L, 720L),
        ZOrder.scaleTo16(col("user_id"), 0L, 150L)).as("zvalue"))
      .orderBy(col("event_id"))
  }

  /** The DuckDB mirror of [[zOrderPreview]]. */
  val zOrderPreviewSql: String = {
    val h = "(CAST(floor(epoch(ts) / 3600) AS BIGINT) - 473352)"
    val hs = ZOrder.scaleTo16Sql(h, 0L, 720L)
    val us = ZOrder.scaleTo16Sql("user_id", 0L, 150L)
    s"""SELECT event_id, $h AS hour_idx, user_id,
       | ${ZOrder.zValueSql(hs, us)} AS zvalue
       |FROM events
       |ORDER BY event_id""".stripMargin
  }
}

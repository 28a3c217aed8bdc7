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
  def clusterZOrdered(df: DataFrame, x: Column, y: Column, files: Int): DataFrame =
    withZValue(df, x, y)
      .repartitionByRange(files, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop(zCol)

  /** Reserved helper-column name — `__graft`-prefixed so it cannot collide
    * with user columns (a bare `_z` would silently replace one). */
  private val zCol = "__graft_z"

  /** `df` plus its z-value column ([[zCol]]) over two numeric dimensions,
    * each scaled from a broadcast data-derived bounds frame — the single
    * bounds/scale/interleave assembly behind both [[clusterZOrdered]] and
    * [[zOrderPreview]] (one copy, so the bounds convention cannot diverge
    * between the write path and the oracle-checked query). */
  private def withZValue(df: DataFrame, x: Column, y: Column): DataFrame = {
    val bounds = df.agg(
      min(x).cast("long").as("__graft_lox"), (max(x).cast("long") + 1L).as("__graft_hix"),
      min(y).cast("long").as("__graft_loy"), (max(y).cast("long") + 1L).as("__graft_hiy"))
    df.crossJoin(broadcast(bounds))
      .withColumn(zCol, ZOrder.zValue(
        ZOrder.scaleTo16(x, col("__graft_lox"), col("__graft_hix")),
        ZOrder.scaleTo16(y, col("__graft_loy"), col("__graft_hiy"))))
      .drop("__graft_lox", "__graft_hix", "__graft_loy", "__graft_hiy")
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
    withZValue(ev, col("hour_idx"), col("user_id"))
      .select(col("event_id"), col("hour_idx"), col("user_id"),
        col(zCol).as("zvalue"))
      .orderBy(col("event_id"))
  }

  // ── Hilbert-curve clustering (the better-locality sibling of z-order) ──

  private val hCol = "__graft_h"

  /** `df` plus its Hilbert index ([[hCol]]) over two numeric dimensions,
    * scaled from a broadcast data-derived bounds frame — same bounds
    * convention as [[withZValue]]; the index itself is the codegen'd
    * [[graft.functions.HilbertIndex]] loop. */
  private def withHilbert(df: DataFrame, x: Column, y: Column): DataFrame = {
    graft.functions.HilbertCurve.register(df.sparkSession)
    val bounds = df.agg(
      min(x).cast("long").as("__graft_lox"), (max(x).cast("long") + 1L).as("__graft_hix"),
      min(y).cast("long").as("__graft_loy"), (max(y).cast("long") + 1L).as("__graft_hiy"))
    df.crossJoin(broadcast(bounds))
      .withColumn(hCol, graft.functions.HilbertCurve.hilbertIndex(
        ZOrder.scaleTo16(x, col("__graft_lox"), col("__graft_hix")),
        ZOrder.scaleTo16(y, col("__graft_loy"), col("__graft_hiy"))))
      .drop("__graft_lox", "__graft_hix", "__graft_loy", "__graft_hiy")
  }

  /** [[clusterZOrdered]] on the Hilbert curve: `files` range partitions
    * along the Hilbert index over two data-scaled dimensions. Same one
    * range exchange + in-partition sort; consecutive curve cells are
    * always Manhattan-adjacent, so per-file ranges are tighter than the
    * Morton curve's at quadrant boundaries. */
  def clusterHilbert(df: DataFrame, x: Column, y: Column, files: Int): DataFrame =
    withHilbert(df, x, y)
      .repartitionByRange(files, col(hCol))
      .sortWithinPartitions(col(hCol))
      .drop(hCol)

  /** q145: the Hilbert index assignment over the same two events
    * dimensions as [[zOrderPreview]] — oracle-checked end to end against
    * the 16-stage CTE replay of the rotate/reflect loop. */
  def hilbertPreview(t: Tables): DataFrame = {
    val hourIdx = floor(unix_timestamp(col("ts")) / 3600L).cast("long") - 473352L
    val ev = t.events.select(col("event_id"), hourIdx.as("hour_idx"), col("user_id"))
    withHilbert(ev, col("hour_idx"), col("user_id"))
      .select(col("event_id"), col("hour_idx"), col("user_id"),
        col(hCol).as("hvalue"))
      .orderBy(col("event_id"))
  }

  /** The DuckDB mirror of [[hilbertPreview]]. */
  val hilbertPreviewSql: String = {
    val h = "(CAST(floor(epoch(ts) / 3600) AS BIGINT) - 473352)"
    val hs = ZOrder.scaleTo16Sql("hour_idx", "lo_h", "hi_h")
    val us = ZOrder.scaleTo16Sql("user_id", "lo_u", "hi_u")
    s"""WITH e AS (
       |  SELECT event_id, $h AS hour_idx, user_id FROM events),
       |b AS (
       |  SELECT min(hour_idx) AS lo_h, max(hour_idx) + 1 AS hi_h,
       |   min(user_id) AS lo_u, max(user_id) + 1 AS hi_u
       |  FROM e),
       |scaled AS (
       |  SELECT event_id, hour_idx, user_id,
       |    $hs AS x, $us AS y
       |  FROM e, b),
       |${graft.functions.HilbertCurve.chainSql("scaled", "event_id, hour_idx, user_id")}
       |SELECT event_id, hour_idx, user_id, CAST(d AS BIGINT) AS hvalue
       |FROM h16
       |ORDER BY event_id""".stripMargin
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

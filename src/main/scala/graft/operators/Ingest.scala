package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-ETL operator shapes (reference `nyc_taxi_to_iceberg.py`):
  * rename → quality-filter → derive partition columns → project
  * (P1–P4, S1, S7), and the `daily_summary` CTAS aggregate
  * (`nyc_taxi_to_iceberg.py:164-184`), re-expressed over the testdata fact
  * table `lineitem`.
  *
  * Scale notes: the clean pipeline is a single narrow stage — scan → filter
  * → project with zero shuffles; the filters and the column list are pushed
  * into the parquet scan by Catalyst (`PushedFilters`, `ReadSchema`). The
  * derived `year/month/day` columns are the explicit partition columns that
  * replace Iceberg's hidden transforms (SURVEY §7) — at 100 TB the write
  * side partitions on them so later date-ranged queries prune files.
  */
object Ingest {

  /** P1-P4 + P2/P3: quality-filtered, renamed, partition-column-derived
    * fact rows (reference `nyc_taxi_to_iceberg.py:90-136`). */
  def cleanFact(t: Tables): DataFrame =
    t.lineitem
      // quality filters (analog of not-null / positive-amount rules,
      // `nyc_taxi_to_iceberg.py:90-96`); pushed into the parquet scan
      .filter(
        col("l_shipdate").isNotNull &&
          col("l_quantity") > 0 &&
          col("l_extendedprice") > 0 &&
          col("l_linenumber").between(1, 7))
      // renames (P1) + derived partition cols (P3) + projection (P2)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_number"),
        col("l_partkey").as("part_id"),
        col("l_suppkey").as("supplier_id"),
        col("l_quantity").as("quantity"),
        col("l_extendedprice").as("extended_price"),
        col("l_discount").as("discount"),
        col("l_returnflag").as("return_flag"),
        col("l_linestatus").as("line_status"),
        to_date(col("l_shipdate")).as("ship_date"),
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        dayofmonth(col("l_shipdate")).as("day"))

  /** The `daily_summary` CTAS SELECT (`nyc_taxi_to_iceberg.py:164-184`):
    * monthly rollup with counts, sums, avgs, distinct keys, sorted for the
    * report (O4). SEMANTIC REFERENCE form: two `count(DISTINCT …)` in one
    * aggregate plan an Expand that replicates every fact row 3× — the
    * production path (q03) is [[dailySummaryBitmap]], which computes the
    * identical exact output in one pass; equality between the two forms is
    * pinned in BitmapDistinctSpec. */
  def dailySummary(t: Tables): DataFrame = {
    import graft.functions.ExactAgg._
    cleanFact(t)
      .groupBy(col("year"), col("month"))
      .agg(
        count(lit(1)).as("total_rows"),
        dsum(col("quantity")).as("sum_quantity"),
        dsumRevenue(col("extended_price"), col("discount")).as("total_revenue"),
        davg(col("extended_price")).as("avg_price"),
        countDistinct(col("part_id")).as("distinct_parts"),
        countDistinct(col("order_id")).as("distinct_orders"))
      .orderBy(col("year").desc, col("month").desc)
  }

  /** [[dailySummary]] with the SAME exact results in ONE pass: two or more
    * `count(DISTINCT …)` in one aggregate make Spark plan an Expand that
    * replicates every input row once per distinct column (the 3× row
    * multiplication that dominates q03's cost); the Roaring-style
    * [[graft.functions.BitmapDistinct]] aggregate keeps exact distinct
    * counts mergeable, so the plan is a plain single-shuffle hash
    * aggregate whose partials carry compressed bitmaps instead of
    * replicated rows. Identical output — shares q03's oracle SQL. This IS
    * the production q03 path (promoted round 3: 1.2 s vs the Expand form's
    * 4.7 s at sf0.1). */
  def dailySummaryBitmap(t: Tables): DataFrame = {
    import graft.functions.{BitmapDistinct, ExactAgg}
    import ExactAgg._
    BitmapDistinct.register(t.spark)
    cleanFact(t)
      .groupBy(col("year"), col("month"))
      .agg(
        count(lit(1)).as("total_rows"),
        dsum(col("quantity")).as("sum_quantity"),
        dsumRevenue(col("extended_price"), col("discount")).as("total_revenue"),
        davg(col("extended_price")).as("avg_price"),
        BitmapDistinct.bitmapDistinct(col("part_id")).as("distinct_parts"),
        BitmapDistinct.bitmapDistinct(col("order_id")).as("distinct_orders"))
      .orderBy(col("year").desc, col("month").desc)
  }
}

package graft.operators

import graft.sources.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance — partition-scoped recompute.
  *
  * The 100 TB problem: an aggregate view (the daily summary, the zone
  * rollup) is derived from a partitioned fact table; a day's delta lands
  * and the naive refresh recomputes the WHOLE view from the whole fact —
  * hours of work to update a handful of groups. Because the reference's
  * views all group by their fact's partition keys (year/month — the Iceberg
  * `(year, month)` spec; `days(window_start)` for realtime), every delta
  * row affects exactly one view partition, so the minimal correct refresh
  * is: find the partitions the delta touches, recompute ONLY those from
  * base data scoped to them, dynamic-partition-overwrite them into the
  * view. Untouched partitions keep their files byte-for-byte.
  *
  * This is the partition-aligned special case of view maintenance — no
  * retractions, no state; distinct counts and percentiles work because the
  * affected partitions are recomputed from base data, not merged from
  * stored partials (which exact distincts would forbid).
  */
object Incremental {

  /** Refresh `viewTable` after `delta` arrived in `fact`.
    *
    * @param fact     the post-append base data (delta already landed in it)
    * @param delta    the newly arrived rows only
    * @param partCols grouping/partition columns present in both frames —
    *                 must be the view table's partition spec
    * @param aggOf    the view definition (fact → aggregate)
    * @return the affected-partition count (what the refresh cost tracked,
    *         for observability)
    */
  def refreshAggregate(
      spark: SparkSession,
      viewTable: String,
      fact: DataFrame,
      delta: DataFrame,
      partCols: Seq[String],
      aggOf: DataFrame => DataFrame): Long = {
    val affected = delta.select(partCols.map(col): _*).distinct()
      .localCheckpoint() // two consumers (scope join + count); tiny
    // the broadcast semi join scopes the base scan: with partition-column
    // keys this is dynamic partition pruning — untouched partitions' files
    // are never read, so refresh cost tracks the delta, not the fact
    val scoped = fact.join(broadcast(affected), partCols, "left_semi")
    TableIO.refreshPartitions(spark, viewTable, aggOf(scoped))
    affected.count()
  }

  /** q152: [[refreshAggregate]] under the hash gate — incremental view
    * maintenance proven ≡ full recompute. The view is the daily summary
    * (day × event_type exact counts/sums, the reference's
    * `daily_trip_summary` shape, `comprehensive_analytics.py:41-128`);
    * the demo builds it STALE (last day's facts withheld), lands the
    * delta, runs the partition-scoped refresh, and returns the read-back
    * table. The oracle recomputes the summary from the full fact in one
    * pass — so a hash match proves the incremental path converged to
    * exactly the from-scratch answer, including the untouched partitions
    * (whose files were never rewritten).
    *
    * The cutoff comes from a 1-row max aggregate (bounded collect, the
    * suite's scalar-driver convention). Day rides as a string from the
    * start so the partition column round-trips the catalog with a stable
    * type. */
  def viewRefreshDemo(t: graft.core.Tables): DataFrame = {
    val spark = t.spark
    val table = s"graft_ivm_demo_${(t.dir.hashCode & 0x7fffffff).toHexString}"
    TableIO.dropTableAndLocation(spark, table)
    val fact = t.events.select(
      date_format(col("ts"), "yyyy-MM-dd").as("day"),
      col("event_type"), col("value"))
    val aggOf: DataFrame => DataFrame = df =>
      df.groupBy(col("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(graft.functions.ExactAgg.dsum(col("value")), 6)
            .as("sum_value"))
    val cutoff = fact.agg(max(col("day"))).head.getString(0)
    aggOf(fact.filter(col("day") < cutoff))
      .write.format("parquet").partitionBy("day").saveAsTable(table)
    refreshAggregate(spark, table,
      fact, fact.filter(col("day") >= cutoff), Seq("day"), aggOf)
    spark.table(table)
      .select(col("day"), col("event_type"), col("n_events"),
        col("sum_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** DuckDB mirror of [[viewRefreshDemo]] — the FULL recompute the
    * incremental refresh must equal. */
  def viewRefreshDemoSql: String = {
    val O = graft.functions.ExactAgg.Sql
    s"""SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       | count(*) AS n_events,
       | round(${O.dsum("value")}, 6) AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}

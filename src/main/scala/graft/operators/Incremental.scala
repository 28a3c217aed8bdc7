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
}

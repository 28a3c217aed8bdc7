package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (SURVEY §7 hard part 6: a handful
  * of zones — JFK, Times Square — dominate the taxi feed; at 100 TB a
  * single-zone hash partition straggles or OOMs).
  *
  * AQE's skew-join handling covers joins; for aggregations the classic fix
  * is two-phase salting: group once on (key, salt) so the hot key's rows
  * spread over `salts` reducers, then re-aggregate the partial results on
  * the key alone. Works for any algebraic aggregate (sum/count/min/max —
  * anything with an associative merge).
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param partials aggregate columns for phase 1 (over raw rows)
    * @param merge    aggregate columns for phase 2 (over the partial
    *                 columns), merging partials to finals
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[Column],
      salts: Int,
      partials: Seq[Column],
      merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys: _*)
      .agg(merge.head, merge.tail: _*)

  /** Salted count-by-key — the common demand-grid shape. */
  def saltedCount(df: DataFrame, keys: Seq[Column], salts: Int = 16): DataFrame =
    saltedAggregate(
      df, keys, salts,
      partials = Seq(count(lit(1)).as("__partial_count")),
      merge = Seq(sum(col("__partial_count")).as("count")))
}

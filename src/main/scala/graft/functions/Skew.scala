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
    * Keys are aliased to stable names in phase 1 so phase 2 re-groups on
    * the phase-1 OUTPUT columns — re-applying a derived key expression
    * (e.g. `date_trunc("hour", col("ts"))`) against the aggregated frame
    * would fail to resolve (`ts` no longer exists). Simple column keys
    * keep their names; expression keys surface as `key_<i>`.
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
      merge: Seq[Column]): DataFrame = {
    val keyNames = keys.zipWithIndex.map { case (k, i) =>
      val s = k.toString
      if (s.matches("[A-Za-z_][A-Za-z0-9_]*")) s else s"key_$i"
    }
    val aliased = keys.lazyZip(keyNames).map((k, n) => k.as(n))
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(aliased :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyNames.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted count-by-key — the common demand-grid shape. */
  def saltedCount(df: DataFrame, keys: Seq[Column], salts: Int = 16): DataFrame =
    saltedAggregate(
      df, keys, salts,
      partials = Seq(count(lit(1)).as("__partial_count")),
      merge = Seq(sum(col("__partial_count")).as("count")))
}

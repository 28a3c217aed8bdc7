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

  /** Salted replicate join for skewed JOIN keys when the build side is too
    * large to broadcast (broadcast is always the first answer to a skewed
    * join; this is the second). Every fact row gets an arbitrary salt in
    * [0, salts); the build side is replicated once per salt value; the join
    * runs on (key, salt), so a hot key's rows spread across `salts` shuffle
    * partitions instead of pinning one straggler/OOM reducer. Row-for-row
    * identical to the plain join (each fact row meets exactly one replica
    * of each matching build row) for inner and left joins — right/full
    * would multiply unmatched build rows across salts and are rejected.
    * Cost: the build side shuffles `salts`× its size — the standard
    * replicate-side trade, sized by the skew factor. AQE's skew-join split
    * handles the sort-merge case adaptively; this form works under any
    * join strategy and any Spark version, and makes the mitigation
    * explicit and testable. */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}

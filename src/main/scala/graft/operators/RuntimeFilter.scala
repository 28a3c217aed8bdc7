package graft.operators

import graft.core.Tables
import graft.functions.BloomFilterSketch
import graft.functions.ExactAgg._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime-filter join pruning (sideways information passing).
  *
  * The 100 TB problem this solves: a selective dimension predicate —
  * "orders over \$450k" — should shrink the FACT scan, but a plain
  * `fact JOIN dim` only applies the dim predicate after the fact side has
  * been fully scanned and shuffled. The fix every warehouse engine ships
  * (and Spark's own `runtime.bloomFilter` rule automates for some shapes)
  * is to aggregate the dim keys into a Bloom filter, broadcast it, and
  * filter the fact rows at the scan — the shuffle then carries only
  * probable matches. The trailing exact semi join removes false positives,
  * so results are bit-identical to the unfiltered plan for ANY filter
  * sizing; the filter is purely a work mover.
  *
  * Plan shape: dim scan → [[graft.functions.BloomFilterSketch.BloomAgg]]
  * (1-row result) → broadcast nested-loop join (1×N, stays in codegen) →
  * codegen'd `graft_bloom_contains` filter → broadcast semi join (exact) →
  * one hash aggregate. The fact side is never shuffled at full width.
  */
object RuntimeFilter {

  /** q76: returns-by-flag stats over lineitems belonging to high-value
    * orders, with the lineitem scan Bloom-pruned before any join.
    *
    * The filter is injected as a SCALAR SUBQUERY — the same mechanism
    * Spark's `runtime.bloomFilter` rule uses — not as a broadcast-join
    * condition: a cross-join-with-filter form LOOKS equivalent, but the
    * optimizer is free to push the exact semi join underneath the
    * nested-loop join, at which point the probe runs after the join it was
    * meant to protect (observed; pinned in BloomFilterSpec's plan test).
    * A scalar subquery executes once before the main query and leaves the
    * probe as a plain Filter fused into the scan's codegen stage, below
    * every join.
    *
    * At this shape's scale limit the dim side no longer broadcasts for the
    * exact join — that join becomes a shuffle join, and the Bloom filter's
    * value grows: it prunes the fact rows BEFORE that shuffle. The filter
    * itself always broadcasts (16 KiB here; sizing in
    * [[graft.functions.BloomFilterSketch]] scaladoc). */
  def bloomSemiJoinStats(
      t: Tables,
      priceThreshold: Double = 450000.0,
      numBits: Int = 1 << 17,
      numHashes: Int = 5): DataFrame = {
    BloomFilterSketch.register(t.spark)
    t.orders.createOrReplaceTempView("graft_rf_orders")
    t.lineitem.createOrReplaceTempView("graft_rf_lineitem")
    val pruned = t.spark.sql(
      s"""SELECT l_returnflag, l_quantity, l_extendedprice, l_discount
         |FROM graft_rf_lineitem
         |WHERE graft_bloom_contains(
         |        (SELECT graft_bloom_agg(o_orderkey, $numBits, $numHashes)
         |         FROM graft_rf_orders WHERE o_totalprice > $priceThreshold),
         |        l_orderkey)
         |  AND l_orderkey IN (SELECT o_orderkey FROM graft_rf_orders
         |                     WHERE o_totalprice > $priceThreshold)""".stripMargin)
    pruned
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_lines"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("l_returnflag"))
  }
}

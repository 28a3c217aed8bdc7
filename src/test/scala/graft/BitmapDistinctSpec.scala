package graft

import graft.functions.BitmapDistinct
import graft.operators.Ingest
import org.apache.spark.sql.functions._

/** Exact Roaring-style bitmap distinct: equality with count(DISTINCT),
  * layout independence (serialize/merge across shuffles), array→dense
  * container conversion, and the no-Expand plan property that motivates
  * it. */
class BitmapDistinctSpec extends SparkSpec {

  test("matches count(DISTINCT) exactly per group, under any layout") {
    BitmapDistinct.register(spark)
    val t = sf()
    def run(parts: Int) = t.orders.repartition(parts)
      .groupBy(col("o_orderpriority"))
      .agg(BitmapDistinct.bitmapDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = t.orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(2) == exact)
    assert(run(17) == exact) // exercises serialize/deserialize + merge
  }

  test("array containers convert to dense past 4096 values and stay exact") {
    BitmapDistinct.register(spark)
    import spark.implicits._
    // 30k distinct values spread over one-and-a-half 64K blocks, each
    // value duplicated — forces conversion inside a block plus dedup
    val df = (0 until 60000).map(i => (i % 30000) * 3L).toDF("k")
    val got = df.repartition(7)
      .agg(BitmapDistinct.bitmapDistinct(col("k"))).collect()(0).getLong(0)
    assert(got == 30000L)
  }

  test("q55 twin: same rows as q03, but a plan with NO Expand") {
    val t = sf()
    val bitmap = Ingest.dailySummaryBitmap(t)
    val classic = Ingest.dailySummary(t)
    // identical results…
    assert(bitmap.collect().map(_.toSeq).toSeq ==
      classic.collect().map(_.toSeq).toSeq)
    // …different plans: two count(DISTINCT)s force Expand row replication,
    // the bitmap aggregate is a single plain hash aggregate
    assert(classic.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!bitmap.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("dict-encoded bitmap counts distinct STRINGS exactly, no Expand") {
    val t = sf()
    val got = graft.operators.DictEncode.distinctUsersByType(t)
    val exact = t.events
      .groupBy(col("event_type"))
      .agg(countDistinct(concat(lit("u"), col("user_id"))).as("distinct_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = got.collect()
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("distinct_users")).toMap == exact)
    // the final aggregate is a plain hash aggregate over bitmap partials
    assert(!got.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("keys beyond 2^31 (large-SF orderkeys) count exactly") {
    BitmapDistinct.register(spark)
    import spark.implicits._
    val base = 5000000000L // > 2^31
    val df = (0 until 10000).map(i => base + (i % 5000) * 7L).toDF("k")
    val got = df.repartition(5)
      .agg(BitmapDistinct.bitmapDistinct(col("k"))).collect()(0).getLong(0)
    assert(got == 5000L)
  }

  test("negative keys are rejected loudly, not silently wrapped") {
    BitmapDistinct.register(spark)
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(-1L).toDF("k").agg(BitmapDistinct.bitmapDistinct(col("k"))).collect()
    }
    assert(ex.getMessage != null)
  }
}

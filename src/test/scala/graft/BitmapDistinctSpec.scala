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

  test("state/merge round-trip: merged per-group states equal a direct distinct") {
    BitmapDistinct.register(spark)
    import spark.implicits._
    // 3 groups with overlapping key sets; merging ALL group states must
    // equal the global distinct (union loses nothing), and per-group
    // merge-of-one-state must equal the group's own distinct
    val df = (0 until 9000).map(i => (i % 3, (i % 1500) * 11L)).toDF("g", "k")
    val states = df.repartition(13)
      .groupBy(col("g"))
      .agg(
        BitmapDistinct.bitmapState(col("k")).as("bm"),
        BitmapDistinct.bitmapDistinct(col("k")).as("direct"))
    val perGroup = states
      .groupBy(col("g"))
      .agg(BitmapDistinct.bitmapMergeCount(col("bm")).as("merged"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = states.collect().map(r => r.getInt(0) -> r.getAs[Long]("direct")).toMap
    assert(perGroup == direct)
    val global = states.agg(BitmapDistinct.bitmapMergeCount(col("bm")))
      .collect()(0).getLong(0)
    assert(global == 1500L)
  }

  test("HLL state/merge twin tracks the exact cumulative curve (sketch contract)") {
    // the approximate path for q85's shape at extreme cardinalities: Spark's
    // Datasketches HLL aggregates are mergeable exactly like bitmapState /
    // bitmapMergeCount, trading exactness for fixed-size state. Contract:
    // every cumulative estimate within 10% of the exact bitmap curve here
    // (lgConfigK=12 → ~1.6% rsd; 10% absorbs corpus-shape wiggle).
    val t = sf()
    val exact = graft.operators.Analytics.cumulativeDistinctUsers(t).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("cumulative_distinct_users")).toMap
    t.events.createOrReplaceTempView("hll_events")
    val approx = spark.sql(
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, hll_sketch_agg(user_id, 12) AS sk
        |  FROM hll_events GROUP BY 1)
        |SELECT d.day,
        | hll_sketch_estimate(hll_union_agg(e.sk)) AS cum_estimate
        |FROM daily d JOIN daily e ON e.day <= d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val day = r.getDate(0).toString
      val est = r.getLong(1).toDouble
      val ex = exact(day).toDouble
      assert(math.abs(est - ex) / ex <= 0.10, s"$day: exact=$ex hll=$est")
    }
  }

  test("q85 cumulative distinct users: bitmap merge equals set-union ground truth") {
    val t = sf()
    val got = graft.operators.Analytics.cumulativeDistinctUsers(t).collect()
    // ground truth by driver-side set union over the tiny test corpus
    val byDay = t.events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .collect()
      .groupBy(_.getDate(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val days = byDay.keys.toSeq.sortBy(_.getTime)
    assert(got.map(_.getDate(0)).toSeq == days)
    var acc = Set.empty[Long]
    days.zip(got).foreach { case (day, row) =>
      acc = acc ++ byDay(day)
      assert(row.getAs[Long]("daily_distinct_users") == byDay(day).size.toLong)
      assert(row.getAs[Long]("cumulative_distinct_users") == acc.size.toLong,
        s"cumulative mismatch at $day")
    }
    // monotone non-decreasing by construction
    val cums = got.map(_.getAs[Long]("cumulative_distinct_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
  }
}

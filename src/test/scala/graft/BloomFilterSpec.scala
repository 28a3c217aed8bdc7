package graft

import graft.functions.BloomFilterSketch
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkSpec {

  test("no false negatives: every inserted key probes true") {
    import spark.implicits._
    BloomFilterSketch.register(spark)
    val keys = (0L until 5000L).map(i => i * 2654435761L % 1000003L)
    val bf = keys.toDF("k")
      .agg(BloomFilterSketch.bloomAgg(col("k")).as("bf"))
      .collect().head.getAs[Array[Byte]]("bf")
    assert(keys.forall(k => BloomFilterSketch.mightContain(bf, k)))
  }

  test("false-positive rate is near the sizing formula's bound") {
    import spark.implicits._
    BloomFilterSketch.register(spark)
    val n = 10000
    val bits = 1 << 17 // p = (1 - e^{-kn/m})^k ~ 0.45% at k=5
    val bf = (0 until n).map(_.toLong).toDF("k")
      .agg(BloomFilterSketch.bloomAgg(col("k"), bits, 5).as("bf"))
      .collect().head.getAs[Array[Byte]]("bf")
    val probes = (1000000L until 1100000L)
    val fp = probes.count(k => BloomFilterSketch.mightContain(bf, k))
    val rate = fp.toDouble / probes.size
    assert(rate < 0.02, s"false-positive rate $rate far above the ~0.5% design point")
    assert(rate > 0.0, "a zero rate at this occupancy suggests the probe is broken")
  }

  test("built filter is byte-identical under any partition layout") {
    import spark.implicits._
    BloomFilterSketch.register(spark)
    val df = (0L until 20000L).toDF("k")
    def build(parts: Int): Array[Byte] = df.repartition(parts)
      .agg(BloomFilterSketch.bloomAgg(col("k")).as("bf"))
      .collect().head.getAs[Array[Byte]]("bf")
    assert(java.util.Arrays.equals(build(1), build(13)))
    assert(java.util.Arrays.equals(build(1), build(32)))
  }

  test("q76 result is bit-identical to the unfiltered exact semi join") {
    val t = sf()
    val viaBloom = SparkEntry.queries("q76_bloom_semi_join")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq)
    val dim = t.orders.filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val li = t.lineitem
    val exact = li
      .join(dim, li("l_orderkey") === dim("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_lines"),
        graft.functions.ExactAgg.dsum(col("l_quantity")).as("sum_qty"),
        graft.functions.ExactAgg.dsumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("revenue"))
      .orderBy(col("l_returnflag"))
      .collect().map(_.toSeq)
    assert(viaBloom.toSeq == exact.toSeq)
  }

  test("the probe is a scan-side Filter below the exact join, in codegen") {
    val df = operators.RuntimeFilter.bloomSemiJoinStats(sf())
    df.collect() // finalize adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("bloommightcontain"),
      s"probe missing from plan:\n${plan.take(1200)}")
    // the cross-join formulation regressed to a nested-loop join ABOVE the
    // exact semi join (probe ran after the join it should protect); the
    // scalar-subquery form must keep the probe a plain scan-side Filter
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"probe became a join condition again:\n${plan.take(1500)}")
    val probeAt = plan.toLowerCase.indexOf("bloommightcontain")
    val semiAt = plan.indexOf("LeftSemi")
    assert(semiAt >= 0 && semiAt < probeAt,
      "probe filter is not below the exact semi join in the final plan")
    // and the probing Filter stage is codegen'd
    assert("""\*\(\d+\)""".r.findFirstIn(plan).isDefined)
  }

  test("bloom pruning actually reduces fact rows reaching the exact join") {
    val t = sf()
    BloomFilterSketch.register(spark)
    val dim = t.orders.filter(col("o_totalprice") > 450000.0).select(col("o_orderkey"))
    val bloom = dim.agg(BloomFilterSketch.bloomAgg(col("o_orderkey")).as("bf"))
    val li = t.lineitem
    val total = li.count()
    val pruned = li.join(broadcast(bloom))
      .filter(BloomFilterSketch.bloomContains(col("bf"), col("l_orderkey")))
      .count()
    val trueMatches = li
      .join(dim, li("l_orderkey") === dim("o_orderkey"), "left_semi").count()
    assert(pruned < total, "filter pruned nothing")
    assert(pruned >= trueMatches, "filter dropped true matches (false negative!)")
  }
}

package graft.tools

import graft.core.{GraftSession, Tables}
import graft.functions.Skew
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted-vs-unsalted measurement harness for the DELIBERATELY skewed
  * fixture (ScaleDataGen `eventsMode = hotkey`: ~30% of event rows on one
  * user_id — SURVEY §7 hard part 6's zone-dominance shape). Run against a
  * generated dir and paste the JSON line into SCALE.md's skew section.
  *
  * What it measures (median of `runs`, noop sink — the graft.Bench
  * protocol):
  *   - `agg_plain` / `agg_salted`: count + exact-decimal sum per user_id,
  *     plain groupBy vs [[Skew.saltedAggregate]]. EXPECTED finding: ~no
  *     difference — algebraic aggregates are immune to key skew because
  *     map-side partial aggregation collapses the hot key to one row per
  *     map partition BEFORE the shuffle; the salted path exists for the
  *     cases partials cannot shrink. This negative result is recorded
  *     deliberately so nobody "fixes" an aggregation that is not broken.
  *   - `join_plain_aqe` / `join_plain_noskewfix` / `join_salted`: fact ⋈
  *     per-user dim on the hot key, no broadcast (threshold -1 — at
  *     100 TB the per-key dim does not broadcast). Three plans: SMJ with
  *     AQE's skew-join splitter ON (Spark's own mitigation), the same
  *     with the splitter OFF (the naive plan: one reducer sorts 30% of
  *     the corpus), and [[Skew.saltedJoin]] (strategy-independent
  *     explicit mitigation, SHUFFLE_HASH like q89).
  *
  * Also asserts, not just times: the salted-agg physical plan really
  * carries the two-phase (key, __salt) → key shape, and the salted-join
  * plan really partitions on (user_id, __salt) — the "salt engages" lint
  * the SCALE.md entry cites.
  */
object SkewBench {

  private def medianSecs(runs: Int)(mk: () => DataFrame): Double = {
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(ts.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1_skew")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]",
      GraftSession.shufflePartitionsFor(
        GraftSession.inputBytes(dir), cpus.toInt)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)
    // warm the file cache (graft.Bench protocol)
    t.events.write.format("noop").mode("overwrite").save()

    val top = t.events.groupBy(col("user_id")).count()
      .orderBy(col("count").desc).limit(1).head()
    val total = t.events.count()
    val hotShare = top.getLong(1).toDouble / total

    val micro = round(col("value") * lit(1000000), 0).cast("long")
    def aggPlain() = t.events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(micro).as("sum_micro"))
    def aggSalted() = Skew.saltedAggregate(
      t.events, keys = Seq(col("user_id")), salts = 16,
      partials = Seq(count(lit(1)).as("pn"), sum(micro).as("ps")),
      merge = Seq(sum(col("pn")).as("n"), sum(col("ps")).as("sum_micro")))

    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val skewFix = "spark.sql.adaptive.skewJoin.enabled"
    spark.conf.set(bcast, "-1")
    // the per-user dim is MATERIALIZED untimed (it is identical work in
    // every variant and at production it is a maintained table) so the
    // timed region isolates the skew-sensitive join itself
    val dim = t.events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_events")).localCheckpoint()
    def joinPlain() = t.events.select(col("event_id"), col("user_id"), col("value"))
      .join(dim, Seq("user_id"))
      .select(col("event_id"), col("value") * col("user_events"))
    def joinSalted() = Skew.saltedJoin(
        t.events.select(col("event_id"), col("user_id"), col("value")),
        dim.hint("SHUFFLE_HASH"), "user_id", salts = 8)
      .select(col("event_id"), col("value") * col("user_events"))

    // --- salt-engages lint (asserted, not just timed) ---
    val aggPlan = aggSalted().queryExecution.executedPlan.toString
    require(aggPlan.contains("__salt"),
      s"salted agg plan carries no __salt phase:\n${aggPlan.take(1500)}")
    val joinPlan = joinSalted().queryExecution.executedPlan.toString
    require(joinPlan.contains("__salt"),
      s"salted join plan carries no __salt key:\n${joinPlan.take(1500)}")

    val aggP = medianSecs(runs)(() => aggPlain())
    val aggS = medianSecs(runs)(() => aggSalted())
    // AQE's splitter only fires when the skewed partition exceeds BOTH
    // 5x the median AND skewedPartitionThresholdInBytes (256 MB default).
    // The local hot partition (~30% of a toy fixture) sits far under
    // 256 MB, so at fixture scale the default-config plan is identical
    // to skewJoin=off; the aqe variant lowers the byte threshold to make
    // the splitter engage the way a 100 TB hot partition would trigger
    // it naturally.
    val thr = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    val adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val (thr0, adv0) = (spark.conf.get(thr), spark.conf.get(adv))
    spark.conf.set(thr, "8MB"); spark.conf.set(adv, "8MB")
    val joinAqe = medianSecs(runs)(() => joinPlain())
    // knob-coupling variant: threshold lowered but advisory at default —
    // the splitter DETECTS the skewed partition yet splits it into
    // advisory-sized chunks, so when advisory >= hot-partition bytes the
    // "engaged" splitter is a silent no-op. Measured so the doctrine says
    // explicitly that BOTH knobs gate the mitigation, not threshold alone.
    spark.conf.set(thr, "8MB"); spark.conf.set(adv, adv0)
    val joinAqeThrOnly = medianSecs(runs)(() => joinPlain())
    spark.conf.set(thr, thr0); spark.conf.set(adv, adv0)
    spark.conf.set(skewFix, "false")
    val joinNaive = medianSecs(runs)(() => joinPlain())
    spark.conf.set(skewFix, "true")
    val joinS = medianSecs(runs)(() => joinSalted())

    println(s"""{"metric":"skew_bench","dir":"$dir","runs":$runs,"hot_share":$hotShare,"total_rows":$total,"agg_plain":$aggP,"agg_salted":$aggS,"join_plain_aqe":$joinAqe,"join_plain_aqe_thr_only":$joinAqeThrOnly,"join_plain_noskewfix":$joinNaive,"join_salted":$joinS,"salt_lint":"ok"}""")
    spark.stop()
  }
}

package graft

import java.sql.{Date, Timestamp}

import graft.operators.Timeseries
import graft.streaming.Monitors
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twins of the monitoring audits (q224 CUSUM / q235
  * overdispersion, VERDICT r7 item 6): hop-1 window-closure mechanics on
  * synthetic streams, and the ≡-batch contract — the fixture corpus
  * replayed through the hop-2 stateful operators must reproduce the
  * batch audit rows exactly (for CUSUM this simultaneously proves the
  * recursion form equals the batch prefix-sum closed form, integer for
  * integer). */
class MonitorsSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:$sec%02d")

  test("dailyCounts: day closes once the watermark passes; late rows dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Int)]
    val q = Monitors.dailyCounts(input.toDS().toDF("ts", "v"), watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("mon_daily").start()
    try {
      input.addData(
        (Timestamp.valueOf("2024-01-01 03:00:00"), 1),
        (Timestamp.valueOf("2024-01-01 22:00:00"), 1))
      q.processAllAvailable()
      assert(spark.table("mon_daily").count() == 0) // day still open
      // advance the watermark past Jan-1 end: the day closes with x=2
      input.addData((Timestamp.valueOf("2024-01-02 02:00:00"), 1))
      q.processAllAvailable()
      val closed = spark.table("mon_daily").collect()
        .map(r => (r.getAs[Date]("day").toString, r.getAs[Long]("x")))
      assert(closed.toSeq == Seq(("2024-01-01", 2L)))
      // a LATE Jan-1 row (behind the watermark) never reopens the day
      input.addData((Timestamp.valueOf("2024-01-01 01:00:00"), 1))
      input.addData((Timestamp.valueOf("2024-01-03 05:00:00"), 1))
      q.processAllAvailable()
      val after = spark.table("mon_daily").collect()
        .map(r => (r.getAs[Date]("day").toString, r.getAs[Long]("x"))).toSeq
      assert(after.count(_._1 == "2024-01-01") == 1)
      assert(after.contains(("2024-01-01", 2L)))
      assert(after.contains(("2024-01-02", 1L))) // closed by the Jan-3 row
    } finally q.stop()
  }

  test("streaming CUSUM chart == batch q224 on the replayed fixture corpus") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t = sf()
    // trained baseline = the batch audit's totals over the same corpus
    val daily = t.events.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getAs[Date]("day"), r.getAs[Long]("x")))
      .sortBy(_._1.getTime)
    val params = Monitors.CusumParams(daily.length.toLong, daily.map(_._2).sum)
    val input = MemoryStream[(Date, Long)]
    val q = Monitors.cusumChart(input.toDS(), params)
      .writeStream.outputMode("append").format("memory")
      .queryName("mon_cusum").start()
    try {
      // replay closed days in three ordered chunks — the monotone
      // cross-batch closure order hop 1 guarantees
      val chunks = daily.grouped(math.max(1, daily.length / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val got = spark.table("mon_cusum").collect()
        .map(r => (r.getAs[Date]("day").toString, r.getAs[Long]("n_events"),
          r.getAs[Long]("s_hi"), r.getAs[Long]("s_lo"),
          r.getAs[Boolean]("alarm_hi"), r.getAs[Boolean]("alarm_lo")))
        .sortBy(_._1)
      val batch = Timeseries.cusumDailyVolume(t).collect()
        .map(r => (r.getAs[Date]("day").toString, r.getAs[Long]("n_events"),
          r.getAs[Long]("s_hi"), r.getAs[Long]("s_lo"),
          r.getAs[Boolean]("alarm_hi"), r.getAs[Boolean]("alarm_lo")))
        .sortBy(_._1)
      assert(got.length == batch.length && got.nonEmpty)
      assert(got.toSeq == batch.toSeq,
        s"first diff: ${got.zip(batch).find { case (a, b) => a != b }}")
    } finally q.stop()
  }

  test("streaming dispersion final snapshot == batch q235 on the fixture") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t = sf()
    val hourly = t.events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Timestamp]("h"),
        r.getAs[Long]("c")))
      .sortBy(_._2.getTime)
    val input = MemoryStream[(String, Timestamp, Long)]
    val q = Monitors.dispersionSnapshots(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("mon_disp").start()
    try {
      val chunks = hourly.grouped(math.max(1, hourly.length / 4 + 1)).toSeq
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      // intermediate snapshots exist (one wave per batch); judge the LAST
      val all = spark.table("mon_disp").collect()
      val lastAsOf = all.map(_.getAs[Timestamp]("as_of").getTime).max
      val got = all.filter(_.getAs[Timestamp]("as_of").getTime == lastAsOf)
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_hours"),
          r.getAs[Long]("n_events"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("mean_per_hour")),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("dispersion")),
          r.getAs[Boolean]("bursty")))
        .sortBy(_._1)
      val batch = Timeseries.overdispersionAudit(t).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_hours"),
          r.getAs[Long]("n_events"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("mean_per_hour")),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("dispersion")),
          r.getAs[Boolean]("bursty")))
        .sortBy(_._1)
      assert(got.length == batch.length && got.nonEmpty)
      assert(got.toSeq == batch.toSeq,
        s"first diff: ${got.zip(batch).find { case (a, b) => a != b }}")
    } finally q.stop()
  }

  test("hourlyCounts hop 1 feeds dispersion hop 2: closed counts match batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = Monitors.hourlyCounts(input.toDS().toDF("event_type", "ts"))
      .writeStream.outputMode("append").format("memory")
      .queryName("mon_hourly").start()
    try {
      input.addData(("view", ts(0)), ("view", ts(10)), ("click", ts(20)),
        ("view", ts(70)))
      q.processAllAvailable()
      input.addData(("view", ts(200))) // watermark passes hours 10 and 11
      q.processAllAvailable()
      val closed = spark.table("mon_hourly").collect()
        .map(r => (r.getAs[String]("event_type"),
          r.getAs[Timestamp]("h").toString, r.getAs[Long]("c"))).toSet
      assert(closed == Set(
        ("view", "2024-01-01 10:00:00.0", 2L),
        ("click", "2024-01-01 10:00:00.0", 1L),
        ("view", "2024-01-01 11:00:00.0", 1L)))
    } finally q.stop()
  }
}

package graft

import graft.sources.Sources
import graft.taxi._
import org.apache.spark.sql.functions._

/** The reference's full serving lifecycle as ONE driveable main
  * (`serving/database.py:16-24` read side + `serving/api.py` endpoints):
  * batch cycle → lakehouse tables → publish to the serving database
  * (Derby stands in for Postgres; the JDBC surface is identical) → the
  * API-shaped reads back OUT of the serving database. Every hop is
  * verified by counts observed on the write plan or read back from the
  * database — and the publish runs TWICE to demonstrate the upsert
  * converges (re-publishing updates in place, never accumulates).
  *
  * Run: sbt "runMain graft.ServeDemo"  (exit 0 = every check held). */
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = s"servedemo${System.nanoTime()}"
    val url = s"jdbc:derby:memory:graft_serve_demo_$db;create=true"
    var failures = 0
    def check(name: String, ok: Boolean, detail: => String): Unit = {
      println(f"[serve-demo] $name%-46s ${if (ok) "OK" else "FAIL"} $detail")
      if (!ok) failures += 1
    }

    // ── 1. lake side: one batch cycle over deterministic raw data ──
    val now = TaxiData.anchor
    val loadDate = java.sql.Timestamp.valueOf("2025-10-24 12:34:56")
    val r = TaxiPipeline.runBatchCycle(
      spark,
      TaxiData.rawTrips(spark, 2500, days = 7),
      TaxiData.rawWeather(spark, days = 8),
      TaxiData.rawZones(spark),
      now, loadDate, db)
    check("batch cycle: trips ingested", r.tripsLoaded > 0, s"rows=${r.tripsLoaded}")
    check("batch cycle: 5 derived tables non-empty",
      r.analyticsRows.size == 5 && r.analyticsRows.values.forall(_ > 0),
      r.analyticsRows.map { case (k, v) => s"$k=$v" }.mkString(" "))

    // ── 2. publish the zone metrics into the serving database, twice ──
    val lakeTable = s"${db}_zone_performance_metrics"
    val servingTable = "zone_performance_metrics"
    val lakeRows = spark.table(lakeTable).count()
    val metricKeys = Seq("location_id", "trip_date", "hour", "weather_condition")
    TaxiServing.publishToServingDb(spark, lakeTable, url, servingTable, metricKeys)
    TaxiServing.publishToServingDb(spark, lakeTable, url, servingTable, metricKeys)
    val served = Sources.readJdbc(spark, url, servingTable)
    val servedRows = served.count()
    check("publish: serving rows == lake rows (after 2 publishes)",
      servedRows == lakeRows, s"lake=$lakeRows serving=$servedRows")

    // ── 3. serving-side filtered read (the API's WHERE ships to the DB) ──
    val busy = Sources.readJdbc(spark, url, servingTable)
      .filter(col("total_pickups") > 2)
      .select(col("zone_name"), col("total_pickups"))
    val busyCount = busy.count()
    val lakeBusy = spark.table(lakeTable).filter(col("total_pickups") > 2).count()
    check("serving read: filtered scan matches lake-side filter",
      busyCount > 0 && busyCount == lakeBusy, s"serving=$busyCount lake=$lakeBusy")

    // ── 4. the API endpoint shapes straight off the lake tables ──
    val trips = spark.table(s"${db}_trips")
    val zones = spark.table(s"${db}_taxi_zones")
    val recent = TaxiServing.recentTrips(trips, now, limit = 25).count()
    check("api: recent trips page", recent > 0 && recent <= 25, s"rows=$recent")
    val stats = TaxiServing.dashboardStats(spark, trips, zones, now)
    check("api: dashboard totals consistent",
      stats.total_trips_today >= 0 && stats.top_zones.size <= 5 &&
        stats.top_zones.map(_.trips).sum <= math.max(stats.total_trips_today, 1),
      s"today=${stats.total_trips_today} peak=${stats.peak_hour} " +
        s"top=${stats.top_zones.map(z => s"${z.zone_name}:${z.trips}").mkString(",")}")

    // ── 5. upsert convergence under a changed row ──
    val bumped = spark.table(lakeTable)
      .withColumn("total_pickups", col("total_pickups") + 1000)
    Sources.jdbcUpsert(bumped, url, servingTable, metricKeys)
    val bumpedServed = Sources.readJdbc(spark, url, servingTable)
    check("upsert: changed rows updated in place",
      bumpedServed.count() == lakeRows &&
        bumpedServed.filter(col("total_pickups") > 1000).count() == lakeRows,
      s"rows=${bumpedServed.count()}")

    (Seq("trips", "hourly_weather", "taxi_zones", "etl_control") ++
      r.analyticsRows.keys).foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${db}_$t"))
    println(s"[serve-demo] ${if (failures == 0) "ALL CHECKS PASSED" else s"$failures CHECKS FAILED"}")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}

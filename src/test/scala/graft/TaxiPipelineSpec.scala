package graft

import graft.taxi._

/** End-to-end batch cycle: ingest → lakehouse tables → five derived tables,
  * with watermark-gated incremental trips ingest. */
class TaxiPipelineSpec extends SparkSpec {

  test("runBatchCycle builds all tables; second run is incremental (no re-ingest)") {
    val db = s"pl${System.nanoTime()}"
    val now = TaxiData.anchor
    val loadDate = java.sql.Timestamp.valueOf("2025-10-24 12:34:56")
    val raw = TaxiData.rawTrips(spark, 2500, days = 7)
    val weather = TaxiData.rawWeather(spark, days = 8)
    val zones = TaxiData.rawZones(spark)

    val r1 = TaxiPipeline.runBatchCycle(spark, raw, weather, zones, now, loadDate, db)
    assert(r1.tripsLoaded > 0 && r1.weatherLoaded > 0 && r1.zonesLoaded == 16)
    // column integrity through the partition-reordering write path
    import org.apache.spark.sql.functions.{col, year => yearOf}
    assert(spark.table(s"${db}_trips")
      .filter(col("year") =!= yearOf(col("pickup_datetime"))).count() == 0,
      "trips year column corrupted by positional insert")
    assert(spark.table(s"${db}_trips").filter(col("day") > 31).count() == 0)
    assert(r1.analyticsRows.size == 5)
    r1.analyticsRows.foreach { case (t, n) => assert(n > 0, s"$t is empty") }

    // second cycle over the SAME raw input: watermark blocks duplicates,
    // derived-table refresh stays idempotent. Counts are rows WRITTEN per
    // cycle (observe() metrics), so a fully-filtered re-ingest writes 0.
    val r2 = TaxiPipeline.runBatchCycle(spark, raw, weather, zones, now, loadDate, db)
    assert(r2.tripsLoaded == 0, s"watermark failed: ${r2.tripsLoaded} trips re-ingested")
    assert(spark.table(s"${db}_trips").count() == r1.tripsLoaded,
      "table total changed despite watermark")
    assert(r2.analyticsRows == r1.analyticsRows, "derived refresh not idempotent")

    (Seq("trips", "hourly_weather", "taxi_zones", "etl_control") ++
      r1.analyticsRows.keys).foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${db}_$t"))
  }
}

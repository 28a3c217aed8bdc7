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

  test("crash between trips append and watermark advance: retry is exactly-once") {
    import org.apache.spark.sql.functions._
    val db = s"plc${System.nanoTime()}"
    val now = TaxiData.anchor
    val loadDate1 = java.sql.Timestamp.valueOf("2025-10-24 12:34:56")
    val loadDate2 = java.sql.Timestamp.valueOf("2025-10-25 12:34:56")
    val raw1 = TaxiData.rawTrips(spark, 1500, days = 7)
    val weather = TaxiData.rawWeather(spark, days = 8)
    val zones = TaxiData.rawZones(spark)
    // batch 2 = batch 1 shifted a week forward: every row lands past wm1
    val raw2 = raw1
      .withColumn("tpep_pickup_datetime",
        col("tpep_pickup_datetime") + expr("INTERVAL 7 DAYS"))
      .withColumn("tpep_dropoff_datetime",
        col("tpep_dropoff_datetime") + expr("INTERVAL 7 DAYS"))

    TaxiPipeline.runBatchCycle(spark, raw1, weather, zones, now, loadDate1, db)
    val control = s"${db}_etl_control"
    val wm1 = TaxiPipeline.EtlControl.watermark(spark, control, "trips").get
    val total1 = spark.table(s"${db}_trips").count()

    // ── simulate the crash: cycle 2's batch lands in the table, then the
    // process dies BEFORE EtlControl.advance writes the control row ──
    val clean2 = TaxiIngest.cleanTrips(raw2, loadDate2)
      .filter(col("pickup_datetime") > lit(wm1))
    val batch2Rows = clean2.count()
    assert(batch2Rows > 0)
    graft.sources.TableIO.append(spark, s"${db}_trips", clean2)
    assert(TaxiPipeline.EtlControl.watermark(spark, control, "trips").get == wm1,
      "precondition: control row must still be stale after the crash")

    // ── the retry: full cycle over the same raw batch ──
    val r2 = TaxiPipeline.runBatchCycle(spark, raw2, weather, zones, now, loadDate2, db)
    assert(r2.tripsLoaded == 0,
      s"retry re-appended ${r2.tripsLoaded} rows the crashed cycle already wrote")
    assert(spark.table(s"${db}_trips").count() == total1 + batch2Rows,
      "trips table gained duplicates under crash-retry")
    // the control log converged past the crashed batch (append-only,
    // latest-wins), so the at-risk span does not grow without bound
    val wm2 = TaxiPipeline.EtlControl.watermark(spark, control, "trips").get
    assert(wm2.after(wm1), "watermark not advanced by the retry")
    assert(wm2 == clean2.agg(max(col("pickup_datetime"))).collect()(0).getTimestamp(0))

    // a third cycle over the same input is a plain no-op
    val r3 = TaxiPipeline.runBatchCycle(spark, raw2, weather, zones, now, loadDate2, db)
    assert(r3.tripsLoaded == 0)
    assert(spark.table(s"${db}_trips").count() == total1 + batch2Rows)

    // ── multiplicity under partial crash: batch 3 duplicates one row, the
    // crashed append committed only ONE copy — the retry must append
    // exactly the missing copy, not drop both incoming copies ──
    val wm2b = TaxiPipeline.EtlControl.watermark(spark, control, "trips").get
    val raw3 = raw2
      .withColumn("tpep_pickup_datetime",
        col("tpep_pickup_datetime") + expr("INTERVAL 7 DAYS"))
      .withColumn("tpep_dropoff_datetime",
        col("tpep_dropoff_datetime") + expr("INTERVAL 7 DAYS"))
      .limit(50)
    val raw3Dup = raw3.union(raw3.limit(1)) // one row appears twice
    val clean3 = TaxiIngest.cleanTrips(raw3Dup, loadDate2)
      .filter(col("pickup_datetime") > lit(wm2b))
    val batch3Rows = clean3.count()
    // crash: only the DISTINCT rows landed (one copy of the duplicate)
    graft.sources.TableIO.append(spark, s"${db}_trips",
      clean3.dropDuplicates(clean3.columns.filterNot(_ == "load_date")))
    val landed = batch3Rows - 1 // the duplicate's second copy is missing
    val beforeRetry = spark.table(s"${db}_trips").count()
    assert(beforeRetry == total1 + batch2Rows + landed)
    val r4 = TaxiPipeline.runBatchCycle(spark, raw3Dup, weather, zones, now, loadDate2, db)
    assert(r4.tripsLoaded == 1,
      s"retry should append exactly the missing duplicate copy, got ${r4.tripsLoaded}")
    assert(spark.table(s"${db}_trips").count() == total1 + batch2Rows + batch3Rows)

    (Seq("trips", "hourly_weather", "taxi_zones", "etl_control") ++
      r2.analyticsRows.keys).foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${db}_$t"))
  }

  test("serving publish: lakehouse aggregate lands in the serving DB and converges") {
    import org.apache.spark.sql.functions.col
    val db = s"plp${System.nanoTime()}"
    val now = TaxiData.anchor
    val loadDate = java.sql.Timestamp.valueOf("2025-10-24 12:34:56")
    TaxiPipeline.runBatchCycle(spark,
      TaxiData.rawTrips(spark, 800, days = 7),
      TaxiData.rawWeather(spark, days = 8),
      TaxiData.rawZones(spark), now, loadDate, db)
    val url = "jdbc:derby:memory:graft_publish_spec;create=true"
    val lake = s"${db}_trip_weather_correlation"
    val lakeCount = spark.table(lake).count()
    TaxiServing.publishToServingDb(spark, lake, url, "twc_serving",
      keyCols = Seq("trip_date", "hour", "weather_condition"))
    val served = graft.sources.Sources.readJdbc(spark, url, "twc_serving")
    assert(served.count() == lakeCount)
    // a second publish of the SAME cycle converges: no accumulation
    TaxiServing.publishToServingDb(spark, lake, url, "twc_serving",
      keyCols = Seq("trip_date", "hour", "weather_condition"))
    assert(graft.sources.Sources.readJdbc(spark, url, "twc_serving").count() == lakeCount)
    // values round-trip: a sampled key's trip count matches the lake row
    val sample = spark.table(lake).orderBy(col("trip_date"), col("hour"))
      .select(col("trip_date"), col("hour"), col("weather_condition"), col("total_trips"))
      .collect().head
    val match0 = graft.sources.Sources.readJdbc(spark, url, "twc_serving")
      .filter(col("trip_date") === sample.get(0) && col("hour") === sample.get(1) &&
        col("weather_condition") === sample.get(2))
      .collect()
    assert(match0.length == 1 &&
      match0.head.getAs[Long]("total_trips") == sample.getAs[Long]("total_trips"))
    (Seq("trips", "hourly_weather", "taxi_zones", "etl_control",
      "trip_weather_correlation", "zone_performance_metrics",
      "demand_prediction_features", "ml_demand_features", "ml_fare_features"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${db}_$t"))
  }
}

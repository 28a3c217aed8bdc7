package graft

import graft.taxi._
import org.apache.spark.sql.functions._

/** Taxi-domain parity: ingest cleaning rules, the five derived-table
  * builders, and the serving shapes — on deterministic fixtures with a
  * fixed "now" anchor. */
class TaxiSpec extends SparkSpec {

  private val now = TaxiData.anchor
  private val loadDate = java.sql.Timestamp.valueOf("2025-10-24 12:34:56")

  private lazy val raw = TaxiData.rawTrips(spark, 4000, days = 7)
  private lazy val trips = TaxiIngest.cleanTrips(raw, loadDate).cache()
  private lazy val weather =
    TaxiIngest.cleanWeather(TaxiData.rawWeather(spark, days = 8), loadDate).cache()
  private lazy val zones = TaxiIngest.cleanZones(TaxiData.rawZones(spark), loadDate).cache()

  test("cleanTrips enforces every quality rule and the 23-column schema") {
    val n = trips.count()
    assert(n > 0 && n < raw.count()) // violations exist and are dropped
    assert(trips.columns.length == 23)
    assert(trips.filter(
      col("pickup_datetime").isNull || col("dropoff_datetime").isNull ||
        col("trip_distance") <= 0 || col("fare_amount") <= 0 ||
        col("total_amount") <= 0 || !col("passenger_count").between(1, 6)).count() == 0)
    assert(trips.filter(col("year") =!= year(col("pickup_datetime"))).count() == 0)
  }

  test("cleanZones renames lat/lon and keeps 16 zones") {
    assert(zones.count() == 16)
    assert(zones.columns.contains("latitude") && zones.columns.contains("longitude"))
    assert(!zones.columns.contains("lat"))
  }

  test("tripWeatherCorrelation: last-day grain (date,hour,condition); diversity bounded") {
    val df = TaxiAnalytics.tripWeatherCorrelation(trips, weather, now, loadDate)
    assert(df.count() > 0)
    assert(df.groupBy("trip_date", "hour", "weather_condition").count()
      .filter(col("count") > 1).count() == 0)
    assert(df.filter(col("pickup_zone_diversity") > 17).count() == 0)
    assert(df.filter(col("trip_date") < date_sub(to_date(lit(now)), 1)).count() == 0)
  }

  test("zonePerformanceMetrics: unknown zone rejected, factors sane") {
    val df = TaxiAnalytics.zonePerformanceMetrics(trips, weather, zones, now, loadDate)
    assert(df.count() > 0)
    assert(df.filter(col("location_id") === 999).count() == 0) // null-reject
    assert(df.filter(col("weather_impact_score") < 1.0 || col("weather_impact_score") > 1.2)
      .count() == 0)
    assert(df.filter(col("total_dropoffs") < 0).count() == 0)
  }

  test("demandPredictionFeatures: last-day rows only, rolling means positive") {
    val df = TaxiAnalytics.demandPredictionFeatures(trips, weather, zones, now, loadDate)
    assert(df.count() > 0)
    assert(df.filter(col("prediction_datetime") <
      date_sub(to_date(lit(now)), 1).cast("timestamp")).count() == 0)
    assert(df.filter(col("rolling_avg_demand_7d") <= 0).count() == 0)
    assert(df.filter(!col("weather_impact_factor").isin(1.0, 1.1, 1.2, 1.3)).count() == 0)
  }

  test("mlDemandFeatures: coalesced lags, deciles 1-10, weekend interaction") {
    val df = TaxiAnalytics.mlDemandFeatures(trips, weather, zones, now, loadDate).cache()
    assert(df.count() > 0)
    assert(df.filter(col("demand_1h_ago").isNull).count() == 0)
    assert(df.filter(col("zone_popularity_score") < 1 || col("zone_popularity_score") > 10)
      .count() == 0)
    // interaction zero on weekdays, = encoded on weekends
    assert(df.filter(!col("is_weekend") && col("weather_weekend_interaction") =!= 0.0)
      .count() == 0)
    assert(df.filter(col("is_weekend") &&
      col("weather_weekend_interaction") =!= col("weather_condition_encoded")).count() == 0)
    df.unpersist()
  }

  test("mlFareFeatures: airport/cross-borough flags derive from the dimension") {
    val df = TaxiAnalytics.mlFareFeatures(trips, weather, zones, now, loadDate).cache()
    assert(df.count() > 0)
    assert(df.filter(col("pickup_zone_id") === 999 || col("dropoff_zone_id") === 999)
      .count() == 0)
    val airports = Set(132, 138)
    val flagged = df.filter(col("is_airport_trip"))
      .select("pickup_zone_id", "dropoff_zone_id").collect()
    assert(flagged.forall(r =>
      airports(r.getInt(0)) || airports(r.getInt(1))))
    assert(df.filter(col("surge_factor").isin(0.8, 1.0, 1.2)).count() == df.count())
    assert(df.filter(col("zone_distance_km") < 0).count() == 0)
    df.unpersist()
  }

  test("serving: recentTrips bounded and ordered; zoneMetrics ranked by revenue") {
    val recent = TaxiServing.recentTrips(trips, now, limit = 50).collect()
    assert(recent.length <= 50)
    val times = recent.map(_.getAs[java.sql.Timestamp]("pickup_datetime").getTime)
    assert(times.sameElements(times.sorted.reverse))
    val start = java.sql.Timestamp.valueOf("2025-10-17 00:00:00")
    val zm = TaxiServing.zoneMetrics(trips, zones, start, now).collect()
    assert(zm.nonEmpty)
    val revs = zm.map(_.getAs[Double]("total_revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
    assert(zm.count(_.getAs[String]("zone_name") == "Unknown Zone") > 0) // zone 999
  }

  test("serving: demandPrediction deterministic across runs; dashboard typed") {
    val a = TaxiServing.demandPrediction(trips, zones, now, hoursAhead = 6).collect()
    val b = TaxiServing.demandPrediction(trips, zones, now, hoursAhead = 6).collect()
    assert(a.length == b.length && a.length <= 1000)
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val stats = TaxiServing.dashboardStats(spark, trips, zones, now)
    assert(stats.total_trips_today >= 0 && stats.top_zones.size <= 5)
  }

  test("serving: weatherImpact is deterministic and score-clamped") {
    val start = java.sql.Timestamp.valueOf("2025-10-17 00:00:00")
    val a = TaxiServing.weatherImpact(trips, start, now).collect()
    val b = TaxiServing.weatherImpact(trips, start, now).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    assert(a.forall(r => r.getAs[Double]("weather_impact_score") <= 100.0 ||
      r.getAs[Long]("total_trips") > 100))
  }

  test("serving: every shape round-trips through its typed Dataset record") {
    val start = java.sql.Timestamp.valueOf("2025-10-17 00:00:00")
    // each .as[T] must survive analysis (schema enforcement) AND produce
    // case-class rows whose values match the DataFrame form
    val rt = TaxiServing.recentTripsTyped(trips, now, limit = 20).collect()
    assert(rt.nonEmpty && rt.forall(_.trip_id.nonEmpty))
    assert(rt.head.pickup_datetime != null && rt.head.fare_amount.forall(_ > 0))

    val zm = TaxiServing.zoneMetricsTyped(trips, zones, start, now).collect()
    assert(zm.nonEmpty && zm.forall(z => z.total_trips > 0 && z.borough.nonEmpty))
    val zmDf = TaxiServing.zoneMetrics(trips, zones, start, now).collect()
    assert(zm.map(_.total_revenue).toSeq == zmDf.map(_.getAs[Double]("total_revenue")).toSeq)

    val hc = TaxiServing.hourlyTripCountsTyped(trips, now).collect()
    assert(hc.nonEmpty && hc.forall(_.trip_count > 0))

    val wi = TaxiServing.weatherImpactTyped(trips, start, now).collect()
    assert(wi.nonEmpty && wi.forall(w => Set("Rainy", "Snowy", "Cloudy", "Clear")
      .contains(w.weather_condition)))

    val dp = TaxiServing.demandPredictionTyped(trips, zones, now, hoursAhead = 6).collect()
    assert(dp.nonEmpty && dp.forall(d => d.confidence_score >= 0.7 && d.predicted_demand >= 0))

    val ra = TaxiServing.realTimeActivityTyped(trips, zones, now, minutesBack = 24 * 60)
      .collect()
    assert(ra.nonEmpty && ra.forall(r => r.activity_score <= 100.0 && r.pickup_count > 0))
  }

  test("serving: exportTrips writes real CSV and JSON windows (reference stub)") {
    val base = java.nio.file.Files.createTempDirectory("graft_export").toFile.getAbsolutePath
    val start = java.sql.Timestamp.valueOf("2025-10-20 00:00:00")
    val end = java.sql.Timestamp.valueOf("2025-10-22 00:00:00")
    val expected = trips.filter(
      col("pickup_datetime") >= lit(start) && col("pickup_datetime") < lit(end)).count()
    assert(expected > 0 && expected < trips.count(), "window must be a strict slice")

    val nCsv = TaxiServing.exportTrips(trips, start, end, "csv", s"$base/csv")
    val nJson = TaxiServing.exportTrips(trips, start, end, "json", s"$base/json")
    assert(nCsv == expected && nJson == expected) // observe() count == window

    val csvBack = spark.read.option("header", "true").csv(s"$base/csv")
    assert(csvBack.count() == expected)
    assert(csvBack.columns.toSet == trips.columns.toSet) // header carries schema
    val jsonBack = spark.read.json(s"$base/json")
    assert(jsonBack.count() == expected)
    // a value survives the round trip (cents-exact across the text format)
    def centsSum(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum(round(col("total_amount").cast("double") * 100, 0).cast("long")))
        .collect()(0).getLong(0)
    assert(centsSum(jsonBack) == centsSum(trips.filter(
      col("pickup_datetime") >= lit(start) && col("pickup_datetime") < lit(end))))

    intercept[IllegalArgumentException] {
      TaxiServing.exportTrips(trips, start, end, "xml", s"$base/xml")
    }
  }
}

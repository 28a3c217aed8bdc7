package graft.taxi

import java.sql.Timestamp

import graft.functions.Encoders.pseudoRand
import graft.taxi.ServingModels._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The eight serving-layer query shapes (`serving/database.py:26-297`)
  * re-expressed over the lakehouse `trips`/`taxi_zones` DataFrames behind
  * the same signatures the FastAPI service exposes
  * (`serving/api.py:61-352`). Determinism substitutions per SURVEY §7 hard
  * part 3: `NOW()` is the `now` parameter; `RANDOM()` jitter is a seeded
  * hash (`Encoders.pseudoRand`).
  *
  * Fixed reference defect (documented, not copied): `get_weather_impact`
  * selects per-row expressions (`EXTRACT(hour FROM pickup_datetime)`)
  * outside the GROUP BY `DATE(pickup_datetime)` — invalid SQL that Postgres
  * rejects; the rebuild derives its time category from the grouped date.
  */
object TaxiServing {

  private def zoneDim(zones: DataFrame): DataFrame =
    broadcast(zones.select(
      col("location_id").as("z_location_id"),
      col("zone").as("zone_name"),
      col("borough").as("z_borough")))

  /** get_recent_trips (`serving/database.py:26-48`): last-N trips in the
    * lookback window. TakeOrderedAndProject — no global sort at scale. */
  def recentTrips(trips: DataFrame, now: Timestamp,
                  limit: Int = 100, hoursBack: Int = 24): DataFrame =
    trips
      .filter(col("pickup_datetime") >=
        lit(now) - make_interval(lit(0), lit(0), lit(0), lit(0), lit(hoursBack)))
      .select(
        concat(col("vendor_id").cast("string"), lit("_"),
          unix_timestamp(col("pickup_datetime")).cast("string")).as("trip_id"),
        col("vendor_id"),
        col("pickup_datetime"),
        col("dropoff_datetime"),
        col("passenger_count"),
        col("trip_distance"),
        col("pickup_location_id"),
        col("dropoff_location_id"),
        col("fare_amount"),
        col("tip_amount"),
        col("total_amount"),
        col("payment_type"))
      .orderBy(col("pickup_datetime").desc, col("trip_id"))
      .limit(limit)

  /** get_zone_metrics (`serving/database.py:50-84`). */
  def zoneMetrics(trips: DataFrame, zones: DataFrame,
                  start: Timestamp, end: Timestamp): DataFrame = {
    val zoneStats = trips
      .filter(
        col("pickup_datetime").between(lit(start), lit(end)) && col("fare_amount") > 0)
      .groupBy(coalesce(col("pickup_location_id"), col("dropoff_location_id")).as("zone_id"))
      .agg(
        count(lit(1)).as("total_trips"),
        avg(col("fare_amount")).as("avg_fare_raw"),
        sum(col("total_amount")).as("total_revenue_raw"),
        avg(col("trip_distance")).as("avg_distance_raw"),
        count(when(hour(col("pickup_datetime")).between(17, 19), lit(1))).as("peak_trips"))
    zoneStats
      .join(zoneDim(zones), col("zone_id") === col("z_location_id"), "left")
      .filter(col("zone_id").isNotNull)
      .select(
        col("zone_id"),
        coalesce(col("zone_name"), lit("Unknown Zone")).as("zone_name"),
        coalesce(col("z_borough"), lit("Unknown")).as("borough"),
        col("total_trips"),
        round(col("avg_fare_raw"), 2).as("avg_fare"),
        round(col("total_revenue_raw"), 2).as("total_revenue"),
        round(col("avg_distance_raw"), 2).as("avg_distance"),
        round(col("peak_trips").cast("double") / nullif(col("total_trips"), lit(0)) * 100, 2)
          .as("peak_hour_factor"))
      .orderBy(col("total_revenue").desc, col("zone_id"))
  }

  /** get_hourly_trip_counts (`serving/database.py:86-102`). */
  def hourlyTripCounts(trips: DataFrame, now: Timestamp, daysBack: Int = 7): DataFrame =
    trips
      .filter(
        col("pickup_datetime") >= date_sub(to_date(lit(now)), daysBack).cast("timestamp") &&
          col("fare_amount") > 0)
      .groupBy(date_trunc("hour", col("pickup_datetime")).as("hour"))
      .agg(
        count(lit(1)).as("trip_count"),
        avg(col("fare_amount")).as("avg_fare"),
        sum(col("total_amount")).as("total_revenue"))
      .orderBy(col("hour"))

  /** get_weather_impact (`serving/database.py:104-155`) — synthetic weather
    * correlation per day; RANDOM() → seeded hash of the trip date. */
  def weatherImpact(trips: DataFrame, start: Timestamp, end: Timestamp): DataFrame = {
    val daily = trips
      .filter(col("pickup_datetime").between(lit(start), lit(end)) && col("fare_amount") > 0)
      .groupBy(to_date(col("pickup_datetime")).as("trip_date"))
      .agg(count(lit(1)).as("total_trips"), avg(col("fare_amount")).as("avg_fare"))
      .select(
        col("trip_date"),
        col("total_trips"),
        col("avg_fare"),
        when(dayofweek(col("trip_date")).isin(1, 7), "Weekend").otherwise("Regular")
          .as("time_category"),
        when(pseudoRand("wx", col("trip_date")) < 0.2, "Rainy")
          .when(pseudoRand("wx", col("trip_date")) < 0.3, "Snowy")
          .when(pseudoRand("wx", col("trip_date")) < 0.6, "Cloudy")
          .otherwise("Clear").as("weather_condition"),
        (lit(20.0) + pseudoRand("temp", col("trip_date")) * 15).as("temperature_celsius"),
        (lit(40.0) + pseudoRand("hum", col("trip_date")) * 40).as("humidity"))
    daily
      .select(
        col("trip_date"),
        col("weather_condition"),
        col("temperature_celsius"),
        col("humidity"),
        col("total_trips"),
        round(col("avg_fare"), 2).as("avg_fare_amount"),
        when(col("weather_condition") === "Rainy", least(col("total_trips") * 1.3, lit(100.0)))
          .when(col("weather_condition") === "Snowy", least(col("total_trips") * 1.5, lit(100.0)))
          .when(col("weather_condition") === "Cloudy", least(col("total_trips") * 1.1, lit(100.0)))
          .otherwise(col("total_trips").cast("double")).as("weather_impact_score"))
      .orderBy(col("trip_date").desc)
  }

  /** get_demand_prediction (`serving/database.py:157-202`): 30-day hourly
    * patterns × future-hour grid (sequence+explode replaces
    * generate_series), hash jitter replaces RANDOM, deterministic ordering
    * tiebreaks added. */
  def demandPrediction(trips: DataFrame, zones: DataFrame, now: Timestamp,
                       hoursAhead: Int = 24): DataFrame = {
    val patterns = trips
      .filter(
        col("pickup_datetime") >= date_sub(to_date(lit(now)), 30).cast("timestamp") &&
          col("pickup_location_id").isNotNull && col("fare_amount") > 0)
      .groupBy(
        col("pickup_location_id").as("location_id"),
        hour(col("pickup_datetime")).as("hour_of_day"),
        dayofweek(col("pickup_datetime")).as("day_of_week"))
      .agg(count(lit(1)).as("historical_count"), avg(col("fare_amount")).as("avg_fare"))
      .filter(col("historical_count") > 5)
    patterns
      .join(zoneDim(zones), col("location_id") === col("z_location_id"), "left")
      .select(
        col("location_id"),
        coalesce(col("zone_name"), lit("Unknown Zone")).as("zone_name"),
        col("historical_count"),
        explode(sequence(lit(1), lit(hoursAhead))).as("h"))
      .select(
        col("location_id"),
        col("zone_name"),
        (lit(now) + make_interval(lit(0), lit(0), lit(0), lit(0), col("h")))
          .as("prediction_hour"),
        round(col("historical_count") *
          (lit(0.8) + pseudoRand("dem", col("location_id"), col("h")) * 0.4), 1)
          .as("predicted_demand"),
        round(lit(0.7) + pseudoRand("conf", col("location_id"), col("h")) * 0.25, 3)
          .as("confidence_score"),
        when(pseudoRand("wif", col("location_id"), col("h")) < 0.3, 1.2)
          .when(pseudoRand("wif", col("location_id"), col("h")) < 0.5, 0.8)
          .otherwise(1.0).as("weather_impact_factor"),
        col("historical_count").cast("double").as("historical_avg"))
      .orderBy(col("predicted_demand").desc, col("prediction_hour"), col("location_id"))
      .limit(1000)
  }

  /** get_real_time_activity (`serving/database.py:204-238`). */
  def realTimeActivity(trips: DataFrame, zones: DataFrame, now: Timestamp,
                       minutesBack: Int = 60): DataFrame = {
    val recent = trips
      .filter(
        col("pickup_datetime") >=
          lit(now) - make_interval(lit(0), lit(0), lit(0), lit(0), lit(0), lit(minutesBack)) &&
          col("pickup_location_id").isNotNull &&
          col("dropoff_datetime").isNotNull && col("fare_amount") > 0)
      .groupBy(col("pickup_location_id").as("zone_id"))
      .agg(
        count(lit(1)).as("pickup_count"),
        sum(col("total_amount")).as("revenue_raw"),
        avg((unix_timestamp(col("dropoff_datetime")) - unix_timestamp(col("pickup_datetime"))) / 60)
          .as("avg_trip_duration"))
      .filter(col("pickup_count") > 0)
    recent
      .join(zoneDim(zones), col("zone_id") === col("z_location_id"), "left")
      .select(
        col("zone_id"),
        coalesce(col("zone_name"), lit("Unknown Zone")).as("zone_name"),
        lit(now).as("activity_timestamp"),
        least(col("pickup_count") * 10 + col("revenue_raw") / 10, lit(100.0))
          .as("activity_score"),
        col("pickup_count"),
        round(col("revenue_raw"), 2).as("revenue_last_hour"),
        round(col("avg_trip_duration"), 1).as("avg_wait_time"))
      .orderBy(col("activity_score").desc, col("zone_id"))
  }

  // ── typed surface ──────────────────────────────────────────────────────
  // Dataset[T] views of the serving shapes (ServingModels mirrors the
  // reference's pydantic response models). `.as[T]` compiles the row →
  // case-class mapping through the same Catalyst plan — no extra pass; it
  // adds schema enforcement at the API boundary (a renamed/retyped column
  // fails analysis here, not in a consumer).

  def recentTripsTyped(trips: DataFrame, now: Timestamp,
                       limit: Int = 100, hoursBack: Int = 24): Dataset[TripRecord] = {
    import trips.sparkSession.implicits._
    recentTrips(trips, now, limit, hoursBack).as[TripRecord]
  }

  def zoneMetricsTyped(trips: DataFrame, zones: DataFrame,
                       start: Timestamp, end: Timestamp): Dataset[ZoneMetricsRecord] = {
    import trips.sparkSession.implicits._
    zoneMetrics(trips, zones, start, end).as[ZoneMetricsRecord]
  }

  def hourlyTripCountsTyped(trips: DataFrame, now: Timestamp,
                            daysBack: Int = 7): Dataset[HourlyTripCountRecord] = {
    import trips.sparkSession.implicits._
    hourlyTripCounts(trips, now, daysBack).as[HourlyTripCountRecord]
  }

  def weatherImpactTyped(trips: DataFrame, start: Timestamp,
                         end: Timestamp): Dataset[WeatherImpactRecord] = {
    import trips.sparkSession.implicits._
    weatherImpact(trips, start, end).as[WeatherImpactRecord]
  }

  def demandPredictionTyped(trips: DataFrame, zones: DataFrame, now: Timestamp,
                            hoursAhead: Int = 24): Dataset[DemandPredictionRecord] = {
    import trips.sparkSession.implicits._
    demandPrediction(trips, zones, now, hoursAhead).as[DemandPredictionRecord]
  }

  def realTimeActivityTyped(trips: DataFrame, zones: DataFrame, now: Timestamp,
                            minutesBack: Int = 60): Dataset[RealTimeActivityRecord] = {
    import trips.sparkSession.implicits._
    realTimeActivity(trips, zones, now, minutesBack).as[RealTimeActivityRecord]
  }

  /** Typed dashboard summary (`serving/database.py:240-297` +
    * `serving/models.py`): today's totals, peak hour, top-5 zones. An API
    * endpoint shape — collects small aggregates to the driver by design. */
  case class ZoneRevenue(zone_name: String, trips: Long, revenue: Double)
  case class DashboardStats(
      total_trips_today: Long,
      total_revenue_today: Double,
      avg_fare_today: Double,
      active_zones: Long,
      peak_hour: String,
      top_zones: Seq[ZoneRevenue])

  def dashboardStats(spark: SparkSession, trips: DataFrame, zones: DataFrame,
                     now: Timestamp): DashboardStats = {
    val today = trips.filter(to_date(col("pickup_datetime")) === to_date(lit(now)))
    val paying = today.filter(col("fare_amount") > 0)
    val t = paying
      .agg(
        count(lit(1)).as("total_trips"),
        coalesce(sum(col("total_amount")), lit(0.0)).as("total_revenue"),
        coalesce(avg(col("fare_amount")), lit(0.0)).as("avg_fare"),
        countDistinct(col("pickup_location_id")).as("active_zones"))
      .collect()(0)
    val peak = today
      .groupBy(hour(col("pickup_datetime")).as("hour"))
      .agg(count(lit(1)).as("trip_count"))
      .orderBy(col("trip_count").desc, col("hour"))
      .limit(1).collect()
    val peakHour = if (peak.isEmpty) "N/A" else s"${peak(0).getAs[Int]("hour")}:00"
    val top = paying
      .join(zoneDim(zones), col("pickup_location_id") === col("z_location_id"), "left")
      .groupBy(coalesce(col("zone_name"), lit("Unknown")).as("zone_name"))
      .agg(count(lit(1)).as("trips"), sum(col("total_amount")).as("revenue"))
      .orderBy(col("revenue").desc, col("zone_name"))
      .limit(5)
      .collect()
      .map(r => ZoneRevenue(r.getAs[String]("zone_name"), r.getAs[Long]("trips"),
        r.getAs[Double]("revenue")))
    DashboardStats(
      t.getAs[Long]("total_trips"), t.getAs[Double]("total_revenue"),
      t.getAs[Double]("avg_fare"), t.getAs[Long]("active_zones"), peakHour, top.toSeq)
  }

  /** export_trips (`serving/api.py:334-352`) — a STUB in the reference
    * ("This would implement data export functionality"); implemented for
    * real here: the date-windowed trip slice written DISTRIBUTED as CSV
    * (with header) or JSON-lines, gzip-compressed (text sources don't
    * support parquet's zstd codec). The window filter
    * pushes into the scan, so export I/O is proportional to the window,
    * not the table; output file count follows the input partitioning
    * (repartition upstream to shape file sizes). Returns the row count
    * from `observe` — no second scan to count what was written. */
  def exportTrips(trips: DataFrame, start: Timestamp, end: Timestamp,
                  format: String, outDir: String): Long = {
    require(format == "csv" || format == "json", s"unsupported format: $format")
    val obs = new org.apache.spark.sql.Observation(s"graft_export_${System.nanoTime()}")
    val windowed = trips
      .filter(col("pickup_datetime") >= lit(start) && col("pickup_datetime") < lit(end))
      .observe(obs, count(lit(1)).as("n_rows"))
    val writer = windowed.write.mode("overwrite").option("compression", "gzip")
    if (format == "csv") writer.option("header", "true").csv(outDir)
    else writer.json(outDir)
    obs.get("n_rows").asInstanceOf[Long]
  }

  /** The HTTP boundary's parameter contract (`serving/api.py:82-338`):
    * every endpoint validates its paging/window params BEFORE any query
    * runs (FastAPI `Query(ge=…, le=…)` → 422) and bounds its response
    * size. These wrappers are that layer over the Spark surface — a
    * driver of this library gets the same rejection the HTTP layer gives,
    * and no endpoint can return an unbounded frame, however large the
    * lake. Bounds are the reference's own constants, cited per method. */
  object Api {
    private[taxi] def bound(name: String, v: Int, lo: Int, hi: Int): Int = {
      require(v >= lo && v <= hi,
        s"$name=$v out of bounds [$lo, $hi] (api.py Query(ge=$lo, le=$hi))")
      v
    }

    /** `/api/v1/trips/recent` (`api.py:82-83`): limit∈[1,1000],
      * hours_back∈[1,168]. */
    def recentTrips(trips: DataFrame, now: Timestamp,
                    limit: Int = 100, hoursBack: Int = 24): DataFrame =
      TaxiServing.recentTrips(trips, now,
        bound("limit", limit, 1, 1000),
        bound("hours_back", hoursBack, 1, 168))

    /** `/api/v1/analytics/zones` (`api.py:122`): limit∈[1,500], applied
      * on top of the metric query (the reference pages in the endpoint). */
    def zoneMetrics(trips: DataFrame, zones: DataFrame, start: Timestamp,
                    end: Timestamp, limit: Int = 50): DataFrame =
      TaxiServing.zoneMetrics(trips, zones, start, end)
        .limit(bound("limit", limit, 1, 500))

    /** `/api/v1/analytics/time-series` (`api.py:196-197`): metric from a
      * closed vocabulary, days_back∈[1,30]; output is the (timestamp,
      * value) series shape the charts consume. */
    def timeSeries(trips: DataFrame, now: Timestamp,
                   metric: String = "trip_count",
                   daysBack: Int = 7): DataFrame = {
      val metricCol = metric match {
        case "trip_count" => "trip_count"
        case "revenue"    => "total_revenue"
        case "avg_fare"   => "avg_fare"
        case other => throw new IllegalArgumentException(
          s"metric=$other not in {trip_count, revenue, avg_fare} (api.py:196)")
      }
      TaxiServing
        .hourlyTripCounts(trips, now, bound("days_back", daysBack, 1, 30))
        .select(col("hour").as("timestamp"),
          col(metricCol).cast("double").as("value"))
    }

    /** `/api/v1/predictions/demand` (`api.py:258-259,286`):
      * hours_ahead∈[1,168], top_zones∈[1,100]; the endpoint returns
      * `head(top_zones * min(hours_ahead, 24))` rows. */
    def demandPredictions(trips: DataFrame, zones: DataFrame, now: Timestamp,
                          hoursAhead: Int = 24, topZones: Int = 20): DataFrame =
      TaxiServing.demandPrediction(trips, zones, now,
          bound("hours_ahead", hoursAhead, 1, 168))
        .limit(bound("top_zones", topZones, 1, 100) * math.min(hoursAhead, 24))

    /** `/api/v1/realtime/activity` (`api.py:299`): minutes_back∈[5,240]. */
    def realTimeActivity(trips: DataFrame, zones: DataFrame, now: Timestamp,
                         minutesBack: Int = 60): DataFrame =
      TaxiServing.realTimeActivity(trips, zones, now,
        bound("minutes_back", minutesBack, 5, 240))

    /** Read-through TTL cache — the serving layer's 300 s result cache
      * (`serving/config.py:55`, `serving/dashboard.py:36`): dashboard
      * polls (10 s client timeout) re-read the cached result instead of
      * queueing identical aggregate jobs on the lake. Keys are
      * caller-chosen (endpoint + parameters); entries expire after
      * `ttlMs`; the map is bounded (expired-sweep at 1024 entries, the
      * endpoint-parameter space is enum-sized by the bounds above).
      * `nowMs` is injectable so the expiry contract is spec-testable. */
    private val resultCache =
      new java.util.concurrent.ConcurrentHashMap[String, (Long, Any)]()

    def cached[T](key: String, ttlMs: Long = 300000L,
                  nowMs: () => Long = () => System.currentTimeMillis())
                 (compute: => T): T = {
      require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
      val t = nowMs()
      resultCache.get(key) match {
        case (born, v) if t - born < ttlMs => v.asInstanceOf[T]
        case _ =>
          if (resultCache.size() > 1024)
            resultCache.entrySet().removeIf(e => t - e.getValue._1 >= ttlMs)
          val v = compute
          resultCache.put(key, (t, v))
          v
      }
    }

    /** [[TaxiServing.dashboardStats]] behind the 300 s cache window — the
      * `/api/v1/dashboard/stats` read path as the reference deploys it. */
    def cachedDashboardStats(spark: SparkSession, trips: DataFrame,
                             zones: DataFrame, now: Timestamp,
                             ttlMs: Long = 300000L,
                             nowMs: () => Long = () => System.currentTimeMillis())
        : DashboardStats =
      cached(s"dashboard_stats/$now", ttlMs, nowMs)(
        dashboardStats(spark, trips, zones, now))
  }

  /** The last hop of the reference's batch lifecycle (E1): publish a
    * derived lakehouse table into the serving database the API reads
    * (ETL → Postgres in `serving/database.py`'s world). Key-matched upsert
    * via [[graft.sources.Sources.jdbcUpsert]] so re-publishing after every
    * cycle CONVERGES — a repeated or replayed publish updates rows in
    * place, never accumulates. First publish creates the table from the
    * frame's (nullable) schema. `coalesceTo` bounds serving-database
    * connections regardless of lake-side parallelism.
    *
    * `varcharWidth` sizes every string column in the CREATE; values longer
    * than it make the insert fail (or truncate, dialect-dependent), so size
    * it to the widest value the serving table can ever carry — the width is
    * fixed at first publish and later publishes cannot widen it. */
  def publishToServingDb(spark: SparkSession, lakeTable: String, url: String,
                         servingTable: String, keyCols: Seq[String],
                         coalesceTo: Int = 8, varcharWidth: Int = 1024): Unit = {
    import graft.sources.Sources
    require(varcharWidth > 0, s"varcharWidth must be positive, got $varcharWidth")
    val df = spark.table(lakeTable).coalesce(coalesceTo)
    // append of zero rows = CREATE TABLE IF NOT EXISTS with this schema.
    // String columns are pinned to VARCHAR: several dialects (Derby, and
    // older DB2/Oracle mappings) default Spark strings to CLOB/TEXT types
    // that cannot sit in a WHERE equality — which the upsert's key match
    // needs.
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($varcharWidth)")
    val createOpts =
      if (stringCols.isEmpty) Map.empty[String, String]
      else Map("createTableColumnTypes" -> stringCols.mkString(", "))
    Sources.writeJdbc(df.limit(0), url, servingTable, mode = "append", createOpts)
    Sources.jdbcUpsert(df, url, servingTable, keyCols)
  }
}

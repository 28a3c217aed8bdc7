package graft.taxi

import java.sql.Timestamp

import graft.functions.Encoders._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The five derived-table builders of the reference's analytics/ML jobs
  * (`comprehensive_analytics.py`, `ml_feature_engineering.py`), as pure
  * functions over cleaned DataFrames in the Column DSL — no SQL strings.
  * `current_date()`/`current_timestamp()` anchoring is parameterized
  * (`now`, `loadDate`) per SURVEY §7 hard part 3.
  *
  * Scale posture: every builder filters its date window FIRST (predicate
  * reaches the partitioned scan), pre-aggregates before joining, broadcasts
  * the zones dimension, and partitions window functions by the
  * high-cardinality zone key. The reference's `DELETE+append` refresh is
  * `TableIO.refreshPartitions` over the builders' `year/month` (or
  * `feature_date`) output columns.
  */
object TaxiAnalytics {

  private def cutoff(now: Timestamp, days: Int) =
    date_sub(to_date(lit(now)), days).cast("timestamp")

  /** `analytics.trip_weather_correlation`
    * (`comprehensive_analytics.py:141-201`): hourly trip metrics ⟕ hourly
    * weather on (date, hour), grouped by (date, hour, condition). */
  def tripWeatherCorrelation(
      trips: DataFrame, weather: DataFrame, now: Timestamp, loadDate: Timestamp): DataFrame = {
    val tripHourly = trips
      .filter(col("pickup_datetime") >= cutoff(now, 1))
      .select(
        to_date(col("pickup_datetime")).as("trip_date"),
        hour(col("pickup_datetime")).as("hour"),
        col("pickup_location_id"),
        col("trip_distance"),
        col("fare_amount"),
        col("tip_amount"),
        ((unix_timestamp(col("dropoff_datetime")) - unix_timestamp(col("pickup_datetime"))) / 60)
          .as("trip_duration_minutes"))
    val weatherHourly = weather
      .filter(col("timestamp") >= cutoff(now, 1))
      .select(
        to_date(col("timestamp")).as("weather_date"),
        hour(col("timestamp")).as("w_hour"),
        col("weather_condition"),
        col("temperature_celsius"),
        col("humidity_percent"),
        col("wind_speed_kmh"))
    tripHourly
      .join(
        weatherHourly,
        col("trip_date") === col("weather_date") && col("hour") === col("w_hour"),
        "left")
      .groupBy(
        col("trip_date"),
        col("hour"),
        coalesce(col("weather_condition"), lit("unknown")).as("weather_condition"))
      .agg(
        avg(col("temperature_celsius")).as("temperature_celsius"),
        avg(col("humidity_percent")).as("humidity_percent"),
        avg(col("wind_speed_kmh")).as("wind_speed_kmh"),
        count(lit(1)).as("total_trips"),
        avg(col("trip_distance")).as("avg_trip_distance"),
        avg(col("fare_amount")).as("avg_fare_amount"),
        avg(col("tip_amount")).as("avg_tip_amount"),
        avg(col("trip_duration_minutes")).as("avg_trip_duration_minutes"),
        countDistinct(col("pickup_location_id")).as("pickup_zone_diversity"))
      .withColumn("load_date", lit(loadDate))
      .withColumn("year", year(col("trip_date")))
      .withColumn("month", month(col("trip_date")))
      .withColumn("day", dayofmonth(col("trip_date")))
  }

  /** `analytics.zone_performance_metrics`
    * (`comprehensive_analytics.py:219-317`): pickup metrics ⟕ dropoff
    * metrics ⟕ zones ⟕ per-day pickup stats, with the null-reject that
    * makes the zones join inner. */
  def zonePerformanceMetrics(
      trips: DataFrame, weather: DataFrame, zones: DataFrame,
      now: Timestamp, loadDate: Timestamp): DataFrame = {
    val tripData = trips
      .filter(col("pickup_datetime") >= cutoff(now, 1))
      .select(
        col("pickup_location_id"),
        col("dropoff_location_id"),
        to_date(col("pickup_datetime")).as("trip_date"),
        hour(col("pickup_datetime")).as("hour"),
        col("fare_amount"),
        col("tip_amount"),
        col("trip_distance"))
    val weatherData = weather
      .filter(col("timestamp") >= cutoff(now, 1))
      .select(
        to_date(col("timestamp")).as("weather_date"),
        hour(col("timestamp")).as("w_hour"),
        col("weather_condition"))
    val pickupMetrics = tripData
      .join(
        weatherData,
        col("trip_date") === col("weather_date") && col("hour") === col("w_hour"),
        "left")
      .groupBy(
        col("pickup_location_id").as("location_id"),
        col("trip_date"),
        col("hour"),
        coalesce(col("weather_condition"), lit("unknown")).as("weather_condition"))
      .agg(
        count(lit(1)).as("total_pickups"),
        avg(col("fare_amount")).as("avg_fare_per_pickup"),
        avg(
          when(col("fare_amount") > 0, col("tip_amount") / col("fare_amount") * 100)
            .otherwise(0.0)).as("avg_tip_percentage"),
        avg(col("trip_distance")).as("avg_trip_distance"))
    val dropoffMetrics = tripData
      .groupBy(
        col("dropoff_location_id").as("d_location_id"),
        col("trip_date").as("d_trip_date"),
        col("hour").as("d_hour"))
      .agg(count(lit(1)).as("total_dropoffs"))
    val hourlyPickupStats = pickupMetrics
      .groupBy(col("location_id").as("h_location_id"), col("trip_date").as("h_trip_date"))
      .agg(
        avg(col("total_pickups")).as("avg_hourly_pickups"),
        max(col("total_pickups")).as("max_hourly_pickups"))
    val zoneRef = broadcast(zones.select(
      col("location_id").as("z_location_id"),
      col("zone").as("zone_name"),
      col("borough"),
      col("zone_type"),
      col("is_tourist_area"),
      col("is_business_district")))
    pickupMetrics
      .join(
        dropoffMetrics,
        col("location_id") === col("d_location_id") &&
          col("trip_date") === col("d_trip_date") && col("hour") === col("d_hour"),
        "left")
      .join(zoneRef, col("location_id") === col("z_location_id"), "left")
      .join(
        hourlyPickupStats,
        col("location_id") === col("h_location_id") && col("trip_date") === col("h_trip_date"),
        "left")
      .filter(col("z_location_id").isNotNull) // P7 null-reject → inner
      .select(
        col("location_id"),
        col("zone_name"),
        col("borough"),
        col("zone_type"),
        col("is_tourist_area"),
        col("is_business_district"),
        col("trip_date"),
        col("hour"),
        col("weather_condition"),
        col("total_pickups"),
        coalesce(col("total_dropoffs"), lit(0L)).as("total_dropoffs"),
        col("avg_fare_per_pickup"),
        col("avg_tip_percentage"),
        col("avg_trip_distance"),
        when(col("avg_hourly_pickups") > 0, col("total_pickups") / col("avg_hourly_pickups"))
          .otherwise(1.0).as("peak_hour_factor"),
        weatherImpactScore(col("weather_condition")).as("weather_impact_score"),
        lit(loadDate).as("load_date"),
        year(col("trip_date")).as("year"),
        month(col("trip_date")).as("month"))
  }

  /** Shared hourly-demand grid: (zone, hour_timestamp, demand_count). */
  private def hourlyDemand(trips: DataFrame, now: Timestamp, days: Int): DataFrame =
    trips
      .filter(col("pickup_datetime") >= cutoff(now, days))
      .groupBy(
        col("pickup_location_id").as("location_id"),
        date_trunc("hour", col("pickup_datetime")).as("hour_timestamp"))
      .agg(count(lit(1)).as("demand_count"))

  /** `analytics.demand_prediction_features`
    * (`comprehensive_analytics.py:335-426`): 7-day demand grid with lag
    * 1/24/168 and rolling 7d/30d means, weather + zone features, emitted
    * for the last day only. */
  def demandPredictionFeatures(
      trips: DataFrame, weather: DataFrame, zones: DataFrame,
      now: Timestamp, loadDate: Timestamp): DataFrame = {
    val demand = hourlyDemand(trips, now, 7)
    val weatherFeatures = weather
      .filter(col("timestamp") >= cutoff(now, 7))
      .select(
        date_trunc("hour", col("timestamp")).as("w_hour_timestamp"),
        col("temperature_celsius"),
        col("weather_condition"))
    val zoneRef = broadcast(zones.select(
      col("location_id").as("z_location_id"),
      col("zone_type"),
      col("is_tourist_area"),
      col("is_business_district")))
    val w = Window.partitionBy(col("location_id")).orderBy(col("hour_timestamp"))
    demand
      .join(weatherFeatures, col("hour_timestamp") === col("w_hour_timestamp"), "left")
      .join(zoneRef, col("location_id") === col("z_location_id"), "left")
      .select(
        col("location_id"),
        col("hour_timestamp").as("prediction_datetime"),
        hour(col("hour_timestamp")).as("hour"),
        dayofweek(col("hour_timestamp")).as("day_of_week"),
        isWeekend(col("hour_timestamp")).as("is_weekend"),
        lit(false).as("is_holiday"),
        col("temperature_celsius"),
        coalesce(col("weather_condition"), lit("unknown")).as("weather_condition"),
        lag(col("demand_count"), 1).over(w).as("historical_demand_1h_ago"),
        lag(col("demand_count"), 24).over(w).as("historical_demand_24h_ago"),
        lag(col("demand_count"), 168).over(w).as("historical_demand_168h_ago"),
        avg(col("demand_count")).over(w.rowsBetween(-168, -1)).as("rolling_avg_demand_7d"),
        avg(col("demand_count")).over(w.rowsBetween(-720, -1)).as("rolling_avg_demand_30d"),
        col("zone_type"),
        col("is_tourist_area"),
        col("is_business_district"),
        col("demand_count").as("nearby_zones_demand"),
        weatherImpactFactor(col("weather_condition"), col("temperature_celsius"))
          .as("weather_impact_factor"),
        lit(1.0).as("event_factor"),
        lit(loadDate).as("load_date"),
        year(col("hour_timestamp")).as("year"),
        month(col("hour_timestamp")).as("month"))
      .filter(col("prediction_datetime") >= cutoff(now, 1))
  }

  /** `ml.demand_prediction_features` (`ml_feature_engineering.py:162-327`):
    * the richer ML variant — 30-day demand grid, encoded weather/zone
    * features, popularity decile, five lags, rolling mean/std, interaction
    * features, last-day emission keyed by `feature_date`.
    *
    * Deviation (documented): NTILE ties on avg demand are broken by
    * location_id so the decile is deterministic (SURVEY §7 hard part 4). */
  def mlDemandFeatures(
      trips: DataFrame, weather: DataFrame, zones: DataFrame,
      now: Timestamp, createdAt: Timestamp): DataFrame = {
    val demand30 = hourlyDemand(trips, now, 30)
    val weatherHourly = weather
      .filter(col("timestamp") >= cutoff(now, 30))
      .select(
        date_trunc("hour", col("timestamp")).as("w_hour_timestamp"),
        col("temperature_celsius"),
        col("humidity_percent"),
        col("wind_speed_kmh"),
        weatherConditionEncoded(col("weather_condition"), elseValue = 0.0)
          .as("weather_condition_encoded"))
    val zoneInfo = broadcast(zones.select(
      col("location_id").as("z_location_id"),
      col("is_tourist_area"),
      col("is_business_district"),
      zoneTypeEncoded(col("zone_type")).as("zone_type_encoded")))
    val zonePopularity = demand30
      .groupBy(col("location_id").as("p_location_id"))
      .agg(avg(col("demand_count")).as("avg_demand"))
      .select(
        col("p_location_id"),
        ntile(10)
          .over(Window.orderBy(col("avg_demand"), col("p_location_id")))
          .as("popularity_decile"))
    val w = Window.partitionBy(col("location_id")).orderBy(col("prediction_hour"))
    val featureBase = demand30
      .join(weatherHourly, col("hour_timestamp") === col("w_hour_timestamp"), "left")
      .join(zoneInfo, col("location_id") === col("z_location_id"), "left")
      .join(zonePopularity, col("location_id") === col("p_location_id"), "left")
      .filter(col("hour_timestamp") >= cutoff(now, 7))
      .select(
        col("location_id"),
        col("hour_timestamp").as("prediction_hour"),
        col("demand_count").as("target_demand"),
        hour(col("hour_timestamp")).as("hour_of_day"),
        dayofweek(col("hour_timestamp")).as("day_of_week"),
        dayofmonth(col("hour_timestamp")).as("day_of_month"),
        month(col("hour_timestamp")).as("month"),
        isWeekend(col("hour_timestamp")).as("is_weekend"),
        lit(false).as("is_holiday"),
        coalesce(col("temperature_celsius"), lit(20.0)).as("temperature_celsius"),
        coalesce(col("humidity_percent"), lit(50.0)).as("humidity_percent"),
        coalesce(col("wind_speed_kmh"), lit(5.0)).as("wind_speed_kmh"),
        coalesce(col("weather_condition_encoded"), lit(1.0)).as("weather_condition_encoded"),
        col("zone_type_encoded"),
        when(col("is_tourist_area"), 1).otherwise(0).as("is_tourist_area_flag"),
        when(col("is_business_district"), 1).otherwise(0).as("is_business_district_flag"),
        coalesce(col("popularity_decile").cast("double"), lit(5.0)).as("zone_popularity_score"))
    featureBase
      .select(
        col("*"),
        lag(col("target_demand"), 1).over(w).as("demand_1h_ago_raw"),
        lag(col("target_demand"), 24).over(w).as("demand_24h_ago_raw"),
        lag(col("target_demand"), 168).over(w).as("demand_168h_ago_raw"),
        lag(col("target_demand"), 2).over(w).as("demand_lag_2h_raw"),
        lag(col("target_demand"), 3).over(w).as("demand_lag_3h_raw"),
        avg(col("target_demand")).over(w.rowsBetween(-168, -1)).as("rolling_avg_7d_raw"),
        avg(col("target_demand")).over(w.rowsBetween(-720, -1)).as("rolling_avg_30d_raw"),
        stddev(col("target_demand")).over(w.rowsBetween(-168, -1)).as("rolling_std_7d_raw"))
      .filter(col("prediction_hour") >= cutoff(now, 1))
      .select(
        col("location_id"),
        col("prediction_hour"),
        col("target_demand"),
        col("hour_of_day"),
        col("day_of_week"),
        col("day_of_month"),
        col("month"),
        col("is_weekend"),
        col("is_holiday"),
        col("temperature_celsius"),
        col("humidity_percent"),
        col("wind_speed_kmh"),
        col("weather_condition_encoded"),
        coalesce(col("demand_1h_ago_raw"), lit(0L)).as("demand_1h_ago"),
        coalesce(col("demand_24h_ago_raw"), lit(0L)).as("demand_24h_ago"),
        coalesce(col("demand_168h_ago_raw"), lit(0L)).as("demand_168h_ago"),
        coalesce(col("rolling_avg_7d_raw"), lit(0.0)).as("rolling_avg_7d"),
        coalesce(col("rolling_avg_30d_raw"), lit(0.0)).as("rolling_avg_30d"),
        coalesce(col("rolling_std_7d_raw"), lit(1.0)).as("rolling_std_7d"),
        col("zone_type_encoded"),
        col("is_tourist_area_flag"),
        col("is_business_district_flag"),
        col("zone_popularity_score"),
        (col("temperature_celsius") * col("hour_of_day")).as("temp_hour_interaction"),
        (col("weather_condition_encoded") *
          when(col("is_weekend"), 1.0).otherwise(0.0)).as("weather_weekend_interaction"),
        (col("is_tourist_area_flag") *
          when(col("is_weekend"), 1.0).otherwise(0.0)).as("tourist_weekend_interaction"),
        coalesce(col("demand_lag_2h_raw"), lit(0L)).as("demand_lag_2h"),
        coalesce(col("demand_lag_3h_raw"), lit(0L)).as("demand_lag_3h"),
        coalesce(col("demand_168h_ago_raw"), lit(0L)).as("demand_same_hour_last_week"),
        to_date(col("prediction_hour")).as("feature_date"),
        lit(createdAt).as("created_at"))
  }

  /** `ml.fare_prediction_features` (`ml_feature_engineering.py:345-484`):
    * per-trip fare features — double zone join, weather join on the hour,
    * route-history and zone-hour self-aggregations, window-over-aggregate
    * surge factor, flat-earth distance, interactions; both zones required
    * (null-reject). */
  def mlFareFeatures(
      trips: DataFrame, weather: DataFrame, zones: DataFrame,
      now: Timestamp, createdAt: Timestamp): DataFrame = {
    val recent = trips.filter(col("pickup_datetime") >= cutoff(now, 7))
    val tripBase = recent
      .filter(col("fare_amount") > 0 && col("trip_distance") > 0)
      .select(
        concat(col("vendor_id").cast("string"), lit("_"),
          unix_timestamp(col("pickup_datetime")).cast("string")).as("trip_id"),
        col("fare_amount"),
        col("trip_distance"),
        ((unix_timestamp(col("dropoff_datetime")) - unix_timestamp(col("pickup_datetime"))) / 60)
          .as("trip_duration_minutes"),
        col("passenger_count"),
        col("pickup_location_id"),
        col("dropoff_location_id"),
        col("pickup_datetime"),
        hour(col("pickup_datetime")).as("pickup_hour"),
        dayofweek(col("pickup_datetime")).as("pickup_day_of_week"),
        isWeekend(col("pickup_datetime")).as("is_weekend"),
        isRushHour(col("pickup_datetime")).as("is_rush_hour"))
    def zoneSide(prefix: String) = broadcast(zones.select(
      col("location_id").as(s"${prefix}_zid"),
      col("borough").as(s"${prefix}_borough"),
      col("zone_type").as(s"${prefix}_zone_type"),
      col("latitude").as(s"${prefix}_lat"),
      col("longitude").as(s"${prefix}_lon"),
      graft.functions.Encoders.boroughEncoded(col("borough")).as(s"${prefix}_borough_encoded")))
    val weatherF = weather
      .filter(col("timestamp") >= cutoff(now, 7))
      .select(
        date_trunc("hour", col("timestamp")).as("w_hour_timestamp"),
        col("temperature_celsius").as("w_temp"),
        weatherConditionEncoded(col("weather_condition"), elseValue = 1.0)
          .as("w_condition_encoded"),
        col("weather_condition").isin("rain", "snow", "fog").as("w_is_bad"))
    val routeHistory = recent
      .groupBy(
        col("pickup_location_id").as("rh_pu"),
        col("dropoff_location_id").as("rh_do"))
      .agg(
        avg(col("fare_amount")).as("avg_fare_same_route_7d"),
        count(lit(1)).as("route_frequency"))
    val zoneHourly = recent
      .groupBy(
        col("pickup_location_id").as("zh_pu"),
        date_trunc("hour", col("pickup_datetime")).as("zh_hour"))
      .agg(avg(col("fare_amount")).as("avg_fare_pickup_zone_1h"), count(lit(1)).as("trips_in_hour"))
    val zw = Window.partitionBy(col("zh_pu"))
    val zoneHourlyStats = zoneHourly.select(
      col("zh_pu"), col("zh_hour"), col("avg_fare_pickup_zone_1h"),
      when(col("trips_in_hour") > avg(col("trips_in_hour")).over(zw) * 1.5, 1.2)
        .when(col("trips_in_hour") < avg(col("trips_in_hour")).over(zw) * 0.5, 0.8)
        .otherwise(1.0).as("surge_factor"))
    tripBase
      .join(zoneSide("pu"), col("pickup_location_id") === col("pu_zid"), "left")
      .join(zoneSide("do"), col("dropoff_location_id") === col("do_zid"), "left")
      .join(weatherF, date_trunc("hour", col("pickup_datetime")) === col("w_hour_timestamp"), "left")
      .join(
        routeHistory,
        col("pickup_location_id") === col("rh_pu") && col("dropoff_location_id") === col("rh_do"),
        "left")
      .join(
        zoneHourlyStats,
        col("pickup_location_id") === col("zh_pu") &&
          date_trunc("hour", col("pickup_datetime")) === col("zh_hour"),
        "left")
      .filter(col("pu_zid").isNotNull && col("do_zid").isNotNull) // both zones known
      .select(
        col("trip_id"),
        col("fare_amount"),
        col("trip_distance"),
        col("trip_duration_minutes"),
        col("passenger_count"),
        col("pickup_location_id").as("pickup_zone_id"),
        col("dropoff_location_id").as("dropoff_zone_id"),
        col("pu_borough_encoded").as("pickup_borough_encoded"),
        col("do_borough_encoded").as("dropoff_borough_encoded"),
        flatEarthKm(col("pu_lat"), col("pu_lon"), col("do_lat"), col("do_lon"))
          .as("zone_distance_km"),
        (col("pu_zone_type") === "airport" || col("do_zone_type") === "airport")
          .as("is_airport_trip"),
        (col("pu_borough") =!= col("do_borough")).as("is_cross_borough"),
        col("pickup_hour"),
        col("pickup_day_of_week"),
        col("is_rush_hour"),
        col("is_weekend"),
        coalesce(col("w_condition_encoded"), lit(1.0)).as("weather_condition_encoded"),
        coalesce(col("w_temp"), lit(20.0)).as("temperature_celsius"),
        coalesce(col("w_is_bad"), lit(false)).as("is_bad_weather"),
        coalesce(col("avg_fare_same_route_7d"), col("fare_amount")).as("avg_fare_same_route_7d"),
        coalesce(col("avg_fare_pickup_zone_1h"), col("fare_amount")).as("avg_fare_pickup_zone_1h"),
        coalesce(col("surge_factor"), lit(1.0)).as("surge_factor"),
        when(col("trip_duration_minutes") > 0,
          col("trip_distance") / (col("trip_duration_minutes") / 60.0))
          .otherwise(0.0).as("distance_duration_ratio"),
        (col("trip_distance") * coalesce(col("w_condition_encoded"), lit(1.0)))
          .as("weather_distance_interaction"),
        (col("trip_distance") * when(col("is_rush_hour"), 1.0).otherwise(0.0))
          .as("rush_hour_distance_interaction"),
        to_date(col("pickup_datetime")).as("feature_date"),
        lit(createdAt).as("created_at"))
  }
}

package graft.taxi

import java.sql.{Date, Timestamp}

/** Typed records for the serving-layer shapes — the Scala mirror of the
  * reference's pydantic response models (`serving/models.py:6-94`), adapted
  * to the lakehouse column names/types this engine serves. Each pairs with
  * a `*Typed` method on [[TaxiServing]] returning `Dataset[T]`; the typed
  * surface is what an API layer (the FastAPI analog) would consume, with
  * Option[_] marking exactly the fields the reference declares Optional.
  */
object ServingModels {

  /** `TripResponse` (`serving/models.py:6-22`); payment_type stays the
    * lakehouse int code (the reference stringifies at the HTTP edge). */
  final case class TripRecord(
      trip_id: String,
      vendor_id: Option[Int],
      pickup_datetime: Timestamp,
      dropoff_datetime: Option[Timestamp],
      passenger_count: Option[Int],
      trip_distance: Option[Double],
      pickup_location_id: Option[Int],
      dropoff_location_id: Option[Int],
      fare_amount: Option[Double],
      tip_amount: Option[Double],
      total_amount: Option[Double],
      payment_type: Option[Int])

  /** `ZoneMetrics` (`serving/models.py:25-34`); pickups/dropoffs collapse
    * into total_trips because the lakehouse query groups on the coalesced
    * zone id. */
  final case class ZoneMetricsRecord(
      zone_id: Int,
      zone_name: String,
      borough: String,
      total_trips: Long,
      avg_fare: Double,
      total_revenue: Double,
      avg_distance: Double,
      peak_hour_factor: Option[Double])

  /** `TimeSeriesData` flattened to rows (`serving/models.py:88-92`). */
  final case class HourlyTripCountRecord(
      hour: Timestamp,
      trip_count: Long,
      avg_fare: Double,
      total_revenue: Double)

  /** `WeatherImpact` (`serving/models.py:36-43`). */
  final case class WeatherImpactRecord(
      trip_date: Date,
      weather_condition: String,
      temperature_celsius: Double,
      humidity: Double,
      total_trips: Long,
      avg_fare_amount: Double,
      weather_impact_score: Double)

  /** `DemandPrediction` (`serving/models.py:45-52`). */
  final case class DemandPredictionRecord(
      location_id: Int,
      zone_name: String,
      prediction_hour: Timestamp,
      predicted_demand: Double,
      confidence_score: Double,
      weather_impact_factor: Double,
      historical_avg: Double)

  /** `RealTimeActivity` (`serving/models.py:54-61`). */
  final case class RealTimeActivityRecord(
      zone_id: Int,
      zone_name: String,
      activity_timestamp: Timestamp,
      activity_score: Double,
      pickup_count: Long,
      revenue_last_hour: Double,
      avg_wait_time: Option[Double])
}

package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-ETL builders for the three lakehouse inputs, as pure
  * `DataFrame => DataFrame` functions (SURVEY §7 module 2). The
  * non-deterministic `current_timestamp()` load-date of the reference is a
  * parameter so golden runs reproduce.
  *
  * Scale: all three are narrow scan→filter→project pipelines; the derived
  * `year/month/day` columns are the table partition keys at write time
  * (`TableIO`), giving file-level pruning to every date-windowed query
  * downstream.
  */
object TaxiIngest {

  /** Raw yellow-taxi parquet → cleaned 23-column `trips` rows
    * (`nyc_taxi_to_iceberg.py:90-136`: quality filters → renames →
    * derived partition cols → projection). */
  def cleanTrips(raw: DataFrame, loadDate: Timestamp): DataFrame =
    raw
      .filter(
        col("tpep_pickup_datetime").isNotNull &&
          col("tpep_dropoff_datetime").isNotNull &&
          col("trip_distance") > 0 &&
          col("fare_amount") > 0 &&
          col("total_amount") > 0 &&
          col("passenger_count").between(1, 6))
      .withColumnRenamed("VendorID", "vendor_id")
      .withColumnRenamed("tpep_pickup_datetime", "pickup_datetime")
      .withColumnRenamed("tpep_dropoff_datetime", "dropoff_datetime")
      .withColumnRenamed("RatecodeID", "rate_code_id")
      .withColumnRenamed("PULocationID", "pickup_location_id")
      .withColumnRenamed("DOLocationID", "dropoff_location_id")
      .withColumn("load_date", lit(loadDate))
      .withColumn("year", year(col("pickup_datetime")))
      .withColumn("month", month(col("pickup_datetime")))
      .withColumn("day", dayofmonth(col("pickup_datetime")))
      .select(
        col("vendor_id").cast("int"),
        col("pickup_datetime"),
        col("dropoff_datetime"),
        col("passenger_count").cast("int"),
        col("trip_distance"),
        col("rate_code_id").cast("int"),
        col("store_and_fwd_flag"),
        col("pickup_location_id").cast("int"),
        col("dropoff_location_id").cast("int"),
        col("payment_type").cast("int"),
        col("fare_amount"),
        col("extra"),
        col("mta_tax"),
        col("tip_amount"),
        col("tolls_amount"),
        col("improvement_surcharge"),
        col("total_amount"),
        col("congestion_surcharge"),
        col("airport_fee"),
        col("load_date"),
        col("year"),
        col("month"),
        col("day"))

  /** Raw weather JSON records → `weather.hourly_weather` rows
    * (`weather_to_iceberg.py:91-97`). */
  def cleanWeather(raw: DataFrame, loadDate: Timestamp): DataFrame =
    raw
      .withColumn("timestamp", col("timestamp").cast("timestamp"))
      .withColumn("load_date", lit(loadDate))
      .withColumn("year", year(col("timestamp")))
      .withColumn("month", month(col("timestamp")))
      .withColumn("day", dayofmonth(col("timestamp")))
      .filter(col("timestamp").isNotNull)

  /** Raw zone records → `reference.taxi_zones` dimension
    * (`location_to_iceberg.py:81-87`: lat/lon renames + casts). */
  def cleanZones(raw: DataFrame, loadDate: Timestamp): DataFrame =
    raw
      .withColumn("created_at", col("created_at").cast("timestamp"))
      .withColumn("load_date", lit(loadDate))
      .withColumnRenamed("lat", "latitude")
      .withColumnRenamed("lon", "longitude")
}

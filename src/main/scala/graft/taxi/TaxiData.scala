package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Taxi-domain schemas (FIXTURES.md §1-§5) and the deterministic fixture
  * generator standing in for the reference's sample-data tasks
  * (`nyc_taxi_iceberg_etl.py:127-171`, `nyc_weather_etl.py:60-95`,
  * zone seed list `nyc_weather_etl.py:132-156`). Fixed seed, fixed "now"
  * anchor — no wall-clock anywhere (SURVEY §7 hard part 3).
  */
object TaxiData {

  /** Raw yellow-taxi schema — exact 19 columns of
    * `data/raw/yellow_tripdata_2025-10.parquet`. */
  val rawTripSchema: StructType = StructType(Seq(
    StructField("VendorID", LongType),
    StructField("tpep_pickup_datetime", TimestampType),
    StructField("tpep_dropoff_datetime", TimestampType),
    StructField("passenger_count", LongType),
    StructField("trip_distance", DoubleType),
    StructField("RatecodeID", LongType),
    StructField("store_and_fwd_flag", StringType),
    StructField("PULocationID", LongType),
    StructField("DOLocationID", LongType),
    StructField("payment_type", LongType),
    StructField("fare_amount", DoubleType),
    StructField("extra", DoubleType),
    StructField("mta_tax", DoubleType),
    StructField("tip_amount", DoubleType),
    StructField("tolls_amount", DoubleType),
    StructField("improvement_surcharge", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("congestion_surcharge", DoubleType),
    StructField("airport_fee", DoubleType)))

  /** Hourly weather record (FIXTURES.md §4). */
  val weatherSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType), // cast on ingest, like the reference
    StructField("location", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("temperature_celsius", DoubleType),
    StructField("temperature_fahrenheit", DoubleType),
    StructField("humidity_percent", DoubleType),
    StructField("pressure_hpa", DoubleType),
    StructField("wind_speed_kmh", DoubleType),
    StructField("weather_condition", StringType),
    StructField("visibility_km", DoubleType),
    StructField("uv_index", DoubleType),
    StructField("hour", IntegerType),
    StructField("day_of_week", IntegerType),
    StructField("is_weekend", BooleanType)))

  /** Taxi-zone dimension record pre-ingest (FIXTURES.md §5; `lat`/`lon`
    * renamed on ingest). */
  val rawZoneSchema: StructType = StructType(Seq(
    StructField("location_id", IntegerType),
    StructField("borough", StringType),
    StructField("zone", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("zone_type", StringType),
    StructField("is_tourist_area", BooleanType),
    StructField("is_business_district", BooleanType),
    StructField("created_at", StringType)))

  /** The fixed test anchor ("now"). */
  val anchor: Timestamp = Timestamp.valueOf("2025-10-24 12:00:00")

  private val zoneSeed: Seq[(Int, String, String, Double, Double, String, Boolean, Boolean)] = Seq(
    (132, "Queens", "JFK Airport", 40.6413, -73.7781, "airport", false, false),
    (138, "Queens", "LaGuardia Airport", 40.7769, -73.874, "airport", false, false),
    (161, "Manhattan", "Midtown Center", 40.7549, -73.984, "business", false, true),
    (162, "Manhattan", "Midtown East", 40.7527, -73.9772, "business", false, true),
    (186, "Manhattan", "Penn Station", 40.7506, -73.9935, "transit", true, true),
    (230, "Manhattan", "Times Sq", 40.758, -73.9855, "tourist", true, false),
    (234, "Manhattan", "Union Sq", 40.7359, -73.9911, "mixed", true, true),
    (90,  "Manhattan", "Flatiron", 40.7411, -73.9897, "business", false, true),
    (68,  "Manhattan", "East Chelsea", 40.7465, -74.0014, "neighborhood", false, false),
    (100, "Manhattan", "Garment District", 40.7547, -73.9916, "business", false, true),
    (33,  "Brooklyn", "Brooklyn Heights", 40.6958, -73.9936, "neighborhood", false, false),
    (65,  "Brooklyn", "Downtown Bklyn", 40.6928, -73.9876, "business", false, true),
    (181, "Brooklyn", "Park Slope", 40.6711, -73.9814, "neighborhood", true, false),
    (7,   "Queens", "Astoria", 40.7644, -73.9235, "neighborhood", false, false),
    (82,  "Queens", "Elmhurst", 40.7365, -73.8779, "neighborhood", false, false),
    (244, "Bronx", "Yankee Stadium", 40.8296, -73.9262, "stadium", true, false))

  /** Zone ids referenced by generated trips: the seed list plus one id that
    * is ABSENT from the dimension (exercises the left-join null-reject,
    * FIXTURES.md §5). */
  private val tripZoneIds: Seq[Int] = zoneSeed.map(_._1) :+ 999

  /** Raw zone dimension rows (16 zones; ≥2 boroughs, airports, flags). */
  def rawZones(spark: SparkSession): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rows = zoneSeed.map { case (id, b, z, la, lo, zt, t, biz) =>
      org.apache.spark.sql.Row(id, b, z, la, lo, zt, t, biz, "2025-10-24T04:40:32.301469")
    }
    spark.createDataFrame(rows.asJava, rawZoneSchema)
  }

  /** Deterministic raw trips over the `days` window ending at [[anchor]],
    * including rows violating every cleaning rule
    * (`nyc_taxi_to_iceberg.py:90-96`). */
  def rawTrips(spark: SparkSession, n: Int, days: Int = 7, seed: Long = 42L): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val anchorMs = anchor.getTime
    val rows = (0 until n).map { i =>
      val pickupMs = anchorMs - (rnd.nextDouble() * days * 86400000L).toLong
      val durMin = 3 + rnd.nextInt(57)
      val pickup = new Timestamp(pickupMs)
      val dropoff = new Timestamp(pickupMs + durMin * 60000L)
      val dist = math.rint(-2.0 * math.log(1 - rnd.nextDouble()) * 100) / 100
      val fare = math.rint((3.0 - 10.0 * math.log(1 - rnd.nextDouble())) * 100) / 100
      val tip = math.rint(fare * rnd.nextInt(4) * 0.05 * 100) / 100
      val tolls = if (rnd.nextInt(10) == 0) 6.55 else 0.0
      val total = math.rint((fare + 0.5 + 0.3 + tip + tolls) * 100) / 100
      // violation injection: ~5% of rows break exactly one rule
      val violation = if (rnd.nextInt(20) == 0) 1 + rnd.nextInt(5) else 0
      org.apache.spark.sql.Row(
        (1 + rnd.nextInt(2)).toLong,
        if (violation == 1) null else pickup,
        if (violation == 2) null else dropoff,
        (if (violation == 3) 0 else 1 + rnd.nextInt(5)).toLong,
        if (violation == 4) 0.0 else dist,
        1L.+(rnd.nextInt(5)).toLong,
        if (rnd.nextInt(50) == 0) "Y" else "N",
        tripZoneIds(rnd.nextInt(tripZoneIds.size)).toLong,
        tripZoneIds(rnd.nextInt(tripZoneIds.size)).toLong,
        (1 + rnd.nextInt(4)).toLong,
        if (violation == 5) -1.0 else fare,
        0.5, 0.5, tip, tolls, 0.3, total, 2.5, 0.0)
    }
    spark.createDataFrame(rows.asJava, rawTripSchema)
  }

  /** Deterministic hourly weather over the window: cycles all five known
    * conditions plus an unknown one (the encoders must see it,
    * FIXTURES.md §4). */
  def rawWeather(spark: SparkSession, days: Int = 7, seed: Long = 7L): DataFrame = {
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(seed)
    val conditions = Seq("clear", "cloudy", "rain", "snow", "fog", "hail")
    val anchorMs = anchor.getTime
    val hours = days * 24
    val rows = (0 until hours).map { h =>
      val ts = new Timestamp(anchorMs - h * 3600000L)
      val tempC = math.rint((18 + 14 * math.sin(h / 24.0) + rnd.nextDouble() * 4) * 100) / 100
      org.apache.spark.sql.Row(
        ts.toString.replace(' ', 'T'),
        "NYC", 40.7128, -74.006,
        tempC, math.rint((tempC * 9 / 5 + 32) * 100) / 100,
        math.rint((40 + rnd.nextDouble() * 40) * 10) / 10,
        1013.0 + rnd.nextInt(20),
        math.rint(rnd.nextDouble() * 30 * 10) / 10,
        conditions(h % conditions.size),
        math.rint(rnd.nextDouble() * 20 * 10) / 10,
        math.rint(rnd.nextDouble() * 10 * 10) / 10,
        ts.toLocalDateTime.getHour,
        1 + (h / 24) % 7,
        false)
    }
    spark.createDataFrame(rows.asJava, weatherSchema)
  }
}

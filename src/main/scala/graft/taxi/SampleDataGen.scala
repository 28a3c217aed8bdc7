package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sample trip generator — SURVEY §7 module 2, mirroring the
  * reference's `data-generator/data_generator.py:102-161` distributions:
  * 70% of coordinates drawn from the 11 popular-location hotspots with
  * ±0.01° jitter (30% uniform in the NYC bounding box), flat-earth
  * distance at 69 mi/°, clamp [0.1, 50], 2–8 min/mile duration, weighted
  * passenger/payment mixes, and the simplified meter
  * (2.50 base + 2.50/mi + 0.50/min, card tips 15–25%, MTA tax, toll and
  * extra lotteries).
  *
  * Spark-first and scale-ready where the reference is a driver loop over
  * psycopg2 inserts: rows come from `spark.range(n)` and every "random"
  * draw is `xxhash64(seed, id, tag)` mapped to [0,1) — a pure projection,
  * no shuffle, embarrassingly parallel. Hash-derived draws (instead of
  * `rand(seed)`, which seeds PER PARTITION) make the output a function of
  * (seed, n, now) alone: any partitioning, any cluster, same rows — the
  * same portability doctrine as [[graft.functions.PortableHash]]. `now` is
  * an explicit parameter, not a wall-clock read, for the same reason. */
object SampleDataGen {

  /** (lat, lon) of the reference's popular_locations, in its order. */
  private val popular: Seq[(Double, Double)] = Seq(
    (40.7589, -73.9851), // Times Square
    (40.7505, -73.9934), // Penn Station
    (40.7527, -73.9772), // Empire State Building
    (40.7614, -73.9776), // Central Park
    (40.7282, -74.0776), // Financial District
    (40.6892, -73.9442), // Brooklyn Heights
    (40.6782, -73.9442), // Park Slope
    (40.7282, -73.7949), // Jackson Heights
    (40.7505, -73.8803), // Elmhurst
    (40.6413, -73.7781), // JFK Airport
    (40.7769, -73.8740)) // LaGuardia Airport

  private val MinLat = 40.4774; private val MaxLat = 40.9176
  private val MinLon = -74.2591; private val MaxLon = -73.7004

  /** Deterministic uniform [0,1) draw number `tag` for this row. */
  private def u(seed: Long, tag: Int): Column =
    pmod(xxhash64(lit(seed), col("id"), lit(tag)), lit(1000000000L))
      .cast("double") / lit(1e9)

  /** Weighted categorical: thresholds over one uniform draw. */
  private def weighted(draw: Column, values: Seq[Int], weights: Seq[Int]): Column = {
    val total = weights.sum.toDouble
    val cumulative = weights.scanLeft(0)(_ + _).tail.map(_ / total)
    cumulative.zip(values).init.foldRight(lit(values.last): Column) {
      case ((threshold, value), rest) => when(draw < threshold, value).otherwise(rest)
    }
  }

  private def pick(draw: Column, xs: Seq[Double]): Column =
    element_at(array(xs.map(lit): _*), (floor(draw * xs.size) + 1).cast("int"))

  /** `n` trips in the reference's exact output shape. One narrow
    * projection over `spark.range`; no shuffle, no driver loop. */
  def trips(spark: SparkSession, n: Long, now: Timestamp,
            seed: Long = 42L, numPartitions: Int = 32): DataFrame = {
    val base = spark.range(0, n, 1, numPartitions).toDF("id")

    val usePopular = u(seed, 0) < 0.7
    def hotspot(draw: Column, coords: Seq[Double]): Column = pick(draw, coords)
    val pickupLat = when(usePopular,
      hotspot(u(seed, 1), popular.map(_._1)) + (u(seed, 3) * 0.02 - 0.01))
      .otherwise(lit(MinLat) + u(seed, 1) * (MaxLat - MinLat))
    val pickupLon = when(usePopular,
      hotspot(u(seed, 1), popular.map(_._2)) + (u(seed, 4) * 0.02 - 0.01))
      .otherwise(lit(MinLon) + u(seed, 5) * (MaxLon - MinLon))
    val dropoffLat = when(usePopular,
      hotspot(u(seed, 2), popular.map(_._1)) + (u(seed, 6) * 0.02 - 0.01))
      .otherwise(lit(MinLat) + u(seed, 2) * (MaxLat - MinLat))
    val dropoffLon = when(usePopular,
      hotspot(u(seed, 2), popular.map(_._2)) + (u(seed, 7) * 0.02 - 0.01))
      .otherwise(lit(MinLon) + u(seed, 8) * (MaxLon - MinLon))

    // flat-earth distance (reference calculate_distance), clamped [0.1, 50]
    val rawDist = round(
      sqrt(pow(abs(pickupLat - dropoffLat), 2) + pow(abs(pickupLon - dropoffLon), 2)) * 69, 2)
    val dist = greatest(lit(0.1), least(rawDist, lit(50.0)))

    val pickupTime = lit(now) - make_dt_interval(
      lit(0), lit(0),
      floor(u(seed, 9) * 61).cast("int"),
      floor(u(seed, 10) * 60).cast("double"))
    val durationMin = greatest(lit(1),
      floor(dist * (lit(2.0) + u(seed, 11) * 6.0)).cast("int"))
    val dropoffTime = pickupTime + make_dt_interval(lit(0), lit(0), durationMin, lit(0.0))

    val passengerCount = weighted(u(seed, 12),
      Seq(1, 2, 3, 4, 5, 6), Seq(50, 30, 10, 5, 3, 2))
    val paymentType = weighted(u(seed, 13), Seq(1, 2, 3, 4), Seq(60, 30, 5, 5))

    val fare = round(lit(2.50) + dist * 2.50 + durationMin * 0.50, 2)
    val extra = when(u(seed, 14) < 0.3, pick(u(seed, 15), Seq(0.0, 0.50, 1.00)))
      .otherwise(lit(0.0))
    val mtaTax = lit(0.50) // fare is always > 0 by construction
    val tip = when(paymentType === 1,
      round(fare * (lit(0.15) + u(seed, 16) * 0.10), 2)).otherwise(lit(0.0))
    val tolls = when(u(seed, 17) < 0.1, pick(u(seed, 18), Seq(0.0, 5.76, 6.50, 9.75)))
      .otherwise(lit(0.0))

    base.select(
      weighted(u(seed, 19), Seq(1, 2), Seq(1, 1)).as("vendor_id"),
      pickupTime.as("pickup_datetime"),
      dropoffTime.as("dropoff_datetime"),
      passengerCount.as("passenger_count"),
      dist.as("trip_distance"),
      pickupLon.as("pickup_longitude"),
      pickupLat.as("pickup_latitude"),
      dropoffLon.as("dropoff_longitude"),
      dropoffLat.as("dropoff_latitude"),
      paymentType.as("payment_type"),
      fare.as("fare_amount"),
      extra.as("extra"),
      mtaTax.as("mta_tax"),
      tip.as("tip_amount"),
      tolls.as("tolls_amount"),
      round(fare + extra + mtaTax + tip + tolls, 2).as("total_amount"))
  }
}

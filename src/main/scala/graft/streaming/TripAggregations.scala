package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two streaming aggregation stages of the reference's CDC processor,
  * re-expressed for Structured Streaming.
  *
  * Stage 1 — [[TripAggregations.aggregate]]: watermark + 5-minute tumbling
  * window per pickup zone (reference `realtime_cdc_processor.py:159-182`,
  * ST1/ST2/A8). The reference calls `countDistinct` inside the streaming
  * aggregation, which Spark rejects; per SURVEY §2.9 defect (a) the rebuild
  * uses `approx_count_distinct` — the correct 100 TB posture anyway (HLL
  * sketches merge associatively across state-store updates).
  *
  * Stage 2 — [[ZoneActivity.score]]: the stateless scoring projection of the
  * cascade's second query (`realtime_cdc_processor.py:206-227`, ST6), with
  * the reference's bugs fixed per SURVEY §2.9: `top_destination_zone` is an
  * explicitly-typed null int column and `dropoff_count` is 0 (defect (b));
  * `revenue_last_hour` keeps the reference's actual semantics — the
  * 5-minute-window revenue relabeled (defect (c), documented not copied).
  *
  * Both are `DataFrame => DataFrame` so batch tests and streaming wiring
  * share one code path; the streaming graph is:
  * {{{
  *   spark.readStream(...)                        // Kafka in prod; file/
  *     .transform(Cdc.parseTrips)                 // MemoryStream in tests
  *     .transform(TripAggregations.aggregate)
  *     .writeStream.outputMode("append")
  *     .trigger(Trigger.ProcessingTime("30 seconds"))
  *     .option("checkpointLocation", ...)         // ST5
  * }}}
  */
object TripAggregations {

  /** Stream-static enrichment: parsed CDC trips joined to the (broadcast)
    * zones dimension before aggregation — the standard realtime-enrichment
    * shape the reference lacks (its activity feed emits bare zone ids).
    * Stream-static joins are stateless: each micro-batch joins against the
    * current static table snapshot, no state store involved. */
  def enrichWithZones(trips: DataFrame, zones: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    trips.join(
      broadcast(zones.select(
        col("location_id").as("z_location_id"),
        col("zone").as("zone_name"),
        col("borough"))),
      trips("pickup_location_id") === col("z_location_id"),
      "left")
      .drop("z_location_id")
  }

  /** Stream-STREAM join: the trips stream joined to a live weather
    * observation stream on the shared event-time hour (window-equality
    * join). Both sides carry watermarks, so Spark bounds the join state:
    * a buffered row is dropped once the other side's watermark passes its
    * window — state is O(rows per active hour), not unbounded. This is the
    * shape the reference cannot express (its CDC consumer only ever sees
    * one topic); a realtime demand-vs-weather feed needs it.
    *
    * Inner join: rows emit as soon as both sides arrive. The left-outer
    * variant ([[joinTripWeatherStreamsOuter]]) emits null-padded trips only
    * once the global watermark passes the hour — same plan shape, deferred
    * emission for the unmatched side. */
  def joinTripWeatherStreams(trips: DataFrame, weather: DataFrame): DataFrame =
    joinOnEventHour(trips, weather, "inner")

  /** Left-outer window-equality stream-stream join: every trip eventually
    * emits — matched rows as soon as the observation arrives, unmatched
    * rows null-padded once the watermark closes their hour and the buffered
    * trip is evicted from the state store. Use when downstream must account
    * for every trip even during weather-feed outages. */
  def joinTripWeatherStreamsOuter(trips: DataFrame, weather: DataFrame): DataFrame =
    joinOnEventHour(trips, weather, "left_outer")

  private def joinOnEventHour(trips: DataFrame, weather: DataFrame, joinType: String): DataFrame = {
    // each side keeps exactly ONE event-time column: the hour window
    // derived from its watermarked timestamp (carrying both the raw
    // timestamp and its window through the join would be two event-time
    // columns on one stream, which Spark rejects)
    val t = trips
      .withWatermark("kafka_timestamp", "10 minutes")
      .select(
        window(col("kafka_timestamp"), "1 hour").as("hour_window"),
        col("id"), col("pickup_location_id"),
        col("fare_amount"), col("total_amount"))
    val w = weather
      .withWatermark("observed_at", "2 hours")
      .select(
        window(col("observed_at"), "1 hour").as("hour_window"),
        col("condition"),
        col("temperature_celsius"))
    t.join(w, Seq("hour_window"), joinType)
      .select(
        col("hour_window.start").as("hour_start"),
        col("id"), col("pickup_location_id"), col("fare_amount"),
        col("total_amount"), col("condition"), col("temperature_celsius"))
  }

  /** Watermarked 5-minute tumbling window aggregation per pickup zone.
    * Output schema mirrors `realtime.trip_aggregations`
    * (`realtime_cdc_processor.py:42-57`, FIXTURES.md §7). */
  def aggregate(trips: DataFrame): DataFrame =
    trips
      .withWatermark("kafka_timestamp", "10 minutes") // ST1: 10-min lateness
      .groupBy(
        window(col("kafka_timestamp"), "5 minutes"), // ST2: tumbling 5-min
        col("pickup_location_id").as("pickup_zone_id"))
      .agg(
        count(lit(1)).as("total_trips"),
        sum(col("total_amount")).as("total_revenue"),
        avg(col("trip_distance")).as("avg_trip_distance"),
        avg(col("fare_amount")).as("avg_fare_amount"),
        approx_count_distinct(col("vendor_id")).as("unique_vendors"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("pickup_zone_id"),
        col("total_trips"),
        col("total_revenue"),
        col("avg_trip_distance"),
        col("avg_fare_amount"),
        col("unique_vendors"))
}

/** Stage 2 of the cascade — see [[TripAggregations]] scaladoc. */
object ZoneActivity {

  /** The activity-score formula (reference `realtime_cdc_processor.py:
    * 213-216`), defined ONCE and shared by the streaming scorer below and
    * the batch twin (`Analytics.zoneActivityBatch`, q59): the batch copy is
    * what the DuckDB hash gate checks, so sharing the expression is what
    * makes that check actually cover the streaming arithmetic. */
  def activityScore(trips: org.apache.spark.sql.Column,
                    revenue: org.apache.spark.sql.Column,
                    uniques: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trips * 0.4 + revenue / 100.0 * 0.4 + uniques * 0.2

  /** Stateless re-projection + activity scoring of the windowed aggregates
    * (reference `realtime_cdc_processor.py:206-227`). Output schema mirrors
    * `realtime.zone_activity` (`:62-77`). */
  def score(aggs: DataFrame): DataFrame =
    aggs.select(
      col("pickup_zone_id").as("zone_id"),
      col("window_start").as("activity_timestamp"),
      col("total_trips").as("pickup_count"),
      lit(0L).as("dropoff_count"),                       // defect (b) fixed
      col("total_revenue").as("revenue_last_hour"),      // defect (c): window revenue relabeled
      col("avg_fare_amount").as("avg_fare_last_hour"),
      lit(null).cast("int").as("top_destination_zone"),  // defect (b) fixed
      activityScore(col("total_trips"), col("total_revenue"),
        col("unique_vendors")).as("activity_score")) // A9 post-agg scoring
}

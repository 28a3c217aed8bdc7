package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDC envelope parsing — the Debezium-style double `from_json` pipeline of
  * the reference's streaming processor (`realtime_cdc_processor.py:101-156`):
  * an outer envelope `{op, ts_ms, before, after, source{db,table,ts_ms}}`
  * whose `after` field is itself a JSON *string* (not a nested object), so
  * the payload needs a second `from_json` (reference `:108`).
  *
  * All transforms here are stateless column expressions, usable unchanged on
  * a batch DataFrame or a streaming one — the streaming graph is assembled
  * in [[TripAggregations]]/[[ZoneActivity]].
  */
object Cdc {

  /** Outer Debezium envelope (reference `realtime_cdc_processor.py:104-114`;
    * fixture shape FIXTURES.md §6). */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField("before", StringType),
    StructField("after", StringType),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType),
      StructField("ts_ms", LongType))))))

  /** Trip payload carried in `after` (reference
    * `realtime_cdc_processor.py:135-146`). */
  val tripSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("vendor_id", IntegerType),
    StructField("pickup_datetime", TimestampType),
    StructField("dropoff_datetime", TimestampType),
    StructField("pickup_location_id", IntegerType),
    StructField("dropoff_location_id", IntegerType),
    StructField("trip_distance", DoubleType),
    StructField("fare_amount", DoubleType),
    StructField("total_amount", DoubleType)))

  /** Parse raw Kafka-style records into clean trip rows.
    *
    * Input: a DataFrame with `value: String` (the envelope JSON) and
    * `kafka_timestamp: Timestamp` (ingest time — the reference watermarks on
    * ingest time, `realtime_cdc_processor.py:160`).
    *
    * Steps (all from the reference): envelope parse → keep creates/updates
    * only (`op IN ('c','u')`, `:126-128`; deletes are dropped — ST7) →
    * payload parse → `trip.*` expansion (P8) → quality filter: non-null
    * zone + positive fare (`:152-156`, P6).
    */
  def parseTrips(raw: DataFrame): DataFrame =
    raw
      .select(
        from_json(col("value"), envelopeSchema).as("envelope"),
        col("kafka_timestamp"))
      .select(
        col("envelope.op").as("operation"),
        col("envelope.ts_ms").as("event_ts_ms"),
        col("envelope.source.table").as("source_table"),
        col("envelope.after").as("after"),
        col("kafka_timestamp"))
      .filter(col("operation").isin("c", "u"))
      .filter(col("after").isNotNull)
      .select(
        from_json(col("after"), tripSchema).as("trip"),
        col("operation"),
        col("kafka_timestamp"))
      .select(col("trip.*"), col("operation"), col("kafka_timestamp"))
      .filter(
        col("pickup_location_id").isNotNull &&
          col("fare_amount").isNotNull && col("fare_amount") > 0 &&
          col("total_amount").isNotNull && col("total_amount") > 0)

  /** The Kafka-Connect Iceberg-sink replacement (S13): unwrap `after` into
    * typed rows for a raw CDC table, keeping the op code and source commit
    * timestamp, with deletes represented as a soft-delete flag (the
    * connector rewrites deletes; reference
    * `data-crawler/iceberg-sink-config.json:27-33`). Append-ready: at scale
    * this partitions on `hour(source_ts)` like the reference's
    * `hour(source_ts_ms)` hidden transform. */
  def unwrapForRawTable(raw: DataFrame): DataFrame =
    raw
      .select(from_json(col("value"), envelopeSchema).as("e"), col("kafka_timestamp"))
      .filter(col("e.op").isin("c", "u", "d"))
      .select(
        col("e.op").as("op"),
        (col("e.op") === "d").as("is_deleted"),
        timestamp_millis(col("e.source.ts_ms")).as("source_ts"),
        from_json(
          when(col("e.op") === "d", col("e.before")).otherwise(col("e.after")),
          tripSchema).as("trip"),
        col("kafka_timestamp"))
      .select(
        col("trip.*"),
        col("op"),
        col("is_deleted"),
        col("source_ts"),
        hour(col("source_ts")).as("source_hour"),
        col("kafka_timestamp"))
}

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

  /** The MERGE half of the Kafka-Connect sink (S13's apply step): upsert a
    * micro-batch of CDC rows into a keyed, date-partitioned parquet serving
    * table — creates/updates replace the row with the same `id`, deletes
    * remove it, latest source commit wins within the batch.
    *
    * Plain parquet has no row-level MERGE, so the apply is a
    * PARTITION-SCOPED rewrite (the standard copy-on-write contract):
    *
    *  1. reduce the batch to its newest row per key (one window over the
    *     micro-batch only — never the table);
    *  2. the touched partitions are exactly the batch rows' `part_date`s
    *     (delete envelopes carry the original row in `before`, so a
    *     delete's partition is known without consulting the table; the
    *     partition date is derived from `pickup_datetime`, immutable per
    *     key — the usual CDC contract that the partition key is a creation
    *     attribute);
    *  3. read ONLY those partitions (partition-pruned scan), drop rows
    *     whose key appears in the batch, union the batch's survivors;
    *  4. dynamic-partition-overwrite the touched partitions
    *     ([[graft.sources.TableIO.refreshPartitions]]).
    *
    * Cost per batch is O(bytes of touched partitions), not table size —
    * at 100 TB CDC touches recent dates, so the rewrite set stays small
    * and bounded. The rewrite is deterministic from (table, batch), so a
    * foreachBatch retry overwrites the same partitions with the same
    * bytes — idempotent, which is what makes foreachBatch's at-least-once
    * delivery effectively exactly-once here. */
  def applyCdcBatch(table: String, batch: DataFrame): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    // timestamp ties (one transaction, same source commit millisecond)
    // resolve by op semantics, not lexicographic order: the delete
    // dominates (the key's final state in that commit), an update beats
    // the create's initial values. Neither ASC nor DESC on the op string
    // gives d > u > c, so the priority is explicit.
    val opPriority = when(col("op") === "d", 3)
      .when(col("op") === "u", 2).otherwise(1)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("source_ts").desc, col("kafka_timestamp").desc, opPriority.desc)
    val latest = batch
      .filter(col("id").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      // part_date must never be null: a null would fall out of the
      // null-unsafe partition joins below (silently losing the default
      // partition's rows) and is undroppable by partition spec. Rows
      // whose payload lacks the creation attribute partition by source
      // commit date instead; the epoch sentinel is unreachable while the
      // envelope carries source.ts_ms.
      .withColumn("part_date",
        coalesce(to_date(col("pickup_datetime")), to_date(col("source_ts")),
          lit(java.sql.Date.valueOf("1970-01-01"))))
      .localCheckpoint() // one materialization feeds keys, survivors, and partitions
    val survivors = latest.filter(!col("is_deleted"))
      .drop("op", "is_deleted", "source_hour", "kafka_timestamp")
    graft.sources.TableIO.ensureTable(spark, table, survivors, Seq("part_date"))
    val touched = latest.select(col("part_date")).distinct()
    val existing = spark.table(table).join(broadcast(touched), Seq("part_date"), "left_semi")
    // STAGE the merged rows before swapping: the merge reads the very files
    // the overwrite will replace, so it must fully materialize first (the
    // copy-on-write write-new-then-swap contract; at cluster scale this is
    // a staging path, here localCheckpoint). Without it the overwrite can
    // race its own input's file listing.
    val merged = existing
      .join(broadcast(latest.select(col("id"))), Seq("id"), "left_anti")
      .unionByName(survivors.select(existing.columns.map(col): _*))
      .localCheckpoint()
    // dynamic partition overwrite only replaces partitions PRESENT in the
    // written data — a partition whose last rows were all deleted would
    // silently survive; drop those explicitly (partition-metadata op)
    val emptied = touched
      .join(merged.select(col("part_date")).distinct(), Seq("part_date"), "left_anti")
      .collect()
    emptied.foreach { r =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (part_date = '${r.getDate(0)}')")
    }
    graft.sources.TableIO.refreshPartitions(spark, table, merged)
    spark.catalog.refreshTable(table)
  }

  /** Streaming upsert sink: [[unwrapForRawTable]] rows applied per
    * micro-batch through [[applyCdcBatch]] via foreachBatch — the complete
    * Kafka-Connect-sink replacement (capture + apply), checkpointed and
    * restart-safe. */
  def upsertSink(unwrapped: DataFrame, table: String, checkpoint: String,
                 triggerMs: Long = 1000): org.apache.spark.sql.streaming.StreamingQuery =
    unwrapped.writeStream
      .foreachBatch((b: DataFrame, _: Long) => applyCdcBatch(table, b))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .start()
}

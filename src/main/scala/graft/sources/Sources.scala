package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Source/sink bindings beyond plain parquet scans (SURVEY §2.1).
  *
  * S2 — JSON batch scans: the reference loads JSON driver-side
  * (`json.load` → `createDataFrame`, `weather_to_iceberg.py:81-85`); the
  * rebuild reads distributed with an EXPLICIT schema (inference is an
  * implementation detail of the reference, and a full pre-scan at 100 TB).
  *
  * S4/S5 — streaming sources: Kafka in production; locally the seam is a
  * file source over a directory (same micro-batch semantics, no broker).
  * `streamFromTableDir` is the second hop of the reference's cascade
  * (stream-reading the table the first query writes,
  * `realtime_cdc_processor.py:200-203`).
  *
  * S11 — streaming sink: parquet file sink with checkpoint + processing
  * -time trigger, mirroring `writeStream.format("iceberg")...
  * .option("checkpointLocation", ...)` (`realtime_cdc_processor.py:185-192`).
  */
object Sources {

  /** S2: JSON batch scan with explicit schema. `multiLine` handles the
    * reference's array-of-records drops (`data/raw/taxi_data_*.json`). */
  def readJson(spark: SparkSession, path: String, schema: StructType,
               multiLine: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** CSV batch scan with explicit schema and quarantined corrupt rows —
    * the other universal landing-zone format. Same doctrine as
    * [[readJson]]: never `inferSchema` (a full extra pass at 100 TB, and
    * a schema that silently changes when the data does). Malformed lines
    * land in `_corrupt_record` instead of failing the stage or being
    * silently dropped — the ingest job decides whether to fail, quarantine
    * or count them (`observe` on `_corrupt_record IS NOT NULL`). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("header", header)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** ORC batch scan — Spark's reader pushes filters and prunes columns
    * exactly as with parquet (asserted in SourcesSpec), so tables landed
    * by ORC-native writers join the lakehouse without conversion. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S5: streaming source over a parquet directory (the table-stream seam;
    * swap for `readStream.format("kafka")` in production). */
  def streamFromTableDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** S11: checkpointed parquet streaming sink with a processing-time
    * trigger (30 s in the reference; parameterized for tests). */
  def parquetSink[T](
      writer: DataStreamWriter[T],
      outDir: String,
      checkpointDir: String,
      triggerMs: Long = 30000): StreamingQuery =
    writer
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()
}

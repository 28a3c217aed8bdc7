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

  /** S6: JDBC batch scan — the entry point for the reference's Postgres
    * serving database (`serving/database.py:16-24`). Single-connection
    * form; use [[readJdbcPartitioned]] for any table that matters at
    * scale. Catalyst pushes filters and prunes columns into the generated
    * SQL (asserted in SourcesSpec), so a filtered scan ships WHERE clauses
    * to the database instead of rows to the cluster. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    options.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
  }

  /** S6 at scale: range-partitioned parallel JDBC scan — `numPartitions`
    * concurrent connections, each reading one stride of
    * `partitionColumn` ∈ [lowerBound, upperBound]. This is the only JDBC
    * shape that survives a large table: the single-connection form funnels
    * everything through one executor. Bounds come from the database
    * (`SELECT min(pk), max(pk)`) or a watermark table, NOT from a Spark
    * pre-scan. */
  def readJdbcPartitioned(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      options: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    options.foreach { case (k, v) => reader.option(k, v) }
    reader.load()
  }

  /** Serving-side JDBC load: the reference's ETL publishes aggregate
    * tables INTO Postgres for the API layer; this is that hop. `Overwrite`
    * with `truncate=true` keeps the table's grants/indexes (a DROP+CREATE
    * would not). Batched inserts; one connection per partition — coalesce
    * small aggregates before calling to avoid connection storms. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "append",
                options: Map[String, String] = Map.empty): Unit = {
    val writer = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      // case-insensitive like DataFrameWriter.mode itself, or "Overwrite"
      // would silently DROP+CREATE (losing grants/indexes) instead of
      // truncating
      .option("truncate", mode.equalsIgnoreCase("overwrite"))
      .mode(mode)
    options.foreach { case (k, v) => writer.option(k, v) }
    writer.save()
  }

  private def jdbcTypeOf(dt: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType       => java.sql.Types.BIGINT
      case IntegerType    => java.sql.Types.INTEGER
      case ShortType      => java.sql.Types.SMALLINT
      case ByteType       => java.sql.Types.TINYINT
      case DoubleType     => java.sql.Types.DOUBLE
      case FloatType      => java.sql.Types.FLOAT
      case BooleanType    => java.sql.Types.BOOLEAN
      case StringType     => java.sql.Types.VARCHAR
      case TimestampType  => java.sql.Types.TIMESTAMP
      case DateType       => java.sql.Types.DATE
      case _: DecimalType => java.sql.Types.NUMERIC
      case BinaryType     => java.sql.Types.BINARY
      case _              => java.sql.Types.OTHER
    }
  }

  /** Key-matched upsert of `df` into a JDBC table: batched
    * UPDATE-then-INSERT inside one transaction per partition — runs ON
    * THE EXECUTORS, never collects to the driver. The two-step form is
    * the portable upsert (MERGE exists everywhere but its source grammar
    * differs — Derby rejects VALUES sources; ON CONFLICT is
    * Postgres-only). Key matching is null-safe (`k = ? OR (k IS NULL AND
    * ? IS NULL)`), so NULL-keyed aggregate rows update in place instead
    * of inserting a duplicate per replay; NULL values bind through
    * `setNull` with the column's SQL type (bare `setObject(_, null)` is
    * driver-defined). Updates run as ONE JDBC batch (one round trip, not
    * one per row); rows the batch reports unmatched insert as a second
    * batch. Drivers that return SUCCESS_NO_INFO for batches fall back to
    * a row-by-row pass — correct everywhere, batched where the driver
    * cooperates. A partition that fails mid-transaction rolls back
    * explicitly before the connection closes (close-with-open-transaction
    * is implementation-defined — some databases commit).
    *
    * Row-disjoint partitions cannot race on a key: aggregate output in
    * update mode carries each key exactly once, and the groupBy has
    * already co-located keys. Replaying a batch upserts the same keys to
    * the same values — idempotent. (MySQL deployments must keep the
    * connector's default found-rows semantics; with `useAffectedRows=true`
    * a value-identical replayed UPDATE reports 0 and would re-insert.)
    * Serving aggregates are small by construction; `coalesce` the frame
    * first if the partition count would open more connections than the
    * database wants. */
  def jdbcUpsert(df: DataFrame, url: String, table: String,
                 keyCols: Seq[String]): Unit = {
    val cols = df.schema.fieldNames.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains),
      s"keyCols $keyCols must be columns of the frame (${cols.mkString(", ")})")
    val nonKeys = cols.filterNot(keyCols.contains)
    require(nonKeys.nonEmpty,
      "keyCols covers every column — nothing to update; use writeJdbc append")
    // Spark's JDBC writer creates QUOTED (case-sensitive) column names;
    // unquoted identifiers here would be case-folded by the database and
    // miss them. The table name stays unquoted — the writer leaves it so.
    def quoted(c: String) = "\"" + c + "\""
    val updateSql =
      s"UPDATE $table SET ${nonKeys.map(c => s"${quoted(c)} = ?").mkString(", ")} " +
        s"WHERE ${keyCols
          .map(k => s"(${quoted(k)} = ? OR (${quoted(k)} IS NULL AND ? IS NULL))")
          .mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.map(quoted).mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val colIdx = cols.zipWithIndex.toMap
    val sqlType = df.schema.fields.map(f => f.name -> jdbcTypeOf(f.dataType)).toMap
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val update = conn.prepareStatement(updateSql)
          val insert = conn.prepareStatement(insertSql)
          def bind(ps: java.sql.PreparedStatement, idx: Int, c: String, r: Row): Unit =
            if (r.isNullAt(colIdx(c))) ps.setNull(idx, sqlType(c))
            else ps.setObject(idx, r.get(colIdx(c)))
          def bindUpdate(r: Row): Unit = {
            var i = 1
            nonKeys.foreach { c => bind(update, i, c, r); i += 1 }
            keyCols.foreach { k => bind(update, i, k, r); bind(update, i + 1, k, r); i += 2 }
          }
          def doInsert(r: Row): Unit = {
            cols.zipWithIndex.foreach { case (c, i) => bind(insert, i + 1, c, r) }
            insert.addBatch()
          }
          // serving aggregates are small by contract; buffering the
          // partition lets the updates go out as one round trip
          val buffered = rows.toVector
          buffered.foreach { r => bindUpdate(r); update.addBatch() }
          val counts = update.executeBatch()
          if (counts.contains(java.sql.Statement.SUCCESS_NO_INFO)) {
            // no per-statement counts from this driver: re-run row-by-row
            // (value-identical re-updates are idempotent) to learn misses
            buffered.foreach { r =>
              bindUpdate(r)
              if (update.executeUpdate() == 0) doInsert(r)
            }
          } else {
            buffered.zip(counts).foreach { case (r, c) =>
              if (c == java.sql.Statement.EXECUTE_FAILED) {
                // driver reported a per-statement failure WITHOUT throwing
                // BatchUpdateException: re-run the row alone so the real
                // error surfaces (or, if the report was spurious, the true
                // match count routes it to update/insert correctly) —
                // treating it as "updated" would silently lose the row
                bindUpdate(r)
                if (update.executeUpdate() == 0) doInsert(r)
              } else if (c == 0) doInsert(r)
            }
          }
          insert.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback()
            catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
    }
  }

  /** S11+S6: streaming publish into the serving database — the realtime
    * half of the reference's serving story (stream aggregates feeding the
    * API's Postgres) as a checkpointed foreachBatch over [[jdbcUpsert]].
    * Update output mode + key-matched upsert make the sink effectively
    * exactly-once: a batch replayed after crash recovery upserts the same
    * keys to the same values. */
  def jdbcUpsertSink(df: DataFrame, url: String, table: String,
                     keyCols: Seq[String], checkpointDir: String,
                     triggerMs: Long = 30000): StreamingQuery =
    df.writeStream
      .foreachBatch((batch: DataFrame, _: Long) =>
        jdbcUpsert(batch, url, table, keyCols))
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(triggerMs))
      .start()

  /** S5: streaming source over a parquet directory (the table-stream seam;
    * swap for `readStream.format("kafka")` in production). */
  def streamFromTableDir(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** True if the spark-sql-kafka connector is on the classpath. The
    * container image ships no kafka jar, so local runs use the
    * file/MemoryStream seam; a cluster with the connector flips this gate
    * with zero code changes. */
  def kafkaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** S4: the real Kafka streaming source binding
    * (`realtime_cdc_processor.py:90-98`) — value + event timestamp in the
    * exact shape [[graft.streaming.Cdc.parseTrips]] consumes, identical to
    * what the file seam feeds it in tests. Gated on [[kafkaAvailable]] so
    * a missing connector fails fast with the deployment fix, not a
    * ClassNotFoundException mid-plan. */
  def streamFromKafka(spark: SparkSession, bootstrapServers: String,
                      topic: String,
                      startingOffsets: String = "latest"): DataFrame = {
    require(kafkaAvailable,
      "spark-sql-kafka-0-10 connector not on classpath; deploy with " +
        "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark version> " +
        "(local tests use Sources.streamFromTableDir / MemoryStream instead)")
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .selectExpr("CAST(value AS STRING) AS value",
        "timestamp AS kafka_timestamp")
  }

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

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

  // ─────────────── landing-zone round-trips (oracle-gated demos) ────────────

  /** Clear and return a scratch directory under the warehouse. Same replace
    * discipline as `TableIO.dropTableAndLocation`: a stale directory from a
    * previous process must not leak rows into this run's read-back. */
  private def scratchDir(spark: SparkSession, name: String): String = {
    val path = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path)) fs.delete(path, true)
    path.toString
  }

  private def demoSuffix(t: graft.core.Tables): String =
    (t.dir.hashCode & 0x7fffffff).toHexString

  /** q132: S2 driven end-to-end under the hash gate — documents written as
    * JSON Lines, read back DISTRIBUTED with the explicit schema (never
    * inferSchema — SURVEY §1.3), then aggregated per (lang, source). The
    * oracle replays the aggregate from the parquet originals, so a row or
    * character lost or mangled in the JSON encode/decode hop breaks the
    * hash; `sum(length(text))` rides the check so the text payload itself —
    * not just row counts — is pinned across the escape/unescape cycle.
    * Ref: `weather_to_iceberg.py:81-85` (JSON landing zone). */
  def jsonRoundTripDemo(t: graft.core.Tables): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = t.spark
    val dir = scratchDir(spark, s"graft_json_demo_${demoSuffix(t)}")
    t.documents.write.mode("overwrite").json(dir)
    val schema = StructType.fromDDL(
      "doc_id bigint, text string, lang string, source string, n_chars bigint")
    readJson(spark, dir, schema, multiLine = false)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"), col("source"))
  }

  /** DuckDB mirror of [[jsonRoundTripDemo]] — the same aggregate straight
    * off the parquet originals (a faithful round-trip is invisible). */
  val jsonRoundTripDemoSql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q133: CSV landing-zone round-trip — orders written as quoted CSV with
    * header, read back via [[readCsv]] (explicit schema, PERMISSIVE with a
    * `_corrupt_record` quarantine column), aggregated per status. The
    * quarantine count rides the output: a faithful writer/reader pair
    * produces zero corrupt rows, and any quoting/escaping defect in either
    * direction surfaces as a nonzero count (schema drift) or a hash break
    * (value drift). Doubles survive because Spark writes shortest
    * round-trip representations. */
  def csvRoundTripDemo(t: graft.core.Tables): DataFrame = {
    import graft.functions.ExactAgg
    import org.apache.spark.sql.functions._
    val spark = t.spark
    val dir = scratchDir(spark, s"graft_csv_demo_${demoSuffix(t)}")
    t.orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType.fromDDL(
      "o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
        "o_totalprice double, o_orderpriority string")
    val back = readCsv(spark, dir, schema)
    back
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        ExactAgg.dsum(col("o_totalprice")).as("sum_price"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"))
      .orderBy(col("o_orderstatus"))
  }

  /** DuckDB mirror of [[csvRoundTripDemo]]. */
  val csvRoundTripDemoSql: String = {
    val O = graft.functions.ExactAgg.Sql
    s"""SELECT o_orderstatus, count(*) AS n_orders,
       |  ${O.dsum("o_totalprice")} AS sum_price,
       |  count(DISTINCT o_orderpriority) AS n_priorities,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       |  CAST(0 AS BIGINT) AS n_corrupt
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q134: ORC landing-zone round-trip — a lineitem projection written as
    * zstd ORC, read back via [[readOrc]], aggregated per return flag with
    * the exact decimal kernels. ORC is the one columnar landing format the
    * suite's tables don't already exercise; SourcesSpec pins its
    * filter-pushdown parity with parquet, this row pins value fidelity
    * through the write/read cycle (timestamps included, via the shipdate
    * year bounds). */
  def orcRoundTripDemo(t: graft.core.Tables): DataFrame = {
    import graft.functions.ExactAgg
    import org.apache.spark.sql.functions._
    val spark = t.spark
    val dir = scratchDir(spark, s"graft_orc_demo_${demoSuffix(t)}")
    t.lineitem
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_returnflag"), col("l_shipdate"))
      .write.mode("overwrite").option("compression", "zstd").orc(dir)
    readOrc(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_lines"),
        ExactAgg.dsum(col("l_quantity")).as("sum_qty"),
        ExactAgg.dsumRevenue(col("l_extendedprice"), col("l_discount"))
          .as("sum_revenue"),
        min(year(col("l_shipdate"))).cast("int").as("min_ship_year"),
        max(year(col("l_shipdate"))).cast("int").as("max_ship_year"))
      .orderBy(col("l_returnflag"))
  }

  /** q135: S6 driven end-to-end under the hash gate — orders published into
    * an embedded Derby database via [[writeJdbc]] (truncate-overwrite, the
    * serving-reload contract), read back with [[readJdbcPartitioned]] (4
    * concurrent range-strided connections — the only JDBC shape that
    * survives a large table), aggregated per status. Partition bounds come
    * from the DATABASE (a 1-row min/max aggregate pushed to Derby), not a
    * Spark pre-scan. The oracle replays the aggregate from the parquet
    * originals, so type mapping, truncation, or stride drift (a row lost or
    * doubled at a partition boundary) breaks the hash.
    * Ref: `serving/database.py:16-24` (the Postgres serving scan). */
  def jdbcRoundTripDemo(t: graft.core.Tables): DataFrame = {
    import graft.functions.ExactAgg
    import org.apache.spark.sql.functions._
    val spark = t.spark
    val url = s"jdbc:derby:memory:graft_jdbc_demo_${demoSuffix(t)};create=true"
    writeJdbc(
      t.orders.select(col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority")),
      url, "orders_serving", mode = "overwrite")
    // identifiers quoted: Spark's JDBC writer creates case-exact quoted
    // columns, and Derby uppercases anything unquoted in the pushed query
    val bounds = readJdbc(spark, url,
      """(SELECT min("o_orderkey") lo, max("o_orderkey") hi
        | FROM orders_serving) b""".stripMargin)
      .collect().head
    readJdbcPartitioned(spark, url, "orders_serving", "o_orderkey",
      bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        ExactAgg.dsum(col("o_totalprice")).as("sum_price"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** DuckDB mirror of [[jdbcRoundTripDemo]]. */
  val jdbcRoundTripDemoSql: String = {
    val O = graft.functions.ExactAgg.Sql
    s"""SELECT o_orderstatus, count(*) AS n_orders,
       |  ${O.dsum("o_totalprice")} AS sum_price,
       |  count(DISTINCT o_orderpriority) AS n_priorities,
       |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** DuckDB mirror of [[orcRoundTripDemo]]. */
  val orcRoundTripDemoSql: String = {
    val O = graft.functions.ExactAgg.Sql
    s"""SELECT l_returnflag, count(*) AS n_lines,
       |  ${O.dsum("l_quantity")} AS sum_qty,
       |  ${O.dsumRevenue("l_extendedprice", "l_discount")} AS sum_revenue,
       |  CAST(min(year(l_shipdate)) AS INTEGER) AS min_ship_year,
       |  CAST(max(year(l_shipdate)) AS INTEGER) AS max_ship_year
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin
  }
}

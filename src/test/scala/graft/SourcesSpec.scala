package graft

import java.nio.file.Files

import graft.sources.Sources
import graft.taxi.TaxiData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Source/sink bindings: JSON batch scan with explicit schema (S2), and
  * the checkpointed file-source → file-sink streaming path (S5/S11/ST5)
  * including restart-resume from the checkpoint. */
class SourcesSpec extends SparkSpec {

  test("readJson parses an array-of-records drop with the declared schema (S2)") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "taxi_data_1.json")
    Files.writeString(f.toPath,
      """[{"vendor_id": 2, "pickup_datetime": "2025-10-23T04:43:37", "passenger_count": 4,
        |  "trip_distance": 15.1, "fare_amount": 26.85, "total_amount": 35.39},
        | {"vendor_id": 1, "pickup_datetime": "2025-10-23T05:00:00", "passenger_count": 1,
        |  "trip_distance": 2.0, "fare_amount": 7.5, "total_amount": 9.0}]""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "vendor_id INT, pickup_datetime TIMESTAMP, passenger_count INT, " +
        "trip_distance DOUBLE, fare_amount DOUBLE, total_amount DOUBLE")
    val df = Sources.readJson(spark, f.getAbsolutePath, schema)
    assert(df.count() == 2)
    assert(df.schema.fieldNames.contains("pickup_datetime"))
    assert(df.agg(sum(col("fare_amount"))).head.getDouble(0) == 34.35)
  }

  test("file-source stream → checkpointed parquet sink, resume after restart (S5/S11/ST5)") {
    val base = Files.createTempDirectory("graft_stream").toFile.getAbsolutePath
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    new java.io.File(inDir).mkdirs()

    val trips = graft.taxi.TaxiIngest.cleanTrips(
      TaxiData.rawTrips(spark, 300, days = 2),
      java.sql.Timestamp.valueOf("2025-10-24 12:00:00"))
    val schema = trips.schema
    trips.limit(100).write.mode("append").parquet(inDir)

    // stateless projection stream (the S13-style raw hop); file sinks are
    // append-only, so aggregations would need a watermark — covered in
    // StreamingSpec
    def startRawQuery() = Sources.parquetSink(
      Sources.streamFromTableDir(spark, inDir, schema)
        .select(col("pickup_location_id"), col("total_amount"))
        .writeStream,
      outDir, ckDir, triggerMs = 100)

    val q1 = startRawQuery()
    q1.processAllAvailable()
    q1.stop()
    val count1 = spark.read.parquet(outDir).count()
    assert(count1 == 100, s"first batch wrote $count1")

    // new file arrives while the query is DOWN; restart must resume from
    // the checkpoint and process only the new file
    trips.limit(150).write.mode("append").parquet(inDir)
    val q2 = startRawQuery()
    q2.processAllAvailable()
    q2.stop()
    val count2 = spark.read.parquet(outDir).count()
    assert(count2 == 250, s"after resume expected 250 rows, got $count2 (dupes or loss)")
  }

  test("full streaming cascade over file sinks: CDC parse -> windowed agg -> scoring (ST6)") {
    val base = Files.createTempDirectory("graft_cascade").toFile.getAbsolutePath
    val inDir = s"$base/in"; val agg1 = s"$base/agg"; val act = s"$base/activity"
    import spark.implicits._

    def env(id: Long, zone: Int, ts: String): (String, java.sql.Timestamp) = {
      val after = s"""{\\"id\\": $id, \\"vendor_id\\": 1, \\"pickup_location_id\\": $zone, """ +
        s"""\\"trip_distance\\": 2.0, \\"fare_amount\\": 10.0, \\"total_amount\\": 12.0}"""
      (s"""{"op": "c", "ts_ms": 1, "after": "$after", """ +
        s""""source": {"db": "d", "table": "t", "ts_ms": 1}}""",
        java.sql.Timestamp.valueOf(ts))
    }

    // stage 1: raw envelope files -> parse -> watermarked window agg -> parquet
    Seq(env(1, 5, "2024-01-01 10:00:30"), env(2, 5, "2024-01-01 10:01:00"))
      .toDF("value", "kafka_timestamp").write.mode("append").parquet(inDir)
    val stage1 = Sources.streamFromTableDir(spark, inDir,
        org.apache.spark.sql.types.StructType.fromDDL(
          "value STRING, kafka_timestamp TIMESTAMP"))
      .transform(graft.streaming.Cdc.parseTrips)
      .transform(graft.streaming.TripAggregations.aggregate)
    val q1 = Sources.parquetSink(stage1.writeStream, agg1, s"$base/ck1", triggerMs = 100)
    q1.processAllAvailable()
    // advance the watermark so the 10:00 window closes
    Seq(env(9, 6, "2024-01-01 10:30:00")).toDF("value", "kafka_timestamp")
      .write.mode("append").parquet(inDir)
    q1.processAllAvailable()
    Seq(env(10, 6, "2024-01-01 10:31:00")).toDF("value", "kafka_timestamp")
      .write.mode("append").parquet(inDir)
    q1.processAllAvailable()
    q1.stop()
    val windows = spark.read.parquet(agg1)
    assert(windows.count() >= 1, "stage 1 emitted no closed windows")

    // stage 2: stream-read stage 1's sink (the reference's second hop),
    // stateless scoring, its own checkpointed sink
    val q2 = Sources.parquetSink(
      Sources.streamFromTableDir(spark, agg1, windows.schema)
        .transform(graft.streaming.ZoneActivity.score)
        .writeStream, act, s"$base/ck2", triggerMs = 100)
    q2.processAllAvailable()
    q2.stop()
    val activity = spark.read.parquet(act)
    assert(activity.count() == windows.count())
    val z5 = activity.filter(org.apache.spark.sql.functions.col("zone_id") === 5).collect()
    assert(z5.length == 1 && z5.head.getAs[Long]("pickup_count") == 2)
  }

  test("readCsv: explicit schema, malformed rows quarantined not dropped") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(base, "drop.csv")
    java.nio.file.Files.writeString(f.toPath,
      """id,name,amount
        |1,alpha,10.5
        |2,beta,20.25
        |oops,this-row-is,not,valid,at-all
        |3,gamma,30.0
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, name STRING, amount DOUBLE")
    val df = Sources.readCsv(spark, f.getAbsolutePath, schema).cache()
    val good = df.filter(col("_corrupt_record").isNull)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 3)
    assert(good.filter(col("id") === 2).collect()(0).getAs[String]("name") == "beta")
    // the malformed line is quarantined verbatim, never silently dropped
    assert(bad.count() == 1)
    assert(bad.collect()(0).getAs[String]("_corrupt_record").startsWith("oops"))
  }

  test("readOrc round-trips and pushes filters to the ORC scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_orc").toFile.getAbsolutePath
    val df = (1 to 1000).map(i => (i.toLong, s"n$i", i * 1.5)).toDF("id", "name", "amount")
    df.write.orc(s"$base/t")
    val back = Sources.readOrc(spark, s"$base/t")
    assert(back.count() == 1000)
    val q = back.filter(col("id") === 7L).select(col("name"))
    assert(q.collect()(0).getString(0) == "n7")
    // ORC gets the same scan-level treatment as parquet: predicate pushed,
    // columns pruned
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"), plan.take(800))
  }

  test("JDBC round-trip via embedded Derby: write, read, partitioned read, pushdown (S6)") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graft_sources_spec;create=true"
    val rows = (1 to 200).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    Sources.writeJdbc(rows, url, "serving_scores", mode = "overwrite")
    // plain scan round-trips
    val back = Sources.readJdbc(spark, url, "serving_scores")
    assert(back.count() == 200)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == (1L to 200L))
    // range-partitioned scan: same rows, parallel connections
    val part = Sources.readJdbcPartitioned(
      spark, url, "serving_scores", "id", 1L, 200L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == 200)
    // filters reach the database as generated SQL, not cluster-side scans
    val filtered = Sources.readJdbc(spark, url, "serving_scores")
      .filter(col("id") <= 10).select("id", "name")
    assert(filtered.count() == 10)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual"),
      plan.take(800))
    // overwrite with truncate is idempotent (the serving-reload contract)
    Sources.writeJdbc(rows.filter(col("id") <= 50), url, "serving_scores",
      mode = "overwrite")
    assert(Sources.readJdbc(spark, url, "serving_scores").count() == 50)
  }

  test("streaming aggregate upserts into Derby: updates in place, replay-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val url = "jdbc:derby:memory:graft_upsert_spec;create=true"
    val events = MemoryStream[(Int, Double)]
    val agg = events.toDF().toDF("zone", "amount")
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_trips"), sum(col("amount")).as("revenue"))
    // create the serving table with the aggregate's schema (nullable, as
    // streaming aggregate output is), then stream
    Sources.writeJdbc(
      Seq.empty[(Option[Int], Option[Long], Option[Double])]
        .toDF("zone", "n_trips", "revenue"),
      url, "zone_totals", mode = "overwrite")
    val ck = java.nio.file.Files.createTempDirectory("graft_upsert_ck").toString
    val q = Sources.jdbcUpsertSink(agg, url, "zone_totals", Seq("zone"), ck, triggerMs = 50)
    try {
      events.addData((1, 10.0), (1, 5.0), (2, 7.0))
      q.processAllAvailable()
      val after1 = Sources.readJdbc(spark, url, "zone_totals")
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(after1 == Map(1 -> (2L, 15.0), 2 -> (1L, 7.0)))
      // same keys again: rows UPDATE in place (no duplicates), new key inserts
      events.addData((1, 1.0), (3, 2.0))
      q.processAllAvailable()
      val after2 = Sources.readJdbc(spark, url, "zone_totals")
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(after2 == Map(1 -> (3L, 16.0), 2 -> (1L, 7.0), 3 -> (1L, 2.0)))
      assert(Sources.readJdbc(spark, url, "zone_totals").count() == 3)
    } finally q.stop()
    // replaying a batch verbatim leaves the table unchanged (the recovery
    // path: foreachBatch may re-run the last batch after a crash)
    val snapshot = Seq((1, 3L, 16.0), (2, 1L, 7.0), (3, 1L, 2.0))
      .toDF("zone", "n_trips", "revenue")
    Sources.jdbcUpsert(snapshot, url, "zone_totals", Seq("zone"))
    Sources.jdbcUpsert(snapshot, url, "zone_totals", Seq("zone"))
    assert(Sources.readJdbc(spark, url, "zone_totals").count() == 3)
    // NULL-keyed and NULL-valued rows: the null-safe key match updates the
    // NULL-key row in place across replays (no duplicate accumulation),
    // and NULL measures bind through setNull
    val withNulls = Seq(
      (Some(1), Some(9L), Some(1.0)),
      (Option.empty[Int], Some(4L), Option.empty[Double]))
      .toDF("zone", "n_trips", "revenue")
    Sources.jdbcUpsert(withNulls, url, "zone_totals", Seq("zone"))
    Sources.jdbcUpsert(withNulls, url, "zone_totals", Seq("zone"))
    val all = Sources.readJdbc(spark, url, "zone_totals")
    assert(all.count() == 4, "NULL-keyed row duplicated on replay")
    val nullRow = all.filter(col("zone").isNull).collect()
    assert(nullRow.length == 1 && nullRow.head.getLong(1) == 4L && nullRow.head.isNullAt(2))
    assert(all.filter(col("zone") === 1).collect().head.getLong(1) == 9L)
  }

  test("Kafka seam is gated: absent connector reported with the deployment fix (S4)") {
    // this image ships no kafka jar — the gate must say so up front
    assert(!Sources.kafkaAvailable)
    val e = intercept[IllegalArgumentException] {
      Sources.streamFromKafka(spark, "broker:9092", "trips")
    }
    assert(e.getMessage.contains("spark-sql-kafka"))
  }
}

package graft

import java.sql.Timestamp

import graft.streaming.{Cdc, Sessions, TripAggregations, ZoneActivity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming semantics (SURVEY §2.9): CDC parse, watermark + tumbling
  * window with append-mode close, and the cascade's scoring stage.
  * MemoryStream + processAllAvailable makes window-close deterministic
  * (SURVEY §7 hard part 1). */
class StreamingSpec extends SparkSpec {

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  private def envelope(op: String, id: Long, zone: Int, fare: Double,
                       total: Double, vendor: Int = 1): String = {
    val after =
      s"""{\\"id\\": $id, \\"vendor_id\\": $vendor, \\"pickup_location_id\\": $zone,
         | \\"dropoff_location_id\\": 7, \\"trip_distance\\": 2.5,
         | \\"fare_amount\\": $fare, \\"total_amount\\": $total}""".stripMargin
        .replaceAll("\n", "")
    s"""{"op": "$op", "ts_ms": 1704103200000, "before": null,
       | "after": "$after",
       | "source": {"db": "taxi", "table": "trips", "ts_ms": 1704103200000}}"""
      .stripMargin.replaceAll("\n", "")
  }

  test("Cdc.parseTrips keeps c/u, drops d and bad rows (batch)") {
    import spark.implicits._
    val rows = Seq(
      (envelope("c", 1, 10, 10.0, 12.0), ts(0)),
      (envelope("u", 2, 10, 11.0, 13.0), ts(1)),
      (envelope("d", 3, 10, 11.0, 13.0), ts(1)), // delete → dropped
      (envelope("c", 4, 11, -5.0, 1.0), ts(2)),  // negative fare → dropped
      ("not json at all", ts(2)),                 // malformed → null → dropped
      (envelope("r", 5, 11, 5.0, 6.0), ts(2)))   // snapshot read → dropped
      .toDF("value", "kafka_timestamp")
    val parsed = Cdc.parseTrips(rows)
    assert(parsed.count() == 2)
    assert(parsed.select("id").as[Long].collect().sorted.sameElements(Array(1L, 2L)))
  }

  test("Cdc.unwrapForRawTable keeps deletes as soft-deletes") {
    import spark.implicits._
    val rows = Seq(
      (envelope("c", 1, 10, 10.0, 12.0), ts(0)),
      (envelope("d", 2, 10, 10.0, 12.0), ts(1)))
      .toDF("value", "kafka_timestamp")
    val out = Cdc.unwrapForRawTable(rows)
    assert(out.count() == 2)
    assert(out.filter(col("is_deleted")).count() == 1)
  }

  test("stream-stream join: trips meet weather on the shared event-time hour") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val trips = MemoryStream[(Long, Int, Double, Double, Timestamp)]
    val weather = MemoryStream[(Timestamp, String, Double)]
    val joined = graft.streaming.TripAggregations.joinTripWeatherStreams(
      trips.toDF().toDF(
        "id", "pickup_location_id", "fare_amount", "total_amount", "kafka_timestamp"),
      weather.toDF().toDF("observed_at", "condition", "temperature_celsius"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      // two trips and one observation in the 10:00 hour: both match
      trips.addData((1L, 10, 10.0, 12.0, ts(5)), (2L, 11, 9.0, 11.0, ts(20)))
      weather.addData((ts(0), "Rainy", 5.0))
      q.processAllAvailable()
      val out = spark.table("ssj").collect()
      assert(out.length == 2, s"got ${out.length} rows")
      assert(out.forall(_.getAs[String]("condition") == "Rainy"))
      // a trip in the NEXT hour stays buffered until its weather arrives
      trips.addData((3L, 10, 8.0, 9.0, Timestamp.valueOf("2024-01-01 11:05:00")))
      q.processAllAvailable()
      assert(spark.table("ssj").count() == 2, "trip joined without weather")
      weather.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "Clear", 9.0))
      q.processAllAvailable()
      val out2 = spark.table("ssj").collect()
      assert(out2.length == 3)
      assert(out2.find(_.getAs[Long]("id") == 3L).get
        .getAs[String]("condition") == "Clear")
    } finally q.stop()
  }

  test("left-outer stream-stream join: unmatched trips null-pad after watermark close") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val trips = MemoryStream[(Long, Int, Double, Double, Timestamp)]
    val weather = MemoryStream[(Timestamp, String, Double)]
    val joined = graft.streaming.TripAggregations.joinTripWeatherStreamsOuter(
      trips.toDF().toDF(
        "id", "pickup_location_id", "fare_amount", "total_amount", "kafka_timestamp"),
      weather.toDF().toDF("observed_at", "condition", "temperature_celsius"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      // trip 1 in the 10:00 hour has NO weather; trip 2 in the 11:00 hour
      // matches its observation and emits immediately
      trips.addData(
        (1L, 10, 10.0, 12.0, ts(5)),
        (2L, 11, 9.0, 11.0, Timestamp.valueOf("2024-01-01 11:05:00")))
      weather.addData((Timestamp.valueOf("2024-01-01 11:00:00"), "Clear", 9.0))
      q.processAllAvailable()
      val matched = spark.table("ssj_outer").collect()
      assert(matched.length == 1 && matched.head.getAs[Long]("id") == 2L)

      // push both watermarks past 11:00 (global watermark = min of sides:
      // trips 14:30-10m, weather 13:30-2h = 11:30) — the buffered trip 1
      // evicts and null-pads on the following batch
      trips.addData((90L, 1, 1.0, 1.0, Timestamp.valueOf("2024-01-01 14:30:00")))
      weather.addData((Timestamp.valueOf("2024-01-01 13:30:00"), "Snow", -1.0))
      q.processAllAvailable()
      trips.addData((91L, 1, 1.0, 1.0, Timestamp.valueOf("2024-01-01 14:40:00")))
      q.processAllAvailable()

      val out = spark.table("ssj_outer").collect()
      val padded = out.find(_.getAs[Long]("id") == 1L)
      assert(padded.isDefined, s"trip 1 never emitted; got ids ${out.map(_.getAs[Long]("id")).toSeq}")
      assert(padded.get.isNullAt(padded.get.fieldIndex("condition")))
      assert(out.find(_.getAs[Long]("id") == 2L).get.getAs[String]("condition") == "Clear")
    } finally q.stop()
  }

  test("watermarked 5-min tumbling window closes in append mode; late data dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val query = input
      .toDF()
      .toDF("value", "kafka_timestamp")
      .transform(Cdc.parseTrips)
      .transform(TripAggregations.aggregate)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("trip_aggs")
      .start()
    try {
      // batch 1: three trips in window [10:00, 10:05), zone 10
      input.addData(
        (envelope("c", 1, 10, 10.0, 12.0), ts(0)),
        (envelope("c", 2, 10, 20.0, 24.0), ts(2)),
        (envelope("u", 3, 10, 30.0, 36.0), ts(4, 30)))
      query.processAllAvailable()
      // window still open (watermark at 10:04:30 - 10min) → nothing emitted
      assert(spark.table("trip_aggs").count() == 0)

      // batch 2: an event 20+ minutes later pushes the watermark past
      // 10:05 + 10min → window [10:00,10:05) must close on a later batch
      input.addData((envelope("c", 9, 11, 5.0, 6.0), ts(26)))
      query.processAllAvailable()
      input.addData((envelope("c", 10, 11, 5.0, 6.0), ts(27)))
      query.processAllAvailable()

      val closed = spark.table("trip_aggs")
        .filter(col("pickup_zone_id") === 10)
        .collect()
      assert(closed.length == 1, s"expected 1 closed window, got ${closed.length}")
      val w = closed.head
      assert(w.getAs[Timestamp]("window_start") == ts(0))
      assert(w.getAs[Timestamp]("window_end") == ts(5))
      assert(w.getAs[Long]("total_trips") == 3)
      assert(math.abs(w.getAs[Double]("total_revenue") - 72.0) < 1e-9)
      assert(w.getAs[Long]("unique_vendors") == 1)

      // batch 3: late event for the already-closed window → dropped by the
      // watermark, no new/updated row for zone 10
      input.addData((envelope("c", 11, 10, 99.0, 99.0), ts(1)))
      query.processAllAvailable()
      val after = spark.table("trip_aggs").filter(col("pickup_zone_id") === 10).collect()
      assert(after.length == 1)
      assert(after.head.getAs[Long]("total_trips") == 3)
    } finally query.stop()
  }

  test("sliding windows under streaming: each event lands in two windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val query = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"), col("n"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sliding_aggs").start()
    try {
      input.addData((1L, ts(2)), (2L, ts(3))) // both inside [09:55,10:05) AND [10:00,10:10)
      query.processAllAvailable()
      input.addData((3L, ts(40)))             // advance watermark well past both
      query.processAllAvailable()
      input.addData((4L, ts(41)))
      query.processAllAvailable()
      val rows = spark.table("sliding_aggs")
        .filter(col("n") === 2).collect()
        .map(r => (r.getAs[Timestamp]("ws"), r.getAs[Timestamp]("we")))
        .toSet
      // the two overlapping 10-minute windows that contain 10:02/10:03
      val t0955 = Timestamp.valueOf("2024-01-01 09:55:00")
      assert(rows == Set((t0955, ts(5)), (ts(0), ts(10))),
        s"overlapping windows wrong: $rows")
    } finally query.stop()
  }

  test("streaming heavy hitters: top-k per window in fixed state, watermark-closed") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val query = streaming.StreamingHeavyHitters
      .windowTopK(input.toDS(), windowMinutes = 5, k = 3, capacity = 16)
      .writeStream.outputMode("append").format("memory")
      .queryName("hh").start()
    try {
      // window [10:00, 10:05): alpha x6, beta x4, gamma x2, 8 rare words
      val batch =
        (1 to 6).map(i => ("alpha", ts(1, i))) ++
        (1 to 4).map(i => ("beta", ts(2, i))) ++
        (1 to 2).map(i => ("gamma", ts(3, i))) ++
        (1 to 8).map(i => (s"rare$i", ts(4, i)))
      input.addData(batch: _*)
      query.processAllAvailable()
      assert(spark.table("hh").count() == 0) // window still open
      // push the watermark far past the window end → close + emit
      input.addData(("later", ts(40)))
      query.processAllAvailable()
      input.addData(("later2", ts(41)))
      query.processAllAvailable()
      val out = spark.table("hh")
        .filter(col("window_start") === ts(0)).collect()
        .sortBy(_.getAs[Int]("rank"))
      assert(out.length == 3, s"expected top-3, got ${out.length}")
      assert(out.map(_.getAs[String]("word")).toSeq == Seq("alpha", "beta", "gamma"))
      // CMS estimates are one-sided: >= true counts (here: sparse, exact)
      assert(out.map(_.getAs[Long]("estimate")).toSeq == Seq(6L, 4L, 2L))
      // closed window's state is gone: nothing more emitted for it later
      input.addData(("later3", ts(42)))
      query.processAllAvailable()
      assert(spark.table("hh").filter(col("window_start") === ts(0)).count() == 3)
    } finally query.stop()
  }

  test("session_window works under streaming: session closes via watermark") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Int, Timestamp, Double)]
    val q = in.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions").start()
    try {
      // two events 20min apart: one session (gap < 30min)
      in.addData((1, ts(0), 1.0), (1, ts(20), 2.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open
      // an event far in the future pushes the watermark past the session
      // end (10:50) and closes it on the following batch
      in.addData((2, Timestamp.valueOf("2024-01-01 12:00:00"), 1.0))
      q.processAllAvailable()
      in.addData((2, Timestamp.valueOf("2024-01-01 12:01:00"), 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").filter(col("user_id") === 1).collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Timestamp]("start") == ts(0))
      assert(closed.head.getAs[Timestamp]("end") == ts(50)) // last event + 30min
      assert(closed.head.getAs[Long]("n_events") == 2)
    } finally q.stop()
  }

  test("stream-static enrichment joins the zones dimension per micro-batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val zones = graft.taxi.TaxiIngest.cleanZones(
      graft.taxi.TaxiData.rawZones(spark),
      java.sql.Timestamp.valueOf("2025-10-24 12:00:00"))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, java.sql.Timestamp)]
    val q = in.toDF().toDF("value", "kafka_timestamp")
      .transform(graft.streaming.Cdc.parseTrips)
      .transform(t => graft.streaming.TripAggregations.enrichWithZones(t, zones))
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    try {
      in.addData(
        (envelope("c", 1, 132, 10.0, 12.0), ts(0)),   // JFK
        (envelope("c", 2, 999, 10.0, 12.0), ts(1)))   // unknown zone
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length == 2)
      val jfk = rows.find(_.getAs[Long]("id") == 1L).get
      assert(jfk.getAs[String]("zone_name") == "JFK Airport" &&
        jfk.getAs[String]("borough") == "Queens")
      assert(rows.find(_.getAs[Long]("id") == 2L).get
        .isNullAt(rows.head.fieldIndex("zone_name"))) // left join keeps unknowns
    } finally q.stop()
  }

  test("cascade stage 2: ZoneActivity scoring over closed windows") {
    import spark.implicits._
    val aggs = Seq(
      (ts(0), ts(5), 10, 3L, 72.0, 2.5, 20.0, 1L))
      .toDF("window_start", "window_end", "pickup_zone_id", "total_trips",
        "total_revenue", "avg_trip_distance", "avg_fare_amount", "unique_vendors")
    val scored = ZoneActivity.score(aggs).collect().head
    assert(scored.getAs[Int]("zone_id") == 10)
    assert(scored.getAs[Long]("pickup_count") == 3)
    assert(scored.getAs[Long]("dropoff_count") == 0)
    assert(scored.isNullAt(scored.fieldIndex("top_destination_zone")))
    // 3*0.4 + 72/100*0.4 + 1*0.2 = 1.688
    assert(math.abs(scored.getAs[Double]("activity_score") - 1.688) < 1e-9)
  }

  /** Envelope with an explicit pickup day + source commit ts — the fields
    * the upsert apply keys its partitions and recency on. Deletes carry the
    * payload in `before` (Debezium contract), creates/updates in `after`. */
  private def upsertEnvelope(op: String, id: Long, fare: Double, srcTs: Long,
                             day: Int): String = {
    val payload =
      s"""{\\"id\\": $id, \\"vendor_id\\": 1, \\"pickup_location_id\\": 10,
         | \\"dropoff_location_id\\": 7, \\"trip_distance\\": 2.5,
         | \\"pickup_datetime\\": \\"2024-01-0${day}T10:00:00\\",
         | \\"fare_amount\\": $fare, \\"total_amount\\": ${fare + 2}}"""
        .stripMargin.replaceAll("\n", "")
    val (before, after) =
      if (op == "d") (s""""$payload"""", "null") else ("null", s""""$payload"""")
    s"""{"op": "$op", "ts_ms": $srcTs, "before": $before, "after": $after,
       | "source": {"db": "taxi", "table": "trips", "ts_ms": $srcTs}}"""
      .stripMargin.replaceAll("\n", "")
  }

  test("CDC upsert apply: latest-per-key wins, deletes remove, partitions merge") {
    import spark.implicits._
    val t = s"cdc_upsert_${System.nanoTime()}"
    def unwrap(rows: Seq[(String, Timestamp)]) =
      Cdc.unwrapForRawTable(rows.toDF("value", "kafka_timestamp"))
    try {
      // batch 1: creates on two days; id=1 also UPDATED within the batch —
      // the newer source_ts must win
      Cdc.applyCdcBatch(t, unwrap(Seq(
        (upsertEnvelope("c", 1, 10.0, 1000, day = 1), ts(0)),
        (upsertEnvelope("u", 1, 11.0, 2000, day = 1), ts(1)),
        (upsertEnvelope("c", 2, 20.0, 1000, day = 1), ts(0)),
        (upsertEnvelope("c", 3, 30.0, 1000, day = 2), ts(0)))))
      val after1 = spark.table(t).collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[Double]("fare_amount")).toMap
      assert(after1 == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))

      // batch 2: update id=2, delete id=3 (payload in `before` names its
      // day-2 partition), create id=4 on a new day
      Cdc.applyCdcBatch(t, unwrap(Seq(
        (upsertEnvelope("u", 2, 25.0, 3000, day = 1), ts(2)),
        (upsertEnvelope("d", 3, 30.0, 3000, day = 2), ts(2)),
        (upsertEnvelope("c", 4, 40.0, 3000, day = 3), ts(2)))))
      val after2 = spark.table(t).collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[Double]("fare_amount")).toMap
      assert(after2 == Map(1L -> 11.0, 2L -> 25.0, 4L -> 40.0))
      // untouched row 1 survived the day-1 rewrite; id=3's partition is empty
      assert(spark.table(t).filter(col("part_date") === "2024-01-02").count() == 0)
      // batch 3: same-source-timestamp create+delete for a NEW key (one
      // transaction, same commit ms) — op semantics must resolve to the
      // delete, not the lexicographically-first create
      Cdc.applyCdcBatch(t, unwrap(Seq(
        (upsertEnvelope("c", 9, 90.0, 5000, day = 1), ts(3)),
        (upsertEnvelope("d", 9, 90.0, 5000, day = 1), ts(3)))))
      assert(spark.table(t).filter(col("id") === 9).count() == 0,
        "same-timestamp create+delete resurrected the row")
      // re-applying batch 2 is a no-op (foreachBatch retry idempotence)
      Cdc.applyCdcBatch(t, unwrap(Seq(
        (upsertEnvelope("u", 2, 25.0, 3000, day = 1), ts(2)),
        (upsertEnvelope("d", 3, 30.0, 3000, day = 2), ts(2)),
        (upsertEnvelope("c", 4, 40.0, 3000, day = 3), ts(2)))))
      assert(spark.table(t).collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[Double]("fare_amount")).toMap == after2)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CDC upsert apply matches an in-memory fold over random op sequences") {
    import spark.implicits._
    // model-based check: 120 random c/u/d ops over 12 keys × 3 days,
    // applied in 6 micro-batches, must equal folding the ops in source_ts
    // order into a Map (latest non-deleted row per key). Seeded — failures
    // reproduce.
    val rnd = new scala.util.Random(20260812)
    val t = s"cdc_model_${System.nanoTime()}"
    val ops = (1 to 120).map { i =>
      val key = 1L + rnd.nextInt(12)
      val day = 1 + rnd.nextInt(3)
      val op = rnd.nextInt(5) match {
        case 0 => "d"
        case 1 => "c"
        case _ => "u"
      }
      (op, key, 10.0 + rnd.nextInt(90), i.toLong * 1000, day)
    }
    // model: day is keyed per (key) FIRST assignment — the partition-
    // immutability contract applyCdcBatch documents; pin each key's day
    val dayOf = ops.groupBy(_._2).map { case (k, os) => k -> os.head._5 }
    val pinned = ops.map { case (op, k, fare, ts0, _) => (op, k, fare, ts0, dayOf(k)) }
    val model = pinned.sortBy(_._4).foldLeft(Map.empty[Long, Double]) {
      case (m, ("d", k, _, _, _)) => m - k
      case (m, (_, k, fare, _, _)) => m.updated(k, fare)
    }
    try {
      pinned.grouped(20).foreach { batch =>
        Cdc.applyCdcBatch(t, Cdc.unwrapForRawTable(
          batch.map { case (op, k, fare, ts0, day) =>
            (upsertEnvelope(op, k, fare, ts0, day), ts(0))
          }.toDF("value", "kafka_timestamp")))
      }
      spark.catalog.refreshTable(t)
      val actual = spark.table(t).collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[Double]("fare_amount")).toMap
      assert(actual == model, s"diverged from model:\n got $actual\n exp $model")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CDC upsert sink applies micro-batches end-to-end (foreachBatch)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t = s"cdc_sink_${System.nanoTime()}"
    val ck = java.nio.file.Files.createTempDirectory("graft_upsert_ck").toFile.getAbsolutePath
    val input = MemoryStream[(String, Timestamp)]
    val q = Cdc.upsertSink(
      Cdc.unwrapForRawTable(input.toDF().toDF("value", "kafka_timestamp")),
      t, ck, triggerMs = 50)
    try {
      input.addData(
        (upsertEnvelope("c", 1, 10.0, 1000, day = 1), ts(0)),
        (upsertEnvelope("c", 2, 20.0, 1000, day = 1), ts(0)))
      q.processAllAvailable()
      assert(spark.table(t).count() == 2)
      input.addData(
        (upsertEnvelope("u", 1, 15.0, 2000, day = 1), ts(1)),
        (upsertEnvelope("d", 2, 20.0, 2000, day = 1), ts(1)))
      q.processAllAvailable()
      // foreachBatch runs in a CLONED session: its refreshTable cannot
      // invalidate this session's cached file listing, so an external
      // reader refreshes before reading a rewritten table (standard Spark
      // cross-session contract for file-based tables)
      spark.catalog.refreshTable(t)
      val rows = spark.table(t).collect().map(r =>
        r.getAs[Long]("id") -> r.getAs[Double]("fare_amount")).toMap
      assert(rows == Map(1L -> 15.0))
    } finally q.stop()
  }

  test("streaming sessionization: gap-merge across batches, close past watermark, match batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Int, Timestamp, Double)]
    val query = Sessions.sessionize(input.toDF().toDF("user_id", "ts", "value"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("graft_stream_sessions")
      .start()
    try {
      // batch 1: two u1 events 10 min apart — one open session
      input.addData((1, ts(0), 1.0), (1, ts(10), 2.0))
      query.processAllAvailable()
      assert(spark.table("graft_stream_sessions").count() == 0, "open session emitted early")

      // batch 2: an event 15 min later MERGES into the same session even
      // though it arrived in a different micro-batch (state-side merge)
      input.addData((1, ts(25), 3.0))
      query.processAllAvailable()
      assert(spark.table("graft_stream_sessions").count() == 0)

      // batches 3-4: a much later event pushes the watermark past the
      // session close (10:55 + 10 min) → exactly one merged session emits
      val late = Timestamp.valueOf("2024-01-01 12:00:00")
      input.addData((2, late, 9.0))
      query.processAllAvailable()
      input.addData((2, Timestamp.valueOf("2024-01-01 12:05:00"), 9.0))
      query.processAllAvailable()
      val closed = spark.table("graft_stream_sessions")
        .filter(col("user_id") === 1).collect()
      assert(closed.length == 1, s"expected 1 closed session, got ${closed.length}")
      val s = closed.head
      assert(s.getAs[Timestamp]("session_start") == ts(0))
      assert(s.getAs[Timestamp]("session_end") == ts(55)) // last event + 30 min gap
      assert(s.getAs[Long]("n_events") == 3)
      assert(math.abs(s.getAs[Double]("total_value") - 6.0) < 1e-9)

      // the emitted session matches the batch operator's row for the same
      // events — streaming is the batch semantics plus a close condition
      val batch = Sessions.sessionize(
        Seq((1, ts(0), 1.0), (1, ts(10), 2.0), (1, ts(25), 3.0))
          .toDF("user_id", "ts", "value"))
        .collect().head
      assert(batch.getAs[Timestamp]("session_start") == s.getAs[Timestamp]("session_start"))
      assert(batch.getAs[Timestamp]("session_end") == s.getAs[Timestamp]("session_end"))
      assert(batch.getAs[Long]("n_events") == s.getAs[Long]("n_events"))

      // a late event inside the closed session's span is dropped, not
      // re-opened (watermark contract)
      input.addData((1, ts(5), 99.0))
      query.processAllAvailable()
      assert(spark.table("graft_stream_sessions")
        .filter(col("user_id") === 1).count() == 1)
    } finally query.stop()
  }
}

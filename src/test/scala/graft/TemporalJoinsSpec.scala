package graft

import java.sql.Timestamp

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** As-of and range join semantics on handcrafted series: tie handling,
  * no-match nulls, bucket-boundary pairs, and the banded plan's exactness
  * against a direct range predicate. */
class TemporalJoinsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before each left row") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 105.0),
      (1L, ts("2024-01-01 10:10:00"), 110.0),
      (2L, ts("2024-01-01 10:07:00"), 207.0))
      .toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:04:59"), "a"), // before 10:05 -> 100
      (1L, ts("2024-01-01 10:05:00"), "b"), // tie -> inclusive -> 105
      (1L, ts("2024-01-01 10:30:00"), "c"), // after all -> 110
      (2L, ts("2024-01-01 10:06:00"), "d"), // before any key-2 quote -> null
      (3L, ts("2024-01-01 10:00:00"), "e")) // key never quoted -> null
      .toDF("key", "tts", "tag")
    val out = TemporalJoins.asofJoin(trades, quotes, Seq("key"), "tts", "qts", Seq("price"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[Any]("asof_price"))).toMap
    assert(out == Map(
      "a" -> Some(100.0), "b" -> Some(105.0), "c" -> Some(110.0),
      "d" -> None, "e" -> None))
  }

  test("asofJoin: null right FIELD still matches as a row (struct payload)") {
    import spark.implicits._
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(1.0)),
      (1L, ts("2024-01-01 10:05:00"), None)) // most recent value is NULL
      .toDF("key", "rts", "v")
    val left = Seq((1L, ts("2024-01-01 10:06:00"), "x")).toDF("key", "lts", "tag")
    val row = TemporalJoins.asofJoin(left, right, Seq("key"), "lts", "rts", Seq("rts", "v"))
      .collect()(0)
    // the 10:05 row matched (its ts came through), even though v is null —
    // a field-level last() would have spliced v=1.0 from the older row
    assert(row.getAs[Timestamp]("asof_rts") == ts("2024-01-01 10:05:00"))
    assert(row.isNullAt(row.fieldIndex("asof_v")))
  }

  test("rangeJoin finds exactly the pairs a direct range predicate finds") {
    import spark.implicits._
    // cluster around bucket boundaries: gap=60s buckets
    val rows = Seq(
      (1L, 10L, ts("2024-01-01 10:00:30")),
      (1L, 11L, ts("2024-01-01 10:00:59")), // same bucket as 10
      (1L, 12L, ts("2024-01-01 10:01:25")), // next bucket, within 60s of both
      (1L, 13L, ts("2024-01-01 10:01:30")), // exactly 60s after 10 (inclusive)
      (1L, 14L, ts("2024-01-01 10:02:30")), // exactly 60s after 13, 65s after 12
      (2L, 20L, ts("2024-01-01 10:00:45"))) // other key: never pairs
      .toDF("user_id", "event_id", "ets")
    val a = rows.select(col("user_id"), col("event_id").as("event_a"), col("ets").as("ts_a"))
    val b = rows.select(col("user_id"), col("event_id").as("event_b"), col("ets").as("ts_b"))
    val banded = TemporalJoins.rangeJoin(a, b, Seq("user_id"), "ts_a", "ts_b", 60)
      .filter(col("event_a") =!= col("event_b"))
      .select("event_a", "event_b").as[(Long, Long)].collect().toSet
    val direct = a.join(b,
        a("user_id") === b("user_id") &&
          col("ts_b") >= col("ts_a") &&
          col("ts_b") <= col("ts_a") + expr("INTERVAL 60 SECONDS") &&
          col("event_a") =!= col("event_b"))
      .select("event_a", "event_b").as[(Long, Long)].collect().toSet
    assert(banded == direct)
    assert(banded == Set((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L), (13L, 14L)))
  }

  test("q46/q47 shapes run on real testdata and respect their contracts") {
    val t = sf()
    val attr = TemporalJoins.purchaseAttribution(t)
    val rows = attr.collect()
    assert(rows.length == t.events.filter(col("event_type") === "purchase").count())
    // gap is never negative (view at or before the purchase)
    assert(attr.filter(col("view_gap_us") < 0).count() == 0)
    val pairs = TemporalJoins.eventPairsWithin(t, 600)
    assert(pairs.filter(col("gap_us") < 0 || col("gap_us") > 600000000L).count() == 0)
    assert(pairs.count() > 0)
  }
}

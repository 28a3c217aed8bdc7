package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Tables.events` must survive every `ts` physical encoding the upstream
  * producer has shipped: int64 TIMESTAMP(NANOS) (read as long via
  * nanosAsLong), TIMESTAMP_NTZ(µs), and TIMESTAMP(µs). The r5 environment
  * regenerated testdata with µs while the reader hard-assumed nanos, killing
  * 41 queries at analysis — this spec pins the adaptive contract.
  */
class EventsReaderSpec extends SparkSpec {

  /** Writes a one-table dir whose events.parquet has `ts` of the given type,
    * carrying the same single instant 2024-03-01T12:34:56.789012Z. */
  private def fixture(mk: (String) => Unit): graft.core.Tables = {
    val dir = Files.createTempDirectory("graft-events-enc").toString
    mk(dir)
    graft.core.Tables(spark, dir)
  }

  private val wantUtc = "2024-03-01 12:34:56.789012"
  private val microsOfInstant = 1709296496789012L

  private def tsString(t: graft.core.Tables): String = {
    val out = t.events.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head()
    out.getString(0)
  }

  test("int64 nanos encoding → timestamp, ns truncated to µs") {
    val t = fixture { dir =>
      // Physical int64: what a TIMESTAMP(NANOS) file reads as under
      // nanosAsLong. 345 trailing ns must floor away.
      val df = spark.createDataFrame(
        java.util.List.of(Row(1L, microsOfInstant * 1000L + 345L, 7L, "click", 1.0, "{}")),
        StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType))))
      df.write.parquet(s"$dir/events.parquet")
    }
    assert(t.events.schema("ts").dataType === TimestampType)
    assert(tsString(t) === wantUtc)
  }

  test("TIMESTAMP_NTZ(µs) encoding → wall clock reinterpreted as UTC") {
    val t = fixture { dir =>
      val df = spark.createDataFrame(
        java.util.List.of(Row(1L,
          java.time.LocalDateTime.parse("2024-03-01T12:34:56.789012"),
          7L, "click", 1.0, "{}")),
        StructType(Seq(
          StructField("event_id", LongType), StructField("ts", TimestampNTZType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType))))
      df.write.parquet(s"$dir/events.parquet")
    }
    assert(t.events.schema("ts").dataType === TimestampType)
    assert(tsString(t) === wantUtc)
  }

  test("TIMESTAMP(µs, UTC-adjusted) encoding → pass-through") {
    val t = fixture { dir =>
      val df = spark.createDataFrame(
        java.util.List.of(Row(1L,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            microsOfInstant / 1000000L, (microsOfInstant % 1000000L) * 1000L)),
          7L, "click", 1.0, "{}")),
        StructType(Seq(
          StructField("event_id", LongType), StructField("ts", TimestampType),
          StructField("user_id", LongType), StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType))))
      df.write.parquet(s"$dir/events.parquet")
    }
    assert(t.events.schema("ts").dataType === TimestampType)
    assert(tsString(t) === wantUtc)
  }

  test("current testdata drop reads clean end-to-end") {
    val t = sf("sf0.001")
    assert(t.events.schema("ts").dataType === TimestampType)
    assert(t.events.count() > 0)
  }
}

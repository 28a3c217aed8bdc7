package graft

import java.nio.file.Files

import graft.core.Tables
import graft.ext.Sampling
import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Deterministic splits and sessionization semantics. */
class SamplingSessionsSpec extends SparkSpec {

  test("split assignment is a pure function of the id: layout-independent") {
    val docs = sf().documents
    def splits(parts: Int) = docs.repartition(parts)
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = splits(2)
    val b = splits(13)
    assert(a == b)
    // proportions near 80/10/10 (hash buckets, not exact percentages)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.05, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.05, frac.toString)
  }

  test("deterministicSample keeps a stable subset; growing corpus keeps old rows' fate") {
    import spark.implicits._
    val small = (1L to 500L).toDF("id")
    val big = (1L to 1000L).toDF("id")
    def kept(df: org.apache.spark.sql.DataFrame) =
      Sampling.deterministicSample(df, col("id"), 10).as[Long].collect().toSet
    val ks = kept(small)
    val kb = kept(big)
    // rows present in both corpora get the SAME fate — adding data never
    // reshuffles earlier assignments (the anti-leak property)
    assert(kb.filter(_ <= 500) == ks)
    assert(math.abs(kb.size / 1000.0 - 0.10) < 0.04)
  }

  test("mixByStratum applies per-stratum rates; kept sets nest by rate") {
    val docs = sf().documents
    def keptIds(rates: Seq[(String, Int)]) =
      Sampling.mixByStratum(docs, col("lang"), col("doc_id"), rates, 0)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val half = keptIds(Seq("en" -> 50))
    val most = keptIds(Seq("en" -> 90))
    // raising a stratum's rate only ADDS rows — lower-rate selections are
    // strict subsets (the property that makes mixes reproducible/resumable)
    assert(half.subsetOf(most))
    assert(half.nonEmpty && half.size < most.size)
    // non-listed strata use the default (0 here): nothing but 'en' kept
    val langs = Sampling.mixByStratum(docs, col("lang"), col("doc_id"), Seq("en" -> 50), 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
  }

  test("session_window semantics: merge under gap, split at exactly the gap") {
    import spark.implicits._
    // handcrafted events fixture (ts as int64 nanos, the testdata contract)
    val dir = Files.createTempDirectory("graft_sessions").toFile.getAbsolutePath
    def ns(s: String): Long = java.sql.Timestamp.valueOf(s).getTime * 1000000L
    Seq(
      (1L, 1, ns("2024-01-01 10:00:00"), 1.0),
      (2L, 1, ns("2024-01-01 10:29:59"), 2.0),  // 29:59 gap -> merges
      (3L, 1, ns("2024-01-01 11:00:00"), 3.0),  // 30:01 gap -> new session
      (4L, 2, ns("2024-01-01 10:00:00"), 4.0),
      (5L, 2, ns("2024-01-01 10:30:00"), 5.0))  // exactly 30:00 -> still merges
      .toDF("event_id", "user_id", "ts", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = Analytics.userSessions(Tables(spark, dir))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val u1 = out.filter(_._1 == 1)
    val u2 = out.filter(_._1 == 2)
    assert(u1.length == 2 && u2.length == 1, out.mkString("; "))
    // first u1 session spans both early events, closes 30min after the last
    assert(u1(0)._2 == "2024-01-01 10:00:00.000000")
    assert(u1(0)._3 == "2024-01-01 10:59:59.000000")
    assert(u1(0)._4 == 2)
    // an event exactly gap after its predecessor MERGES (inclusive boundary)
    assert(u2(0)._4 == 2 && u2(0)._3 == "2024-01-01 11:00:00.000000")
  }
}

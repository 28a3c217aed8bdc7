package graft

import graft.core.Tables
import graft.ext.Similarity
import graft.operators.Timeseries
import org.apache.spark.sql.functions._

/** Contracts for the q223–q225 wave: the interval max-concurrency sweep
  * (single-node brute-force replica + a constructed midnight-carry case),
  * the CUSUM chart (the prefix-sum closed form checked against the
  * textbook max(0, ·) recursion), and truncated-dimension recall (full
  * brute-force replica of every prefix ranking). */
class TimeseriesSpec extends SparkSpec {

  private val GapUs = 30L * 60 * 1000000
  private val DayUs = 86400L * 1000000

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def eventMicros(t: Tables): Seq[(Long, Long)] =
    t.events.select(col("user_id"), col("ts")).collect().map { r =>
      val ts = r.getAs[java.sql.Timestamp]("ts")
      (r.getAs[Long]("user_id"),
        Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
    }.toSeq

  /** Single-node sessions under q49's pinned boundary rule (gap-equal
    * still merges): half-open [min ts, max ts + gap) intervals. */
  private def sessionsReplica(ev: Seq[(Long, Long)]): Seq[(Long, Long)] =
    ev.groupBy(_._1).values.flatMap { us =>
      val sorted = us.map(_._2).sorted
      val groups = sorted.tail.foldLeft(List(List(sorted.head))) {
        (acc, t) =>
          if (t - acc.head.head <= GapUs) (t :: acc.head) :: acc.tail
          else List(t) :: acc
      }
      groups.map(g => (g.last, g.head + GapUs))
    }.toSeq

  private def sweepReplica(sessions: Seq[(Long, Long)])
      : Map[Long, (Long, Long, Long)] = {
    // day-epoch → (n segments, peak, first peak us)
    val segs = sessions.flatMap { case (s, e) =>
      (Math.floorDiv(s, DayUs) to Math.floorDiv(e - 1, DayUs)).map { d =>
        (d, math.max(s, d * DayUs), math.min(e, (d + 1) * DayUs))
      }
    }
    segs.groupBy(_._1).map { case (d, ss) =>
      val deltas = ss.flatMap(s => Seq((s._2, 1L), (s._3, -1L)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val cums = deltas.scanLeft((0L, 0L)) { case ((_, c), (us, dl)) =>
        (us, c + dl)
      }.tail
      val peak = cums.map(_._2).max
      (d, (ss.size.toLong, peak, cums.find(_._2 == peak).get._1))
    }
  }

  test("q223: replica parity — sessions, day split, peak and its instant") {
    val t = sf("sf0.01")
    val expected = sweepReplica(sessionsReplica(eventMicros(t))).map {
      case (d, (n, peak, at)) =>
        (java.time.LocalDate.ofEpochDay(d).toString, n, peak, at)
    }.toSet
    val actual = Timeseries.concurrencySweep(t).collect().map { r =>
      (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_active_sessions"),
        r.getAs[Long]("peak_concurrency"),
        r.getAs[Long]("peak_at_us"))
    }.toSet
    assert(actual == expected)
    assert(actual.nonEmpty)
  }

  test("q223: midnight-spanning sessions carry into the next day") {
    val dir = java.nio.file.Files.createTempDirectory("ts_carry").toString
    val base = java.time.LocalDate.of(2024, 3, 1)
    def ts(day: Int, h: Int, m: Int) = java.sql.Timestamp.valueOf(
      base.plusDays(day).atTime(h, m).toString.replace('T', ' ') + ":00")
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      (1L, ts(0, 23, 50), 1L), // session [23:50, 00:40) — spans midnight
      (2L, ts(0, 23, 55), 2L), // session [23:55, 00:25) — spans midnight
      (3L, ts(1, 0, 10), 1L)   // merges into user 1's session (20 min gap)
    ).map { case (id, when, uid) =>
      org.apache.spark.sql.Row(id, when, uid, "view", 1.0, "{}")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props",
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Timeseries.concurrencySweep(Tables(spark, dir)).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n_active_sessions"),
        r.getAs[Long]("peak_concurrency"),
        r.getAs[Long]("peak_at_us"))).toSeq.sortBy(_._1)
    val mid = base.plusDays(1).toEpochDay * DayUs
    assert(out == Seq(
      // day 1: both sessions open 23:55–24:00 — peak 2 at 23:55
      ("2024-03-01", 2L, 2L, mid - 5L * 60 * 1000000),
      // day 2: both carried at midnight (peak 2 at 00:00); user 2's ends
      // 00:25, user 1's (merged) runs to 00:40
      ("2024-03-02", 2L, 2L, mid)))
  }

  test("q224: prefix-sum closed form equals the max(0,·) CUSUM recursion") {
    val t = sf("sf0.01")
    val daily = eventMicros(t).groupBy(e => Math.floorDiv(e._2, DayUs))
      .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n = daily.size.toLong
    val total = daily.map(_._2).sum
    val a = total / Timeseries.SlackDiv
    val h = Timeseries.AlarmMult * a
    var (sHi, sLo) = (0L, 0L)
    val expected = daily.map { case (d, x) =>
      sHi = math.max(0L, sHi + (n * x - total - a))
      sLo = math.max(0L, sLo + (total - n * x - a))
      (java.time.LocalDate.ofEpochDay(d).toString, x, sHi, sLo,
        sHi > h, sLo > h)
    }
    val actual = Timeseries.cusumDailyVolume(t).collect().map { r =>
      (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("n_events"),
        r.getAs[Long]("s_hi"), r.getAs[Long]("s_lo"),
        r.getAs[Boolean]("alarm_hi"), r.getAs[Boolean]("alarm_lo"))
    }.toSeq
    assert(actual == expected)
    assert(actual.nonEmpty)
  }

  /** Spark's round(·, 6): BigDecimal.valueOf + HALF_UP. */
  private def r6(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The native CosineSimilarity fold (dot, na, nb in one left-to-right
    * pass) on a dimension prefix. */
  private def cosPrefix(a: Array[Float], b: Array[Float], d: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < d) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q225: replica parity — prefix-dim top-k overlap vs brute force") {
    val t = sf("sf0.01")
    val (nEval, k, dims) = (64, 10, Seq(4, 8, 16, 32))
    val emb = t.embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getSeq[Float](1).toArray)).sortBy(_._1)
    val queries = emb.filter(_._1 < nEval)
    val train = emb.filter(_._1 >= nEval)
    def topk(q: Array[Float], d: Int): Seq[Long] =
      train.map { case (id, v) => (id, r6(cosPrefix(q, v, d))) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq
    val fullTop = queries.map { case (qid, qv) => qid -> topk(qv, 64) }.toMap
    val total = fullTop.values.map(_.size.toLong).sum
    val expected = dims.map { d =>
      val hits = queries.map { case (qid, qv) =>
        topk(qv, d).count(fullTop(qid).contains).toLong
      }.sum
      (d, total, hits, bits(hits.toDouble / total.toDouble))
    }.toSet
    val actual = Similarity.truncatedDimRecall(t).collect().map { r =>
      (r.getAs[Int]("dim"), r.getAs[Long]("n_slots"),
        r.getAs[Long]("n_hits"), bits(r.getAs[Double]("recall")))
    }.toSet
    assert(actual == expected)
    // a wider prefix should recover at least what the narrowest does —
    // sanity on the fixture, not a theorem
    val byDim = actual.toSeq.sortBy(_._1).map(_._3)
    assert(byDim.last >= byDim.head)
  }

  private def typedEventMicros(t: Tables): Seq[(Long, String, Long)] =
    t.events.select(col("user_id"), col("event_type"), col("ts")).collect()
      .map { r =>
        val ts = r.getAs[java.sql.Timestamp]("ts")
        (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
          Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L)
      }.toSeq

  test("q234: replica parity — first-view→first-purchase latencies") {
    val t = sf("sf0.01")
    val ev = typedEventMicros(t)
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val deltas = ev.filter(_._2 == "purchase")
      .filter(e => firstView.get(e._1).exists(e._3 > _))
      .groupBy(_._1)
      .map { case (u, es) => es.map(_._3).min - firstView(u) }
      .toSeq.sorted
    def pDisc(p: Double): Double =
      deltas(math.ceil(p * deltas.size).toInt - 1).toDouble
    val row = Timeseries.timeToConvert(t).collect().head
    assert(row.getAs[Long]("n_converted") == deltas.size.toLong)
    assert(row.getAs[Long]("min_us") == deltas.head)
    assert(row.getAs[Long]("max_us") == deltas.last)
    assert(bits(row.getAs[Double]("p50_us")) == bits(pDisc(0.5)))
    assert(bits(row.getAs[Double]("p90_us")) == bits(pDisc(0.9)))
    assert(bits(row.getAs[Double]("mean_us")) ==
      bits(deltas.sum.toDouble / deltas.size.toDouble))
    assert(deltas.nonEmpty)
  }

  test("q235: replica parity — dense-grid dispersion index per type") {
    val t = sf("sf0.01")
    val ev = typedEventMicros(t)
    val HourUs = 3600L * 1000000
    val h0 = Math.floorDiv(ev.map(_._3).min, HourUs)
    val h1 = Math.floorDiv(ev.map(_._3).max, HourUs)
    val nHours = h1 - h0 + 1
    val expected = ev.groupBy(_._2).map { case (tp, es) =>
      val byHour = es.groupBy(e => Math.floorDiv(e._3, HourUs))
        .view.mapValues(_.size.toLong).toMap
      val cs = (h0 to h1).map(h => byHour.getOrElse(h, 0L))
      val tot = cs.sum
      val ss = cs.map(c => c * c).sum
      val num = nHours * ss - tot * tot
      val den = (nHours - 1) * tot
      (tp, nHours, tot, bits(tot.toDouble / nHours.toDouble),
        bits(num.toDouble / den.toDouble), num > 2 * den)
    }.toSet
    val actual = Timeseries.overdispersionAudit(t).collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n_hours"),
        r.getAs[Long]("n_events"), bits(r.getAs[Double]("mean_per_hour")),
        bits(r.getAs[Double]("dispersion")), r.getAs[Boolean]("bursty"))
    }.toSet
    assert(actual == expected)
    assert(actual.size == 5)
  }
}

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational time-series audits over the event stream (q223–q224): the
  * interval max-concurrency sweep and the CUSUM volume control chart.
  * Both are the monitoring layer a lakehouse runs ON ITSELF — the
  * reference's pipeline health checks (batch row-count logs in
  * `airflow/dags/spark_jobs/nyc_taxi_to_iceberg.py:86,138` and the serving
  * freshness probes in `serving/api.py`) reduced to two classical
  * statistics: "how many sessions were open at once" (capacity sizing for
  * the serving tier) and "did today's volume drift from the process mean"
  * (the ingest alarm that pages before a silent upstream drop corrupts a
  * week of aggregates).
  *
  * Exactness doctrine: every statistic here is pure BIGINT arithmetic —
  * boundary deltas, prefix sums, running minima, and integer-scaled CUSUM
  * excursions — so the DuckDB mirrors replay them bit-for-bit with no
  * float portability argument needed at all. */
object Timeseries {

  /** q223: peak session concurrency per day — the classic +1/−1 boundary
    * sweep over the q49 sessions (session = user events merged at a
    * 30-minute gap, closing at last event + gap, exactly Spark's
    * `session_window` contract that q49's oracle pins).
    *
    * Shape, built for the 100 TB case:
    *   1. sessionize (one shuffle on user_id — the q49 aggregate);
    *   2. split each session interval at midnight boundaries (explode over
    *      its day span — sessions are gap-bounded, so the span is 1–2 days
    *      and the explode is a constant-factor map);
    *   3. net the +1/−1 boundary deltas per (day, µs) — this aggregate is
    *      what makes the sweep deterministic (no tie-ordering inside a
    *      timestamp) AND bounds the window input to distinct boundary
    *      instants;
    *   4. one cumulative-sum window PARTITIONED BY DAY — days scale out
    *      across the cluster; no global sort anywhere.
    *
    * Midnight carry is materialized, not tracked: a session spanning
    * d → d+1 contributes −1 at d's midnight and +1 at d+1's midnight, so
    * every day partition is self-contained. Intervals are half-open
    * [start, end): a session ending exactly when another starts never
    * overlaps it (the deltas net to 0 at that instant).
    *
    * Output per day: sessions active in the day (carried ones included),
    * the peak concurrency, and the first µs instant the peak is reached. */
  def concurrencySweep(t: Tables, gapMinutes: Int = 30): DataFrame = {
    val sessions = t.events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("session_window.start")).as("s_us"),
        unix_micros(col("session_window.end")).as("e_us"))
    val segs = sessions
      .select(col("s_us"), col("e_us"),
        explode(sequence(
          to_date(timestamp_micros(col("s_us"))),
          to_date(timestamp_micros(col("e_us") - 1)))).as("day"))
      .select(col("day"),
        greatest(col("s_us"), unix_micros(col("day").cast("timestamp")))
          .as("seg_s"),
        least(col("e_us"),
          unix_micros(date_add(col("day"), 1).cast("timestamp"))).as("seg_e"))
    val bounds = segs
      .select(col("day"), col("seg_s").as("us"), lit(1L).as("delta"))
      .unionAll(segs.select(col("day"), col("seg_e").as("us"),
        lit(-1L).as("delta")))
    val net = bounds
      .groupBy(col("day"), col("us"))
      .agg(sum(col("delta")).as("d"),
        sum(greatest(col("delta"), lit(0L))).as("starts"))
    val wCum = Window.partitionBy(col("day")).orderBy(col("us"))
    val wDay = Window.partitionBy(col("day"))
    net
      .withColumn("conc", sum(col("d")).over(wCum))
      .withColumn("pk", max(col("conc")).over(wDay))
      .groupBy(col("day"))
      .agg(
        sum(col("starts")).as("n_active_sessions"),
        max(col("conc")).as("peak_concurrency"),
        min(when(col("conc") === col("pk"), col("us"))).as("peak_at_us"))
      .orderBy(col("day"))
  }

  /** The DuckDB mirror of [[concurrencySweep]] — sessions replayed as
    * q49's gaps-and-islands SQL, then the identical integer sweep. */
  def concurrencySweepSql(gapMinutes: Int = 30): String =
    s"""WITH ordered AS (
       |  SELECT user_id, event_id, ts,
       |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
       |  FROM events),
       |flagged AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |                   OR ts - prev_ts > INTERVAL $gapMinutes MINUTE
       |                 THEN 1 ELSE 0 END AS is_new
       |  FROM ordered),
       |islands AS (
       |  SELECT *, sum(is_new) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM flagged),
       |sess AS (
       |  SELECT epoch_us(min(ts)) AS s_us,
       |   epoch_us(max(ts) + INTERVAL $gapMinutes MINUTE) AS e_us
       |  FROM islands GROUP BY user_id, session_idx),
       |segs AS (
       |  SELECT CAST(d.day AS DATE) AS day,
       |   greatest(s_us, epoch_us(CAST(CAST(d.day AS DATE) AS TIMESTAMP)))
       |     AS seg_s,
       |   least(e_us, epoch_us(CAST(CAST(d.day AS DATE) AS TIMESTAMP)
       |     + INTERVAL 1 DAY)) AS seg_e
       |  FROM sess, unnest(generate_series(
       |    CAST(make_timestamp(s_us) AS DATE),
       |    CAST(make_timestamp(e_us - 1) AS DATE),
       |    INTERVAL 1 DAY)) AS d(day)),
       |bounds AS (
       |  SELECT day, seg_s AS us, 1 AS delta FROM segs
       |  UNION ALL
       |  SELECT day, seg_e AS us, -1 AS delta FROM segs),
       |net AS (
       |  SELECT day, us, CAST(sum(delta) AS BIGINT) AS d,
       |   CAST(sum(greatest(delta, 0)) AS BIGINT) AS starts
       |  FROM bounds GROUP BY 1, 2),
       |cum AS (
       |  SELECT *, CAST(sum(d) OVER (PARTITION BY day ORDER BY us)
       |    AS BIGINT) AS conc
       |  FROM net),
       |pk AS (
       |  SELECT *, max(conc) OVER (PARTITION BY day) AS pk FROM cum)
       |SELECT day,
       | CAST(sum(starts) AS BIGINT) AS n_active_sessions,
       | max(conc) AS peak_concurrency,
       | min(CASE WHEN conc = pk THEN us END) AS peak_at_us
       |FROM pk GROUP BY day ORDER BY day""".stripMargin

  /** Daily-volume CUSUM parameters, as integer fractions of the total
    * event count T over n days: the slack per step is k = mean/[[SlackDiv]]
    * (in scaled units A = T DIV [[SlackDiv]]) and the alarm threshold is
    * h = [[AlarmMult]]·k (H = AlarmMult·A) — the textbook k = σ/2, h = 4σ
    * pairing re-based on the mean because the chart runs in exact counts,
    * not studentized units. */
  val SlackDiv = 20L
  val AlarmMult = 5L

  /** q224: one-sided upward + downward CUSUM control chart on daily event
    * volume (Page 1954) — the drift alarm that catches a slow ingest decay
    * or a duplicate-publishing upstream long before a fixed threshold on
    * the raw count would fire.
    *
    * The recursion S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − k)) is not a
    * window function — but its closed form is: with P_t = Σ_{i≤t}
    * (x_i − μ − k), S⁺_t = P_t − min(0, min_{j≤t} P_j). That turns the
    * chart into ONE cumulative sum plus ONE running min per direction,
    * over the bounded days frame (the corpus contributes only the per-day
    * count aggregate; the windows run on one row per day, single
    * partition by design — hundreds of rows at any corpus size).
    *
    * Exactness: μ = T/n is kept rational by scaling every term by n —
    * the chart runs in units of n·events, all BIGINT: step_t = n·x_t − T
    * ∓ A. The driver-side overflow guard bounds n·(T + n·max x) against
    * int64 (at 1000 days × 10¹² events the margin still holds ~400×). */
  def cusumDailyVolume(t: Tables): DataFrame = {
    val daily = t.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = daily.agg(
      count(lit(1)).as("n"), sum(col("x")).as("t"), max(col("x")).as("mx"))
      .head()
    val n = tot.getLong(0)
    // sum/max are SQL-null on an empty table; the chart over zero days is
    // the empty frame, so substitute zeros rather than NPE on getLong
    val (total, maxX) =
      if (n == 0L) (0L, 0L) else (tot.getLong(1), tot.getLong(2))
    // |P_t| ≤ n·max|n·x − T − A| ≤ n·(n·maxX + T + A); fail loudly rather
    // than wrap (the q212/q202 cubic-guard doctrine). The bound itself is
    // computed in BigInt so it cannot overflow before the comparison.
    require(n == 0L ||
      BigInt(2) * n * (BigInt(total) + BigInt(n) * maxX) <= Long.MaxValue,
      s"cusumDailyVolume: n=$n days, T=$total exceeds the int64 chart range")
    val a = total / SlackDiv
    val h = AlarmMult * a
    val up = lit(n) * col("x") - lit(total) - lit(a)
    val dn = lit(total) - lit(n) * col("x") - lit(a)
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("p_up", sum(up).over(w))
      .withColumn("p_dn", sum(dn).over(w))
      .withColumn("s_hi", col("p_up") - least(min(col("p_up")).over(w), lit(0L)))
      .withColumn("s_lo", col("p_dn") - least(min(col("p_dn")).over(w), lit(0L)))
      .select(col("day"), col("x").as("n_events"),
        col("s_hi"), col("s_lo"),
        (col("s_hi") > lit(h)).as("alarm_hi"),
        (col("s_lo") > lit(h)).as("alarm_lo"))
      .orderBy(col("day"))
  }

  /** The DuckDB mirror of [[cusumDailyVolume]] — totals come from SQL
    * CTEs instead of the driver scalar, same integer chart. */
  def cusumDailyVolumeSql(): String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, count(*) AS x
       |  FROM events GROUP BY 1),
       |tot AS (
       |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS t FROM daily),
       |stepped AS (
       |  SELECT day, x,
       |   n * x - t - t // $SlackDiv AS up,
       |   t - n * x - t // $SlackDiv AS dn,
       |   $AlarmMult * (t // $SlackDiv) AS h
       |  FROM daily CROSS JOIN tot),
       |prefixed AS (
       |  SELECT day, x, h,
       |   CAST(sum(up) OVER (ORDER BY day) AS BIGINT) AS p_up,
       |   CAST(sum(dn) OVER (ORDER BY day) AS BIGINT) AS p_dn
       |  FROM stepped),
       |chart AS (
       |  SELECT day, x, h,
       |   p_up - least(min(p_up) OVER (ORDER BY day), 0) AS s_hi,
       |   p_dn - least(min(p_dn) OVER (ORDER BY day), 0) AS s_lo
       |  FROM prefixed)
       |SELECT day, x AS n_events, s_hi, s_lo,
       | s_hi > h AS alarm_hi, s_lo > h AS alarm_lo
       |FROM chart ORDER BY day""".stripMargin

  /** q234: time-to-convert distribution — for every user who purchases
    * strictly after their first view (the q218 stage rule), the
    * view→purchase latency, summarized as exact order statistics. The
    * metric a growth/funnel dashboard pairs with q218's conversion rates:
    * not just HOW MANY convert but HOW FAST.
    *
    * Exactness: latencies are exact BIGINT µs deltas; p50/p90 are
    * percentile_disc — SELECTION, not interpolation, hence bit-portable
    * (the q51 contract) — over the deltas widened to double (both engines
    * return DOUBLE then); the mean is one division of exact operands.
    * Shape: two user-keyed aggregates and one global summary row — the
    * q218 shuffle profile. */
  def timeToConvert(t: Tables, fromType: String = "view",
      toType: String = "purchase"): DataFrame = {
    val v = t.events.filter(col("event_type") === fromType)
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("t0"))
    val p = t.events.filter(col("event_type") === toType)
      .select(col("user_id"), unix_micros(col("ts")).as("tp"))
    val deltas = p.join(v, "user_id")
      .filter(col("tp") > col("t0"))
      .groupBy(col("user_id"), col("t0"))
      .agg(min(col("tp")).as("t1"))
      .select((col("t1") - col("t0")).as("d"))
    // the mean's sum stays BIGINT (µs deltas summed as doubles would pass
    // 2^53 at scale and turn order-dependent); only the selection
    // percentiles widen to double, where every value is exact
    deltas.agg(
      count(lit(1)).as("n_converted"),
      min(col("d")).as("min_us"),
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY CAST(d AS DOUBLE))")
        .as("p50_us"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY CAST(d AS DOUBLE))")
        .as("p90_us"),
      max(col("d")).as("max_us"),
      (sum(col("d")).cast("double") / count(lit(1)).cast("double"))
        .as("mean_us"))
  }

  /** The DuckDB mirror of [[timeToConvert]]. */
  def timeToConvertSql(fromType: String = "view",
      toType: String = "purchase"): String =
    s"""WITH v AS (
       |  SELECT user_id, epoch_us(min(ts)) AS t0 FROM events
       |  WHERE event_type = ${graft.core.Sql.lit(fromType)} GROUP BY 1),
       |conv AS (
       |  SELECT e.user_id, v.t0, min(epoch_us(e.ts)) AS t1
       |  FROM events e JOIN v USING (user_id)
       |  WHERE e.event_type = ${graft.core.Sql.lit(toType)} AND epoch_us(e.ts) > v.t0
       |  GROUP BY 1, 2),
       |d AS (SELECT CAST(t1 - t0 AS BIGINT) AS d FROM conv)
       |SELECT count(*) AS n_converted,
       | min(d) AS min_us,
       | quantile_disc(CAST(d AS DOUBLE), 0.5) AS p50_us,
       | quantile_disc(CAST(d AS DOUBLE), 0.9) AS p90_us,
       | max(d) AS max_us,
       | CAST(CAST(sum(d) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |   AS mean_us
       |FROM d""".stripMargin

  /** q235: hourly-volume overdispersion audit (the Poisson dispersion
    * index) — per event type, the variance-to-mean ratio of hourly counts
    * over the DENSE hour grid (missing hours are real zeros, the q96/q167
    * doctrine). D ≈ 1 says arrivals are Poisson-ish and rate alarms can
    * use √λ bands; D ≫ 1 (bursty traffic, bot storms, batch replays)
    * says they can't — this is the audit that VALIDATES q224's chart
    * parameterization per stream.
    *
    * Exactness: D = (H·Σc² − T²)/((H−1)·T) — numerator and denominator
    * exact BIGINTs from one (type, hour) count pass; the burst flag
    * (D > 2) compares integers cross-multiplied, no float anywhere until
    * the two reported ratios. */
  def overdispersionAudit(t: Tables): DataFrame = {
    val hourly = t.events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val bounds = t.events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = t.events.select(col("event_type")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("h"))
    val dense = grid.join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
    dense.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).as("n_events"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("event_type"), col("n_hours"), col("n_events"),
        (col("n_events").cast("double") / col("n_hours").cast("double"))
          .as("mean_per_hour"),
        ((col("n_hours") * col("ss") - col("n_events") * col("n_events"))
          .cast("double") /
          ((col("n_hours") - 1) * col("n_events")).cast("double"))
          .as("dispersion"),
        (col("n_hours") * col("ss") - col("n_events") * col("n_events") >
          lit(2L) * (col("n_hours") - 1) * col("n_events")).as("bursty"))
      .orderBy(col("event_type"))
  }

  /** The DuckDB mirror of [[overdispersionAudit]]. */
  def overdispersionAuditSql(): String =
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |bounds AS (
       |  SELECT date_trunc('hour', min(ts)) AS h0,
       |   date_trunc('hour', max(ts)) AS h1
       |  FROM events),
       |grid AS (
       |  SELECT t.event_type, g.h
       |  FROM (SELECT DISTINCT event_type FROM events) t
       |  CROSS JOIN bounds,
       |   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS g(h)),
       |dense AS (
       |  SELECT g.event_type, coalesce(c, 0) AS c
       |  FROM grid g LEFT JOIN hourly USING (event_type, h)),
       |agg AS (
       |  SELECT event_type, count(*) AS n_hours,
       |   CAST(sum(c) AS BIGINT) AS n_events,
       |   CAST(sum(c * c) AS BIGINT) AS ss
       |  FROM dense GROUP BY 1)
       |SELECT event_type, n_hours, n_events,
       | CAST(n_events AS DOUBLE) / CAST(n_hours AS DOUBLE) AS mean_per_hour,
       | CAST(n_hours * ss - n_events * n_events AS DOUBLE)
       |   / CAST((n_hours - 1) * n_events AS DOUBLE) AS dispersion,
       | n_hours * ss - n_events * n_events
       |   > 2 * (n_hours - 1) * n_events AS bursty
       |FROM agg ORDER BY event_type""".stripMargin
}

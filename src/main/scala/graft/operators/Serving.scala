package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The serving-layer query shapes (reference `serving/database.py:26-297`)
  * plus the scalar-function surface of SURVEY §2.8, re-expressed over the
  * testdata tables. Non-determinism in the reference (RANDOM() jitter,
  * NOW()-anchored windows) is replaced with deterministic arithmetic and a
  * data-derived anchor per SURVEY §7 hard part 3.
  */
object Serving {

  /** O3: recent rows — ORDER BY ts DESC LIMIT n with a unique tiebreaker
    * (reference `serving/database.py:44-46`). Spark plans
    * TakeOrderedAndProject: per-partition top-n, then a single-partition
    * merge of n·p candidates — no global sort at any scale. */
  def recentEvents(t: Tables, limit: Int = 100): DataFrame =
    t.events
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(limit)
      .select(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("user_id"),
        col("event_type"),
        round(col("value"), 2).as("value"))

  /** O1/O2: top-k by aggregate — top-10 purchase revenue per user
    * (reference `comprehensive_analytics.py:459-471`,
    * `serving/database.py:272-284`). */
  def topRevenueUsers(t: Tables, k: Int = 10): DataFrame =
    t.events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"), graft.functions.ExactAgg.dsum(col("value")).as("revenue"))
      .orderBy(col("revenue").desc, col("user_id"))
      .limit(k)

  /** §2.8 date/time surface: extract fns, datediff, epoch-seconds duration
    * (reference `comprehensive_analytics.py:144-151`,
    * `serving/database.py:60,115-117`). Spark's dayofweek is 1=Sunday..7,
    * mirrored in the oracle as dayofweek()+1. */
  def scalarDatetime(t: Tables): DataFrame = {
    // Order-grained fact⋈fact join → ride the bucketed twins (r11): the
    // plain form shuffled BOTH facts on the orderkey before the scalar
    // projection; the co-located bucketed layout (the q44 economics —
    // write once, query many) plans the join with zero exchanges, leaving
    // the harness-imposed presentation sort as the only shuffle. Same
    // rows, same values: bucketing is a pure layout choice.
    val (oTbl, lTbl) = Bucketed.ensureBucketedFacts(t)
    t.spark.table(oTbl)
      .join(t.spark.table(lTbl), col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_orderkey").as("order_id"),
        col("l_linenumber").as("line_number"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        dayofweek(col("o_orderdate")).as("order_dow"),
        to_date(date_trunc("month", col("o_orderdate"))).as("order_month_start"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("ship_delay_days"),
        (unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate")))
          .as("ship_delay_seconds"))
      // harness-imposed: the driver's oracle compare may hash values in row
      // order, so row-level queries sort on their key. A global ORDER BY of
      // a full fact join is a scale anti-pattern — at 100 TB this would be
      // sortWithinPartitions (or no sort) with an order-insensitive check;
      // measured at sf0.1 the sort is ~1.3s of q23's 2.0s median (the 20.7s
      // r01 outlier was single-run noise — hence Bench's medians)
      .orderBy(col("order_id"), col("line_number"))
  }

  /** §2.8 conditional surface: CASE ladder encodes (the weather/borough
    * encoders, `ml_feature_engineering.py:179-186,376-382`), COALESCE,
    * NULLIF, LEAST clamping (`serving/database.py:74,143-147`). */
  def caseEncode(t: Tables): DataFrame =
    t.events
      .select(
        col("event_id"),
        col("event_type"),
        col("value"),
        when(col("event_type") === "purchase", 1.0)
          .when(col("event_type") === "click", 0.8)
          .when(col("event_type") === "view", 0.6)
          .when(col("event_type") === "signup", 0.4)
          .otherwise(0.0)
          .as("type_encoded"),
        round(least(col("value"), lit(100.0)), 2).as("value_clamped"),
        round(coalesce(nullif(col("value"), lit(0.0)), lit(-1.0)), 2).as("value_nz"),
        when(hour(col("ts")).between(7, 9) || hour(col("ts")).between(17, 19), true)
          .otherwise(false)
          .as("is_rush_hour"))
      .orderBy(col("event_id"))

  /** §2.8 math surface: the flat-earth distance formula
    * SQRT(POW(Δa,2)+POW(Δb,2))*111 (`ml_feature_engineering.py:440-441`)
    * and ROUND-arithmetic (`serving/database.py:71-74`). */
  def mathFuncs(t: Tables): DataFrame =
    t.part
      .select(
        col("p_partkey"),
        round(
          sqrt(
            pow(col("p_size") - lit(10.0), 2) +
              pow(col("p_retailprice") / lit(100.0), 2)) * lit(111.0),
          6).as("flat_distance"),
        round(col("p_retailprice") / lit(7.0), 2).as("price_seventh"),
        round(pow(col("p_size"), 2) * col("p_retailprice") / lit(1000.0), 6)
          .as("interaction_feature"))
      .orderBy(col("p_partkey"))

  /** Demand-prediction future grid: generate_series → sequence()+explode()
    * (reference `serving/database.py:177-184`), with the RANDOM() jitter
    * replaced by deterministic arithmetic so golden tests reproduce. The
    * anchor is data-derived (max event hour), not wall-clock. */
  def futureDemandGrid(t: Tables, hoursAhead: Int = 24): DataFrame = {
    val anchor = t.events.agg(date_trunc("hour", max(col("ts"))).as("anchor"))
    val users = t.events.select(col("user_id")).distinct()
    users
      .crossJoin(anchor)
      .select(
        col("user_id"),
        explode(sequence(lit(1), lit(hoursAhead))).as("h"),
        col("anchor"))
      .select(
        col("user_id"),
        col("h"),
        date_format(
          col("anchor") + make_interval(lit(0), lit(0), lit(0), lit(0), col("h")),
          "yyyy-MM-dd HH:mm:ss")
          .as("prediction_hour"),
        round((col("user_id") * 37 + col("h") * 17) % 100 / lit(100.0), 2)
          .as("predicted_demand"))
      .orderBy(col("user_id"), col("h"))
  }

  /** ST2/A8 in batch: the 5-minute tumbling window aggregation of the CDC
    * processor (`realtime_cdc_processor.py:159-171`) — identical grouping
    * semantics to the streaming version in graft.streaming, run on a bounded
    * input. Distinct-count stays exact here; the streaming twin uses
    * approx_count_distinct (SURVEY §2.9 defect (a)). */
  def tumblingWindowAgg(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.ExactAgg.dsum(col("value")).as("sum_value"),
        graft.functions.ExactAgg.davg(col("value")).as("avg_value"),
        countDistinct(col("user_id")).as("distinct_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"),
        col("n_events"),
        col("sum_value"),
        col("avg_value"),
        col("distinct_users"))
      .orderBy(col("window_start"), col("event_type"))

  /** q97: SLIDING (hopping) window aggregate — 10-minute windows every
    * 5 minutes, so each event lands in exactly two overlapping windows;
    * the trend-smoothing companion of [[tumblingWindowAgg]] and the batch
    * twin of Structured Streaming's `window(ts, "10 minutes",
    * "5 minutes")`. Spark plans the window assignment as a generator
    * (explode of the ⌈size/slide⌉ candidate windows per row — narrow, no
    * UDF) feeding ONE hash aggregate; the shuffle carries size/slide× the
    * partial rows of the tumbling form, which is the inherent cost of
    * overlap, not a plan defect. */
  def slidingWindowAgg(t: Tables): DataFrame =
    t.events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.ExactAgg.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("event_type"),
        col("n_events"),
        col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** CDC-parse shape in batch: JSON payload extraction + op-filter
    * (reference `realtime_cdc_processor.py:101-156`, P6/P8). The events
    * `props` column plays the Debezium envelope. */
  def jsonParse(t: Tables): DataFrame =
    t.events
      .filter(col("event_type").isin("click", "purchase"))
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .filter(col("prop_k").isNotNull && col("prop_k") >= 0)
      .orderBy(col("event_id"))

  /** Decay base exponent for [[decayScore]]: weights are 2^(MaxAgeDays −
    * age), so the span the fixture can carry is bounded by the int64
    * accumulator — see the magnitude guard in the method. */
  private val DecayMaxAgeDays = 31

  /** q203: exponential time-decay activity scoring — the freshness-
    * weighted ranking a serving layer puts behind "most active users":
    * score(u) = Σ value·2^(−age_days), a one-day half-life. The classic
    * formulation decays with libm `exp(−λ·age)` — exactly the
    * cross-engine portability hole the q83 scaladoc documents. A
    * half-life of one day makes every weight a POWER OF TWO, so the
    * whole score accumulates as exact integer arithmetic: cents·2^(MaxAge
    * − age) summed as BIGINTs, descaled once at the end (÷2^MaxAge is an
    * exact binary shift in IEEE; the final ÷100 is one deterministic
    * division). Ranking happens on the raw integer sum — no float ever
    * orders the result.
    *
    * Scale shape: one broadcast 1-row max-day anchor, one narrow
    * event pass into a user-keyed aggregate (map-side combinable), TakeOrdered
    * top-k. The overflow guard keeps the accumulator honest: the plain
    * cents sum (same aggregate pass) must stay under 2^63/2^MaxAge, else
    * the scaled sum could have wrapped — fail loudly, the
    * [[graft.ext.Spectral]] contract. */
  def decayScore(t: Tables, topK: Int = 50): DataFrame = {
    val maxD = t.events.agg(max(to_date(col("ts"))).as("max_day"))
    val perUser = t.events.filter(col("value").isNotNull)
      .crossJoin(broadcast(maxD)) // 1-row date anchor
      .select(col("user_id"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        datediff(col("max_day"), to_date(col("ts"))).as("age"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("age")).as("last_age_days"),
        max(col("age")).as("oldest_age"),
        sum(col("cents")).as("plain_cents"),
        sum(col("cents") *
          expr(s"shiftleft(CAST(1 AS BIGINT), CAST($DecayMaxAgeDays - age AS INT))"))
          .as("scaled"))
      .localCheckpoint() // guard head + top-k read one materialization
    val head = perUser.agg(max(col("oldest_age")).as("ma"),
      max(col("plain_cents")).as("mc")).head()
    val (maxAge, maxCents) =
      (if (head.isNullAt(0)) 0 else head.getInt(0),
        if (head.isNullAt(1)) 0L else head.getLong(1))
    require(maxAge <= DecayMaxAgeDays,
      s"decayScore: event age $maxAge days exceeds the $DecayMaxAgeDays-day " +
        "weight window; raise DecayMaxAgeDays (and re-check the guard)")
    require(maxCents <= (Long.MaxValue >> DecayMaxAgeDays),
      s"decayScore: per-user cents sum $maxCents could overflow the scaled " +
        "accumulator; coarsen the quantization")
    perUser
      .orderBy(col("scaled").desc, col("user_id")).limit(topK)
      .select(col("user_id"), col("n_events"), col("last_age_days"),
        ((col("scaled").cast("double") /
          lit(math.pow(2.0, DecayMaxAgeDays))) / lit(100.0)).as("score"))
  }

  /** The DuckDB mirror of [[decayScore]]. */
  def decayScoreSql(topK: Int = 50): String =
    s"""WITH maxd AS (SELECT max(CAST(ts AS DATE)) AS max_day FROM events),
       |per AS (
       |  SELECT user_id,
       |   CAST(round(value * 100, 0) AS BIGINT) AS cents,
       |   datediff('day', CAST(ts AS DATE), max_day) AS age
       |  FROM events CROSS JOIN maxd WHERE value IS NOT NULL),
       |agg AS (
       |  SELECT user_id, count(*) AS n_events,
       |   CAST(min(age) AS INTEGER) AS last_age_days,
       |   CAST(sum(cents * (CAST(1 AS BIGINT) << ($DecayMaxAgeDays - age)))
       |     AS BIGINT) AS scaled
       |  FROM per GROUP BY 1)
       |SELECT user_id, n_events, last_age_days,
       | CAST(scaled AS DOUBLE) / ${1L << DecayMaxAgeDays}.0 / 100.0 AS score
       |FROM agg
       |ORDER BY scaled DESC, user_id LIMIT $topK""".stripMargin
}

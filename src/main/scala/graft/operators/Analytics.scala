package graft.operators

import graft.core.Tables
import graft.functions.ExactAgg._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics operator shapes from the reference's derived-table builders
  * (`comprehensive_analytics.py`, `ml_feature_engineering.py`), re-expressed
  * over the testdata star schema with the idiomatic Column DSL (no SQL
  * strings). Each function is a pure `Tables => DataFrame`.
  *
  * Money/measure aggregates use the order-independent decimal kernels from
  * [[graft.functions.ExactAgg]] so results are bit-stable across engines and
  * cluster layouts (see its scaladoc). Scale notes per shape are inline; the
  * common posture: hash-aggregates with map-side partials, broadcast hints
  * on dimension joins, one shuffle per window partition key, deterministic
  * output ordering.
  */
object Analytics {

  /** A1: full grouped aggregate battery — COUNT/SUM/AVG/MAX/MIN/STDDEV
    * (reference `comprehensive_analytics.py:186-200`,
    * `ml_feature_engineering.py:506-511`). Single shuffle on the two
    * low-cardinality group keys; partial aggregation makes the shuffle tiny
    * regardless of input size. */
  def aggStats(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsumRevenue(col("l_extendedprice"), col("l_discount")).as("sum_revenue"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_extendedprice")).as("min_price"),
        dstd(col("l_extendedprice")).as("stddev_price"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A2: COUNT(DISTINCT) per group (reference
    * `comprehensive_analytics.py:194,478`). Exact distinct = expand+two-phase
    * agg in Spark; at 100 TB this becomes `approx_count_distinct` (HLL) —
    * see [[approxDistinct]] for the scale path. */
  def countDistinctByPriority(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("distinct_customers"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))

  /** A2 at scale: HLL sketch distinct (implementation-defined sketch — not
    * oracle-comparable; kept as the built-in path and bounded against the
    * exact counts in SketchContractSpec). */
  def approxDistinct(t: Tables, rsd: Double = 0.05): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), rsd).as("approx_customers"))
      .orderBy(col("o_orderpriority"))

  /** A2 at scale, oracle-checkable: KMV bottom-k distinct sketch over a
    * portable hash — deterministic, mergeable, layout-independent, and
    * replayable by any SQL engine (see [[graft.functions.KmvSketch]]).
    * Runs on the Catalyst-native [[graft.functions.KmvSketch.KmvDistinctNative]]
    * aggregate (buffer serialized only at shuffle boundaries); the udaf
    * twin is parity-tested in SketchPortableSpec. */
  def kmvDistinct(t: Tables, k: Int = 256): DataFrame = {
    import graft.functions.KmvSketch
    KmvSketch.register(t.spark)
    t.orders
      .select(col("o_orderpriority"), KmvSketch.hash31(col("o_custkey")).as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        KmvSketch.kmvDistinctNative(col("h"), k).as("approx_customers"))
      .orderBy(col("o_orderpriority"))
  }

  /** Sessionization via Spark's NATIVE session_window: per-user sessions
    * that merge events closer than `gapMinutes` and close at last-event +
    * gap. One shuffle on user_id; session merging happens inside the
    * aggregation operator (Spark's SessionWindowStateStore does the same in
    * streaming — the identical expression works under readStream with a
    * watermark). The DuckDB oracle replays the semantics as gaps-and-islands
    * SQL (lag + running sum of new-session flags), pinning the boundary
    * rule (verified empirically): an event exactly `gap` after its
    * predecessor still MERGES — only a strictly larger gap closes the
    * session. */
  def userSessions(t: Tables, gapMinutes: Int = 30): DataFrame =
    t.events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        date_format(col("session_window.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_end"),
        col("n_events"),
        col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Hierarchical totals via ROLLUP: (year, month) leaves, per-year
    * subtotals, and a grand total in ONE aggregate — Spark plans a single
    * Expand (one replica per grouping set) with map-side partials, versus
    * three scans + union for the manual form. `grouping_id` labels the
    * level (bit = column aggregated away), letting consumers split leaves
    * from subtotals without null-guessing. */
  def monthlyRollup(t: Tables): DataFrame =
    t.lineitem
      .select(
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .rollup(col("year"), col("month"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("gid"), col("year").asc_nulls_first, col("month").asc_nulls_first)

  /** A11's other half: CUBE — all 2ⁿ grouping sets (leaves, each
    * single-column margin, grand total) in one aggregate. Same single-
    * Expand plan shape as [[monthlyRollup]], one replica per grouping set
    * with map-side partials; `grouping_id` labels the set. */
  def flagStatusCube(t: Tables): DataFrame =
    t.lineitem
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        davg(col("l_extendedprice")).as("avg_price"))
      .orderBy(col("gid"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** q74: ordered conversion funnel — users who viewed, then clicked AFTER
    * their first view, then purchased AFTER that click (temporal order
    * enforced, not mere step membership — the distinction every product
    * funnel gets wrong when it counts steps independently).
    *
    * Shape: three whole-partition window minima over ONE hash exchange of
    * user_id (unbounded frames need no sort), then a per-user reduce on
    * the same partitioning and a global count rollup — the full-corpus
    * funnel costs a single shuffle regardless of event volume. Counts are
    * integers; the conversion ratio divides two exact longs, so the DuckDB
    * oracle replays it bit-for-bit. */
  def eventFunnel(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val perUser = t.events
      .withColumn("t_view", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"), col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"), col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t_view")).as("tv"), min(col("t_click")).as("tc"),
        min(col("t_purchase")).as("tp"))
    perUser
      .agg(count(col("tv")).as("n1"), count(col("tc")).as("n2"), count(col("tp")).as("n3"))
      .select(inline(array(
        struct(lit(1).as("step_id"), lit("view").as("step"), col("n1").as("n_users"),
          round(col("n1").cast("double") / col("n1"), 6).as("conversion")),
        struct(lit(2).as("step_id"), lit("click_after_view").as("step"), col("n2").as("n_users"),
          round(col("n2").cast("double") / col("n1"), 6).as("conversion")),
        struct(lit(3).as("step_id"), lit("purchase_after_click").as("step"), col("n3").as("n_users"),
          round(col("n3").cast("double") / col("n1"), 6).as("conversion")))))
      .orderBy(col("step_id"))
  }

  /** q75: weekly cohort retention — users grouped by the ISO week of their
    * first event; for each (cohort, weeks-since) cell, how many distinct
    * cohort members were active and what fraction of the cohort that is.
    * The standard growth-analytics matrix.
    *
    * Shape: one window minimum per user (hash exchange on user_id), narrow
    * week arithmetic, then a distinct-user count per (cohort, week) cell —
    * rows entering that aggregate are already deduplicated per (user,
    * cell), and cohort size joins back as a broadcast of the tiny cohort
    * dimension. Dates and counts are exact on both engines. */
  def cohortRetention(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val cells = t.events
      .withColumn("first_ts", min(col("ts")).over(w))
      .select(
        col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
        date_trunc("week", col("ts")).cast("date").as("activity_week"))
      .distinct()
      .withColumn("week_n",
        (datediff(col("activity_week"), col("cohort_week")) / 7).cast("int"))
    // cells are distinct per (user, cohort, activity week): plain counts
    // ARE distinct-user counts, no distinct-aggregate rewrite needed
    val cohortSizes = cells.filter(col("week_n") === 0)
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    cells
      .groupBy(col("cohort_week"), col("week_n"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_n"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention_pct"))
      .orderBy(col("cohort_week"), col("week_n"))
  }

  /** §2.7 set operations (unused by the reference; here for switch-over
    * completeness): the user base that clicked but never purchased
    * (EXCEPT/anti), and the one that did both (INTERSECT/semi). Both
    * compile to joins the optimizer picks a strategy for — EXCEPT/
    * INTERSECT DISTINCT are aggregate+join under the hood, so the shape
    * scales like any keyed join. */
  def setOpsUsers(t: Tables): DataFrame = {
    val clickers = t.events.filter(col("event_type") === "click")
      .select(col("user_id")).distinct()
    val purchasers = t.events.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    val only = clickers.except(purchasers).withColumn("segment", lit("click_only"))
    val both = clickers.intersect(purchasers).withColumn("segment", lit("click_and_purchase"))
    only.unionByName(both).orderBy(col("segment"), col("user_id"))
  }

  /** Exact discrete percentiles per group. `percentile_disc` SELECTS an
    * actual element (no interpolation), so the result is bit-identical
    * across engines by construction — interpolating forms (`percentile`,
    * `quantile_cont`) compute `a + (b-a)·f` vs `a·(1-f) + b·f` differently
    * and flake in the last ulp. The approximate twin for 100 TB serving is
    * `approx_percentile` (t-digest), contract-tested against this exact
    * form in SketchPortableSpec — the same exact/sketch pairing as
    * q04/q40. */
  def pricePercentiles(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50_price"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90_price"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY o_totalprice)").as("p99_price"))
      .orderBy(col("o_orderpriority"))

  /** Fixed-width histogram of order value per group — the data-profiling
    * shape (distribution drift checks before a training run). Bin edges are
    * literals so the histogram is comparable across runs and engines; one
    * shuffle on (group, bin), counts only. */
  def priceHistogram(t: Tables, binWidth: Int = 50000, nBins: Int = 10): DataFrame =
    t.orders
      .select(
        col("o_orderpriority"),
        least(floor(col("o_totalprice") / binWidth), lit(nBins - 1)).cast("int").as("bin"))
      .groupBy(col("o_orderpriority"), col("bin"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"), col("bin"))

  /** Pivot: one row per user, one count column per event type. The value
    * list is EXPLICIT — at scale an implicit pivot first runs a distinct
    * scan to discover columns and caps at
    * spark.sql.pivotMaxValues; pinning the list keeps the plan one
    * aggregate and the schema stable for downstream consumers. */
  def eventTypePivot(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("user_id"))

  /** Unpivot (melt): the inverse reshaping — wide per-type counts back to
    * long (user_id, event_type, n_events) rows, dropping absent
    * combinations like the pre-pivot input. Narrow operator: each row
    * expands to its non-null measures, no shuffle. */
  def eventTypeUnpivot(t: Tables): DataFrame =
    eventTypePivot(t)
      .unpivot(
        Array(col("user_id")),
        Array(col("view"), col("click"), col("purchase"), col("signup")),
        "event_type", "n_events")
      .filter(col("n_events") > 0)
      .orderBy(col("user_id"), col("event_type"))

  /** A3: conditional aggregation — AVG(CASE…), SUM(CASE…), COUNT(CASE…)
    * (reference `comprehensive_analytics.py:258`,
    * `location_to_iceberg.py:104-105`, `serving/database.py:60`). */
  def conditionalAgg(t: Tables): DataFrame =
    t.orders
      .groupBy(col("o_orderstatus"))
      .agg(
        davg(when(col("o_totalprice") > 1000, col("o_totalprice")).otherwise(lit(0.0)))
          .as("avg_large_price"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).cast("long")
          .as("urgent_count"),
        count(when(month(col("o_orderdate")).between(6, 8), lit(1))).as("summer_count"),
        (davg(when(col("o_totalprice") > 0, col("o_totalprice")).otherwise(lit(0.0))) / 100.0)
          .as("avg_price_pct"))
      .orderBy(col("o_orderstatus"))

  /** A4: time-bucketed aggregation by `date_trunc('hour', ts)` (reference
    * `comprehensive_analytics.py:336-343`, `serving/database.py:88-99`).
    * Output keyed by a formatted string so parquet/DuckDB timestamp
    * physical types cannot diverge in the oracle compare. */
  def hourlySeries(t: Tables): DataFrame =
    t.events
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        davg(col("value")).as("avg_value"),
        countDistinct(col("user_id")).as("distinct_users"))
      .select(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("n_events"),
        col("sum_value"),
        col("avg_value"),
        col("distinct_users"))
      .orderBy(col("hour_ts"))

  /** A5: multi-level aggregate (agg of agg) — hourly counts rolled up to
    * per-day AVG/MAX (reference `comprehensive_analytics.py:273-281`).
    * Two chained hash aggregates; the second input is already tiny. */
  def multiLevelAgg(t: Tables): DataFrame =
    t.events
      .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("hourly_events"))
      .groupBy(col("day"))
      .agg(
        davg(col("hourly_events")).as("avg_events_per_hour"),
        max(col("hourly_events")).as("max_events_per_hour"),
        count(lit(1)).as("active_hours"))
      .orderBy(col("day"))

  /** A6: Pearson correlation per group (reference
    * `ml_feature_engineering.py:532-534`), from exact decimal moments. */
  def corrByFlag(t: Tables): DataFrame =
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        dcorr(col("l_quantity"), col("l_extendedprice")).as("qty_price_corr"),
        dcorr(col("l_discount"), col("l_tax")).as("disc_tax_corr"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** q115: pairwise Pearson correlation MATRIX over the fact's measure
    * columns in ONE pass — the feature-profiling shape (which measures are
    * redundant / collinear before they feed a model). All C(n,2) pairs
    * come from the same scan: one global aggregate computes every pair's
    * exact decimal moments ([[graft.functions.ExactAgg.dcorr]]), then a
    * `stack` unpivots the single result row to (col_x, col_y, corr) rows.
    * The naive form runs one scan per pair — 6 scans here, 45 at 10
    * features; this is always exactly one. */
  def corrMatrix(t: Tables): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.length }
      yield (cols(i), cols(j))
    val aggs = pairs.map { case (x, y) => dcorr(col(x), col(y)).as(s"${x}__$y") } :+
      count(lit(1)).as("n_rows")
    val stackArgs = pairs
      .map { case (x, y) => s"'$x', '$y', `${x}__$y`" }
      .mkString(", ")
    t.lineitem
      .agg(aggs.head, aggs.tail: _*)
      .select(
        expr(s"stack(${pairs.length}, $stackArgs) AS (col_x, col_y, corr)"),
        col("n_rows"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** The DuckDB mirror of [[corrMatrix]]. */
  def corrMatrixSql: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.length }
      yield (cols(i), cols(j))
    val sums = pairs
      .map { case (x, y) => s"${Sql.dcorr(x, y)} AS ${x}__$y" }
      .mkString(",\n   ")
    val arms = pairs
      .map { case (x, y) => s"SELECT '$x' AS col_x, '$y' AS col_y, ${x}__$y AS corr, n_rows FROM a" }
      .mkString("\n", "\nUNION ALL\n", "")
    s"""WITH a AS (
       |  SELECT $sums,
       |   count(*) AS n_rows
       |  FROM lineitem)$arms
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** A7: collect_set, emitted as a sorted joined string so set ordering is
    * deterministic across engines (reference `weather_to_iceberg.py:115`). */
  def collectSetByUser(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"))
      .agg(
        array_join(sort_array(collect_set(col("event_type"))), ",").as("event_types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** A10: global no-group aggregate — the dashboard-stats shape (reference
    * `serving/database.py:243-252`, `ml_feature_engineering.py:503-513`). */
  def globalStats(t: Tables): DataFrame = {
    // two count(DISTINCT) in one aggregate would plan an Expand that
    // replicates every fact row 3× — the q03 pathology. The Roaring-style
    // bitmap aggregate keeps both distinct counts exact in a single
    // un-replicated pass (same promotion as Ingest.dailySummaryBitmap;
    // equivalence to count(DISTINCT) pinned in BitmapDistinctSpec).
    graft.functions.BitmapDistinct.register(t.spark)
    t.lineitem.agg(
      count(lit(1)).as("total_rows"),
      graft.functions.BitmapDistinct.bitmapDistinct(col("l_partkey")).as("distinct_parts"),
      graft.functions.BitmapDistinct.bitmapDistinct(col("l_orderkey")).as("distinct_orders"),
      davg(col("l_extendedprice")).as("avg_price"),
      dsumRevenue(col("l_extendedprice"), col("l_discount")).as("total_revenue"),
      to_date(min(col("l_shipdate"))).as("first_ship_date"),
      to_date(max(col("l_shipdate"))).as("last_ship_date"))
  }

  // ─── Joins ────────────────────────────────────────────────────────────

  /** J4/J11 + P7: fact → dimension chain with broadcast hints, left joins,
    * then a null-reject predicate that makes the join effectively inner
    * (reference `comprehensive_analytics.py:313,316`). The 25-row nation /
    * 5-row region dims are the zones-dimension analog: always broadcast —
    * no shuffle of the big side at any scale. */
  def customerByRegion(t: Tables): DataFrame =
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"), "left")
      .filter(col("n_nationkey").isNotNull) // P7 null-reject → inner semantics
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        davg(col("c_acctbal")).as("avg_balance"),
        dsum(col("c_acctbal")).as("sum_balance"),
        countDistinct(col("n_name")).as("n_nations"))
      .orderBy(col("r_name"))

  /** J3: two independent aggregates of the same fact joined on a multi-key —
    * the pickup-metrics ⟕ dropoff-metrics shape (reference
    * `comprehensive_analytics.py:311-312`). Both sides pre-aggregate before
    * the join, so the join input is already reduced; Catalyst plans SMJ on
    * the 3-key or broadcasts the smaller aggregate under AQE. */
  def pickupDropoffJoin(t: Tables): DataFrame = {
    // One-pass conditional aggregation (r11): the original two-aggregate
    // self-join scanned the fact twice and shuffled it twice before a
    // sort-merge join on the full grouping key; the "dropoffs" side is a
    // row-filtered aggregate of the SAME groups, so conditional sums over
    // one pass produce identical values (dsum/sum skip the NULLs the
    // when() leaves, exactly the filtered subset; groups with no 'R' row
    // yield NULL → the same coalesce(0) the left join applied). One scan,
    // one exchange, no join — the guide §2.4 shared-exchange shape.
    t.lineitem
      .select(
        col("l_partkey"),
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        col("l_quantity"),
        col("l_extendedprice"),
        col("l_returnflag"))
      .groupBy(col("l_partkey"), col("year"), col("month"))
      .agg(
        count(lit(1)).as("n_ship"),
        dsum(col("l_quantity")).as("qty_ship"),
        sum(when(col("l_returnflag") === "R", 1L)).as("n_return_n"),
        dsum(when(col("l_returnflag") === "R", col("l_extendedprice")))
          .as("price_return_n"))
      .select(
        col("l_partkey"),
        col("year"),
        col("month"),
        col("n_ship"),
        col("qty_ship"),
        coalesce(col("n_return_n"), lit(0L)).as("n_return"),
        coalesce(col("price_return_n"), lit(0.0)).as("price_return"))
      .orderBy(col("l_partkey"), col("year"), col("month"))
  }

  /** J10: join on an expression — events joined to their own hourly stats on
    * `(user_id, date_trunc('hour', ts))` (reference
    * `ml_feature_engineering.py:480-481`). */
  def joinOnExpr(t: Tables): DataFrame = {
    val hourly = t.events
      .groupBy(col("user_id").as("h_user_id"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("events_in_hour"), dsum(col("value")).as("value_in_hour"))
    t.events
      .join(
        hourly,
        col("user_id") === col("h_user_id") &&
          date_trunc("hour", col("ts")) === col("hour_ts"),
        "left")
      .select(
        col("event_id"),
        col("user_id"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("events_in_hour"),
        col("value_in_hour"))
      .orderBy(col("event_id"))
  }

  /** J9: fact joined to its own history aggregate (the route-history shape,
    * reference `ml_feature_engineering.py:478-479`). */
  def selfAggJoin(t: Tables): DataFrame = {
    val hist = t.orders
      .groupBy(col("o_custkey").as("h_custkey"))
      .agg(
        davg(col("o_totalprice")).as("cust_avg_price"),
        count(lit(1)).as("cust_orders"))
    t.orders
      .join(hist, col("o_custkey") === col("h_custkey"), "left")
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice").as("total_price"),
        col("cust_avg_price"),
        col("cust_orders"),
        (col("o_totalprice") / col("cust_avg_price")).as("price_vs_cust_avg"))
      .orderBy(col("o_orderkey"))
  }

  /** J8: the same fact joined to two dimensions via different FKs (the
    * pickup-zone/dropoff-zone double-dimension shape, reference
    * `ml_feature_engineering.py:475-476`), both broadcast. */
  def doubleDimJoin(t: Tables): DataFrame =
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"), "left")
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"), "left")
      .filter(col("p_partkey").isNotNull && col("s_suppkey").isNotNull)
      .groupBy(col("p_brand"), col("s_name"))
      .agg(
        count(lit(1)).as("n_lines"),
        dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("p_brand"), col("s_name"))

  // ─── Window functions ─────────────────────────────────────────────────

  /** Demand series: events per (user, hour) — shared input of the window
    * shapes below (the zone-hour demand grid of
    * `comprehensive_analytics.py:336-343`). Revenue is kept as an exact
    * decimal so window-frame sums over it stay order-independent.
    * (user_id, hour_ts) is unique post-aggregation, so window ordering
    * needs no extra tiebreaker. */
  private def demandSeries(t: Tables): DataFrame =
    t.events
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("demand"), dsumDec(col("value")).as("revenue_dec"))

  /** W1: LAG(demand, k) k ∈ {1,2,3} over (partition user, order hour)
    * (reference `comprehensive_analytics.py:372-385`). One shuffle on
    * user_id, one sort per partition — at scale the partition key must be
    * the high-cardinality entity (zone/user), never a constant. */
  def windowLag(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour_ts"))
    demandSeries(t)
      .select(
        col("user_id"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("demand"),
        lag(col("demand"), 1).over(w).as("demand_lag_1"),
        lag(col("demand"), 2).over(w).as("demand_lag_2"),
        lag(col("demand"), 3).over(w).as("demand_lag_3"))
      .orderBy(col("user_id"), col("hour_ts"))
  }

  /** W2/W3: rolling AVG and STDDEV over `ROWS BETWEEN 6 PRECEDING AND 1
    * PRECEDING` — excludes the current row like the reference's 168/720
    * frames (`comprehensive_analytics.py:388-398`,
    * `ml_feature_engineering.py:268-284`). Rolling stats derive from exact
    * frame moments (integer / decimal window sums) so segment-tree vs
    * recompute window strategies cannot change the result. */
  def windowRolling(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour_ts")).rowsBetween(-6, -1)
    val n = count(lit(1)).over(w).cast("double")
    val s = sum(col("demand")).over(w).cast("double")
    val q = sum(col("demand") * col("demand")).over(w).cast("double")
    demandSeries(t)
      .select(
        col("user_id"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("demand"),
        (sum(col("demand")).over(w).cast("double") / count(lit(1)).over(w))
          .as("rolling_avg_demand"),
        when(count(lit(1)).over(w) > 1, sqrt((q - s * s / n) / (n - lit(1.0))))
          .as("rolling_stddev_demand"),
        (sum(col("revenue_dec")).over(w).cast("double") / count(lit(1)).over(w))
          .as("rolling_avg_revenue"))
      .orderBy(col("user_id"), col("hour_ts"))
  }

  /** W4: NTILE(10) over an aggregate ordering — the popularity-decile shape
    * (reference `ml_feature_engineering.py:203-210`). Deterministic
    * tiebreaker (user_id) per SURVEY §7 hard part 4. The global-order window
    * funnels all rows through one partition — acceptable only because the
    * input is post-aggregation (one row per entity). */
  def ntileDecile(t: Tables): DataFrame = {
    val perUser = t.events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("total_events"), davg(col("value")).as("avg_value"))
    perUser
      .select(
        col("user_id"),
        col("total_events"),
        col("avg_value"),
        ntile(10).over(Window.orderBy(col("total_events"), col("user_id"))).as("popularity_decile"))
      .orderBy(col("user_id"))
  }

  /** W5: window over aggregate in the same projection — the surge-factor
    * baseline AVG(COUNT(*)) OVER (PARTITION BY zone) (reference
    * `ml_feature_engineering.py:418-421`), decomposed agg-then-window. */
  def windowOverAgg(t: Tables): DataFrame = {
    val perUserHour = t.events
      .groupBy(col("user_id"), hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("user_id"))
    val baseline = sum(col("n_events")).over(w).cast("double") / count(lit(1)).over(w)
    perUserHour
      .select(
        col("user_id"),
        col("hour_of_day"),
        col("n_events"),
        baseline.as("user_baseline"),
        (col("n_events") / baseline).as("surge_factor"))
      .orderBy(col("user_id"), col("hour_of_day"))
  }

  /** J6/J7 + W1/W2: the demand-prediction feature builder — hourly demand
    * aggregate ⟕ hourly "weather" aggregate ⟕ zone dimension, with LAG and
    * rolling-frame history features and a CASE impact factor (reference
    * `comprehensive_analytics.py:335-424`, the `current_demand` /
    * `weather_features` / `zone_reference` triple join), events-shaped so
    * the whole shape sits under the DuckDB hash gate.
    *
    * Scale notes: both fact-side aggregates shuffle ONCE on their group
    * keys with map-side partials; the dimension joins broadcast; the
    * window features ride the demand aggregate's (location, hour)
    * partitioning — one additional shuffle on location_id, shared by all
    * four window columns. Rolling averages derive from exact integer frame
    * sums (same doctrine as [[windowRolling]]). Day-of-week is ISO
    * (`weekday()+1`, Mon=1) — portable, unlike Spark's Sunday-first
    * `dayofweek`. */
  def demandFeatures(t: Tables): DataFrame = {
    val demand = t.events
      .groupBy(
        pmod(col("user_id"), lit(25)).as("location_id"),
        date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("demand_count"))
    val weather = t.events
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(
        davg(col("value")).as("avg_value"),
        min(col("event_type")).as("condition"))
    val zones = t.nation.select(
      col("n_nationkey").as("location_id"),
      col("n_name").as("zone_name"),
      col("n_regionkey").as("zone_type"))
    val w = Window.partitionBy(col("location_id")).orderBy(col("hour_ts"))
    val frame7d = w.rowsBetween(-168, -1)
    val isoDow = weekday(col("hour_ts")) + 1
    demand
      .join(weather, Seq("hour_ts"), "left")
      .join(broadcast(zones), Seq("location_id"), "left")
      .select(
        col("location_id"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        hour(col("hour_ts")).as("hour"),
        isoDow.as("iso_dow"),
        (isoDow >= 6).as("is_weekend"),
        col("demand_count"),
        lag(col("demand_count"), 1).over(w).as("demand_1h_ago"),
        lag(col("demand_count"), 24).over(w).as("demand_24h_ago"),
        (sum(col("demand_count")).over(frame7d).cast("double") /
          count(lit(1)).over(frame7d)).as("rolling_avg_demand_7d"),
        col("avg_value"),
        coalesce(col("condition"), lit("unknown")).as("condition"),
        col("zone_name"),
        col("zone_type"),
        when(col("condition").isin("purchase", "signup"), lit(1.3))
          .when(col("avg_value") > 50, lit(1.1))
          .otherwise(lit(1.0)).as("impact_factor"))
      .orderBy(col("location_id"), col("hour_ts"))
  }

  /** A9 batch twin: the zone-activity score of the streaming cascade's
    * second hop (reference `realtime_cdc_processor.py:206-227`), computed
    * over events so the scoring arithmetic is DuckDB-hash-checked; the
    * streaming form ([[graft.streaming.ZoneActivity.score]]) shares the
    * formula. Single shuffle on the two group keys; the score is plain
    * IEEE arithmetic over exact aggregate inputs — deterministic and
    * engine-portable. */
  def zoneActivityBatch(t: Tables): DataFrame =
    t.events
      .groupBy(
        date_trunc("hour", col("ts")).as("window_start"),
        pmod(col("user_id"), lit(25)).as("zone_id"))
      .agg(
        count(lit(1)).as("pickup_count"),
        dsum(col("value")).as("revenue_last_hour"),
        davg(col("value")).as("avg_fare_last_hour"),
        countDistinct(col("event_type")).as("unique_types"))
      .select(
        col("zone_id"),
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("activity_timestamp"),
        col("pickup_count"),
        lit(0L).as("dropoff_count"),
        col("revenue_last_hour"),
        col("avg_fare_last_hour"),
        graft.streaming.ZoneActivity.activityScore(
          col("pickup_count"), col("revenue_last_hour"), col("unique_types"))
          .as("activity_score"))
      .orderBy(col("zone_id"), col("activity_timestamp"))

  /** W7: peak-hour-per-group via row_number()==1 (reference
    * `serving/database.py:257-266`) with deterministic tiebreak. */
  def peakHour(t: Tables): DataFrame = {
    val counts = t.events
      .groupBy(col("event_type"), hour(col("ts")).as("hour_of_day"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("n_events").desc, col("hour_of_day"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
      .orderBy(col("event_type"))
  }

  /** q80: robust outlier detection per group — median/MAD z-score, the
    * data-profiling shape that survives the heavy-tailed value
    * distributions mean/stddev breaks on (one whale purchase shifts a mean;
    * it cannot shift a median). Three passes by construction (median →
    * MAD → flag), each a single shuffle on the group key; the two tiny
    * stats frames broadcast back onto the fact, so the fact is never
    * shuffled. Engine-portable: `percentile_disc` SELECTS an input value
    * (no interpolation), IEEE subtract/abs/compare are exact, and the
    * threshold multiply is one rounding — bit-identical in any engine. */
  def robustOutliers(t: Tables, nSigma: Double = 3.0): DataFrame = {
    val med = t.events
      .groupBy(col("event_type"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("median_value"))
    val dev = t.events
      .join(broadcast(med), "event_type")
      .withColumn("abs_dev", abs(col("value") - col("median_value")))
    val mad = dev
      .groupBy(col("event_type"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev)").as("mad"))
    dev
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("median_value")).as("median_value"),
        min(col("mad")).as("mad"),
        count(when(col("abs_dev") > lit(nSigma) * col("mad"), lit(1))).as("n_outliers"))
      .withColumn("outlier_pct",
        round(col("n_outliers").cast("double") / col("n_events"), 6))
      .orderBy(col("event_type"))
  }

  /** q81: the salted two-phase aggregation ([[graft.functions.Skew]])
    * under the oracle gate — count + exact decimal sum over a 5-value key
    * (events.event_type: ~N/5 rows per key, the textbook hot-key layout
    * where a plain groupBy leaves 27 of 32 reducers idle). Phase 1 groups
    * on (key, salt) so each hot key spreads over `salts` reducers; phase 2
    * merges the partials on the key alone. The sum stays bit-exact through
    * both phases because it rides [[graft.functions.ExactAgg]]'s split
    * hi/lo long kernels — longs are associative, so partial-then-merge is
    * the identical arithmetic to the one-phase form the oracle runs. */
  def saltedEventStats(t: Tables, salts: Int = 16): DataFrame = {
    val p = round(col("value") * lit(1000000), 0).cast("long")
    graft.functions.Skew.saltedAggregate(
      t.events,
      keys = Seq(col("event_type")),
      salts = salts,
      partials = Seq(
        count(lit(1)).as("pc"),
        sum(shiftright(p, 26)).as("ph"),
        sum(p.bitwiseAND(lit(67108863L))).as("pl")),
      merge = Seq(
        sum(col("pc")).as("n_events"),
        ((sum(col("ph")).cast("double") * lit(67108864.0) +
          sum(col("pl")).cast("double")) / lit(1000000.0)).as("sum_value")))
      .orderBy(col("event_type"))
  }

  /** q91: SCD2 dimension history — turn a change stream into
    * validity-interval rows (effective_from, effective_to, is_current),
    * the slowly-changing-dimension type-2 table every lakehouse keeps for
    * point-in-time joins (the batch complement of the as-of join, q46).
    * One window over the natural key: effective_to is simply the next
    * version's start (LEAD), current rows have none. Single shuffle on
    * user_id; version numbering and interval closure come from the same
    * sort. */
  def scd2History(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("attr_type"), round(col("value"), 2).as("attr_value"))
      .select(
        col("user_id"),
        row_number().over(w).as("version_n"),
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("effective_from"),
        date_format(lead(col("ts"), 1).over(w), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("effective_to"),
        lead(col("ts"), 1).over(w).isNull.as("is_current"),
        col("attr_type"), col("attr_value"))
      .orderBy(col("user_id"), col("version_n"))
  }

  /** q92: sliding-window EXACT distinct users (trailing 7 days) — the
    * windowed sibling of q85's cumulative form, same bitmap state/merge
    * machinery: one fact pass builds per-day states, then each day merges
    * only its trailing window's states (≤7 per day instead of q85's
    * all-preceding). This is how exact rolling-distinct dashboards stay
    * O(days·window) at any fact size — the naive
    * `COUNT(DISTINCT) OVER (RANGE 7 days)` re-scans the fact per frame. */
  def slidingDistinctUsers(t: Tables, windowDays: Int = 7): DataFrame = {
    graft.functions.BitmapDistinct.register(t.spark)
    val daily = t.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.BitmapDistinct.bitmapDistinct(col("user_id"))
          .as("daily_distinct_users"),
        graft.functions.BitmapDistinct.bitmapState(col("user_id")).as("bm"))
      .localCheckpoint() // day frame reused on both sides of the join
    daily.as("d")
      .join(daily.as("e"),
        col("e.day") <= col("d.day") &&
          col("e.day") >= date_sub(col("d.day"), windowDays - 1))
      .groupBy(col("d.day").as("day"),
        col("d.n_events").as("n_events"),
        col("d.daily_distinct_users").as("daily_distinct_users"))
      .agg(graft.functions.BitmapDistinct.bitmapMergeCount(col("e.bm"))
        .as("rolling_distinct_users"))
      .orderBy(col("day"))
  }

  /** q93: per-group trend — closed-form OLS of value against time (hours
    * since a FIXED 2024-01-01 base), from the same exact-moment kernels as
    * [[graft.functions.ExactAgg.dcorr]]: slope =
    * (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), every Σ a decimal split-sum, so
    * both engines derive the slope from bit-identical moments through one
    * fixed double expression. The constant rebase (not a data-dependent
    * min) keeps the cents-product moments small without an extra pass;
    * slope is shift-invariant and the intercept is reported AT the base.
    * One pass, one shuffle on the group key — trend detection at fact
    * scale without collect or MLlib. */
  def valueTrend(t: Tables): DataFrame = {
    val base = 1704067200L // 2024-01-01T00:00:00Z
    val x = floor((unix_timestamp(col("ts")) - lit(base)) / lit(3600.0)).cast("double")
    val agg = t.events
      .select(col("event_type"), x.as("x"), col("value").as("y"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("x")).as("sx"),
        dsum(col("y")).as("sy"),
        dsumProd(col("x"), col("y")).as("sxy"),
        dsumProd(col("x"), col("x")).as("sxx"))
    val n = col("n_events").cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    agg.select(
        col("event_type"), col("n_events"),
        round(slope, 9).as("slope_per_hour"),
        round((col("sy") - slope * col("sx")) / n, 6).as("intercept_at_base"))
      .orderBy(col("event_type"))
  }

  /** q104: cumulative APPROXIMATE distinct users by day — q85's shape on
    * the KMV bottom-k sketch instead of exact bitmaps: per-day 2 KiB
    * states from one fact pass, cumulative estimates from merging each
    * day's trailing states. Bottom-k of a union of bottom-k sketches IS
    * the global bottom-k, so the merged estimate equals the one computed
    * from raw data — which is why, unlike HLL, the DuckDB oracle replays
    * the whole cascade exactly. At extreme cardinalities this is the
    * memory story: the bitmap's worst case grows with the key domain, the
    * sketch never exceeds k hashes per day. */
  def cumulativeApproxDistinct(t: Tables, k: Int = 256): DataFrame = {
    import graft.functions.KmvSketch
    KmvSketch.register(t.spark)
    val daily = t.events
      .select(to_date(col("ts")).as("day"), KmvSketch.hash31(col("user_id")).as("h"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_events"), KmvSketch.kmvState(col("h"), k).as("st"))
      .localCheckpoint() // day frame reused on both sides of the join
    daily.as("d")
      .join(daily.as("e"), col("e.day") <= col("d.day"))
      .groupBy(col("d.day").as("day"), col("d.n_events").as("n_events"))
      .agg(KmvSketch.kmvMerge(col("e.st"), k).as("approx_cumulative_users"))
      .orderBy(col("day"))
  }

  /** q105: PER-GROUP equi-depth histogram — q102's quantile-bin shape
    * computed independently inside every group (order priority), the
    * per-segment distribution monitor: one segment's price drift is
    * invisible in a global histogram. Same two-pass plan, now grouped:
    * per-group edge arrays from one grouped array-percentile aggregate
    * (tiny — one row per group), broadcast-joined back on the group key;
    * bucketing stays a narrow projection.
    *
    * ORACLE TWIN, not the production default: every group's exact
    * percentile buffers that group's full column. Production uses
    * [[groupedEquiDepthHistogramApprox]] (q108, `groups x grid` counters);
    * this form pins its accuracy and feeds the DuckDB compare. */
  def groupedEquiDepthHistogram(t: Tables, buckets: Int = 5): DataFrame = {
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val edges = t.orders
      .groupBy(col("o_orderpriority"))
      .agg(expr(s"percentile(o_totalprice, array(${qs.mkString(",")}))").as("es"))
    val bucket = (1 until buckets)
      .map(i => (element_at(col("es"), i) <= col("o_totalprice")).cast("int"))
      .reduce(_ + _)
    t.orders
      .join(broadcast(edges), "o_orderpriority")
      .select(col("o_orderpriority"), bucket.as("bucket"), col("o_totalprice"))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"), col("bucket"))
  }

  /** q103: referential-integrity audit — orphan foreign keys per
    * relationship, the constraint check a lakehouse has to RUN because
    * parquet enforces nothing (the reference's Postgres source enforced
    * FKs; its lake tables silently don't). One LEFT ANTI join per edge —
    * each plans as a broadcast/shuffled hash anti join with only the key
    * column scanned on both sides — then a one-row summary per
    * relationship, unioned. */
  def referentialIntegrity(t: Tables): DataFrame = {
    def audit(name: String, fact: DataFrame, fk: String,
              dim: DataFrame, pk: String): DataFrame = {
      val total = fact.select(col(fk).as("k"))
      val orphans = total.join(dim.select(col(pk).as("k")), Seq("k"), "left_anti")
      total.agg(count(lit(1)).as("n_rows"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(
          lit(name).as("relationship"),
          col("n_rows"), col("n_orphans"),
          round(col("n_orphans").cast("double") / col("n_rows"), 6)
            .as("orphan_pct"))
    }
    audit("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .unionByName(
        audit("lineitem.l_partkey->part", t.lineitem, "l_partkey", t.part, "p_partkey"))
      .unionByName(
        audit("orders.o_custkey->customer", t.orders, "o_custkey", t.customer, "c_custkey"))
      .unionByName(
        audit("customer.c_nationkey->nation", t.customer, "c_nationkey", t.nation, "n_nationkey"))
      .orderBy(col("relationship"))
  }

  /** Approximate quantile edges by deterministic GRID-HISTOGRAM refinement
    * — the scale-safe replacement for exact `percentile`'s per-group
    * full-column buffer (the textbook single-reducer OOM at 100 TB).
    * Three narrow passes, all bounded: (1) per-group min/max/count;
    * (2) per-group counts over a fixed `grid` of equi-width cells — at
    * most `grid` counters per group no matter how many rows; (3) the
    * crossing cell for each target rank, with uniform interpolation
    * inside it. Error is bounded by one cell width in VALUE space.
    *
    * Chosen over `approx_percentile` (Greenwald-Khanna) deliberately: GK's
    * result depends on partial-merge ORDER, so two cluster layouts give
    * two answers and no external oracle can replay it. Grid counts are
    * pure additions — order-independent, layout-independent, and
    * bit-replayable by the DuckDB oracle (same IEEE arithmetic, same
    * expression shapes) — the same portability argument as the KMV/CMS
    * sketches. Returns one row per group with edge columns e1..e{b-1}. */
  // ── shared grid-cell arithmetic for the q107/q108/q109 family ─────────
  // ONE definition of the IEEE-sensitive expressions; the DuckDB mirrors
  // in SketchOracleSql are written against these exact shapes, so any
  // change here must land there too or the bit-exact contract breaks.
  // All three expect frames carrying mn/mx (global or per-group bounds)
  // and, for crossing/edge, bin/c/cb from the cell histogram.

  /** Clamped equi-width cell index of `v` over [mn, mx]. */
  private def gridCell(v: Column, grid: Int): Column =
    when(col("mx") === col("mn"), lit(0)).otherwise(
      least(floor((v - col("mn")) / (col("mx") - col("mn")) * lit(grid.toDouble))
        .cast("int"), lit(grid - 1)))

  /** True on the one occupied cell whose cumulative span contains
    * `target`. */
  private def gridCrossing(target: Column): Column =
    col("cb").cast("double") <= target &&
      (col("cb") + col("c")).cast("double") > target

  /** Uniform interpolation of rank `target` inside the crossing cell. */
  private def gridEdge(target: Column, grid: Int): Column =
    col("mn") +
      (col("bin").cast("double") +
        (target - col("cb").cast("double")) / col("c").cast("double")) *
        ((col("mx") - col("mn")) / lit(grid.toDouble))

  def gridQuantileEdges(
      df: DataFrame, valueCol: String, groupCols: Seq[String],
      buckets: Int, grid: Int): DataFrame = {
    val gcols = groupCols.map(col)
    val v = col(valueCol)
    val mm = (if (groupCols.isEmpty) df.groupBy() else df.groupBy(gcols: _*))
      .agg(min(v).as("mn"), max(v).as("mx"),
        count(lit(1)).cast("double").as("n"))
    val withMm =
      if (groupCols.isEmpty) df.crossJoin(broadcast(mm))
      else df.join(broadcast(mm), groupCols)
    val bin = gridCell(v, grid)
    val hist = withMm
      .groupBy((gcols :+ bin.as("bin")): _*)
      .agg(count(lit(1)).as("c"),
        max(col("mn")).as("mn"), max(col("mx")).as("mx"), max(col("n")).as("n"))
    // cumulative count BEFORE each occupied cell; the window runs over at
    // most `grid` rows per group — a metadata-sized frame, never the data
    val w = Window.partitionBy(gcols: _*).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cb", coalesce(sum(col("c")).over(w), lit(0L)))
    val targets = df.sparkSession.range(1, buckets)
      .select(col("id").cast("int").as("i"))
    val target = col("i").cast("double") * col("n") / lit(buckets.toDouble)
    val crossing = cum.join(broadcast(targets), gridCrossing(target))
    val edges = crossing.select((gcols :+ gridEdge(target, grid).as("edge")): _*)
    (if (groupCols.isEmpty) edges.groupBy() else edges.groupBy(gcols: _*))
      .agg(sort_array(collect_list(col("edge"))).as("es"))
      .select((gcols ++
        (1 until buckets).map(i => element_at(col("es"), i).as(s"e$i"))): _*)
  }

  /** Exact discrete quantiles with O(grid)-bounded memory: the
    * `percentile_disc` VALUE — the ceil(q·n)-th order statistic, an
    * actual data value, the q51/q253 boundary discipline — computed
    * without ever buffering the column in one aggregation buffer.
    *
    * A global `percentile_disc` aggregate holds every value of the frame
    * in a single reducer's buffer — multi-GB at 10⁹ rows, the exact
    * failure mode [[gridQuantileEdges]] (q107/q170) exists for. This is
    * the grid machinery REFINED TO A DISC SELECTION: each pass histograms
    * the current value interval into `grid` equi-width cells carrying
    * (count, actual min, actual max) — a ≤`grid`-row distributed hash
    * aggregate, collected as a bounded driver read — and descends into
    * the cell containing the target rank. Equal values always land in the
    * same cell (the cell index is a deterministic function of the value),
    * so duplicate runs never split. The descent terminates when the cell
    * holds one distinct value (its min == max IS the answer) or ≤ `cap`
    * rows, where one TakeOrdered pass (`orderBy.limit(rank).agg(max)` —
    * per-partition heaps of ≤ rank ≤ cap entries, never a global sort)
    * selects the exact order statistic. Each pass shrinks the interval
    * ×grid against actual data bounds, so the level count is
    * log_grid(range/ulp) ≤ ~64 worst case and 1–2 in practice.
    *
    * Returns one driver double per requested fraction — the bounded-
    * 1-row-read pattern (knModel's scalars); callers broadcast them back
    * as literals. Rank = ceil(q·n) formed from the same double literal
    * `percentile_disc` reads, so the result is bit-identical to Spark's
    * `percentile_disc` and to DuckDB's `quantile_disc` oracle twin
    * (equality property-checked in GridQuantileDiscSpec). Callers should
    * pass a MATERIALIZED frame (the q170 localCheckpoint discipline):
    * every pass re-reads it. */
  def gridQuantileDiscs(df: DataFrame, valueCol: String, qs: Seq[Double],
                        grid: Int = 1024, cap: Int = 1 << 16): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"fractions must be in (0, 1], got $qs")
    require(grid >= 2 && cap >= 1, s"need grid >= 2 and cap >= 1")
    val base = df.select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val first = base.agg(count(lit(1)).as("n"),
      min(col("v")).as("mn"), max(col("v")).as("mx")).head()
    val n = first.getLong(0)
    require(n > 0, s"gridQuantileDiscs($valueCol): no rows to select from")
    val (gMn, gMx) = (first.getDouble(1), first.getDouble(2))
    def cellOf(mn: Double, mx: Double): Column =
      least(floor((col("v") - lit(mn)) / (lit(mx) - lit(mn)) *
        lit(grid.toDouble)).cast("int"), lit(grid - 1))
    qs.map { q =>
      // smallest rank whose cume_dist >= q, with q·n the same double
      // product percentile_disc forms internally
      var rank = math.ceil(q * n.toDouble).toLong
      var cur = base
      var cnt = n
      var mn = gMn
      var mx = gMx
      var answer: Option[Double] = if (mn == mx) Some(mn) else None
      var level = 0
      while (answer.isEmpty && cnt > cap) {
        require(level < 64, // log_grid(double range/ulp) bound — unreachable
          s"gridQuantileDiscs: no convergence after $level levels")
        val cell = cellOf(mn, mx)
        val hist = cur.groupBy(cell.as("bin"))
          .agg(count(lit(1)).as("c"),
            min(col("v")).as("cmn"), max(col("v")).as("cmx"))
          .orderBy(col("bin")).collect()
        var cum = 0L
        var i = 0
        while (cum + hist(i).getLong(1) < rank) { cum += hist(i).getLong(1); i += 1 }
        val h = hist(i)
        rank -= cum
        cnt = h.getLong(1)
        if (h.getDouble(2) == h.getDouble(3)) answer = Some(h.getDouble(2))
        else {
          cur = cur.where(cell === lit(h.getInt(0)))
          mn = h.getDouble(2)
          mx = h.getDouble(3)
          level += 1
        }
      }
      answer.getOrElse(
        cur.orderBy(col("v")).limit(rank.toInt)
          .agg(max(col("v"))).head().getDouble(0))
    }
  }

  /** q107: equi-depth histogram on APPROXIMATE edges — the production
    * default of [[equiDepthHistogram]]'s shape. Same output contract
    * (bucket, n_orders, min/max price); edges come from
    * [[gridQuantileEdges]] so memory is O(grid) per group instead of the
    * exact form's O(rows) percentile buffer. The exact variant (q102) is
    * kept as the bit-exact oracle twin — the q04/q40 exact-vs-sketch
    * pattern; see SketchPortableSpec for the accuracy contract binding
    * this path to the exact edges. */
  def equiDepthHistogramApprox(
      t: Tables, buckets: Int = 10, grid: Int = 4096): DataFrame = {
    val edges = gridQuantileEdges(t.orders, "o_totalprice", Nil, buckets, grid)
    val bucket = (1 until buckets)
      .map(i => (col(s"e$i") <= col("o_totalprice")).cast("int"))
      .reduce(_ + _)
    t.orders
      .crossJoin(broadcast(edges))
      .select(bucket.as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("bucket"))
  }

  /** q108: per-group equi-depth histogram on APPROXIMATE edges — the
    * production default of [[groupedEquiDepthHistogram]]'s shape (q105
    * stays as the exact oracle twin). Grouped grid refinement: every pass
    * carries the group key, so a 100 TB run holds `groups x grid` counters
    * — still metadata-sized — where the exact form buffers every group's
    * full column in single aggregation buffers. */
  def groupedEquiDepthHistogramApprox(
      t: Tables, buckets: Int = 5, grid: Int = 4096): DataFrame = {
    val edges = gridQuantileEdges(
      t.orders, "o_totalprice", Seq("o_orderpriority"), buckets, grid)
    val bucket = (1 until buckets)
      .map(i => (col(s"e$i") <= col("o_totalprice")).cast("int"))
      .reduce(_ + _)
    t.orders
      .join(broadcast(edges), "o_orderpriority")
      .select(col("o_orderpriority"), bucket.as("bucket"), col("o_totalprice"))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"), col("bucket"))
  }

  /** q109: cumulative per-day quantiles from MERGEABLE grid-histogram
    * states — the quantile member of the state/merge sketch family
    * (q85 = bitmap exact distinct, q104 = KMV approx distinct). Each day
    * reduces to at most `grid` cell counts over a fixed global value
    * range; merging days is elementwise ADDITION of those counts —
    * commutative, associative, order-independent — so "median and p90 of
    * everything up to day D" comes from merging D tiny states with ZERO
    * re-reads of the fact table. Exactly how a production metrics store
    * keeps running latency percentiles. GK/t-digest sketches also merge
    * but their results depend on merge order; grid cells are
    * deterministic, which is why the DuckDB oracle can replay every
    * interpolated edge bit-for-bit. One fact pass total; the cumulative
    * layer is days x days x occupied-cells of pure arithmetic. */
  def cumulativeQuantiles(t: Tables, grid: Int = 4096): DataFrame = {
    // fixed global bounds make states mergeable (same cell <-> same range);
    // at 100 TB these come from table stats, here from a 2-value aggregate
    val vals = t.events.filter(col("value").isNotNull)
    val mm = vals.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    val bin = gridCell(col("value"), grid)
    // the per-day states: (day, cell, count) — this is what a streaming job
    // would checkpoint
    val daily = vals
      .crossJoin(broadcast(mm))
      .select(to_date(col("ts")).as("day"), bin.as("bin"),
        col("mn"), col("mx"))
      .groupBy(col("day"), col("bin"))
      .agg(count(lit(1)).as("c"), max(col("mn")).as("mn"), max(col("mx")).as("mx"))
      .localCheckpoint() // reused on both sides of the day<=day merge
    // merge: day-prefix union = elementwise addition of cell counts
    val days = daily.select(col("day").as("d_day")).distinct()
    val merged = daily.join(days, col("day") <= col("d_day"))
      .groupBy(col("d_day").as("day"), col("bin"))
      .agg(sum(col("c")).as("c"), max(col("mn")).as("mn"), max(col("mx")).as("mx"))
    val w = Window.partitionBy(col("day")).orderBy(col("bin"))
    val cum = merged
      .withColumn("cb", coalesce(sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).cast("double"))
    val qs = t.spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(0.5), org.apache.spark.sql.Row(0.9)),
      org.apache.spark.sql.types.StructType.fromDDL("q DOUBLE"))
    val target = col("q") * col("n")
    val edge = gridEdge(target, grid)
    cum.join(broadcast(qs), gridCrossing(target))
      .groupBy(col("day"))
      .agg(
        max(col("n")).cast("long").as("cum_events"),
        max(when(col("q") === 0.5, edge)).as("p50"),
        max(when(col("q") === 0.9, edge)).as("p90"))
      .orderBy(col("day"))
  }

  /** q102: EQUI-DEPTH histogram — bins carry (approximately) equal row
    * counts with data-driven edges, where [[priceHistogram]] (q52) fixes
    * the edges and lets counts skew. This is the histogram query
    * optimizers and drift monitors actually want: resolution concentrates
    * where the data is. Two passes by construction: ALL edge quantiles
    * from ONE exact `percentile(col, array(…))` aggregate (one value
    * buffer, not one per quantile — at sf0.1 that is the difference
    * between 2.8 s and sub-second; R-7 linear interpolation, empirically
    * bit-identical to DuckDB's `quantile_cont` on these doubles),
    * broadcast as one row; then a narrow bucket projection (count of
    * edges ≤ value) and one aggregate. Ties across an edge land in one
    * bin, so counts are only near-equal on duplicate-heavy data — that is
    * the exact-semantics answer, not an implementation artifact.
    *
    * ORACLE TWIN, not the production default: exact `percentile` buffers
    * the full column in one aggregation buffer — fine at verification SF,
    * a single-reducer OOM at 100 TB. Production uses
    * [[equiDepthHistogramApprox]] (q107, O(grid) memory); this form exists
    * to pin that path's accuracy (SketchPortableSpec) and for the DuckDB
    * bit-exact compare. */
  def equiDepthHistogram(t: Tables, buckets: Int = 10): DataFrame = {
    val qs = (1 until buckets).map(i => i.toDouble / buckets)
    val edges = t.orders
      .agg(expr(s"percentile(o_totalprice, array(${qs.mkString(",")}))").as("es"))
      .select((1 until buckets).map(i => element_at(col("es"), i).as(s"e$i")): _*)
    val bucket = (1 until buckets)
      .map(i => (col(s"e$i") <= col("o_totalprice")).cast("int"))
      .reduce(_ + _)
    t.orders
      .crossJoin(broadcast(edges))
      .select(bucket.as("bucket"), col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("bucket"))
  }

  /** q101: per-column data profile — row/null/distinct counts for every
    * column of a table in ONE scan, the Deequ/ANALYZE-style health report
    * a pipeline runs before trusting a new drop. Columns are stacked via
    * a narrow explode into (column_name, value-as-string) pairs, so the
    * plan is one generator + one aggregate with a single DISTINCT per
    * group — never the multi-distinct Expand (ncols distincts in one wide
    * aggregate would replicate the scan ncols× with Expand semantics
    * anyway; the stack makes that cost explicit and keeps the aggregate
    * shape trivial). String casting is only a stacking device: counts are
    * cast-invariant (casts are injective per column type in both
    * engines), and no casted VALUE is ever output — only counts. */
  def dataProfile(t: Tables): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    t.orders
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"), col(c).cast("string").as("value"))): _*))
        .as("s"))
      .select(col("s.column_name").as("column_name"), col("s.value").as("value"))
      .groupBy(col("column_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("value"))).as("n_nulls"),
        countDistinct(col("value")).as("n_distinct"))
      .withColumn("null_pct",
        round(col("n_nulls").cast("double") / col("n_rows"), 6))
      .orderBy(col("column_name"))
  }

  /** q98: TIME-RANGE window frame — each event's trailing-one-hour
    * activity (count + exact sum), a RANGE frame over event time rather
    * than a ROWS frame over positions. The distinction matters on
    * irregular feeds: "last 6 rows" (q17) is a different feature than
    * "last 60 minutes" whenever arrival rates vary — and the time-based
    * form is what fraud/ops features mean. One shuffle on the partition
    * key; the frame bound is epoch-second arithmetic (Spark's rangeBetween
    * needs a numeric ordering column; DuckDB mirrors it with the identical
    * integer ordering). The in-frame sum rides a DECIMAL cast (the q17
    * pattern) so accumulation order can't wiggle the double. */
  def trailingHourActivity(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-3599, 0)
    t.events
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_timestamp(col("ts")).as("epoch_s"),
        col("value").cast("decimal(18,6)").as("value_dec"))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        count(lit(1)).over(w).as("events_last_hour"),
        sum(col("value_dec")).over(w).cast("double").as("value_last_hour"))
      .orderBy(col("event_id"))
  }

  /** q96: time-series gap fill — densify each group's hourly series over
    * the corpus span and carry the last observation forward (LOCF) through
    * the holes; hours before a group's first observation stay null. The
    * dashboard/feature-store shape for irregular event feeds. Plan: one
    * aggregate for the hourly partials, a 1-row span aggregate broadcast
    * into the grid cross join (never a driver collect), one window per
    * group for the fill — grid size is groups × hours regardless of fact
    * size. */
  def gapFillHourly(t: Tables): DataFrame = {
    val hourly = t.events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val span = t.events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = t.events.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "hour_ts"), "left")
      .select(
        col("event_type"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNotNull.as("observed"),
        last(col("sum_value"), ignoreNulls = true).over(w).as("filled_sum_value"))
      .orderBy(col("event_type"), col("hour_ts"))
  }

  /** q89: the salted replicate JOIN ([[graft.functions.Skew.saltedJoin]])
    * under the oracle gate — the q14 self-aggregate-enrichment shape over
    * the maximally skewed key (events.event_type: 5 values, ~N/5 rows
    * each), joined WITHOUT broadcast. At 100 TB this is the case where the
    * per-key dimension is itself huge (per-key feature tables) while the
    * fact key is hot: the salt spreads each hot key over `salts` reducers;
    * the build side shuffles salts× its (small) size. The SHUFFLE_HASH
    * hint keeps Catalyst from broadcasting the demo-sized dim so the plan
    * exercised is the one the mitigation exists for (pinned in
    * PlanAuditSpec). Row-identical to the plain join — the oracle runs the
    * unsalted form. */
  def saltedSelfAggJoin(t: Tables, salts: Int = 8): DataFrame = {
    val dim = t.events
      .groupBy(col("event_type"))
      .agg(davg(col("value")).as("type_avg_value"), count(lit(1)).as("type_events"))
      .hint("SHUFFLE_HASH")
    graft.functions.Skew.saltedJoin(
        t.events.select(col("event_id"), col("event_type"), col("value")),
        dim, "event_type", salts)
      .select(
        col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        col("type_avg_value"), col("type_events"),
        round(col("value") / col("type_avg_value"), 6).as("value_vs_type_avg"))
      .orderBy(col("event_id"))
  }

  /** q87: the full ranking-function suite (W8 — the window functions the
    * reference never used, completing §2.5): RANK/DENSE_RANK over a
    * tie-heavy ordering, PERCENT_RANK/CUME_DIST distribution positions,
    * FIRST/NTH_VALUE over an explicit full frame, and LEAD over a unique
    * ordering. Both windows share ONE partition key (o_orderpriority), so
    * the plan is a single Exchange feeding two sorts — adding the second
    * ordering costs a sort, never a reshuffle. Tie semantics are exercised
    * deliberately: `price_bucket` collapses prices into coarse buckets so
    * rank≠dense_rank≠row_number on real ties; the value-extraction window
    * pins an explicit ROWS frame and a unique tiebreak, because
    * last/nth_value over the default RANGE frame include peers — the
    * classic silent-wrong-answer of ad-hoc window SQL. */
  def rankingSuite(t: Tables): DataFrame = {
    val bucketed = t.orders.select(
      col("o_orderkey").as("order_id"),
      col("o_orderpriority").as("priority"),
      col("o_totalprice").as("total_price"),
      floor(col("o_totalprice") / 50000).cast("int").as("price_bucket"))
    val tieWin = Window.partitionBy(col("priority"))
      .orderBy(col("price_bucket").desc)
    val exactWin = Window.partitionBy(col("priority"))
      .orderBy(col("total_price").desc, col("order_id"))
    val fullFrame = exactWin.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    bucketed.select(
      col("order_id"), col("priority"), col("price_bucket"),
      rank().over(tieWin).as("bucket_rank"),
      dense_rank().over(tieWin).as("bucket_dense_rank"),
      round(percent_rank().over(tieWin), 6).as("bucket_percent_rank"),
      round(cume_dist().over(tieWin), 6).as("bucket_cume_dist"),
      first(col("order_id")).over(fullFrame).as("top_order_id"),
      nth_value(col("order_id"), 3).over(fullFrame).as("third_order_id"),
      lead(col("order_id"), 1).over(exactWin).as("next_order_id"))
      .orderBy(col("order_id"))
  }

  /** q85: cumulative EXACT distinct users by day via mergeable bitmap
    * states — the Druid/ClickHouse `groupBitmapState`/`Merge` pattern on
    * [[graft.functions.BitmapDistinct]]. One pass over the fact builds a
    * per-day user bitmap (plus the plain per-day stats); the cumulative
    * layer is a triangular self-join OF THE DAY FRAME ONLY (days² tiny
    * state rows — at 10 years of daily grain that is ~6.7M bitmap merges,
    * zero fact re-reads), re-aggregated with the bitmap-union merge. The
    * naive form — `events self-join ON e.day <= d.day` then
    * count(DISTINCT) — re-shuffles the ENTIRE fact once per day, which is
    * the difference between O(|fact|) and O(|fact|·days) at 100 TB. Exact
    * (not HLL): unions of Roaring-style bitmaps lose nothing, so running
    * distinct-user curves stay auditable. */
  def cumulativeDistinctUsers(t: Tables): DataFrame = {
    graft.functions.BitmapDistinct.register(t.spark)
    val daily = t.events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        graft.functions.BitmapDistinct.bitmapDistinct(col("user_id"))
          .as("daily_distinct_users"),
        graft.functions.BitmapDistinct.bitmapState(col("user_id")).as("bm"))
      .localCheckpoint() // day frame reused on both sides of the join
    daily.as("d")
      .join(daily.as("e"), col("e.day") <= col("d.day"))
      .groupBy(col("d.day").as("day"),
        col("d.n_events").as("n_events"),
        col("d.daily_distinct_users").as("daily_distinct_users"))
      .agg(graft.functions.BitmapDistinct.bitmapMergeCount(col("e.bm"))
        .as("cumulative_distinct_users"))
      .orderBy(col("day"))
  }

  /** Join-cardinality estimation from bottom-k (KMV) sketches — the
    * optimizer-statistics shape: estimate |events ⋈ orders ON user_id =
    * o_custkey| WITHOUT running the join. Each side pre-aggregates to
    * (key, count) — one map-side-combined shuffle, the frame is
    * distinct-key-sized — then keeps the k rows with the smallest portable
    * key hash (TakeOrdered: per-partition heaps, no full sort). Because
    * [[graft.functions.KmvSketch.hash31]] is a bijection on [0, M), the
    * bottom-k of the hash UNION is exactly the union's KMV sketch, and any
    * union-sampled key present on a side is guaranteed to be in that
    * side's bottom-k (its hash is below both thresholds) — so per-key
    * frequencies ride the sketch for free. Estimator:
    * Ĵ = D̂_union · (Σ_{h ∈ U} c_a(h)·c_b(h)) / |U|, with D̂_union the
    * classic (k−1)·M/h_(k) (exact when the union has < k keys).
    *
    * The output carries the TRUE join size as a verification column —
    * computed from the two count frames (never the fact tables); at 100 TB
    * you would drop that column and keep only the sketch path, whose cost
    * after the per-side pre-aggregation is k-sized. */
  def joinCardinalityKmv(t: Tables, k: Int = 256): DataFrame = {
    import graft.functions.KmvSketch
    def side(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key).as("key"))
        .agg(count(lit(1)).as("c"))
        .select(col("key"), col("c"), KmvSketch.hash31(col("key")).as("h"))
    val ca = side(t.events, "user_id")
    val cb = side(t.orders, "o_custkey")
    val sa = ca.orderBy(col("h")).limit(k)
    val sb = cb.orderBy(col("h")).limit(k)
    val u = sa.select(col("h")).union(sb.select(col("h")))
      .distinct().orderBy(col("h")).limit(k)
    val sample = u
      .join(sa.select(col("h"), col("c").as("c_a")), Seq("h"), "left")
      .join(sb.select(col("h"), col("c").as("c_b")), Seq("h"), "left")
      .agg(
        count(lit(1)).as("ku"),
        max(col("h")).as("tau"),
        sum(coalesce(col("c_a"), lit(0L)) * coalesce(col("c_b"), lit(0L)))
          .as("s_ab"))
    val truth = ca.as("x").join(cb.as("y"), Seq("key"))
      .agg(sum(col("x.c") * col("y.c")).as("true_join_rows"))
    val dEst = when(col("ku") < k, col("ku").cast("double"))
      .otherwise(lit((k - 1).toDouble * KmvSketch.M) / col("tau"))
    sample.crossJoin(broadcast(truth))
      .select(
        lit(k).as("k"),
        col("ku").cast("int").as("sample_keys"),
        round(dEst, 2).as("est_distinct_keys"),
        round(dEst * col("s_ab") / col("ku"), 2).as("est_join_rows"),
        col("true_join_rows"),
        round(abs(dEst * col("s_ab") / col("ku") - col("true_join_rows")) /
          col("true_join_rows"), 4).as("rel_err"))
  }

  /** The DuckDB mirror of [[joinCardinalityKmv]]. */
  def joinCardinalityKmvSql(k: Int = 256): String = {
    import graft.functions.KmvSketch
    val num = (k - 1).toDouble * KmvSketch.M
    s"""WITH ca AS (
       |  SELECT key, c, ${KmvSketch.hash31Sql("key")} AS h FROM (
       |    SELECT user_id AS key, count(*) AS c FROM events GROUP BY 1)),
       |cb AS (
       |  SELECT key, c, ${KmvSketch.hash31Sql("key")} AS h FROM (
       |    SELECT o_custkey AS key, count(*) AS c FROM orders GROUP BY 1)),
       |sa AS (SELECT * FROM ca ORDER BY h LIMIT $k),
       |sb AS (SELECT * FROM cb ORDER BY h LIMIT $k),
       |u AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
       |      ORDER BY h LIMIT $k),
       |smp AS (
       |  SELECT count(*) AS ku, max(u.h) AS tau,
       |    sum(coalesce(sa.c, 0) * coalesce(sb.c, 0)) AS s_ab
       |  FROM u LEFT JOIN sa ON u.h = sa.h LEFT JOIN sb ON u.h = sb.h),
       |tj AS (
       |  SELECT CAST(sum(ca.c * cb.c) AS BIGINT) AS true_join_rows
       |  FROM ca JOIN cb ON ca.key = cb.key),
       |est AS (
       |  SELECT ku, tau, s_ab,
       |    CASE WHEN ku < $k THEN CAST(ku AS DOUBLE)
       |         ELSE $num / tau END AS d_est
       |  FROM smp)
       |SELECT CAST($k AS INTEGER) AS k, CAST(ku AS INTEGER) AS sample_keys,
       |  round(d_est, 2) AS est_distinct_keys,
       |  round(d_est * s_ab / ku, 2) AS est_join_rows,
       |  true_join_rows,
       |  round(abs(d_est * s_ab / ku - true_join_rows)
       |        / true_join_rows, 4) AS rel_err
       |FROM est CROSS JOIN tj""".stripMargin
  }

  /** Key-skew profile — the decide-side of [[saltedEventStats]] and
    * [[graft.functions.Skew.saltedJoin]]: per-key row counts on the join/
    * group key, the skew ratio (max key count over the mean), and the
    * top-k heaviest keys with their share of the table. The per-key count
    * frame is one map-side-combined shuffle; the heavy-key list rides the
    * bounded [[graft.functions.TopKAgg]] heap (shuffle carries ≤ k pairs
    * per partition, no sort sees the full key space); the scalar profile
    * is a 1-row broadcast. This is the report a pipeline runs BEFORE
    * choosing salting / AQE skew-join settings at 100 TB. */
  def keySkewProfile(t: Tables, topK: Int = 10): DataFrame = {
    graft.functions.TopKAgg.register(t.spark)
    val counts = t.events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused by profile and top-k
    val prof = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_n"))
    val top = counts
      .agg(graft.functions.TopKAgg.topKBy(col("n"), col("user_id"), topK)
        .as("top"))
      .select(posexplode(col("top")))
      .select(
        (col("pos") + 1).cast("int").as("rank"),
        col("col.payload").as("user_id"),
        col("col.ord").as("n_events"))
    top.crossJoin(broadcast(prof))
      .select(
        col("rank"), col("user_id"), col("n_events"),
        round(col("n_events").cast("double") / col("n_rows"), 6).as("share"),
        col("n_keys"), col("max_n"),
        round(col("max_n").cast("double") * col("n_keys") / col("n_rows"), 4)
          .as("skew_ratio"))
      .orderBy(col("rank"))
  }

  /** Chi-square test of independence on the event_type × day-of-week
    * contingency grid — the "is behavior uniform across the week?"
    * data-quality / drift check (the categorical complement of
    * [[graft.ext.Sampling.splitDrift]]'s TVD on numeric bins). Observed
    * counts come from ONE map-side-combined shuffle on the (type, dow)
    * pair; expected counts E = R·C/n and per-cell contributions
    * (O−E)²/E are broadcast-joined marginals (the grid is
    * |types|×7 rows — metadata-sized at any corpus scale); the χ²
    * total folds through the order-independent [[ExactAgg]] sum. All
    * inputs are exact integers, so every double op is reproduced
    * bit-for-bit by the oracle. */
  def chiSquareIndependence(t: Tables): DataFrame = {
    val cells = t.events
      .groupBy(col("event_type"), dayofweek(col("ts")).as("dow"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint() // tiny grid feeds marginals, cells, and the total
    val rowTot = cells.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val colTot = cells.groupBy(col("dow")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    val scored = cells
      .join(broadcast(rowTot), "event_type")
      .join(broadcast(colTot), "dow")
      .crossJoin(broadcast(n))
      .withColumn("e",
        col("r").cast("double") * col("c") / col("n"))
      .withColumn("contrib",
        (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
    val chi2 = scored.agg(dsum(col("contrib")).as("chi2_total"))
    scored.crossJoin(broadcast(chi2))
      .select(
        col("event_type"), col("dow").cast("int").as("dow"),
        col("o"), round(col("e"), 6).as("e"),
        round(col("contrib"), 6).as("contrib"),
        round(col("chi2_total"), 6).as("chi2_total"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** The DuckDB mirror of [[chiSquareIndependence]] (dayofweek()+1 maps
    * DuckDB's 0=Sunday to Spark's 1=Sunday). */
  def chiSquareIndependenceSql: String =
    s"""WITH cells AS (
       |  SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS o
       |  FROM events GROUP BY 1, 2),
       |rt AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
       |ct AS (SELECT dow, sum(o) AS c FROM cells GROUP BY 1),
       |n AS (SELECT sum(o) AS n FROM cells),
       |scored AS (
       |  SELECT event_type, dow, o,
       |    CAST(r AS DOUBLE) * c / n AS e,
       |    (o - CAST(r AS DOUBLE) * c / n) * (o - CAST(r AS DOUBLE) * c / n)
       |      / (CAST(r AS DOUBLE) * c / n) AS contrib
       |  FROM cells JOIN rt USING (event_type) JOIN ct USING (dow)
       |  CROSS JOIN n),
       |chi2 AS (SELECT ${Sql.dsum("contrib")} AS chi2_total FROM scored)
       |SELECT event_type, CAST(dow AS INTEGER) AS dow, o,
       |  round(e, 6) AS e, round(contrib, 6) AS contrib,
       |  round(chi2_total, 6) AS chi2_total
       |FROM scored CROSS JOIN chi2
       |ORDER BY event_type, dow""".stripMargin

  /** The DuckDB mirror of [[keySkewProfile]] (window form of the top-k). */
  def keySkewProfileSql(topK: Int = 10): String =
    s"""WITH counts AS (
       |  SELECT user_id, count(*) AS n FROM events GROUP BY 1),
       |prof AS (
       |  SELECT count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
       |         max(n) AS max_n
       |  FROM counts),
       |top AS (
       |  SELECT CAST(row_number() OVER (ORDER BY n DESC, user_id) AS INTEGER)
       |           AS rank,
       |         user_id, n AS n_events
       |  FROM counts QUALIFY rank <= $topK)
       |SELECT rank, user_id, n_events,
       |  round(CAST(n_events AS DOUBLE) / n_rows, 6) AS share,
       |  n_keys, max_n,
       |  round(CAST(max_n AS DOUBLE) * n_keys / n_rows, 4) AS skew_ratio
       |FROM top CROSS JOIN prof
       |ORDER BY rank""".stripMargin

  /** q155: ARBITRARY grouping sets — the third member of the multi-level
    * aggregate family (q57 ROLLUP = hierarchical prefixes, q65 CUBE = all
    * 2ⁿ margins). Real reporting marts need NON-hierarchical set lists —
    * here (year, returnflag), (returnflag, linestatus), and the grand
    * total, which neither rollup nor cube expresses without computing
    * unwanted sets. Same physical shape as the other two: ONE Expand (one
    * replica per grouping set — 3 here, vs 8 for the 2³-set cube) feeding
    * a single hash aggregate with map-side partials, so the fact is read
    * and shuffled once regardless of how many sets are requested.
    * `grouping_id` (bit = column aggregated away, first-listed column =
    * MSB — the Postgres/DuckDB GROUPING() convention too) labels each
    * row's set. */
  def groupingSetsReport(t: Tables): DataFrame =
    t.lineitem
      .select(
        year(col("l_shipdate")).as("year"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .groupingSets(
        Seq(
          Seq(col("year"), col("l_returnflag")),
          Seq(col("l_returnflag"), col("l_linestatus")),
          Seq.empty),
        col("year"), col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsumRevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("gid"),
        col("year").asc_nulls_first,
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** DuckDB mirror of [[groupingSetsReport]] — GROUPING SETS with the
    * GROUPING() bitmask, identical set list and exact-decimal kernels. */
  val groupingSetsReportSql: String =
    s"""SELECT CAST(grouping(year(l_shipdate), l_returnflag, l_linestatus)
       |   AS INTEGER) AS gid,
       | CAST(year(l_shipdate) AS INTEGER) AS year,
       | l_returnflag, l_linestatus,
       | count(*) AS n_rows,
       | ${Sql.dsum("l_quantity")} AS sum_qty,
       | ${Sql.dsumRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |GROUP BY GROUPING SETS (
       |  (year(l_shipdate), l_returnflag),
       |  (l_returnflag, l_linestatus),
       |  ())
       |ORDER BY gid, year NULLS FIRST, l_returnflag NULLS FIRST,
       |  l_linestatus NULLS FIRST""".stripMargin

  /** q158: event-type TRANSITION MATRIX — first-order Markov counts and
    * probabilities over each user's event sequence (the user-journey /
    * "what happens after a click" shape; also the sequence prior a
    * session-based recommender trains on). `lead` over ONE hash exchange
    * of user_id (with event_id tiebreak for deterministic order on ts
    * ties) pairs each event with its successor; the pair aggregate and
    * the per-source normalizing window both run on transition-matrix-
    * sized frames (|event types|² rows), so the fact is shuffled exactly
    * once at any scale. Probabilities divide exact longs → bit-portable. */
  def eventTransitions(t: Tables): DataFrame = {
    val seq = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = t.events
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(seq).as("to_type"))
      .filter(col("to_type").isNotNull)
    steps
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p_transition",
        round(col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(Window.partitionBy(col("from_type"))), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** DuckDB mirror of [[eventTransitions]]. */
  val eventTransitionsSql: String =
    """WITH steps AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS to_type
      |  FROM events),
      |counts AS (
      |  SELECT from_type, to_type, count(*) AS n_transitions
      |  FROM steps WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n_transitions,
      |  round(CAST(n_transitions AS DOUBLE) /
      |    sum(n_transitions) OVER (PARTITION BY from_type), 6) AS p_transition
      |FROM counts
      |ORDER BY from_type, to_type""".stripMargin

  /** q159: LINEAR INTERPOLATION through time-series gaps — the numeric
    * completion of q96's LOCF gap fill (LOCF answers "what was the last
    * known state"; interpolation answers "what was the value probably
    * doing", the form feature stores feed to models). Same densified
    * grid (groups × hours, built from a broadcast 1-row span — never a
    * driver collect); the fill layer is two IGNORE-NULLS window passes
    * per group partition — last observed (value, hour) looking back,
    * first observed looking forward — then pure arithmetic:
    * v = v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀) on epoch seconds. Observed hours
    * keep their exact aggregate; hours outside a group's observed span
    * have no bracketing pair and stay NULL (extrapolation is a modeling
    * decision, not an engine default). Both windows share one exchange
    * of event_type; sums ride the exact-decimal kernel and the
    * interpolation is the same IEEE expression tree in both engines. */
  def gapInterpolateHourly(t: Tables): DataFrame = {
    val hourly = t.events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(dsum(col("value")).as("sum_value"))
    val span = t.events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = t.events.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour_ts"))
    val back = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("event_type")).orderBy(col("hour_ts"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsHour = when(col("sum_value").isNotNull, col("hour_ts"))
    val joined = grid.join(hourly, Seq("event_type", "hour_ts"), "left")
      .select(col("event_type"), col("hour_ts"),
        col("sum_value").isNotNull.as("observed"), col("sum_value"),
        last(col("sum_value"), ignoreNulls = true).over(back).as("v0"),
        unix_timestamp(last(obsHour, ignoreNulls = true).over(back)).as("t0"),
        first(col("sum_value"), ignoreNulls = true).over(fwd).as("v1"),
        unix_timestamp(first(obsHour, ignoreNulls = true).over(fwd)).as("t1"))
    joined
      .select(
        col("event_type"),
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("observed"),
        round(when(col("observed"), col("sum_value"))
          .otherwise(col("v0") +
            (col("v1") - col("v0")) *
              ((unix_timestamp(col("hour_ts")) - col("t0")).cast("double") /
                (col("t1") - col("t0")).cast("double"))), 6)
          .as("value_interp"))
      .orderBy(col("event_type"), col("hour_ts"))
  }

  /** DuckDB mirror of [[gapInterpolateHourly]] — identical grid, IGNORE
    * NULLS windows, and IEEE interpolation arithmetic. */
  val gapInterpolateHourlySql: String = {
    val v = Sql.dsum("value")
    s"""WITH hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour_ts, $v AS sum_value
       |  FROM events GROUP BY 1, 2),
       |span AS (
       |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
       |  FROM events),
       |grid AS (
       |  SELECT g.event_type, u.hour_ts
       |  FROM (SELECT DISTINCT event_type FROM events) g
       |  CROSS JOIN span, unnest(generate_series(span.h0, span.h1, INTERVAL 1 HOUR))
       |    AS u(hour_ts)),
       |filled AS (
       |  SELECT g.event_type, g.hour_ts,
       |    h.sum_value IS NOT NULL AS observed, h.sum_value,
       |    last_value(h.sum_value IGNORE NULLS) OVER back AS v0,
       |    epoch(last_value(CASE WHEN h.sum_value IS NOT NULL THEN g.hour_ts END
       |      IGNORE NULLS) OVER back) AS t0,
       |    first_value(h.sum_value IGNORE NULLS) OVER fwd AS v1,
       |    epoch(first_value(CASE WHEN h.sum_value IS NOT NULL THEN g.hour_ts END
       |      IGNORE NULLS) OVER fwd) AS t1
       |  FROM grid g LEFT JOIN hourly h USING (event_type, hour_ts)
       |  WINDOW back AS (PARTITION BY g.event_type ORDER BY g.hour_ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    fwd AS (PARTITION BY g.event_type ORDER BY g.hour_ts
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT event_type, strftime(hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       |  observed,
       |  round(CASE WHEN observed THEN sum_value
       |    ELSE v0 + (v1 - v0) *
       |      (CAST(epoch(hour_ts) - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)) END,
       |    6) AS value_interp
       |FROM filled
       |ORDER BY event_type, hour_ts""".stripMargin
  }

  /** q164: pairwise audience overlap between event types via KMV set
    * operations — "how many users do segments A and B share" without ever
    * materializing the user sets (the sketch-algebra question every
    * audience/retention dashboard asks; Beyer et al., SIGMOD'07). One fact
    * pass builds a bottom-k state per type; pair work runs on the
    * type-count-sized state frame (merge of two states = the union
    * sketch, exact bottom-k of the union), and the intersection rides
    * inclusion–exclusion. DuckDB replays because bottom-k-of-union is
    * order-independent and [[graft.functions.KmvSketch.hash31]] is plain
    * modular arithmetic. */
  def audienceOverlap(t: Tables, k: Int = 256): DataFrame = {
    import graft.functions.KmvSketch
    KmvSketch.register(t.spark)
    val states = t.events
      .select(col("event_type"), KmvSketch.hash31(col("user_id")).as("hv"))
      .groupBy(col("event_type"))
      .agg(KmvSketch.kmvState(col("hv"), k).as("st"),
        KmvSketch.kmvDistinctNative(col("hv"), k).as("est"))
      .localCheckpoint() // type-count-sized; feeds both pair sides
    val pairs = states.as("a")
      .join(states.as("b"), col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.est").as("est_a"), col("b.est").as("est_b"),
        explode(array(col("a.st"), col("b.st"))).as("st"))
    pairs
      .groupBy(col("type_a"), col("type_b"), col("est_a"), col("est_b"))
      .agg(KmvSketch.kmvMerge(col("st"), k).as("est_union"))
      .select(
        col("type_a"), col("type_b"),
        round(col("est_a"), 6).as("est_a"),
        round(col("est_b"), 6).as("est_b"),
        round(col("est_union"), 6).as("est_union"),
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)), 6).as("est_intersection"),
        round(greatest(col("est_a") + col("est_b") - col("est_union"),
          lit(0.0)) / col("est_union"), 6).as("jaccard_est"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** DuckDB mirror of [[audienceOverlap]] — per-type and per-pair
    * estimates from the same bottom-k-of-distinct-hashes arithmetic (the
    * oracle re-reads the fact per pair; the engine's state algebra is the
    * scale path). */
  def audienceOverlapSql(k: Int = 256): String = {
    import graft.functions.KmvSketch
    s"""WITH hashed AS (
       |  SELECT DISTINCT event_type, ${KmvSketch.hash31Sql("user_id")} AS hv
       |  FROM events),
       |est AS (
       |  SELECT event_type, ${KmvSketch.estimateSql("hv", k)} AS est
       |  FROM hashed GROUP BY 1),
       |pairs AS (
       |  SELECT a.event_type AS type_a, b.event_type AS type_b
       |  FROM est a JOIN est b ON a.event_type < b.event_type),
       |u AS (
       |  SELECT p.type_a, p.type_b, ${KmvSketch.estimateSql("h.hv", k)}
       |    AS est_union
       |  FROM pairs p JOIN hashed h
       |    ON h.event_type IN (p.type_a, p.type_b)
       |  GROUP BY 1, 2)
       |SELECT u.type_a, u.type_b,
       |  round(ea.est, 6) AS est_a, round(eb.est, 6) AS est_b,
       |  round(u.est_union, 6) AS est_union,
       |  round(greatest(ea.est + eb.est - u.est_union, 0.0), 6)
       |    AS est_intersection,
       |  round(greatest(ea.est + eb.est - u.est_union, 0.0) / u.est_union, 6)
       |    AS jaccard_est
       |FROM u
       |JOIN est ea ON ea.event_type = u.type_a
       |JOIN est eb ON eb.event_type = u.type_b
       |ORDER BY type_a, type_b""".stripMargin
  }

  /** q165: top event-type trigram paths — the "what do users do next,
    * twice removed" sequence question (clickstream path analysis; the
    * length-3 extension of q158's transition matrix). Two leads over the
    * per-user time order share ONE window sort; counting is a single
    * shuffle on the path key; the top-k plans as TakeOrderedAndProject,
    * never a global sort. */
  def eventPaths(t: Tables, topK: Int = 25): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("step1"))
      .withColumn("step2", lead(col("step1"), 1).over(w))
      .withColumn("step3", lead(col("step1"), 2).over(w))
      .filter(col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n_paths"))
      .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
      .limit(topK)
  }

  /** DuckDB mirror of [[eventPaths]] — same (ts, event_id) total order,
    * same deterministic tiebreak. */
  def eventPathsSql(topK: Int = 25): String =
    s"""WITH seq AS (
       |  SELECT event_type AS step1,
       |    lead(event_type, 1) OVER w AS step2,
       |    lead(event_type, 2) OVER w AS step3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT step1, step2, step3, count(*) AS n_paths
       |FROM seq WHERE step3 IS NOT NULL
       |GROUP BY 1, 2, 3
       |ORDER BY n_paths DESC, step1, step2, step3
       |LIMIT $topK""".stripMargin

  /** q166: one-way ANOVA of `value` across event types — "does the metric
    * actually differ between segments" with variance accounted for (the
    * continuous complement of q142's categorical χ²; Fisher 1925). One
    * grouped pass collects exact moments (the [[graft.functions.ExactAgg]]
    * micro-unit kernels, so sums are partition-order-independent); SSB/SSW
    * and F fold on the group-count-sized frame. Per-group diagnostic rows
    * carry the shared F so the report reads standalone. */
  def anovaByType(t: Tables): DataFrame = {
    val g = t.events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_g"),
        dsum(col("value")).as("s_g"),
        dsum(col("value") * col("value")).as("q_g"))
      .localCheckpoint() // group-count-sized; feeds totals and the report
    val tot = g.agg(
      sum(col("n_g")).as("n"), count(lit(1)).as("k"),
      dsum(col("s_g")).as("s"))
    val f = g.crossJoin(broadcast(tot))
      .select(
        col("event_type"), col("n_g"), col("s_g"), col("q_g"),
        col("n"), col("k"),
        // Σ s_g²/n_g − S²/n and Σ(q_g − s_g²/n_g): each term a fixed
        // expression of exact sums; the outer Σ re-enters dsum so the
        // fold stays order-independent
        (col("s_g") * col("s_g") / col("n_g")).as("cm_g"))
    val parts = f.agg(
      first(col("n")).as("n"), first(col("k")).as("k"),
      dsum(col("cm_g")).as("cm"),
      dsum(col("q_g")).as("q"))
      .crossJoin(broadcast(tot.select(col("s"))))
      .select(col("n"), col("k"),
        (col("cm") - col("s") * col("s") / col("n")).as("ssb"),
        (col("q") - col("cm")).as("ssw"))
      .select(col("n"), col("k"), col("ssb"), col("ssw"),
        ((col("ssb") / (col("k") - 1)) /
          (col("ssw") / (col("n") - col("k")))).as("f_stat"))
    g.crossJoin(broadcast(parts))
      .select(
        col("event_type"), col("n_g"),
        round(col("s_g") / col("n_g"), 6).as("mean_g"),
        round((col("q_g") - col("s_g") * col("s_g") / col("n_g")) /
          (col("n_g") - 1), 6).as("var_g"),
        round(col("ssb"), 6).as("ssb"),
        round(col("ssw"), 6).as("ssw"),
        round(col("f_stat"), 6).as("f_stat"))
      .orderBy(col("event_type"))
  }

  /** q167: additive seasonal decomposition of the hourly event-volume
    * series — observed = trend + seasonal + residual (the classical
    * moving-average decomposition every capacity/anomaly dashboard runs;
    * Cleveland's STL simplified to the MA form). Volume rides the DENSE
    * hour grid (missing hours are real zeros for a count series), trend
    * is a 25-hour centered moving average (exact integer sum / 25, only
    * full windows — edges stay null), the seasonal profile is the
    * hour-of-day mean of the detrended series re-centered to sum ≈ 0,
    * and the residual is what remains. One window sort over the grid +
    * one 24-row profile join; every mean is an exact-sum single
    * division, so DuckDB matches bit-for-bit. */
  def seasonalDecompose(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("hour_ts")).rowsBetween(-12, 12)
    val hourly = t.events
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
    val bounds = t.events.agg(
      date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val grid = bounds
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("hour_ts"))
    val dense = grid.join(hourly, Seq("hour_ts"), "left")
      .select(col("hour_ts"), coalesce(col("n"), lit(0L)).as("n"))
    val trended = dense
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("trend",
        when(col("w_n") === 25,
          sum(col("n")).over(w).cast("double") / 25.0))
      .withColumn("detrended", col("n") - col("trend"))
      .localCheckpoint() // feeds the profile agg and the final join
    val profile = trended
      .filter(col("trend").isNotNull)
      .groupBy(hour(col("hour_ts")).as("hod"))
      .agg((dsum(col("detrended")) / count(lit(1))).as("s_raw"))
    val sMean = profile.agg((dsum(col("s_raw")) / count(lit(1))).as("s_mean"))
    val seasonal = profile.crossJoin(broadcast(sMean))
      .select(col("hod"), (col("s_raw") - col("s_mean")).as("seasonal"))
    trended
      .join(broadcast(seasonal), hour(col("hour_ts")) === col("hod"))
      .select(
        date_format(col("hour_ts"), "yyyy-MM-dd HH:mm:ss").as("hour_ts"),
        col("n").as("n_events"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        round(col("detrended") - col("seasonal"), 6).as("residual"))
      .orderBy(col("hour_ts"))
  }

  /** DuckDB mirror of [[seasonalDecompose]] — identical grid, window
    * frame, and exact-sum division order. */
  def seasonalDecomposeSql: String =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS hour_ts, count(*) AS n
       |  FROM events GROUP BY 1),
       |span AS (
       |  SELECT date_trunc('hour', min(ts)) AS h0,
       |         date_trunc('hour', max(ts)) AS h1
       |  FROM events),
       |grid AS (
       |  SELECT u.hour_ts FROM span,
       |    unnest(generate_series(span.h0, span.h1, INTERVAL 1 HOUR))
       |      AS u(hour_ts)),
       |dense AS (
       |  SELECT g.hour_ts, coalesce(h.n, 0) AS n
       |  FROM grid g LEFT JOIN hourly h USING (hour_ts)),
       |trended AS (
       |  SELECT hour_ts, n,
       |    CASE WHEN count(*) OVER w = 25
       |      THEN CAST(sum(n) OVER w AS DOUBLE) / 25.0 END AS trend
       |  FROM dense
       |  WINDOW w AS (ORDER BY hour_ts
       |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
       |det AS (
       |  SELECT *, n - trend AS detrended FROM trended),
       |profile AS (
       |  SELECT hour(hour_ts) AS hod,
       |    ${Sql.dsum("detrended")} / count(*) AS s_raw
       |  FROM det WHERE trend IS NOT NULL GROUP BY 1),
       |sm AS (SELECT ${Sql.dsum("s_raw")} / count(*) AS s_mean FROM profile),
       |seasonal AS (
       |  SELECT hod, s_raw - s_mean AS seasonal
       |  FROM profile CROSS JOIN sm)
       |SELECT strftime(d.hour_ts, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       |  d.n AS n_events,
       |  round(d.trend, 6) AS trend,
       |  round(s.seasonal, 6) AS seasonal,
       |  round(d.detrended - s.seasonal, 6) AS residual
       |FROM det d JOIN seasonal s ON hour(d.hour_ts) = s.hod
       |ORDER BY hour_ts""".stripMargin

  /** q168: first-touch vs last-touch conversion attribution — which
    * channel gets credit for each purchase (the marketing-analytics
    * question every funnel report ends with; Shapley's simplest two
    * endpoints). Both touch assignments ride ONE per-user window sort
    * (running first/last non-purchase event up to 1 row back); credit
    * aggregation is channel-count-sized. Purchases with no prior touch
    * credit 'none' — conservation is pinned in the spec. */
  def conversionAttribution(t: Tables): DataFrame = {
    val base = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val w = base.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, -1)
    val credited = t.events
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        coalesce(col("first_touch"), lit("none")).as("first_touch"),
        coalesce(col("last_touch"), lit("none")).as("last_touch"))
      .localCheckpoint() // purchase-count-sized; read by both credit aggs
    val n = credited.agg(count(lit(1)).cast("double").as("n"))
    val ft = credited.groupBy(col("first_touch").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    val lt = credited.groupBy(col("last_touch").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"))
    ft.join(lt, Seq("channel"), "full_outer")
      .crossJoin(broadcast(n))
      .select(
        col("channel"),
        coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"),
        coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"),
        round(coalesce(col("n_first_touch"), lit(0L)) / col("n"), 6)
          .as("share_first"),
        round(coalesce(col("n_last_touch"), lit(0L)) / col("n"), 6)
          .as("share_last"))
      .orderBy(col("channel"))
  }

  /** DuckDB mirror of [[conversionAttribution]]. */
  def conversionAttributionSql: String =
    s"""WITH credited AS (
       |  SELECT
       |    coalesce(first_value(CASE WHEN event_type <> 'purchase'
       |      THEN event_type END IGNORE NULLS) OVER w, 'none') AS first_touch,
       |    coalesce(last_value(CASE WHEN event_type <> 'purchase'
       |      THEN event_type END IGNORE NULLS) OVER w, 'none') AS last_touch,
       |    event_type
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |p AS (SELECT * FROM credited WHERE event_type = 'purchase'),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM p),
       |ft AS (SELECT first_touch AS channel, count(*) AS n_first_touch
       |       FROM p GROUP BY 1),
       |lt AS (SELECT last_touch AS channel, count(*) AS n_last_touch
       |       FROM p GROUP BY 1)
       |SELECT channel,
       |  coalesce(n_first_touch, 0) AS n_first_touch,
       |  coalesce(n_last_touch, 0) AS n_last_touch,
       |  round(coalesce(n_first_touch, 0) / n.n, 6) AS share_first,
       |  round(coalesce(n_last_touch, 0) / n.n, 6) AS share_last
       |FROM ft FULL OUTER JOIN lt USING (channel) CROSS JOIN n
       |ORDER BY channel""".stripMargin

  /** DuckDB mirror of [[anovaByType]] — the identical exact-moment and
    * division order. */
  def anovaByTypeSql: String =
    s"""WITH g AS (
       |  SELECT event_type, count(*) AS n_g,
       |    ${Sql.dsum("value")} AS s_g,
       |    ${Sql.dsum("value * value")} AS q_g
       |  FROM events GROUP BY 1),
       |tot AS (
       |  SELECT sum(n_g) AS n, count(*) AS k, ${Sql.dsum("s_g")} AS s
       |  FROM g),
       |f AS (
       |  SELECT g.*, tot.n, tot.k, s_g * s_g / n_g AS cm_g
       |  FROM g CROSS JOIN tot),
       |parts0 AS (
       |  SELECT any_value(n) AS n, any_value(k) AS k,
       |    ${Sql.dsum("cm_g")} AS cm, ${Sql.dsum("q_g")} AS q
       |  FROM f),
       |parts AS (
       |  SELECT n, k, cm - s * s / n AS ssb, q - cm AS ssw
       |  FROM parts0 CROSS JOIN (SELECT s FROM tot) t)
       |SELECT g.event_type, g.n_g,
       |  round(g.s_g / g.n_g, 6) AS mean_g,
       |  round((g.q_g - g.s_g * g.s_g / g.n_g) / (g.n_g - 1), 6) AS var_g,
       |  round(p.ssb, 6) AS ssb,
       |  round(p.ssw, 6) AS ssw,
       |  round((p.ssb / (p.k - 1)) / (p.ssw / (p.n - p.k)), 6) AS f_stat
       |FROM g CROSS JOIN parts p
       |ORDER BY event_type""".stripMargin

  /** q218: strict ordered funnel (view → click → purchase) with step-wise
    * conversion — the product-analytics readout q75's retention matrix and
    * q158's transition counts do NOT give: a user counts at step k only if
    * the step-k event happened STRICTLY AFTER the earliest time they
    * completed step k−1, so out-of-order events (a purchase before any
    * view) never inflate conversion. Reported per step: users reached,
    * conversion from the previous step, conversion from the top.
    *
    * Exactness: step times are min-timestamps, user counts exact BIGINTs,
    * each conversion one division; the earliest-qualifying-time recursion
    * (t_k = min ts of step k with ts > t_{k−1}) is the standard funnel
    * semantics that makes the count independent of any per-user event
    * ordering the engine chooses.
    *
    * Scale shape: one filtered aggregate per step over the fact, each
    * joined user-keyed to the previous stage frame (stage frames shrink
    * monotonically; the join is hash-partitioned on user_id and AQE
    * broadcasts the tail stages when they collapse). The final ratio
    * window runs over a steps-count frame. */
  def funnel(t: Tables,
             steps: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(steps.nonEmpty)
    val ev = t.events.select(col("user_id"), col("event_type"), col("ts"))
    val stages = steps.zipWithIndex.tail.scanLeft(
      ev.filter(col("event_type") === steps.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_reach"))) {
      case (prev, (step, _)) =>
        ev.filter(col("event_type") === step)
          .join(prev.select(col("user_id"), col("t_reach").as("t_prev")),
            Seq("user_id"))
          .filter(col("ts") > col("t_prev"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_reach"))
    }
    val counts = stages.zip(steps).zipWithIndex.map {
      case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(step).as("step"),
            col("n_users"))
    }.reduceLeft(_ union _)
    val w = Window.orderBy(col("step_idx"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.select(col("step_idx"), col("step"), col("n_users"),
        when(col("step_idx") === 1, lit(1.0))
          .otherwise(col("n_users").cast("double") /
            lag(col("n_users"), 1).over(w).cast("double"))
          .as("conv_from_prev"),
        (col("n_users").cast("double") /
          first(col("n_users")).over(wAll).cast("double"))
          .as("conv_from_start"))
      .orderBy(col("step_idx"))
  }

  /** The DuckDB mirror of [[funnel]]. */
  def funnelSql(steps: Seq[String] = Seq("view", "click", "purchase")): String = {
    val stageCtes = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(ts) AS t_reach FROM events
           |  WHERE event_type = '$step' GROUP BY 1)"""
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, min(e.ts) AS t_reach
           |  FROM events e JOIN s$i USING (user_id)
           |  WHERE e.event_type = '$step' AND e.ts > s$i.t_reach
           |  GROUP BY 1)"""
    }.mkString(",\n")
    val countRows = steps.zipWithIndex.map { case (step, i) =>
      s"SELECT ${i + 1} AS step_idx, '$step' AS step, CAST(count(*) AS BIGINT) AS n_users FROM s${i + 1}"
    }.mkString("\n UNION ALL\n ")
    s"""WITH $stageCtes,
       |counts AS (
       | $countRows)
       |SELECT CAST(step_idx AS INTEGER) AS step_idx, step, n_users,
       | CASE WHEN step_idx = 1 THEN 1.0
       |  ELSE CAST(n_users AS DOUBLE)
       |    / CAST(lag(n_users, 1) OVER (ORDER BY step_idx) AS DOUBLE) END
       |  AS conv_from_prev,
       | CAST(n_users AS DOUBLE)
       |   / CAST(first_value(n_users) OVER (ORDER BY step_idx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |  AS conv_from_start
       |FROM counts
       |ORDER BY step_idx""".stripMargin
  }
}

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-validation stage every
  * production ingest runs between landing and publish (the reference
  * hand-rolls the idea as ad-hoc quality filters in `data_cleaning.py`;
  * this is the generalized rule-set-in/report-out form, the Deequ/
  * Great-Expectations shape re-expressed as plain Spark aggregates).
  *
  * Each rule computes a METRIC (a fraction in [0,1], exact long division)
  * and compares it to a THRESHOLD → `passed`. The report is data, not an
  * exception: pipelines gate publishes on `min(passed)`, humans read the
  * failing rows.
  *
  * Scale posture: all single-table rules for one table ride ONE global
  * aggregate over conditional counts — adding a rule adds a column to the
  * partial aggregate, never a pass over the fact. Referential rules are
  * null-producing LEFT anti-join counts (shuffle join fact⋈fact, broadcast
  * when the parent is dimension-sized). Output is rule-count-sized. */
object DataQuality {

  /** Freshness window = the fixture's actual date span (single source of
    * truth: [[graft.core.Tables.EventsFixtureYear]]) — a fixture regen with
    * different dates moves the rule and its mirror together. */
  private val FreshYear = graft.core.Tables.EventsFixtureYear

  /** q157: the audit over the star schema's contract — completeness,
    * key uniqueness, value domain, numeric range, and two referential-
    * integrity rules. One aggregate per scoped table + one anti-join per
    * FK; the union is rule-count rows. `l_quantity ∈ [1,40]` is
    * deliberately stricter than the data (max 50) so the report shape
    * under failure is exercised, not just the all-green path. */
  def auditReport(t: Tables): DataFrame = {
    val frac = (num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =>
      round(num.cast("double") / den.cast("double"), 6)

    val orders = t.orders.agg(
      count(lit(1)).as("n"),
      count(col("o_totalprice")).as("n_price"),
      countDistinct(col("o_orderkey")).as("n_keys"),
      sum(col("o_orderstatus").isin("O", "F", "P").cast("long")).as("n_domain"))
      .select(inline(array(
        struct(lit(1).as("rule_id"), lit("orders").as("scope"),
          lit("completeness(o_totalprice)").as("rule"),
          frac(col("n_price"), col("n")).as("metric"),
          lit(1.0).as("threshold")),
        struct(lit(2).as("rule_id"), lit("orders").as("scope"),
          lit("uniqueness(o_orderkey)").as("rule"),
          frac(col("n_keys"), col("n")).as("metric"),
          lit(1.0).as("threshold")),
        struct(lit(3).as("rule_id"), lit("orders").as("scope"),
          lit("domain(o_orderstatus in {O,F,P})").as("rule"),
          frac(col("n_domain"), col("n")).as("metric"),
          lit(1.0).as("threshold")))))

    val lineitem = t.lineitem.agg(
      count(lit(1)).as("n"),
      sum((col("l_discount") >= 0.0 && col("l_discount") <= 0.1).cast("long"))
        .as("n_disc"),
      sum((col("l_quantity") >= 1.0 && col("l_quantity") <= 40.0).cast("long"))
        .as("n_qty"))
      .select(inline(array(
        struct(lit(4).as("rule_id"), lit("lineitem").as("scope"),
          lit("range(l_discount in [0,0.1])").as("rule"),
          frac(col("n_disc"), col("n")).as("metric"),
          lit(1.0).as("threshold")),
        struct(lit(5).as("rule_id"), lit("lineitem").as("scope"),
          lit("range(l_quantity in [1,40])").as("rule"),
          frac(col("n_qty"), col("n")).as("metric"),
          lit(1.0).as("threshold")))))

    val orphanLines = t.lineitem
      .join(t.orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n"), count(col("o_orderkey")).as("n_matched"))
      .select(
        lit(6).as("rule_id"), lit("lineitem->orders").as("scope"),
        lit("referential(l_orderkey)").as("rule"),
        frac(col("n_matched"), col("n")).as("metric"),
        lit(1.0).as("threshold"))

    val orphanCust = t.customer
      .join(broadcast(t.nation.select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"), "left")
      .agg(count(lit(1)).as("n"), count(col("n_nationkey")).as("n_matched"))
      .select(
        lit(7).as("rule_id"), lit("customer->nation").as("scope"),
        lit("referential(c_nationkey)").as("rule"),
        frac(col("n_matched"), col("n")).as("metric"),
        lit(1.0).as("threshold"))

    val freshness = t.events.agg(
      count(lit(1)).as("n"),
      sum((col("ts") >= lit(s"$FreshYear-01-01").cast("timestamp") &&
        col("ts") < lit(s"${FreshYear + 1}-01-01").cast("timestamp"))
        .cast("long"))
        .as("n_window"))
      .select(
        lit(8).as("rule_id"), lit("events").as("scope"),
        lit(s"freshness(ts in $FreshYear)").as("rule"),
        frac(col("n_window"), col("n")).as("metric"),
        lit(1.0).as("threshold"))

    orders
      .unionByName(lineitem)
      .unionByName(orphanLines)
      .unionByName(orphanCust)
      .unionByName(freshness)
      .withColumn("passed", col("metric") >= col("threshold"))
      .orderBy(col("rule_id"))
  }

  /** DuckDB mirror of [[auditReport]] — same rules, same exact-count
    * fractions. */
  val auditReportSql: String =
    s"""WITH o AS (
      |  SELECT count(*) AS n, count(o_totalprice) AS n_price,
      |    count(DISTINCT o_orderkey) AS n_keys,
      |    sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
      |      AS n_domain
      |  FROM orders),
      |l AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN l_discount BETWEEN 0.0 AND 0.1 THEN 1 ELSE 0 END)
      |      AS n_disc,
      |    sum(CASE WHEN l_quantity BETWEEN 1.0 AND 40.0 THEN 1 ELSE 0 END)
      |      AS n_qty
      |  FROM lineitem),
      |lo AS (
      |  SELECT count(*) AS n, count(ord.o_orderkey) AS n_matched
      |  FROM lineitem li LEFT JOIN orders ord ON li.l_orderkey = ord.o_orderkey),
      |cn AS (
      |  SELECT count(*) AS n, count(na.n_nationkey) AS n_matched
      |  FROM customer cu LEFT JOIN nation na ON cu.c_nationkey = na.n_nationkey),
      |e AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN ts >= TIMESTAMP '$FreshYear-01-01'
      |      AND ts < TIMESTAMP '${FreshYear + 1}-01-01' THEN 1 ELSE 0 END)
      |      AS n_window
      |  FROM events),
      |rules AS (
      |  SELECT 1 AS rule_id, 'orders' AS scope,
      |    'completeness(o_totalprice)' AS rule,
      |    round(CAST(n_price AS DOUBLE) / CAST(n AS DOUBLE), 6) AS metric,
      |    CAST(1.0 AS DOUBLE) AS threshold FROM o
      |  UNION ALL SELECT 2, 'orders', 'uniqueness(o_orderkey)',
      |    round(CAST(n_keys AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM o
      |  UNION ALL SELECT 3, 'orders', 'domain(o_orderstatus in {O,F,P})',
      |    round(CAST(n_domain AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM o
      |  UNION ALL SELECT 4, 'lineitem', 'range(l_discount in [0,0.1])',
      |    round(CAST(n_disc AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM l
      |  UNION ALL SELECT 5, 'lineitem', 'range(l_quantity in [1,40])',
      |    round(CAST(n_qty AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM l
      |  UNION ALL SELECT 6, 'lineitem->orders', 'referential(l_orderkey)',
      |    round(CAST(n_matched AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM lo
      |  UNION ALL SELECT 7, 'customer->nation', 'referential(c_nationkey)',
      |    round(CAST(n_matched AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM cn
      |  UNION ALL SELECT 8, 'events', 'freshness(ts in $FreshYear)',
      |    round(CAST(n_window AS DOUBLE) / CAST(n AS DOUBLE), 6), 1.0 FROM e)
      |SELECT rule_id, scope, rule, metric, threshold,
      |  metric >= threshold AS passed
      |FROM rules ORDER BY rule_id""".stripMargin
}

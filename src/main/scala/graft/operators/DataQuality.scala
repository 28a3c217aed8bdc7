package graft.operators

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-validation stage every
  * production ingest runs between landing and publish (the reference
  * hand-rolls the idea as ad-hoc quality filters in
  * `airflow/dags/spark_jobs/nyc_taxi_to_iceberg.py:89-96`;
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

  /** Benford first-digit expected shares, log10(1 + 1/d) for d = 1..9 —
    * fixed LITERALS (not computed) so both engines carry identical bits;
    * libm log10 is exactly the portability hole the q83 scaladoc
    * documents. */
  private[operators] val BenfordP: Seq[(Int, Double)] = Seq(
    1 -> 0.3010299956639812, 2 -> 0.17609125905568124,
    3 -> 0.12493873660829993, 4 -> 0.09691001300805642,
    5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
    7 -> 0.05799194697768673, 8 -> 0.05115252244738129,
    9 -> 0.04575749056067514)

  /** q206: Benford first-digit audit over `events.value` — the classic
    * manipulated-data detector (Benford 1938; the screening test auditors
    * run on reported figures): naturally-occurring positive amounts
    * spanning magnitudes lead with digit d at rate log10(1+1/d); synthetic
    * or clipped data deviates, and the per-digit chi-square cells say
    * WHERE. The per-digit deviation report is the DQ signal a pipeline
    * pins next to q157's rule audit (a uniform-ish fixture SHOULD flag —
    * the audit detecting its own synthetic data is the honest outcome).
    *
    * Leading-digit extraction is a pure CASE ladder of bounded floors
    * (values below 10^`maxMag` supported; out-of-range rows are counted
    * and excluded) — no log10, no string formatting, both of which
    * diverge across engines. Expected shares are fixed literals; each
    * chi-square cell is a fixed IEEE expression over exact counts.
    *
    * Scale shape: one narrow pass → 9-row digit histogram + broadcast
    * 1-row total. */
  def benfordAudit(t: Tables): DataFrame = {
    val v = col("value")
    // CASE ladder: first digit of values in [1, 10^6)
    val digit = (5 to 0 by -1).foldLeft(lit(null).cast("int")) {
      case (acc, mag) =>
        val p = math.pow(10.0, mag)
        when(v >= p * 1 && v < p * 10, floor(v / p).cast("int")).otherwise(acc)
    }
    val digits = t.events
      .filter(v.isNotNull && v >= 1.0 && v < 1000000.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n_total"))
    val pExpected = BenfordP.foldRight(lit(Double.NaN): Column) {
      case ((d, p), acc) => when(col("digit") === d, lit(p)).otherwise(acc)
    }
    digits.crossJoin(broadcast(tot)) // 1-row total frame
      .select(col("digit"), col("n_obs"), col("n_total"),
        (col("n_obs").cast("double") / col("n_total").cast("double"))
          .as("pct_obs"),
        pExpected.as("pct_benford"))
      .withColumn("chi_cell",
        (col("n_obs").cast("double") -
          col("n_total").cast("double") * col("pct_benford")) *
          (col("n_obs").cast("double") -
            col("n_total").cast("double") * col("pct_benford")) /
          (col("n_total").cast("double") * col("pct_benford")))
      .orderBy(col("digit"))
  }

  /** The DuckDB mirror of [[benfordAudit]]. */
  def benfordAuditSql(): String = {
    val ladder = (0 to 5).map { mag =>
      val p = math.pow(10.0, mag)
      s"WHEN value >= ${p * 1} AND value < ${p * 10} THEN CAST(floor(value / $p) AS INTEGER)"
    }.mkString(" ")
    // exponent form: a plain decimal literal parses as DECIMAL(18,17) in
    // DuckDB and the decimal->double conversion is off by one ulp from the
    // Spark literal; `...e0` parses directly as DOUBLE (identical bits)
    val pcase = BenfordP
      .map { case (d, p) => s"WHEN $d THEN ${p}e0" }
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT CASE $ladder END AS digit
       |  FROM events
       |  WHERE value IS NOT NULL AND value >= 1.0 AND value < 1000000.0),
       |h AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM h)
       |SELECT digit, n_obs, n_total,
       | CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE) AS pct_obs,
       | CASE digit $pcase END AS pct_benford,
       | (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE)
       |    * (CASE digit $pcase END))
       |  * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE)
       |    * (CASE digit $pcase END))
       |  / (CAST(n_total AS DOUBLE) * (CASE digit $pcase END)) AS chi_cell
       |FROM h CROSS JOIN tot
       |ORDER BY digit""".stripMargin
  }

  /** q207: k-anonymity audit — the re-identification risk screen a
    * training-data release runs over its quasi-identifiers (Sweeney 2002):
    * rows whose QI tuple is shared by fewer than k rows are linkable.
    * QI here: (event_type, day-of-month, value century band) over events.
    * For each k in the sweep, how many equivalence classes and rows fall
    * below k — the table that decides how much generalization
    * (coarser bands, dropped columns) a privacy review demands.
    *
    * Scale shape: one QI-keyed aggregate (map-side combinable), then the
    * sweep explodes the CLASS-sized frame (≪ corpus) per threshold; a
    * broadcast 1-row total supplies shares. All integer counts; shares
    * are single IEEE divisions. */
  def kAnonymity(t: Tables, ks: Seq[Int] = Seq(2, 5, 10, 20)): DataFrame = {
    val qi = t.events.select(
      col("event_type"),
      dayofmonth(col("ts")).as("qi_day"),
      floor(col("value") / 100.0).cast("long").as("qi_band"))
    val classes = qi.groupBy(col("event_type"), col("qi_day"), col("qi_band"))
      .agg(count(lit(1)).as("cls"))
    val tot = classes.agg(sum(col("cls")).as("n_rows_total"),
      count(lit(1)).as("n_classes_total"))
    classes
      .select(col("cls"), explode(array(ks.map(lit): _*)).as("k"))
      .groupBy(col("k"))
      .agg(
        sum(when(col("cls") < col("k"), 1L).otherwise(0L))
          .as("n_classes_violating"),
        sum(when(col("cls") < col("k"), col("cls")).otherwise(0L))
          .as("n_rows_violating"))
      .crossJoin(broadcast(tot)) // 1-row totals frame
      .select(col("k"), col("n_classes_total"), col("n_classes_violating"),
        col("n_rows_violating"),
        (col("n_rows_violating").cast("double") /
          col("n_rows_total").cast("double")).as("pct_rows_at_risk"))
      .orderBy(col("k"))
  }

  /** The DuckDB mirror of [[kAnonymity]]. */
  def kAnonymitySql(ks: Seq[Int] = Seq(2, 5, 10, 20)): String =
    s"""WITH qi AS (
       |  SELECT event_type, day(ts) AS qi_day,
       |   CAST(floor(value / 100.0) AS BIGINT) AS qi_band
       |  FROM events),
       |cl AS (
       |  SELECT count(*) AS cls FROM qi GROUP BY event_type, qi_day, qi_band),
       |tot AS (
       |  SELECT CAST(sum(cls) AS BIGINT) AS n_rows_total,
       |   count(*) AS n_classes_total
       |  FROM cl),
       |sweep AS (
       |  SELECT CAST(u.k AS INTEGER) AS k,
       |   CAST(sum(CASE WHEN cls < u.k THEN 1 ELSE 0 END) AS BIGINT)
       |     AS n_classes_violating,
       |   CAST(sum(CASE WHEN cls < u.k THEN cls ELSE 0 END) AS BIGINT)
       |     AS n_rows_violating
       |  FROM cl, unnest([${ks.mkString(", ")}]) AS u(k)
       |  GROUP BY 1)
       |SELECT k, n_classes_total, n_classes_violating, n_rows_violating,
       | CAST(n_rows_violating AS DOUBLE) / CAST(n_rows_total AS DOUBLE)
       |   AS pct_rows_at_risk
       |FROM sweep CROSS JOIN tot
       |ORDER BY k""".stripMargin

  /** q211: order-independent corpus CHECKSUM per source — the migration /
    * replication audit primitive: after moving 100 TB between formats,
    * engines, or clusters, prove the content matches WITHOUT a
    * row-by-row diff. Each row's canonical string hashes through the
    * portable [[graft.functions.PortableHash.hash62]]; the multiset
    * checksum is the SUM of those hashes, split into two 31-bit lanes so
    * the per-lane BIGINT accumulators never overflow (each lane value
    * < 2^31, so 2^32 rows fit — the [[graft.functions.ExactAgg]] split-sum
    * discipline). Sums commute, so the checksum is independent of
    * partitioning, ordering, and engine — and unlike an XOR fold it is
    * multiset-faithful (duplicate rows do NOT cancel). Any engine that
    * can hash a string can recompute it: that is the whole point.
    *
    * Scale shape: one narrow pass, map-side combinable lane sums, one
    * row per source — the cheapest possible full-content audit. */
  def corpusChecksum(t: Tables): DataFrame = {
    graft.functions.PortableHash.registerHash62(t.spark)
    val canon = concat_ws("|", col("doc_id"), col("source"), col("lang"),
      col("n_chars"), col("text"))
    val h = graft.functions.PortableHash.hash62Col(canon)
    t.documents
      .select(col("source"), h.as("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(shiftrightunsigned(col("h"), 31)).as("checksum_hi"),
        sum(col("h").bitwiseAND(lit(2147483647L))).as("checksum_lo"))
      .orderBy(col("source"))
  }

  /** The DuckDB mirror of [[corpusChecksum]]. */
  def corpusChecksumSql(): String = {
    val h = graft.functions.PortableHash.hash62Sql(
      "(CAST(doc_id AS VARCHAR) || '|' || source || '|' || lang || '|' || " +
        "CAST(n_chars AS VARCHAR) || '|' || text)")
    s"""WITH hashed AS (
       |  SELECT source, ($h) AS h FROM documents)
       |SELECT source, count(*) AS n_rows,
       | CAST(sum(h >> 31) AS BIGINT) AS checksum_hi,
       | CAST(sum(h & 2147483647) AS BIGINT) AS checksum_lo
       |FROM hashed GROUP BY 1 ORDER BY source""".stripMargin
  }

  /** Max n_docs·total_tokens product [[giniConcentration]] accepts: the
    * Σi·wᵢ moment is bounded by n·W and must stay inside int64. */
  private val GiniMaxNW = BigInt(Long.MaxValue) / 2

  /** q215: Gini concentration of token mass across documents, per source —
    * the inequality audit a data-governance review runs before sampling
    * decisions: a source whose Gini is near 1 has its token mass locked in
    * a few mega-documents (one crawl artifact can dominate a mixture
    * weight computed from token counts), where a near-0 source spreads
    * mass evenly. Also reported: the token share held by the top decile of
    * documents — the headline number reviewers quote.
    *
    * Exactness: with documents sorted ascending by weight (ties broken by
    * doc_id — blocks of equal w make Σi·wᵢ order-invariant within the
    * block), G = (2·Σi·wᵢ − (n+1)·W)/(n·W): every moment is an exact
    * BIGINT and G is one division. The decile boundary uses integer DIV —
    * no float index arithmetic.
    *
    * Scale shape: one tokenize pass → (source, w) frame; ONE (source)
    * window partition carries the row_number and both per-source totals;
    * the roll-up reuses that partitioning. The n·W ≤ int64/2 bound is
    * guarded loudly (hi/lo split sums are the widening path). */
  def giniConcentration(t: Tables): DataFrame = {
    val w = size(graft.ext.TextAnalysis.tokens(col("text"))).cast("long")
    val perDoc = t.documents.select(col("source"), col("doc_id"), w.as("w"))
    val part = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val ranked = perDoc.select(col("source"), col("w"),
      row_number().over(part.orderBy(col("w"), col("doc_id"))).cast("long")
        .as("i"),
      count(lit(1)).over(part).as("nn"))
    val agg = ranked.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("w")).as("total_tokens"),
        sum(col("i") * col("w")).as("siw"),
        sum(when(col("i") > col("nn") - expr("nn DIV 10"), col("w"))
          .otherwise(lit(0L))).as("w_top_decile"))
      .localCheckpoint() // source-count rows; guarded then reported
    val bounds = agg.agg(max(col("n_docs")).as("n"),
      max(col("total_tokens")).as("w")).head()
    val nw = BigInt(bounds.getAs[Long]("n")) * BigInt(bounds.getAs[Long]("w"))
    require(nw <= GiniMaxNW,
      s"giniConcentration: n_docs*total_tokens=$nw exceeds the int64-safe " +
        s"$GiniMaxNW; shard the source or widen Σi*w to hi/lo split sums")
    agg.select(col("source"), col("n_docs"), col("total_tokens"),
        col("w_top_decile"),
        (col("w_top_decile").cast("double") /
          col("total_tokens").cast("double")).as("top_decile_share"),
        ((lit(2L) * col("siw") - (col("n_docs") + 1L) * col("total_tokens"))
          .cast("double") /
          (col("n_docs") * col("total_tokens")).cast("double")).as("gini"))
      .orderBy(col("source"))
  }

  /** The DuckDB mirror of [[giniConcentration]]. */
  def giniConcentrationSql(): String =
    """WITH perdoc AS (
      |  SELECT source, doc_id,
      |   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS w
      |  FROM documents),
      |ranked AS (
      |  SELECT source, w,
      |   CAST(row_number() OVER (PARTITION BY source ORDER BY w, doc_id)
      |     AS BIGINT) AS i,
      |   count(*) OVER (PARTITION BY source) AS nn
      |  FROM perdoc),
      |agg AS (
      |  SELECT source, count(*) AS n_docs,
      |   CAST(sum(w) AS BIGINT) AS total_tokens,
      |   CAST(sum(i * w) AS BIGINT) AS siw,
      |   CAST(sum(CASE WHEN i > nn - nn // 10 THEN w ELSE 0 END) AS BIGINT)
      |     AS w_top_decile
      |  FROM ranked GROUP BY 1)
      |SELECT source, n_docs, total_tokens, w_top_decile,
      | CAST(w_top_decile AS DOUBLE) / CAST(total_tokens AS DOUBLE)
      |   AS top_decile_share,
      | CAST(2 * siw - (n_docs + 1) * total_tokens AS DOUBLE)
      |   / CAST(n_docs * total_tokens AS DOUBLE) AS gini
      |FROM agg ORDER BY source""".stripMargin

  /** The q232 column set over `lineitem`, each with its long-domain
    * mapping for the KMV hash: keys hash directly; measure doubles hash
    * their micro-unit quantization (a long cast would collapse e.g. every
    * l_discount ∈ [0, 0.1) to 0). */
  private val ProfileColumns: Seq[(String, Boolean)] = Seq(
    "l_orderkey" -> false, "l_partkey" -> false, "l_suppkey" -> false,
    "l_quantity" -> true, "l_extendedprice" -> true,
    "l_discount" -> true, "l_tax" -> true)

  /** q232: column-statistics profile — the ANALYZE TABLE pass a
    * cost-based optimizer (and every data catalog) runs per table: row
    * count, per-column null count, distinct-count estimate, and min/max.
    * NDV rides the q40 KMV bottom-k sketch (deterministic, mergeable,
    * layout-independent — the production answer; the exact form would
    * plan one Expand replica per column), so the whole profile is ONE
    * pass over the table with a single tiny aggregate row, unpivoted to
    * a row per column.
    *
    * min/max are surfaced as DOUBLE for the unified long-format schema —
    * exact for every fixture domain (|key| < 2^53) and for quantized
    * measures by construction. */
  def columnStatsProfile(t: Tables, k: Int = 256): DataFrame = {
    import graft.functions.KmvSketch
    KmvSketch.register(t.spark)
    def domain(name: String, micro: Boolean): Column =
      if (micro) round(col(name) * lit(1000000), 0).cast("long")
      else col(name).cast("long")
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      ProfileColumns.flatMap { case (c, micro) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        KmvSketch.kmvDistinctNative(
          KmvSketch.hash31(domain(c, micro)), k).as(s"ndv_$c"),
        min(col(c)).cast("double").as(s"min_$c"),
        max(col(c)).cast("double").as(s"max_$c"))
      }
    val one = t.lineitem.agg(aggs.head, aggs.tail: _*)
    one.select(col("n_rows"),
        explode(array(ProfileColumns.map { case (c, _) =>
          struct(lit(c).as("column_name"), col(s"nn_$c").as("n_null"),
            col(s"ndv_$c").as("ndv_est"), col(s"min_$c").as("min_val"),
            col(s"max_$c").as("max_val"))
        }: _*)).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("n_rows"),
        col("kv.n_null").as("n_null"), col("kv.ndv_est").as("ndv_est"),
        col("kv.min_val").as("min_val"), col("kv.max_val").as("max_val"))
      .orderBy(col("column_name"))
  }

  /** The DuckDB mirror of [[columnStatsProfile]]. */
  def columnStatsProfileSql(k: Int = 256): String = {
    import graft.functions.KmvSketch
    def domain(name: String, micro: Boolean): String =
      if (micro) s"CAST(round($name * 1000000, 0) AS BIGINT)"
      else s"CAST($name AS BIGINT)"
    val aggCols = ProfileColumns.map { case (c, micro) =>
      s"""   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |     AS nn_$c,
         |   ${KmvSketch.estimateSql(
               KmvSketch.hash31Sql(domain(c, micro)), k)} AS ndv_$c,
         |   CAST(min($c) AS DOUBLE) AS min_$c,
         |   CAST(max($c) AS DOUBLE) AS max_$c""".stripMargin
    }.mkString(",\n")
    val rows = ProfileColumns.map { case (c, _) =>
      s"  SELECT '$c' AS column_name, n_rows, nn_$c AS n_null," +
        s" ndv_$c AS ndv_est, min_$c AS min_val, max_$c AS max_val FROM one"
    }.mkString("\n  UNION ALL\n")
    s"""WITH one AS MATERIALIZED (
       |  SELECT count(*) AS n_rows,
       |$aggCols
       |  FROM lineitem)
       |SELECT * FROM (
       |$rows)
       |ORDER BY column_name""".stripMargin
  }
}

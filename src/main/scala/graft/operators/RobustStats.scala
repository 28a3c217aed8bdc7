package graft.operators

import graft.core.Tables
import graft.ext.Sampling
import graft.functions.ExactAgg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment-analysis and robust-statistics operators over the events and
  * documents tables: CUPED variance reduction (q200), trimmed/winsorized
  * means (q201), and Spearman rank correlation (q202).
  *
  * All three follow the exact-moment doctrine of
  * [[graft.operators.Analytics]] q115/q166: heavy passes produce exact
  * integer (or [[ExactAgg]] micro-unit) sums; every derived statistic is a
  * fixed-shape IEEE expression over those exact inputs, mirrored
  * term-for-term in the DuckDB oracle SQL, so both engines emit identical
  * bits with no rounding step. */
object RobustStats {

  private val O = ExactAgg.Sql

  /** q200: CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013 — the
    * pre-experiment-covariate adjustment every large A/B platform runs):
    * users are hash-assigned to two arms ([[Sampling.splitHash]] parity, so
    * assignment is layout- and engine-independent); X is a user's
    * pre-period metric (days 1-15), Y the in-experiment metric (days 16+).
    * θ = cov(X,Y)/var(X) is fit POOLED (the standard, arm-agnostic choice
    * — fitting per-arm would bias the estimate), and the adjusted metric
    * is Ŷ = Y − θ·(X − mean(X)). Reported per arm: user count, raw and
    * adjusted means, raw and adjusted variances — the adjusted variance
    * drop is the sensitivity gain the method exists for.
    *
    * Exactness: per-user X/Y via [[ExactAgg.dsum]] (micro-unit integer
    * accumulation, order-independent); pooled and per-arm moments via
    * dsum/dsumProd; θ, means, and variances are fixed IEEE expression
    * trees over those exact sums, deliberately unrounded (the q176
    * HALF_UP doctrine).
    *
    * Scale shape: one corpus pass → per-user frame (narrow, user-count
    * rows); pooled θ is a 1-row broadcast; per-arm roll-up is a 2-row
    * aggregate. Nothing downstream of the first aggregate touches
    * events. */
  def cuped(t: Tables, cutDay: Int = 15): DataFrame = {
    val pre = dayofmonth(col("ts")) <= cutDay
    val perUser = t.events
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        ExactAgg.dsum(when(pre, col("value")).otherwise(lit(0.0))).as("x"),
        ExactAgg.dsum(when(!pre, col("value")).otherwise(lit(0.0))).as("y"))
      .select(col("user_id"), col("x"), col("y"),
        when(pmod(Sampling.splitHash(col("user_id")), lit(2L)) === 0,
          "control").otherwise("treatment").as("arm"))
      .localCheckpoint() // user-count rows; feeds pooled θ AND per-arm
    val pooled = perUser.agg(
        count(lit(1)).cast("double").as("n_p"),
        ExactAgg.dsum(col("x")).as("sx_p"),
        ExactAgg.dsum(col("y")).as("sy_p"),
        ExactAgg.dsumProd(col("x"), col("y")).as("sxy_p"),
        ExactAgg.dsumProd(col("x"), col("x")).as("sxx_p"))
      .select(
        ((col("n_p") * col("sxy_p") - col("sx_p") * col("sy_p")) /
          (col("n_p") * col("sxx_p") - col("sx_p") * col("sx_p")))
          .as("theta"),
        (col("sx_p") / col("n_p")).as("mean_x_pool"))
    val arm = perUser.groupBy(col("arm")).agg(
      count(lit(1)).as("n_users"),
      ExactAgg.dsum(col("x")).as("sx"),
      ExactAgg.dsum(col("y")).as("sy"),
      ExactAgg.dsumProd(col("x"), col("y")).as("sxy"),
      ExactAgg.dsumProd(col("x"), col("x")).as("sxx"),
      ExactAgg.dsumProd(col("y"), col("y")).as("syy"))
    val n = col("n_users").cast("double")
    val meanX = col("sx") / n
    val meanY = col("sy") / n
    val varY = (col("syy") - col("sy") * col("sy") / n) / n
    val varX = (col("sxx") - col("sx") * col("sx") / n) / n
    val covA = (col("sxy") - col("sx") * col("sy") / n) / n
    arm.crossJoin(broadcast(pooled)) // 1-row pooled θ frame
      .select(col("arm"), col("n_users"),
        meanX.as("mean_x"), meanY.as("mean_y"), col("theta"),
        (meanY - col("theta") * (meanX - col("mean_x_pool")))
          .as("mean_y_adj"),
        varY.as("var_y"),
        (varY - lit(2.0) * col("theta") * covA +
          col("theta") * col("theta") * varX).as("var_y_adj"))
      .orderBy(col("arm"))
  }

  /** The DuckDB mirror of [[cuped]]. */
  def cupedSql(cutDay: Int = 15): String = {
    val sh = Sampling.splitHashSql("user_id")
    s"""WITH per_user AS (
       |  SELECT user_id,
       |   ${O.dsum(s"CASE WHEN day(ts) <= $cutDay THEN value ELSE 0 END")}
       |     AS x,
       |   ${O.dsum(s"CASE WHEN NOT (day(ts) <= $cutDay) THEN value ELSE 0 END")}
       |     AS y,
       |   CASE WHEN ($sh) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
       |  FROM events WHERE value IS NOT NULL
       |  GROUP BY user_id),
       |pooled AS (
       |  SELECT
       |   (CAST(count(*) AS DOUBLE) * ${O.dsumProd("x", "y")}
       |     - ${O.dsum("x")} * ${O.dsum("y")})
       |   / (CAST(count(*) AS DOUBLE) * ${O.dsumProd("x", "x")}
       |     - ${O.dsum("x")} * ${O.dsum("x")}) AS theta,
       |   ${O.dsum("x")} / CAST(count(*) AS DOUBLE) AS mean_x_pool
       |  FROM per_user),
       |arm AS (
       |  SELECT arm, count(*) AS n_users,
       |   ${O.dsum("x")} AS sx, ${O.dsum("y")} AS sy,
       |   ${O.dsumProd("x", "y")} AS sxy,
       |   ${O.dsumProd("x", "x")} AS sxx,
       |   ${O.dsumProd("y", "y")} AS syy
       |  FROM per_user GROUP BY arm)
       |SELECT arm, n_users,
       | sx / CAST(n_users AS DOUBLE) AS mean_x,
       | sy / CAST(n_users AS DOUBLE) AS mean_y,
       | theta,
       | sy / CAST(n_users AS DOUBLE) - theta *
       |   (sx / CAST(n_users AS DOUBLE) - mean_x_pool) AS mean_y_adj,
       | (syy - sy * sy / CAST(n_users AS DOUBLE))
       |   / CAST(n_users AS DOUBLE) AS var_y,
       | (syy - sy * sy / CAST(n_users AS DOUBLE)) / CAST(n_users AS DOUBLE)
       |  - 2.0 * theta * ((sxy - sx * sy / CAST(n_users AS DOUBLE))
       |      / CAST(n_users AS DOUBLE))
       |  + theta * theta * ((sxx - sx * sx / CAST(n_users AS DOUBLE))
       |      / CAST(n_users AS DOUBLE)) AS var_y_adj
       |FROM arm CROSS JOIN pooled
       |ORDER BY arm""".stripMargin
  }

  /** q201: trimmed and winsorized means per event type — the robust
    * location estimates an experiment metric pipeline reports next to the
    * raw mean (one whale user moves a mean; it cannot move a 10%-trimmed
    * one). Tail edges are the p10/p90 from the bounded-memory grid-
    * quantile machinery ([[Analytics.gridQuantileEdges]], the q107/q108
    * production path — O(grid) counters per group, never a full-column
    * buffer). Trimmed = mean of values inside [p10, p90] (closed
    * interval); winsorized = mean with tails CLAMPED to the edges — same
    * row count as raw, which is why A/B practice prefers it.
    *
    * Exactness: edges are the proven-portable grid-edge IEEE expressions;
    * all three means run through [[ExactAgg]] micro-unit kernels.
    *
    * Scale shape: two corpus passes (histogram, then means) with the
    * per-group edge frame broadcast between them — the q170 filter shape,
    * grouped. */
  def trimmedMeans(t: Tables, grid: Int = 4096): DataFrame = {
    val ev = t.events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val edges = Analytics
      .gridQuantileEdges(ev, "value", Seq("event_type"), buckets = 10,
        grid = grid)
      .select(col("event_type"), col("e1").as("p10"), col("e9").as("p90"))
    val inRange = col("value") >= col("p10") && col("value") <= col("p90")
    val clamped = least(greatest(col("value"), col("p10")), col("p90"))
    ev.join(broadcast(edges), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        ExactAgg.davg(col("value")).as("mean_raw"),
        max(col("p10")).as("p10"), max(col("p90")).as("p90"),
        sum(inRange.cast("long")).as("n_within"),
        (ExactAgg.dsum(when(inRange, col("value")).otherwise(lit(0.0))) /
          sum(inRange.cast("long")).cast("double")).as("mean_trimmed"),
        ExactAgg.davg(clamped).as("mean_winsorized"))
      .orderBy(col("event_type"))
  }

  /** The DuckDB mirror of [[trimmedMeans]] — the grouped grid-edge CTE
    * chain of [[graft.SketchOracleSql.gridEquiDepth]] retargeted at
    * (events.event_type, value), then the clamped/filtered means. */
  def trimmedMeansSql(grid: Int = 4096): String =
    s"""WITH ev AS (
       |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
       |mm AS (
       |  SELECT event_type, min(value) AS mn, max(value) AS mx,
       |   CAST(count(*) AS DOUBLE) AS n
       |  FROM ev GROUP BY 1),
       |hist AS (
       |  SELECT ev.event_type,
       |   CASE WHEN mm.mx = mm.mn THEN 0
       |    ELSE LEAST(CAST(floor((value - mm.mn) / (mm.mx - mm.mn)
       |      * $grid.0) AS INTEGER), ${grid - 1}) END AS bin,
       |   count(*) AS c, max(mm.mn) AS mn, max(mm.mx) AS mx, max(mm.n) AS n
       |  FROM ev JOIN mm USING (event_type)
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT *, COALESCE(SUM(c) OVER (PARTITION BY event_type
       |    ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    0) AS cb
       |  FROM hist),
       |targets AS (SELECT CAST(range AS INTEGER) AS i FROM range(1, 10)),
       |edge_rows AS (
       |  SELECT event_type, t.i,
       |   cum.mn + (CAST(cum.bin AS DOUBLE)
       |     + (CAST(t.i AS DOUBLE) * cum.n / 10.0 - CAST(cum.cb AS DOUBLE))
       |       / CAST(cum.c AS DOUBLE))
       |     * ((cum.mx - cum.mn) / $grid.0) AS edge
       |  FROM cum JOIN targets t
       |    ON CAST(cum.cb AS DOUBLE) <= CAST(t.i AS DOUBLE) * cum.n / 10.0
       |   AND CAST(cum.cb + cum.c AS DOUBLE) > CAST(t.i AS DOUBLE) * cum.n / 10.0),
       |es0 AS (
       |  SELECT event_type, list_sort(list(edge)) AS es FROM edge_rows
       |  GROUP BY 1),
       |edges AS (SELECT event_type, es[1] AS p10, es[9] AS p90 FROM es0)
       |SELECT event_type, count(*) AS n,
       | ${O.davg("value")} AS mean_raw,
       | max(p10) AS p10, max(p90) AS p90,
       | CAST(sum(CASE WHEN value >= p10 AND value <= p90 THEN 1 ELSE 0 END)
       |   AS BIGINT) AS n_within,
       | ${O.dsum("CASE WHEN value >= p10 AND value <= p90 THEN value ELSE 0 END")}
       |  / CAST(sum(CASE WHEN value >= p10 AND value <= p90 THEN 1 ELSE 0 END)
       |      AS DOUBLE) AS mean_trimmed,
       | ${O.davg("least(greatest(value, p10), p90)")} AS mean_winsorized
       |FROM ev JOIN edges USING (event_type)
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  /** Max per-group row count [[spearman]] accepts: Sxy ≤ 4n³ must stay
    * inside int64, so n ≤ ⌊(2^63/4)^(1/3)⌋ ≈ 1.32e6. */
  private val SpearmanMaxN = 1300000L

  /** q202: Spearman rank correlation between per-document size signals
    * (token count, char count, distinct-token count), per source — the
    * robust complement of q185's Pearson matrix: rank correlation ignores
    * the heavy right tail document lengths always have, so it answers
    * "are these quality signals MONOTONICALLY redundant" where Pearson
    * conflates that with linearity (Spearman 1904; the filter-redundancy
    * check run before retiring a quality signal).
    *
    * Tied values get fractional average ranks — the statistically correct
    * treatment — kept in INTEGER space as 2·rank: for a tied run spanning
    * positions [a, b], 2·avgrank = a + b = rank_asc + (n + 1 − rank_desc),
    * so two opposite-order rank() windows over the SAME partition replace
    * any float averaging. All moment sums are exact BIGINTs (guarded
    * against overflow at n > 1.3e6 rows/group — fail loudly, the
    * [[graft.ext.Spectral]] contract); ρ is one fixed IEEE expression over
    * their double casts, identical in both engines.
    *
    * Scale shape: signals are one narrow corpus pass exploded to long
    * format (3 rows/doc); BOTH rank windows share one (source, signal)
    * partition — one shuffle, two sorts; the pivot-back is a per-doc
    * 3-column aggregate and the final frame is one row per source. */
  def spearman(t: Tables): DataFrame = {
    import graft.ext.TextAnalysis.tokens
    val tks = tokens(lower(col("text")))
    val maxN = t.documents.groupBy(col("source")).count()
      .agg(max(col("count"))).head().getLong(0)
    require(maxN <= SpearmanMaxN,
      s"spearman: $maxN rows in one source exceeds the int64-safe " +
        s"$SpearmanMaxN; shard the group or widen to hi/lo split sums")
    val long = t.documents.select(col("source"), col("doc_id"),
        size(tks).cast("long").as("v_tokens"),
        col("n_chars").cast("long").as("v_chars"),
        size(array_distinct(tks)).cast("long").as("v_distinct"))
      .select(col("source"), col("doc_id"),
        explode(map(
          lit("tokens"), col("v_tokens"),
          lit("chars"), col("v_chars"),
          lit("distinct"), col("v_distinct"))).as(Seq("signal", "v")))
    val part = Window.partitionBy(col("source"), col("signal"))
    val r2 = long.select(col("source"), col("doc_id"), col("signal"),
      (rank().over(part.orderBy(col("v"))).cast("long") +
        count(lit(1)).over(part) + 1L -
        rank().over(part.orderBy(col("v").desc)).cast("long")).as("r2"))
    val wide = r2.groupBy(col("source"), col("doc_id"))
      .agg(
        max(when(col("signal") === "tokens", col("r2"))).as("rt"),
        max(when(col("signal") === "chars", col("r2"))).as("rc"),
        max(when(col("signal") === "distinct", col("r2"))).as("rd"))
    def rho(sab: Column, saa: Column, sbb: Column,
            sa: Column, sb: Column, n: Column): Column =
      (n * sab.cast("double") - sa.cast("double") * sb.cast("double")) /
        (sqrt(n * saa.cast("double") - sa.cast("double") * sa.cast("double")) *
          sqrt(n * sbb.cast("double") - sb.cast("double") * sb.cast("double")))
    val m = wide.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("rt")).as("st"), sum(col("rc")).as("sc"),
      sum(col("rd")).as("sd"),
      sum(col("rt") * col("rt")).as("stt"),
      sum(col("rc") * col("rc")).as("scc"),
      sum(col("rd") * col("rd")).as("sdd"),
      sum(col("rt") * col("rc")).as("stc"),
      sum(col("rt") * col("rd")).as("std_"),
      sum(col("rc") * col("rd")).as("scd"))
    val n = col("n_docs").cast("double")
    m.select(col("source"), col("n_docs"),
        rho(col("stc"), col("stt"), col("scc"),
          col("st"), col("sc"), n).as("rho_tokens_chars"),
        rho(col("std_"), col("stt"), col("sdd"),
          col("st"), col("sd"), n).as("rho_tokens_distinct"),
        rho(col("scd"), col("scc"), col("sdd"),
          col("sc"), col("sd"), n).as("rho_chars_distinct"))
      .orderBy(col("source"))
  }

  /** The DuckDB mirror of [[spearman]]. */
  def spearmanSql(): String = {
    def rho(sab: String, saa: String, sbb: String, sa: String,
            sb: String): String =
      s"""(CAST(n_docs AS DOUBLE) * CAST($sab AS DOUBLE)
         |   - CAST($sa AS DOUBLE) * CAST($sb AS DOUBLE))
         | / (sqrt(CAST(n_docs AS DOUBLE) * CAST($saa AS DOUBLE)
         |     - CAST($sa AS DOUBLE) * CAST($sa AS DOUBLE))
         |  * sqrt(CAST(n_docs AS DOUBLE) * CAST($sbb AS DOUBLE)
         |     - CAST($sb AS DOUBLE) * CAST($sb AS DOUBLE)))""".stripMargin
    s"""WITH sig AS (
       |  SELECT source, doc_id,
       |   CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
       |     AS v_tokens,
       |   CAST(n_chars AS BIGINT) AS v_chars,
       |   CAST(len(list_distinct(string_split_regex(trim(lower(text)),
       |     '\\s+'))) AS BIGINT) AS v_distinct
       |  FROM documents),
       |long AS (
       |  SELECT source, doc_id, u.signal,
       |   CASE u.signal WHEN 'tokens' THEN v_tokens
       |    WHEN 'chars' THEN v_chars ELSE v_distinct END AS v
       |  FROM sig, unnest(['tokens', 'chars', 'distinct']) AS u(signal)),
       |r AS (
       |  SELECT source, doc_id, signal,
       |   CAST(rank() OVER (PARTITION BY source, signal ORDER BY v)
       |     AS BIGINT)
       |   + count(*) OVER (PARTITION BY source, signal) + 1
       |   - CAST(rank() OVER (PARTITION BY source, signal ORDER BY v DESC)
       |     AS BIGINT) AS r2
       |  FROM long),
       |wide AS (
       |  SELECT source, doc_id,
       |   max(CASE WHEN signal = 'tokens' THEN r2 END) AS rt,
       |   max(CASE WHEN signal = 'chars' THEN r2 END) AS rc,
       |   max(CASE WHEN signal = 'distinct' THEN r2 END) AS rd
       |  FROM r GROUP BY 1, 2),
       |m AS (
       |  SELECT source, count(*) AS n_docs,
       |   CAST(sum(rt) AS BIGINT) AS st, CAST(sum(rc) AS BIGINT) AS sc,
       |   CAST(sum(rd) AS BIGINT) AS sd,
       |   CAST(sum(rt * rt) AS BIGINT) AS stt,
       |   CAST(sum(rc * rc) AS BIGINT) AS scc,
       |   CAST(sum(rd * rd) AS BIGINT) AS sdd,
       |   CAST(sum(rt * rc) AS BIGINT) AS stc,
       |   CAST(sum(rt * rd) AS BIGINT) AS std_,
       |   CAST(sum(rc * rd) AS BIGINT) AS scd
       |  FROM wide GROUP BY 1)
       |SELECT source, n_docs,
       | ${rho("stc", "stt", "scc", "st", "sc")} AS rho_tokens_chars,
       | ${rho("std_", "stt", "sdd", "st", "sd")} AS rho_tokens_distinct,
       | ${rho("scd", "scc", "sdd", "sc", "sd")} AS rho_chars_distinct
       |FROM m ORDER BY source""".stripMargin
  }

  /** q208: TOKEN-weighted document-length quantiles per source — the
    * context-length planning statistic: "how long is the document the
    * median TOKEN lives in". Row-weighted length quantiles (q51/q107)
    * answer a different question — most documents are short, but most
    * TOKENS sit in long documents, and it is tokens that fill training
    * context windows. For each target q ∈ {25, 50, 75, 90}: sort a
    * source's docs by token count and take the length at which the
    * CUMULATIVE token mass crosses q% — the weighted-quantile definition
    * with weight = the value itself.
    *
    * Exactness: the crossing test is pure integer arithmetic
    * (100·cum_before ≤ q·W < 100·cum) — the [[Analytics
    * .gridQuantileEdges]] crossing-cell shape with exact token weights
    * instead of grid cells; the output length is an exact BIGINT, no
    * interpolation, no floats anywhere.
    *
    * Scale shape: one tokenize pass → per-(source, length) weight
    * histogram (distinct lengths ≪ corpus); the window cumsum and the
    * 4-target band join run on that histogram frame. */
  def weightedLengthQuantiles(t: Tables,
                              qs: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    val byLen = t.documents
      .select(col("source"),
        size(graft.ext.TextAnalysis.tokens(col("text"))).cast("long")
          .as("len"))
      .groupBy(col("source"), col("len"))
      .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("w"))
    val win = Window.partitionBy(col("source")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("source"))
    val cum = byLen.select(col("source"), col("len"), col("n_docs"),
      col("w"),
      sum(col("w")).over(win).as("cum"),
      sum(col("w")).over(tot).as("wtot"))
    val targets = t.spark.createDataFrame(
      qs.map(Tuple1(_))).toDF("q").distinct()
    // crossing band: cum_before*100 < q*W <= cum*100 — exactly one length
    // row per (source, target)
    cum.join(broadcast(targets),
        (col("cum") * 100 >= col("q").cast("long") * col("wtot")) &&
          ((col("cum") - col("w")) * 100 <
            col("q").cast("long") * col("wtot")))
      .select(col("source"), col("q"), col("len").as("weighted_len"),
        col("n_docs").as("n_docs_at_len"),
        (col("cum").cast("double") / col("wtot").cast("double"))
          .as("cum_mass_at_len"))
      .orderBy(col("source"), col("q"))
  }

  /** The DuckDB mirror of [[weightedLengthQuantiles]]. */
  def weightedLengthQuantilesSql(qs: Seq[Int] = Seq(25, 50, 75, 90)): String =
    s"""WITH bylen AS (
       |  SELECT source,
       |   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS len,
       |   count(*) AS n_docs,
       |   CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
       |     AS w
       |  FROM documents GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, len, n_docs, w,
       |   SUM(w) OVER (PARTITION BY source ORDER BY len
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |   SUM(w) OVER (PARTITION BY source) AS wtot
       |  FROM bylen),
       |targets AS (SELECT CAST(u.q AS INTEGER) AS q
       |            FROM unnest([${qs.mkString(", ")}]) AS u(q))
       |SELECT source, q, len AS weighted_len, n_docs AS n_docs_at_len,
       | CAST(cum AS DOUBLE) / CAST(wtot AS DOUBLE) AS cum_mass_at_len
       |FROM cum JOIN targets
       |  ON cum * 100 >= CAST(q AS BIGINT) * wtot
       | AND (cum - w) * 100 < CAST(q AS BIGINT) * wtot
       |ORDER BY source, q""".stripMargin

  /** Poisson(1) inverse-CDF thresholds for [[poissonBootstrap]], as
    * integer cuts on the [0, M) hash-uniform: draw k occurrences when the
    * hash falls in [T(k-1), T(k)), T(k) = ⌊P(X ≤ k)·M⌋. The cumulative
    * probabilities are fixed literals (e^-1-based — libm exp is the
    * portability hole); computing the cuts HERE and interpolating the same
    * longs into both engines' plans keeps the draw bit-identical. Tail
    * capped at 7 (P(X > 7) ≈ 1e-5 — absorbed into the last bucket). */
  private[operators] val PoissonCuts: Seq[Long] = {
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183, 0.9999167588507119)
    cdf.map(p => (p * graft.functions.KmvSketch.M).toLong)
  }

  /** q209: Poisson-bootstrap uncertainty for a per-user metric (Chamandy
    * et al. 2012 — the resampling scheme that made bootstrap work on
    * massive data: instead of drawing n users WITH replacement per
    * replica (a global shuffle per replica), each user independently
    * contributes Poisson(1) copies, which preserves the bootstrap
    * distribution and streams in ONE pass). B replicas of the mean
    * per-user event value are computed simultaneously; the replica spread
    * is the standard error no single-pass formula gives for ratio/
    * per-user metrics.
    *
    * Determinism: replica b's weight for user u is the Poisson inverse
    * CDF applied to the portable [[Sampling.splitHash]] of (u·B + b) —
    * integer threshold compares against [[PoissonCuts]], zero libm. The
    * replica mean is dsum(w·y)/sum(w) — one IEEE division of
    * exact-kernel sums.
    *
    * Scale shape: one corpus pass → per-user frame; the replica explode
    * is B narrow rows per USER (not per event); the final frame is B
    * rows. At 100 TB the per-user frame is the working set and B scales
    * the aggregate, not the corpus read. */
  def poissonBootstrap(t: Tables, nReplicas: Int = 32): DataFrame = {
    val perUser = t.events
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(ExactAgg.dsum(col("value")).as("y"))
    val h = Sampling.splitHash(col("user_id") * nReplicas + col("b"))
    val w = PoissonCuts.zipWithIndex.foldRight(lit(PoissonCuts.length): Column) {
      case ((cut, k), acc) => when(h < cut, lit(k)).otherwise(acc)
    }
    perUser
      .select(col("user_id"), col("y"),
        explode(sequence(lit(0), lit(nReplicas - 1))).as("b"))
      .select(col("b"), col("y"), w.cast("long").as("w"))
      .groupBy(col("b"))
      .agg(
        sum(col("w")).as("n_eff"),
        (ExactAgg.dsum(col("w") * col("y")) /
          sum(col("w")).cast("double")).as("mean_b"))
      .orderBy(col("b"))
  }

  /** The DuckDB mirror of [[poissonBootstrap]]. */
  def poissonBootstrapSql(nReplicas: Int = 32): String = {
    val h = Sampling.splitHashSql(s"(user_id * $nReplicas + u.b)")
    val ladder = PoissonCuts.zipWithIndex
      .map { case (cut, k) => s"WHEN ($h) < $cut THEN $k" }
      .mkString(" ")
    s"""WITH per_user AS (
       |  SELECT user_id, ${O.dsum("value")} AS y
       |  FROM events WHERE value IS NOT NULL GROUP BY 1),
       |rep AS (
       |  SELECT u.b, y,
       |   CAST(CASE $ladder ELSE ${PoissonCuts.length} END AS BIGINT) AS w
       |  FROM per_user, unnest(range(0, $nReplicas)) AS u(b))
       |SELECT CAST(b AS INTEGER) AS b,
       | CAST(sum(w) AS BIGINT) AS n_eff,
       | ${O.dsum("w * y")} / CAST(sum(w) AS DOUBLE) AS mean_b
       |FROM rep GROUP BY 1 ORDER BY b""".stripMargin
  }

  /** q219: post-stratified arm means (the survey-sampling estimator, e.g.
    * Holt & Smith 1979) — each arm's mean is re-weighted so every stratum
    * (event_type) counts with its POPULATION share n_s/N instead of the
    * share the hash split happened to deal that arm. This is the
    * first-line fix for covariate imbalance an experiment readout applies
    * before reaching for regression adjustment (q200 CUPED adjusts on a
    * continuous pre-metric; post-stratification adjusts on a categorical
    * one).
    *
    * Exactness: stratum/arm cells carry exact counts and [[ExactAgg]]
    * micro-unit sums; each stratum's contribution (n_s·mean_sa)/N is one
    * fixed IEEE term, and the sum over strata goes through dsum again —
    * order-independent by construction, so both engines agree bit-for-bit
    * without fixing a stratum order.
    *
    * Scale shape: one corpus pass → (stratum, arm) cell frame; stratum
    * populations and the grand total are roll-ups of that tiny frame
    * (broadcast back); output is one row per arm. */
  def postStratified(t: Tables): DataFrame = {
    val armC = when(pmod(Sampling.splitHash(col("user_id")), lit(2L)) === 0,
      "control").otherwise("treatment")
    val cell = t.events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), armC.as("arm"))
      .groupBy(col("event_type"), col("arm"))
      .agg(count(lit(1)).as("n_sa"), ExactAgg.dsum(col("value")).as("s_sa"))
      .localCheckpoint() // strata×2 rows; feeds populations AND the report
    val strat = cell.groupBy(col("event_type"))
      .agg(sum(col("n_sa")).as("n_s"))
    val tot = strat.agg(sum(col("n_s")).as("n_pop"))
    val term = (col("n_s").cast("double") *
      (col("s_sa") / col("n_sa").cast("double"))) / col("n_pop").cast("double")
    cell.join(broadcast(strat), Seq("event_type"))
      .crossJoin(broadcast(tot)) // 1-row population total
      .groupBy(col("arm"))
      .agg(
        sum(col("n_sa")).as("n_events"),
        (ExactAgg.dsum(col("s_sa")) / sum(col("n_sa")).cast("double"))
          .as("mean_raw"),
        ExactAgg.dsum(term).as("mean_poststrat"))
      .orderBy(col("arm"))
  }

  /** The DuckDB mirror of [[postStratified]]. */
  def postStratifiedSql(): String = {
    val sh = Sampling.splitHashSql("user_id")
    s"""WITH cell AS (
       |  SELECT event_type,
       |   CASE WHEN ($sh) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
       |   count(*) AS n_sa, ${O.dsum("value")} AS s_sa
       |  FROM events WHERE value IS NOT NULL
       |  GROUP BY 1, 2),
       |strat AS (
       |  SELECT event_type, CAST(sum(n_sa) AS BIGINT) AS n_s
       |  FROM cell GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_pop FROM strat)
       |SELECT arm,
       | CAST(sum(n_sa) AS BIGINT) AS n_events,
       | ${O.dsum("s_sa")} / CAST(sum(n_sa) AS DOUBLE) AS mean_raw,
       | ${O.dsum("(CAST(n_s AS DOUBLE) * (s_sa / CAST(n_sa AS DOUBLE))) / CAST(n_pop AS DOUBLE)")}
       |   AS mean_poststrat
       |FROM cell JOIN strat USING (event_type) CROSS JOIN tot
       |GROUP BY arm ORDER BY arm""".stripMargin
  }

  /** q220: permutation test for the arm difference in per-user mean value
    * (Fisher 1935, in the Chamandy one-pass form): the observed
    * treatment−control gap is compared against B re-randomizations of the
    * SAME users — the assignment is the only thing resampled, so the test
    * is exact under the sharp null with zero distributional assumptions.
    * This is the readout that stays valid when q212's normal approximation
    * is dubious (heavy tails, small strata).
    *
    * Determinism: permutation b reassigns user u by the parity of the
    * portable [[Sampling.splitHash]] of (u·B + b) — the q209 replica-hash
    * scheme — so both engines deal identical pseudo-assignments with zero
    * random state. Means are dsum/count ratios; each |diff_b| ≥ |diff_obs|
    * comparison runs on bit-identical doubles, so the count of extreme
    * replicas (and hence the p-value's numerator/denominator, both exact
    * integers) agrees exactly.
    *
    * Scale shape: one corpus pass → per-user frame; the replica explode is
    * B narrow rows per USER; one (b) aggregate computes every replica's
    * two arms at once via conditional kernels; the observed split is a
    * 1-row broadcast. p-value = (1 + #extreme)/(B + 1) — the add-one form
    * that never reports zero. */
  def permutationTest(t: Tables, nPerms: Int = 64): DataFrame = {
    val perUser = t.events.filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"), ExactAgg.dsum(col("value")).as("y"))
      .localCheckpoint() // user-count rows; feeds observed AND replicas
    val obsArm = pmod(Sampling.splitHash(col("user_id")), lit(2L)) === 0
    val observed = perUser.agg(
        count(lit(1)).as("n_users"),
        sum(when(obsArm, 1L).otherwise(0L)).as("n_c"),
        ExactAgg.dsum(when(obsArm, col("y")).otherwise(lit(0.0))).as("s_c"),
        ExactAgg.dsum(when(!obsArm, col("y")).otherwise(lit(0.0))).as("s_t"))
      .select(col("n_users"), col("n_c"),
        (col("s_t") / (col("n_users") - col("n_c")).cast("double") -
          col("s_c") / col("n_c").cast("double")).as("diff_obs"))
    val permArm =
      pmod(Sampling.splitHash(col("user_id") * nPerms + col("b")), lit(2L)) === 0
    val reps = perUser
      .select(col("user_id"), col("y"),
        explode(sequence(lit(0), lit(nPerms - 1))).as("b"))
      .groupBy(col("b"))
      .agg(
        sum(when(permArm, 1L).otherwise(0L)).as("n_c_b"),
        count(lit(1)).as("n_b"),
        ExactAgg.dsum(when(permArm, col("y")).otherwise(lit(0.0))).as("s_c_b"),
        ExactAgg.dsum(when(!permArm, col("y")).otherwise(lit(0.0))).as("s_t_b"))
      .select(col("b"),
        (col("s_t_b") / (col("n_b") - col("n_c_b")).cast("double") -
          col("s_c_b") / col("n_c_b").cast("double")).as("diff_b"))
    reps.crossJoin(broadcast(observed)) // 1-row observed frame
      .agg(
        max(col("n_users")).as("n_users"),
        max(col("diff_obs")).as("diff_obs"),
        count(lit(1)).as("n_perms"),
        sum(when(abs(col("diff_b")) >= abs(col("diff_obs")), 1L)
          .otherwise(0L)).as("n_extreme"))
      .select(col("n_users"), col("diff_obs"), col("n_perms"),
        col("n_extreme"),
        ((col("n_extreme") + 1L).cast("double") /
          (col("n_perms") + 1L).cast("double")).as("p_value"))
  }

  /** The DuckDB mirror of [[permutationTest]]. */
  def permutationTestSql(nPerms: Int = 64): String = {
    val shObs = Sampling.splitHashSql("user_id")
    val shPerm = Sampling.splitHashSql(s"(user_id * $nPerms + u.b)")
    s"""WITH per_user AS (
       |  SELECT user_id, count(*) AS n_ev, ${O.dsum("value")} AS y
       |  FROM events WHERE value IS NOT NULL GROUP BY 1),
       |observed AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_users,
       |   CAST(sum(CASE WHEN ($shObs) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |     AS n_c,
       |   ${O.dsum(s"CASE WHEN ($shObs) % 2 = 0 THEN y ELSE 0 END")} AS s_c,
       |   ${O.dsum(s"CASE WHEN NOT (($shObs) % 2 = 0) THEN y ELSE 0 END")}
       |     AS s_t
       |  FROM per_user),
       |obs AS (
       |  SELECT n_users, n_c,
       |   s_t / CAST(n_users - n_c AS DOUBLE) - s_c / CAST(n_c AS DOUBLE)
       |     AS diff_obs
       |  FROM observed),
       |reps AS (
       |  SELECT u.b,
       |   CAST(sum(CASE WHEN ($shPerm) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |     AS n_c_b,
       |   CAST(count(*) AS BIGINT) AS n_b,
       |   ${O.dsum(s"CASE WHEN ($shPerm) % 2 = 0 THEN y ELSE 0 END")}
       |     AS s_c_b,
       |   ${O.dsum(s"CASE WHEN NOT (($shPerm) % 2 = 0) THEN y ELSE 0 END")}
       |     AS s_t_b
       |  FROM per_user, unnest(range(0, $nPerms)) AS u(b)
       |  GROUP BY 1),
       |diffs AS (
       |  SELECT b,
       |   s_t_b / CAST(n_b - n_c_b AS DOUBLE) - s_c_b / CAST(n_c_b AS DOUBLE)
       |     AS diff_b
       |  FROM reps)
       |SELECT max(n_users) AS n_users, max(diff_obs) AS diff_obs,
       | CAST(count(*) AS BIGINT) AS n_perms,
       | CAST(sum(CASE WHEN abs(diff_b) >= abs(diff_obs) THEN 1 ELSE 0 END)
       |   AS BIGINT) AS n_extreme,
       | CAST(sum(CASE WHEN abs(diff_b) >= abs(diff_obs) THEN 1 ELSE 0 END)
       |   + 1 AS DOUBLE) / CAST(count(*) + 1 AS DOUBLE) AS p_value
       |FROM diffs CROSS JOIN obs""".stripMargin
  }

  /** q221: Wilson score intervals for per-event-type instrumentation
    * completeness (Wilson 1927) — the interval a monitoring pipeline puts
    * around every proportion it alerts on, because the Wald interval
    * collapses to zero width at p̂ ∈ {0, 1} exactly where instrumentation
    * bugs live. The audited proportion is the share of events carrying a
    * non-null `value` — the q157 completeness rule upgraded from a point
    * estimate to a calibrated interval.
    *
    * Exactness: n and x are exact BIGINTs from one conditional aggregate;
    * the interval is a fixed-shape IEEE expression (z = 1.96 literal,
    * z² computed as z·z identically in both engines). */
  def wilsonCompleteness(t: Tables, z: Double = 1.96): DataFrame = {
    val agg = t.events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(when(col("value").isNotNull, 1L).otherwise(0L)).as("x"))
    val nd = col("n").cast("double")
    val phat = col("x").cast("double") / nd
    val zz = lit(z) * lit(z)
    val denom = lit(1.0) + zz / nd
    val center = (phat + zz / (lit(2.0) * nd)) / denom
    val half = (lit(z) / denom) *
      sqrt(phat * (lit(1.0) - phat) / nd +
        zz / (lit(4.0) * nd * nd))
    agg.select(col("event_type"), col("n"), col("x"),
        phat.as("p_hat"),
        (center - half).as("ci_lo"),
        (center + half).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  /** The DuckDB mirror of [[wilsonCompleteness]]. */
  def wilsonCompletenessSql(z: Double = 1.96): String = {
    val zl = { val s = z.toString; if (s.contains('E')) s else s + "e0" }
    val nd = "CAST(n AS DOUBLE)"
    val phat = s"CAST(x AS DOUBLE) / $nd"
    val zz = s"$zl * $zl"
    val denom = s"1.0 + $zz / $nd"
    val center = s"($phat + $zz / (2.0 * $nd)) / ($denom)"
    val half = s"($zl / ($denom)) * sqrt($phat * (1.0 - $phat) / $nd " +
      s"+ $zz / (4.0 * $nd * $nd))"
    s"""WITH agg AS (
       |  SELECT event_type, count(*) AS n,
       |   CAST(sum(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |     AS x
       |  FROM events GROUP BY 1)
       |SELECT event_type, n, x,
       | $phat AS p_hat,
       | $center - $half AS ci_lo,
       | $center + $half AS ci_hi
       |FROM agg ORDER BY event_type""".stripMargin
  }

  /** q222: sample-ratio-mismatch sweep (the Kohavi/Fabijan launch
    * checklist item): K independent hash seeds each deal the user
    * population into two arms; z = (2·n_ctl − n)/√n per seed. A healthy
    * assignment hash keeps every |z| under ~3; one hot seed means the
    * hash interacts with the id structure and q200/q212/q219/q220 —
    * which all ride that split — cannot be trusted. This is the audit
    * that VALIDATES the splitHash family the experiment suite uses.
    *
    * Exactness: per-seed counts are exact BIGINTs from one exploded
    * aggregate (the q209 replica scheme); z is one fixed IEEE expression;
    * the |z| ≥ 3 flag compares identically-computed doubles.
    *
    * Scale shape: one distinct-user pass, K narrow rows per user, one
    * (seed) aggregate — K scales the aggregate, not the corpus read. */
  def srmSweep(t: Tables, nSeeds: Int = 16): DataFrame = {
    val users = t.events.select(col("user_id")).distinct()
    val ctl = pmod(Sampling.splitHash(col("user_id") * nSeeds + col("seed")),
      lit(2L)) === 0
    users
      .select(col("user_id"),
        explode(sequence(lit(0), lit(nSeeds - 1))).as("seed"))
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(ctl, 1L).otherwise(0L)).as("n_control"))
      .select(col("seed"), col("n_users"), col("n_control"),
        ((lit(2L) * col("n_control") - col("n_users")).cast("double") /
          sqrt(col("n_users").cast("double"))).as("z_srm"))
      .withColumn("srm_flag", abs(col("z_srm")) >= lit(3.0))
      .orderBy(col("seed"))
  }

  /** The DuckDB mirror of [[srmSweep]]. */
  def srmSweepSql(nSeeds: Int = 16): String = {
    val sh = Sampling.splitHashSql(s"(user_id * $nSeeds + u.seed)")
    s"""WITH users AS (SELECT DISTINCT user_id FROM events),
       |dealt AS (
       |  SELECT u.seed,
       |   count(*) AS n_users,
       |   CAST(sum(CASE WHEN ($sh) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |     AS n_control
       |  FROM users, unnest(range(0, $nSeeds)) AS u(seed)
       |  GROUP BY 1)
       |SELECT CAST(seed AS INTEGER) AS seed, n_users, n_control,
       | CAST(2 * n_control - n_users AS DOUBLE)
       |   / sqrt(CAST(n_users AS DOUBLE)) AS z_srm,
       | abs(CAST(2 * n_control - n_users AS DOUBLE)
       |   / sqrt(CAST(n_users AS DOUBLE))) >= 3.0 AS srm_flag
       |FROM dealt ORDER BY seed""".stripMargin
  }
}

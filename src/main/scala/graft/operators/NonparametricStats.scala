package graft.operators

import graft.core.Tables
import graft.ext.{Sampling, TextAnalysis}
import graft.functions.ExactAgg.dsum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-free experiment statistics (q212–q214): Mann–Whitney U /
  * rank-biserial AUC, the two-sample Kolmogorov–Smirnov distance, and
  * Cohen's kappa over the language-ID confusion. The rank tests are the
  * robust complements of [[RobustStats]] q200's CUPED means: an experiment
  * readout on heavy-tailed per-event values (revenue-like metrics) reports
  * a rank test next to the t-statistic because one whale can hold the mean
  * hostage; kappa is the agreement audit run whenever two labelers (here:
  * the declared `lang` column vs the q31 marker classifier) disagree more
  * than chance explains.
  *
  * Exactness doctrine (q202 Spearman's): every heavy pass produces exact
  * BIGINT sums — tied ranks stay integer as 2·avgrank = rank_asc +
  * (n+1−rank_desc), ECDF gaps stay integer as |F₁ⁿᵘᵐ·n₂ − F₂ⁿᵘᵐ·n₁|,
  * kappa stays one integer ratio (N·agree − Σrm·cm)/(N² − Σrm·cm) — and
  * each reported statistic is a single fixed-shape IEEE expression over
  * those sums, mirrored term-for-term in the DuckDB oracle. */
object NonparametricStats {

  /** Hash-parity arm assignment (the q200 CUPED split): layout- and
    * engine-independent, so both engines agree on every user's arm. */
  private def arm: Column =
    when(pmod(Sampling.splitHash(col("user_id")), lit(2L)) === 0, "control")
      .otherwise("treatment")

  /** Max per-group row count the tie-corrected tests accept: the tie term
    * Σ(t³−t) ≤ n³ must stay inside int64, so n ≤ 2.09e6 rows/group. */
  private val MaxGroupN = 2000000L

  private def guardGroupSize(t: Tables, what: String): Unit = {
    val maxN = t.events.filter(col("value").isNotNull)
      .groupBy(col("event_type")).count()
      .agg(max(col("count"))).head().getLong(0)
    require(maxN <= MaxGroupN,
      s"$what: $maxN rows in one event_type exceeds the int64-safe " +
        s"$MaxGroupN (tie/rank moments are cubic); shard the group or " +
        "widen to hi/lo split sums")
  }

  /** q212: Mann–Whitney U per event_type between the two hash-assigned
    * arms (Mann & Whitney 1947), with the tie-corrected normal
    * approximation — the default significance readout for skewed metric
    * distributions. Reported: arm sizes, 2·U for the treatment arm (an
    * exact BIGINT — U itself can be half-integral under ties), the
    * rank-biserial AUC U/(n₁n₂) (= P(treatment draw > control draw) +
    * ½P(tie), the effect size direct from the ranks), and the tie-corrected
    * z-score.
    *
    * Exactness: 2·avgrank via the two-opposite-windows identity (q202);
    * 2·U_t = Σ_t 2·rank − n_t(n_t+1) is an exact BIGINT; the tie term
    * Σ(t³−t) is an exact BIGINT from the per-(event_type, value) count
    * frame; AUC and z are fixed IEEE expressions over those sums.
    *
    * Scale shape: both rank windows share ONE (event_type) partition
    * exchange; the arm roll-up reuses that partitioning; the tie frame is
    * a (event_type, value)-keyed aggregate rolled to one row per
    * event_type and broadcast into the final join. Group size is guarded
    * at 2e6 rows (cubic tie moments) — shard or hi/lo-split beyond. */
  def mannWhitney(t: Tables): DataFrame = {
    guardGroupSize(t, "mannWhitney")
    val ev = t.events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), arm.as("arm"))
    val part = Window.partitionBy(col("event_type"))
    val r2 = ev.select(col("event_type"), col("arm"),
      (rank().over(part.orderBy(col("value"))).cast("long") +
        count(lit(1)).over(part) + 1L -
        rank().over(part.orderBy(col("value").desc)).cast("long")).as("r2"))
    val arms = r2.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(when(col("arm") === "treatment", 1L).otherwise(0L)).as("n_t"),
      sum(when(col("arm") === "treatment", col("r2")).otherwise(lit(0L)))
        .as("s2t"))
    val ties = ev.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(sum(col("c") * col("c") * col("c") - col("c")).as("tie3"))
    val nT = col("n_t"); val nC = col("n") - col("n_t")
    val u2 = (col("s2t") - col("n_t") * (col("n_t") + 1L)).as("u2_treatment")
    val d = (c: Column) => c.cast("double")
    arms.join(broadcast(ties), Seq("event_type"))
      .select(col("event_type"), nC.as("n_control"), nT.as("n_treatment"),
        u2,
        (col("s2t") - col("n_t") * (col("n_t") + 1L)).cast("double")
          ./(lit(2.0) * d(nT) * d(nC)).as("auc_treatment"),
        ((col("s2t") - col("n_t") * (col("n_t") + 1L) - nT * nC)
          .cast("double") / lit(2.0) /
          sqrt(d(nT) * d(nC) / lit(12.0) *
            ((col("n") + 1L).cast("double") -
              d(col("tie3")) / (d(col("n")) * (col("n") - 1L).cast("double")))))
          .as("z_treatment"))
      .orderBy(col("event_type"))
  }

  /** The DuckDB mirror of [[mannWhitney]]. */
  def mannWhitneySql(): String = {
    val sh = Sampling.splitHashSql("user_id")
    s"""WITH ev AS (
       |  SELECT event_type, value,
       |   CASE WHEN ($sh) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
       |  FROM events WHERE value IS NOT NULL),
       |r AS (
       |  SELECT event_type, arm,
       |   CAST(rank() OVER (PARTITION BY event_type ORDER BY value)
       |     AS BIGINT)
       |   + count(*) OVER (PARTITION BY event_type) + 1
       |   - CAST(rank() OVER (PARTITION BY event_type ORDER BY value DESC)
       |     AS BIGINT) AS r2
       |  FROM ev),
       |arms AS (
       |  SELECT event_type, count(*) AS n,
       |   CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END)
       |     AS BIGINT) AS n_t,
       |   CAST(sum(CASE WHEN arm = 'treatment' THEN r2 ELSE 0 END)
       |     AS BIGINT) AS s2t
       |  FROM r GROUP BY 1),
       |ties AS (
       |  SELECT event_type, CAST(sum(c * c * c - c) AS BIGINT) AS tie3
       |  FROM (SELECT event_type, value, CAST(count(*) AS BIGINT) AS c
       |        FROM ev GROUP BY 1, 2)
       |  GROUP BY 1)
       |SELECT event_type,
       | n - n_t AS n_control, n_t AS n_treatment,
       | s2t - n_t * (n_t + 1) AS u2_treatment,
       | CAST(s2t - n_t * (n_t + 1) AS DOUBLE)
       |   / (2.0 * CAST(n_t AS DOUBLE) * CAST(n - n_t AS DOUBLE))
       |   AS auc_treatment,
       | CAST(s2t - n_t * (n_t + 1) - n_t * (n - n_t) AS DOUBLE) / 2.0
       |   / sqrt(CAST(n_t AS DOUBLE) * CAST(n - n_t AS DOUBLE) / 12.0
       |     * (CAST(n + 1 AS DOUBLE)
       |        - CAST(tie3 AS DOUBLE)
       |          / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
       |   AS z_treatment
       |FROM arms JOIN ties USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  /** q213: two-sample Kolmogorov–Smirnov distance per event_type between
    * the hash-assigned arms — the distribution-equality check an A/B
    * pipeline runs BEFORE trusting any mean/rank comparison (a sample-ratio
    * or instrumentation bug shows up here first). D = sup_v |F̂₁(v) −
    * F̂₂(v)|; also reported is the value at which the supremum is attained
    * (smallest such value — a deterministic tie-break), which localizes
    * WHERE the two distributions diverge.
    *
    * Exactness: the ECDF gap stays integer as |cum₁·n₂ − cum₂·n₁| (exact
    * BIGINT, bounded by n² — safe to n ≈ 3e9 rows/group); D is that
    * maximum over one final division by n₁·n₂.
    *
    * Scale shape: one (event_type, value) count aggregate (distinct values
    * ≪ rows), one cumulative window per event_type on that count frame,
    * one row_number pick — corpus touched once. */
  def ksTest(t: Tables): DataFrame = {
    val ev = t.events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value"), arm.as("arm"))
    val cnt = ev.groupBy(col("event_type"), col("value")).agg(
      sum(when(col("arm") === "control", 1L).otherwise(0L)).as("cc"),
      sum(when(col("arm") === "treatment", 1L).otherwise(0L)).as("ct"))
    val win = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col("event_type"))
    val cum = cnt.select(col("event_type"), col("value"),
      sum(col("cc")).over(win).as("f1"),
      sum(col("ct")).over(win).as("f2"),
      sum(col("cc")).over(tot).as("n_c"),
      sum(col("ct")).over(tot).as("n_t"))
    val diff = abs(col("f1") * col("n_t") - col("f2") * col("n_c"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(diff.desc, col("value").asc)
    cum.select(col("event_type"), col("value"), col("n_c"), col("n_t"),
        diff.as("d_num"),
        row_number().over(pick).as("rn"))
      .filter(col("rn") === 1)
      .select(col("event_type"),
        col("n_c").as("n_control"), col("n_t").as("n_treatment"),
        col("d_num"),
        (col("d_num").cast("double") /
          (col("n_c").cast("double") * col("n_t").cast("double")))
          .as("ks_d"),
        col("value").as("at_value"))
      .orderBy(col("event_type"))
  }

  /** The DuckDB mirror of [[ksTest]]. */
  def ksTestSql(): String = {
    val sh = Sampling.splitHashSql("user_id")
    s"""WITH ev AS (
       |  SELECT event_type, value,
       |   CASE WHEN ($sh) % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
       |  FROM events WHERE value IS NOT NULL),
       |cnt AS (
       |  SELECT event_type, value,
       |   CAST(sum(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
       |     AS cc,
       |   CAST(sum(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
       |     AS ct
       |  FROM ev GROUP BY 1, 2),
       |cum AS (
       |  SELECT event_type, value,
       |   CAST(SUM(cc) OVER (PARTITION BY event_type ORDER BY value
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |     AS f1,
       |   CAST(SUM(ct) OVER (PARTITION BY event_type ORDER BY value
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |     AS f2,
       |   CAST(SUM(cc) OVER (PARTITION BY event_type) AS BIGINT) AS n_c,
       |   CAST(SUM(ct) OVER (PARTITION BY event_type) AS BIGINT) AS n_t
       |  FROM cnt),
       |picked AS (
       |  SELECT event_type, value, n_c, n_t,
       |   abs(f1 * n_t - f2 * n_c) AS d_num,
       |   row_number() OVER (PARTITION BY event_type
       |     ORDER BY abs(f1 * n_t - f2 * n_c) DESC, value ASC) AS rn
       |  FROM cum)
       |SELECT event_type, n_c AS n_control, n_t AS n_treatment, d_num,
       | CAST(d_num AS DOUBLE)
       |   / (CAST(n_c AS DOUBLE) * CAST(n_t AS DOUBLE)) AS ks_d,
       | value AS at_value
       |FROM picked WHERE rn = 1
       |ORDER BY event_type""".stripMargin
  }

  /** Max per-source doc count [[kappa]] accepts: N² must stay in int64. */
  private val KappaMaxN = 3000000000L

  /** q214: Cohen's kappa per source between the declared `lang` column and
    * the q31 marker classifier (Cohen 1960) — chance-corrected agreement,
    * the audit a labeling pipeline runs on every pair of annotators (here:
    * the upstream metadata vs the content-based classifier; a source whose
    * kappa is near 0 has metadata no better than guessing, and its `lang`
    * column must not be used as a training filter).
    *
    * Exactness: kappa = (p_o − p_e)/(1 − p_e) over the multi-class
    * confusion reduces to ONE integer ratio (N·agree − Σ_l rm_l·cm_l) /
    * (N² − Σ_l rm_l·cm_l) — numerator and denominator are exact BIGINTs
    * from the cell counts; p_o and p_e are each one division.
    *
    * Scale shape: one corpus pass → (source, labeled, predicted) cell
    * counts (≤ source·lang² rows); agreement, marginals, and the expected-
    * agreement join all run on that tiny cell frame. Per-source N is
    * guarded at 3e9 (N² int64 bound). */
  def kappa(t: Tables): DataFrame = {
    val scored = t.documents
      .select(col("source"), col("lang").as("labeled"),
        TextAnalysis.markerOcc("the").as("score_en"),
        TextAnalysis.markerOcc("table").as("score_fr"),
        TextAnalysis.markerOcc("data").as("score_es"))
      .withColumn("predicted", TextAnalysis.langDecision)
      .select(col("source"), col("labeled"), col("predicted"))
    val cells = scored.groupBy(col("source"), col("labeled"), col("predicted"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // lang²·source rows; feeds three roll-ups
    val agree = cells.groupBy(col("source")).agg(
      sum(col("c")).as("n_docs"),
      sum(when(col("labeled") === col("predicted"), col("c"))
        .otherwise(lit(0L))).as("n_agree"))
    val rowm = cells.groupBy(col("source"), col("labeled"))
      .agg(sum(col("c")).as("rm"))
    val colm = cells.groupBy(col("source"), col("predicted"))
      .agg(sum(col("c")).as("cm"))
    val pem = rowm.join(colm,
        rowm("source") === colm("source") &&
          rowm("labeled") === colm("predicted"))
      .groupBy(rowm("source").as("source"))
      .agg(sum(col("rm") * col("cm")).as("pem"))
    val out = agree.join(broadcast(pem), Seq("source"))
    val maxN = out.agg(max(col("n_docs"))).head().getLong(0)
    require(maxN <= KappaMaxN,
      s"kappa: $maxN docs in one source exceeds the int64-safe $KappaMaxN " +
        "(N² expected-agreement term); shard the source or widen to " +
        "hi/lo split sums")
    out.select(col("source"), col("n_docs"), col("n_agree"),
        (col("n_agree").cast("double") / col("n_docs").cast("double"))
          .as("p_observed"),
        (col("pem").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")))
          .as("p_expected"),
        ((col("n_docs") * col("n_agree") - col("pem")).cast("double") /
          (col("n_docs") * col("n_docs") - col("pem")).cast("double"))
          .as("kappa"))
      .orderBy(col("source"))
  }

  /** The DuckDB mirror of [[kappa]] — the q31 marker-score expressions
    * with `source` retained, then the cell/marginal roll-ups. */
  def kappaSql(): String =
    """WITH scored AS (
      |  SELECT source, lang AS labeled,
      |   CAST((length(' ' || text || ' ')
      |     - length(replace(' ' || text || ' ', ' the ', ''))) / 5
      |     AS INTEGER) AS score_en,
      |   CAST((length(' ' || text || ' ')
      |     - length(replace(' ' || text || ' ', ' table ', ''))) / 7
      |     AS INTEGER) AS score_fr,
      |   CAST((length(' ' || text || ' ')
      |     - length(replace(' ' || text || ' ', ' data ', ''))) / 6
      |     AS INTEGER) AS score_es
      |  FROM documents),
      |perdoc AS (
      |  SELECT source, labeled,
      |   CASE WHEN score_en >= score_fr AND score_en >= score_es THEN 'en'
      |        WHEN score_fr >= score_es THEN 'fr'
      |        ELSE 'es' END AS predicted
      |  FROM scored),
      |cells AS (
      |  SELECT source, labeled, predicted, CAST(count(*) AS BIGINT) AS c
      |  FROM perdoc GROUP BY 1, 2, 3),
      |agree AS (
      |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
      |   CAST(sum(CASE WHEN labeled = predicted THEN c ELSE 0 END)
      |     AS BIGINT) AS n_agree
      |  FROM cells GROUP BY 1),
      |rowm AS (
      |  SELECT source, labeled AS l, CAST(sum(c) AS BIGINT) AS rm
      |  FROM cells GROUP BY 1, 2),
      |colm AS (
      |  SELECT source, predicted AS l, CAST(sum(c) AS BIGINT) AS cm
      |  FROM cells GROUP BY 1, 2),
      |pem AS (
      |  SELECT rowm.source AS source, CAST(sum(rm * cm) AS BIGINT) AS pem
      |  FROM rowm JOIN colm ON rowm.source = colm.source AND rowm.l = colm.l
      |  GROUP BY 1)
      |SELECT source, n_docs, n_agree,
      | CAST(n_agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p_observed,
      | CAST(pem AS DOUBLE)
      |   / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS p_expected,
      | CAST(n_docs * n_agree - pem AS DOUBLE)
      |   / CAST(n_docs * n_docs - pem AS DOUBLE) AS kappa
      |FROM agree JOIN pem USING (source)
      |ORDER BY source""".stripMargin

  /** Emit a Scala Double as a bit-exact DuckDB DOUBLE literal: plain
    * decimals parse as DECIMAL(18,17) and convert one ulp off (the q206
    * lesson), so force the exponent form. `Double.toString` is the
    * shortest round-trip representation — parsing it back yields the
    * identical bits in both engines. */
  private def dLit(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** q217: rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    * per-source document rankings — by token count and by char count —
    * truncated at depth K with persistence p = ½. RBO is THE comparator
    * for indefinite rankings: top-weighted (disagreement at rank 2 costs
    * more than at rank 200), defined for non-conjoint lists, and bounded
    * [0,1]. A curation pipeline uses it to answer "do these two length
    * signals induce the same 'biggest documents' list" before swapping
    * one for the cheaper one in a cap rule — the ranking-level complement
    * of q202's value-level Spearman ρ.
    *
    * With p = ½ every weight (1−p)p^(d−1) = 2^(−d) is an exact binary
    * double; overlap-at-depth counts are exact BIGINTs (doc in both
    * prefixes of depth d iff max(rankA, rankB) ≤ d — one cumulative test,
    * no prefix-set intersection); RBO is a FIXED-ORDER literal chain
    * Σ_{d=1..K} 2^(−d)·ov_d/d — identical term shape and association in
    * both engines, never a SUM whose order the engine chooses.
    *
    * Scale shape: one narrow pass → per-doc signal frame; both rank
    * windows share ONE (source) partition exchange; the K overlap
    * counters ride one conditional aggregate over that partitioning. */
  def rbo(t: Tables, depth: Int = 20): DataFrame = {
    val part = Window.partitionBy(col("source"))
    val perDoc = t.documents.select(col("source"), col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("v_tokens"),
      col("n_chars").cast("long").as("v_chars"))
    val ra = row_number().over(part.orderBy(col("v_tokens").desc, col("doc_id")))
    val rb = row_number().over(part.orderBy(col("v_chars").desc, col("doc_id")))
    val m = perDoc.select(col("source"), greatest(ra, rb).cast("long").as("m"))
    val ovCols = (1 to depth).map(d =>
      sum(when(col("m") <= d.toLong, 1L).otherwise(0L)).as(s"ov_$d"))
    val ov = m.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), ovCols: _*)
    val rboExpr = (1 to depth).map { d =>
      lit(math.pow(0.5, d) / d) * col(s"ov_$d").cast("double")
    }.reduceLeft(_ + _)
    ov.select(col("source"), col("n_docs"),
        col(s"ov_${depth / 2}").as("overlap_at_half"),
        col(s"ov_$depth").as("overlap_at_k"),
        rboExpr.as("rbo"))
      .orderBy(col("source"))
  }

  /** The DuckDB mirror of [[rbo]]. */
  def rboSql(depth: Int = 20): String = {
    val ovDefs = (1 to depth).map(d =>
      s"CAST(sum(CASE WHEN m <= $d THEN 1 ELSE 0 END) AS BIGINT) AS ov_$d")
      .mkString(",\n      |   ")
    val chain = (1 to depth).map { d =>
      s"${dLit(math.pow(0.5, d) / d)} * CAST(ov_$d AS DOUBLE)"
    }.mkString("\n      |   + ")
    s"""WITH perdoc AS (
      |  SELECT source, doc_id,
      |   CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
      |     AS v_tokens,
      |   CAST(n_chars AS BIGINT) AS v_chars
      |  FROM documents),
      |r AS (
      |  SELECT source, greatest(
      |   row_number() OVER (PARTITION BY source
      |     ORDER BY v_tokens DESC, doc_id),
      |   row_number() OVER (PARTITION BY source
      |     ORDER BY v_chars DESC, doc_id)) AS m
      |  FROM perdoc),
      |ov AS (
      |  SELECT source, count(*) AS n_docs,
      |   $ovDefs
      |  FROM r GROUP BY 1)
      |SELECT source, n_docs,
      | ov_${depth / 2} AS overlap_at_half, ov_$depth AS overlap_at_k,
      | $chain AS rbo
      |FROM ov ORDER BY source""".stripMargin
  }

  /** q227: ROC curve + exact AUC for `value` as a one-feature classifier
    * of the purchase event — the eval a pipeline runs on ANY scored
    * filter (quality score, dedup similarity, perplexity) before picking
    * its operating threshold: TPR/FPR at a grid of thresholds plus the
    * threshold-free AUC. q212's Mann–Whitney U IS the AUC up to scaling
    * (AUC = U/(P·N)); this query reports the curve around it.
    *
    * Everything heavy is exact: scores quantize to micro-units (the
    * repo-wide 1e6 convention), the per-score count frame is the q213
    * ECDF shuffle, 2U accumulates as one BIGINT over that frame
    * (2U = Σ_v p_v·(2·negs_below + negs_at)), and each curve point is a
    * conditional sum over the count frame against a broadcast 21-row
    * threshold grid (thresholds are integer-spaced between the observed
    * min and max). P, N, lo, hi ride the driver-scalar pattern (1-row
    * aggregate, the q224 doctrine); 2·P·N is guarded against int64. */
  def rocAuc(t: Tables, positive: String = "purchase",
      nThr: Int = 20): DataFrame = {
    val scored = t.events.select(
      round(col("value") * lit(1000000), 0).cast("long").as("li"),
      when(col("event_type") === positive, 1L).otherwise(0L).as("pos"))
    val cnt = scored.groupBy(col("li"))
      .agg(sum(col("pos")).as("n_pos"), sum(lit(1L) - col("pos")).as("n_neg"))
    val tr = cnt.agg(sum(col("n_pos")), sum(col("n_neg")),
      min(col("li")), max(col("li"))).head()
    val (p, nn, lo, hi) =
      (tr.getLong(0), tr.getLong(1), tr.getLong(2), tr.getLong(3))
    require(p > 0 && nn > 0, s"rocAuc needs both classes (P=$p, N=$nn)")
    require(p <= Long.MaxValue / (2L * nn),
      s"rocAuc: 2·P·N exceeds int64 (P=$p, N=$nn)")
    val (pD, nD) = (p.toDouble, nn.toDouble)
    val u2 = cnt
      .withColumn("cum_neg_le",
        sum(col("n_neg")).over(Window.orderBy(col("li"))))
      .agg(sum(col("n_pos") *
        (lit(2L) * (col("cum_neg_le") - col("n_neg")) + col("n_neg")))
        .as("u2"))
    val thrDf = t.spark.range(1).select(
      explode(array((0 to nThr).map(i => struct(lit(i).as("i"),
        lit(lo + (hi - lo) * i / nThr).as("thr"))): _*)).as("kv"))
      .select(col("kv.i").as("i"), col("kv.thr").as("thr"))
    cnt.join(broadcast(thrDf), col("li") >= col("thr"))
      .groupBy(col("i"), col("thr"))
      .agg(sum(col("n_pos")).as("tp"), sum(col("n_neg")).as("fp"))
      .crossJoin(broadcast(u2))
      .select(col("i"), col("thr").as("thr_micro"),
        col("tp"), col("fp"),
        (lit(p) - col("tp")).as("fn"), (lit(nn) - col("fp")).as("tn"),
        (col("tp").cast("double") / lit(pD)).as("tpr"),
        (col("fp").cast("double") / lit(nD)).as("fpr"),
        (col("u2").cast("double") / lit(2.0 * pD * nD)).as("auc"))
      .orderBy(col("i"))
  }

  /** The DuckDB mirror of [[rocAuc]] — totals/bounds come from SQL CTEs
    * instead of the driver scalars, same integer curve and 2U. */
  def rocAucSql(positive: String = "purchase", nThr: Int = 20): String =
    s"""WITH scored AS (
       |  SELECT CAST(round(value * 1000000, 0) AS BIGINT) AS li,
       |   CASE WHEN event_type = ${graft.core.Sql.lit(positive)} THEN 1 ELSE 0 END AS pos
       |  FROM events),
       |cnt AS (
       |  SELECT li, CAST(sum(pos) AS BIGINT) AS n_pos,
       |   CAST(sum(1 - pos) AS BIGINT) AS n_neg
       |  FROM scored GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(n_pos) AS BIGINT) AS p,
       |   CAST(sum(n_neg) AS BIGINT) AS nn,
       |   min(li) AS lo, max(li) AS hi
       |  FROM cnt),
       |cum AS (
       |  SELECT li, n_pos, n_neg,
       |   CAST(sum(n_neg) OVER (ORDER BY li) AS BIGINT) AS cum_neg_le
       |  FROM cnt),
       |u AS (
       |  SELECT CAST(sum(n_pos * (2 * (cum_neg_le - n_neg) + n_neg))
       |     AS BIGINT) AS u2
       |  FROM cum),
       |thr AS (
       |  SELECT CAST(t.i AS INTEGER) AS i,
       |   lo + ((hi - lo) * t.i) // $nThr AS thr
       |  FROM tot, unnest(range(0, ${nThr + 1})) AS t(i)),
       |curve AS (
       |  SELECT i, thr, CAST(sum(n_pos) AS BIGINT) AS tp,
       |   CAST(sum(n_neg) AS BIGINT) AS fp
       |  FROM thr JOIN cnt ON li >= thr GROUP BY 1, 2)
       |SELECT i, thr AS thr_micro, tp, fp,
       | p - tp AS fn, nn - fp AS tn,
       | CAST(tp AS DOUBLE) / CAST(p AS DOUBLE) AS tpr,
       | CAST(fp AS DOUBLE) / CAST(nn AS DOUBLE) AS fpr,
       | CAST(u2 AS DOUBLE) / (2.0 * CAST(p AS DOUBLE) * CAST(nn AS DOUBLE))
       |   AS auc
       |FROM curve CROSS JOIN tot CROSS JOIN u
       |ORDER BY i""".stripMargin

  /** q230: reliability diagram + expected calibration error for the q227
    * score — the calibration half of a classifier audit (ROC asks "does
    * the ranking work", this asks "does the score's MAGNITUDE mean what
    * it claims"). Scores min-max-normalize to [0,1] confidences, rows fall
    * into `nBuckets` equal-width integer buckets, and each bucket reports
    * mean confidence vs empirical positive rate; ECE = Σ (n_b/N)·
    * |rate_b − conf_b| (Naeini et al. 2015).
    *
    * Exactness: bucket ids are one integer expression ((li−lo)·B DIV
    * span); per-row confidences are a single exact-operand IEEE division;
    * bucket sums ride dsum; the ECE fold is a dsum over the ≤ B-row
    * bucket frame, so no float sum ever depends on row order. lo/hi ride
    * the driver-scalar pattern (q224/q227). */
  def reliabilityDiagram(t: Tables, positive: String = "purchase",
      nBuckets: Int = 10): DataFrame = {
    val scored = t.events.select(
      round(col("value") * lit(1000000), 0).cast("long").as("li"),
      when(col("event_type") === positive, 1L).otherwise(0L).as("pos"))
    val br = scored.agg(min(col("li")), max(col("li"))).head()
    val (lo, hi) = (br.getLong(0), br.getLong(1))
    require(hi > lo, s"reliabilityDiagram needs score spread (lo=$lo hi=$hi)")
    val span = hi - lo + 1
    val agg = scored
      .select(
        expr(s"CAST(((li - $lo) * $nBuckets) div $span AS INT)").as("b"),
        col("pos"),
        ((col("li") - lit(lo)).cast("double") / lit((hi - lo).toDouble))
          .as("conf"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        dsum(col("conf")).as("conf_sum"))
      .select(col("b"), col("n"), col("n_pos"),
        round(col("conf_sum") / col("n").cast("double"), 6).as("mean_conf"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))
    val tot = agg.agg(sum(col("n")).as("n_all"))
    val ece = agg.crossJoin(broadcast(tot))
      .agg(dsum(abs(col("pos_rate") - col("mean_conf")) *
        col("n").cast("double") / col("n_all").cast("double")).as("ece"))
    agg.crossJoin(broadcast(ece)).orderBy(col("b"))
  }

  /** The DuckDB mirror of [[reliabilityDiagram]]. */
  def reliabilityDiagramSql(positive: String = "purchase",
      nBuckets: Int = 10): String = {
    val O = graft.functions.ExactAgg.Sql
    s"""WITH scored AS (
       |  SELECT CAST(round(value * 1000000, 0) AS BIGINT) AS li,
       |   CASE WHEN event_type = ${graft.core.Sql.lit(positive)} THEN 1 ELSE 0 END AS pos
       |  FROM events),
       |bounds AS (SELECT min(li) AS lo, max(li) AS hi FROM scored),
       |rows0 AS (
       |  SELECT CAST(((li - lo) * $nBuckets) // (hi - lo + 1) AS INTEGER)
       |     AS b,
       |   pos, CAST(li - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE) AS conf
       |  FROM scored CROSS JOIN bounds),
       |agg AS (
       |  SELECT b, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
       |   round(${O.dsum("conf")} / CAST(count(*) AS DOUBLE), 6)
       |     AS mean_conf,
       |   CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate
       |  FROM rows0 GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM agg),
       |e AS (
       |  SELECT ${O.dsum(
             "abs(pos_rate - mean_conf) * CAST(n AS DOUBLE) " +
               "/ CAST(n_all AS DOUBLE)")} AS ece
       |  FROM agg CROSS JOIN tot)
       |SELECT b, n, n_pos, mean_conf, pos_rate, ece
       |FROM agg CROSS JOIN e ORDER BY b""".stripMargin
  }
}

package graft.ext

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dominant principal component of the embedding covariance by power
  * iteration — the spectral primitive behind embedding whitening, ABBA
  * drift direction detection, and SVD-based index build (the first step
  * of "what single direction explains this corpus"). Reference scope ends
  * at scalar aggregates; this is the natural linear-algebra extension of
  * q136's covariance.
  *
  * Bit-portability doctrine (same as [[graft.operators.Graph]] PageRank):
  * floating-point mat-vec sums are partition-order-dependent, so the
  * iteration runs entirely in fixed-point BIGINTs — the covariance
  * quantized to 1e-9 units, the vector carried at 1e6 scale, every
  * round's renormalization an exact integer sign/abs/div — and DuckDB
  * replays the unrolled rounds bit-for-bit. Magnitudes bounded:
  * |m| ≤ ~1e9·|cov|, |v| ≤ ~1e6, |w| ≤ dim·|m|·|v| < 2^57 for dim 64.
  *
  * Scale posture: the corpus is touched exactly once (q136's one-pass
  * Gram aggregate); the iteration runs on the dim²-sized matrix frame —
  * driver rounds over vocabulary-sized data, the BPE/PageRank shape. At
  * 100 TB the embedding count grows; dim² does not.
  */
object Spectral {

  val VecScale = 1000000L  // 10^6 fixed-point eigenvector components
  val CovScale = 1000000000L // 10^9 quantized covariance entries

  /** sign(x) as an exact integer CASE (Spark signum returns double). */
  private def isign(c: Column): Column =
    when(c < 0, lit(-1L)).when(c > 0, lit(1L)).otherwise(lit(0L))

  /** q163: `iters` synchronous power-iteration rounds from the all-ones
    * start vector. Output: one row per dimension with the scaled
    * component, the unit-ish double component, and the dominant
    * eigenvalue estimate (max |Cv| of the final round, descaled). */
  def pcaPowerIteration(t: Tables, dim: Int = 64, iters: Int = 12): DataFrame = {
    val cov = Similarity.embeddingCovariance(t, dim)
      .select(col("i"), col("j"),
        round(col("cov") * CovScale, 0).cast("long").as("m"))
    // mirror the upper triangle to the full symmetric matrix
    val m = cov.unionByName(
        cov.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("m")))
      .localCheckpoint() // iterated over

    // Overflow guard — fail loudly instead of corrupting the iteration:
    // each round bounds |w| ≤ dim·max|m|·max|v| with max|v| ≤ VecScale (the
    // renormalization divides back to ≤ 10^6), so the LongType accumulator
    // is safe iff dim·max|m|·VecScale < 2^63. One 1-row aggregate over the
    // dim²-sized matrix frame — bounded driver work, not a data collect.
    val maxAbsRow = m.agg(max(abs(col("m")))).head()
    val maxAbsM = if (maxAbsRow.isNullAt(0)) 0L else maxAbsRow.getLong(0)
    require(
      maxAbsM <= Long.MaxValue / VecScale / math.max(dim.toLong, 1L),
      s"pcaPowerIteration: dim=$dim with max|cov_scaled|=$maxAbsM would " +
        s"overflow the BIGINT mat-vec accumulator " +
        s"(dim*max|m|*$VecScale >= 2^63); coarsen CovScale or split the " +
        "accumulation into hi/lo halves as embeddingCovariance does")

    var v = m.select(col("i").as("j")).distinct()
      .withColumn("v", lit(VecScale))
      .localCheckpoint()
    var lastMax: DataFrame = null
    for (_ <- 1 to iters) {
      val w = m.join(v, "j")
        .groupBy(col("i"))
        .agg(sum(col("m") * col("v")).as("w"))
      val mx = w.agg(max(abs(col("w"))).as("mx"))
      lastMax = mx
      v = w.crossJoin(broadcast(mx))
        .select(col("i").as("j"),
          (isign(col("w")) *
            expr(s"abs(w) div greatest(mx div $VecScale, 1L)")).as("v"))
        .localCheckpoint() // cut the iterated lineage
    }
    v.crossJoin(broadcast(lastMax))
      .select(
        col("j").as("dim"), col("v").as("v_scaled"),
        round(col("v").cast("double") / VecScale, 6).as("component"),
        round(col("mx").cast("double") / (VecScale * CovScale).toDouble, 6)
          .as("eigenvalue_est"))
      .orderBy(col("dim"))
  }

  /** DuckDB mirror of [[pcaPowerIteration]] — q136's covariance CTE, the
    * same 1e-9 quantization, and the rounds unrolled as MATERIALIZED CTE
    * chains (each round is referenced by the next twice — materialize or
    * inlining goes exponential, the q117 BPE lesson). DuckDB promotes
    * BIGINT sums to HUGEINT; all values stay < 2^63 so the arithmetic is
    * identical, with one final cast back to BIGINT. */
  def pcaPowerIterationSql(dim: Int = 64, iters: Int = 12): String = {
    val rounds = (1 to iters).map { r =>
      val pv = if (r == 1) "v0" else s"v${r - 1}"
      s"""w$r AS MATERIALIZED (
         |  SELECT m.i, sum(m.m * v.v) AS w
         |  FROM m JOIN $pv v ON v.j = m.j GROUP BY 1),
         |x$r AS MATERIALIZED (SELECT max(abs(w)) AS mx FROM w$r),
         |v$r AS MATERIALIZED (
         |  SELECT i AS j,
         |    (CASE WHEN w < 0 THEN -1 WHEN w > 0 THEN 1 ELSE 0 END)
         |      * (abs(w) // greatest(mx // $VecScale, 1)) AS v
         |  FROM w$r CROSS JOIN x$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(u.i AS INTEGER) AS i,
       |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS li
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       |nn AS (SELECT count(*) AS n, CAST(count(*) AS DOUBLE) AS nd FROM embeddings),
       |s AS (SELECT i, CAST(sum(li) AS DOUBLE) AS sraw FROM e GROUP BY 1),
       |p AS (SELECT a.i AS i, b.i AS j,
       |        CAST(sum((a.li * b.li) >> 26) AS DOUBLE) * 67108864.0
       |          + CAST(sum((a.li * b.li) & 67108863) AS DOUBLE) AS graw
       |      FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
       |      GROUP BY 1, 2),
       |cov AS MATERIALIZED (
       |  SELECT p.i - 1 AS i, p.j - 1 AS j,
       |    CAST(round((p.graw / 1000000000000.0
       |        - (sa.sraw / 1000000.0) * (sb.sraw / 1000000.0) / nn.nd)
       |      / (nn.nd - 1.0) * $CovScale, 0) AS BIGINT) AS m
       |  FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
       |  CROSS JOIN nn),
       |m AS MATERIALIZED (
       |  SELECT i, j, m FROM cov
       |  UNION ALL SELECT j AS i, i AS j, m FROM cov WHERE i <> j),
       |v0 AS (SELECT DISTINCT i AS j, CAST($VecScale AS BIGINT) AS v FROM m),
       |$rounds
       |SELECT v.j AS dim, CAST(v.v AS BIGINT) AS v_scaled,
       |  round(CAST(v.v AS DOUBLE) / $VecScale, 6) AS component,
       |  round(CAST(x.mx AS DOUBLE) / ${(VecScale * CovScale).toDouble}, 6)
       |    AS eigenvalue_est
       |FROM v$iters v CROSS JOIN x$iters x
       |ORDER BY dim""".stripMargin
  }

  /** Squared Euclidean distance between two equal-length long arrays —
    * exact integer arithmetic, order-free (commutative adds). Native
    * codegen'd loop ([[graft.functions.LongSqDist]]); the composable
    * `aggregate(zip_with(...))` form walked an interpreted HOF tree per
    * element on every assignment row (callers register the function). */
  private def sqDist(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.sqDistLong(a, b)

  /** q175: k-means clustering report — Lloyd's algorithm over the
    * embedding corpus, run entirely in 1e6-scale fixed-point BIGINTs (the
    * [[pcaPowerIteration]] portability doctrine applied to clustering):
    * integer squared-Euclidean assignment with (distance, centroid-id)
    * tiebreak, integer floor-division centroid means, empty clusters
    * keeping their previous centroid. Seeds are the deterministic
    * id-strided coverage sample ([[Similarity.ivfBuildIndexRefined]]'s
    * seeding; the one driver-side `count()` is the index-build boundary).
    * Output: per-cluster cardinality, exact inertia (reassembled from a
    * hi/lo 26-bit split so the BIGINT sum can never overflow — the
    * embeddingCovariance pattern), and mean member distance.
    *
    * Scale shape: each round is one broadcast of k centroid arrays against
    * the corpus (narrow n·k distance evaluation, one row_number window
    * keyed by vec_id) plus one (cid, dim)-keyed aggregate — rounds × two
    * shuffles, nothing quadratic, centroid state always k·dim rows. The
    * quantized corpus is localCheckpoint'd once and re-read per round. */
  def kmeansReport(t: Tables, k: Int = 8, iters: Int = 3): DataFrame =
    kmeansAssign(t, k, iters)
      .groupBy(col("cid"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(shiftright(col("dist"), 26)).as("hi"),
        sum(col("dist").bitwiseAND(lit(67108863L))).as("lo"))
      .select(col("cid"), col("n_members"),
        (col("hi").cast("double") * lit(67108864.0) + col("lo").cast("double"))
          .as("inertia"))
      .withColumn("mean_dist",
        round(col("inertia") / col("n_members").cast("double") /
          lit((VecScale * VecScale).toDouble), 6))
      .orderBy(col("cid"))

  /** The final Lloyd assignment frame (vec_id, qv, cid, dist) after
    * `iters` rounds — the shared core of [[kmeansReport]] (q175, which
    * rolls it up per cluster) and [[clusterExemplars]] (q183, which ranks
    * within each cluster). Same plan as the pre-split q175 body. */
  def kmeansAssign(t: Tables, k: Int = 8, iters: Int = 3): DataFrame =
    kmeansAssignTop(t, k, iters, topRanks = 1).drop("rn")

  /** [[kmeansAssign]] keeping the `topRanks` nearest centroids per vector
    * (with their rank in `rn`) instead of only the winner — rank 2 is the
    * runner-up centroid the simplified-silhouette eval (q231) needs. */
  private[graft] def kmeansAssignTop(t: Tables, k: Int, iters: Int,
      topRanks: Int): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val qv = t.embeddings
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * VecScale, 0).cast("long")).as("qv"))
      .localCheckpoint() // iterated over; avoid re-reading parquet per round
    // Index-build boundary: one pass for the seed stride + the overflow
    // guard (|dist| ≤ dim·(2·max|q|)² and |mean-sum| ≤ n·max|q| must stay
    // inside BIGINT — fail loudly, the pcaPowerIteration contract).
    val head = qv
      .agg(count(lit(1)).as("n"),
        max(aggregate(col("qv"), lit(0L), (m, x) => greatest(m, abs(x))))
          .as("maxq"),
        max(size(col("qv"))).as("dim"))
      .head()
    val n = head.getLong(0)
    val maxQ = if (head.isNullAt(1)) 0L else head.getLong(1)
    val dim = if (head.isNullAt(2)) 1 else head.getInt(2)
    require(maxQ <= 0 || (maxQ < math.sqrt(Long.MaxValue.toDouble / (4.0 * dim))
      && maxQ < Long.MaxValue / math.max(n, 1L)),
      s"kmeansReport: max|q|=$maxQ at dim=$dim, n=$n would overflow the " +
        "BIGINT distance/mean accumulators; coarsen VecScale")
    val stride = math.max(1L, n / k)
    var cents = qv.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")) // bare limit() is partition-order dependent
      .limit(k)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
      .localCheckpoint()
    def assign(c: DataFrame, ranks: Int): DataFrame = {
      val w = Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
      qv.crossJoin(broadcast(c)) // k rows — a broadcast nested loop by design
        .select(col("vec_id"), col("qv"), col("cid"),
          sqDist(col("qv"), col("cv")).as("dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= ranks)
    }
    for (_ <- 1 to iters) {
      val means = assign(cents, 1)
        .select(col("cid"), posexplode(col("qv")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("c"))
        // portable floor division: (s − pmod(s, c)) is exactly divisible
        .select(col("cid"), col("pos"),
          expr("(s - pmod(s, c)) div c").as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("newcv"))
      cents = cents.as("c").join(means.as("u"), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("u.newcv"), col("c.cv")).as("cv"))
        .localCheckpoint() // cut the iterated lineage
    }
    assign(cents, topRanks)
  }

  /** q231: simplified silhouette per k-means cluster (the centroid-based
    * silhouette of Hruschka et al. — a(x) = distance to own centroid,
    * b(x) = distance to the runner-up centroid, s = (b−a)/max(a,b)) —
    * the cluster-quality gate a curation pipeline runs before trusting
    * q175/q183 clusters to drive dedup budgets or exemplar labeling.
    * True silhouette is all-pairs (quadratic); the centroid form is the
    * standard scale substitute and needs nothing beyond the distances the
    * assignment already computed.
    *
    * Exactness: a and b are the exact integer squared distances of the
    * Lloyd assignment; s is one IEEE division of exact operands (0 when
    * a = b = 0); the per-cluster mean rides dsum. */
  def kmeansSilhouette(t: Tables, k: Int = 8, iters: Int = 3): DataFrame = {
    // with k = 1 there is no rank-2 runner-up: b is null everywhere,
    // greatest() ignores the null and the silhouette silently degenerates —
    // fail loudly instead (the silhouette of a single cluster is undefined)
    require(k >= 2, s"kmeansSilhouette: k must be >= 2, got $k")
    import graft.functions.ExactAgg.dsum
    val top2 = kmeansAssignTop(t, k, iters, topRanks = 2)
    val piv = top2.groupBy(col("vec_id"))
      .agg(max(when(col("rn") === 1, col("cid"))).as("cid"),
        max(when(col("rn") === 1, col("dist"))).as("a"),
        max(when(col("rn") === 2, col("dist"))).as("b"))
    val s = when(greatest(col("a"), col("b")) === 0, lit(0.0))
      .otherwise((col("b") - col("a")).cast("double") /
        greatest(col("a"), col("b")).cast("double"))
    piv.select(col("cid"), s.as("sil"))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_members"), dsum(col("sil")).as("sil_sum"))
      .select(col("cid"), col("n_members"),
        round(col("sil_sum") / col("n_members").cast("double"), 6)
          .as("mean_silhouette"))
      .orderBy(col("cid"))
  }

  /** The DuckDB mirror of [[kmeansSilhouette]] — the unrolled Lloyd CTEs
    * of q175 plus a rank-2 pivot over the final distance frame. */
  def kmeansSilhouetteSql(k: Int = 8, iters: Int = 3): String = {
    require(k >= 2, s"kmeansSilhouetteSql: k must be >= 2, got $k")
    val O = graft.functions.ExactAgg.Sql
    s"""WITH ${kmeansCtesSql(k, iters)},
       |top2 AS (
       |  SELECT vec_id, cid, dist,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |  FROM fd),
       |piv AS (
       |  SELECT vec_id,
       |   max(CASE WHEN rn = 1 THEN cid END) AS cid,
       |   max(CASE WHEN rn = 1 THEN dist END) AS a,
       |   max(CASE WHEN rn = 2 THEN dist END) AS b
       |  FROM top2 WHERE rn <= 2 GROUP BY 1),
       |sil AS (
       |  SELECT cid,
       |   CASE WHEN greatest(a, b) = 0 THEN 0.0e0
       |     ELSE CAST(b - a AS DOUBLE) / CAST(greatest(a, b) AS DOUBLE)
       |   END AS sil
       |  FROM piv)
       |SELECT cid, count(*) AS n_members,
       | round(${O.dsum("sil")} / CAST(count(*) AS DOUBLE), 6)
       |   AS mean_silhouette
       |FROM sil GROUP BY 1 ORDER BY cid""".stripMargin
  }

  /** q183: cluster exemplar selection — the m most CENTRAL members of
    * every k-means cluster (smallest distance to the final centroid,
    * vec_id tiebreak). The prototype-picking step of cluster-then-curate
    * pipelines (SemDeDup-style semantic curation, eval-set seeding,
    * per-cluster labeling budgets): k·m exemplars that summarize the
    * corpus geometry, each annotated with its distance and label.
    *
    * Scale shape: [[kmeansAssign]]'s rounds (broadcast k-row centroids +
    * one (cid,dim) aggregate each) plus ONE rank window keyed by cid and a
    * broadcast join of the k·m winners back to the labels — nothing new
    * touches the corpus more than once. */
  def clusterExemplars(t: Tables, k: Int = 8, iters: Int = 3,
                       m: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("cid")).orderBy(col("dist"), col("vec_id"))
    val ex = kmeansAssign(t, k, iters)
      .select(col("vec_id"), col("cid"), col("dist"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= m)
    t.embeddings.select(col("vec_id"), col("label"))
      .join(broadcast(ex), Seq("vec_id")) // k·m rows
      .select(col("cid"), col("rk").as("rank_in_cluster"), col("vec_id"),
        col("label"),
        round(col("dist").cast("double") /
          lit((VecScale * VecScale).toDouble), 6).as("dist_centroid"))
      .orderBy(col("cid"), col("rank_in_cluster"))
  }

  /** DuckDB mirror of [[kmeansReport]] — the quantized per-dimension
    * frame, the same strided seed, and the Lloyd rounds unrolled as
    * MATERIALIZED CTE chains (assignment → means → coalesced centroids).
    * DuckDB's HUGEINT promotion is cast back at every boundary; all
    * magnitudes stay < 2^63 so the arithmetic is identical. */
  def kmeansReportSql(k: Int = 8, iters: Int = 3): String =
    s"""WITH ${kmeansCtesSql(k, iters)},
       |rep AS (
       |  SELECT cid, count(*) AS n_members,
       |    CAST(sum(dist >> 26) AS DOUBLE) * 67108864.0
       |      + CAST(sum(dist & 67108863) AS DOUBLE) AS inertia
       |  FROM fa GROUP BY 1)
       |SELECT cid, n_members, inertia,
       |  round(inertia / CAST(n_members AS DOUBLE)
       |    / ${(VecScale * VecScale).toDouble}, 6) AS mean_dist
       |FROM rep ORDER BY cid""".stripMargin

  /** DuckDB mirror of [[clusterExemplars]]: the shared Lloyd CTE chain,
    * one rank window over the final assignment, labels joined back. */
  def clusterExemplarsSql(k: Int = 8, iters: Int = 3, m: Int = 3): String =
    s"""WITH ${kmeansCtesSql(k, iters)},
       |rk AS (
       |  SELECT vec_id, cid, dist,
       |    row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rk
       |  FROM fa)
       |SELECT r.cid, CAST(r.rk AS INTEGER) AS rank_in_cluster, r.vec_id,
       |  e.label,
       |  round(CAST(r.dist AS DOUBLE) / ${(VecScale * VecScale).toDouble}, 6)
       |    AS dist_centroid
       |FROM rk r JOIN embeddings e USING (vec_id)
       |WHERE r.rk <= $m
       |ORDER BY cid, rank_in_cluster""".stripMargin

  /** The quantized frame, strided seed, and Lloyd rounds through the final
    * assignment `fa` (vec_id, cid, dist) — shared by [[kmeansReportSql]]
    * and [[clusterExemplarsSql]]. */
  private def kmeansCtesSql(k: Int, iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      val pc = s"c${r - 1}"
      s"""d$r AS (
         |  SELECT e.vec_id, c.cid,
         |    CAST(sum((e.q - c.c) * (e.q - c.c)) AS BIGINT) AS dist
         |  FROM eq e JOIN $pc c ON c.i = e.i GROUP BY 1, 2),
         |a$r AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |    FROM d$r) WHERE rn = 1),
         |m$r AS (
         |  SELECT a.cid, e.i, CAST(sum(e.q) AS BIGINT) AS s, count(*) AS c
         |  FROM a$r a JOIN eq e USING (vec_id) GROUP BY 1, 2),
         |c$r AS MATERIALIZED (
         |  SELECT p.cid, p.i,
         |    coalesce(CAST((m.s - ((m.s % m.c + m.c) % m.c)) // m.c AS BIGINT),
         |             p.c) AS c
         |  FROM $pc p LEFT JOIN m$r m ON m.cid = p.cid AND m.i = p.i)""".stripMargin
    }.mkString(",\n")
    s"""eq AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i AS INTEGER) AS i,
       |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * $VecScale, 0) AS BIGINT) AS q
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |seed AS (
       |  SELECT vec_id AS cid FROM embeddings CROSS JOIN nn
       |  WHERE vec_id % greatest(nn.n // $k, 1) = 0
       |  ORDER BY vec_id LIMIT $k),
       |c0 AS MATERIALIZED (
       |  SELECT s.cid, e.i, e.q AS c FROM seed s JOIN eq e ON e.vec_id = s.cid),
       |$rounds,
       |fd AS (
       |  SELECT e.vec_id, c.cid,
       |    CAST(sum((e.q - c.c) * (e.q - c.c)) AS BIGINT) AS dist
       |  FROM eq e JOIN c$iters c ON c.i = e.i GROUP BY 1, 2),
       |fa AS (
       |  SELECT vec_id, cid, dist FROM (
       |    SELECT vec_id, cid, dist,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM fd) WHERE rn = 1)""".stripMargin
  }

  /** q182: k-center greedy coreset — farthest-point sampling over the
    * embedding corpus (the Gonzalez 2-approximation to the k-center
    * problem; the selection rule behind coreset-based data pruning and
    * active-learning batch selection, e.g. Sener & Savarese 2018): start
    * from the minimum vec_id, then k-1 times pick the point FARTHEST from
    * everything selected so far. Output: the k selected rows in selection
    * order with their selection distance (the max-min distance at the
    * moment of selection) and the final coverage radius (max distance of
    * any remaining point to the selected set - the 2-approx bound on the
    * optimal k-center radius).
    *
    * Versus the neighbors: [[kmeansReport]] partitions mass (centroids
    * drift to density), k-center covers GEOMETRY (picks extremes) - the
    * right shape when the goal is "every point has a nearby exemplar",
    * i.e. eval-set seeding and diversity pruning.
    *
    * Bit-portability: the [[pcaPowerIteration]] doctrine - squared
    * Euclidean distances entirely in 1e6-scale fixed-point BIGINTs,
    * argmax tiebroken on vec_id, so DuckDB replays every pick.
    *
    * Scale shape: state is one (vec_id, qv, mind) corpus-sized frame,
    * localCheckpoint'd per round; each round is ONE broadcast of the
    * single picked vector (narrow min-update) plus one TakeOrdered
    * argmax - k rounds, zero shuffles of full text, nothing quadratic.
    * The selected frame stays k rows. */
  def kcenterCoreset(t: Tables, k: Int = 8): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val qv = t.embeddings
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * VecScale, 0).cast("long")).as("qv"))
      .localCheckpoint() // iterated over; avoid re-reading parquet per round
    // Overflow guard (the kmeansReport contract): per-pair squared
    // distance is bounded by dim*(2*max|q|)^2 and must stay inside BIGINT.
    val head = qv
      .agg(max(aggregate(col("qv"), lit(0L), (m, x) => greatest(m, abs(x))))
          .as("maxq"),
        max(size(col("qv"))).as("dim"))
      .head()
    val maxQ = if (head.isNullAt(0)) 0L else head.getLong(0)
    val dim = if (head.isNullAt(1)) 1 else head.getInt(1)
    require(maxQ <= 0 ||
      maxQ < math.sqrt(Long.MaxValue.toDouble / (4.0 * dim)),
      s"kcenterCoreset: max|q|=$maxQ at dim=$dim would overflow the " +
        "BIGINT distance accumulator; coarsen VecScale")

    val seed = qv.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("sel_id"), col("qv").as("sv"))
      .localCheckpoint()
    var picks = Vector[DataFrame](
      seed.select(col("sel_id").as("vec_id"), lit(1).as("rank"),
        lit(0L).as("mind")))
    var state = qv.crossJoin(broadcast(seed)) // 1 selected row by design
      .filter(col("vec_id") =!= col("sel_id"))
      .select(col("vec_id"), col("qv"),
        sqDist(col("qv"), col("sv")).as("mind"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val pick = state.orderBy(col("mind").desc, col("vec_id")).limit(1)
        .select(col("vec_id").as("sel_id"), col("qv").as("sv"),
          col("mind").as("pmind"))
        .localCheckpoint()
      picks :+= pick.select(col("sel_id").as("vec_id"), lit(r).as("rank"),
        col("pmind").as("mind"))
      state = state.crossJoin(broadcast(pick)) // 1 selected row by design
        .filter(col("vec_id") =!= col("sel_id"))
        .select(col("vec_id"), col("qv"),
          least(col("mind"), sqDist(col("qv"), col("sv"))).as("mind"))
        .localCheckpoint() // cut the iterated lineage
    }
    val radius = state.agg(max(col("mind")).as("radius_q"))
    val denom = (VecScale * VecScale).toDouble
    broadcast(picks.reduce(_ unionByName _))
      .join(t.embeddings.select(col("vec_id"), col("label")), Seq("vec_id"))
      .crossJoin(broadcast(radius)) // 1-row scalar frame
      .select(col("rank"), col("vec_id"), col("label"),
        round(col("mind").cast("double") / denom, 6).as("dist_sel"),
        round(col("radius_q").cast("double") / denom, 6)
          .as("coverage_radius"))
      .orderBy(col("rank"))
  }

  /** DuckDB mirror of [[kcenterCoreset]] - the quantized per-dimension
    * frame, the min-vec_id seed, and the k-1 greedy rounds unrolled as
    * MATERIALIZED CTE chains (argmax pick -> distance-to-pick -> min-fold,
    * picked row dropped from the state). */
  def kcenterCoresetSql(k: Int = 8): String = {
    val denom = (VecScale * VecScale).toDouble
    val rounds = (2 to k).map { r =>
      val ps = s"st${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT vec_id, mind FROM $ps ORDER BY mind DESC, vec_id LIMIT 1),
         |d$r AS (
         |  SELECT e.vec_id,
         |    CAST(sum((e.q - s.q) * (e.q - s.q)) AS BIGINT) AS dist
         |  FROM eq e JOIN eq s ON s.i = e.i
         |  JOIN p$r ON s.vec_id = p$r.vec_id
         |  GROUP BY 1),
         |st$r AS MATERIALIZED (
         |  SELECT t.vec_id, least(t.mind, d.dist) AS mind
         |  FROM $ps t JOIN d$r d USING (vec_id)
         |  JOIN p$r ON t.vec_id <> p$r.vec_id)""".stripMargin
    }.mkString(",\n")
    val arms = (2 to k)
      .map(r => s"SELECT $r AS rank, vec_id, mind FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH eq AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i AS INTEGER) AS i,
       |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * $VecScale, 0) AS BIGINT) AS q
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       |s1 AS MATERIALIZED (SELECT min(vec_id) AS sel FROM eq),
       |d1 AS (
       |  SELECT e.vec_id,
       |    CAST(sum((e.q - s.q) * (e.q - s.q)) AS BIGINT) AS dist
       |  FROM eq e JOIN eq s ON s.i = e.i JOIN s1 ON s.vec_id = s1.sel
       |  GROUP BY 1),
       |st1 AS MATERIALIZED (
       |  SELECT d.vec_id, d.dist AS mind
       |  FROM d1 d JOIN s1 ON d.vec_id <> s1.sel),
       |$rounds,
       |rad AS (SELECT max(mind) AS radius_q FROM st$k),
       |sel AS (
       |  SELECT 1 AS rank, s1.sel AS vec_id, CAST(0 AS BIGINT) AS mind FROM s1
       |  UNION ALL $arms)
       |SELECT sel.rank, sel.vec_id, e.label,
       |  round(CAST(sel.mind AS DOUBLE) / $denom, 6) AS dist_sel,
       |  round(CAST(rad.radius_q AS DOUBLE) / $denom, 6) AS coverage_radius
       |FROM sel JOIN embeddings e USING (vec_id) CROSS JOIN rad
       |ORDER BY rank""".stripMargin
  }

  /** q187: product-quantization ANN (PQ + ADC — Jégou et al. 2011, the
    * codebook scheme behind IVF-PQ indexes): the embedding is cut into
    * `m` contiguous subspaces, each subspace gets its own `k`-centroid
    * Lloyd codebook, and every vector compresses to `m` code bytes.
    * Queries scan those codes with an Asymmetric Distance Computation: a
    * per-query (sub, cid) distance TABLE of m·k entries is precomputed
    * once, and each candidate's approximate distance is m table lookups —
    * the memory story (m bytes/vector vs dim floats) that lets a
    * 100 TB-corpus index fit in RAM. Completes the quantization family:
    * q78 (scalar SQ8), q43 (IVF partitions), this (codebook compression).
    *
    * Codebook training is ONE Lloyd loop keyed by (sub, cid) — all `m`
    * subspaces train simultaneously in the same rounds (same plan shape
    * as [[kmeansAssign]], composite keys instead of a per-subspace loop).
    * All arithmetic in 1e6-scale fixed-point BIGINTs (the q163/q175
    * doctrine) so DuckDB replays training, encoding, and the ADC scan
    * bit-for-bit. Output: per query, the `topK` ADC neighbors with their
    * approximate and exact distances and an exact-top-k membership flag —
    * the recall evidence next to the compression.
    *
    * Scale shape: training rounds touch the (vec_id, sub) frame (n·m
    * narrow rows) with k·m-row broadcast centroids; encoding IS the final
    * assignment; the ADC scan is one broadcast of the Q·m·k distance
    * table against the codes frame. The brute-force exact arm (recall
    * truth) is the only corpus×Q work — the q37 eval-queries pattern. */
  def pqTopK(t: Tables, m: Int = 4, k: Int = 16, iters: Int = 2,
             nQueries: Int = 4, topK: Int = 10): DataFrame = {
    graft.functions.VectorExpressions.register(t.spark)
    val qv = t.embeddings
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * VecScale, 0).cast("long")).as("qv"))
      .localCheckpoint() // read by training, encoding, and the exact arm
    val head = qv
      .agg(count(lit(1)).as("n"),
        max(aggregate(col("qv"), lit(0L), (mx, x) => greatest(mx, abs(x))))
          .as("maxq"),
        max(size(col("qv"))).as("dim"))
      .head()
    val n = head.getLong(0)
    val maxQ = if (head.isNullAt(1)) 0L else head.getLong(1)
    val dim = if (head.isNullAt(2)) m else head.getInt(2)
    require(dim % m == 0, s"pqTopK: dim $dim not divisible into $m subspaces")
    require(maxQ <= 0 || (maxQ < math.sqrt(Long.MaxValue.toDouble / (4.0 * dim))
      && maxQ < Long.MaxValue / math.max(n, 1L)),
      s"pqTopK: max|q|=$maxQ at dim=$dim, n=$n would overflow the BIGINT " +
        "distance/mean accumulators; coarsen VecScale")
    val w = dim / m
    val subs = qv
      .select(col("vec_id"), col("qv"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"))
      .select(col("vec_id"), col("sub"),
        slice(col("qv"), col("sub") * w + 1, lit(w)).as("sv"))
      .localCheckpoint() // iterated over by the Lloyd rounds
    val stride = math.max(1L, n / k)
    val seeds = qv.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")) // bare limit() is partition-order dependent
      .limit(k)
      .select(col("vec_id").as("cid"))
    var cents = subs.join(broadcast(seeds), col("vec_id") === col("cid"))
      .select(col("sub"), col("cid"), col("sv").as("cv"))
      .localCheckpoint() // k·m rows
    def assign(c: DataFrame): DataFrame = {
      val win = Window.partitionBy(col("vec_id"), col("sub"))
        .orderBy(col("dist"), col("cid"))
      subs.join(broadcast(c), Seq("sub"))
        .select(col("vec_id"), col("sub"), col("sv"), col("cid"),
          sqDist(col("sv"), col("cv")).as("dist"))
        .withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .drop("rn")
    }
    for (_ <- 1 to iters) {
      val means = assign(cents)
        .select(col("sub"), col("cid"), posexplode(col("sv")))
        .groupBy(col("sub"), col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("c"))
        // portable floor division: (s − pmod(s, c)) is exactly divisible
        .select(col("sub"), col("cid"), col("pos"),
          expr("(s - pmod(s, c)) div c").as("mv"))
        .groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => x.getField("mv")).as("newcv"))
      cents = cents.as("c").join(means.as("u"), Seq("sub", "cid"), "left")
        .select(col("sub"), col("cid"),
          coalesce(col("u.newcv"), col("c.cv")).as("cv"))
        .localCheckpoint() // cut the iterated lineage
    }
    val codes = assign(cents).select(col("vec_id"), col("sub"), col("cid"))
    // ADC distance table: Q·m·k rows, broadcast against the codes frame.
    val qsubs = subs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("sub"), col("sv").as("qsv"))
    val dt = qsubs.join(cents, Seq("sub"))
      .select(col("query_id"), col("sub"), col("cid"),
        sqDist(col("qsv"), col("cv")).as("qd"))
    val adcWin = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_q"), col("vec_id"))
    val winners = codes.join(broadcast(dt), Seq("sub", "cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("qd")).as("adc_q"))
      .withColumn("rank", row_number().over(adcWin))
      .filter(col("rank") <= topK)
    // Exact arm (recall truth): the q37 brute pattern, integer distances.
    val queries = qv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("qqv"))
    val scored = qv.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        sqDist(col("qv"), col("qqv")).as("ed"))
      .localCheckpoint() // read by the rank window and the winners join
    val exWin = Window.partitionBy(col("query_id"))
      .orderBy(col("ed"), col("vec_id"))
    val exTop = scored.withColumn("rn", row_number().over(exWin))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("vec_id"), lit(1).as("hit"))
    val denom = (VecScale * VecScale).toDouble
    winners
      .join(scored, Seq("query_id", "vec_id"))
      .join(exTop, Seq("query_id", "vec_id"), "left")
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("adc_q").cast("double") / denom, 6).as("adc_dist"),
        round(col("ed").cast("double") / denom, 6).as("exact_dist"),
        coalesce(col("hit"), lit(0)).as("in_exact_topk"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** DuckDB mirror of [[pqTopK]]: the per-(sub, j) quantized frame, the
    * shared strided seed, the Lloyd rounds with (sub, cid) keys unrolled
    * as MATERIALIZED CTEs, then codes → ADC table → scan → exact arm. */
  def pqTopKSql(m: Int = 4, k: Int = 16, iters: Int = 2,
                nQueries: Int = 4, topK: Int = 10): String = {
    val rounds = (1 to iters).map { r =>
      val pc = s"pc${r - 1}"
      s"""pd$r AS (
         |  SELECT e.vec_id, e.sub, c.cid,
         |    CAST(sum((e.q - c.c) * (e.q - c.c)) AS BIGINT) AS dist
         |  FROM sq e JOIN $pc c ON c.sub = e.sub AND c.j = e.j
         |  GROUP BY 1, 2, 3),
         |pa$r AS MATERIALIZED (
         |  SELECT vec_id, sub, cid FROM (
         |    SELECT vec_id, sub, cid,
         |      row_number() OVER (PARTITION BY vec_id, sub
         |        ORDER BY dist, cid) AS rn
         |    FROM pd$r) WHERE rn = 1),
         |pm$r AS (
         |  SELECT a.sub, a.cid, e.j, CAST(sum(e.q) AS BIGINT) AS s,
         |    count(*) AS c
         |  FROM pa$r a JOIN sq e ON e.vec_id = a.vec_id AND e.sub = a.sub
         |  GROUP BY 1, 2, 3),
         |pc$r AS MATERIALIZED (
         |  SELECT p.sub, p.cid, p.j,
         |    coalesce(CAST((m.s - ((m.s % m.c + m.c) % m.c)) // m.c AS BIGINT),
         |             p.c) AS c
         |  FROM $pc p LEFT JOIN pm$r m
         |    ON m.sub = p.sub AND m.cid = p.cid AND m.j = p.j)""".stripMargin
    }.mkString(",\n")
    val denom = (VecScale * VecScale).toDouble
    s"""WITH eq AS MATERIALIZED (
       |  SELECT vec_id, CAST(u.i AS INTEGER) AS i,
       |    CAST(round(CAST(embedding[u.i] AS DOUBLE) * $VecScale, 0) AS BIGINT) AS q
       |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
       |dimw AS (SELECT (max(i) // $m) AS w FROM eq),
       |sq AS MATERIALIZED (
       |  SELECT vec_id, CAST((i - 1) // w AS INTEGER) AS sub,
       |    CAST((i - 1) % w AS INTEGER) AS j, q
       |  FROM eq CROSS JOIN dimw),
       |nn AS (SELECT count(*) AS n FROM embeddings),
       |seed AS (
       |  SELECT vec_id AS cid FROM embeddings CROSS JOIN nn
       |  WHERE vec_id % greatest(nn.n // $k, 1) = 0
       |  ORDER BY vec_id LIMIT $k),
       |pc0 AS MATERIALIZED (
       |  SELECT q.sub, s.cid, q.j, q.q AS c
       |  FROM seed s JOIN sq q ON q.vec_id = s.cid),
       |$rounds,
       |cfd AS (
       |  SELECT e.vec_id, e.sub, c.cid,
       |    CAST(sum((e.q - c.c) * (e.q - c.c)) AS BIGINT) AS dist
       |  FROM sq e JOIN pc$iters c ON c.sub = e.sub AND c.j = e.j
       |  GROUP BY 1, 2, 3),
       |codes AS MATERIALIZED (
       |  SELECT vec_id, sub, cid FROM (
       |    SELECT vec_id, sub, cid,
       |      row_number() OVER (PARTITION BY vec_id, sub
       |        ORDER BY dist, cid) AS rn
       |    FROM cfd) WHERE rn = 1),
       |dt AS MATERIALIZED (
       |  SELECT qs.vec_id AS query_id, c.sub, c.cid,
       |    CAST(sum((qs.q - c.c) * (qs.q - c.c)) AS BIGINT) AS qd
       |  FROM sq qs JOIN pc$iters c ON c.sub = qs.sub AND c.j = qs.j
       |  WHERE qs.vec_id < $nQueries
       |  GROUP BY 1, 2, 3),
       |adc AS (
       |  SELECT d.query_id, cd.vec_id, CAST(sum(d.qd) AS BIGINT) AS adc_q
       |  FROM codes cd JOIN dt d ON d.sub = cd.sub AND d.cid = cd.cid
       |  WHERE cd.vec_id <> d.query_id
       |  GROUP BY 1, 2),
       |win AS (
       |  SELECT query_id, vec_id, adc_q,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY adc_q, vec_id) AS rank
       |  FROM adc),
       |ex AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, e.vec_id,
       |    CAST(sum((e.q - q.q) * (e.q - q.q)) AS BIGINT) AS ed
       |  FROM eq e JOIN eq q ON q.i = e.i
       |  WHERE q.vec_id < $nQueries AND e.vec_id <> q.vec_id
       |  GROUP BY 1, 2),
       |exr AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY ed, vec_id) AS rn
       |    FROM ex) WHERE rn <= $topK)
       |SELECT w.query_id, CAST(w.rank AS INTEGER) AS rank, w.vec_id,
       |  round(CAST(w.adc_q AS DOUBLE) / $denom, 6) AS adc_dist,
       |  round(CAST(x.ed AS DOUBLE) / $denom, 6) AS exact_dist,
       |  CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END AS in_exact_topk
       |FROM win w JOIN ex x USING (query_id, vec_id)
       |LEFT JOIN exr r USING (query_id, vec_id)
       |WHERE w.rank <= $topK
       |ORDER BY query_id, rank""".stripMargin
  }
}

package graft.operators

import graft.core.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the zone-transition graph — the "which hubs matter"
  * layer a mobility lakehouse builds on its trip table (the reference's
  * zone-activity scores rank zones by raw volume; PageRank ranks them by
  * flow structure).
  *
  * The graph: one node per zone, one weighted edge per consecutive event
  * pair within a user's timeline (origin→destination transitions). Building
  * it is the only fact-sized work — ONE shuffle on user_id for the lag
  * window, then an edge aggregate whose output is at most |zones|² rows.
  * Everything iterative happens on that tiny edge frame; ranks broadcast.
  *
  * Bit-portability doctrine: PageRank in floating point is NOT
  * order-independent (contribution sums run in partition order), so ranks
  * are carried as fixed-point BIGINTs — scale 10⁹, damping 0.85 as ×85/100,
  * per-edge transition probabilities pre-scaled to 10⁶ — every operation an
  * exact integer multiply/floor-divide/sum, every intermediate bounded
  * (max mass ·85·10⁶ < 2^55), so any engine and any partition layout
  * reproduces the ranks bit-for-bit. Same doctrine as
  * [[graft.functions.ExactAgg]], applied to an iterative algorithm.
  */
object Graph {

  val RankScale = 1000000000L // 10^9 fixed-point
  val ProbScale = 1000000L    // 10^6 per-edge transition probability

  /** Weighted zone-transition edges (src ≠ dst; self-loops dropped). */
  private[graft] def zoneEdges(t: Tables): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t.events
      .select(col("user_id"), col("ts"), col("event_id"),
        pmod(col("event_id"), lit(25)).as("zone"))
      .withColumn("prev_zone", lag(col("zone"), 1).over(w))
      .filter(col("prev_zone").isNotNull && col("prev_zone") =!= col("zone"))
      .groupBy(col("prev_zone").as("src"), col("zone").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** q79: fixed-point PageRank over zone transitions, `iters` synchronous
    * iterations (Page et al. 1999). Dangling mass is not redistributed
    * (nodes without out-edges leak their damped mass — the common
    * simplification; ranks remain a well-defined deterministic fixed
    * formula both engines replay). */
  def pageRankZones(t: Tables, iters: Int = 3): DataFrame =
    pageRankFromEdges(zoneEdges(t), iters)

  /** The iteration core over any `(src, dst, w)` edge frame (split out so
    * specs can plant graphs with known ranks). */
  private[graft] def pageRankFromEdges(edgesIn: DataFrame, iters: Int): DataFrame = {
    val edges = edgesIn.localCheckpoint() // iterated over
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val p = edges.join(outW, "src")
      .select(col("src"), col("dst"),
        expr(s"(w * $ProbScale) div out_w").as("p"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("zone"))
      .union(edges.select(col("dst").as("zone")))
      .distinct()
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(RankScale))
    val teleport = 15L * RankScale / 100L
    for (_ <- 1 to iters) {
      val contribs = p.join(ranks.withColumnRenamed("zone", "src"), "src")
        .select(col("dst").as("zone"),
          expr(s"(((rank * 85) div 100) * p) div $ProbScale").as("c"))
        .groupBy(col("zone"))
        .agg(sum(col("c")).as("c"))
      ranks = nodes.join(contribs, Seq("zone"), "left")
        .select(col("zone"),
          (lit(teleport) + coalesce(col("c"), lit(0L))).as("rank"))
        .localCheckpoint() // cut the iterated lineage
    }
    ranks
      .select(col("zone").as("zone_id"), col("rank").as("rank_scaled"),
        round(col("rank").cast("double") / RankScale.toDouble, 6).as("rank"))
      .orderBy(col("rank_scaled").desc, col("zone_id"))
  }

  /** The DuckDB mirror of [[pageRankZones]]: the same integer arithmetic
    * with the iteration loop unrolled into a CTE chain. */
  def pageRankZonesSql(iters: Int = 3): String = {
    val iterCtes = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT p.dst AS zone,
         |   CAST(sum((((r.rank * 85) // 100) * p.p) // $ProbScale) AS BIGINT) AS c
         |  FROM p JOIN r${i - 1} r ON p.src = r.zone GROUP BY 1),
         |r$i AS (
         |  SELECT n.zone, ${15L * RankScale / 100L} + coalesce(c.c, 0) AS rank
         |  FROM nodes n LEFT JOIN c$i c USING (zone))""".stripMargin
    }.mkString(",\n")
    s"""WITH seqd AS (
       |  SELECT user_id, ts, event_id, event_id % 25 AS zone,
       |   lag(event_id % 25) OVER (
       |     PARTITION BY user_id ORDER BY ts, event_id) AS prev_zone
       |  FROM events),
       |edges AS (
       |  SELECT prev_zone AS src, zone AS dst, count(*) AS w
       |  FROM seqd WHERE prev_zone IS NOT NULL AND prev_zone <> zone
       |  GROUP BY 1, 2),
       |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM edges GROUP BY 1),
       |p AS (
       |  SELECT src, dst, (w * $ProbScale) // out_w AS p
       |  FROM edges JOIN outw USING (src)),
       |nodes AS (
       |  SELECT src AS zone FROM edges UNION SELECT dst FROM edges),
       |r0 AS (SELECT zone, CAST($RankScale AS BIGINT) AS rank FROM nodes),
       |$iterCtes
       |SELECT zone AS zone_id, rank AS rank_scaled,
       | round(CAST(rank AS DOUBLE) / $RankScale.0e0, 6) AS rank
       |FROM r$iters ORDER BY rank_scaled DESC, zone_id""".stripMargin
  }

  /** q82: triangle census + global clustering coefficient over the
    * undirected zone graph. Edges are oriented low-id → high-id so each
    * triangle is counted exactly once by the two-join wedge-close pattern
    * (at web scale the orientation is by DEGREE — the node-iterator bound
    * of Schank & Wagner 2005 — which caps the join fan-out on hub nodes;
    * id-orientation is the same plan shape on this zone-sized graph).
    * Wedges (paths of length 2) come from degree counts; all integer
    * arithmetic except the final coefficient, one rounded division. */
  def triangleStats(t: Tables): DataFrame = triangleStatsFromEdges(zoneEdges(t))

  private[graft] def triangleStatsFromEdges(edges: DataFrame): DataFrame = {
    val ue = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint() // three self-join arms
    val deg = ue.select(col("a").as("z")).union(ue.select(col("b").as("z")))
      .groupBy(col("z")).agg(count(lit(1)).as("d"))
    val e1 = ue.select(col("a"), col("b"))
    val e2 = ue.select(col("a").as("b"), col("b").as("c"))
    val e3 = ue.select(col("a").as("ca"), col("b").as("cb"))
    val triangles = e1.join(e2, "b")
      .join(e3, col("a") === col("ca") && col("c") === col("cb"))
      .agg(count(lit(1)).as("n_triangles"))
    val counts = ue.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        sum(expr("(d * (d - 1)) div 2")).as("n_wedges")))
    counts.crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("global_clustering"))
  }

  /** The DuckDB mirror of [[triangleStats]]. */
  val triangleStatsSql: String =
    s"""WITH seqd AS (
       |  SELECT user_id, ts, event_id, event_id % 25 AS zone,
       |   lag(event_id % 25) OVER (
       |     PARTITION BY user_id ORDER BY ts, event_id) AS prev_zone
       |  FROM events),
       |edges AS (
       |  SELECT prev_zone AS src, zone AS dst, count(*) AS w
       |  FROM seqd WHERE prev_zone IS NOT NULL AND prev_zone <> zone
       |  GROUP BY 1, 2),
       |ue AS (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM edges),
       |deg AS (
       |  SELECT z, count(*) AS d FROM (
       |    SELECT a AS z FROM ue UNION ALL SELECT b FROM ue) GROUP BY 1),
       |tri AS (
       |  SELECT count(*) AS n_triangles
       |  FROM ue e1 JOIN ue e2 ON e1.b = e2.a
       |  JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b),
       |agg AS (
       |  SELECT (SELECT count(*) FROM ue) AS n_edges,
       |   count(*) AS n_nodes,
       |   CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
       |  FROM deg)
       |SELECT n_nodes, n_edges, n_wedges, n_triangles,
       | round(3.0e0 * n_triangles / n_wedges, 6) AS global_clustering
       |FROM agg CROSS JOIN tri""".stripMargin
}

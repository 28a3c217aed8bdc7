package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {

  private def edges(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("src", "dst", "w")
  }

  test("pagerank: star graph concentrates rank on the hub") {
    // 1..4 all point at 0; 0 points back at 1
    val e = edges((1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 1L), (4L, 0L, 1L), (0L, 1L, 1L))
    val r = Graph.pageRankFromEdges(e, iters = 3).collect()
    assert(r.head.getAs[Long]("zone_id") == 0L, "hub must rank first")
    val byZone = r.map(x => x.getAs[Long]("zone_id") -> x.getAs[Long]("rank_scaled")).toMap
    assert(byZone(0L) > byZone(1L) && byZone(1L) > byZone(2L))
    assert(byZone(2L) == byZone(3L) && byZone(3L) == byZone(4L), "leaves are symmetric")
  }

  test("pagerank: matches a by-hand integer fixed-point replay") {
    // 0 -> 1 (w 1); 1 -> 0 (w 3). Replay the exact integer arithmetic.
    val e = edges((0L, 1L, 1L), (1L, 0L, 3L))
    val S = Graph.RankScale
    val P = Graph.ProbScale
    def step(r: Map[Long, Long]): Map[Long, Long] = {
      val p = Map((0L, 1L) -> (1L * P / 1L), (1L, 0L) -> (3L * P / 3L))
      def contrib(src: Long, to: Long) = r(src) * 85L / 100L * p((src, to)) / P
      Map(
        0L -> (15L * S / 100L + contrib(1L, 0L)),
        1L -> (15L * S / 100L + contrib(0L, 1L)))
    }
    var expect = Map(0L -> S, 1L -> S)
    for (_ <- 1 to 3) expect = step(expect)
    val got = Graph.pageRankFromEdges(e, iters = 3).collect()
      .map(x => x.getAs[Long]("zone_id") -> x.getAs[Long]("rank_scaled")).toMap
    assert(got == expect)
  }

  test("pagerank: total mass bounded by teleport + damped mass") {
    val r = Graph.pageRankZones(sf()).collect()
    assert(r.nonEmpty)
    val n = r.length
    val total = r.map(_.getAs[Long]("rank_scaled")).sum
    // teleport floor: every node holds at least 0.15; ceiling: full mass
    assert(total >= n * (15L * Graph.RankScale / 100L))
    assert(total <= n.toLong * Graph.RankScale + n) // +n for flooring slack
    // deterministic under re-run
    val r2 = Graph.pageRankZones(sf()).collect()
    assert(r.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
  }

  test("triangles: planted triangle plus a dangling edge") {
    // triangle 1-2-3, dangling edge 3-4 (as directed transitions both ways)
    val e = edges((1L, 2L, 5L), (2L, 3L, 1L), (3L, 1L, 2L), (3L, 4L, 1L))
    val row = Graph.triangleStatsFromEdges(e).collect().head
    assert(row.getAs[Long]("n_nodes") == 4)
    assert(row.getAs[Long]("n_edges") == 4)
    assert(row.getAs[Long]("n_triangles") == 1)
    // degrees: 1:2, 2:2, 3:3, 4:1 -> wedges 1+1+3+0 = 5
    assert(row.getAs[Long]("n_wedges") == 5)
    assert(math.abs(row.getAs[Double]("global_clustering") - 0.6) < 1e-9)
  }

  test("triangles: direction and duplicate edges do not double-count") {
    val once = Graph.triangleStatsFromEdges(edges((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)))
      .collect().head
    val dup = Graph.triangleStatsFromEdges(
      edges((1L, 2L, 1L), (2L, 1L, 9L), (2L, 3L, 1L), (3L, 2L, 2L), (3L, 1L, 1L), (1L, 3L, 4L)))
      .collect().head
    assert(once.getAs[Long]("n_triangles") == 1 && dup.getAs[Long]("n_triangles") == 1)
    assert(once.getAs[Long]("n_edges") == 3 && dup.getAs[Long]("n_edges") == 3)
  }

  test("quantized ANN: codes bounded, ranking close to exact brute force") {
    val t = sf()
    val q = graft.ext.Similarity.quantizedTopK(t).collect()
    assert(q.nonEmpty)
    // quantized score is a cosine estimate: close to the exact cosine
    q.foreach { r =>
      val qc = r.getAs[Double]("qcosine")
      val c = r.getAs[Double]("cosine")
      assert(qc >= -1.000001 && qc <= 1.000001)
      assert(math.abs(qc - c) < 0.05, s"quantized cosine $qc far from exact $c")
    }
    // recall@5 vs the exact brute-force top-5
    val exact = graft.ext.Similarity.bruteForceTopK(t).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (qid, rows) => qid -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val got = q.groupBy(_.getAs[Long]("query_id"))
      .map { case (qid, rows) => qid -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val recalls = exact.keys.toSeq.map(k => (got(k) intersect exact(k)).size.toDouble / 5)
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.7, s"mean recall@5 $mean too low for int8 quantization")
  }
}

package graft

import graft.ext.Similarity

/** ANN quality contracts: the approximate paths are graded against the
  * brute-force exact truth — LSH/IVF recall is a measured property, not an
  * assumption, and Lloyd refinement must not make the quantizer worse. */
class SimilaritySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet

  private def recall(approx: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    (approx intersect truth).size.toDouble / truth.size

  test("IVF recall@5: Lloyd-refined centroids >= unrefined strided seed") {
    // 40 queries: at 8 queries the two indexes differ by ±1 pair (noise)
    val t = sf("sf0.001")
    val truth = pairs(Similarity.bruteForceTopK(t, nQueries = 40, k = 5))
    val base = recall(pairs(Similarity.ivfTopK(t, 40, 5, nCentroids = 16, nProbe = 2)), truth)
    val refined = recall(
      pairs(Similarity.ivfTopKRefined(t, 40, 5, nCentroids = 16, nProbe = 2, iters = 2)), truth)
    assert(refined >= base, s"refined=$refined < unrefined=$base")
    assert(refined > 0.3, s"refined recall degenerate: $refined")
  }

  test("IVF+SQ8 (q106) recall@5 tracks plain IVF: quantization barely costs") {
    val t = sf("sf0.001")
    val truth = pairs(Similarity.bruteForceTopK(t, nQueries = 8, k = 5))
    val ivf = recall(pairs(Similarity.ivfTopK(t, 8, 5, nCentroids = 16, nProbe = 4)), truth)
    val composed = recall(
      pairs(Similarity.ivfQuantizedTopK(t, 8, 5, nCentroids = 16, nProbe = 4)), truth)
    // same routing, int8-ranked: within one pair per query of the float-
    // ranked IVF (SQ8 ranking error only reorders near-ties)
    assert(composed >= ivf - 0.2, s"composed=$composed ivf=$ivf")
    assert(composed > 0.3, s"composed recall degenerate: $composed")
  }

  test("Lloyd iterations improve the quantizer objective (mean member cosine)") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    graft.functions.VectorExpressions.register(spark)
    val cos = graft.functions.VectorExpressions.cosineSim _
    def objective(cents: org.apache.spark.sql.DataFrame,
                  assigned: org.apache.spark.sql.DataFrame): Double =
      assigned.join(cents, Seq("centroid_id"))
        .agg(avg(cos(col("embedding"), col("cvec"))))
        .collect()(0).getDouble(0)
    val (c0, a0) = Similarity.ivfBuildIndex(t, 16)
    val (c1, a1) = Similarity.ivfBuildIndexRefined(t, 16, iters = 2)
    val (o0, o1) = (objective(c0, a0), objective(c1, a1))
    assert(o1 > o0, s"refined objective $o1 not better than seed $o0")
  }

  test("refined centroids are deterministic across partition layouts") {
    val t = sf("sf0.001")
    def run() = Similarity.ivfBuildIndexRefined(t, nCentroids = 8, iters = 1)
      ._1.collect().map(r =>
        r.getAs[Long]("centroid_id") -> r.getSeq[Double](1).toVector).toMap
    val a = run()
    val b = run()
    assert(a == b) // decimal-mean accumulation: layout/retry independent
  }

  test("SRP-LSH recall@5 is usable at 16 planes / 4 bands") {
    val t = sf("sf0.001")
    val truth = pairs(Similarity.bruteForceTopK(t, nQueries = 8, k = 5))
    val lsh = recall(pairs(Similarity.lshBucketedTopK(t, 8, 5)), truth)
    assert(lsh > 0.3, s"LSH recall degenerate: $lsh")
  }

  test("persisted IVF index: served results match build-path; probes prune partitions") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    val prefix = s"ivf_idx_${System.nanoTime()}"
    try {
      Similarity.ivfWriteIndex(t, prefix, nCentroids = 16, iters = 1)
      // the lists table is partitioned by centroid_id
      val parts = spark.sql(s"SHOW PARTITIONS ${prefix}_lists").count()
      assert(parts > 1, s"expected partitioned lists table, got $parts partitions")
      val served = Similarity.ivfTopKServed(t, prefix, nQueries = 8, k = 5, nProbe = 4)
      val built = Similarity.ivfTopKRefined(t, 8, 5, nCentroids = 16, nProbe = 4, iters = 1)
      assert(served.collect().map(_.toSeq).toSeq == built.collect().map(_.toSeq).toSeq)
      // the serve-path scan of the lists table is partition-pruned: either
      // statically or via a dynamic-pruning subquery on centroid_id
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning") ||
        plan.contains("PartitionFilters: [isnotnull(centroid_id"),
        s"probe scan not partition-pruned:\n${plan.take(3000)}")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_centroids")
      spark.sql(s"DROP TABLE IF EXISTS ${prefix}_lists")
    }
  }
}

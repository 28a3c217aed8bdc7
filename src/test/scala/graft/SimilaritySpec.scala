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

  /** Single-node replica of the q147 scoring kernel: tf-idf weights,
    * cents-kernel norms/dots (the exact long-integer arithmetic of
    * ExactAgg.dsumProd on wn·100 inputs), 6-dp HALF_UP rounding. */
  private def bruteExactPairs(tau: Double): Set[(Long, Long, Double)] = {
    def cents(x: Double): Long = math.floor(x * 100 + 0.5).toLong
    val docs = sf("sf0.001").documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.lower(
          org.apache.spark.sql.functions.col("text")).as("text"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.split("\\s+").filter(_.nonEmpty))
    val nDocs = docs.length.toDouble
    val dfm = docs.flatMap { case (_, tks) => tks.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    val wByDoc: Map[Long, Map[String, Double]] = docs.map { case (id, tks) =>
      id -> tks.groupBy(identity).map { case (t, xs) =>
        t -> xs.length.toDouble * nDocs / dfm(t)
      }
    }.toMap
    val wnByDoc = wByDoc.map { case (id, w) =>
      // norm via the same cents kernel: sum of round(w·100)^2 / 1e4
      val q = w.values.map(v => cents(v) * cents(v)).sum.toDouble / 10000.0
      val norm = math.sqrt(q)
      id -> w.map { case (t, v) => t -> v / norm }
    }
    val ids = wnByDoc.keys.toSeq.sorted
    (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = wnByDoc(ids(i)); b = wnByDoc(ids(j))
      shared = a.keySet intersect b.keySet
      if shared.nonEmpty
      // dsumProd on wn·100 inputs: round(wn·1e4) products, exact long sum
      dot4 = shared.toSeq.map(t =>
        math.floor(a(t) * 10000 + 0.5).toLong *
          math.floor(b(t) * 10000 + 0.5).toLong).sum.toDouble / 10000.0
      cos = BigDecimal(dot4 / 10000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if cos >= tau
    } yield (ids(i), ids(j), cos)).toSet
  }

  test("q147 exact APSS equals brute force at two thresholds") {
    for (tau <- Seq(0.9, 0.5)) {
      val got = graft.ext.Similarity.sparseCosinePairsExact(sf("sf0.001"), tau)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Double]("cosine"))).toSet
      val want = bruteExactPairs(tau)
      assert(want.nonEmpty, s"tau=$tau: brute force found nothing — bad fixture")
      assert(got == want,
        s"tau=$tau missed=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("q149 grid-blocked eps pairs equal brute force, each pair exactly once") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    for (eps <- Seq(0.01, 0.03)) {
      val got = Similarity.epsNeighborPairs(t, eps).collect()
        .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
      // the blocking must not double-report: a pair in the same cell is met
      // once (a-replica x b-home), the reverse encounter fails id_a < id_b
      assert(got.distinct.size == got.size, "duplicate pair emitted")
      val pts = t.embeddings.select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      val a = pts.select(col("vec_id").as("id_a"), col("x").as("xa"), col("y").as("ya"))
      val b = pts.select(col("vec_id").as("id_b"), col("x").as("xb"), col("y").as("yb"))
      val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
        .filter((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(eps) * lit(eps))
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(want.nonEmpty, s"eps=$eps: brute force found nothing — bad fixture")
      assert(got.toSet == want,
        s"eps=$eps missed=${(want -- got.toSet).take(3)} extra=${(got.toSet -- want).take(3)}")
    }
  }

  test("q148 hybrid RRF: fused scores recompute from the two arm rankings") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    val got = Similarity.hybridSearch(t, kEach = 50, k = 15).collect()
    assert(got.length == 15)
    // rebuild the two arms' rank maps independently
    val lex = graft.ext.TextAnalysis.bm25Scores(t, Seq("data", "spark", "query"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      .collect().map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val dense = Similarity.bruteForceTopK(t, nQueries = 1, k = 50)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("rank")).toMap
    var prev = Double.MaxValue
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expect = BigDecimal(
        lex.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        dense.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf_score") - expect) < 1e-9,
        s"doc $id: rrf=${r.getAs[Double]("rrf_score")} expect=$expect")
      assert(r.getAs[Double]("rrf_score") <= prev, "output not rank-ordered")
      prev = r.getAs[Double]("rrf_score")
      assert((lex.get(id).isDefined == !r.isNullAt(r.fieldIndex("lex_rank"))) &&
        (dense.get(id).isDefined == !r.isNullAt(r.fieldIndex("dense_rank"))),
        s"doc $id: rank nullability disagrees with arm membership")
    }
  }

  test("q151 knn eval: every query predicted once; majority hand-checked") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    val conf = Similarity.knnLabelEval(t, nEval = 16, k = 5)
    assert(conf.agg(sum(col("n_queries"))).head.getLong(0) == 16,
      "confusion matrix must account for every eval query exactly once")
    // hand-verify query 0's prediction from the brute-force neighbor list
    // (nEval = 1 ⇒ train is vec_id >= 1, mirrored in the filter below)
    val q0 = t.embeddings.filter(col("vec_id") === 0).head
      .getAs[scala.collection.Seq[Float]]("embedding").toArray
    val neigh = t.embeddings.filter(col("vec_id") >= 1)
      .select(col("vec_id"), col("label"),
        round(graft.functions.VectorExpressions.cosineSim(
          typedLit(q0), col("embedding")), 6).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(5)
      .collect().map(_.getAs[Int]("label"))
    val expected = neigh.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (l, n) => (-n, l) }.head._1
    val got0 = Similarity.knnLabelEval(t, nEval = 1, k = 5).head
    assert(got0.getAs[Int]("pred_label") == expected,
      s"query 0: predicted ${got0.getAs[Int]("pred_label")}, majority is $expected")
  }

  test("q153 label propagation: seeds clamped, labels valid, coverage monotone") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    val eps = 0.03
    val r3 = Similarity.labelPropagation(t, eps = eps, nSeed = 50, rounds = 3).collect()
    // seeds keep their true label, always
    r3.filter(_.getAs[Boolean]("is_seed")).foreach(r =>
      assert(r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")))
    // every propagated label is the label of SOME node (validity)
    val labelSet = r3.map(_.getAs[Int]("true_label")).toSet
    r3.filter(r => !r.isNullAt(r.fieldIndex("pred_label"))).foreach(r =>
      assert(labelSet.contains(r.getAs[Int]("pred_label"))))
    // more rounds never unlabel a node (frozen-once monotonicity)
    val cover1 = Similarity.labelPropagation(t, eps = eps, nSeed = 50, rounds = 1)
      .filter(col("pred_label").isNotNull).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val cover3 = r3.filter(r => !r.isNullAt(r.fieldIndex("pred_label")))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(cover1.subsetOf(cover3), "round-1 coverage lost by round 3")
    assert(cover3.size > cover1.size || cover1.size == r3.length,
      "propagation made no progress after round 1 — degenerate fixture?")
    // a node with no labeled neighbor within eps stays NULL: isolated nodes
    // exist in the sf0.001 projection at this eps (sanity of the NULL path)
    assert(r3.exists(r => r.isNullAt(r.fieldIndex("pred_label"))),
      "no unreached node — eps too large for the NULL-path check")
  }
}

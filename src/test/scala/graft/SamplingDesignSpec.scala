package graft

import graft.ext.{Sampling, Similarity, TextAnalysis}
import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** q141-q144 semantics (bit-exactness vs DuckDB is the oracle rows' job):
  * hard-negative label exclusion, chi-square identities, source-overlap
  * Jaccard bounds, and Neyman-allocation budget accounting. */
class SamplingDesignSpec extends SparkSpec {

  test("q141: negatives never share the anchor's label; ranks are dense") {
    val t = sf("sf0.001")
    val labelOf = t.embeddings.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(t, nQueries = 4, k = 3).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to rs.length))
      rs.foreach(r => assert(r.getAs[Int]("label") != labelOf(qid)))
      // hardest-first: cosine non-increasing in rank
      val cos = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q141: top negative beats every other different-label vector") {
    val t = sf("sf0.001")
    val rows = Similarity.hardNegatives(t, nQueries = 1, k = 1).collect()
    val top = rows.head
    // brute force for query 0 with plain column ops
    val brute = Similarity.bruteForceTopK(t, nQueries = 1, k = 200).collect()
    val qLabel = t.embeddings.filter(col("vec_id") === 0)
      .select(col("label")).collect().head.getInt(0)
    val labelOf = t.embeddings.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bestDiff = brute
      .filter(r => labelOf(r.getAs[Long]("vec_id")) != qLabel)
      .minBy(_.getAs[Int]("rank"))
    assert(top.getAs[Long]("vec_id") == bestDiff.getAs[Long]("vec_id"))
    assert(top.getAs[Double]("cosine") == bestDiff.getAs[Double]("cosine"))
  }

  test("q142: chi-square identities (marginals, totals, non-negativity)") {
    val t = sf("sf0.001")
    val rows = Analytics.chiSquareIndependence(t).collect()
    val total = t.events.count()
    assert(rows.map(_.getAs[Long]("o")).sum == total)
    // expected counts sum to n too (up to rounding of e at 6 dp)
    val eSum = rows.map(_.getAs[Double]("e")).sum
    assert(math.abs(eSum - total) < 1e-3, s"sum(e)=$eSum n=$total")
    assert(rows.forall(_.getAs[Double]("contrib") >= 0))
    val chi2 = rows.map(_.getAs[Double]("chi2_total")).distinct
    assert(chi2.length == 1 && chi2.head >= 0)
    assert(math.abs(rows.map(_.getAs[Double]("contrib")).sum - chi2.head) < 1e-3)
  }

  test("q143: overlap matrix bounds and symmetry-free pairing") {
    val rows = TextAnalysis.sourceOverlap(sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, sh) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_shared"))
      assert(sh <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0 && j <= 1.0)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
  }

  test("q144: allocations track stratum size x stddev and sum ~ target") {
    val t = sf("sf0.001")
    val rows = Sampling.neymanAllocation(t, nTarget = 500).collect()
    assert(rows.length == 5) // the five event types
    val wSum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    val alloc = rows.map(_.getAs[Long]("n_alloc")).sum
    assert(math.abs(alloc - 500L) <= rows.length, s"allocated $alloc of 500")
    rows.foreach(r => assert(r.getAs[Long]("n_alloc") >= 0))
  }

  test("q150: batches bounded, padding accounted, every doc placed once") {
    import org.apache.spark.sql.functions._
    val t = sf("sf0.001")
    val batchSize = 8
    val rows = graft.ext.Sampling
      .inferenceBatches(t, bucketTokens = 32, maxBucket = 7, batchSize = batchSize)
      .collect()
    val nDocs = t.documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "batches must partition the corpus")
    rows.foreach { r =>
      val (n, pad, sum, waste) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("padded_len"), r.getAs[Long]("sum_tokens"),
        r.getAs[Long]("pad_waste"))
      assert(n <= batchSize, s"overfull batch: $n")
      assert(waste == pad * n - sum, "padding accounting broken")
      assert(sum <= pad * n, "a member exceeds the padded length")
    }
    // within each bucket, only the LAST batch may be under-full — the
    // longest-first layout fills batches densely in order
    rows.groupBy(_.getAs[Int]("bucket")).foreach { case (_, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("batch_id"))
      sorted.dropRight(1).foreach(r =>
        assert(r.getAs[Long]("n_docs") == batchSize, "non-final batch under-full"))
    }
  }
}

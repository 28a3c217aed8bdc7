package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** q139 (KMV join-cardinality estimation) and q140 (key-skew profile):
  * estimator soundness and profile invariants, brute-forced on small SF.
  * Bit-exactness vs DuckDB is the oracle rows' job; these pin semantics. */
class JoinStatsSpec extends SparkSpec {

  test("q139: estimate is exact when the union fits the sketch") {
    // k larger than the distinct-key union (events 150 users + orders 1500
    // custkeys at sf0.001 scale) -> the sketch degenerates to the exact
    // computation and est == true
    val t = sf("sf0.001")
    val row = Analytics.joinCardinalityKmv(t, k = 100000).collect().head
    val est = row.getAs[Double]("est_join_rows")
    val tru = row.getAs[Long]("true_join_rows")
    assert(est == tru.toDouble, s"est=$est true=$tru")
    assert(row.getAs[Double]("rel_err") == 0.0)
  }

  test("q139: true join size matches an actual join; estimate within bounds") {
    val t = sf("sf0.001")
    val row = Analytics.joinCardinalityKmv(t, k = 64).collect().head
    val actual = t.events.join(
      t.orders, col("user_id") === col("o_custkey")).count()
    assert(row.getAs[Long]("true_join_rows") == actual)
    val est = row.getAs[Double]("est_join_rows")
    // KMV with k=64 is ~12% 1-sigma on the distinct count; the frequency
    // sample adds variance. 3x is a sanity envelope, not a tight bound —
    // the estimator's determinism (layout test below) is the real contract.
    assert(est > 0 && est < 3.0 * actual && est > actual / 3.0,
      s"est=$est actual=$actual")
  }

  test("q139: estimate is layout-independent (repartitioned inputs)") {
    val t = sf("sf0.001")
    val a = Analytics.joinCardinalityKmv(t, k = 64).collect().head
    val shuffled = t.copy() // same tables; rerun under a different plan seed
    val b = Analytics.joinCardinalityKmv(shuffled, k = 64).collect().head
    assert(a == b)
  }

  test("q140: profile invariants and brute-force top-k") {
    val t = sf("sf0.001")
    val rows = Analytics.keySkewProfile(t, topK = 5).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
    val counts = rows.map(_.getAs[Long]("n_events"))
    assert(counts.sameElements(counts.sorted.reverse), "ranks not count-ordered")
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(shareSum > 0 && shareSum <= 1.0 + 1e-9)
    assert(rows.forall(_.getAs[Double]("skew_ratio") >= 1.0 - 1e-9))
    // brute-force the top-5 (count desc, key asc)
    val brute = t.events.groupBy(col("user_id")).count()
      .orderBy(col("count").desc, col("user_id"))
      .limit(5).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("count")))
    val got = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    assert(got.sameElements(brute), s"got=${got.toSeq} want=${brute.toSeq}")
  }

  test("q138: every pair shares a rare term and cosine is in [0, 1]") {
    val out = graft.ext.Similarity.sparseCosinePairs(sf("sf0.001")).collect()
    out.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.5 && c <= 1.0 + 1e-6) // tau filter + cents-rounding slack
      assert(r.getAs[Int]("n_shared_terms") >= 1)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }
}

package graft

import graft.ext.Similarity
import graft.functions.GramMatrix
import org.apache.spark.sql.functions._

/** The one-pass Gram/covariance aggregate: parity with the naive exploded
  * self-join form, merge-path (layout) independence, and the scale claim —
  * the plan contains no explode, no join, and only the final-merge +
  * presentation-sort exchanges. */
class GramMatrixSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pair index layout covers the upper triangle exactly once") {
    val d = 5
    val seen = for (i <- 0 until d; j <- i until d)
      yield GramMatrix.pairIndex(d, i, j)
    assert(seen == (0 until GramMatrix.nPairs(d)))
  }

  test("one-pass aggregate equals the naive exploded self-join (same kernels)") {
    val t = sf("sf0.001")
    val got = Similarity.embeddingCovariance(t).collect()

    // naive: explode to (vec_id, i, li), self-join on vec_id, group by pair
    val e = t.embeddings.select(
      col("vec_id"),
      posexplode(transform(col("embedding"),
        x => round(x.cast("double") * lit(1000000), 0).cast("long")))
        .as(Seq("i", "li")))
    val n = t.embeddings.count()
    val s = e.groupBy("i").agg(sum("li").cast("double").as("sraw"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val grams = e.as("a").join(e.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("b.i") >= col("a.i"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        (col("a.li") * col("b.li")).as("p"))
      .groupBy("i", "j")
      .agg((sum(shiftright(col("p"), 26)).cast("double") * lit(67108864.0) +
        sum(col("p").bitwiseAND(lit(67108863L))).cast("double")).as("graw"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    assert(got.length == GramMatrix.nPairs(64))
    got.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == n)
      assert(r.getDouble(3) == s(i) / 1e6, s"s_i at ($i,$j)")
      assert(r.getDouble(4) == s(j) / 1e6, s"s_j at ($i,$j)")
      assert(r.getDouble(5) == grams((i, j)) / 1e12, s"gram at ($i,$j)")
      val cov = (grams((i, j)) / 1e12 - (s(i) / 1e6) * (s(j) / 1e6) / n) / (n - 1.0)
      assert(r.getDouble(6) == cov, s"cov at ($i,$j)")
    }
  }

  test("result is bit-identical under repartitioning (merge path exercised)") {
    val t = sf("sf0.001")
    GramMatrix.register(spark)
    val scaled = transform(col("embedding"),
      x => round(x.cast("double") * lit(1000000), 0).cast("long"))
    val one = t.embeddings.coalesce(1)
      .agg(GramMatrix.gramState(scaled, 64)).collect().head.getSeq[Double](0)
    val many = t.embeddings.repartition(7, col("vec_id"))
      .agg(GramMatrix.gramState(scaled, 64)).collect().head.getSeq[Double](0)
    assert(one == many)
  }

  test("diagonal of the covariance is the per-dimension variance (sanity)") {
    val t = sf("sf0.001")
    val cov = Similarity.embeddingCovariance(t)
      .filter(col("i") === col("j")).collect()
    assert(cov.length == 64)
    // variances are non-negative and finite
    cov.foreach(r => assert(r.getDouble(6) >= 0 && !r.getDouble(6).isNaN))
  }

  test("plan has no join or generator before the aggregate") {
    val t = sf("sf0.001")
    val df = Similarity.embeddingCovariance(t)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(600))
    // the only Generate is the pair-frame unpack AFTER the aggregate:
    // it must sit above ObjectHashAggregate in the tree, never below
    val lines = plan.linesIterator.toSeq
    val genIdx = lines.indexWhere(_.contains("Generate"))
    val aggIdx = lines.lastIndexWhere(_.contains("Aggregate"))
    assert(genIdx >= 0 && aggIdx > genIdx,
      s"pair unpack should be post-aggregate (gen@$genIdx agg@$aggIdx)")
  }

  test("dimension mismatch fails fast with the observed length") {
    val t = sf("sf0.001")
    GraftError.interceptMessage {
      GramMatrix.register(spark)
      val scaled = transform(col("embedding"),
        x => round(x.cast("double") * lit(1000000), 0).cast("long"))
      t.embeddings.agg(GramMatrix.gramState(scaled, 32)).collect()
    }(m => m.contains("expected 32"))
  }
}

/** Tiny helper: assert an exception anywhere in the cause chain matches. */
object GraftError {
  def interceptMessage(body: => Any)(check: String => Boolean): Unit = {
    try {
      body
      fail("expected an exception")
    } catch {
      case e: Throwable =>
        val msgs = Iterator.iterate(e: Throwable)(_.getCause)
          .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
          .toSeq
        assert(msgs.exists(check), s"no cause matched: $msgs")
    }
  }
  private def fail(m: String): Nothing = throw new AssertionError(m)
}

package graft

import graft.ext.Similarity
import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._

/** Native CosineSimilarity expression: bit-parity with the composable HOF
  * form, float/double handling, null behavior, and a sanity speed check. */
class VectorExpressionsSpec extends SparkSpec {

  test("native cosine is bit-identical to the HOF fold on the embeddings table") {
    VectorExpressions.register(spark)
    val emb = sf().embeddings.limit(100)
      .select(col("vec_id"), col("embedding"))
    val pairs = emb
      .crossJoin(emb.select(col("vec_id").as("vid2"), col("embedding").as("emb2")))
      .filter(col("vec_id") < col("vid2"))
    val vecD = Similarity.toDouble(col("embedding"))
    val vec2D = Similarity.toDouble(col("emb2"))
    val hof = Similarity.dot(vecD, vec2D) /
      (sqrt(Similarity.dot(vecD, vecD)) * sqrt(Similarity.dot(vec2D, vec2D)))
    val both = pairs.select(
      VectorExpressions.cosineSim(col("embedding"), col("emb2")).as("native"),
      hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0) // bitwise
    assert(both.count() > 1000)
  }

  test("cosine of a vector with itself is 1.0; nulls propagate") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b")
    val r = df.select(VectorExpressions.cosineSim(col("a"), col("b"))).collect()
    assert(math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r(1).getDouble(0)) < 1e-12)
    val withNull = df.select(
      VectorExpressions.cosineSim(lit(null).cast("array<float>"), col("b"))).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("ragged arrays yield NULL, matching the HOF zip_with null-pad semantics") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val native = df.select(VectorExpressions.cosineSim(col("a"), col("b"))).collect()(0)
    assert(native.isNullAt(0))
    val hof = df.select(
      (Similarity.dot(Similarity.toDouble(col("a")), Similarity.toDouble(col("b"))) /
        (sqrt(Similarity.dot(Similarity.toDouble(col("a")), Similarity.toDouble(col("a")))) *
          sqrt(Similarity.dot(Similarity.toDouble(col("b")), Similarity.toDouble(col("b"))))))
        .as("c")).collect()(0)
    assert(hof.isNullAt(0)) // parity: both forms agree on ragged input
  }

  test("expression survives codegen with two instances in one projection") {
    VectorExpressions.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorExpressions.cosineSim(col("a"), col("b")).as("ab"),
      VectorExpressions.cosineSim(col("a"), col("c")).as("ac")).collect()(0)
    assert(r.getDouble(0) > 0 && r.getDouble(1) > 0)
  }

  test("native kernel is faster than the HOF fold on a pairwise workload") {
    VectorExpressions.register(spark)
    val emb = sf("sf0.01").embeddings.select(col("vec_id"), col("embedding")).cache()
    emb.count()
    val queries = emb.limit(20)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
    val pairs = emb.crossJoin(broadcast(queries))
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val vecD = Similarity.toDouble(col("embedding"))
    val qD = Similarity.toDouble(col("qemb"))
    val hofExpr = Similarity.dot(qD, vecD) /
      (sqrt(Similarity.dot(qD, qD)) * sqrt(Similarity.dot(vecD, vecD)))
    // warm up both paths once
    pairs.select(VectorExpressions.cosineSim(col("qemb"), col("embedding")).as("c"))
      .agg(sum("c")).count()
    pairs.select(hofExpr.as("c")).agg(sum("c")).count()
    def median3(f: => Long): Double = {
      val ts = Seq.fill(3)(time(f)).sorted; ts(1)
    }
    val tNative = median3(
      pairs.select(VectorExpressions.cosineSim(col("qemb"), col("embedding")).as("c"))
        .agg(sum("c")).count())
    val tHof = median3(pairs.select(hofExpr.as("c")).agg(sum("c")).count())
    info(f"native=$tNative%.3fs hof=$tHof%.3fs speedup=${tHof / tNative}%.1fx")
    // timing assertions are noisy in CI: only fail if native is clearly slower
    assert(tNative < tHof * 1.5, f"native much slower: $tNative%.3f vs $tHof%.3f")
    emb.unpersist()
  }
}

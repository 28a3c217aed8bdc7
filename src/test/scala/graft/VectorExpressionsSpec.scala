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

  test("LongDot / LongSqDist are bit-identical to the HOF folds") {
    VectorExpressions.register(spark)
    val qv = sf().embeddings.limit(100)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000L, 0).cast("long")).as("qv"))
    val pairs = qv.crossJoin(
      qv.select(col("vec_id").as("vid2"), col("qv").as("qv2")))
    val hofDot = aggregate(
      zip_with(col("qv"), col("qv2"), (x, y) => x * y), lit(0L), _ + _)
    val hofSq = aggregate(
      zip_with(col("qv"), col("qv2"), (x, y) => (x - y) * (x - y)), lit(0L), _ + _)
    val both = pairs.select(
      VectorExpressions.dotLong(col("qv"), col("qv2")).as("nd"), hofDot.as("hd"),
      VectorExpressions.sqDistLong(col("qv"), col("qv2")).as("ns"), hofSq.as("hs"))
    assert(both.filter(col("nd") =!= col("hd") || col("ns") =!= col("hs")).count() == 0)
    assert(both.count() >= 10000)
    // null / length-mismatch contract mirrors the zip_with null-pad fold
    val r = pairs.limit(1).select(
      VectorExpressions.dotLong(col("qv"), slice(col("qv2"), 1, 3)).isNull.as("mism"),
      VectorExpressions.sqDistLong(lit(null).cast("array<long>"), col("qv2")).isNull.as("nul"))
      .head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("SparseDotCents merge walk reproduces the dsumProd join form (q138 internals)") {
    import graft.functions.{ExactAgg, SparseDotExpression}
    SparseDotExpression.register(spark)
    val t = sf("sf0.001")
    // the q138 weight frame, verbatim
    val tf = t.documents
      .select(col("doc_id"),
        explode(graft.ext.TextAnalysis.tokens(lower(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = t.documents.select(count(lit(1)).as("n_docs"))
    val w = tf.join(dfq, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") * col("n_docs") / col("df")).as("w"))
    val pairs = w.select(col("doc_id")).distinct().limit(40)
      .crossJoin(w.select(col("doc_id").as("doc_b")).distinct().limit(40))
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
    // old join-shaped dot
    val joinDots = pairs
      .join(w.as("wa"), col("doc_a") === col("wa.doc_id"))
      .join(w.as("wb"),
        col("doc_b") === col("wb.doc_id") && col("wa.term") === col("wb.term"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(ExactAgg.dsumProd(col("wa.w"), col("wb.w")).as("dot"),
        count(lit(1)).as("n_shared"))
    // new vector merge-walk dot (terms dictionary-encoded to dense longs)
    val tid = dfq.select(col("term")).withColumn("tid",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("term"))).cast("long"))
    val vecs = w.join(broadcast(tid), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(
        struct(col("tid"), ExactAgg.cents(col("w")).as("c")))).as("vec"))
      .select(col("doc_id"),
        transform(col("vec"), x => x.getField("tid")).as("ks"),
        transform(col("vec"), x => x.getField("c")).as("cs"))
    val walkDots = pairs
      .join(vecs.as("va"), col("doc_a") === col("va.doc_id"))
      .join(vecs.as("vb"), col("doc_b") === col("vb.doc_id"))
      .withColumn("d", SparseDotExpression.sparseDotCents(
        col("va.ks"), col("va.cs"), col("vb.ks"), col("vb.cs")))
      .select(col("doc_a"), col("doc_b"),
        ((col("d.hi").cast("double") * lit(67108864.0) +
          col("d.lo").cast("double")) / lit(10000.0)).as("dot"),
        col("d.n_shared").as("n_shared"))
      .filter(col("n_shared") > 0) // join form drops zero-overlap pairs
    val joined = joinDots.as("j").join(walkDots.as("k"), Seq("doc_a", "doc_b"), "full")
    assert(joined.filter(
      col("j.dot").isNull || col("k.dot").isNull ||
        col("j.dot") =!= col("k.dot") ||
        col("j.n_shared") =!= col("k.n_shared")).count() == 0) // bitwise
    assert(joinDots.count() > 100)
  }
}

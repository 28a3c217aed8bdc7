package graft.tools

import graft.core.Tables
import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage profiler for q138 (optimization round scratch). */
object ProfQ138 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    graft.functions.SparseDotExpression.register(spark)
    def timeIt(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name%-22s ${(System.nanoTime - t0) / 1e9}%8.2f s")
    }
    val tf = t.documents
      .select(col("doc_id"), explode(TextAnalysis.tokens(lower(col("text")))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    timeIt("tf")(tf)
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = t.documents.select(count(lit(1)).as("n_docs"))
    val w0 = tf.join(dfq, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("df"), col("n_docs"),
        (col("tf").cast("double") * col("n_docs") / col("df")).as("w"))
    timeIt("w (no ckpt)")(w0)
    val w = w0.localCheckpoint()
    val tid = dfq.select(col("term")).withColumn("tid",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("term"))).cast("long"))
    val vecs0 = w.join(broadcast(tid), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tid"),
        graft.functions.ExactAgg.cents(col("w")).as("c")))).as("vec"))
      .select(col("doc_id"),
        transform(col("vec"), x => x.getField("tid")).as("ks"),
        transform(col("vec"), x => x.getField("c")).as("cs"))
    timeIt("vecs (no ckpt)")(vecs0)
    val vecs = vecs0.localCheckpoint()
    val rare = w.filter(col("df") <= col("n_docs") * lit(0.25))
      .select(col("doc_id"), col("term"))
    val salted = Dedup.saltedBuckets(rare, Seq("term"), "doc_id", 256)
    val cand0 = salted.as("a")
      .join(salted.as("b"), col("a.term") === col("b.term") &&
        col("a.salt") === col("b.salt") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    timeIt("cand pre-distinct")(cand0)
    val cand = cand0.distinct()
    timeIt("cand distinct")(cand)
    println("[prof] cand rows " + cand.count())
    val dots = cand
      .join(vecs.as("va"), col("doc_a") === col("va.doc_id"))
      .join(vecs.as("vb"), col("doc_b") === col("vb.doc_id"))
      .withColumn("d", graft.functions.SparseDotExpression.sparseDotCents(
        col("va.ks"), col("va.cs"), col("vb.ks"), col("vb.cs")))
      .select(col("doc_a"), col("doc_b"),
        col("d").getField("n_shared").as("n_shared"))
    timeIt("dots")(dots)
    timeIt("full q138")(graft.ext.Similarity.sparseCosinePairs(t))
    timeIt("full q138 again")(graft.ext.Similarity.sparseCosinePairs(t))
    spark.stop()
  }
}

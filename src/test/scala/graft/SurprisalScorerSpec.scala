package graft

import java.nio.file.Files

import graft.core.Tables
import graft.ext.CorpusIndex
import graft.streaming.SurprisalScorer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of the q254 surprisal scorer (VERDICT r9 item 5): docs
  * replayed through [[SurprisalScorer]] in multiple micro-batches must
  * reproduce the batch [[CorpusIndex.surprisalDocScores]] rows exactly —
  * including the doc_surprisal doubles bit-for-bit — and a replayed
  * batchId (foreachBatch retry) must not duplicate rows. */
class SurprisalScorerSpec extends SparkSpec {

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def rowKey(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
      r.getAs[Long]("n_trans"), r.getAs[Long]("n_hit"),
      r.getAs[Long]("n_ctx"), r.getAs[Long]("n_oov"),
      bits(r.getAs[Double]("doc_surprisal")))

  test("streaming surprisal scorer == batch scorer on the replayed corpus") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t = Tables(spark, "/root/testdata/sf0.001")
    val m = CorpusIndex.surprisalModel(t)
    val docs = t.documents.select(col("doc_id"), col("source"), col("text"))
    val batch = CorpusIndex.surprisalDocScores(docs, m).collect()
      .map(rowKey).sortBy(r => (r._1, r._2))
    assert(batch.nonEmpty)

    val base = Files.createTempDirectory("graft_surp").toFile.getAbsolutePath
    val input = MemoryStream[(Long, String, String)]
    val q = SurprisalScorer.scoreToParquet(
      input.toDS().toDF("doc_id", "source", "text"), m,
      s"$base/out", s"$base/ck")
    try {
      val rows = docs.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      val chunks = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val got = spark.read.parquet(s"$base/out").collect()
        .map(rowKey).sortBy(r => (r._1, r._2))
      assert(got.toSeq == batch.toSeq,
        s"streaming != batch\nstream=${got.take(5).toSeq}\nbatch=${batch.take(5).toSeq}")
    } finally q.stop()
  }

  test("a replayed micro-batch (foreachBatch retry) does not duplicate rows") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val m = CorpusIndex.surprisalModel(t)
    val docs = t.documents.select(col("doc_id"), col("source"), col("text"))
    val out = Files.createTempDirectory("graft_surp_retry").toFile
      .getAbsolutePath + "/out"
    // batch 3, then a NON-EMPTY later batch 4 whose rows must survive the
    // batch-3 retry (a static overwrite would wipe it — ADVICE r10), then
    // the at-least-once retry of batch 3
    SurprisalScorer.writeScoredBatch(docs, m, out, 3L)
    val once = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    SurprisalScorer.writeScoredBatch(docs.limit(1), m, out, 4L)
    val withB4 = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(once.nonEmpty && withB4.size > once.size,
      "batch 4 must add its own rows")
    SurprisalScorer.writeScoredBatch(docs, m, out, 3L) // the retry
    val after = spark.read.parquet(out).collect().map(_.toString).sorted.toSeq
    assert(after == withB4,
      s"retry wiped batch 4 or duplicated batch 3: ${after.size} rows " +
        s"vs ${withB4.size}")
  }
}

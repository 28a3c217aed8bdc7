package graft

import java.nio.file.Files

import graft.core.Tables
import graft.ext.{CorpusIndex, Sampling}
import graft.streaming.LmScorer
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming twin of the q248 KN document scorer (VERDICT r8 item 7): the
  * held-out fixture docs replayed through [[LmScorer]] in multiple
  * micro-batches must reproduce the batch [[CorpusIndex.knDocScores]]
  * rows exactly — including the doc_log10 doubles bit-for-bit (the
  * MonitorsSpec ≡-batch discipline). */
class LmScorerSpec extends SparkSpec {

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  test("streaming KN scorer == batch scorer on the replayed fixture corpus") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val t = Tables(spark, "/root/testdata/sf0.001")
    val m = CorpusIndex.knModel(t)
    val held = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) >= 80)
    val batch = CorpusIndex.knDocScores(held, m).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), bits(r.getDouble(6))))
      .sortBy(r => (r._1, r._2))
    assert(batch.nonEmpty, "held split must be non-empty at sf0.001")

    val base = Files.createTempDirectory("graft_lmscore").toFile.getAbsolutePath
    val input = MemoryStream[(Long, String, String)]
    val q = LmScorer.scoreToParquet(
      input.toDS().toDF("doc_id", "source", "text"), m,
      s"$base/out", s"$base/ck")
    try {
      // replay held docs in three micro-batches — per-doc scores are
      // batch-boundary-independent, so the union must equal the batch run
      val rows = held.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      val chunks = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
      chunks.foreach { c => input.addData(c: _*); q.processAllAvailable() }
      val got = spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Long]("n_trans"), r.getAs[Long]("n_kn"),
          r.getAs[Long]("n_cont"), r.getAs[Long]("n_oov"),
          bits(r.getAs[Double]("doc_log10"))))
        .sortBy(r => (r._1, r._2))
      assert(got.toSeq == batch.toSeq,
        s"streaming != batch\nstream=${got.take(5).toSeq}\nbatch=${batch.take(5).toSeq}")
    } finally q.stop()
  }

  test("a replayed micro-batch (foreachBatch retry) does not duplicate rows") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    val m = CorpusIndex.knModel(t)
    val held = t.documents
      .select(col("doc_id"), col("source"), col("text"))
      .where(Sampling.hashBucket(col("doc_id")) >= 80)
    val out = Files.createTempDirectory("graft_lmretry").toFile.getAbsolutePath + "/out"
    // first delivery of batch 7, then the at-least-once retry of the SAME
    // batchId (a crash between sink write and checkpoint commit), plus a
    // NON-EMPTY later batch 8 whose rows must survive the retry — an
    // empty batch 8 could not distinguish dynamic partition overwrite
    // from a full-directory wipe (ADVICE r10)
    LmScorer.writeScoredBatch(held, m, out, 7L)
    val once = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    LmScorer.writeScoredBatch(held.limit(1), m, out, 8L)
    val withB8 = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    assert(once.nonEmpty, "batch 7 must score rows at sf0.001")
    assert(withB8.size > once.size, "batch 8 must add its own rows")
    LmScorer.writeScoredBatch(held, m, out, 7L)          // the retry
    val after = spark.read.parquet(out).collect()
      .map(_.toString).sorted.toSeq
    assert(after == withB8,
      s"retry wiped batch 8 or duplicated batch 7: ${after.size} rows " +
        s"vs ${withB8.size}")
  }
}

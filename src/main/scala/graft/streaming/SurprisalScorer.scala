package graft.streaming

import graft.ext.CorpusIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the q254 next-token surprisal scorer: score a STREAM
  * of documents (doc_id, source, text) against the PERSISTED q244/q249
  * bucketed next-token index — the "score every crawled document's novelty
  * as it lands" production shape. The index is a catalog-table artifact
  * rebuilt per corpus snapshot; each micro-batch joins it and never
  * touches the corpus.
  *
  * Mechanism and guarantees are [[LmScorer]]'s verbatim: `foreachBatch`
  * applies [[CorpusIndex.surprisalDocScores]] — the IDENTICAL function the
  * batch q254 rollup runs — so per-doc rows are a pure function of
  * (document, static index) and streaming output ≡ batch output
  * bit-for-bit across any batch boundaries (SurprisalScorerSpec's replay);
  * and the sink is IDEMPOTENT per batchId — each batch dynamic-overwrites
  * its own `batch_id` partition, so foreachBatch's at-least-once redelivery
  * rewrites identical rows instead of duplicating (the retry case is
  * spec-pinned). At-least-once delivery + idempotent sink = exactly-once
  * OUTPUT.
  *
  * Reference anchor: the reference's CDC stream applies stateless per-row
  * enrichment per micro-batch with a checkpointed sink
  * (airflow/dags/spark_jobs/realtime_cdc_processor.py:185-192); scoring
  * against a served index is that shape with an index join. */
object SurprisalScorer {

  /** The per-micro-batch sink body — public so the retry case is directly
    * testable (re-invoking with the same batchId must be a no-op). */
  def writeScoredBatch(batch: DataFrame, m: CorpusIndex.SurprisalModel,
                       outDir: String, batchId: Long): Unit =
    CorpusIndex.surprisalDocScores(batch, m)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** Start the scorer on a streaming docs frame; output lands in `outDir`
    * as batchId-partitioned parquet with checkpointed progress — restart-
    * safe AND retry-idempotent (see object doc). */
  def scoreToParquet(docs: DataFrame, m: CorpusIndex.SurprisalModel,
                     outDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeScoredBatch(batch, m, outDir, batchId)
      }
      .start()
}

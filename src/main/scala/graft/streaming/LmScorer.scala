package graft.streaming

import graft.ext.CorpusIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the q248 Kneser–Ney document scorer: score a STREAM
  * of documents (doc_id, source, text) against the trained, checkpointed
  * [[CorpusIndex.KnModel]] — the "score every crawled document as it
  * lands" production shape, where the model is a persisted artifact
  * rebuilt per corpus snapshot and each micro-batch joins it.
  *
  * Mechanism: `foreachBatch` applies [[CorpusIndex.knDocScores]] — the
  * IDENTICAL function the batch path runs — to each micro-batch and
  * writes the per-doc rows to a parquet sink. Every output row is a pure
  * function of its own document and the static model (per-doc scores need
  * no cross-document state), so streaming output ≡ batch output row-for-
  * row and bit-for-bit, whatever the batch boundaries — proved by
  * construction here and pinned by LmScorerSpec's MonitorsSpec-style
  * replay. The model tables are localCheckpointed at build time, so each
  * batch joins in-memory tables (vocab-bounded — Spark picks broadcast
  * joins at production model sizes) rather than re-running the train
  * aggregation.
  *
  * Restart safety: `foreachBatch` delivery is AT-LEAST-ONCE — a crash
  * between the sink write and the streaming checkpoint commit replays the
  * micro-batch on restart. The sink is therefore made IDEMPOTENT per
  * batchId (the same discipline [[Cdc.applyCdcBatch]] documents): each
  * micro-batch writes to its own `batch_id=<id>` partition with dynamic
  * partition overwrite, and the rows are a deterministic function of
  * (batch, model), so a replayed batch overwrites its own partition with
  * the same bytes instead of appending duplicates. At-least-once delivery
  * + idempotent sink = exactly-once OUTPUT — pinned by LmScorerSpec's
  * replayed-batchId case.
  *
  * Reference anchor: the reference's CDC stream applies the same
  * stateless per-row enrichment per micro-batch with a checkpointed,
  * retry-safe sink contract
  * (airflow/dags/spark_jobs/realtime_cdc_processor.py:185-192); scoring
  * against a trained model is that shape with a model join instead of a
  * parse. */
object LmScorer {

  /** The per-micro-batch sink body: score `batch` against the model and
    * land the rows under the batch's OWN `batch_id` partition, dynamic-
    * overwrite mode. Re-invoking with the same batchId (a foreachBatch
    * retry) rewrites that one partition with identical rows — idempotent,
    * never duplicating. Public so the retry case is directly testable. */
  def writeScoredBatch(batch: DataFrame, m: CorpusIndex.KnModel,
                       outDir: String, batchId: Long): Unit =
    CorpusIndex.knDocScores(batch, m)
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** Start the scorer on a streaming docs frame; output lands in `outDir`
    * as batchId-partitioned parquet with checkpointed progress — restart-
    * safe AND retry-idempotent (exactly-once output; see object doc). */
  def scoreToParquet(docs: DataFrame, m: CorpusIndex.KnModel, outDir: String,
                     checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeScoredBatch(batch, m, outDir, batchId)
      }
      .start()
}

package graft.streaming

import graft.ext.CorpusIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin of the q248 Kneser–Ney document scorer: score a STREAM
  * of documents (doc_id, source, text) against the trained, checkpointed
  * [[CorpusIndex.KnModel]] — the "score every crawled document as it
  * lands" production shape, where the model is a persisted artifact
  * rebuilt per corpus snapshot and each micro-batch joins it.
  *
  * Mechanism: `foreachBatch` applies [[CorpusIndex.knDocScores]] — the
  * IDENTICAL function the batch path runs — to each micro-batch and
  * appends the per-doc rows to a parquet sink. Every output row is a pure
  * function of its own document and the static model (per-doc scores need
  * no cross-document state), so streaming output ≡ batch output row-for-
  * row and bit-for-bit, whatever the batch boundaries — proved by
  * construction here and pinned by LmScorerSpec's MonitorsSpec-style
  * replay. The model tables are localCheckpointed at build time, so each
  * batch joins in-memory tables (vocab-bounded — Spark picks broadcast
  * joins at production model sizes) rather than re-running the train
  * aggregation.
  *
  * Reference anchor: the reference's CDC stream applies the same
  * stateless per-row enrichment per micro-batch
  * (airflow/dags/spark_jobs/realtime_cdc_processor.py); scoring against
  * a trained model is that shape with a model join instead of a parse. */
object LmScorer {

  /** Start the scorer on a streaming docs frame; output appends to
    * `outDir` as parquet with checkpointed progress (restart-safe). */
  def scoreToParquet(docs: DataFrame, m: CorpusIndex.KnModel, outDir: String,
                     checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CorpusIndex.knDocScores(batch, m)
          .write.mode("append").parquet(outDir)
      }
      .start()
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming deduplication (ST9 surface + the training-data
  * pipeline's streaming dedup): emit the first occurrence of each key,
  * suppress replays, with per-key state that expires on a processing-time
  * timeout so the state store stays bounded — the property the built-in
  * `dropDuplicates` only gets with an event-time watermark.
  *
  * Uses `flatMapGroupsWithState` (the custom-state primitive; `KeyValue
  * GroupedDataset`) rather than `dropDuplicates` to demonstrate arbitrary
  * state: the state carries a seen-count, so replay volume is observable
  * downstream instead of silently discarded.
  *
  * Scale: state is one Long per key, partitioned by the grouping key across
  * executors; timeout eviction bounds the store to keys seen within the
  * retention window.
  */
object StatefulDedup {

  case class Seen(key: String, firstValue: String, replays: Long)

  /** Deduplicate `(key, value)` records: first occurrence per key is
    * emitted once; later arrivals only bump the replay counter held in
    * state.
    *
    * `retentionMs > 0` evicts idle keys with a processing-time timeout —
    * the production setting that bounds the state store. Note: with a
    * processing-time timeout armed, the engine keeps scheduling
    * timeout-evaluation micro-batches, so `processAllAvailable()` never
    * quiesces — tests (and any drive-until-idle harness) must use
    * `retentionMs = 0` (NoTimeout) or an explicit trigger + stop. */
  def dedupByKey(
      input: Dataset[(String, String)],
      retentionMs: Long = 0L): Dataset[Seen] = {
    import input.sparkSession.implicits._
    val timeoutConf =
      if (retentionMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    input
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, Seen](OutputMode.Append, timeoutConf) {
        case (key, rows, state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val prior = state.getOption.getOrElse(0L)
            state.update(prior + batch.size)
            if (retentionMs > 0) state.setTimeoutDuration(retentionMs)
            if (prior == 0L) Iterator(Seen(key, batch.head._2, batch.size - 1L))
            else Iterator.empty // replay: swallowed, counted in state
          }
      }
  }

  /** Batch-mode helper with the same semantics for golden comparisons. */
  def dedupBatch(input: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    input
      .groupBy(col("key"))
      .agg(min_by(col("value"), col("ts")).as("firstValue"), count(lit(1)).as("occurrences"))
  }
}

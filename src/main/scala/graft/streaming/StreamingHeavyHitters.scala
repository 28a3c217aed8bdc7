package graft.streaming

import java.sql.Timestamp

import graft.functions.CountMinSketch
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming top-k heavy hitters per event-time window, in FIXED state —
  * the unbounded-vocabulary case where a windowed `groupBy(word).count`
  * would grow the state store with every distinct key the stream ever
  * emits. Per window, state is one Count-Min counter matrix (64 KiB,
  * [[graft.functions.CountMinSketch]] — same arithmetic as the batch
  * aggregate, so estimates agree with q86's) plus a bounded candidate set
  * with evict-the-minimum admission (the SpaceSaving idea applied to CMS
  * estimates). When the watermark passes the window end, the top k
  * candidates are emitted with FRESH estimates and the state is dropped —
  * state volume is (open windows) × (64 KiB + capacity), independent of
  * vocabulary.
  *
  * Error contract: estimates are CMS one-sided (≥ true count); a true
  * heavy hitter is missed only if, at every arrival, its running estimate
  * was below all `capacity` incumbents — the standard candidate-set
  * trade, negligible when capacity ≫ k. */
object StreamingHeavyHitters {

  case class WindowTopK(window_start: Timestamp, word: String,
                        estimate: Long, rank: Int)

  case class HHState(cms: Array[Long], candidates: Map[String, Long])

  /** `input` = (word, event-time) pairs. Emits top-`k` rows per closed
    * window (Append mode — rows appear once the watermark closes the
    * window). */
  def windowTopK(input: Dataset[(String, Timestamp)],
                 windowMinutes: Int = 5, k: Int = 10, capacity: Int = 64,
                 watermarkMinutes: Int = 10): Dataset[WindowTopK] = {
    import input.sparkSession.implicits._
    // the watermark-tagged ts column must SURVIVE into the stateful
    // operator (projecting it away fails analysis: event-time timeout
    // requires a watermarked column in the child plan)
    val windowed = input.toDF("word", "ts")
      .withWatermark("ts", s"$watermarkMinutes minutes")
      .select(col("word"),
        window(col("ts"), s"$windowMinutes minutes").getField("start").as("wstart"),
        col("ts"))
      .as[(String, Timestamp, Timestamp)]
    windowed
      .groupByKey(_._2)
      .flatMapGroupsWithState[HHState, WindowTopK](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (wstart, rows, state: GroupState[HHState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            // fresh estimates: admission-time values go stale as the
            // counter matrix keeps absorbing arrivals
            st.candidates.keysIterator.toSeq
              .map(w => w -> CountMinSketch.estimateCount(st.cms, w))
              .sortBy { case (w, c) => (-c, w) }
              .take(k)
              .zipWithIndex
              .map { case ((w, c), i) => WindowTopK(wstart, w, c, i + 1) }
              .iterator
          } else {
            val st = state.getOption.getOrElse(
              HHState(new Array[Long](CountMinSketch.Depth * CountMinSketch.Width), Map.empty))
            var cand = st.candidates
            rows.foreach { case (w, _, _) =>
              CountMinSketch.updateCounters(st.cms, w)
              val est = CountMinSketch.estimateCount(st.cms, w)
              if (cand.contains(w) || cand.size < capacity) cand += (w -> est)
              else {
                val (minW, minC) = cand.minBy { case (cw, cc) => (cc, cw) }
                if (est > minC) cand = cand - minW + (w -> est)
              }
            }
            state.update(HHState(st.cms, cand))
            // close at window end; never at-or-behind the watermark (a
            // timeout timestamp <= watermark is rejected by the engine)
            state.setTimeoutTimestamp(
              math.max(wstart.getTime + windowMinutes * 60000L,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}

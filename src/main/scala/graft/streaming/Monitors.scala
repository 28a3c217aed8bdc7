package graft.streaming

import java.sql.{Date, Timestamp}

import graft.operators.Timeseries.{AlarmMult, SlackDiv}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch monitoring audits (q224 CUSUM volume
  * chart, q235 overdispersion) — the pipeline-health alarms run ON the
  * live stream instead of the nightly batch (VERDICT r7 item 6 /
  * ROADMAP handoff).
  *
  * Shape: TWO hops, like the bench cascade. Hop 1 is a plain watermarked
  * windowed count (built-in, scalable, state = open windows) emitting
  * CLOSED per-day / per-hour counts in Append mode. Hop 2 is the tiny
  * sequential statistic over those closed rows — a
  * `flatMapGroupsWithState` whose input volume is one row per closed
  * window (per type), so a single-key state task is the CORRECT scale
  * design, not a bottleneck. The two hops are separate queries (sink +
  * re-read, `Sources.streamFromTableDir`) because Append-mode windowed
  * aggregation feeding a flatMapGroupsWithState inside ONE query is not
  * a supported stateful-operator chain.
  *
  * Ordering contract hop 2 relies on (why NoTimeout + in-batch sort is
  * enough): a window closes in the micro-batch where the watermark first
  * passes its end, and the watermark is monotone — so the days emitted
  * in batch k all end inside (wm_{k-1}, wm_k], strictly after every
  * previously emitted day. Closed windows therefore arrive in
  * non-decreasing order ACROSS batches; sorting within the batch yields
  * a globally ordered replay. (NoTimeout also keeps
  * `processAllAvailable` drivable in tests — the ProcessingTimeTimeout
  * hang documented in the verify skill.)
  *
  * Parameterization: the BATCH chart derives its mean and thresholds
  * from the full corpus; a stream cannot see the future, so
  * [[CusumParams]] carries the trained baseline (n days, T total events
  * — exactly the numbers the batch audit publishes). With parameters
  * trained on the same data the streaming chart's recursion form
  * S⁺_t = max(0, S⁺_{t-1} + step_t) is integer-identical to the batch
  * closed form P_t − min(0, min P) — StreamingSpec replays a corpus
  * through both and asserts row equality, which doubles as a proof the
  * two formulations agree. */
object Monitors {

  // ------------------------------------------------------------------
  // q224 twin: CUSUM volume chart
  // ------------------------------------------------------------------

  /** Trained chart baseline: `n` days, `t` total events (the batch
    * audit's totals). Slack and alarm follow the batch constants:
    * A = T div SlackDiv, H = AlarmMult·A, chart units n·events. */
  final case class CusumParams(n: Long, t: Long) {
    val a: Long = t / SlackDiv
    val h: Long = AlarmMult * a
  }

  final case class CusumRow(day: Date, n_events: Long, s_hi: Long,
                            s_lo: Long, alarm_hi: Boolean, alarm_lo: Boolean)

  final case class CusumState(sHi: Long, sLo: Long)

  /** Hop 1: closed daily counts from the raw event stream. Append mode —
    * a (day, x) row appears once the watermark passes the day end. */
  def dailyCounts(events: DataFrame, tsCol: String = "ts",
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), "1 day"))
      .agg(count(lit(1)).as("x"))
      .select(col("window.start").cast("date").as("day"), col("x"))

  /** Hop 2: the chart recursion over closed (day, x) rows. Single
    * constant key — input is one row per day by construction. */
  def cusumChart(closedDays: Dataset[(Date, Long)],
                 params: CusumParams): Dataset[CusumRow] = {
    import closedDays.sparkSession.implicits._
    closedDays
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L))
          val out = rows.toSeq.sortBy(_._1.getTime).map { case (day, x) =>
            val up = params.n * x - params.t - params.a
            val dn = params.t - params.n * x - params.a
            st = CusumState(math.max(0L, st.sHi + up),
              math.max(0L, st.sLo + dn))
            CusumRow(day, x, st.sHi, st.sLo,
              st.sHi > params.h, st.sLo > params.h)
          }
          state.update(st)
          out.iterator
      }
  }

  // ------------------------------------------------------------------
  // q235 twin: overdispersion snapshots
  // ------------------------------------------------------------------

  final case class DispersionRow(as_of: Timestamp, event_type: String,
                                 n_hours: Long, n_events: Long,
                                 mean_per_hour: Double, dispersion: Double,
                                 bursty: Boolean)

  /** Per-type exact moments over CLOSED hours plus the global closed
    * hour bounds (µs) — the dense grid is [h0, h1] SHARED by all types,
    * exactly the batch audit's grid, so zeros between a type's first and
    * last active hour AND outside them are counted identically. */
  final case class DispState(h0: Long, h1: Long,
                              types: Map[String, (Long, Long)])

  /** Hop 1: closed hourly counts per event type. */
  def hourlyCounts(events: DataFrame, tsCol: String = "ts",
                   watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col("event_type"), window(col(tsCol), "1 hour"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), col("window.start").as("h"), col("c"))

  /** Hop 2: snapshot dispersion per type after each batch of closed
    * hours — D = (H·Σc² − T²)/((H−1)·T) on exact BIGINT moments over the
    * dense closed grid, the batch q235 arithmetic verbatim. Emits one
    * row per (as_of = latest closed hour, type); the LAST snapshot per
    * type over a fully-closed corpus equals the batch audit row
    * (asserted in StreamingSpec). */
  def dispersionSnapshots(closedHours: Dataset[(String, Timestamp, Long)])
      : Dataset[DispersionRow] = {
    import closedHours.sparkSession.implicits._
    val hourUs = 3600L * 1000000L
    closedHours
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[DispState, DispersionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[DispState]) =>
          var st = state.getOption.getOrElse(
            DispState(Long.MaxValue, Long.MinValue, Map.empty))
          rows.foreach { case (tpe, h, c) =>
            val us = h.getTime * 1000L
            val (t0, ss0) = st.types.getOrElse(tpe, (0L, 0L))
            st = DispState(math.min(st.h0, us), math.max(st.h1, us),
              st.types + (tpe -> (t0 + c, ss0 + c * c)))
          }
          state.update(st)
          if (st.types.isEmpty) Iterator.empty
          else {
            val bigH = (st.h1 - st.h0) / hourUs + 1L
            val asOf = new Timestamp(st.h1 / 1000L)
            st.types.toSeq.sortBy(_._1).map { case (tpe, (t, ss)) =>
              val num = bigH * ss - t * t
              val den = (bigH - 1L) * t
              DispersionRow(asOf, tpe, bigH, t,
                t.toDouble / bigH.toDouble,
                num.toDouble / den.toDouble,
                num > 2L * den)
            }.iterator
          }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming operator (SURVEY brief: `KeyValueGroupedDataset
  * .flatMapGroupsWithState` for state Spark's built-ins can't hold):
  * gap-based SESSIONIZATION of an event stream.
  *
  * State per user is the set of open session INTERVALS (start, last,
  * count) — never the raw events — so state size is bounded by the
  * session count, not the event count: the property that lets this run
  * on an unbounded stream. Each batch merges its (sorted) event times
  * into the interval set; two intervals fuse when the gap between them
  * closes. Interval merging under a gap rule is associative, so the
  * result is EXACTLY the batch gaps-and-islands sessionization no
  * matter how events split across micro-batches or arrive out of order
  * (any disorder within the watermark delay). Sessions emit when the
  * user's event-time timeout fires — the watermark has passed their
  * last event by more than the gap, so no future event can extend them.
  */
object Sessionize {

  /** One session interval: [start, last] in event-time micros, n events. */
  case class Sess(start: Long, last: Long, n: Long)
  case class UserSessions(sessions: Seq[Sess])
  case class SessionOut(user_id: Long, start_us: Long, n_events: Long)

  /** Merge sorted intervals, fusing any pair whose gap ≤ gapUs. */
  private[graft] def mergeWithGap(all: Seq[Sess], gapUs: Long): Seq[Sess] =
    all.sortBy(s => (s.start, s.last)).foldLeft(List.empty[Sess]) {
      (acc, s) => acc match {
        case h :: t if s.start - h.last <= gapUs =>
          Sess(h.start, math.max(h.last, s.last), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse

  /** Sessionize a stream of (user_id, event-time micros) rows.
    * `watermarkDelay` bounds accepted disorder; a user's sessions emit
    * once the watermark passes their last event by more than `gapUs`.
    */
  def sessionizeStream(events: Dataset[(Long, Long)], gapUs: Long,
      watermarkDelay: String = "7 days"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.toDF("user_id", "ets_us")
      .withColumn("ets", timestamp_micros(col("ets_us")))
      .as[(Long, Long, java.sql.Timestamp)]
      .withWatermark("ets", watermarkDelay)
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserSessions, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[UserSessions]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: no event can extend these —
            // emit and drop the state
            val out = state.get.sessions.map(s =>
              SessionOut(user, s.start, s.n))
            state.remove()
            out.iterator
          } else {
            val pts = it.map(_._2).toArray.sorted
            val prev = state.getOption.map(_.sessions).getOrElse(Seq.empty)
            val merged = mergeWithGap(
              prev ++ pts.iterator.map(p => Sess(p, p, 1)), gapUs)
            // a session already more than `gap` behind the watermark
            // can never be extended (an extending event would be late
            // beyond the watermark and dropped) — emit it NOW and drop
            // it from state. Without this, a continuously-active key
            // keeps resetting its timeout and closed sessions pile up
            // in state forever: emission would wait for the key to go
            // completely quiet, and state would not be bounded.
            val wmUs = state.getCurrentWatermarkMs() * 1000
            val (closed, open) =
              merged.partition(s => s.last + gapUs < wmUs)
            if (open.isEmpty) state.remove()
            else {
              state.update(UserSessions(open))
              // timeout in event-time MILLIS: fire once the watermark
              // is past the newest event by more than the gap
              state.setTimeoutTimestamp(
                open.iterator.map(_.last).max / 1000 + gapUs / 1000 + 1)
            }
            closed.iterator.map(s => SessionOut(user, s.start, s.n))
          }
      }
  }
}

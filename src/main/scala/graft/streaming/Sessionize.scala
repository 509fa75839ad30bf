package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Streaming sessionization — the reference's signature stream operator
  * re-expressed on Structured Streaming.
  *
  * Two equivalent shapes:
  *  - [[sessionWindows]]: declarative `session_window` + watermark —
  *    the Spark-native form; use when per-session aggregates suffice.
  *  - [[incremental]]: `flatMapGroupsWithState` keyed by
  *    (account, device) with explicit gap-timeout state — the direct
  *    analog of the reference's Redis-held open sessions
  *    (reference: src/core/streaming_session_builder.py:191-293);
  *    state is harness-managed instead of an external KV, which
  *    removes the network boundary and the 24 h TTL machinery
  *    (streaming_session_builder.py:59-166).
  *
  * Batch semantics of the same operator (sort + gap split, reference:
  * src/models/streaming_event.py:284-368) live in Analytics.q3 as a
  * lag/window query.
  */
/** Open-session state for the incremental sessionizer (top-level so
  * the state Encoder codegen sees a public class). */
final case class OpenSession(
    startMs: Long,
    lastMs: Long,
    n: Long,
    totalDuration: Double
)

object Sessionize {

  final case class Event(account_id: String, device: String, ts: Timestamp, duration: Double)

  final case class SessionOut(
      account_id: String,
      device: String,
      session_id: String,
      start_ts: Timestamp,
      end_ts: Timestamp,
      n_events: Long,
      total_duration: Double
  )

  /** Declarative gap-session aggregation (works on batch or stream). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", gap) else events
    withWm
      .groupBy(col("account_id"), col("device"), session_window(col("ts"), gap))
      .agg(
        count(lit(1)).as("n_events"),
        sum("duration").as("total_duration"),
        min("ts").as("start_ts"),
        max("ts").as("end_ts")
      )
      .select(
        col("account_id"), col("device"),
        md5(concat_ws(":", col("account_id"), col("device"), col("start_ts").cast("string")))
          .substr(1, 16).as("session_id"),
        col("start_ts"), col("end_ts"), col("n_events"), col("total_duration")
      )
  }

  /** Incremental sessionizer with explicit keyed state. Emits a session
    * when the gap elapses (event-time timeout) or a new event arrives
    * past the gap. Session id = md5 of (key, start) — same recipe as
    * the reference (streaming_event.py:336-338). */
  def incremental(
      events: Dataset[Event],
      gapSec: Long = 1800L
  ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000
    val src =
      if (events.isStreaming) events.withWatermark("ts", s"$gapSec seconds") else events

    def mkOut(key: (String, String), s: OpenSession): SessionOut = {
      val id = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${key._1}:${key._2}:${s.startMs}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      SessionOut(key._1, key._2, id, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.totalDuration)
    }

    src
      .groupByKey(e => (e.account_id, e.device))
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { case (key, it, state: GroupState[OpenSession]) =>
        if (it.isEmpty && state.hasTimedOut) {
          val out = state.getOption.map(mkOut(key, _)).toSeq
          state.remove()
          out.iterator
        } else {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var closed = List.empty[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1, totalDuration = s.totalDuration + e.duration))
              case Some(s) =>
                closed ::= mkOut(key, s)
                cur = Some(OpenSession(t, t, 1, e.duration))
              case None =>
                cur = Some(OpenSession(t, t, 1, e.duration))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
          }
          closed.reverseIterator
        }
      }
  }
}

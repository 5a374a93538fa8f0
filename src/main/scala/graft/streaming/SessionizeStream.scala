package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom keyed state
  * (`flatMapGroupsWithState`) — the stateful twin of the batch
  * gaps-and-islands operator `EventOps.sessionize`, whose output is the
  * oracle-checked `nf_sessionize` query. The batch form defines the
  * semantics; this form carries them to unbounded input with bounded
  * state: one in-flight session per user, closed and emitted when the
  * inactivity gap elapses (event-time timeout keyed to the watermark).
  *
  * Scale notes: state is O(active users), partitioned by the group key;
  * no global ordering is ever required (each group's events are
  * processed per-trigger, merged into the open session).
  */
object SessionizeStream {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  final case class OpenSession(
      startMs: Long,
      lastMs: Long,
      n: Long,
      value: Double,
  )

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      session_value: Double,
  )

  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      gapMinutes: Int,
  ): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60L * 1000L

    def flush(userId: Long, s: OpenSession): Session =
      Session(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.n, s.value)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout,
      ) { (userId: Long, it: Iterator[Event], state: GroupState[OpenSession]) =>
        if (it.isEmpty && state.hasTimedOut) {
          // Watermark passed the gap horizon: the open session is final.
          val out = state.getOption.map(flush(userId, _)).toSeq
          state.remove()
          out.iterator
        } else {
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            open match {
              case Some(s) if t - s.lastMs <= gapMs =>
                open = Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.n + 1, s.value + e.value))
              case Some(s) =>
                closed += flush(userId, s)
                open = Some(OpenSession(t, t, 1L, e.value))
              case None =>
                open = Some(OpenSession(t, t, 1L, e.value))
            }
          }
          open.foreach { s =>
            state.update(s)
            // Spark 4 drops input rows older than the watermark before
            // they reach this function (FlatMapGroupsWithStateExecBase.
            // eventTimeWatermarkForLateEvents), so lastMs normally can't
            // trail the watermark by more than the gap. The clamp is
            // defense-in-depth for the boundary cases that can still
            // reach here (rows exactly at the watermark, or an upstream
            // stateful operator emitting at its eviction watermark):
            // setTimeoutTimestamp at or below the watermark throws and
            // kills the whole query, while watermark + 1 times the
            // session out on the next trigger — the correct semantics
            // for a session already past its horizon.
            state.setTimeoutTimestamp(
              math.max(s.lastMs + gapMs, state.getCurrentWatermarkMs() + 1),
            )
          }
          closed.result().iterator
        }
      }
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
  ValueState,
}

/** One event on the wire: the streaming input of [[BurstStream]]. */
case class BurstEvent(userId: Long, id: Long, tsMicros: Long)

/** O(1) per-user burst state: the finalized peak so far plus the ≤6
  * aligned windows that can still receive events under the ordering
  * contract — never a window history, the moments-not-samples
  * discipline applied to sliding-window counting. The open windows
  * are two aligned ws-ascending sequences (the state encoder does not
  * support map-typed fields).
  */
case class BurstState(peakN: Long, peakWs: Long, openWs: Seq[Long], openN: Seq[Long])

/** The emitted per-user burst row — field-for-field the batch
  * [[graft.operators.NetflowOps.burstPeak]] row.
  */
case class BurstPeak(user_id: Long, peak_events: Long, at_ws: Long)

/** Streaming twin of the batch burst-detection query (`nf_burst`):
  * every micro-batch advances each user's aligned 60-second/10-second
  * sliding window counts and re-emits the user's current peak (update
  * mode) — the live rate-limiter-sizing dashboard.
  *
  * The aligned-window core is the batch operator's exactly: an event
  * at whole second `sec` lands in the 6 aligned windows starting at
  * `sec div 10 × 10 − 10k` (k = 0..5); the peak is the max count over
  * all windows, earliest start on ties. Because events arrive in
  * per-user time order (the [[BeaconProcessor]] ordering contract),
  * a window stops growing once the stream passes its end — so state
  * holds only the finalized running peak plus the ≤6 windows still
  * open, O(1) per user forever, and windows finalize in ascending
  * start order, which makes the earliest-on-ties pick exact. Once the
  * stream drains, the last emitted row per user is field-identical to
  * the batch query (StreamingSpec asserts it over a two-batch split
  * with windows spanning the boundary).
  */
class BurstProcessor extends StatefulProcessor[Long, BurstEvent, BurstPeak] {

  @transient private var st: ValueState[BurstState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BurstState](
      "burst",
      Encoders.product[BurstState],
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[BurstEvent],
      timerValues: TimerValues,
  ): Iterator[BurstPeak] = {
    val s = if (st.exists()) st.get() else BurstState(0L, 0L, Seq.empty, Seq.empty)
    var peakN = s.peakN
    var peakWs = s.peakWs
    val open = scala.collection.mutable.SortedMap[Long, Long]() ++ s.openWs.zip(s.openN)
    // Strict-greater fold = "max count, earliest start on ties", exact
    // because candidates are always visited in ascending window start.
    def fold(n: Long, ws: Long): Unit = if (n > peakN) { peakN = n; peakWs = ws }
    for (e <- rows.toArray.sortBy(r => (r.tsMicros, r.id))) {
      // floorDiv matches the batch timestamp_diff(SECOND)/`div` integer
      // arithmetic bit-for-bit on the non-negative epochs used here.
      val base = Math.floorDiv(Math.floorDiv(e.tsMicros, 1000000L), 10L) * 10L
      // Windows ending before this event's earliest contributing start
      // can never grow again — finalize them (ascending ws).
      val closed = open.keysIterator.takeWhile(_ < base - 50L).toList
      closed.foreach { ws => fold(open(ws), ws); open.remove(ws) }
      var k = 0
      while (k < 6) {
        val ws = base - 10L * k
        open.update(ws, open.getOrElse(ws, 0L) + 1L)
        k += 1
      }
    }
    st.update(BurstState(peakN, peakWs, open.keys.toSeq, open.values.toSeq))
    // The emitted peak also weighs the still-open windows at their
    // current counts: when the stream drains those counts are final,
    // so the last emission equals the batch answer.
    var eN = peakN
    var eWs = peakWs
    open.foreach { case (ws, n) => if (n > eN) { eN = n; eWs = ws } }
    Iterator.single(BurstPeak(key, eN, eWs))
  }
}

/** O(1) per-user idle state: last event time, event count, and the
  * running max inter-arrival gap (sentinel −1 = no gap yet).
  */
case class IdleGapState(prevUs: Long, nEvents: Long, maxGapUs: Long)

/** The emitted per-user liveness row — field-for-field the batch
  * [[graft.operators.NetflowOps.idleGap]] row (None where the batch
  * max over zero gaps is NULL).
  */
case class IdleGapRow(user_id: Long, n_events: Long, max_gap_us: Option[Long])

/** Streaming twin of the batch longest-silence query (`nf_idle_gap`):
  * each micro-batch extends every user's running max inter-arrival
  * gap — exact integer microseconds, the batch operator's NTZ-diff
  * arithmetic — and re-emits the user's current row (update mode),
  * the live heartbeat-timeout dashboard. Single-event users carry
  * None exactly where the batch aggregate is NULL. Same ordering
  * contract and O(1)-state discipline as [[BurstProcessor]]; once the
  * stream drains, the last emitted row per user is field-identical to
  * the batch query (StreamingSpec asserts over a two-batch split with
  * the longest gap SPANNING the boundary — state carries the previous
  * timestamp across).
  */
class IdleGapProcessor extends StatefulProcessor[Long, BurstEvent, IdleGapRow] {

  @transient private var st: ValueState[IdleGapState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[IdleGapState](
      "idle",
      Encoders.product[IdleGapState],
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[BurstEvent],
      timerValues: TimerValues,
  ): Iterator[IdleGapRow] = {
    var s = if (st.exists()) st.get() else IdleGapState(0L, 0L, -1L)
    for (e <- rows.toArray.sortBy(r => (r.tsMicros, r.id))) {
      if (s.nEvents > 0L)
        s = s.copy(maxGapUs = math.max(s.maxGapUs, e.tsMicros - s.prevUs))
      s = s.copy(prevUs = e.tsMicros, nEvents = s.nEvents + 1L)
    }
    st.update(s)
    Iterator.single(IdleGapRow(
      key, s.nEvents, if (s.maxGapUs >= 0L) Some(s.maxGapUs) else None))
  }
}

object BurstStream {

  /** Event stream → live per-user burst peaks (update mode). Requires
    * the RocksDB state store provider (transformWithState's backing
    * store).
    */
  def peaks(events: Dataset[BurstEvent]): Dataset[BurstPeak] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new BurstProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** Event stream → live per-user longest-silence rows (update mode). */
  def idleGaps(events: Dataset[BurstEvent]): Dataset[IdleGapRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .transformWithState(new IdleGapProcessor, TimeMode.None(), OutputMode.Update())
  }
}

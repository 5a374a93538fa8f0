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

/** Streaming twin of the `nf_ewma` batch query: the per-user integer
  * EWMA baseline (α = 1/8 floor recursion, values in cents) with spike
  * counting, kept as `transformWithState` per-key state — three longs
  * (n, ewma, spikes), O(1) per user forever. The recursion is the SAME
  * exact-integer arithmetic as `EventOps.ewmaSpikes`' ordered fold
  * ((x + 7·ewma) summed in longs, ONE correctly-rounded double division
  * by 8, floor — operands ≪ 2^53 so the division is exact), so after
  * the final micro-batch the latest emitted row per key equals the
  * batch query's output BIT-FOR-BIT (StreamingSpec asserts over a
  * two-batch split of the events table).
  *
  * Input rows are (user_id, event_id, ts_micros, value_cents); rows
  * within a micro-batch are sorted per key by (ts, event_id) so arrival
  * batching cannot reorder the logical stream (the caller feeds batches
  * in stream order across triggers — Kafka per-key ordering at scale).
  * A spike is a value more than double the PRE-update baseline, checked
  * before the baseline absorbs it — the batch fold's order.
  */
class EwmaProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long)](
      "ewma",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues,
  ): Iterator[(Long, Long, Long, Long)] = {
    // n == 0 ⇔ no baseline yet — an explicit initialization test, not a
    // value sentinel, so negative cents values recurse correctly too
    // (matching the oracle CTE, which has no sentinel).
    var (n, ewma, spikes) = if (state.exists()) state.get() else (0L, 0L, 0L)
    for ((_, _, _, cents) <- rows.toArray.sortBy(r => (r._3, r._2))) {
      if (n > 0 && cents > ewma * 2) spikes += 1
      ewma =
        if (n == 0) cents
        else math.floor(Math.addExact(cents, Math.multiplyExact(ewma, 7L)).toDouble / 8.0).toLong
      n += 1
    }
    state.update((n, ewma, spikes))
    Iterator.single((key, n, ewma, spikes))
  }
}

object EwmaStream {

  /** (user_id, event_id, ts_micros, value_cents) stream →
    * (user_id, n_events, ewma_cents, n_spikes) running baselines, one
    * row per key per micro-batch (Update mode — the latest row per key
    * is the current baseline). Requires the RocksDB state store
    * provider (transformWithState's backing store).
    */
  def baseline(events: Dataset[(Long, Long, Long, Long)]): Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Update())
  }
}

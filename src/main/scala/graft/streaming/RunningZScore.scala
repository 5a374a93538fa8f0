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

/** Streaming twin of the `q_running_zscore` batch query: every event is
  * scored against the exact mean/std of its strict predecessors in the
  * per-user stream, via `transformWithState` with EXACT INTEGER state —
  * (n, Σcents, Σcents²) as three longs, so the running moments carry no
  * floating-point history and the emitted z-scores are BIT-IDENTICAL to
  * the batch window computation (asserted in StreamingSpec):
  * `Σcents/100` and `Σcents²/10⁴` are single correctly-rounded IEEE
  * divisions of exact integers, exactly like the batch's
  * decimal(18,2)/decimal(38,4) sums cast to double, and the z closed
  * form applies the same operations in the same order.
  *
  * Input rows are (user_id, event_id, ts_micros, value_cents); rows
  * within a micro-batch are sorted per key by (ts, event_id) so arrival
  * batching cannot reorder the logical stream (the caller feeds batches
  * in stream order across triggers — Kafka per-key ordering at scale).
  * State is O(1) per user forever. Zero-variance prefixes emit nothing,
  * matching the batch `var > 0` guard.
  */
class RunningZScoreProcessor
    extends StatefulProcessor[Long, (Long, Long, Long, Long), (Long, Long, Double, Double)] {

  @transient private var moments: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    moments = getHandle.getValueState[(Long, Long, Long)](
      "moments",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, Long)],
      timerValues: TimerValues,
  ): Iterator[(Long, Long, Double, Double)] = {
    var (n, s, ss) = if (moments.exists()) moments.get() else (0L, 0L, 0L)
    val out = Vector.newBuilder[(Long, Long, Double, Double)]
    // (ts, event_id) order within the batch; event_id is unique.
    for ((_, eventId, _, cents) <- rows.toArray.sortBy(r => (r._3, r._2))) {
      if (n >= 2) {
        val sd = s.toDouble / 100.0
        val ssd = ss.toDouble / 10000.0
        val v = cents.toDouble / 100.0
        val variance = (ssd - sd * sd / n) / (n - 1)
        if (variance > 0) {
          out += ((key, eventId, v, (v - sd / n) / math.sqrt(variance)))
        }
      }
      n += 1
      // Exact arithmetic that FAILS LOUDLY on overflow instead of
      // silently wrapping and corrupting every later z-score: cents² is
      // ~10¹² for high-value events, so a long-lived key could overflow
      // a plain Long sum. (The bit-identity contract with the batch twin
      // additionally requires Σcents² < 2⁵³ so the toDouble/10⁴ division
      // stays correctly rounded — addExact keeps the state exact up to
      // 2⁶³ and the spec's corpora stay far below 2⁵³.)
      s = Math.addExact(s, cents)
      ss = Math.addExact(ss, Math.multiplyExact(cents, cents))
    }
    moments.update((n, s, ss))
    out.result().iterator
  }
}

object RunningZScore {

  /** (user_id, event_id, ts_micros, value_cents) stream →
    * (user_id, event_id, value, z) scored events. Requires the RocksDB
    * state store provider (transformWithState's backing store).
    */
  def score(events: Dataset[(Long, Long, Long, Long)]): Dataset[(Long, Long, Double, Double)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new RunningZScoreProcessor, TimeMode.None(), OutputMode.Update())
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  MapState,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
}

/** Per-key categorical counters via `transformWithState` MAP state —
  * the streaming crosstab (user × event_type running counts), and the
  * third state primitive next to ValueState ([[RunningBytesProcessor]])
  * and ListState ([[TopNValuesProcessor]]). MapState stores one
  * (category → count) entry per OBSERVED category per key: updates
  * touch only the categories present in the batch (point reads/writes
  * against RocksDB), never rewriting the whole map — which is exactly
  * why MapState exists instead of a ValueState[Map].
  *
  * Determinism contract: counts are associative sums, so the final
  * counter values are independent of micro-batch boundaries and equal
  * the batch `groupBy(user, type).count()` over the same rows
  * (StreamingSpec asserts it). State is O(distinct categories) per key
  * — bounded by the category vocabulary, not the stream length.
  */
class TypeCountsProcessor
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {

  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getMapState[String, Long](
      "counts",
      Encoders.STRING,
      Encoders.scalaLong,
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String)],
      timerValues: TimerValues,
  ): Iterator[(Long, String, Long)] = {
    // Batch-local pre-aggregation: one state read + one write per
    // distinct category in the batch, not per row.
    val delta = rows.foldLeft(Map.empty[String, Long]) { case (m, (_, t)) =>
      m.updated(t, m.getOrElse(t, 0L) + 1L)
    }
    val updated = delta.map { case (t, d) =>
      val next = (if (counts.containsKey(t)) counts.getValue(t) else 0L) + d
      counts.updateValue(t, next)
      (key, t, next)
    }
    // Deterministic emission order within the key (category asc).
    updated.toSeq.sortBy(_._2).iterator
  }
}

object TypeCounts {

  /** (user_id, event_type) stream → (user_id, event_type, running
    * count) updates for categories touched by each batch. Requires the
    * RocksDB state store provider, like every transformWithState
    * operator here.
    */
  def typeCounts(events: Dataset[(Long, String)]): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new TypeCountsProcessor, TimeMode.None(), OutputMode.Update())
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ListState,
  OutputMode,
  StatefulProcessor,
  TTLConfig,
  TimeMode,
  TimerValues,
}

/** Bounded per-key top-N via `transformWithState` LIST state — the
  * third arbitrary-state shape next to ValueState
  * ([[RunningBytesProcessor]], [[RunningZScoreProcessor]]) and
  * event-time timeout ([[SessionizeStream]]): per key, the N largest
  * (value, event_id) pairs seen so far, re-emitted whenever the key's
  * leaderboard changes input. State is O(N) per key FOREVER — the
  * whole point of a streaming top-N is that the unbounded value stream
  * never accumulates.
  *
  * Determinism contract: ordering is (value DESC, event_id ASC) — total
  * because event_id is unique — and "merge batch into kept list, take
  * N" is associative and commutative in the input set, so the final
  * leaderboard is independent of micro-batch boundaries and equals the
  * batch window-rank query over the same rows (StreamingSpec asserts
  * it). That merge-stability is also the 100 TB property: partial
  * top-Ns from anywhere (executors, days, shards) combine without
  * re-reading history.
  */
class TopNValuesProcessor(n: Int)
    extends StatefulProcessor[Long, (Long, Long, Double), (Long, Long, Double, Int)] {

  @transient private var top: ListState[(Double, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    top = getHandle.getListState[(Double, Long)](
      "top",
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong),
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Double)],
      timerValues: TimerValues,
  ): Iterator[(Long, Long, Double, Int)] = {
    val merged = (top.get().toSeq ++ rows.map(r => (r._3, r._2)))
      .sortBy { case (v, id) => (-v, id) }
      .take(n)
    top.put(merged.toArray)
    merged.iterator.zipWithIndex.map { case ((v, id), i) => (key, id, v, i + 1) }
  }
}

object TopNPerKey {

  /** (user_id, event_id, value) stream → (user_id, event_id, value,
    * rank) leaderboard updates. Requires the RocksDB state store
    * provider, like every transformWithState operator here.
    */
  def topN(events: Dataset[(Long, Long, Double)], n: Int): Dataset[(Long, Long, Double, Int)] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .transformWithState(new TopNValuesProcessor(n), TimeMode.None(), OutputMode.Update())
  }
}

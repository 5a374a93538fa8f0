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

/** Arbitrary stateful streaming via Spark 4's `transformWithState` — the
  * successor API to flatMapGroupsWithState: named typed state handles
  * per key, TTL support, timers, and (in production) the RocksDB state
  * store. The operator here is the running per-host byte total: one
  * `ValueState[Long]` per key, one `(host, cumulative)` update row per
  * micro-batch that touches the key — O(1) state per host regardless of
  * stream length, the streaming twin of a running-sum window.
  */
class RunningBytesProcessor extends StatefulProcessor[String, (String, Long), (String, Long)] {

  @transient private var total: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    total = getHandle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues,
  ): Iterator[(String, Long)] = {
    val prev = if (total.exists()) total.get() else 0L
    val sum = prev + rows.map(_._2).sum
    total.update(sum)
    Iterator.single((key, sum))
  }
}

object RunningTotals {

  /** (host, bytes) stream → (host, running total) updates. Requires the
    * RocksDB state store provider (transformWithState's backing store);
    * the caller sets `spark.sql.streaming.stateStore.providerClass`.
    */
  def runningBytes(flows: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    import flows.sparkSession.implicits._
    flows
      .groupByKey(_._1)
      .transformWithState(new RunningBytesProcessor, TimeMode.None(), OutputMode.Update())
  }
}

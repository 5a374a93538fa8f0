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

/** One flow observation on the wire: the streaming input of
  * [[BeaconStream.profile]].
  */
case class BeaconEvent(ipSrc: String, ipDst: String, id: Long, tsMicros: Long)

/** O(1) per-pair state: the last flow time plus the exact integer gap
  * moments — no gap history is ever held, the same
  * moments-not-samples discipline as [[RunningZScoreProcessor]].
  */
case class BeaconState(
    prevUs: Long,
    nFlows: Long,
    nGaps: Long,
    minGap: Long,
    maxGap: Long,
    sumGap: Long,
    sumGap2: Long,
)

/** The emitted per-pair profile — field-for-field the batch
  * [[graft.operators.NetflowOps.beaconProfile]] row (None where batch
  * aggregates over zero gaps are NULL).
  */
case class BeaconProfile(
    ip_src: String,
    ip_dst: String,
    n_flows: Long,
    n_gaps: Long,
    min_gap_s: Option[Long],
    max_gap_s: Option[Long],
    sum_gap_s: Option[Long],
    sum_gap2_s: Option[Long],
    is_beacon: Boolean,
)

/** Streaming twin of the batch beacon (C2 call-home) profile: every
  * micro-batch updates each flow pair's exact-integer gap moments and
  * re-emits the pair's current profile (update mode) — the live
  * detection dashboard the batch operator computes after the fact.
  * Gap arithmetic is the batch operator's exactly — whole-second
  * floor-division gaps, the cross-multiplied cv² ≤ 1/cvInv² flag — so
  * once the stream drains, the last emitted row per pair is
  * field-identical to the batch profile (StreamingSpec asserts it).
  *
  * Ordering contract (the [[RunningZScoreProcessor]] caveat): rows are
  * sorted by (ts, id) WITHIN a batch, and the caller feeds batches in
  * per-pair stream order across triggers — Kafka per-key ordering at
  * scale. State is O(1) per pair forever.
  */
class BeaconProcessor(minGaps: Int, cvInv: Int)
    extends StatefulProcessor[(String, String), BeaconEvent, BeaconProfile] {

  @transient private var st: ValueState[BeaconState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[BeaconState](
      "beacon",
      Encoders.product[BeaconState],
      TTLConfig.NONE,
    )

  override def handleInputRows(
      key: (String, String),
      rows: Iterator[BeaconEvent],
      timerValues: TimerValues,
  ): Iterator[BeaconProfile] = {
    var s =
      if (st.exists()) st.get()
      else BeaconState(0L, 0L, 0L, Long.MaxValue, Long.MinValue, 0L, 0L)
    for (e <- rows.toArray.sortBy(r => (r.tsMicros, r.id))) {
      if (s.nFlows > 0L) {
        // floorDiv matches the batch floor(µs-diff / 1e6) bit-for-bit on
        // the non-negative diffs the ordering contract guarantees.
        val gap = Math.floorDiv(e.tsMicros - s.prevUs, 1000000L)
        s = s.copy(
          nGaps = s.nGaps + 1L,
          minGap = math.min(s.minGap, gap),
          maxGap = math.max(s.maxGap, gap),
          // Same unchecked long arithmetic as the batch operator's sum()
          // columns — the bit-parity contract (real corpora stay far
          // below 2⁶³ in whole-second gap sums).
          sumGap = s.sumGap + gap,
          sumGap2 = s.sumGap2 + gap * gap,
        )
      }
      s = s.copy(prevUs = e.tsMicros, nFlows = s.nFlows + 1L)
    }
    st.update(s)
    val isBeacon = s.nGaps >= minGaps &&
      cvInv.toLong * cvInv * (s.nGaps * s.sumGap2 - s.sumGap * s.sumGap) <=
      s.sumGap * s.sumGap
    Iterator.single(BeaconProfile(
      key._1, key._2, s.nFlows, s.nGaps,
      if (s.nGaps > 0L) Some(s.minGap) else None,
      if (s.nGaps > 0L) Some(s.maxGap) else None,
      if (s.nGaps > 0L) Some(s.sumGap) else None,
      if (s.nGaps > 0L) Some(s.sumGap2) else None,
      isBeacon,
    ))
  }
}

object BeaconStream {

  /** Flow stream → live per-pair beacon profiles (update mode).
    * Requires the RocksDB state store provider (transformWithState's
    * backing store).
    */
  def profile(flows: Dataset[BeaconEvent], minGaps: Int, cvInv: Int): Dataset[BeaconProfile] = {
    import flows.sparkSession.implicits._
    flows
      .groupByKey(e => (e.ipSrc, e.ipDst))
      .transformWithState(new BeaconProcessor(minGaps, cvInv), TimeMode.None(), OutputMode.Update())
  }
}

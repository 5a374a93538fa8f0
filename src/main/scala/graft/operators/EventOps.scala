package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference netflow semantics expressed over the driver's `events` table
  * (FIXTURES.md §B mapping: `ts` ≈ timestamp_start/_arrival, `user_id` ≈
  * host identity, `value` ≈ bytes, `props` ≈ raw JSON payload), so every
  * operator is DuckDB-oracle-checkable on shared parquet.
  *
  * Numeric discipline for oracle parity: double columns are cast to
  * DECIMAL(18,2) *before* aggregation so Spark and DuckDB both do exact
  * decimal arithmetic (float summation order would otherwise make
  * hash-compare flaky); averages are expressed as exact-decimal sum cast
  * to double divided by a count — one FP op from identical inputs.
  *
  * Output contract: NO DECIMAL column ever crosses the query boundary.
  * The driver's hash renders Spark parquet decimals with their scale
  * ("5.30") but the DuckDB oracle side as floats ("5.3"), so any
  * trailing-zero value hash-mismatches even when values are equal.
  * Every final decimal is cast to DOUBLE (a single correctly-rounded
  * conversion from identical exact decimals — bit-equal on both
  * engines); the matching oracle SQL applies the same CAST(... AS
  * DOUBLE).
  */
object EventOps {

  /** The reference's hard-coded host (192.168.178.80,
    * accessTrend.ts:29) maps to a fixed user id.
    */
  val HostId = 7L

  /** Reference timestamps are strings "yyyy-MM-dd HH:mm:ss.SSSSSS"
    * (README.md:105); recreate that encoding from the event time.
    */
  def tsString(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Boundary form of [[dec]]: round through DECIMAL(18,2) but emit
    * DOUBLE (see the output contract in the class doc).
    */
  def decOut(c: Column): Column = dec(c).cast("double")

  /** P2 analog — JSON payload parse + projection over `props`. */
  def parseProps(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
      )
      .orderBy("event_id")

  /** P10 analog — heartbeat filter: drop one literal event type. */
  def heartbeatFilter(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") =!= lit("error"))
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy("event_id")

  /** P6 + P8 analog — day / time-of-day substrings of the string form. */
  def dayAndTimeOfDay(events: DataFrame): DataFrame =
    events
      .select(
        col("event_id"),
        NetflowOps.day(tsString(col("ts"))).as("day"),
        NetflowOps.timeOfDay(tsString(col("ts"))).as("tod"),
      )
      .orderBy("event_id")

  /** P5 analog — inclusive lexicographic range filter on the string
    * timestamp; a date-only '<= hi' bound excludes the ENTIRE `hi` day
    * (every real timestamp string strictly extends its date prefix and
    * so compares greater), exactly like the reference
    * (accessTrend.ts:11-17). Evaluated via the pushdown-equivalent
    * native-timestamp bounds (NetflowOps.rangeFilterPushdown, which
    * derives the `ts >= lo AND ts < hi` form) so the predicate reaches
    * the scan.
    */
  def rangeFilter(events: DataFrame, lo: String, hi: String): DataFrame =
    events
      .filter(NetflowOps.rangeFilterPushdown(col("ts"), lo, hi))
      .select(col("event_id"), col("user_id"), decOut(col("value")).as("value"))
      .orderBy("event_id")

  /** P9 analog — realtime tick projection {time, value}. */
  def tick(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") =!= lit("error"))
      .select(
        col("event_id"),
        NetflowOps.timeOfDay(tsString(col("ts"))).as("time"),
        decOut(col("value")).as("value"),
      )
      .orderBy("event_id")

  /** Flagship: Date Access Trend (P5∘P6∘P7∘A1/A2, accessTrend.ts:10-87)
    * over events. Direction split via the host id; conditional sums
    * compile to sum(CASE WHEN ...) with partial+final hash aggregation —
    * the only shuffle is on the low-cardinality `day`.
    */
  def accessTrend(events: DataFrame, lo: String, hi: String): DataFrame = {
    val ts = tsString(col("ts"))
    events
      .filter(NetflowOps.rangeFilterPushdown(col("ts"), lo, hi))
      .select(
        NetflowOps.day(ts).as("day"),
        when(col("user_id") === HostId, dec(col("value"))).otherwise(lit(0)).as("in_value"),
        when(col("user_id") === HostId, lit(1L)).otherwise(lit(0L)).as("in_events"),
        when(col("user_id") =!= HostId, dec(col("value"))).otherwise(lit(0)).as("out_value"),
        when(col("user_id") =!= HostId, lit(1L)).otherwise(lit(0L)).as("out_events"),
      )
      .groupBy(col("day"))
      .agg(
        sum("in_value").cast("double").as("in_value"),
        sum("in_events").as("in_events"),
        sum("out_value").cast("double").as("out_value"),
        sum("out_events").as("out_events"),
      )
      .orderBy("day")
  }

  /** A3 analog — 10-second tumbling-window aggregation (internalized
    * pmacct flush). Same transform serves Structured Streaming with a
    * watermark at the edge.
    */
  def window10s(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("n"), col("total_value"))
      .orderBy("window_start")

  /** Sessionization (gaps-and-islands): a new session starts after a gap
    * greater than `gapMinutes` of inactivity per user. Expressed with
    * window functions so the oracle can replicate it; the streaming
    * variant uses flatMapGroupsWithState over the same semantics.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // Pin a ROWS frame for the running sum: the default RANGE frame
    // includes order-key peers, which diverges from the oracle's ROWS
    // UNBOUNDED PRECEDING whenever (ts, event_id) has duplicates
    // (at-least-once ingest can replay rows).
    val runningByUser = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapSec = gapMinutes * 60L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            expr(s"timestampdiff(MICROSECOND, prev_ts, ts)") > gapSec * 1000000L,
          1L,
        ).otherwise(0L),
      )
      .withColumn("session_seq", sum("new_session").over(runningByUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("session_value"),
      )
      .orderBy("user_id", "session_seq")
  }

  /** P2 robustness — malformed-payload accounting. A deterministic
    * corruption (strip the opening brace from every 97th record) stands
    * in for wire damage; `from_json` under PERMISSIVE mode routes each
    * unparseable input into the declared corrupt-record column — the
    * idiomatic Spark bad-record channel (the reference's parse step
    * would silently crash the batch or drop the row — here damage is
    * counted, good rows still parse, and the pipeline keeps running).
    * Pure scan + one tiny agg.
    */
  def parseBadRecords(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val payload = when(
      col("event_id") % 97 === 0,
      regexp_replace(col("props"), "^\\{", ""),
    ).otherwise(col("props"))
    val schema = StructType(
      Seq(StructField("k", LongType), StructField("_corrupt_record", StringType)),
    )
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt_record")
    events
      .select(col("event_type"), payload.as("payload"))
      .withColumn("parsed", from_json(col("payload"), schema, opts))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("parsed._corrupt_record").isNotNull, 1)).as("n_bad"),
        sum(when(col("parsed._corrupt_record").isNull, col("parsed.k"))).as("sum_k"),
      )
      .orderBy("event_type")
  }

  /** Per-user integer EWMA with spike flags — the classic online
    * baseline/anomaly recursion EWMA' = (x + 7·EWMA)/8 (α = 1/8), run
    * over each user's event sequence in (ts, event_id) order. The
    * recursion is ORDER-DEPENDENT, so it is computed as one in-order
    * fold per key — exactly the shape the streaming twin keeps as
    * per-key state — in pure integer arithmetic: values scale to cents
    * once (floor(x·100 + 0.5), IEEE-deterministic) and the update is a
    * floor division, so the oracle's recursive CTE reproduces every
    * intermediate bit-for-bit (no bit-unportable ln/pow decay forms).
    * A spike is a value more than double the running baseline.
    *
    * Scale: one shuffle on user_id; per-key state is that key's events
    * (bounded by per-user activity, not corpus size). The division by 8
    * routes through IEEE doubles (exact: operands ≪ 2^53).
    */
  def ewmaSpikes(events: DataFrame): DataFrame = {
    val cents = floor(col("value") * 100 + 0.5).cast("long")
    val step = (x: Column, e: Column) => floor((x + e * 7).cast("double") / 8.0).cast("long")
    events
      .select(col("user_id"), struct(col("ts"), col("event_id"), cents.as("cents")).as("r"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        aggregate(
          transform(array_sort(collect_list(col("r"))), r => r.getField("cents")),
          // Explicit init flag, NOT a value sentinel: a negative first
          // value recurses correctly (the oracle CTE has no sentinel).
          struct(lit(false).as("init"), lit(0L).as("ewma"), lit(0L).as("spikes")),
          (acc, x) =>
            struct(
              lit(true).as("init"),
              when(!acc.getField("init"), x)
                .otherwise(step(x, acc.getField("ewma")))
                .as("ewma"),
              (acc.getField("spikes") +
                when(acc.getField("init") && x > acc.getField("ewma") * 2, 1L)
                  .otherwise(0L)).as("spikes"),
            ),
        ).as("s"),
      )
      .select(
        col("user_id"),
        col("n_events"),
        col("s.ewma").as("ewma_cents"),
        col("s.spikes").as("n_spikes"),
      )
      .orderBy("user_id")
  }

  /** Robust outlier counts per event type via the median absolute
    * deviation — the detector that, unlike mean/σ z-scores (`nf_anomaly`)
    * or trimmed bounds (`q_winsorize`), does not let the outliers
    * themselves inflate the threshold. Medians are EXACT order
    * statistics by selection (the LOWER median: the row at position
    * ⌊(n+1)/2⌋ under (value, event_id) order — selection, not
    * interpolation, so the value is a datum both engines agree on
    * bit-for-bit; interpolated quantile arithmetic differs across
    * engines). An outlier is dev > 3·MAD.
    *
    * Shape: two per-type sorted selections (row_number windows — the
    * price of EXACT medians; the approximate path at 100 TB is
    * `q_approx_percentile`'s mergeable sketch, and the honest exact
    * path is this one run per coarse partition), a 5-row broadcast of
    * each median back onto the scan, one final aggregate.
    */
  def madOutliers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = Window.partitionBy("event_type")
    def lowerMedian(df: DataFrame, c: String, out: String): DataFrame =
      df.withColumn(
          "rn",
          row_number().over(Window.partitionBy("event_type").orderBy(c, "event_id")),
        )
        .withColumn("n", count(lit(1)).over(cnt))
        .filter(col("rn") === floor((col("n") + 1) / lit(2)))
        .select(col("event_type"), col(c).as(out))
    val e = events.select(col("event_type"), col("event_id"), col("value"))
    val med = lowerMedian(e, "value", "med")
    val dev = e
      .join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = lowerMedian(dev, "dev", "mad")
    dev
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("median_value"),
        min(col("mad")).as("mad"),
        sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"),
      )
      .orderBy("event_type")
  }

  /** Peak concurrency per event type — the max-simultaneous-flows gauge
    * (capacity planning / connection-table sizing): each event holds an
    * interval [ts, ts + (1+⌊value⌋) s), and the answer is the sweep-line
    * maximum of the running open-interval count. Endpoints become
    * (+1 start, −1 end) deltas keyed by a single composite integer
    * 2·µs + isStart, so ends at an instant close BEFORE starts at the
    * same instant open (half-open interval semantics) and a RANGE
    * running sum is deterministic under ties — peers enter wholesale,
    * no ROWS-frame order sensitivity.
    *
    * Scale: the sweep is one shuffle on the (low-cardinality) type key;
    * at 100 TB the same sweep runs per (type, coarse time bucket) with
    * a per-bucket carry-in, an associative two-level composition.
    */
  def maxConcurrent(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NTZ-epoch micros via an NTZ literal (the Tables.events discipline):
    // an SQL TIMESTAMP literal would coerce through the session zone.
    val us = timestamp_diff(
      "MICROSECOND",
      lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0)),
      col("ts"),
    )
    val durUs = (floor(col("value")).cast("long") + 1L) * 1000000L
    val points = events
      .select(col("event_type"), (us * 2 + 1).as("k"), lit(1L).as("delta"))
      .unionAll(
        events.select(col("event_type"), ((us + durUs) * 2).as("k"), lit(-1L).as("delta")),
      )
    val running = Window
      .partitionBy("event_type")
      .orderBy("k")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    points
      .withColumn("open", sum(col("delta")).over(running))
      .groupBy(col("event_type"))
      .agg(max(col("open")).as("max_concurrent"))
      .orderBy("event_type")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, NetflowOps}
import Tables.events

/** Reference-parity operators (SURVEY.md §2.2-2.4) as named queries over
  * the `events` table (netflow-analog mapping, FIXTURES.md §B).
  */
object NetflowQueries {

  private val lo = "2024-01-05"
  private val hi = "2024-01-25"

  val all: Seq[Q] = Seq(
    Q(
      "nf_parse_project",
      (s, d) => EventOps.parseProps(events(s, d)),
      Some("""SELECT event_id, event_type,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin),
    ),
    // P2 robustness: deterministic payload corruption (every 97th
    // record loses its opening brace) → PERMISSIVE from_json NULL-struct
    // accounting. Spark's "NULL struct = unparseable" exactly mirrors
    // DuckDB's json_valid = false here.
    Q(
      "nf_parse_badrecords",
      (s, d) => EventOps.parseBadRecords(events(s, d)),
      Some("""WITH c AS (
             |  SELECT event_type,
             |    CASE WHEN event_id % 97 = 0
             |         THEN regexp_replace(props, '^\{', '')
             |         ELSE props END AS payload
             |  FROM events)
             |SELECT event_type, count(*) AS n_total,
             |  CAST(count(CASE WHEN NOT json_valid(payload) THEN 1 END) AS BIGINT) AS n_bad,
             |  CAST(sum(CASE WHEN json_valid(payload)
             |        THEN CAST(json_extract_string(payload, '$.k') AS BIGINT) END) AS BIGINT)
             |    AS sum_k
             |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // Sliding (overlapping) batch windows — the tumbling nf_window_10s
    // shape generalized: 2-day windows every 1 day, each event lands in
    // exactly 2 windows (Spark's window() plans one Expand ×2 + a hash
    // agg — replication factor dur/slide, not a self-join). NTZ
    // timestamps keep the day boundaries timezone-free; the oracle
    // enumerates each event's two epoch-aligned window starts directly.
    Q(
      "nf_window_sliding",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "2 days", "1 day"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
          )
          .select(
            date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
            date_format(col("window.end"), "yyyy-MM-dd").as("win_end"),
            col("n_events"),
            col("total_value"),
          )
          .orderBy("win_start"),
      Some("""SELECT strftime(win_start, '%Y-%m-%d') AS win_start,
             |  strftime(win_start + INTERVAL 2 DAY, '%Y-%m-%d') AS win_end,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM (SELECT value,
             |        date_trunc('day', ts) - to_days(CAST(k AS INT)) AS win_start
             |      FROM events, unnest([0, 1]) AS t(k))
             |GROUP BY win_start ORDER BY win_start""".stripMargin),
    ),
    Q(
      "nf_heartbeat_filter",
      (s, d) => EventOps.heartbeatFilter(events(s, d)),
      Some("""SELECT event_id, event_type, user_id
             |FROM events WHERE event_type <> 'error' ORDER BY event_id""".stripMargin),
    ),
    Q(
      "nf_day_tod",
      (s, d) => EventOps.dayAndTimeOfDay(events(s, d)),
      Some("""SELECT event_id,
             |       substr(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), 1, 10) AS day,
             |       substr(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), 12, 8) AS tod
             |FROM events ORDER BY event_id""".stripMargin),
    ),
    Q(
      "nf_range_filter",
      (s, d) => EventOps.rangeFilter(events(s, d), lo, hi),
      Some(s"""SELECT event_id, user_id,
              |       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
              |FROM events
              |WHERE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') >= '$lo'
              |  AND strftime(ts, '%Y-%m-%d %H:%M:%S.%f') <= '$hi'
              |ORDER BY event_id""".stripMargin),
    ),
    Q(
      "nf_tick",
      (s, d) => EventOps.tick(events(s, d)),
      Some("""SELECT event_id,
             |       substr(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), 12, 8) AS time,
             |       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
             |FROM events WHERE event_type <> 'error' ORDER BY event_id""".stripMargin),
    ),
    Q(
      "nf_access_trend",
      (s, d) => EventOps.accessTrend(events(s, d), lo, hi),
      Some(s"""SELECT substr(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), 1, 10) AS day,
              |       CAST(sum(CASE WHEN user_id = ${EventOps.HostId} THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS in_value,
              |       CAST(sum(CASE WHEN user_id = ${EventOps.HostId} THEN 1 ELSE 0 END) AS BIGINT) AS in_events,
              |       CAST(sum(CASE WHEN user_id <> ${EventOps.HostId} THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS out_value,
              |       CAST(sum(CASE WHEN user_id <> ${EventOps.HostId} THEN 1 ELSE 0 END) AS BIGINT) AS out_events
              |FROM events
              |WHERE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') >= '$lo'
              |  AND strftime(ts, '%Y-%m-%d %H:%M:%S.%f') <= '$hi'
              |GROUP BY day ORDER BY day""".stripMargin),
    ),
    Q(
      "nf_window_10s",
      (s, d) => EventOps.window10s(events(s, d)),
      Some("""SELECT time_bucket(INTERVAL '10 seconds', ts) AS window_start,
             |       count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY window_start ORDER BY window_start""".stripMargin),
    ),
    // Windowed anomaly detection: per-10s-window traffic z-scored
    // against the whole series (exact decimal component sums → one
    // closed-form double expression, the q_corr_manual reproducible-
    // statistics pattern; the stats row is a broadcast scalar). The
    // "which windows spiked" question every netflow operator asks; at
    // scale the global-stats agg is one tiny reduce, windows never
    // re-shuffle.
    Q(
      "nf_anomaly",
      (s, d) => {
        import org.apache.spark.sql.functions._
        // Materialize the (tiny — one row per 10 s window) aggregate so
        // the stats arm and the output arm read it once instead of
        // scanning events twice.
        val w = EventOps.window10s(events(s, d)).localCheckpoint()
        val t = col("total_value").cast("decimal(18,2)")
        val stats = w.agg(
          count(lit(1)).as("nw"),
          sum(t).cast("double").as("sw"),
          sum((t * t).cast("decimal(38,4)")).cast("double").as("ssw"),
        )
        val z = (col("total_value") - col("sw") / col("nw")) /
          sqrt((col("ssw") - col("sw") * col("sw") / col("nw")) / (col("nw") - 1))
        w.crossJoin(broadcast(stats))
          .select(
            col("window_start"),
            col("total_value"),
            z.as("z"),
            (abs(z) > 3.0).as("is_anomaly"),
          )
          .orderBy("window_start")
      },
      Some("""WITH w AS (
             |  SELECT time_bucket(INTERVAL '10 seconds', ts) AS window_start,
             |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |  FROM events GROUP BY window_start),
             |st AS (SELECT CAST(count(*) AS BIGINT) AS nw,
             |  CAST(sum(CAST(total_value AS DECIMAL(18,2))) AS DOUBLE) AS sw,
             |  CAST(sum(CAST(CAST(total_value AS DECIMAL(18,2))
             |    * CAST(total_value AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS DOUBLE) AS ssw
             |  FROM w)
             |SELECT window_start, total_value,
             |  (total_value - sw / nw) / sqrt((ssw - sw * sw / nw) / (nw - 1)) AS z,
             |  abs((total_value - sw / nw) / sqrt((ssw - sw * sw / nw) / (nw - 1))) > 3.0
             |    AS is_anomaly
             |FROM w, st ORDER BY window_start""".stripMargin),
    ),

    // Per-window traffic CONCENTRATION (Herfindahl index over source
    // activity): HHI = Σ cnt² / (Σ cnt)² per 10-s window — the scan/
    // DDoS shape signal (≈1 = one source dominates, ≈1/n = diffuse).
    // Entropy is the textbook form but ln() is not bit-portable across
    // engines (the tx_unigram_rarity finding); HHI carries the same
    // ordering with EXACT integer sums and a single double division.
    // Two stacked map-side-combinable aggregates, one events scan, no
    // window functions.
    Q(
      "nf_concentration",
      (s, d) => {
        import org.apache.spark.sql.functions._
        events(s, d)
          .groupBy(window(col("ts"), "10 seconds"), col("user_id"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("window.start").as("window_start"), col("cnt"))
          .groupBy(col("window_start"))
          .agg(
            sum(col("cnt")).as("n_events"),
            count(lit(1)).as("n_users"),
            (sum(col("cnt") * col("cnt")).cast("double") /
              (sum(col("cnt")) * sum(col("cnt"))).cast("double")).as("hhi"),
          )
          .orderBy("window_start")
      },
      Some("""WITH pk AS (
             |  SELECT time_bucket(INTERVAL '10 seconds', ts) AS window_start,
             |    user_id, count(*) AS cnt
             |  FROM events GROUP BY window_start, user_id)
             |SELECT window_start,
             |  CAST(sum(cnt) AS BIGINT) AS n_events,
             |  count(*) AS n_users,
             |  CAST(sum(cnt * cnt) AS DOUBLE)
             |    / CAST(sum(cnt) * sum(cnt) AS DOUBLE) AS hhi
             |FROM pk GROUP BY window_start ORDER BY window_start""".stripMargin),
    ),

    // Heavy hitters ("top talkers" in netflow terms): total traffic per
    // host, top 10. TakeOrderedAndProject keeps k rows per partition —
    // no global sort at any scale.
    Q(
      "nf_top_talkers",
      (s, d) => {
        import org.apache.spark.sql.functions._
        events(s, d)
          .groupBy(col("user_id"))
          .agg(
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
            count(lit(1)).as("n_events"),
          )
          .orderBy(col("total_value").desc, col("user_id"))
          .limit(10)
      },
      Some("""SELECT user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             |  count(*) AS n_events
             |FROM events GROUP BY user_id
             |ORDER BY total_value DESC, user_id LIMIT 10""".stripMargin),
    ),
    // Salted two-stage aggregation (skew technique, SkewOps): identical
    // results to a plain GROUP BY — which is exactly what the oracle
    // states — because decimal sums are order-insensitive. At scale this
    // is the deliberate fix for one ultra-hot key turning the final agg
    // into a straggler.
    Q(
      "nf_salted_agg",
      (s, d) => {
        import org.apache.spark.sql.functions._
        graft.operators.SkewOps
          .saltedAgg(events(s, d), col("user_id"), col("value").cast("decimal(18,2)"), buckets = 8)
          .withColumn("total", col("total").cast("double"))
          .orderBy("key")
      },
      Some("""SELECT user_id AS key,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  count(*) AS n
             |FROM events GROUP BY user_id ORDER BY key""".stripMargin),
    ),
    // Native session windows (Spark's streaming-capable sessionization —
    // merges events whose time is within the gap of the session's
    // current end; windows are half-open, so a gap of EXACTLY 30 min
    // starts a new session, hence the >= in the oracle, vs the > of the
    // gaps-and-islands operator below).
    Q(
      "nf_session_window",
      (s, d) => {
        import org.apache.spark.sql.functions._
        events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"),
          )
          .select(
            col("user_id"),
            col("session_window.start").as("session_start"),
            col("session_window.end").as("session_end"),
            col("n_events"),
            col("session_value"),
          )
          .orderBy("user_id", "session_start")
      },
      Some("""WITH w AS (
             |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events
             |), s AS (
             |  SELECT *, CASE WHEN prev_ts IS NULL
             |                   OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
             |                 THEN 1 ELSE 0 END AS new_session
             |  FROM w
             |), t AS (
             |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                   ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM s
             |)
             |SELECT user_id, min(ts) AS session_start,
             |       max(ts) + INTERVAL 30 MINUTE AS session_end,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
             |FROM t GROUP BY user_id, session_seq
             |ORDER BY user_id, session_start""".stripMargin),
    ),
    Q(
      "nf_sessionize",
      (s, d) => EventOps.sessionize(events(s, d), gapMinutes = 30),
      Some("""WITH w AS (
             |  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |  FROM events
             |), s AS (
             |  SELECT *, CASE WHEN prev_ts IS NULL
             |                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
             |                 THEN 1 ELSE 0 END AS new_session
             |  FROM w
             |), t AS (
             |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                                   ROWS UNBOUNDED PRECEDING) AS session_seq
             |  FROM s
             |)
             |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             |       min(ts) AS session_start, max(ts) AS session_end,
             |       count(*) AS n_events,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
             |FROM t GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin),
    ),
    // Bidirectional flow stitching — the BATCH twin of the stream-stream
    // interval join (NetflowStreams.pairBidirectionalFlows; StreamingSpec
    // covers the watermarked face). The events table has no flow tuple,
    // so one is derived deterministically (the nf_cidr_filter discipline):
    // small ip/port domains so reverse matches actually occur at gate SF.
    // The oracle mirrors the derivation, the interval bound, and the
    // equal-timestamp tie-break exactly.
    Q(
      "nf_flow_stitch",
      (s, d) => {
        // binSeconds = the 1-hour match window: the derived flow-key
        // domain is only 324 tuples, so the plain 4-tuple equi-join
        // degenerates to quadratic per-key candidate sets (~30M interval
        // checks at sf0.1); adding the time bin to the equi-key bounds
        // candidates to hour cohorts and the bin shuffle spreads the work
        // across all cores — no repartition needed.
        val flows = events(s, d).select(
          col("event_id").as("id"),
          concat(lit("10.0.0."), (col("user_id") % 6).cast("string")).as("ip_src"),
          concat(lit("10.0.0."), (col("event_id") % 6).cast("string")).as("ip_dst"),
          (lit(8000) + col("event_id") % 3).cast("int").as("port_src"),
          (lit(8000) + col("user_id") % 3).cast("int").as("port_dst"),
          col("ts"),
        )
        NetflowOps
          .stitchBidirectional(flows, "1 hour", binSeconds = Some(3600L))
          .select(
            col("f_id"), col("r_id"),
            col("f_ip_src"), col("f_ip_dst"), col("f_port_src"), col("f_port_dst"),
            col("f_ts"), col("r_ts"),
          )
          .orderBy("f_id", "r_id")
      },
      Some("""WITH f AS (
             |  SELECT event_id AS id, ts,
             |    '10.0.0.' || CAST(user_id % 6 AS VARCHAR) AS ip_src,
             |    '10.0.0.' || CAST(event_id % 6 AS VARCHAR) AS ip_dst,
             |    CAST(8000 + event_id % 3 AS INTEGER) AS port_src,
             |    CAST(8000 + user_id % 3 AS INTEGER) AS port_dst
             |  FROM events)
             |SELECT a.id AS f_id, b.id AS r_id,
             |  a.ip_src AS f_ip_src, a.ip_dst AS f_ip_dst,
             |  a.port_src AS f_port_src, a.port_dst AS f_port_dst,
             |  a.ts AS f_ts, b.ts AS r_ts
             |FROM f a JOIN f b
             |  ON b.ip_src = a.ip_dst AND b.ip_dst = a.ip_src
             | AND b.port_src = a.port_dst AND b.port_dst = a.port_src
             | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
             | AND (b.ts > a.ts OR (b.ts = a.ts
             |      AND (a.ip_src < b.ip_src
             |           OR (a.ip_src = b.ip_src AND a.port_src < b.port_src))))
             |ORDER BY f_id, r_id""".stripMargin),
    ),
    // Port-scan / fan-out detection — the security read a netflow
    // pipeline runs right after the reference's traffic trend: distinct
    // dst ports and hosts per (day, source), scan flag at >= 12 distinct
    // ports. Flow tuples are derived deterministically (the
    // nf_flow_stitch discipline); one narrow-key hash aggregation, no
    // join, no window. The 12 threshold straddles the sf0.01 gate's
    // distribution (median 8, max 20 ports per day-source), so both
    // flag values are exercised where the driver checks hashes.
    Q(
      "nf_port_scan",
      (s, d) => {
        val flows = events(s, d).select(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          concat(lit("10.0.0."), (col("user_id") % 40).cast("string")).as("ip_src"),
          concat(lit("192.168.0."), (col("event_id") % 25).cast("string")).as("ip_dst"),
          (col("event_id") % 997).cast("int").as("port_dst"),
        )
        NetflowOps.fanOutProfile(flows, scanThreshold = 12)
      },
      Some("""WITH f AS (
             |  SELECT strftime(ts, '%Y-%m-%d') AS day,
             |    '10.0.0.' || CAST(user_id % 40 AS VARCHAR) AS ip_src,
             |    '192.168.0.' || CAST(event_id % 25 AS VARCHAR) AS ip_dst,
             |    CAST(event_id % 997 AS INTEGER) AS port_dst
             |  FROM events)
             |SELECT day, ip_src, count(*) AS n_flows,
             |  count(DISTINCT port_dst) AS n_ports,
             |  count(DISTINCT ip_dst) AS n_hosts,
             |  count(DISTINCT port_dst) >= 12 AS is_scan
             |FROM f GROUP BY day, ip_src ORDER BY day, ip_src""".stripMargin),
    ),
    // Beaconing (C2 call-home) profile: per flow pair, exact-integer
    // gap moments (count/min/max/sum/sum-of-squares in whole seconds)
    // plus a scale-free coefficient-of-variation flag — cv² ≤ 1/25,
    // stated in cross-multiplied integer form so no float enters the
    // pipeline. The synthetic events table has Poisson arrivals
    // (cv ≈ 1), so no pair flags — the honest answer; the oracle still
    // hash-checks the full arithmetic on every pair. Shuffle on the
    // pair key + in-partition sort (the sessionize shape).
    Q(
      "nf_beacon",
      (s, d) => {
        val flows = events(s, d).select(
          col("event_id").as("id"),
          concat(lit("10.0.0."), (col("user_id") % 20).cast("string")).as("ip_src"),
          concat(lit("172.16.0."), (col("event_id") % 5).cast("string")).as("ip_dst"),
          col("ts"),
        )
        NetflowOps.beaconProfile(flows, minGaps = 5, cvInv = 5)
      },
      Some("""WITH f AS (
             |  SELECT event_id AS id,
             |    '10.0.0.' || CAST(user_id % 20 AS VARCHAR) AS ip_src,
             |    '172.16.0.' || CAST(event_id % 5 AS VARCHAR) AS ip_dst, ts
             |  FROM events),
             |g AS (SELECT ip_src, ip_dst,
             |        (epoch_us(ts) - lag(epoch_us(ts))
             |           OVER (PARTITION BY ip_src, ip_dst ORDER BY ts, id)) // 1000000
             |          AS gap_s
             |      FROM f)
             |SELECT ip_src, ip_dst, count(*) AS n_flows,
             |  count(gap_s) AS n_gaps,
             |  min(gap_s) AS min_gap_s, max(gap_s) AS max_gap_s,
             |  CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
             |  CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap2_s,
             |  count(gap_s) >= 5 AND
             |    25 * (count(gap_s) * CAST(sum(gap_s * gap_s) AS BIGINT)
             |          - CAST(sum(gap_s) AS BIGINT) * CAST(sum(gap_s) AS BIGINT))
             |    <= CAST(sum(gap_s) AS BIGINT) * CAST(sum(gap_s) AS BIGINT) AS is_beacon
             |FROM g GROUP BY ip_src, ip_dst ORDER BY ip_src, ip_dst""".stripMargin),
    ),
    // P11 — the reference's (commented-out) BPF capture pre-filter as a
    // CIDR prefix match (README.md:58-59). The events table has no IP
    // column, so dotted-quad strings are derived deterministically from
    // (event_id, user_id) — including a sliver of MALFORMED five-octet
    // strings to exercise the well-formedness guard (they must never
    // match, exactly as cidrMatch's rlike guard states). The oracle
    // mirrors the same derivation and the same mask arithmetic; the
    // Spark-side predicate is pure column algebra (fold + bitwise AND),
    // pushable and codegen'd.
    Q(
      "nf_cidr_filter",
      (s, d) => {
        val base = concat_ws(
          ".",
          when(col("event_id") % 3 === 0, lit("10"))
            .when(col("event_id") % 3 === 1, lit("192"))
            .otherwise(lit("172")),
          (col("user_id") % 256).cast("string"),
          ((col("event_id") / lit(256)).cast("long") % 256).cast("string"),
          (col("event_id") % 256).cast("string"),
        )
        val ip = when(col("event_id") % 97 === 0, concat(base, lit(".7"))).otherwise(base)
        events(s, d)
          .select(col("event_id"), ip.as("ip"))
          .filter(NetflowOps.cidrMatch(col("ip"), "10.16.0.0/12"))
          .orderBy("event_id")
      },
      Some("""WITH ips AS (
             |  SELECT event_id,
             |    CASE WHEN event_id % 97 = 0 THEN base || '.7' ELSE base END AS ip
             |  FROM (
             |    SELECT event_id,
             |      (CASE WHEN event_id % 3 = 0 THEN '10'
             |            WHEN event_id % 3 = 1 THEN '192'
             |            ELSE '172' END)
             |      || '.' || CAST(user_id % 256 AS VARCHAR)
             |      || '.' || CAST((event_id // 256) % 256 AS VARCHAR)
             |      || '.' || CAST(event_id % 256 AS VARCHAR) AS base
             |    FROM events))
             |SELECT event_id, ip FROM ips
             |WHERE regexp_matches(ip,
             |        '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)$')
             |  AND (list_reduce(list_prepend(CAST(0 AS BIGINT),
             |         list_transform(string_split(ip, '.'), ipp -> CAST(ipp AS BIGINT))),
             |         (ipa, ipb) -> ipa*256 + ipb) & 4293918720) = 168820736
             |ORDER BY event_id""".stripMargin),
    ),
    // Longest-prefix-match enrichment — the route-table / threat-feed
    // join (NetflowOps.lpmEnrich): chained broadcast left joins, one per
    // prefix length present in the dim table, masked-address equi-keys,
    // most-specific winner by coalesce — the flow side never shuffles or
    // explodes. IPs derive as in nf_cidr_filter (incl. the malformed
    // 5-octet rows, which must match nothing); the 10-row route table
    // covers /8, /16, /24 with genuine specificity overlaps, so every
    // coalesce arm and the unmatched-NULL path carry rows. The oracle
    // mirrors the joins, the fold-based ip→u32, and the mask arithmetic.
    Q(
      "nf_lpm_enrich",
      (s, d) => {
        import s.implicits._
        val base = concat_ws(
          ".",
          when(col("event_id") % 3 === 0, lit("10"))
            .when(col("event_id") % 3 === 1, lit("192"))
            .otherwise(lit("172")),
          (col("user_id") % 256).cast("string"),
          ((col("event_id") / lit(256)).cast("long") % 256).cast("string"),
          (col("event_id") % 256).cast("string"),
        )
        val ip = when(col("event_id") % 97 === 0, concat(base, lit(".7"))).otherwise(base)
        val flows = events(s, d).select(col("event_id"), ip.as("ip"))
        val dim = Seq(
          ("10.0.0.0", 8, "net10"),
          ("192.0.0.0", 8, "net192"),
          ("10.0.0.0", 16, "campus0"),
          ("10.32.0.0", 16, "campus32"),
          ("10.64.0.0", 16, "campus64"),
          ("10.96.0.0", 16, "campus96"),
          ("10.32.0.0", 24, "rack0"),
          ("10.32.64.0", 24, "rack64"),
          ("10.32.128.0", 24, "rack128"),
          ("10.32.192.0", 24, "rack192"),
        ).toDF("prefix_ip", "prefix_len", "tag")
        graft.operators.NetflowOps.lpmEnrich(flows, dim).orderBy("event_id")
      },
      Some {
        val ipFold =
          """list_reduce(list_prepend(CAST(0 AS BIGINT),
            |  list_transform(string_split(ip, '.'), ipp -> CAST(ipp AS BIGINT))),
            |  (ipa, ipb) -> ipa*256 + ipb)""".stripMargin
        val pfxFold = ipFold.replace("string_split(ip, '.')", "string_split(prefix_ip, '.')")
        def arm(l: Int) = {
          val mask = (0xFFFFFFFFL << (32 - l)) & 0xFFFFFFFFL
          s"""LEFT JOIN (SELECT ($pfxFold) & $mask AS net, prefix_ip, tag
             |           FROM dim WHERE prefix_len = $l) p$l
             |  ON (i.ipn & $mask) = p$l.net""".stripMargin
        }
        s"""WITH ips AS (
           |  SELECT event_id,
           |    CASE WHEN event_id % 97 = 0 THEN base || '.7' ELSE base END AS ip
           |  FROM (
           |    SELECT event_id,
           |      (CASE WHEN event_id % 3 = 0 THEN '10'
           |            WHEN event_id % 3 = 1 THEN '192'
           |            ELSE '172' END)
           |      || '.' || CAST(user_id % 256 AS VARCHAR)
           |      || '.' || CAST((event_id // 256) % 256 AS VARCHAR)
           |      || '.' || CAST(event_id % 256 AS VARCHAR) AS base
           |    FROM events)),
           |dim(prefix_ip, prefix_len, tag) AS (VALUES
           |  ('10.0.0.0', 8, 'net10'), ('192.0.0.0', 8, 'net192'),
           |  ('10.0.0.0', 16, 'campus0'), ('10.32.0.0', 16, 'campus32'),
           |  ('10.64.0.0', 16, 'campus64'), ('10.96.0.0', 16, 'campus96'),
           |  ('10.32.0.0', 24, 'rack0'), ('10.32.64.0', 24, 'rack64'),
           |  ('10.32.128.0', 24, 'rack128'), ('10.32.192.0', 24, 'rack192')),
           |probe AS (
           |  SELECT event_id, ip,
           |    CASE WHEN regexp_matches(ip,
           |      '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)$$')
           |    THEN $ipFold END AS ipn
           |  FROM ips)
           |SELECT i.event_id, i.ip,
           |  coalesce(p24.prefix_ip, p16.prefix_ip, p8.prefix_ip) AS match_prefix,
           |  coalesce(CASE WHEN p24.prefix_ip IS NOT NULL THEN 24 END,
           |           CASE WHEN p16.prefix_ip IS NOT NULL THEN 16 END,
           |           CASE WHEN p8.prefix_ip IS NOT NULL THEN 8 END) AS match_len,
           |  coalesce(p24.tag, p16.tag, p8.tag) AS tag
           |FROM probe i
           |${arm(24)}
           |${arm(16)}
           |${arm(8)}
           |ORDER BY event_id""".stripMargin
      },
    ),
    // Traffic accounting by route tag — the aggregate the LPM
    // enrichment exists to feed: flows grouped by their most-specific
    // matched prefix (NULL = unrouted), flow counts and traffic volume
    // per tag. Volume sums follow the DECIMAL-before-sum portability
    // rule; the group key space is the dimension table's size, so the
    // agg shuffle is tiny at any corpus scale.
    Q(
      "nf_tag_traffic",
      (s, d) => {
        import s.implicits._
        val base = concat_ws(
          ".",
          when(col("event_id") % 3 === 0, lit("10"))
            .when(col("event_id") % 3 === 1, lit("192"))
            .otherwise(lit("172")),
          (col("user_id") % 256).cast("string"),
          ((col("event_id") / lit(256)).cast("long") % 256).cast("string"),
          (col("event_id") % 256).cast("string"),
        )
        val ip = when(col("event_id") % 97 === 0, concat(base, lit(".7"))).otherwise(base)
        val flows = events(s, d).select(col("event_id"), ip.as("ip"), col("value"))
        val dim = Seq(
          ("10.0.0.0", 8, "net10"),
          ("192.0.0.0", 8, "net192"),
          ("10.0.0.0", 16, "campus0"),
          ("10.32.0.0", 16, "campus32"),
          ("10.64.0.0", 16, "campus64"),
          ("10.96.0.0", 16, "campus96"),
          ("10.32.0.0", 24, "rack0"),
          ("10.32.64.0", 24, "rack64"),
          ("10.32.128.0", 24, "rack128"),
          ("10.32.192.0", 24, "rack192"),
        ).toDF("prefix_ip", "prefix_len", "tag")
        graft.operators.NetflowOps.lpmEnrich(flows, dim)
          .groupBy(col("match_len"), col("tag"))
          .agg(
            count(lit(1)).as("n_flows"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
          )
          .orderBy("match_len", "tag")
      },
      Some {
        val ipFold =
          """list_reduce(list_prepend(CAST(0 AS BIGINT),
            |  list_transform(string_split(ip, '.'), ipp -> CAST(ipp AS BIGINT))),
            |  (ipa, ipb) -> ipa*256 + ipb)""".stripMargin
        val pfxFold = ipFold.replace("string_split(ip, '.')", "string_split(prefix_ip, '.')")
        def arm(l: Int) = {
          val mask = (0xFFFFFFFFL << (32 - l)) & 0xFFFFFFFFL
          s"""LEFT JOIN (SELECT ($pfxFold) & $mask AS net, prefix_ip, tag
             |           FROM dim WHERE prefix_len = $l) p$l
             |  ON (i.ipn & $mask) = p$l.net""".stripMargin
        }
        s"""WITH ips AS (
           |  SELECT event_id, value,
           |    CASE WHEN event_id % 97 = 0 THEN base || '.7' ELSE base END AS ip
           |  FROM (
           |    SELECT event_id, value,
           |      (CASE WHEN event_id % 3 = 0 THEN '10'
           |            WHEN event_id % 3 = 1 THEN '192'
           |            ELSE '172' END)
           |      || '.' || CAST(user_id % 256 AS VARCHAR)
           |      || '.' || CAST((event_id // 256) % 256 AS VARCHAR)
           |      || '.' || CAST(event_id % 256 AS VARCHAR) AS base
           |    FROM events)),
           |dim(prefix_ip, prefix_len, tag) AS (VALUES
           |  ('10.0.0.0', 8, 'net10'), ('192.0.0.0', 8, 'net192'),
           |  ('10.0.0.0', 16, 'campus0'), ('10.32.0.0', 16, 'campus32'),
           |  ('10.64.0.0', 16, 'campus64'), ('10.96.0.0', 16, 'campus96'),
           |  ('10.32.0.0', 24, 'rack0'), ('10.32.64.0', 24, 'rack64'),
           |  ('10.32.128.0', 24, 'rack128'), ('10.32.192.0', 24, 'rack192')),
           |probe AS (
           |  SELECT event_id, value, ip,
           |    CASE WHEN regexp_matches(ip,
           |      '^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[0-9][0-9]?)$$')
           |    THEN $ipFold END AS ipn
           |  FROM ips),
           |enriched AS (
           |  SELECT i.event_id, i.value,
           |    coalesce(CASE WHEN p24.prefix_ip IS NOT NULL THEN 24 END,
           |             CASE WHEN p16.prefix_ip IS NOT NULL THEN 16 END,
           |             CASE WHEN p8.prefix_ip IS NOT NULL THEN 8 END) AS match_len,
           |    coalesce(p24.tag, p16.tag, p8.tag) AS tag
           |  FROM probe i
           |  ${arm(24)}
           |  ${arm(16)}
           |  ${arm(8)})
           |SELECT match_len, tag, count(*) AS n_flows,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
           |FROM enriched GROUP BY match_len, tag
           |ORDER BY match_len NULLS FIRST, tag NULLS FIRST""".stripMargin
      },
    ),
    // P3 + P4 — the tshark path (README.md:259-286): nested dotted-leaf
    // extraction (field names contain literal dots → backtick
    // navigation) + epoch-seconds-string → time conversion. The nested
    // struct is built deterministically from events in the same shape
    // tshark -T json emits; the oracle derives the flattened leaves
    // directly. The time lands as epoch micros (unix_micros of the P4
    // conversion) so the check is timezone-independent; the oracle
    // replicates the identical double arithmetic (trunc = Spark's
    // double→long cast).
    Q(
      "nf_tshark_flatten",
      (s, d) => {
        val epochStr = concat(
          (lit(1700000000L) + col("event_id")).cast("string"),
          lit("."),
          lpad((col("event_id") % 1000000).cast("string"), 6, "0"),
        )
        val nested = events(s, d).select(
          struct(
            struct(
              struct(
                concat(lit("172.16."), (col("user_id") % 256).cast("string"), lit(".1")).as("ip.dst"),
                concat(lit("10.0."), (col("event_id") % 256).cast("string"), lit(".2")).as("ip.src"),
                lit("4").as("ip.version"),
              ).as("ip"),
              struct(epochStr.as("frame.time_epoch")).as("frame"),
              struct(
                (col("event_id") % 65536).cast("string").as("tcp.dstport"),
                lit("0x0018").as("tcp.flags"),
                (col("user_id") % 65536).cast("string").as("tcp.srcport"),
              ).as("tcp"),
            ).as("layers"),
          ).as("_source"),
        )
        NetflowOps
          .extractTsharkLeaves(nested)
          .select(
            col("ip_dst"),
            col("ip_src"),
            col("ip_ver"),
            col("tcp_srcport"),
            col("tcp_dstport"),
            col("tcp_flags"),
            unix_micros(NetflowOps.epochStringToTimestamp(col("timestamp"))).as("ts_us"),
          )
          .orderBy("ts_us")
      },
      Some("""SELECT
             |  '172.16.' || CAST(user_id % 256 AS VARCHAR) || '.1' AS ip_dst,
             |  '10.0.' || CAST(event_id % 256 AS VARCHAR) || '.2' AS ip_src,
             |  '4' AS ip_ver,
             |  CAST(user_id % 65536 AS VARCHAR) AS tcp_srcport,
             |  CAST(event_id % 65536 AS VARCHAR) AS tcp_dstport,
             |  '0x0018' AS tcp_flags,
             |  CAST(trunc(CAST(CAST(1700000000 + event_id AS VARCHAR) || '.' ||
             |         lpad(CAST(event_id % 1000000 AS VARCHAR), 6, '0') AS DOUBLE)
             |       * 1000000) AS BIGINT) AS ts_us
             |FROM events ORDER BY ts_us""".stripMargin),
    ),
    // Per-user integer EWMA baseline + spike count — the online anomaly
    // recursion in portable fixed-point arithmetic (cents, α = 1/8
    // floor division); the oracle's recursive CTE replays the identical
    // in-order fold, so every intermediate matches bit-for-bit.
    Q(
      "nf_ewma",
      (s, d) => EventOps.ewmaSpikes(events(s, d)),
      Some("""WITH RECURSIVE e AS (
             |  SELECT user_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS cents,
             |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |r AS (
             |  SELECT user_id, rn, cents AS ewma, CAST(0 AS BIGINT) AS spikes
             |  FROM e WHERE rn = 1
             |  UNION ALL
             |  SELECT e.user_id, e.rn,
             |         CAST(floor(CAST(e.cents + 7*r.ewma AS DOUBLE) / 8.0) AS BIGINT),
             |         r.spikes + CASE WHEN e.cents > 2*r.ewma THEN 1 ELSE 0 END
             |  FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1),
             |lst AS (SELECT user_id, max(rn) AS mx FROM e GROUP BY user_id)
             |SELECT r.user_id, CAST(l.mx AS BIGINT) AS n_events,
             |       r.ewma AS ewma_cents, r.spikes AS n_spikes
             |FROM r JOIN lst l ON r.user_id = l.user_id AND r.rn = l.mx
             |ORDER BY r.user_id""".stripMargin),
    ),
    // Peak concurrent flows per type — sweep-line max of the running
    // open-interval count over composite-integer endpoint keys (ends
    // close before starts at the same instant; RANGE frame makes the
    // running sum tie-deterministic). The oracle casts the final max
    // back to BIGINT (DuckDB window sums widen to HUGEINT).
    Q(
      "nf_concurrency",
      (s, d) => EventOps.maxConcurrent(events(s, d)),
      Some("""WITH pts AS (
             |  SELECT event_type, 2*epoch_us(ts) + 1 AS k, CAST(1 AS BIGINT) AS delta
             |  FROM events
             |  UNION ALL
             |  SELECT event_type,
             |         2*(epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 1000000) AS k,
             |         CAST(-1 AS BIGINT) AS delta
             |  FROM events),
             |run AS (
             |  SELECT event_type,
             |         sum(delta) OVER (PARTITION BY event_type ORDER BY k
             |           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
             |  FROM pts)
             |SELECT event_type, CAST(max(open) AS BIGINT) AS max_concurrent
             |FROM run GROUP BY event_type ORDER BY event_type""".stripMargin),
    ),
    // Rolling 7-day active users (the DAU/WAU gauge): sliding windows
    // via one Expand ×7 + ONE distinct-count shuffle — the exact path;
    // the sketch path for wider windows at 100 TB is q_hll_union's
    // re-aggregatable per-day HLLs.
    Q(
      "nf_sliding_distinct",
      (s, d) =>
        events(s, d)
          .groupBy(window(col("ts"), "7 days", "1 day"))
          .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
          .select(
            date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
            col("n_users"),
            col("n_events"),
          )
          .orderBy("win_start"),
      Some("""SELECT strftime(win_start, '%Y-%m-%d') AS win_start,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             |  count(*) AS n_events
             |FROM (SELECT user_id,
             |        date_trunc('day', ts) - to_days(CAST(k AS INT)) AS win_start
             |      FROM events, unnest([0, 1, 2, 3, 4, 5, 6]) AS t(k))
             |GROUP BY win_start ORDER BY win_start""".stripMargin),
    ),
    // Daily top talkers via the bounded-heap TopKPairs aggregate — the
    // per-window top-k shape that scales: the day×user rollup
    // partial-aggregates, then the per-day heap carries 3 rows per
    // partition into the exchange (no row_number window over the full
    // rollup). Ties → smaller user_id, the window ordering it replaces.
    Q(
      "nf_top_talkers_daily",
      (s, d) =>
        events(s, d)
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("user_id"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .groupBy(col("day"))
          .agg(
            graft.expressions.TopKPairs
              .topK(col("total_value"), col("user_id"), 3, ascending = false)
              .as("tk"),
          )
          .select(col("day"), explode(col("tk")).as("e"))
          .select(col("day"), col("e.id").as("user_id"), col("e.score").as("total_value"))
          .orderBy(col("day"), col("total_value").desc, col("user_id")),
      Some("""WITH t AS (SELECT strftime(ts, '%Y-%m-%d') AS day, user_id,
             |            CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |          FROM events GROUP BY day, user_id),
             |r AS (SELECT day, user_id, total_value,
             |        row_number() OVER (PARTITION BY day
             |                           ORDER BY total_value DESC, user_id) AS rn
             |      FROM t)
             |SELECT day, user_id, total_value FROM r WHERE rn <= 3
             |ORDER BY day, total_value DESC, user_id""".stripMargin),
    ),
    // Liveness monitoring: each user's LONGEST silence (max
    // inter-arrival gap, exact micros — NTZ-to-NTZ diff, no second
    // truncation ambiguity) — the heartbeat-timeout sizing view and
    // nf_burst's complement. Single-event users carry a NULL gap, the
    // honest answer both engines agree on.
    Q(
      "nf_idle_gap",
      (s, d) => graft.operators.NetflowOps.idleGap(
        events(s, d).select(col("user_id"), col("ts"), col("event_id"))),
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
             |l AS (SELECT user_id,
             |        us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap
             |      FROM e)
             |SELECT user_id, count(*) AS n_events, CAST(max(gap) AS BIGINT) AS max_gap_us
             |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin),
    ),
    // Burst detection (rate-limiter sizing): each user's PEAK event
    // count over any aligned 60-second window sliding by 10 s, plus
    // the earliest window achieving it. The slide enumeration is the
    // nf_window_sliding discipline in pure integer seconds (6 aligned
    // starts per event — Expand ×6, one count shuffle); the peak pick
    // is max + an equi-join back, never a row_number over raw events.
    // Core shared with the streaming twin (BurstStream — bit-identical,
    // StreamingSpec asserts over a two-batch split).
    Q(
      "nf_burst",
      (s, d) => graft.operators.NetflowOps.burstPeak(
        events(s, d).select(col("user_id"), col("ts"))),
      Some("""WITH e AS (SELECT user_id,
             |            CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec FROM events),
             |w AS (SELECT user_id, (sec // 10) * 10 - 10*k AS ws
             |      FROM e, unnest([0, 1, 2, 3, 4, 5]) AS t(k)),
             |g AS (SELECT user_id, ws, count(*) AS n FROM w GROUP BY user_id, ws),
             |m AS (SELECT user_id, CAST(max(n) AS BIGINT) AS peak_events
             |      FROM g GROUP BY user_id)
             |SELECT g.user_id, m.peak_events, CAST(min(g.ws) AS BIGINT) AS at_ws
             |FROM g JOIN m ON m.user_id = g.user_id AND g.n = m.peak_events
             |GROUP BY g.user_id, m.peak_events ORDER BY g.user_id""".stripMargin),
    ),
    // Seasonal-adjusted anomalies: each event scored against ITS OWN
    // (type, hour-of-day) baseline — the profile join-back pattern (the
    // 120-row baseline broadcasts onto the scan; a global threshold
    // would flag every nightly batch run). Anomaly = value > 3× the
    // exact decimal baseline mean for that slot.
    Q(
      "nf_seasonal_anomaly",
      (s, d) => {
        val base = events(s, d)
          .groupBy(col("event_type").as("bt"), hour(col("ts")).cast("long").as("bh"))
          .agg(
            (sum(col("value").cast("decimal(18,2)")).cast("double") /
              count(lit(1))).as("avg_value"),
          )
        events(s, d)
          .join(
            broadcast(base),
            col("event_type") === col("bt") && hour(col("ts")).cast("long") === col("bh"),
          )
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(when(col("value") > col("avg_value") * 3, 1L).otherwise(0L))
              .as("n_anomalies"),
          )
          .orderBy("event_type")
      },
      Some("""WITH b AS (
             |  SELECT event_type, extract(hour FROM ts) AS hr,
             |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
             |           AS avg_value
             |  FROM events GROUP BY event_type, hr)
             |SELECT e.event_type, count(*) AS n_events,
             |  CAST(sum(CASE WHEN e.value > b.avg_value * 3 THEN 1 ELSE 0 END)
             |       AS BIGINT) AS n_anomalies
             |FROM events e JOIN b
             |  ON b.event_type = e.event_type AND b.hr = extract(hour FROM e.ts)
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin),
    ),
    // Robust outliers per type: EXACT lower-median + median absolute
    // deviation by order-statistic SELECTION (a datum, not engine-
    // specific interpolation), outlier = dev > 3·MAD. Complements the
    // mean/σ z-score detector, which outliers themselves inflate.
    Q(
      "nf_mad",
      (s, d) => EventOps.madOutliers(events(s, d)),
      Some("""WITH e AS (SELECT event_type, event_id, value FROM events),
             |m AS (SELECT event_type, value AS med FROM (
             |        SELECT event_type, value,
             |          row_number() OVER (PARTITION BY event_type
             |                             ORDER BY value, event_id) AS rn,
             |          count(*) OVER (PARTITION BY event_type) AS n
             |        FROM e) WHERE rn = floor((n+1) / 2)),
             |d AS (SELECT e.event_type, e.event_id, e.value, m.med,
             |             abs(e.value - m.med) AS dev
             |      FROM e JOIN m USING (event_type)),
             |md AS (SELECT event_type, dev AS mad FROM (
             |        SELECT event_type, dev, event_id,
             |          row_number() OVER (PARTITION BY event_type
             |                             ORDER BY dev, event_id) AS rn,
             |          count(*) OVER (PARTITION BY event_type) AS n
             |        FROM d) WHERE rn = floor((n+1) / 2))
             |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
             |  min(d.med) AS median_value, min(md.mad) AS mad,
             |  CAST(sum(CASE WHEN d.dev > md.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM d JOIN md USING (event_type)
             |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin),
    ),
  )
}

package graft

import graft.operators.EventOps
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
      Some(s"""SELECT event_id, user_id, CAST(value AS DECIMAL(18,2)) AS value
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
             |       CAST(value AS DECIMAL(18,2)) AS value
             |FROM events WHERE event_type <> 'error' ORDER BY event_id""".stripMargin),
    ),
    Q(
      "nf_access_trend",
      (s, d) => EventOps.accessTrend(events(s, d), lo, hi),
      Some(s"""SELECT substr(strftime(ts, '%Y-%m-%d %H:%M:%S.%f'), 1, 10) AS day,
              |       sum(CASE WHEN user_id = ${EventOps.HostId} THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS in_value,
              |       CAST(sum(CASE WHEN user_id = ${EventOps.HostId} THEN 1 ELSE 0 END) AS BIGINT) AS in_events,
              |       sum(CASE WHEN user_id <> ${EventOps.HostId} THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS out_value,
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
             |       sum(CAST(value AS DECIMAL(18,2))) AS total_value
             |FROM events GROUP BY window_start ORDER BY window_start""".stripMargin),
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
            sum(col("value").cast("decimal(18,2)")).as("total_value"),
            count(lit(1)).as("n_events"),
          )
          .orderBy(col("total_value").desc, col("user_id"))
          .limit(10)
      },
      Some("""SELECT user_id, sum(CAST(value AS DECIMAL(18,2))) AS total_value,
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
          .orderBy("key")
      },
      Some("""SELECT user_id AS key, sum(CAST(value AS DECIMAL(18,2))) AS total,
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
            sum(col("value").cast("decimal(18,2)")).as("session_value"),
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
             |       sum(CAST(value AS DECIMAL(18,2))) AS session_value
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
             |       sum(CAST(value AS DECIMAL(18,2))) AS session_value
             |FROM t GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin),
    ),
  )
}

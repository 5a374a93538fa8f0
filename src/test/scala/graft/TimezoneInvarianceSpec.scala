package graft

/** The driver runs `SparkEntry.entry` (and any consumer may run the
  * registry) on a session whose timezone the engine does not control —
  * so every query must be SESSION-TIMEZONE INDEPENDENT: events.ts is
  * TIMESTAMP_NTZ end to end, epoch arithmetic goes through NTZ
  * literals, and day/hour renderings are wall-clock functions of the
  * NTZ value. This spec pins that: a sample of the most tz-sensitive
  * registry queries (window bucketing, epoch sweep keys, EWMA ordering,
  * ISO-week truncation, hour extraction, day substrings) must return
  * IDENTICAL rows under UTC and a DST-shifting zone.
  *
  * (Round-9 regression this guards: a `TIMESTAMP_NTZ '...'` SQL literal
  * inside timestampdiff coerced ts through the session zone — caught by
  * plan inspection, fixed with a LocalDateTime literal; this spec makes
  * the whole class of bug a test failure instead of a plan-read.)
  */
class TimezoneInvarianceSpec extends SparkSpec {

  private val queries = Seq(
    "nf_window_10s",
    "nf_window_sliding",
    "nf_concurrency",
    "nf_ewma",
    "nf_day_tod",
    "q_wow",
    "q_hourly_profile",
    "q_user_growth",
    "nf_sessionize",
  )

  test("time-derived registry queries are session-timezone independent") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (name <- queries) {
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        val utc = Registry.queries(name)(spark, Sf).collect().map(_.toString).toSeq
        // America/New_York shifts −5h/−4h across DST — any LTZ coercion
        // of the NTZ data moves window starts, days, hours, or sweep
        // keys and diverges here.
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val ny = Registry.queries(name)(spark, Sf).collect().map(_.toString).toSeq
        assert(utc.nonEmpty, s"$name returned no rows")
        assert(utc == ny, s"$name is session-timezone DEPENDENT:\n  utc=${utc.take(3)}\n  ny=${ny.take(3)}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}

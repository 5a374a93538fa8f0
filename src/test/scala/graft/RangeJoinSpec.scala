package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoinOp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // Points across three weeks; intervals of varied spans, including one
  // spanning several bins, one empty (lo > hi → no bins via sequence
  // guard? lo <= hi always here), and touching boundaries exactly.
  private val points = Seq(
    (1L, ts("2024-01-01 00:00:00")),
    (2L, ts("2024-01-05 12:00:00")),
    (3L, ts("2024-01-14 23:59:59")),
    (4L, ts("2024-01-15 00:00:00")),
    (5L, ts("2024-01-21 06:00:00")),
  ).toDF("pid", "p_ts")

  private val intervals = Seq(
    (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")), // degenerate, = point 1
    (11L, ts("2024-01-04 00:00:00"), ts("2024-01-20 00:00:00")), // spans several bins
    (12L, ts("2024-01-15 00:00:00"), ts("2024-01-16 00:00:00")), // closed-lo boundary
    (13L, ts("2023-12-01 00:00:00"), ts("2023-12-31 23:59:59")), // before all points
  ).toDF("iid", "lo", "hi")

  test("binned range join equals the theta join, for bin widths around the span") {
    val theta = points
      .join(intervals, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(theta.nonEmpty)
    for (binSeconds <- Seq(3600L, 86400L, 7L * 86400L, 30L * 86400L)) {
      val binned = RangeJoinOp
        .rangeJoin(points, intervals, col("p_ts"), col("lo"), col("hi"), binSeconds)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(binned.length == binned.toSet.size, s"duplicate pairs at bin=$binSeconds")
      assert(binned.toSet == theta, s"mismatch at bin=$binSeconds")
    }
  }

  test("the plan is a bin equi-join, not a nested-loop/cartesian product") {
    val plan = RangeJoinOp
      .rangeJoin(points, intervals, col("p_ts"), col("lo"), col("hi"), 86400L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"cartesian-style plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian-style plan:\n$plan")
  }

  test("zoned timestamps bin on instants: sub-hour bins survive a DST fall-back") {
    // America/Los_Angeles 2024-11-03: wall clock replays 01:00-01:59.
    // Instant-based rows: interval [08:30Z, 09:30Z] contains the point
    // 09:10Z. Binning on session-zone WALL CLOCK (the old formulation)
    // with 30-min bins puts the point (wall 01:10, second pass) in a bin
    // BELOW bin(lo) (wall 01:30, first pass) — the pair silently drops.
    // Instant (epoch) binning is monotone regardless of zone.
    val fallback = 1730624400L // 2024-11-03 09:00:00 UTC = 01:00 PST
    val dstPoints = Seq((1L, fallback + 600)).toDF("pid", "p_sec")
      .select(col("pid"), timestamp_seconds(col("p_sec")).as("p_ts"))
    val dstIntervals = Seq((10L, fallback - 1800, fallback + 1800)).toDF("iid", "lo_s", "hi_s")
      .select(
        col("iid"),
        timestamp_seconds(col("lo_s")).as("lo"),
        timestamp_seconds(col("hi_s")).as("hi"),
      )
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      val got = RangeJoinOp
        .rangeJoin(dstPoints, dstIntervals, col("p_ts"), col("lo"), col("hi"), 1800L)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L)))
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("mixed TIMESTAMP / TIMESTAMP_NTZ columns are rejected") {
    val ntzIntervals = intervals.select(
      col("iid"),
      col("lo").cast("timestamp_ntz").as("lo"),
      col("hi").cast("timestamp_ntz").as("hi"),
    )
    intercept[IllegalArgumentException] {
      RangeJoinOp.rangeJoin(points, ntzIntervals, col("p_ts"), col("lo"), col("hi"), 3600L)
    }
  }

  test("NTZ-everywhere inputs still join correctly (zone-free wall-clock bins)") {
    val p = points.select(col("pid"), col("p_ts").cast("timestamp_ntz").as("p_ts"))
    val i = intervals.select(
      col("iid"),
      col("lo").cast("timestamp_ntz").as("lo"),
      col("hi").cast("timestamp_ntz").as("hi"),
    )
    val theta = p.join(i, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val binned = RangeJoinOp
      .rangeJoin(p, i, col("p_ts"), col("lo"), col("hi"), 86400L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == theta && theta.nonEmpty)
  }

  test("the registered q_range_join query plans without a nested loop") {
    val df = Registry.queries("q_range_join")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"cartesian-style plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian-style plan:\n$plan")
    assert(df.count() >= 0)
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The injected optimizer rule: a plain interval-containment theta join,
  * written with zero knowledge of RangeJoinOp, must come out as a binned
  * equi-join in sessions built with graft.GraftExtensions — with results
  * identical to the nested-loop plan. Extensions are a static conf, so
  * this suite swaps the shared session like GraftExtensionsSpec does.
  */
class AutoRangeJoinSpec extends AnyFunSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("containment theta joins rewrite to binned equi-joins under the extension") {
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import spark.implicits._
      val points = Seq(
        (1L, ts("2024-01-01 00:00:00")),
        (2L, ts("2024-01-05 12:00:00")),
        (3L, ts("2024-01-14 23:59:59")),
        (4L, ts("2024-01-21 06:00:00")),
      ).toDF("pid", "p_ts")
      val intervals = Seq(
        (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")),
        (11L, ts("2024-01-04 00:00:00"), ts("2024-01-20 00:00:00")),
        (12L, ts("2024-01-21 00:00:00"), ts("2024-01-20 00:00:00")), // lo > hi: no matches
        (13L, ts("2023-12-01 00:00:00"), ts("2023-12-31 23:59:59")),
      ).toDF("iid", "lo", "hi")

      // The natural formulation — no bins, no hints.
      val theta = points.join(intervals, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      val plan = theta.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"rule did not fire:\n$plan")
      val got = theta.select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (2L, 11L), (3L, 11L)))

      // Reversed operand orientations rewrite too.
      val reversed = intervals.join(points, col("lo") <= col("p_ts") && col("hi") >= col("p_ts"))
      val rplan = reversed.queryExecution.executedPlan.toString
      assert(!rplan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$rplan")
      assert(reversed.select("pid", "iid").as[(Long, Long)].collect().toSet == got)

      // Extra cross-side predicates survive as join residuals: the
      // rewrite keeps the FULL original condition alongside the bin
      // equality, so extra conjuncts filter exactly as before.
      val extra = points.join(
        intervals,
        col("p_ts") >= col("lo") && col("p_ts") <= col("hi") && col("pid") =!= col("iid"),
      )
      val eplan = extra.queryExecution.executedPlan.toString
      assert(!eplan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$eplan")
      assert(extra.select("pid", "iid").as[(Long, Long)].collect().toSet ==
        got.filter { case (p, i) => p != i })

      // Equi-joins are untouched territory: the guard must not rewrite.
      val equi = points.join(intervals, col("pid") === col("iid") && col("p_ts") >= col("lo"))
      assert(equi.count() == 0L) // pid/iid disjoint — just exercising the path

      // Kill switch restores the nested loop.
      spark.conf.set("spark.graft.autoRangeJoin.enabled", "false")
      val off = points
        .join(intervals, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      val offPlan = off.queryExecution.executedPlan.toString
      assert(offPlan.contains("BroadcastNestedLoopJoin"), s"kill switch ignored:\n$offPlan")
      assert(off.select("pid", "iid").as[(Long, Long)].collect().toSet == got)
      spark.conf.set("spark.graft.autoRangeJoin.enabled", "true")

      // Bin width is a fan-out knob, not a correctness knob.
      spark.conf.set("spark.graft.autoRangeJoin.binSeconds", "3600")
      val narrow = points.join(intervals, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      assert(narrow.select("pid", "iid").as[(Long, Long)].collect().toSet == got)

      // Fan-out bound: a multi-year interval at hourly bins would be
      // ~18k bin copies; with the cap it takes the nested-loop branch of
      // the capped split instead (a Union glues the two), and the result
      // still equals the theta join. The interval set is otherwise the
      // same, so expected = got + every point paired with the wide row.
      spark.conf.set("spark.graft.autoRangeJoin.maxBinsPerRow", "8")
      val wide = intervals.union(
        Seq((14L, ts("2023-01-01 00:00:00"), ts("2025-01-01 00:00:00"))).toDF("iid", "lo", "hi"),
      )
      val capped = points.join(wide, col("p_ts") >= col("lo") && col("p_ts") <= col("hi"))
      val cplan = capped.queryExecution.optimizedPlan.toString
      assert(cplan.contains("Union"), s"capped split did not fire:\n$cplan")
      val wantWide = got ++ Set(1L, 2L, 3L, 4L).map(p => (p, 14L))
      assert(capped.select("pid", "iid").as[(Long, Long)].collect().toSet == wantWide)
      // The rewrite is a fixpoint: exactly the two branch joins — if the
      // rule re-fired on its own long branch, the fixed-point batch
      // would nest unions until maxIterations.
      val numJoins = capped.queryExecution.optimizedPlan.collect {
        case jn: org.apache.spark.sql.catalyst.plans.logical.Join => jn
      }.size
      assert(numJoins == 2, s"expected 2 joins (binned + long), got $numJoins:\n$cplan")
      spark.conf.set("spark.graft.autoRangeJoin.binSeconds", "86400")
      spark.conf.unset("spark.graft.autoRangeJoin.maxBinsPerRow")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}

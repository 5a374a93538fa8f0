package graft

/** Standing plan audit over the ENTIRE registry: no query may plan a
  * CartesianProduct — the unconditional all-pairs operator that turns a
  * forgotten join key or a non-broadcastable cross join into an O(n²)
  * shuffle at scale. (BroadcastNestedLoopJoin is deliberately allowed:
  * every cross join in the codebase broadcasts a 1-row aggregate or a
  * bounded dimension side, which is exactly what BNLJ-with-broadcast
  * expresses; CartesianProduct is what appears when that contract
  * breaks.) Plans are built, not executed — except the index-served
  * queries, whose memoized artifact builds run once at this spec's tiny
  * SF.
  */
class PlanAuditSpec extends SparkSpec {

  test("no registry query plans a CartesianProduct") {
    val offenders = Registry.all.flatMap { q =>
      val plan =
        try q.run(spark, Sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: $e" }
      if (plan.contains("CartesianProduct") || plan.startsWith("PLANNING FAILED"))
        Some(q.name -> plan.linesIterator.take(3).mkString(" | "))
      else None
    }
    assert(offenders.isEmpty, s"cartesian/unplannable queries: ${offenders.map(_._1)}\n${offenders.take(3)}")
  }
}

package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{
  HashAggregateExec,
  ObjectHashAggregateExec,
  SortAggregateExec,
}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

object PlanAudit {

  /** AdaptiveSparkPlanExec has NO children (its physical plan hangs off
    * a field, not the child list), so a naive `collect` over an AQE
    * root sees nothing and the audit passes vacuously — unwrap it
    * (and keep unwrapping: subquery plans nest their own AQE roots).
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      unwrap(a.executedPlan)
    case other => other
  }

  /** True iff every leaf-to-root path in `p` passes through an
    * aggregate — i.e. the subtree's output cardinality is grouped-down,
    * not row-per-record. This is what makes an unpartitioned window
    * legitimate: a cumulative pass over per-group rows (e.g.
    * PrefixOps' #partitions-row offset table) is bounded; the same
    * window directly over a scan is a single-task sort of the corpus.
    */
  def aggregatedInput(p: SparkPlan): Boolean = unwrap(p) match {
    case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
    case leaf if leaf.children.isEmpty => false
    case other => other.children.forall(aggregatedInput)
  }

  /** Unpartitioned windows (empty partition spec) in `plan` whose input
    * is NOT aggregated-down — the single-partition-sort scale killers.
    */
  def unpartitionedWindowsOverData(plan: SparkPlan): Seq[SparkPlan] = {
    val p = unwrap(plan)
    val here = p match {
      case w: WindowExec if w.partitionSpec.isEmpty && !aggregatedInput(w.child) => Seq(w)
      case w: WindowGroupLimitExec if w.partitionSpec.isEmpty && !aggregatedInput(w.child) =>
        Seq(w)
      case _ => Seq.empty
    }
    here ++ p.children.flatMap(unpartitionedWindowsOverData)
  }
}

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
  *
  * Second standing rule (round 10): no query may plan an UNPARTITIONED
  * window over row-per-record input — the single-partition analog of
  * the CartesianProduct rule. `ntile()/row_number()/sum() OVER (ORDER
  * BY …)` with no PARTITION BY sorts the whole input through ONE task
  * unless the input is already aggregated down (a rollup row per
  * group/partition/day is fine; the corpus is not). The round-9 forms
  * of q_histogram_equidepth (global ntile over lineitem) and
  * tx_vocab_growth (global cumulative sums over one row per document)
  * fail this audit; their two-pass PrefixOps replacements pass it.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Seq[(String, Either[String, SparkPlan])] =
    Registry.all.map { q =>
      q.name -> (try Right(q.run(spark, Sf).queryExecution.executedPlan)
      catch { case e: Throwable => Left(s"PLANNING FAILED: $e") })
    }

  test("no registry query plans a CartesianProduct") {
    val offenders = plans.flatMap {
      case (name, Left(err)) => Some(name -> err)
      case (name, Right(plan)) =>
        if (plan.toString.contains("CartesianProduct"))
          Some(name -> plan.toString.linesIterator.take(3).mkString(" | "))
        else None
    }
    assert(
      offenders.isEmpty,
      s"cartesian/unplannable queries: ${offenders.map(_._1)}\n${offenders.take(3)}",
    )
  }

  test("no registry query plans an unpartitioned window over row-per-record input") {
    val offenders = plans.flatMap {
      case (_, Left(_)) => None // reported by the cartesian test
      case (name, Right(plan)) =>
        val bad = PlanAudit.unpartitionedWindowsOverData(plan)
        if (bad.nonEmpty)
          Some(name -> bad.head.toString.linesIterator.take(2).mkString(" | "))
        else None
    }
    assert(
      offenders.isEmpty,
      s"single-partition-window queries: ${offenders.map(_._1)}\n${offenders.take(5)}",
    )
  }

  test("the audit itself is red on the literal global-ntile form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val oldForm = Tables.lineitem(spark, Sf)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("bucket", ntile(10).over(w))
    assert(
      PlanAudit.unpartitionedWindowsOverData(oldForm.queryExecution.executedPlan).nonEmpty,
      "the audit must flag a global window over a raw scan",
    )
  }
}

package graft

/** Physical-plan assertions for the TPC-H-shape queries: each one exists
  * to exercise a specific optimizer path, so the spec pins that the path
  * actually fires (a value-correct plan that, say, re-executes a
  * correlated subquery per row would still hash-match — these tests are
  * what keeps the SCALE story honest).
  */
class TpchShapesSpec extends SparkSpec {

  private def plan(name: String): String =
    Registry.queries(name)(spark, Sf).queryExecution.executedPlan.toString

  test("q4: EXISTS plans as one LEFT SEMI hash join, no subquery re-execution") {
    val p = plan("q4_priority_check")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q19: disjunction pushes per-side implications into both scans") {
    val p = plan("q19_disjunctive")
    // Catalyst pushes each side's full OR-of-ANDs projection to its own
    // parquet scan: the quantity arms onto lineitem, the brand/size arms
    // onto part (visible as Or(Or(And(...))) in PushedFilters).
    assert(p.contains("Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)"), p)
    assert(p.contains("Or(Or(And(EqualTo(p_brand,Brand#4)"), p)
  }

  test("q10: top-20 plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q10_returned_items")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q17: correlated avg decorrelates to one per-part aggregate join") {
    val p = plan("q17_small_quantity")
    // Two lineitem scans (agg + probe), no nested-loop machinery.
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q22: scalar mean is a 1-row broadcast, idle set is a LEFT ANTI join") {
    val p = plan("q22_idle_customers")
    assert(p.contains("LeftAnti"), p)
  }

  test("q_join_shufflehash: the hint flips the fact join to ShuffledHashJoin") {
    val p = plan("q_join_shufflehash")
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_join_nullsafe: null-safe equality still plans a hash join, not a nested loop") {
    val p = plan("q_join_nullsafe")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q_skew_join_salted: the join key carries the salt") {
    val p = plan("q_skew_join_salted")
    assert(p.contains("__salt"), p)
  }

  test("q7/q8: dims broadcast; the only repeated shuffle keys are fact keys") {
    val p7 = plan("q7_volume_shipping")
    assert(p7.contains("BroadcastHashJoin"), p7)
    assert(!p7.contains("CartesianProduct"), p7)
    val p8 = plan("q8_market_share")
    assert(p8.contains("BroadcastHashJoin"), p8)
    assert(!p8.contains("BroadcastNestedLoopJoin"), p8)
  }

  test("q6: every predicate reaches the parquet scan — zero joins, one agg") {
    val p = plan("q6_forecast_revenue")
    // The PushedFilters list is toString-truncated, so assert its head
    // plus the full predicate set on the post-scan Filter node.
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains(">= 1995-01-01") && p.contains("< 1996-01-01"), p)
    assert(p.contains("l_quantity") && p.contains("< 24.0"), p)
    assert(!p.contains("Join"), p)
  }

  test("q9: part filter and dims broadcast; no nested loop anywhere") {
    val p = plan("q9_product_profit")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    // The %red% part filter is applied at its scan, not after the join.
    assert(p.contains("Contains(p_name,red)"), p)
  }

  test("q15: the max-revenue argmax is a 1-row broadcast equality join, not a sort") {
    val p = plan("q15_top_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q16: COUNT(DISTINCT suppkey) plans the two-phase distinct-then-count expansion") {
    val p = plan("q16_supplier_cnt")
    // Phase 1 groups on (brand, type, size, suppkey); phase 2 counts —
    // both keyed hash aggregates, no global distinct materialization.
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("l_suppkey"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q20: two-grain nested aggregation feeds a semi-join, never a nested loop") {
    val p = plan("q20_promo_suppliers")
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q12: the delay audit is one sort-merge join with map-side-combined CASE sums") {
    val p = plan("q12_late_lines")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}

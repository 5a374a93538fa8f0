package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite interval-containment theta joins into binned
  * equi-joins automatically.
  *
  * A join whose only cross-side predicates are `lo <= p <= hi` (any mix
  * of strict/non-strict bounds over timestamps) has no equi-join keys,
  * so Spark can only plan BroadcastNestedLoopJoin — O(|left|·|right|)
  * comparisons. [[graft.operators.RangeJoinOp]] is the explicit rewrite;
  * this rule applies the same reformulation inside Catalyst so the
  * natural theta join gets the scalable plan without the caller knowing
  * the trick: tag the point side with its time bin, explode the interval
  * side into every bin it overlaps, equi-join on the bin, keep the full
  * original predicate for exactness. Output is IDENTICAL to the theta
  * join: a point's bin is unique, so each qualifying pair meets in
  * exactly one bin — no duplicates, no loss.
  *
  * Guards, deliberately narrow:
  *   - batch only: a stream-stream interval join must keep its native
  *     shape — Spark derives state-eviction bounds from the raw time
  *     conditions, and the interval side's bin explode would change
  *     per-row cardinality under watermark accounting;
  *   - inner joins only, and only when NO cross-side equality conjunct
  *     exists (hash/sort-merge already handle those — and since the
  *     rewritten join contains a bin equality, this guard also makes the
  *     rule idempotent under fixed-point batches);
  *   - one point expression must carry both bounds (semantic equality),
  *     the point evaluable on one child, both bounds on the other, all
  *     three of timestamp type;
  *   - interval rows with `lo > hi` are pre-filtered (they cannot match,
  *     and a descending Sequence would fabricate bins).
  *
  * Binning: epoch micros (`UnixMicros`; NTZ normalizes through one
  * session-zone cast — monotone on every fixed-offset zone) floor-divided
  * by `spark.graft.autoRangeJoin.binSeconds` (default 86400). Bin width
  * affects only interval fan-out (span/width + 1 copies), never
  * correctness. Disable with `spark.graft.autoRangeJoin.enabled=false`.
  *
  * Fan-out bound: a single interval spanning years would explode into
  * thousands of bin copies — a long-span outlier could make the rewrite
  * far WORSE than the nested loop it replaces. So interval rows are
  * split by bin span at `spark.graft.autoRangeJoin.maxBinsPerRow`
  * (default 256): short spans take the binned equi-join; the long-span
  * outliers keep the original theta join (nested loop over just those
  * rows, which is exactly the right plan for a handful of giant
  * intervals); a Union glues the two. Each interval row lands in
  * exactly one branch, so output equality with the theta join is
  * preserved. The long branch is detected on refire by its span-guard
  * filter, keeping the rule idempotent. Set `maxBinsPerRow <= 0` to
  * disable the split (pure binned rewrite).
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule` — a
  * whole-plan Catalyst extension composed purely of built-in operators
  * (Project / Filter / Generate / Join), so AQE, pushdown, and codegen
  * all apply to the rewritten plan unchanged.
  */
object AutoRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Marks the long-span theta join this rule itself emits, so refires
    * recognize it in O(1) instead of (only) by structural signature.
    * Tags survive `withNewChildren`/`makeCopy`, i.e. every rule that
    * rewrites children while keeping the Join node, which is the normal
    * optimizer path for an equality-free join.
    */
  private[graft] val LongBranchTag =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.autoRangeJoin.longBranch")

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.autoRangeJoin.enabled", "true").toBoolean
  private def binSeconds: Long =
    SQLConf.get.getConfString("spark.graft.autoRangeJoin.binSeconds", "86400").toLong
  private def maxBinsPerRow: Long =
    SQLConf.get.getConfString("spark.graft.autoRangeJoin.maxBinsPerRow", "256").toLong

  private def isTimestamp(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  /** Epoch-micros bin with floor semantics. The double round-trip is
    * exact: |epoch micros| for any realistic timestamp is far below
    * 2^53.
    */
  private def bin(e: Expression, widthSeconds: Long): Expression = {
    val micros = e.dataType match {
      case TimestampType => UnixMicros(e)
      case _ => UnixMicros(Cast(e, TimestampType, Some(SQLConf.get.sessionLocalTimeZone)))
    }
    Floor(Divide(Cast(micros, DoubleType), Literal((widthSeconds * 1000000L).toDouble)))
  }

  /** Each comparison conjunct yields BOTH readings: `a >= b` is "a is
    * lower-bounded by b" and "b is upper-bounded by a". The pairing step
    * (same point, sides split correctly) picks the valid reading.
    * Returns (lowerCandidates, upperCandidates) as (point, bound) pairs.
    */
  private def readings(c: Expression): (Seq[(Expression, Expression)], Seq[(Expression, Expression)]) =
    c match {
      case GreaterThanOrEqual(a, b) => (Seq((a, b)), Seq((b, a)))
      case GreaterThan(a, b) => (Seq((a, b)), Seq((b, a)))
      case LessThanOrEqual(a, b) => (Seq((b, a)), Seq((a, b)))
      case LessThan(a, b) => (Seq((b, a)), Seq((a, b)))
      case _ => (Seq.empty, Seq.empty)
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || binSeconds <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if !left.isStreaming && !right.isStreaming =>
      val crossSide = splitConjunctivePredicates(cond)
        .filter(c => !canEvaluate(c, left) && !canEvaluate(c, right))
      def split(a: Expression, b: Expression): Boolean =
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(b, left) && canEvaluate(a, right))
      val hasEqui = crossSide.exists {
        case EqualTo(a, b) => split(a, b)
        case EqualNullSafe(a, b) => split(a, b)
        case _ => false
      }
      if (hasEqui) j
      else {
        val (lowers, uppers) = crossSide.map(readings).unzip
        val width = binSeconds
        val pair = (for {
          (p1, lo) <- lowers.flatten
          (p2, hi) <- uppers.flatten
          if p1.semanticEquals(p2) && isTimestamp(p1) && isTimestamp(lo) && isTimestamp(hi)
          pOnLeft = canEvaluate(p1, left) && canEvaluate(lo, right) && canEvaluate(hi, right)
          pOnRight = canEvaluate(p1, right) && canEvaluate(lo, left) && canEvaluate(hi, left)
          if pOnLeft || pOnRight
        } yield (p1, lo, hi, pOnLeft)).headOption
        pair match {
          case None => j
          case Some((p, lo, hi, pOnLeft)) =>
            val pointChild = if (pOnLeft) left else right
            val intervalChild = if (pOnLeft) right else left
            val cap = maxBinsPerRow
            val span = Subtract(bin(hi, width), bin(lo, width))
            // Idempotence with the capped split: the long-span branch we
            // emit below is itself an equality-free theta join, so on the
            // next fixed-point iteration the rule would match it again
            // (span <= cap AND span > cap → empty short side, forever).
            // Primary signal: the [[LongBranchTag]] stamped on the
            // emitted join. Fallback (tags are lost if some rule rebuilds
            // the Join node from scratch rather than via withNewChildren):
            // the span-vs-cap guard Filter somewhere on the interval side
            // — predicate pushdown may have sunk it arbitrarily deep, so
            // the whole subtree is scanned. The fallback can in theory
            // suppress the rewrite for a user predicate that encodes the
            // identical floor(unix_micros/width) span comparison — a
            // missed optimization, never a wrong result, and the internal
            // bin shape makes an accidental match implausible.
            val isLongBranch = j.getTagValue(LongBranchTag).contains(true) ||
              (cap > 0 && intervalChild.exists {
              case f: Filter =>
                splitConjunctivePredicates(f.condition).exists {
                  case GreaterThan(a, _) => a.semanticEquals(span)
                  case LessThanOrEqual(a, _) => a.semanticEquals(span)
                  case _ => false
                }
              case _ => false
            })
            if (isLongBranch) j
            else {
              val pBin = Alias(bin(p, width), "__graft_p_bin")()
              val newPoint = Project(pointChild.output :+ pBin, pointChild)
              val validInterval = LessThanOrEqual(lo, hi)
              val shortPred =
                if (cap > 0) And(validInterval, LessThanOrEqual(span, Literal(cap)))
                else validInterval
              // Sequence element type is non-null long; the attr must match.
              val iBin = AttributeReference("__graft_i_bin", LongType, nullable = false)()
              val newInterval = Generate(
                Explode(new Sequence(bin(lo, width), bin(hi, width), None,
                  Some(SQLConf.get.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil,
                outer = false,
                qualifier = None,
                generatorOutput = Seq(iBin),
                Filter(shortPred, intervalChild),
              )
              val binEq = EqualTo(pBin.toAttribute, iBin)
              val binnedJoin =
                if (pOnLeft) Join(newPoint, newInterval, Inner, Some(And(binEq, cond)), hint)
                else Join(newInterval, newPoint, Inner, Some(And(binEq, cond)), hint)
              val binned = Project(j.output, binnedJoin)
              if (cap <= 0) binned
              else {
                // Long-span outliers: the original theta join over just
                // those interval rows. Sharing subtrees (and exprIds)
                // across Union branches is fine — it is the self-union
                // shape `df.union(df)` produces.
                val longFilter =
                  Filter(And(validInterval, GreaterThan(span, Literal(cap))), intervalChild)
                val longJoin =
                  if (pOnLeft) Join(pointChild, longFilter, Inner, Some(cond), hint)
                  else Join(longFilter, pointChild, Inner, Some(cond), hint)
                longJoin.setTagValue(LongBranchTag, true)
                Union(Seq(binned, Project(j.output, longJoin)))
              }
            }
        }
      }
    }
  }
}

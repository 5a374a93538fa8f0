package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each point row with every
  * interval row whose `[lo, hi]` contains the point — an operator Spark
  * has no native plan for. Declared as a plain theta join
  * (`lo <= p && p <= hi`), Catalyst can only produce
  * BroadcastNestedLoopJoin: O(|points|·|intervals|) comparisons, the
  * same cartesian trap the all-pairs embedding join had — fatal at any
  * real scale.
  *
  * This is the standard binning reformulation (what Sedona and the
  * engines with RANGE_JOIN hints do): quantize time into fixed-width
  * bins, replicate each interval into every bin it overlaps (bounded
  * fan-out: span/binWidth + 1 copies, so ~2 when the bin width matches
  * the dominant interval span), tag each point with its single bin, and
  * equi-join on the bin before applying the exact containment predicate.
  * A point's bin is unique, so a (point, interval) pair meets in exactly
  * one bin — no duplicate pairs, no recall loss: output is IDENTICAL to
  * the theta join. The plan becomes shuffle-on-bin + sort-merge (or
  * broadcast-hash when one side is small) — linear data movement,
  * partitionable by bin at 100 TB, with per-bin skew bounded by the bin
  * width choice.
  */
object RangeJoinOp {

  /** `points ⋈ intervals ON lo <= point <= hi` (both ends closed).
    *
    * @param point      timestamp (or any castable-to-long) column on `points`
    * @param lo         interval start column on `intervals`
    * @param hi         interval end column on `intervals`
    * @param binSeconds bin width; pick ≈ the typical interval span so
    *                   each interval lands in ~2 bins
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      point: Column,
      lo: Column,
      hi: Column,
      binSeconds: Long,
  ): DataFrame = {
    require(binSeconds > 0, s"bin width must be positive, got $binSeconds")
    // Tz-free wall-clock seconds since epoch: NTZ columns never touch
    // the session zone (TIMESTAMP→BIGINT casts aren't defined for NTZ
    // anyway); LTZ columns normalize through one NTZ cast — any
    // monotone quantization applied to BOTH sides preserves exact
    // containment, and this one is monotone on every fixed-offset zone.
    val epoch = lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0))
    def bin(c: Column): Column =
      floor(timestamp_diff("SECOND", epoch, c.cast("timestamp_ntz")) / binSeconds)
    val p = points.withColumn("__p_bin", bin(point))
    val i = intervals.withColumn("__i_bin", explode(sequence(bin(lo), bin(hi))))
    p.join(i, col("__p_bin") === col("__i_bin") && point >= lo && point <= hi)
      .drop("__p_bin", "__i_bin")
  }
}

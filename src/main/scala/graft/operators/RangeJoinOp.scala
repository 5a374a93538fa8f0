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
    // The quantization must be MONOTONE or a point can bin outside
    // [bin(lo), bin(hi)] and the pair is silently dropped. Zoned
    // (instant) timestamps therefore bin on epoch micros — an
    // instant-to-wall-clock cast would be non-monotone across a DST
    // fall-back in DST-observing session zones. NTZ columns have no
    // instant semantics at all, so they bin on zone-free wall-clock
    // arithmetic from an NTZ epoch literal (NTZ cannot cast to BIGINT).
    // All three columns must agree on which family they are in, or the
    // two quantizations would disagree about the same wall-clock value.
    val ntz = isNtz(points, point)
    require(
      isNtz(intervals, lo) == ntz && isNtz(intervals, hi) == ntz,
      "point and interval bounds must all be TIMESTAMP or all TIMESTAMP_NTZ",
    )
    def bin(c: Column): Column = binExpr(ntz, c, binSeconds)
    val p = points.withColumn("__p_bin", bin(point))
    // Inverted intervals (lo > hi) cannot contain any point, but
    // sequence(start, stop) DESCENDS when start > stop — a badly inverted
    // row would fabricate bin(lo)−bin(hi)+1 exploded copies that the
    // residual predicate then discards. Pre-filter them (matching
    // AutoRangeJoinRule's validInterval guard): identical output, bounded
    // fan-out.
    val i = intervals
      .filter(lo <= hi)
      .withColumn("__i_bin", explode(sequence(bin(lo), bin(hi))))
    p.join(i, col("__p_bin") === col("__i_bin") && point >= lo && point <= hi)
      .drop("__p_bin", "__i_bin")
  }

  private[operators] def isNtz(df: DataFrame, c: Column): Boolean =
    df.select(c).schema.head.dataType == org.apache.spark.sql.types.TimestampNTZType

  /** The monotone time-bin quantization shared by every binned
    * range/interval join (see the class doc for why instants bin on
    * epoch micros and NTZ on zone-free wall-clock arithmetic — a
    * DST-crossing wall-clock cast would be non-monotone and silently
    * drop pairs). Exact for |epoch micros| < 2^53 (≈ year 287396):
    * long / long is double division in Spark, and floor of it matches
    * integer floor.
    */
  private[operators] def binExpr(ntz: Boolean, c: Column, binSeconds: Long): Column = {
    val epochNtz = lit(java.time.LocalDateTime.of(1970, 1, 1, 0, 0))
    val micros =
      if (ntz) timestamp_diff("MICROSECOND", epochNtz, c)
      else unix_micros(c.cast("timestamp"))
    floor(micros / (binSeconds * 1000000L))
  }
}

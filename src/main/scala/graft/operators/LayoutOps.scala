package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side half of the 100 TB story. A
  * petabyte table's scan cost is decided before any query runs, by how
  * rows are bucketed into files and what zone maps (per-file min/max)
  * those files carry — this module makes that decision measurable as a
  * first-class query.
  *
  * Everything is row-local after ONE tiny min/max aggregate broadcast:
  * rank-scaling, bit interleaving, and file assignment are pure column
  * arithmetic, so laying out 100 TB is a single map stage + the final
  * per-file stats aggregate (narrow (layout, file_id) keys). No global
  * sort is required to *evaluate* a layout; an actual rewrite would add
  * one repartitionByRange on the computed key.
  */
object LayoutOps {

  /** Morton (Z-order) interleave of two `bits`-bit non-negative ranks:
    * bit i of `ra` lands at position 2i, bit i of `rb` at 2i+1. Exact
    * integer column arithmetic (shift/mask/scale) — codegen'd end to
    * end, bit-reproducible in any engine.
    */
  def interleaveBits(ra: Column, rb: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(ra, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(rb, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }

  /** Compare a Z-order layout against a linear (sort-by-A) layout of the
    * same rows into `nFiles` files, by the zone maps each file would
    * carry and whether a box predicate (ranks of A and B both in
    * [boxLo, boxHi]) could skip it.
    *
    * Both columns are min/max rank-scaled to [0, 2^bits) (one aggregate,
    * broadcast back — the only non-map stage besides the final stats
    * rollup). The Z layout buckets by equal Z-value ranges, the linear
    * layout by equal A-rank ranges; both assignments are row-local. Per
    * (layout, file) the output carries row count, rank-space zone maps,
    * and `scan_needed` — false exactly when the zone map proves the box
    * can't match (the parquet row-group pruning decision, made visible).
    * Z-order's point, measurable here: a 2-D box prunes most Z files but
    * almost no linear files once the B-dimension selects.
    */
  def zoneMapLayouts(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int,
      nFiles: Int,
      boxLo: Long,
      boxHi: Long,
  ): DataFrame = {
    require(nFiles > 0 && (1L << (2 * bits)) % nFiles == 0, "nFiles must divide 4^bits")
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val mm = df.agg(
      min(a).as("amin"), max(a).as("amax"),
      min(b).as("bmin"), max(b).as("bmax"),
    )
    val maxRank = (1L << bits) - 1
    val scaled = df
      .select(a.as("a"), b.as("b"))
      .crossJoin(broadcast(mm))
      .select(
        expr(s"(a - amin) * $maxRank div greatest(amax - amin, 1)").as("ra"),
        expr(s"(b - bmin) * $maxRank div greatest(bmax - bmin, 1)").as("rb"),
      )
    val zFileWidth = (1L << (2 * bits)) / nFiles
    val aFileWidth = (maxRank + 1) / nFiles
    val assigned = scaled
      .select(col("ra"), col("rb"), interleaveBits(col("ra"), col("rb"), bits).as("zval"))
      .select(
        col("ra"),
        col("rb"),
        expr(s"zval div $zFileWidth").as("zfile"),
        expr(s"ra div $aFileWidth").as("afile"),
      )
    val both = assigned
      .select(lit("zorder").as("layout"), col("zfile").as("file_id"), col("ra"), col("rb"))
      .unionAll(
        assigned.select(lit("linear").as("layout"), col("afile").as("file_id"), col("ra"), col("rb")),
      )
    both
      .groupBy(col("layout"), col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("ra")).as("min_ra"), max(col("ra")).as("max_ra"),
        min(col("rb")).as("min_rb"), max(col("rb")).as("max_rb"),
      )
      .select(
        col("layout"), col("file_id"), col("n_rows"),
        col("min_ra"), col("max_ra"), col("min_rb"), col("max_rb"),
        (!(col("max_ra") < boxLo || col("min_ra") > boxHi ||
          col("max_rb") < boxLo || col("min_rb") > boxHi)).as("scan_needed"),
      )
      .orderBy("layout", "file_id")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Append a Hilbert-curve index `out` computed from two `bits`-bit
    * non-negative rank columns: the top-down quadrant walk (at each bit
    * level, add the quadrant's offset `s²·((3·rx) xor ry)` and rotate or
    * reflect the remaining low bits into the sub-square's frame). Unlike
    * Z-order, consecutive Hilbert indexes are always adjacent cells, so
    * equal-width index ranges make files with tighter bounding boxes.
    *
    * One narrow projection per bit level: the rotation references each
    * intermediate coordinate several times, so inlining everything into a
    * single Column would blow the expression tree up ~5× per level —
    * stepwise aliases keep it linear in `bits` and Catalyst's
    * CollapseProject leaves multiply-referenced non-trivial aliases
    * un-inlined. Reflections use `2^bits - 1 - v` (not `2^i - 1 - v`) so
    * coordinates stay non-negative; lower levels only ever read bits
    * below `i`, where the two agree mod 2^i.
    */
  def withHilbertIndex(
      df: DataFrame,
      xName: String,
      yName: String,
      bits: Int,
      out: String,
  ): DataFrame = {
    val n = 1L << bits
    val keep = df.columns.map(col)
    val init = df.select(
      keep :+ col(xName).cast("long").as("_hx") :+ col(yName).cast("long").as("_hy") :+
        lit(0L).as(out): _*)
    val walked = ((bits - 1) to 0 by -1).foldLeft(init) { (acc, i) =>
      val s = 1L << i
      val rx = shiftright(col("_hx"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("_hy"), i).bitwiseAND(lit(1L))
      val d2 = col(out) + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry)
      val flipX = when(rx === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx"))
      val flipY = when(rx === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy"))
      val nx = when(ry === 0, flipY).otherwise(col("_hx"))
      val ny = when(ry === 0, flipX).otherwise(col("_hy"))
      acc.select(keep :+ nx.as("_hx") :+ ny.as("_hy") :+ d2.as(out): _*)
    }
    walked.select(keep :+ col(out): _*)
  }

  /** N-column Morton interleave: bit i of rank j lands at position
    * `ranks.size * i + j`. The 2-column [[interleaveBits]] is the
    * special case; real clustering commands take column LISTS
    * (ZORDER BY a, b, c), and the interleave generalizes for free.
    */
  def interleaveBitsN(ranks: Seq[Column], bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      ranks.zipWithIndex.foldLeft(acc) { case (a, (r, j)) =>
        a + shiftright(r, i).bitwiseAND(lit(1L)) * lit(1L << (ranks.size * i + j))
      }
    }

  /** Three-column Z-order vs linear (sort-by-A), same contest shape as
    * [[zoneMapLayouts]]: rank-scale all three columns to [0, 2^bits),
    * interleave, bucket into `nFiles` equal-index-width files, and per
    * (layout, file) report three-dimensional zone maps plus whether a
    * cube predicate (all three ranks in [boxLo, boxHi]) could skip the
    * file. A cube selecting 1/2 per dimension is 1/8 of the volume: the
    * 3-D curve layout prunes toward 1/8 of files while the sort-by-A
    * layout can never do better than 1/2. Same plan: one broadcast
    * min/max, row-local interleave, one (layout, file) rollup.
    */
  def zorder3Layouts(
      df: DataFrame,
      colA: String,
      colB: String,
      colC: String,
      bits: Int,
      nFiles: Int,
      boxLo: Long,
      boxHi: Long,
  ): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    require(3 * bits <= 62, "3*bits must fit a long")
    val cells = 1L << (3 * bits)
    val fileWidth = (cells + nFiles - 1) / nFiles
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val c = col(colC).cast("long")
    val mm = df.agg(
      min(a).as("amin"), max(a).as("amax"),
      min(b).as("bmin"), max(b).as("bmax"),
      min(c).as("cmin"), max(c).as("cmax"),
    )
    val maxRank = (1L << bits) - 1
    val scaled = df
      .select(a.as("a"), b.as("b"), c.as("c"))
      .crossJoin(broadcast(mm))
      .select(
        expr(s"(a - amin) * $maxRank div greatest(amax - amin, 1)").as("ra"),
        expr(s"(b - bmin) * $maxRank div greatest(bmax - bmin, 1)").as("rb"),
        expr(s"(c - cmin) * $maxRank div greatest(cmax - cmin, 1)").as("rc"),
      )
    val aFileWidth = (maxRank + 1 + nFiles - 1) / nFiles
    val assigned = scaled.select(
      col("ra"), col("rb"), col("rc"),
      interleaveBitsN(Seq(col("ra"), col("rb"), col("rc")), bits).as("zval"),
    )
    val both = assigned
      .select(lit("zorder3").as("layout"), expr(s"zval div $fileWidth").as("file_id"),
        col("ra"), col("rb"), col("rc"))
      .unionAll(
        assigned.select(lit("linear").as("layout"), expr(s"ra div $aFileWidth").as("file_id"),
          col("ra"), col("rb"), col("rc")))
    both
      .groupBy(col("layout"), col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("ra")).as("min_ra"), max(col("ra")).as("max_ra"),
        min(col("rb")).as("min_rb"), max(col("rb")).as("max_rb"),
        min(col("rc")).as("min_rc"), max(col("rc")).as("max_rc"),
      )
      .select(
        col("layout"), col("file_id"), col("n_rows"),
        col("min_ra"), col("max_ra"), col("min_rb"), col("max_rb"),
        col("min_rc"), col("max_rc"),
        (!(col("max_ra") < boxLo || col("min_ra") > boxHi ||
          col("max_rb") < boxLo || col("min_rb") > boxHi ||
          col("max_rc") < boxLo || col("min_rc") > boxHi)).as("scan_needed"),
      )
      .orderBy("layout", "file_id")
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
    val scaled = rankScaled(df, colA, colB, bits)
    val maxRank = (1L << bits) - 1
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

  /** Plan a small-file compaction — the OPTIMIZE bin-packing decision a
    * months-running ingest needs once streaming sinks have littered the
    * table with micro-batch-sized files. Files smaller than `target`
    * bytes are packed, in file-key order, into output groups at
    * cumulative-offset boundaries of `target` (a file straddling a
    * boundary joins the group its starting offset falls in — the same
    * rule Spark's own file-scan packing uses for maxPartitionBytes
    * splits, and deterministic, unlike first-fit-decreasing). Files
    * already at/over `target` keep their own group untouched.
    *
    * Output: one row per planned output file — `bin_kind`
    * ('packed'|'single'), `first_file`/`last_file` key range, `n_files`,
    * `bytes_total`. The plan runs entirely over file METADATA (key,
    * bytes): a 100 TB table is ~10^6 file entries, so the one ordered
    * running sum is a metadata-scale window, never a corpus shuffle.
    */
  def compactionPlan(
      files: DataFrame,
      fileCol: String,
      bytesCol: String,
      target: Long,
  ): DataFrame = {
    require(target > 0, "target must be positive")
    val bytes = col(bytesCol).cast("long")
    val w = Window.orderBy(col(fileCol)).rowsBetween(Window.unboundedPreceding, -1)
    val packed = files
      .filter(bytes < target)
      .select(col(fileCol).as("file_key"), bytes.as("bytes"))
      .withColumn("_offset", coalesce(sum(col("bytes")).over(w), lit(0L)))
      .select(col("file_key"), col("bytes"), expr(s"_offset div $target").as("_bin"))
      .groupBy(col("_bin"))
      .agg(
        min(col("file_key")).as("first_file"),
        max(col("file_key")).as("last_file"),
        count(lit(1)).as("n_files"),
        sum(col("bytes")).as("bytes_total"),
      )
      .select(lit("packed").as("bin_kind"), col("first_file"), col("last_file"),
        col("n_files"), col("bytes_total"))
    val single = files
      .filter(bytes >= target)
      .select(lit("single").as("bin_kind"), col(fileCol).as("first_file"),
        col(fileCol).as("last_file"), lit(1L).as("n_files"), bytes.as("bytes_total"))
    packed.unionAll(single).orderBy("bin_kind", "first_file")
  }

  /** The actual clustered-WRITE path: original columns + the Hilbert
    * curve key `hval` over the two rank-scaled dimensions. A layout
    * rewrite is then
    * `withCurveKey(df, a, b, bits).repartitionByRange(nFiles, col("hval"))
    * .sortWithinPartitions("hval").drop("hval").write...` — one range
    * shuffle (the unavoidable cost of any re-clustering), after which
    * parquet row-group stats on BOTH dimensions become selective.
    * LayoutSpec proves the payoff against real files: a 2-D box scans
    * strictly fewer row-group rows than a single-column sort layout.
    */
  def withCurveKey(df: DataFrame, colA: String, colB: String, bits: Int): DataFrame = {
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val mm = df.agg(
      min(a).as("amin"), max(a).as("amax"),
      min(b).as("bmin"), max(b).as("bmax"),
    )
    val maxRank = (1L << bits) - 1
    val keep = df.columns.map(col)
    val ranked = df
      .crossJoin(broadcast(mm))
      .select(
        keep
          :+ expr(s"(CAST($colA AS BIGINT) - amin) * $maxRank div greatest(amax - amin, 1)").as("_ra")
          :+ expr(s"(CAST($colB AS BIGINT) - bmin) * $maxRank div greatest(bmax - bmin, 1)").as("_rb"): _*)
    withHilbertIndex(ranked, "_ra", "_rb", bits, "hval").drop("_ra", "_rb")
  }

  /** Clustering-depth metric over the zone maps [[curveLayouts]] /
    * [[zoneMapLayouts]] emit: per file, how many OTHER files' rank
    * bounding boxes intersect its own — the number of files a lookup
    * landing in the overlap region must scan, and the signal a
    * lakehouse OPTIMIZE uses to decide when re-clustering pays.
    * Metadata-scale self-join (file count squared, never the corpus).
    * Per layout: file count, total overlap endpoints, worst file.
    *
    * The zone-map frame is localCheckpoint'd first: it is file-count
    * sized, and the self-join would otherwise duplicate the whole
    * upstream curve pipeline into both join branches.
    */
  def overlapDepth(zoneMaps: DataFrame): DataFrame = {
    val a = zoneMaps.select(col("layout"), col("file_id"),
      col("min_ra"), col("max_ra"), col("min_rb"), col("max_rb"))
      .localCheckpoint()
    val b = a.select(col("layout").as("b_layout"), col("file_id").as("b_file"),
      col("min_ra").as("b_min_ra"), col("max_ra").as("b_max_ra"),
      col("min_rb").as("b_min_rb"), col("max_rb").as("b_max_rb"))
    a.join(
        b,
        col("layout") === col("b_layout") && col("file_id") =!= col("b_file") &&
          !(col("max_ra") < col("b_min_ra") || col("min_ra") > col("b_max_ra") ||
            col("max_rb") < col("b_min_rb") || col("min_rb") > col("b_max_rb")),
        "left")
      .groupBy(col("layout"), col("file_id"))
      .agg(count(col("b_file")).as("n_overlaps"))
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("n_overlaps")).as("total_overlaps"),
        max(col("n_overlaps")).as("max_overlap"),
      )
      .orderBy("layout")
  }

  /** Targeted-delete (right-to-be-forgotten) rewrite planning: given
    * the keys to erase, how many files must be rewritten, and how many
    * rows ride along? Copy-on-write storage rewrites every file whose
    * zone map ADMITS a delete key — so the cost is decided by layout.
    * Two layouts of the same rows are audited side by side: `clustered`
    * (value-range files on the delete key itself) and `ingest`
    * (value-range files on arrival order). Per layout: file count,
    * zone-map candidate files, files actually holding deletes, rows to
    * rewrite (all rows of candidate files), rows actually deleted —
    * the amplification a mis-clustered 100 TB table pays on every
    * erasure request.
    *
    * Plan shape: two row-local file assignments off one broadcast
    * min/max, a (layout, file) zone-map rollup, then metadata-scale
    * joins against the (small, broadcast) delete-key set.
    */
  def deletePlan(
      df: DataFrame,
      keyCol: String,
      ingestCol: String,
      deleteKeys: DataFrame,
      deleteKeyCol: String,
      nFiles: Int,
  ): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    val k = col(keyCol).cast("long")
    val i = col(ingestCol).cast("long")
    val mm = df.agg(
      min(k).as("kmin"), max(k).as("kmax"),
      min(i).as("imin"), max(i).as("imax"),
    )
    val dk = broadcast(
      deleteKeys.select(col(deleteKeyCol).cast("long").as("dk")).distinct())
    val assigned = df
      .select(k.as("k"), i.as("i"))
      .crossJoin(broadcast(mm))
      .select(
        col("k"),
        expr(s"(k - kmin) * $nFiles div (kmax - kmin + 1)").as("clustered"),
        expr(s"(i - imin) * $nFiles div (imax - imin + 1)").as("ingest"),
      )
      .join(dk.withColumn("_d", lit(1)), col("k") === col("dk"), "left")
      .withColumn("is_del", col("_d").isNotNull)
    val perFile = assigned
      .select(lit("clustered").as("layout"), col("clustered").as("file_id"), col("k"), col("is_del"))
      .unionAll(
        assigned.select(lit("ingest").as("layout"), col("ingest").as("file_id"), col("k"), col("is_del")))
      .groupBy(col("layout"), col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        count(when(col("is_del"), lit(1))).as("n_deleted"),
      )
      // metadata-scale; checkpointed so the semi/anti split below does
      // not duplicate the corpus aggregation into both branches.
      .localCheckpoint()
    val flagged = perFile
      .join(dk, col("dk").between(col("min_k"), col("max_k")), "left_semi")
      .withColumn("candidate", lit(true))
      .unionByName(
        perFile
          .join(dk, col("dk").between(col("min_k"), col("max_k")), "left_anti")
          .withColumn("candidate", lit(false)))
    flagged
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("n_files"),
        count(when(col("candidate"), lit(1))).as("candidate_files"),
        count(when(col("n_deleted") > 0, lit(1))).as("actual_files"),
        sum(when(col("candidate"), col("n_rows")).otherwise(lit(0L))).as("rows_to_rewrite"),
        sum(col("n_deleted")).as("rows_deleted"),
      )
      .orderBy("layout")
  }

  /** Min/max rank-scale two columns to [0, 2^bits): one tiny aggregate
    * broadcast back, then row-local integer arithmetic.
    */
  private def rankScaled(df: DataFrame, colA: String, colB: String, bits: Int): DataFrame = {
    val a = col(colA).cast("long")
    val b = col(colB).cast("long")
    val mm = df.agg(
      min(a).as("amin"), max(a).as("amax"),
      min(b).as("bmin"), max(b).as("bmax"),
    )
    val maxRank = (1L << bits) - 1
    df.select(a.as("a"), b.as("b"))
      .crossJoin(broadcast(mm))
      .select(
        expr(s"(a - amin) * $maxRank div greatest(amax - amin, 1)").as("ra"),
        expr(s"(b - bmin) * $maxRank div greatest(bmax - bmin, 1)").as("rb"),
      )
  }

  /** Hilbert vs Z-order, same contest as [[zoneMapLayouts]]: bucket the
    * rank-scaled rows into `nFiles` equal-index-width files under each
    * curve and report per-file zone maps plus the box-pruning verdict.
    * Both curves visit the same 4^bits cells; the difference is purely
    * how contiguous index ranges map to 2-D regions — Hilbert's
    * unit-step adjacency gives files tighter bounding boxes, which is
    * the whole case for Hilbert clustering in lakehouse OPTIMIZE
    * implementations. Same plan shape: one min/max broadcast, row-local
    * curve arithmetic (`bits` narrow projections for Hilbert), one
    * (layout, file) rollup.
    *
    * `nFiles` deliberately need NOT divide 4^bits: power-of-2 file
    * widths align with the quadrant recursion and make the two curves
    * produce the *identical* square decomposition (both reduce to
    * 4^k-cell blocks). Real balanced-file writes put boundaries at
    * arbitrary curve offsets — and at a non-aligned width (ceil
    * division below) Z-order ranges straddle quadrant jumps while
    * Hilbert ranges stay contiguous in the plane: ~1.8× total
    * zone-map area on a uniform grid at 48 files.
    */
  def curveLayouts(
      df: DataFrame,
      colA: String,
      colB: String,
      bits: Int,
      nFiles: Int,
      boxLo: Long,
      boxHi: Long,
  ): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    val cells = 1L << (2 * bits)
    val fileWidth = (cells + nFiles - 1) / nFiles
    val scaled = rankScaled(df, colA, colB, bits)
    val curved = withHilbertIndex(scaled, "ra", "rb", bits, "hval")
      .select(
        col("ra"), col("rb"),
        col("hval"),
        interleaveBits(col("ra"), col("rb"), bits).as("zval"),
      )
    val both = curved
      .select(lit("hilbert").as("layout"), expr(s"hval div $fileWidth").as("file_id"), col("ra"), col("rb"))
      .unionAll(
        curved.select(lit("zorder").as("layout"), expr(s"zval div $fileWidth").as("file_id"), col("ra"), col("rb")),
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

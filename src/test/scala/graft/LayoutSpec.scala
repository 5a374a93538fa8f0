package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps
import Tables.lineitem

/** Layout-evaluation semantics: the Morton interleave against a bit-twiddling
  * reference, and the zone-map/pruning invariants on real testdata.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference Morton encode. */
  private def mortonRef(ra: Long, rb: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((ra >> i) & 1L) << (2 * i)) | (((rb >> i) & 1L) << (2 * i + 1))
    }

  test("interleaveBits matches the reference Morton encode over the full 8-bit plane sample") {
    val pairs = for (a <- 0L until 256L by 17L; b <- 0L until 256L by 13L) yield (a, b)
    val got = pairs.toDF("ra", "rb")
      .select(col("ra"), col("rb"), LayoutOps.interleaveBits(col("ra"), col("rb"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == mortonRef(a, b, 8), s"($a, $b)") }
  }

  /** Scala reference Hilbert encode (top-down quadrant walk). */
  private def hilbertRef(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0; var y = y0; var d = 0L
    val n = 1L << bits
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertRef is a bijection onto [0, 4^bits) whose consecutive cells are grid-adjacent") {
    val bits = 4
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val byD = cells.map { case (x, y) => (hilbertRef(x, y, bits), x, y) }.sortBy(_._1)
    // Bijection: the 256 indexes are exactly 0..255.
    assert(byD.map(_._1) == (0L until (n.toLong * n)).toVector.map(identity))
    // The Hilbert property Z-order lacks: each step moves one cell.
    byD.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L, s"jump at ($x1,$y1)->($x2,$y2)")
    }
  }

  test("withHilbertIndex matches the reference over the full 8-bit plane sample") {
    val pairs = for (a <- 0L until 256L by 17L; b <- 0L until 256L by 13L) yield (a, b)
    val got = LayoutOps.withHilbertIndex(pairs.toDF("ra", "rb"), "ra", "rb", 8, "h")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, h) => assert(h == hilbertRef(a, b, 8), s"($a, $b)") }
  }

  test("zoneMapLayouts: files partition the rows, zone maps bound their ranks, z-order prunes the box harder") {
    val out = LayoutOps.zoneMapLayouts(
      lineitem(spark, Sf), "l_partkey", "l_suppkey", bits = 8, nFiles = 32, boxLo = 64L, boxHi = 127L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    val byLayout = out.groupBy(_._1)
    val total = lineitem(spark, Sf).count()
    byLayout.foreach { case (layout, files) =>
      assert(files.map(_._3).sum == total, s"$layout files must partition the table")
      files.foreach { case (_, _, _, minRa, maxRa, minRb, maxRb, scan) =>
        assert(minRa >= 0 && maxRa <= 255 && minRb >= 0 && maxRb <= 255)
        assert(minRa <= maxRa && minRb <= maxRb)
        // scan_needed is exactly the zone-map intersection test.
        assert(scan == !(maxRa < 64 || minRa > 127 || maxRb < 64 || minRb > 127))
      }
    }
    // The point of the operator: on a 2-D box, the z-order layout scans
    // no more files than linear, and strictly fewer on this data.
    val scanned = byLayout.view.mapValues(_.count(_._8)).toMap
    assert(scanned("zorder") < scanned("linear"),
      s"zorder must prune harder on a 2-D box: $scanned")
  }

  test("curveLayouts: hilbert files have strictly tighter zone maps than z-order at a non-aligned width") {
    val out = LayoutOps.curveLayouts(
      lineitem(spark, Sf), "l_partkey", "l_suppkey", bits = 8, nFiles = 48, boxLo = 40L, boxHi = 110L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    val byLayout = out.groupBy(_._1)
    val total = lineitem(spark, Sf).count()
    byLayout.foreach { case (layout, files) =>
      assert(files.map(_._3).sum == total, s"$layout files must partition the table")
      files.foreach { case (_, _, _, minRa, maxRa, minRb, maxRb, scan) =>
        assert(minRa >= 0 && maxRa <= 255 && minRb >= 0 && maxRb <= 255)
        assert(scan == !(maxRa < 40 || minRa > 110 || maxRb < 40 || minRb > 110))
      }
    }
    // Total zone-map area = expected files touched by a uniform point
    // query, the robust curve-quality metric: Hilbert's unit-step
    // adjacency must beat Z-order's quadrant jumps at a width that does
    // not align with the quadrant recursion.
    val area = byLayout.view.mapValues(
      _.map { case (_, _, _, minRa, maxRa, minRb, maxRb, _) =>
        (maxRa - minRa + 1) * (maxRb - minRb + 1)
      }.sum).toMap
    assert(area("hilbert") < area("zorder"),
      s"hilbert must have tighter zone maps: $area")
    // And on the concrete 2-D box it scans no more files.
    val scanned = byLayout.view.mapValues(_.count(_._8)).toMap
    assert(scanned("hilbert") <= scanned("zorder"),
      s"hilbert must prune at least as hard: $scanned")
  }

  test("zorder3Layouts: 3-D cube pruning beats the single-column sort") {
    val out = LayoutOps.zorder3Layouts(
      lineitem(spark, Sf).withColumn("ship_day", datediff(col("l_shipdate"), lit("1990-01-01"))),
      "l_partkey", "l_suppkey", "ship_day",
      bits = 6, nFiles = 64, boxLo = 16L, boxHi = 47L)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    val byLayout = out.groupBy(_._1)
    val total = lineitem(spark, Sf).count()
    byLayout.foreach { case (layout, files) =>
      assert(files.map(_._3).sum == total, s"$layout files must partition the table")
    }
    // Scanned fraction: the cube selects 1/2 per dimension = 1/8 of the
    // volume; sort-by-partkey can never beat its 1/2 projection.
    val scanned = byLayout.view.mapValues(fs => (fs.count(_._10), fs.size)).toMap
    val (z3s, z3n) = scanned("zorder3")
    val (lins, linn) = scanned("linear")
    assert(z3s.toDouble / z3n < lins.toDouble / linn,
      s"zorder3 must prune a 3-D cube harder: $scanned")
  }

  test("overlapDepth: hilbert files overlap each other strictly less than z-order files") {
    val zm = LayoutOps.curveLayouts(
      lineitem(spark, Sf), "l_partkey", "l_suppkey", bits = 8, nFiles = 48, boxLo = 40L, boxHi = 110L)
    val depth = LayoutOps.overlapDepth(zm)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(depth.keySet == Set("hilbert", "zorder"))
    assert(depth("hilbert")._2 == 48L && depth("zorder")._2 == 48L)
    assert(depth("hilbert")._3 < depth("zorder")._3,
      s"hilbert must have lower total clustering depth: $depth")
  }

  test("a hilbert-clustered write is row-group-pruned harder than a single-column sort on a 2-D box") {
    // Real files, real parquet stats: write lineitem (sf0.01, 60k rows)
    // 48 ways under each layout, then measure rows actually emitted by
    // the scan (= rows in row groups the pushed filters could not
    // prune). The box selects ~50% of l_partkey but ~11% of l_suppkey:
    // the partkey-sorted layout can only prune the first dimension;
    // the curve layout prunes both.
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
    val dir = java.nio.file.Files.createTempDirectory("layout_write").toFile.getAbsolutePath
    val (hdir, ldir) = (s"$dir/hilbert", s"$dir/linear")
    LayoutOps.withCurveKey(li, "l_partkey", "l_suppkey", 8)
      .repartitionByRange(48, col("hval")).sortWithinPartitions("hval")
      .drop("hval").write.parquet(hdir)
    li.repartitionByRange(48, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.parquet(ldir)

    def scanStats(path: String): (Long, Long) = {
      val old = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = spark.read.parquet(path)
          .filter(col("l_partkey").between(400, 1400) && col("l_suppkey").between(40, 50))
        // collect() (not count()) so the metrics land on THIS plan —
        // count() executes a separate aggregated queryExecution.
        val matched = df.collect().length.toLong
        val scan = df.queryExecution.executedPlan.collectLeaves()
          .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
          .getOrElse(fail("no FileSourceScanExec in plan"))
        (matched, scan.metrics("numOutputRows").value)
      } finally spark.conf.set("spark.sql.adaptive.enabled", old)
    }

    val (hMatched, hScanned) = scanStats(hdir)
    val (lMatched, lScanned) = scanStats(ldir)
    assert(hMatched == lMatched, "a layout rewrite must not change query results")
    assert(hMatched > 0)
    assert(hScanned < lScanned,
      s"hilbert clustering must let parquet stats prune both dimensions: $hScanned vs $lScanned")
  }

  test("degenerate inputs: constant columns collapse to rank 0 without dividing by zero") {
    val const = Seq.fill(100)((7L, 7L)).toDF("ka", "kb")
    val zm = LayoutOps.zoneMapLayouts(const, "ka", "kb", 8, 32, 64L, 127L)
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)].collect()
    // All ranks 0 → every layout lands in file 0 with a [0,0]x[0,0] box.
    zm.foreach { case (_, fid, n, minRa, maxRa, minRb, maxRb, scan) =>
      assert(fid == 0L && n == 100L)
      assert(minRa == 0L && maxRa == 0L && minRb == 0L && maxRb == 0L)
      assert(!scan, "a [0,0] zone map cannot intersect the [64,127] box")
    }
    assert(zm.length == 2)
    val h = LayoutOps.withHilbertIndex(const, "ka", "kb", 8, "h")
      .select("h").distinct().as[Long].collect()
    assert(h.toSeq == Seq(hilbertRef(7L, 7L, 8)), "constant input is a single curve cell")
  }

  test("compactionPlan: packs small files at offset boundaries, passes large files through") {
    // 10 small files of 30 each (target 100: offsets 0..270 → bins
    // 0,0,0,0 | 1,1,1 | 2,2,2 — the 4th file straddles 90..120 and joins
    // bin 0), plus two large files that must stay single.
    val files = ((1 to 10).map(i => (f"f$i%02d", 30L)) ++ Seq(("g1", 100L), ("g2", 250L)))
      .toDF("file_key", "bytes")
    val plan = LayoutOps.compactionPlan(files, "file_key", "bytes", target = 100L)
      .as[(String, String, String, Long, Long)].collect()
    val (packed, single) = plan.partition(_._1 == "packed")
    assert(single.map(_._2).sorted.toSeq == Seq("g1", "g2"))
    assert(single.forall(b => b._4 == 1L && b._2 == b._3))
    assert(packed.map(_._4).toSeq == Seq(4L, 3L, 3L), s"straddler joins its starting bin: ${packed.toSeq}")
    assert(plan.map(_._5).sum == 10 * 30L + 100L + 250L, "bytes preserved")
    // Packed bins cover disjoint, ordered key ranges.
    packed.sortBy(_._2).sliding(2).foreach { case Array(a, b) => assert(a._3 < b._2) }
  }
}

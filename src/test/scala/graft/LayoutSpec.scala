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
}

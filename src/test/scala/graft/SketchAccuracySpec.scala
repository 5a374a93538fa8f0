package graft

import org.apache.spark.sql.functions._
import Tables.lineitem

/** Accuracy bounds for the sketch-based scale paths (their driver check
  * is rows-only; exactness lives here).
  */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct(1%) is within 5% of the exact distinct count") {
    val rows = lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx"),
      )
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05)
    }
  }

  test("percentile_approx(accuracy 1000) is within 1% rank error of exact") {
    val approx = lineitem(spark, Sf)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("am"))
      .as[(String, Double)].collect().toMap
    val values = lineitem(spark, Sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    approx.foreach { case (flag, am) =>
      val v = values(flag)
      val rank = v.count(_ <= am).toDouble / v.length
      assert(math.abs(rank - 0.5) < 0.01, s"$flag: approx median at rank $rank")
    }
  }

  test("cms_estimate probes the built-in count_min_sketch within its bound") {
    val df = Seq.tabulate(3000)(i => s"k${i % 7}").toDF("k")
    val sketch = df.agg(
      count_min_sketch(col("k"), lit(0.001d), lit(0.999d), lit(42)).as("cms"),
      count(lit(1)).as("n"),
    )
    val rows = df
      .groupBy("k")
      .agg(count(lit(1)).as("exact"))
      .crossJoin(sketch)
      .select(
        col("k"),
        col("exact"),
        graft.expressions.CmsColumns.estimate(col("cms"), col("k")).as("est"),
        col("n"),
      )
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 7)
    rows.foreach { case (k, exact, est, n) =>
      // CMS never under-counts; over-count ≤ eps·N at the confidence.
      assert(est >= exact, s"$k: CMS under-counted ($est < $exact)")
      assert(est <= exact + math.ceil(0.001 * n).toLong, s"$k: $est vs $exact")
    }
    // A never-added key estimates only collision mass (bounded the same).
    val ghost = sketch
      .select(graft.expressions.CmsColumns.estimate(col("cms"), lit("ghost")), col("n"))
      .as[(Long, Long)].collect().head
    assert(ghost._1 <= math.ceil(0.001 * ghost._2).toLong)
  }
}

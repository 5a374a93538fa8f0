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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key. Spark has no built-in
  * operator for this; the naive theta-join (key equality + time
  * inequality, then argmax) explodes quadratically per key. This is the
  * scalable formulation: tag and union both inputs, sort within each key
  * partition by (time, side, tiebreak), and carry the last non-null
  * right payload forward with a running `last(..., ignoreNulls)` window
  * — one shuffle on the key, linear work, no pair space.
  *
  * Ordering at equal timestamps puts right rows first (<= semantics) and
  * orders right rows by `rightTiebreak` so the carried match is
  * deterministic when several right rows share a timestamp.
  */
object AsOfJoinOp {

  /** @param left       left rows (all preserved — LEFT as-of semantics)
    * @param right      right rows
    * @param leftKey    join key on the left
    * @param rightKey   join key on the right
    * @param leftTime   event time on the left
    * @param rightTime  event time on the right
    * @param rightPayload columns of `right` to carry (must not collide
    *                     with left column names)
    * @param rightTiebreak deterministic order among equal-time right rows
    *                      (the greatest wins)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[String],
      rightTiebreak: Column,
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val lp = left.select(
      (leftCols.map(col) :+
        leftKey.as("__k") :+ leftTime.as("__t") :+
        lit(1).as("__side") :+ lit(null).cast("long").as("__tb")) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*,
    )
    val rp = right.select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rightKey.as("__k") :+ rightTime.as("__t") :+
        lit(0).as("__side") :+ rightTiebreak.cast("long").as("__tb")) ++
        rightPayload.map(col): _*,
    )

    // Right rows sort before left rows at the same instant (__side 0 < 1)
    // so `<=` matches them; among same-time right rows the greatest
    // tiebreak is the one last() sees.
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightPayload.foldLeft(lp.unionByName(rp)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).select((leftCols ++ rightPayload).map(col): _*)
  }
}

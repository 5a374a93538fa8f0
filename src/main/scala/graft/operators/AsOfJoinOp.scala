package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the most recent right row with
  * `rightTime <= leftTime` on the same key. Spark has no built-in
  * operator for this; the naive theta-join (key equality + time
  * inequality, then argmax) explodes quadratically per key. This is the
  * scalable formulation: tag and union both inputs, sort within each key
  * partition by (time, side, tiebreak), and carry the latest right row
  * forward with a running `last(..., ignoreNulls)` window — one shuffle
  * on the key, linear work, no pair space.
  *
  * Correctness details:
  *   - The whole right payload travels as ONE struct under a single
  *     `last()` — the match is always one actual right row, never a
  *     per-column mix of different rows (a null field in the latest
  *     right row stays null, exactly like a SQL join).
  *   - Right rows with a NULL key or NULL time are dropped up front:
  *     NULL = NULL never matches in join semantics. Left rows always
  *     survive (LEFT as-of), with null payload when nothing matched.
  *   - Ordering at equal timestamps puts right rows first (<=
  *     semantics); among equal-time right rows the greatest
  *     `rightTiebreak` (compared in ITS OWN type — no lossy casts) wins
  *     deterministically.
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
    * @param direction "backward" (default): most recent right row with
    *                  `rightTime <= leftTime`; "forward": earliest right
    *                  row with `rightTime >= leftTime`. Forward is the
    *                  same single-shuffle running-last scan over the
    *                  reversed time order — no extra pass, no pair space.
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
      direction: String = "backward",
  ): DataFrame = {
    require(
      direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction",
    )
    val leftCols = left.columns.toSeq

    // Type the tiebreak from the right frame's schema so the left-side
    // null slot matches without a lossy cast.
    val rightTyped = right.select(
      rightKey.as("__k"),
      rightTime.as("__t"),
      rightTiebreak.as("__tb"),
      struct(rightPayload.map(col): _*).as("__payload"),
    )
    val tbType = rightTyped.schema("__tb").dataType
    val payloadType = rightTyped.schema("__payload").dataType

    val lp = left.select(
      (leftCols.map(col) :+
        leftKey.as("__k") :+ leftTime.as("__t") :+
        lit(1).as("__side") :+ lit(null).cast(tbType).as("__tb") :+
        lit(null).cast(payloadType).as("__payload")): _*,
    )
    // NULL keys/times can never match (SQL semantics) — drop such right
    // rows before the shuffle instead of letting them group with null
    // left keys.
    val rp = rightTyped
      .filter(col("__k").isNotNull && col("__t").isNotNull)
      .select(
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          col("__k") :+ col("__t") :+
          lit(0).as("__side") :+ col("__tb") :+ col("__payload")): _*,
      )

    // Right rows sort before left rows at the same instant (__side 0 < 1)
    // so the boundary instant matches in BOTH directions; among
    // same-time right rows the greatest tiebreak is the one last()
    // sees. Backward scans time ascending (latest <= t wins); forward
    // scans descending (earliest >= t wins) — same machinery.
    val timeOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(timeOrder, col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lp.unionByName(rp)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++ rightPayload.map(c => col(s"__carried.$c").as(c))): _*)
  }

  /** Nearest as-of: the right row closest in time to each left row in
    * EITHER direction (ties → the backward match). Composed from the two
    * directional passes re-joined on a unique left id — two key shuffles
    * plus one id equi-join, still linear, still no pair space. Timestamp
    * time columns only (distances compare as microsecond longs).
    *
    * @param leftIdCol name of a unique-per-row left column (re-join key)
    * @param rightTimeCol name of the carried payload column holding the
    *                     right time (must be in `rightPayload`)
    */
  def asOfJoinNearest(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[String],
      rightTiebreak: Column,
      leftIdCol: String,
      rightTimeCol: String,
  ): DataFrame = {
    require(rightPayload.contains(rightTimeCol), s"$rightTimeCol must be carried in the payload")
    val leftCols = left.columns.toSeq
    def pass(direction: String, tag: String) =
      asOfJoin(left, right, leftKey, rightKey, leftTime, rightTime,
        rightPayload, rightTiebreak, direction)
        .select(
          (col(leftIdCol) +: rightPayload.map(c => col(c).as(s"__${tag}_$c"))): _*,
        )
    val b = pass("backward", "b")
    val f = pass("forward", "f")
    val bTime = col(s"__b_$rightTimeCol")
    val fTime = col(s"__f_$rightTimeCol")
    // Backward wins when the forward match is absent or strictly
    // farther; distances are non-negative by construction.
    val backWins = fTime.isNull ||
      (bTime.isNotNull &&
        timestamp_diff("MICROSECOND", bTime, leftTime) <=
        timestamp_diff("MICROSECOND", leftTime, fTime))
    left
      .join(b, Seq(leftIdCol))
      .join(f, Seq(leftIdCol))
      .select(
        (leftCols.map(col) ++ rightPayload.map(c =>
          when(backWins, col(s"__b_$c")).otherwise(col(s"__f_$c")).as(c),
        )): _*,
      )
  }
}

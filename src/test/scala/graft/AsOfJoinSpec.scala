package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoinOp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at or before each left time, per key") {
    val quotes = Seq(
      // (key, time, quote_id)
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (1L, ts("2024-01-01 11:00:00"), 102L), // same instant: max tiebreak wins
      (2L, ts("2024-01-01 09:00:00"), 200L),
    ).toDF("key", "qt", "quote_id")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // → 100
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal instant → 102 (<=, max tiebreak)
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote → null
      (2L, ts("2024-01-01 12:00:00"), "t4"), // → 200
      (3L, ts("2024-01-01 12:00:00"), "t5"), // key with no quotes → null
    ).toDF("key", "tt", "trade")

    val out = AsOfJoinOp
      .asOfJoin(
        trades, quotes,
        leftKey = col("key"), rightKey = col("key"),
        leftTime = col("tt"), rightTime = col("qt"),
        rightPayload = Seq("quote_id"),
        rightTiebreak = col("quote_id"),
      )
      .select("trade", "quote_id")
      .as[(String, Option[Long])]
      .collect()
      .toMap

    assert(out == Map(
      "t1" -> Some(100L),
      "t2" -> Some(102L),
      "t3" -> None,
      "t4" -> Some(200L),
      "t5" -> None,
    ))
  }

  test("forward as-of picks the earliest right row at or after each left time, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (1L, ts("2024-01-01 11:00:00"), 102L), // same instant: max tiebreak wins
      (2L, ts("2024-01-01 09:00:00"), 200L),
    ).toDF("key", "qt", "quote_id")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // → 101? no: earliest >= is 11:00 → max tb 102
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal instant matches (>=) → 102
      (1L, ts("2024-01-01 12:00:00"), "t3"), // after all quotes → null
      (2L, ts("2024-01-01 08:00:00"), "t4"), // → 200
      (3L, ts("2024-01-01 12:00:00"), "t5"), // key with no quotes → null
    ).toDF("key", "tt", "trade")

    val out = AsOfJoinOp
      .asOfJoin(
        trades, quotes,
        leftKey = col("key"), rightKey = col("key"),
        leftTime = col("tt"), rightTime = col("qt"),
        rightPayload = Seq("quote_id"),
        rightTiebreak = col("quote_id"),
        direction = "forward",
      )
      .select("trade", "quote_id")
      .as[(String, Option[Long])]
      .collect()
      .toMap

    assert(out == Map(
      "t1" -> Some(102L),
      "t2" -> Some(102L),
      "t3" -> None,
      "t4" -> Some(200L),
      "t5" -> None,
    ))
  }

  test("nearest as-of picks the closer side, backward on ties") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 101L),
      (2L, ts("2024-01-01 09:00:00"), 200L),
    ).toDF("key", "qt", "quote_id")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 10:30:00"), "closer_back"), // 30m back vs 90m fwd
      (11L, 1L, ts("2024-01-01 11:30:00"), "closer_fwd"), // 90m back vs 30m fwd
      (12L, 1L, ts("2024-01-01 11:00:00"), "tie_back"), // 60m both → backward
      (13L, 1L, ts("2024-01-01 08:00:00"), "only_fwd"), // nothing before
      (14L, 2L, ts("2024-01-01 12:00:00"), "only_back"), // nothing after
      (15L, 3L, ts("2024-01-01 12:00:00"), "no_match"),
    ).toDF("tid", "key", "tt", "label")
    val out = AsOfJoinOp
      .asOfJoinNearest(
        trades, quotes,
        leftKey = col("key"), rightKey = col("key"),
        leftTime = col("tt"), rightTime = col("qt"),
        rightPayload = Seq("quote_id", "qt"),
        rightTiebreak = col("quote_id"),
        leftIdCol = "tid",
        rightTimeCol = "qt",
      )
      .select("label", "quote_id")
      .as[(String, Option[Long])]
      .collect()
      .toMap
    assert(out == Map(
      "closer_back" -> Some(100L),
      "closer_fwd" -> Some(101L),
      "tie_back" -> Some(100L),
      "only_fwd" -> Some(100L),
      "only_back" -> Some(200L),
      "no_match" -> None,
    ))
  }

  test("the match is one actual right row — a null field stays null, never backfilled") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5L), Option.empty[Long]), // (bid=5, ask=null)
      (1L, ts("2024-01-01 11:00:00"), Option.empty[Long], Some(7L)), // (bid=null, ask=7)
    ).toDF("key", "qt", "bid", "ask")
    val trades = Seq((1L, ts("2024-01-01 11:30:00"), "t1")).toDF("key", "tt", "trade")
    val out = AsOfJoinOp
      .asOfJoin(
        trades, quotes,
        leftKey = col("key"), rightKey = col("key"),
        leftTime = col("tt"), rightTime = col("qt"),
        rightPayload = Seq("bid", "ask"),
        rightTiebreak = col("qt"),
      )
      .select("bid", "ask").as[(Option[Long], Option[Long])].collect().head
    // Latest row is (null, 7); bid must NOT be backfilled from the older row.
    assert(out == (None, Some(7L)))
  }

  test("null join keys never match (SQL semantics)") {
    val quotes = Seq(
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 100L),
    ).toDF("key", "qt", "quote_id")
    val trades = Seq(
      (Option.empty[Long], ts("2024-01-01 11:00:00"), "t1"),
    ).toDF("key", "tt", "trade")
    val out = AsOfJoinOp
      .asOfJoin(
        trades, quotes,
        leftKey = col("key"), rightKey = col("key"),
        leftTime = col("tt"), rightTime = col("qt"),
        rightPayload = Seq("quote_id"), rightTiebreak = col("quote_id"),
      )
      .select("trade", "quote_id").as[(String, Option[Long])].collect().toSeq
    assert(out == Seq(("t1", None))) // left row survives, unmatched
  }

  test("string tiebreaks order in their own type (no lossy cast)") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), "QA"),
      (1L, ts("2024-01-01 10:00:00"), "QB"), // same instant — greatest string wins
    ).toDF("key", "qt", "ref")
    val trades = Seq((1L, ts("2024-01-01 10:30:00"), "t1")).toDF("key", "tt", "trade")
    val out = AsOfJoinOp
      .asOfJoin(
        trades, quotes,
        leftKey = col("key"), rightKey = col("key"),
        leftTime = col("tt"), rightTime = col("qt"),
        rightPayload = Seq("ref"), rightTiebreak = col("ref"),
      )
      .select("ref").as[String].collect().head
    assert(out == "QB")
  }

  test("every left row is preserved (left as-of semantics)") {
    val e = Tables.events(spark, Sf).select(col("event_id"), col("user_id"), col("ts"))
    val o = Tables.orders(spark, Sf).select(
      col("o_custkey"),
      col("o_orderdate").cast("timestamp_ntz").as("o_orderdate"),
      col("o_orderkey"),
    )
    val out = AsOfJoinOp.asOfJoin(
      e, o,
      leftKey = col("user_id"), rightKey = col("o_custkey"),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      rightPayload = Seq("o_orderkey"), rightTiebreak = col("o_orderkey"),
    )
    assert(out.count() == e.count())
  }
}

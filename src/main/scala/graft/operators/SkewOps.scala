package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation techniques for hot keys at cluster scale.
  *
  * A single ultra-hot group key turns a hash aggregation's final stage
  * (or a join's partition) into one straggler task. Salting splits each
  * key into `buckets` sub-keys for the first (wide, parallel) partial
  * aggregation, then merges the per-salt partials in a second, tiny
  * aggregation — semantically identical for any commutative+associative
  * aggregate, and exactly identical here because the engine's sums are
  * decimal (order-insensitive). AQE's skew-join handling covers joins;
  * salting covers aggregations and is deliberate, not adaptive.
  */
object SkewOps {

  /** Two-stage salted sum/count aggregation: groupBy(key, salt) →
    * groupBy(key). The salt must be ROW-unique-ish, never derived from
    * the aggregated value (a hot key with constant/NULL values would
    * collapse into one salt bucket and the straggler would remain):
    * monotonically_increasing_id spreads a hot key's rows across all
    * buckets regardless of its payload.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      value: Column,
      buckets: Int,
  ): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(buckets.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
}

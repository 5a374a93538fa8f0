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
  /** First working-column name of the form `base`, `base1`, `base2`, …
    * absent from `taken` — inputs that already carry a column named like
    * a salt/partial column must not collide with the operator's own
    * (ambiguous reference or a silently wrong join key otherwise).
    */
  private def freshCol(base: String, taken: Iterable[String]): String = {
    val t = taken.toSet
    Iterator.from(0).map(i => if (i == 0) base else s"$base$i").find(!t(_)).get
  }

  def saltedAgg(
      df: DataFrame,
      key: Column,
      value: Column,
      buckets: Int,
  ): DataFrame = {
    val salt = freshCol("__salt", df.columns)
    df.withColumn(salt, pmod(monotonically_increasing_id(), lit(buckets.toLong)))
      .groupBy(key.as("key"), col(salt))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("total"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a hot probe-side key: every probe row gets a
    * row-unique salt in [0, buckets); the build side is replicated once
    * per salt value, and the join key becomes (key, salt) — a hot key's
    * rows now land in `buckets` partitions instead of one straggler.
    * Build-side cost is deliberate and bounded: |build| × buckets rows,
    * the standard trade when the build side is a dimension. Result is
    * row-identical to the plain join (each probe row matches exactly the
    * replica carrying its own salt).
    *
    * This is the explicit form of what AQE skew-join does adaptively;
    * it exists for the cases AQE cannot see (skew materializing after
    * an upstream transform, or a deliberately disabled AQE).
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      buckets: Int,
  ): DataFrame = {
    val salt = freshCol("__salt", probe.columns ++ build.columns)
    val salted = probe
      .withColumn(salt, pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val replicated = build
      .withColumn(salt, explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(replicated, Seq(key, salt)).drop(salt)
  }
}

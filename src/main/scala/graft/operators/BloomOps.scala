package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter technique that
  * cuts probe-side shuffle volume before a big join: build a compact
  * bitset over the (filtered, small) build side's keys, broadcast it,
  * and drop probe rows whose keys cannot be in the build side. At
  * 100 TB the probe scan emits only passing rows into the join
  * exchange; the filter itself is a few KiB of longs.
  *
  * Catalyst already injects its own bloom runtime filter in the
  * shuffle-join regime (asserted in RuntimeFilterSpec); that filter is
  * an opaque internal sketch, invisible to results. This module is the
  * complementary piece: a PORTABLE bloom whose pruning decision is
  * itself a queryable, oracle-checkable result — the audit a team runs
  * before trusting a runtime filter at 100 TB.
  *
  * Everything is deterministic, portable integer arithmetic:
  * `k` hash positions per key via the Knuth multiplicative scheme
  * `((key*a + b) mod (2^31−1)) mod m`, the bitset packed as 64-bit
  * words with a `bit_or` aggregate, probed with element_at + shift —
  * no UDFs, no opaque library sketch, bit-reproducible in any engine
  * (the oracle tests position-set membership, which is definitionally
  * the same predicate).
  */
object BloomOps {

  /** Mersenne modulus shared with the repo's other portable hashes. */
  val P: Long = 2147483647L

  /** (a, b) per hash function — distinct multiplicative constants. */
  val Hashes: Seq[(Long, Long)] =
    Seq((2654435761L, 0L), (2246822519L, 7L), (3266489917L, 13L))

  private def hashPos(key: Column, a: Long, b: Long, mBits: Long): Column =
    ((key * lit(a) + lit(b)) % lit(P)) % lit(mBits)

  /** The packed bitset of `keys` (one LONG column) as a 1-row frame
    * holding a word-index → word map — only occupied words are stored,
    * so the artifact scales with set bits, not `mBits`.
    */
  def buildBloom(keys: DataFrame, keyCol: String, mBits: Long): DataFrame = {
    val key = col(keyCol).cast("long")
    val positions = keys
      .select(explode(array(Hashes.map { case (a, b) => hashPos(key, a, b, mBits) }: _*)).as("pos"))
    positions
      .groupBy(expr("pos div 64").as("widx"))
      .agg(expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").as("word"))
      .agg(map_from_entries(collect_list(struct(col("widx"), col("word")))).as("bloom"))
  }

  /** True iff every hash position of `key` is set in the broadcast
    * bloom map — row-local bit arithmetic, codegen-friendly.
    */
  def bloomPass(key: Column, bloom: Column, mBits: Long): Column =
    Hashes.map { case (a, b) =>
      val pos = hashPos(key, a, b, mBits)
      (coalesce(element_at(bloom, (pos / 64).cast("long")), lit(0L))
        .bitwiseAND(call_function("shiftleft", lit(1L), (pos % 64).cast("int"))) =!= 0)
    }.reduce(_ && _)

  /** Audit the reduction a bloom filter of `mBits` bits over the build
    * side's keys achieves on the probe side: probe rows, bloom passes,
    * exact semi-join matches, false positives — and `n_missed`, which
    * the bloom contract requires to be 0 (no false negatives; the
    * output proves it). The build side is broadcast twice (as the
    * bitset and as the exact key set); the probe side is scanned once
    * with row-local tests.
    */
  def bloomSemiJoinStats(
      probe: DataFrame,
      probeKey: String,
      build: DataFrame,
      buildKey: String,
      mBits: Long,
  ): DataFrame = {
    val keys = build.select(col(buildKey).cast("long").as("bk")).distinct()
    val bloom = buildBloom(keys, "bk", mBits)
    val flagged = probe
      .select(col(probeKey).cast("long").as("pk"))
      .crossJoin(broadcast(bloom))
      .withColumn("bloom_pass", bloomPass(col("pk"), col("bloom"), mBits))
      .join(broadcast(keys.withColumn("_in", lit(1))), col("pk") === col("bk"), "left")
      .withColumn("exact_in", col("_in").isNotNull)
    flagged.agg(
      count(lit(1)).as("n_probe"),
      count(when(col("bloom_pass"), lit(1))).as("n_pass"),
      count(when(col("exact_in"), lit(1))).as("n_exact"),
      count(when(col("bloom_pass") && !col("exact_in"), lit(1))).as("n_false_pos"),
      count(when(col("exact_in") && !col("bloom_pass"), lit(1))).as("n_missed"),
    )
  }
}

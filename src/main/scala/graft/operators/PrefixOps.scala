package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed two-pass prefix machinery: global row ranks and global
  * running sums over a total order WITHOUT a single-partition window
  * sort — the scale-safe form of `row_number()/sum() OVER (ORDER BY …)`
  * for row-per-record input.
  *
  * Shape (the classic parallel prefix sum):
  *   1. range-repartition on the sort keys + sort within partitions —
  *      the ONLY data-sized shuffle a rank needs;
  *   2. per-partition local row numbers / subtotals — partition-local,
  *      no shuffle (ranks fall out of `monotonically_increasing_id`'s
  *      documented bit layout: partition id high bits, per-partition
  *      counter low 33 bits);
  *   3. a #partitions-row offset table (cumulative subtotal of all
  *      EARLIER partitions — `RangePartitioning` guarantees partition
  *      ids ascend with the key range), broadcast back onto the data.
  *
  * The offset table's own cumulative pass IS an unpartitioned window —
  * over one row per partition, i.e. aggregated input, the one place
  * that shape is legitimate (PlanAuditSpec enforces exactly this
  * distinction). Every data-sized stage runs with full parallelism at
  * any scale.
  */
object PrefixOps {

  /** Range-partition `df` on `sortCols`, sort within partitions, attach
    * `_pid` (shuffle partition id) and `_lrn` (1-based local row
    * number), and localCheckpoint the result: `repartitionByRange`
    * samples its boundaries per evaluation, so the two downstream
    * subtree instances (the per-partition count pass and the data pass)
    * MUST read one materialized partitioning or their offsets could
    * disagree.
    */
  /** The scratch columns this machinery attaches with plain withColumn.
    * A caller whose frame already carries one of these names would have
    * it silently overwritten — wrong ranks/sums with no error — so both
    * entry points reject the collision up front.
    */
  private def requireFreeNames(df: DataFrame, reserved: Seq[String]): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"PrefixOps reserved/output column(s) already present: ${clash.mkString(", ")}")
  }

  private def rangeNumbered(df: DataFrame, sortCols: Seq[Column]): DataFrame =
    df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .withColumn("_pid", spark_partition_id().cast("long"))
      .withColumn("_lrn", col("_mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("_mid")
      .localCheckpoint()

  /** One offset column per (name, subtotal) pair: for each `_pid`, the
    * sum of that subtotal over all strictly-earlier partitions. Input
    * is one row per partition — tiny, aggregated.
    */
  private def offsetsOf(counts: DataFrame, names: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    names
      .foldLeft(counts) { (d, n) =>
        d.withColumn(s"_o_$n", coalesce(sum(col(s"_s_$n")).over(w), lit(0L)))
      }
      .select(col("_pid") +: names.map(n => col(s"_o_$n")): _*)
  }

  /** Adds a 1-based global row number `rankName` under the total order
    * `sortCols` (which must be a genuinely unique key for the rank to
    * be deterministic). Cost: one range shuffle of the data, one tiny
    * count aggregate, one broadcast join — no single-partition stage.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column], rankName: String): DataFrame = {
    requireFreeNames(df, Seq("_mid", "_pid", "_lrn", "_o_n", rankName))
    val numbered = rangeNumbered(df, sortCols)
    val counts = numbered.groupBy(col("_pid")).agg(count(lit(1)).as("_s_n"))
    numbered
      .join(broadcast(offsetsOf(counts, Seq("n"))), Seq("_pid"))
      .withColumn(rankName, col("_o_n") + col("_lrn"))
      .drop("_pid", "_lrn", "_o_n")
  }

  /** Adds one global running-sum column per (outName, longCol) pair,
    * cumulative up to AND including the current row under `sortCols`
    * order (ROWS UNBOUNDED PRECEDING semantics; sort keys must be
    * unique). The local running pass is a window PARTITIONED by the
    * range bucket — parallel across buckets, each bounded by the range
    * partitioner's balance — plus broadcast offsets from the subtotal
    * table. Sums are exact long arithmetic.
    */
  def runningSums(
      df: DataFrame,
      sortCols: Seq[Column],
      sums: Seq[(String, Column)],
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    requireFreeNames(
      df,
      Seq("_mid", "_pid", "_lrn") ++ sums.flatMap { case (n, _) => Seq(n, s"_v_$n", s"_o_$n") })
    val withVals = sums.foldLeft(df) { case (d, (n, c)) => d.withColumn(s"_v_$n", c) }
    val numbered = rangeNumbered(withVals, sortCols)
    val subAggs = sums.map { case (n, _) => sum(col(s"_v_$n")).as(s"_s_$n") }
    val counts = numbered.groupBy(col("_pid")).agg(subAggs.head, subAggs.tail: _*)
    val local = Window
      .partitionBy("_pid")
      .orderBy("_lrn")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = numbered.join(broadcast(offsetsOf(counts, sums.map(_._1))), Seq("_pid"))
    sums
      .foldLeft(joined) { case (d, (n, _)) =>
        d.withColumn(n, col(s"_o_$n") + sum(col(s"_v_$n")).over(local))
      }
      .drop("_pid" :: "_lrn" :: sums.toList.flatMap { case (n, _) =>
        List(s"_v_$n", s"_o_$n")
      }: _*)
  }
}

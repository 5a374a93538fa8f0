package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filtering (bloom-filter pushdown) — the 100 TB
  * fact⋈filtered-dim story. At test SF the dim broadcasts, and Spark
  * correctly skips the bloom (the BHJ build side already prunes). When
  * broadcast is off — the regime a 100 TB dim forces — the optimizer
  * injects a bloom filter built from the filtered creation side and
  * applies it to the probe-side scan, so the fact shuffle carries only
  * rows that can possibly join. Both regimes are asserted so the claim
  * in SCALE.md stays executable.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def plan(): String = {
    val l = spark.read.parquet(s"$Sf/lineitem.parquet")
    val o = spark.read.parquet(s"$Sf/orders.parquet").filter(col("o_totalprice") > 450000)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .count()
      .queryExecution.optimizedPlan.toString
  }

  test("shuffle-join regime: bloom filter injected on the probe side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val p = plan()
      assert(p.contains("might_contain") || p.toLowerCase.contains("bloom"), p)
    }
  }

  test("broadcast regime: no bloom needed — the BHJ build side prunes already") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "10MB",
    ) {
      val p = plan()
      assert(!p.contains("might_contain"), p)
    }
  }

  test("portable bloom audit: probe side stays shuffle-free and the filter never misses") {
    val stats = graft.operators.BloomOps.bloomSemiJoinStats(
      spark.read.parquet(s"$Sf/lineitem.parquet"), "l_orderkey",
      spark.read.parquet(s"$Sf/orders.parquet").filter(col("o_orderpriority") === "1-URGENT"),
      "o_orderkey", mBits = 524288L)
    val physical = stats.queryExecution.executedPlan.toString
    assert(!physical.contains("SortMergeJoin"), physical)
    val row = stats.collect().head
    assert(row.getAs[Long]("n_missed") == 0L, "bloom filters must have no false negatives")
    assert(row.getAs[Long]("n_pass") >= row.getAs[Long]("n_exact"))
  }
}

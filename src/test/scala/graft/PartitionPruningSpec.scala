package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The curated store's layout story: the streaming sink lands data
  * partitioned by day, so the flagship day-ranged queries read only the
  * matching directories. Asserted at the plan level: the scan's
  * partition filters prune before any data is read.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned store prunes partitions for day-ranged reads") {
    val dir = Files.createTempDirectory("curated_store").toFile.getAbsolutePath + "/store"
    val rows = Seq(
      ("2019-11-05", "a", 10L),
      ("2019-11-06", "b", 20L),
      ("2019-11-07", "c", 30L),
      ("2019-11-08", "d", 40L),
    ).toDF("day", "ip_src", "bytes")
    rows.write.partitionBy("day").parquet(dir)

    val read = spark.read.parquet(dir).filter(col("day") >= "2019-11-06" && col("day") <= "2019-11-07")
    assert(read.count() == 2)

    val scan = read.queryExecution.executedPlan.collectLeaves().head.toString
    // Partition filters present and nothing pushed as a DATA filter —
    // the day bounds never touch row groups.
    assert(scan.contains("PartitionFilters") && scan.contains("day"), scan)
    val pruned = read.queryExecution.executedPlan.toString
    assert(pruned.contains("(day"), s"day filter must appear as partition filter:\n$pruned")
  }
}

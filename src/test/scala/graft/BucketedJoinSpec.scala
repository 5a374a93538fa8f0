package graft

import org.apache.spark.sql.functions._

/** Proves the SCALE.md co-location claim: bucketing both fact tables on
  * the join key lets `ENSURE_REQUIREMENTS` elide the per-query join
  * shuffles entirely — the physical plan contains a SortMergeJoin and
  * NO exchange. At 100 TB this converts the repeated lineitem⋈orders
  * shuffle into a one-time storage layout decision.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join on the bucket key is shuffle-free") {
    val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_extendedprice")
    val o = Tables.orders(spark, Sf).select("o_orderkey", "o_orderstatus")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(4, "o_orderkey").saveAsTable("o_bucketed")

    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark
        .table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

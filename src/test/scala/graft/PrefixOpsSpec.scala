package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.PrefixOps

/** The distributed prefix machinery must be BIT-EQUAL to the literal
  * unpartitioned-window forms it replaces, on multi-partition shuffled
  * input — the single-partition window is the semantic oracle, the
  * two-pass form is the plan that survives 100 TB.
  */
class PrefixOpsSpec extends SparkSpec {

  private def shuffled = {
    import spark.implicits._
    // Keys deliberately non-contiguous and inserted out of order so a
    // "works because input was already sorted" bug cannot pass.
    (1 to 997).map(i => ((i * 7919) % 1009, i.toLong, (i % 13).toLong))
      .toDF("k", "a", "b")
      .repartition(7)
  }

  test("globalRank equals row_number over the global window") {
    val expected = shuffled
      .withColumn("rn", row_number().over(Window.orderBy("k")).cast("long"))
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    val got = PrefixOps.globalRank(shuffled, Seq(col("k")), "rn")
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(got == expected)
  }

  test("runningSums equals cumulative window sums") {
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = shuffled
      .withColumn("ca", sum("a").over(w))
      .withColumn("cb", sum("b").over(w))
      .collect().map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val got = PrefixOps
      .runningSums(shuffled, Seq(col("k")), Seq("ca" -> col("a"), "cb" -> col("b")))
      .collect().map(r => r.getInt(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("q_histogram_equidepth matches the literal ntile window form") {
    val li = Tables.lineitem(spark, Sf)
      .select(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ntileForm = li
      .withColumn("bucket", ntile(10).over(w))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .orderBy("bucket")
      .collect().toSeq
    val got = Registry.queries("q_histogram_equidepth")(spark, Sf).collect().toSeq
    assert(got == ntileForm)
  }

  test("rank plan has no unpartitioned window over the data") {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = PrefixOps
      .globalRank(shuffled, Seq(col("k")), "rn")
      .queryExecution.executedPlan
    val bad = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    // The only unpartitioned window permitted is the offset table's —
    // and that sits above an aggregate, which PlanAuditSpec's global
    // structural audit verifies; here we additionally pin that NO
    // unpartitioned window touches more rows than the partition count.
    bad.foreach { w =>
      assert(
        PlanAudit.aggregatedInput(w.child),
        s"unpartitioned window over row-per-record input:\n$w",
      )
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Batch source-format coverage: the engine's operators are
  * format-agnostic DataFrame transforms — prove the same table round
  * trips through JSON and CSV sources with schemas intact enough for
  * the flagship transforms.
  */
class SourceFormatSpec extends SparkSpec {

  test("documents round-trip through JSON and CSV sources") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("fmt").toFile.getAbsolutePath

    docs.write.json(s"$base/json")
    docs.write.option("header", "true").csv(s"$base/csv")

    val fromJson = spark.read.json(s"$base/json").select("doc_id", "text", "lang")
    val fromCsv = spark.read
      .option("header", "true")
      .schema(docs.schema)
      .csv(s"$base/csv")
      .select("doc_id", "text", "lang")

    assert(fromJson.count() == 500 && fromCsv.count() == 500)
    assert(fromJson.exceptAll(docs).isEmpty && docs.exceptAll(fromJson).isEmpty)
    assert(fromCsv.exceptAll(docs).isEmpty && docs.exceptAll(fromCsv).isEmpty)

    // An engine operator runs unchanged over either source.
    val viaParquet = graft.operators.TextOps.tokenStats(docs).collect()
    val viaJson = graft.operators.TextOps.tokenStats(fromJson).collect()
    assert(viaParquet.sameElements(viaJson))
  }

  test("ORC round-trips with predicate pushdown reaching the scan") {
    val docs = Tables.documents(spark, Sf).select("doc_id", "text", "lang")
    val base = Files.createTempDirectory("fmt_orc").toFile.getAbsolutePath
    docs.write.orc(s"$base/orc")
    val fromOrc = spark.read.orc(s"$base/orc").select("doc_id", "text", "lang")
    assert(fromOrc.exceptAll(docs).isEmpty && docs.exceptAll(fromOrc).isEmpty)
    // The columnar-source contract the engine relies on (same as
    // parquet, asserted in PartitionPruningSpec): filters reach the
    // scan as pushed predicates, projection prunes columns.
    val filtered = fromOrc.filter(col("lang") === "en").select("doc_id")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]"), scan)
    assert(filtered.count() > 0)
  }

  test("schema evolution: mergeSchema unions parquet batches with added columns, old rows read NULL") {
    // The 100 TB reality: a long-lived table gains columns over time.
    // Batch 1 has (doc_id, text); batch 2 adds quality. mergeSchema must
    // read both generations with the union schema and NULL-fill history.
    import spark.implicits._
    val base = Files.createTempDirectory("fmt_evo").toFile.getAbsolutePath
    Seq((1L, "old doc")).toDF("doc_id", "text").write.parquet(s"$base/t/g1")
    Seq((2L, "new doc", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$base/t/g2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$base/t/g1", s"$base/t/g2")
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "text", "quality"))
    val rows = merged.orderBy("doc_id")
      .select("doc_id", "quality").as[(Long, Option[Double])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, Some(0.9))))
    // Operators tolerate the evolved frame: a filter on the new column
    // keeps NULL-safe semantics (old rows drop out, not crash).
    assert(merged.filter(col("quality") > 0.5).count() == 1)
  }
}

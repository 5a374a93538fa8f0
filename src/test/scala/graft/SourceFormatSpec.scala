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
}

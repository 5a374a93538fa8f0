package graft.operators

import org.apache.spark.sql.SparkSession

/** Catalog lookups shared by the persisted-index families
  * ([[LshIndexOps]], [[SearchIndexOps]], [[VectorIndexOps]]) — one
  * implementation of the rebucket-survival rule: appends MUST read the
  * live bucket count from the catalog rather than take it as a
  * parameter, because a hard-coded count goes stale the moment a
  * rebucket runs and the next append then fails the bucket-spec match
  * (killing a running streaming ingest, which survives a mid-stream
  * rebucket precisely because of this lookup).
  */
private[operators] object IndexCatalog {

  /** The stored table's bucket count, or a hard error for tables that
    * are not graft index tables (appending unbucketed data into an
    * index would silently disable every pruned read path).
    */
  def tableBuckets(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(sys.error(s"$table has no bucket spec — not a graft index table"))
}

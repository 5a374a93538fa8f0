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
private[graft] object IndexCatalog {

  /** The stored table's bucket count, or a hard error for tables that
    * are not graft index tables (appending unbucketed data into an
    * index would silently disable every pruned read path).
    */
  def tableBuckets(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(sys.error(s"$table has no bucket spec — not a graft index table"))

  /** Swap fully-staged replacement tables over their live names — the
    * maintenance-commit step shared by every index family's rebucket
    * and compaction. `pairs` is (live, staged); all staged tables were
    * written BEFORE this is called, so the entire rewrite phase (the
    * minutes-long part) is invisible to readers — they see the old
    * index in full. Each swap is rename-FIRST: live → `_old`, staged →
    * live, then drop `_old`. The reader-visible hole shrinks from "the
    * whole rewrite of every later table" (the old drop-then-rewrite
    * ordering) to the instants between two catalog renames, and a
    * crash mid-swap leaves `_old` as a recovery copy instead of a
    * dangling live name. True zero-window atomicity across tables
    * needs a catalog with multi-table transactions — a table-format
    * concern, not a query-engine one; the single-maintainer contract
    * stands for the rename instants.
    */
  def swapStaged(spark: SparkSession, pairs: Seq[(String, String)]): Unit =
    pairs.foreach { case (live, staged) =>
      val old = s"${live}_old"
      spark.sql(s"DROP TABLE IF EXISTS $old")
      spark.sql(s"ALTER TABLE $live RENAME TO $old")
      spark.sql(s"ALTER TABLE $staged RENAME TO $live")
      spark.sql(s"DROP TABLE $old")
    }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

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

  /** The crash-repair presence probe every intent/commit ingest ledger
    * shares ([[LshIndexOps]], [[MediaIndexOps]], [[SearchIndexOps]]):
    * "does `table` already hold any of this batch's rows?" — presence
    * of one row implies the whole batch landed there, because each
    * table append is a single atomic job commit. The batch's bounded
    * doc_id list is collected ONCE per repair (lazily — the fresh-batch
    * fast path never pays it), not once per probed table, and pushed
    * into each probed scan as an IN-list (bucket pruning + parquet
    * row-group doc_id stats skip every file but the crashed append's
    * own); batches above `cap` distinct ids fall back to a distributed
    * semi-join probe instead of a driver list.
    */
  final class PresenceProbe(
      spark: SparkSession,
      batch: DataFrame,
      cap: Int,
      idCol: String = "doc_id",
  ) {
    private lazy val ids: Seq[Long] = batch
      .select(col(idCol)).distinct().limit(cap + 1)
      .collect().map(_.getLong(0)).toSeq

    /** True when `table` already holds any of the batch's ids.
      * Refreshes the relation first — a prior append in this very
      * repair must be visible to the probe.
      */
    def apply(table: String): Boolean = {
      spark.catalog.refreshTable(table)
      val t = spark.table(table)
      if (ids.length <= cap)
        !t.filter(col(idCol).isin(ids: _*)).limit(1).isEmpty
      else
        !t.join(batch.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
          .limit(1).isEmpty
    }
  }

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
      // A prior swap may have crashed between its two renames, leaving
      // `_old` as the only copy; restore it before touching anything —
      // the old behavior (DROP IF EXISTS `_old` first) silently
      // destroyed the recovery copy and left downstream tableExists
      // guards skipping maintenance on a missing live name.
      recoverDangling(spark, live)
      val old = s"${live}_old"
      spark.sql(s"DROP TABLE IF EXISTS $old")
      spark.sql(s"ALTER TABLE $live RENAME TO $old")
      spark.sql(s"ALTER TABLE $staged RENAME TO $live")
      spark.sql(s"DROP TABLE $old")
    }

  /** Repair the crash window between [[swapStaged]]'s two renames: a
    * dangling `${table}_old` with NO live `$table` means the first
    * rename committed and the second never ran — `_old` is the sole
    * complete copy, so rename it back. Maintainers call this BEFORE
    * any `tableExists(table)` guard (a missing live name must read as
    * "crashed swap, recover" — never as "artifact was never built",
    * which would silently skip the maintenance step and leave the read
    * face stale). Idempotent and cheap: two catalog existence probes
    * on the healthy path.
    */
  def recoverDangling(spark: SparkSession, table: String): Unit = {
    val old = s"${table}_old"
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(old)) {
      spark.sql(s"ALTER TABLE $old RENAME TO $table")
      spark.catalog.refreshTable(table)
    }
  }

  /** Read a swap-managed artifact resiliently across [[swapStaged]]'s
    * rename-instant window: resolve the live name; on a miss retry
    * once (the swap completes in the gap between two catalog renames,
    * so one retry covers the common race), then fall back to `_old` —
    * the complete pre-swap copy that exists for exactly the duration
    * of the window. Content-wise the fallback is safe by the staging
    * contract: `_old` and the incoming live table hold the same
    * logical artifact (a rebucket/compaction changes layout only; a
    * cluster grow is idempotent), so a reader landing on `_old` sees a
    * consistent — at worst one-swap-stale — artifact instead of a
    * NoSuchTable failure. A miss with no `_old` either rethrows the
    * original error (genuinely absent table).
    */
  def readLive(spark: SparkSession, table: String): DataFrame =
    try spark.table(table)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        try spark.table(table)
        catch {
          case _: org.apache.spark.sql.AnalysisException =>
            val old = s"${table}_old"
            if (spark.catalog.tableExists(old)) spark.table(old) else throw e
        }
    }

  /** Write `table`'s replacement under a staged name at `buckets`
    * physical buckets, touching nothing live — the phase-1 primitive
    * behind every rebucket and compaction. The explicit
    * `repartition(buckets, keys)` matters: Spark's bucketed WRITE
    * never shuffles on its own, so each input task writes one file per
    * bucket value it holds — a T-task rewrite would emit up to
    * T × buckets files, re-creating the fragmentation a compaction
    * exists to remove. repartition's hash is the bucket hash
    * (pmod(murmur3(keys), buckets)), so after it each task holds
    * exactly one bucket and the staged table lands at ONE file per
    * bucket.
    */
  def stageTable(
      spark: SparkSession,
      table: String,
      keys: Seq[String],
      sortCols: Seq[String],
      buckets: Int,
  ): (String, String) =
    stageTableFrom(spark, table, spark.table(table), keys, sortCols, buckets)

  /** [[stageTable]] with an explicit source frame — for maintenance
    * rewrites that stage a FILTERED view of the live table (tombstone
    * purges). The source must read `table` (the conf guard below is
    * what makes its bucketed scan align with the write; planning
    * happens at the write action, inside the guard).
    */
  def stageTableFrom(
      spark: SparkSession,
      table: String,
      source: DataFrame,
      keys: Seq[String],
      sortCols: Seq[String],
      buckets: Int,
  ): (String, String) = {
    val tmp = s"${table}_rebucket"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // autoBucketedScan must be OFF for this read (saved/restored): with
    // it on, Spark 4.1 first elides the repartition exchange because
    // the bucketed scan promises HashPartitioning(keys, oldBuckets),
    // then DisableUnnecessaryBucketedScan — seeing no remaining
    // consumer of that partitioning — drops the bucketed layout, and
    // the write receives raw file splits: every task spills files into
    // every bucket, re-creating the fragmentation this rewrite exists
    // to remove (measured; the readCells caveat's write-side twin).
    // With it off, a same-count compaction reads one partition per
    // bucket and writes one file per bucket with NO shuffle at all; a
    // changed-count rebucket keeps the aligned repartition exchange.
    val conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try {
      val w = source
        .repartition(buckets, keys.map(col): _*)
        .write.mode("overwrite")
        .bucketBy(buckets, keys.head, keys.tail: _*)
      (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
        .saveAsTable(tmp)
    } finally spark.conf.set(conf, saved)
    (table, tmp)
  }

  /** The worst bucket's physical file count — the cost a pruned read
    * actually pays (a probe of one bucket opens that bucket's files).
    * Bucket ids are parsed from the bucketed-file naming scheme
    * (`..._NNNNN.c000...`); driver-side metadata only (one array entry
    * per file), never a data scan — the LayoutOps.compactionPlan
    * argument applied to index tables.
    */
  def maxFilesPerBucket(spark: SparkSession, table: String): Int = {
    val bucketOf = "_(\\d{5})\\.".r
    val files = spark.table(table).inputFiles
    if (files.isEmpty) 0
    else
      files
        .groupBy(f => bucketOf.findFirstMatchIn(f.substring(f.lastIndexOf('/') + 1)).map(_.group(1)))
        .values.map(_.length).max
  }

  /** Per-table physical layout stats for an index family — total file
    * count and worst-bucket file count, the two dials appends degrade
    * and [[compactBucketed]] restores. Surfaced as a DataFrame so
    * operational consumers read it like any other health view.
    */
  def fileStats(spark: SparkSession, tables: Seq[String]): DataFrame = {
    val rows = tables.filter(spark.catalog.tableExists).map { t =>
      (t, spark.table(t).inputFiles.length.toLong, maxFilesPerBucket(spark, t).toLong)
    }
    spark.createDataFrame(rows).toDF("table", "n_files", "max_files_per_bucket")
  }

  /** Append compaction over a family's bucketed tables: rewrite ONLY
    * the tables whose worst bucket exceeds `maxFilesPerBucket` (each
    * append adds one file per touched bucket, so pruned reads open
    * O(appends) files per probe until this runs), at their CURRENT
    * bucket count, with the same stage-all-then-swap discipline as a
    * rebucket — readers are served throughout. Returns the rewritten
    * table names (empty = layout already within budget; the call did
    * no data work, only driver-side file listings).
    */
  def compactBucketed(
      spark: SparkSession,
      specs: Seq[(String, Seq[String], Seq[String])],
      maxPerBucket: Int,
  ): Seq[String] = {
    require(maxPerBucket >= 1, "maxFilesPerBucket must be at least 1")
    val picked = specs.filter { case (t, _, _) => maxFilesPerBucket(spark, t) > maxPerBucket }
    val staged = picked.map { case (t, keys, sortCols) =>
      stageTable(spark, t, keys, sortCols, tableBuckets(spark, t))
    }
    swapStaged(spark, staged)
    picked.map(_._1)
  }
}

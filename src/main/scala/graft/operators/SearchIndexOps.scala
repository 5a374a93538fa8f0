package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED inverted-index artifact — the production face
  * SearchOps' doc comment promises: a corpus pipeline pays the
  * corpus-wide explode ONCE, publishes the postings as a term-bucketed
  * table, and every retrieval query (AND, phrase, ranked TF-IDF) is
  * served from pruned per-term reads — the corpus text is never
  * re-read, never re-exploded (SearchIndexSpec pins the read-path plan:
  * no documents scan, postings buckets pruned to the query terms).
  *
  * Three tables per index:
  *   - `<prefix>_postings(term, doc_id, pos)` bucketed AND sorted by
  *     term: the per-term read both prunes buckets (the query's literal
  *     terms hash to a subset of buckets) and scans its lists
  *     sequentially within each file;
  *   - `<prefix>_lexicon(term, df)` bucketed by term: per-BUILD partial
  *     document frequencies — each build/append writes its own batch's
  *     df rows and readers sum the partials, so an append never
  *     rewrites history (the mergeable-aggregate discipline applied to
  *     the lexicon);
  *   - `<prefix>_docs(doc_id, dl)` bucketed by doc_id: per-document
  *     token counts — the length norms BM25's saturation term needs
  *     (the Lucene norms-file role);
  *   - `<prefix>_meta(n_docs, n_tokens)` one partial row per
  *     build/append, summed at read time — corpus size and total token
  *     count (→ avgdl), without a corpus scan to recount them.
  *
  * Incremental contract (same as [[LshIndexOps]]): appended batches
  * carry doc_ids disjoint from everything already indexed — documents
  * are whole per batch, so per-batch df partials sum to the true df.
  * At 100 TB this converts repeated corpus probes from one
  * explode+shuffle per query into a one-time build plus reads whose
  * size is Σ df(t) over the query's terms.
  */
object SearchIndexOps {

  /** Builds and publishes the index tables (overwriting any previous
    * index at `prefix`). A stale ingest ledger from a previous index
    * generation would make [[indexBatch]] skip legitimate batches of
    * the rebuilt index, so it is dropped with the data it described.
    */
  def writeIndex(docs: DataFrame, buckets: Int, prefix: String): Unit = {
    docs.sparkSession.sql(s"DROP TABLE IF EXISTS ${prefix}_batches")
    writeTables(docs, buckets, prefix, org.apache.spark.sql.SaveMode.Overwrite)
  }

  private def writeTables(
      docs: DataFrame,
      buckets: Int,
      prefix: String,
      mode: org.apache.spark.sql.SaveMode,
  ): Unit = {
    val bk = batchKeyOf(docs)
    tableAppends(docs, buckets, prefix, mode, bk).foreach { case (t, run) =>
      run()
      docs.sparkSession.catalog.refreshTable(s"${prefix}_$t")
    }
  }

  /** The batch's deterministic identity: its minimum doc_id. Batches
    * carry disjoint doc_id sets (the incremental contract), so the
    * minimum is unique per batch AND reproducible on a checkpoint
    * replay of the same batch — which is what lets the per-batch
    * lexicon/df and meta partials be attributed to their batch, and
    * the ingest ledger recognize a replay, without any external id.
    */
  private def batchKeyOf(docs: DataFrame): Long = {
    val r = docs.agg(min(col("doc_id"))).first()
    if (r.isNullAt(0)) 0L else r.getLong(0) // empty batch → inert key
  }

  /** The four table writes in commit order — docs LAST, because it is
    * the membership table [[replayGuardFresh]] anti-joins against, so
    * its append is the batch's doc-level commit marker. Each write is
    * a thunk so [[indexBatch]]'s crash repair can re-run exactly the
    * missing suffix; the shared inputs are lazy and materialized once
    * (the corpus explode feeds two tables and must run once per
    * build). Lexicon and meta partial rows are tagged with the batch
    * key: per-batch partials are summed by readers anyway, and the tag
    * is what makes a crashed partial append DETECTABLE afterwards
    * (postings/docs rows carry their doc_ids; without the tag, df/meta
    * partials from a half-landed batch would be indistinguishable from
    * history).
    */
  private def tableAppends(
      docs: DataFrame,
      buckets: Int,
      prefix: String,
      mode: org.apache.spark.sql.SaveMode,
      batchKey: Long,
  ): Seq[(String, () => Unit)] = {
    lazy val p = SearchOps.postings(docs).localCheckpoint()
    // Length norms from one narrow projection of the batch (no second
    // explode — size(split) is row-local).
    lazy val dl = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
      .localCheckpoint()
    Seq(
      ("postings", () =>
        p.write.mode(mode)
          .bucketBy(buckets, "term").sortBy("term", "doc_id", "pos")
          .saveAsTable(s"${prefix}_postings")),
      ("lexicon", () =>
        p.groupBy(col("term"))
          .agg(countDistinct(col("doc_id")).as("df"))
          .withColumn("batch_key", lit(batchKey))
          .write.mode(mode)
          .bucketBy(buckets, "term")
          .saveAsTable(s"${prefix}_lexicon")),
      ("meta", () =>
        dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_tokens"))
          .withColumn("batch_key", lit(batchKey))
          .write.mode(mode)
          .saveAsTable(s"${prefix}_meta")),
      ("docs", () =>
        dl.write.mode(mode)
          .bucketBy(buckets, "doc_id")
          .saveAsTable(s"${prefix}_docs")),
    )
  }

  /** Incremental append: index a new batch of documents (doc_ids
    * disjoint from the stored corpus) without touching existing data —
    * one new file per bucket for postings/lexicon, one meta row, at
    * whatever bucket count the stored tables currently have. The
    * explicit refresh matters: the session caches each table's file
    * listing on first read, and a stale cache would silently serve
    * pre-append results to the next query.
    */
  def appendDocuments(spark: SparkSession, prefix: String, batch: DataFrame): Unit =
    writeTables(batch, IndexCatalog.tableBuckets(spark, s"${prefix}_postings"), prefix,
      org.apache.spark.sql.SaveMode.Append)

  /** Index health stats — the operational view of the stored postings:
    * per term-bucket file count proxy isn't observable from SQL, but
    * the skew that matters is: postings per term (the posting-list
    * length a read pays), docs per term (df), and the share of the
    * biggest list. One aggregate over the postings table, no corpus.
    */
  def indexStats(spark: SparkSession, prefix: String, topN: Int): DataFrame =
    spark
      .table(s"${prefix}_postings")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("n_postings"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n_postings").desc, col("term"))
      .limit(topN)

  /** Index maintenance: rewrite the bucketed tables at `newBuckets`
    * physical buckets (same swap discipline as
    * [[LshIndexOps.rebucket]] — temp table, drop, rename). Needed for
    * the same two reasons: every append adds one file per bucket, so
    * reads degrade as files accumulate, and the bucket count chosen at
    * build time caps the pruned read's parallelism forever. Content is
    * bit-preserved; only layout changes (SearchIndexSpec asserts).
    * Appends survive a rebucket because they read the live bucket
    * count from the catalog. Swap discipline: ALL replacement tables
    * are staged first ([[stageRebucket]]) — readers see the complete
    * old index throughout the rewrite (SearchIndexSpec reads
    * mid-stage) — then each is committed by
    * [[IndexCatalog.swapStaged]]'s rename-first sequence, so a crash
    * leaves a recovery copy, never a dangling live name. The
    * reader-visible hole is the rename instants only; the
    * single-maintainer contract covers them.
    */
  def rebucket(spark: SparkSession, prefix: String, newBuckets: Int): Unit =
    IndexCatalog.swapStaged(spark, stageRebucket(spark, prefix, newBuckets))

  /** The family's bucketed tables: (name, bucket keys, sort keys). */
  private def bucketedTables(prefix: String): Seq[(String, Seq[String], Seq[String])] =
    Seq(
      (s"${prefix}_postings", Seq("term"), Seq("term", "doc_id", "pos")),
      (s"${prefix}_lexicon", Seq("term"), Nil),
      (s"${prefix}_docs", Seq("doc_id"), Nil),
    )

  /** Phase 1 of [[rebucket]]: write every table's replacement under a
    * staged name, touching nothing live. Returns (live, staged) pairs
    * for [[IndexCatalog.swapStaged]].
    */
  private[graft] def stageRebucket(
      spark: SparkSession,
      prefix: String,
      newBuckets: Int,
  ): Seq[(String, String)] =
    bucketedTables(prefix).map { case (table, keys, sortCols) =>
      IndexCatalog.stageTable(spark, table, keys, sortCols, newBuckets)
    }

  /** Append compaction — the maintenance pass between rebuckets: every
    * append adds one file per touched bucket, so after N appends a
    * pruned per-term read opens O(N) files per probed bucket.
    * Rewrites ONLY the tables whose worst bucket exceeds
    * `maxFilesPerBucket` (staged + rename-first swap at the CURRENT
    * bucket count — [[IndexCatalog.compactBucketed]]), plus the meta
    * table when its one-row-file-per-append partials exceed the same
    * threshold (coalesced to one file; the partial ROWS are preserved
    * — readers sum them, so results stay bit-identical,
    * SearchIndexSpec asserts). Returns the rewritten tables; empty
    * means the layout was already within budget and no data moved.
    */
  def compact(spark: SparkSession, prefix: String, maxFilesPerBucket: Int = 4): Seq[String] = {
    val rewritten =
      IndexCatalog.compactBucketed(spark, bucketedTables(prefix), maxFilesPerBucket)
    val meta = s"${prefix}_meta"
    val metaDone =
      if (spark.table(meta).inputFiles.length > maxFilesPerBucket) {
        val rows = spark.table(meta).localCheckpoint()
        val tmp = s"${meta}_rebucket"
        spark.sql(s"DROP TABLE IF EXISTS $tmp")
        rows.coalesce(1).write.mode("overwrite").saveAsTable(tmp)
        IndexCatalog.swapStaged(spark, Seq((meta, tmp)))
        Seq(meta)
      } else Nil
    rewritten ++ metaDone
  }

  /** Physical layout health — file counts per index table, the dial
    * [[compact]] restores. Operational metadata (no oracle: file
    * layout is execution-dependent), served driver-side from listings.
    */
  def fileStats(spark: SparkSession, prefix: String): DataFrame =
    IndexCatalog.fileStats(
      spark,
      bucketedTables(prefix).map(_._1) ++ Seq(s"${prefix}_meta", s"${prefix}_batches"))

  /** Micro-batches with at most this many distinct doc_ids push their
    * id list into the stored-docs scan as an IN filter (bounded driver
    * collect — metadata-scale like the BPE vocabulary fold, never
    * corpus-scale); larger batches fall back to the full bucketed
    * anti-join.
    */
  private[graft] val GuardIdCap = 100000

  /** The replay guard's surviving rows: batch minus already-indexed
    * doc_ids. Guard cost is O(batch), not O(index): the anti-join only
    * needs the stored ids that could COLLIDE with this batch, so the
    * batch's (bounded) id list is pushed into the stored scan, where
    * it prunes buckets (doc_id is the bucket key) and parquet row
    * groups — at 100 TB the guard reads the touched buckets' matching
    * rows, not the billion-row membership table. The pruned guard side
    * is then at most batch-sized, so it broadcasts. SearchIndexSpec
    * pins the bucket pruning on the stored scan. The batch is
    * materialized HERE (it is scanned twice — id list + join — and a
    * nondeterministic input evaluated twice could produce an id list
    * that disagrees with the join side, letting already-indexed rows
    * slip past the guard); callers need not pre-checkpoint.
    */
  private[graft] def replayGuardFresh(
      spark: SparkSession,
      prefix: String,
      batch: DataFrame,
  ): DataFrame = {
    val b = batch.localCheckpoint()
    val stored = spark.table(s"${prefix}_docs").select(col("doc_id"))
    val ids = b
      .select(col("doc_id")).distinct().limit(GuardIdCap + 1)
      .collect().map(_.getLong(0)).toSeq
    if (ids.length <= GuardIdCap)
      b.join(
        broadcast(stored.filter(col("doc_id").isin(ids: _*))),
        Seq("doc_id"),
        "left_anti",
      )
    else b.join(stored, Seq("doc_id"), "left_anti")
  }

  /** Does `<prefix>_<table>` already hold THIS batch's rows? Presence
    * of any row implies the whole batch landed in that table (each
    * table's append is one atomic job commit). Postings/docs rows are
    * located by the batch's bounded doc_id list (the [[GuardIdCap]]
    * pushdown — bucket-pruned on docs, file-skipped via parquet
    * row-group doc_id stats on postings, where every append's files
    * hold only that batch's ids; semi-join fallback above the cap);
    * lexicon/meta partials by their batch-key tag. Only the RARE
    * crash-repair path pays these probes — the fresh-batch fast path
    * never runs them.
    */
  private def batchPresent(
      spark: SparkSession,
      prefix: String,
      table: String,
      probe: IndexCatalog.PresenceProbe,
      batchKey: Long,
  ): Boolean =
    table match {
      case "lexicon" | "meta" =>
        spark.catalog.refreshTable(s"${prefix}_$table")
        !spark.table(s"${prefix}_$table")
          .filter(col("batch_key") === batchKey).limit(1).isEmpty
      case _ => probe(s"${prefix}_$table")
    }

  /** One replay-safe, crash-repairable ingest step.
    *
    * Layer 1 — doc-level guard: [[replayGuardFresh]] drops the batch
    * rows whose doc_ids the stored docs table (the membership table,
    * written last) already holds, so a fully-committed batch replays
    * to a no-op and a mixed batch keeps only its new docs.
    *
    * Layer 2 — the `<prefix>_batches` ingest ledger (the
    * [[VectorIndexOps.ingestBatch]] discipline, extended with an
    * intent phase): a batch is identified by [[batchKeyOf]] (its min
    * doc_id — reproducible across checkpoint replays). The fast path
    * appends an `intent` row, runs the four table appends (docs last),
    * then appends a `commit` row — two single-row writes around the
    * work. On a replay that finds `intent` without `commit` — the
    * crash-in-the-middle case that used to double-count tf/df — every
    * table append is individually guarded by [[batchPresent]], so
    * exactly the missing suffix of the four appends is re-run and
    * nothing lands twice (SearchIndexSpec kills the sequence between
    * postings and docs and asserts the replayed index is bit-equal).
    * The residual exposure is therefore a single table append's own
    * job-commit atomicity — the engine-level floor; crossing it needs
    * a transactional table format (Iceberg/Delta).
    *
    * One benign residue: a crash AFTER the docs append but BEFORE the
    * commit row leaves that batch's `intent` row dangling forever —
    * its replay filters to empty at the doc-level guard and returns
    * before reaching the ledger. Dangling intents are inert (batch
    * keys are unique, so no later batch ever matches them) and cost
    * one ledger row.
    *
    * `crashAfter` is the spec's fault-injection seam: throw right
    * after the named table's append, simulating a kill mid-sequence.
    */
  private[graft] def indexBatch(
      spark: SparkSession,
      prefix: String,
      batch: DataFrame,
      crashAfter: String = "",
  ): Unit = {
    val fresh = replayGuardFresh(spark, prefix, batch).localCheckpoint()
    if (fresh.isEmpty) return
    val bk = batchKeyOf(fresh)
    val ledger = s"${prefix}_batches"
    if (!spark.catalog.tableExists(ledger))
      spark.sql(s"CREATE TABLE $ledger (batch_key BIGINT, phase STRING) USING parquet")
    val phases = spark.table(ledger)
      .filter(col("batch_key") === bk)
      .select(col("phase")).collect().map(_.getString(0)).toSet
    if (phases.contains("commit")) return
    val repairing = phases.contains("intent")
    if (!repairing) {
      spark.sql(s"INSERT INTO $ledger VALUES ($bk, 'intent')")
      spark.catalog.refreshTable(ledger)
    }
    val buckets = IndexCatalog.tableBuckets(spark, s"${prefix}_postings")
    // One fresh-id collect per REPAIR, shared by every table probe
    // (lazy inside the probe — the fast path never pays it).
    val probe = new IndexCatalog.PresenceProbe(spark, fresh, GuardIdCap)
    tableAppends(fresh, buckets, prefix, org.apache.spark.sql.SaveMode.Append, bk)
      .foreach { case (t, run) =>
        if (!repairing || !batchPresent(spark, prefix, t, probe, bk)) {
          run()
          spark.catalog.refreshTable(s"${prefix}_$t")
        }
        if (crashAfter == t)
          throw new IllegalStateException(s"injected crash after $t append")
      }
    spark.sql(s"INSERT INTO $ledger VALUES ($bk, 'commit')")
    spark.catalog.refreshTable(ledger)
  }

  /** Continuous ingestion — the streaming face of the persisted index:
    * every micro-batch of the `docs` stream (doc_id, text) is appended
    * via [[indexBatch]]. The artifact is the stream's STATE stored
    * in the warehouse (the [[LshIndexOps.streamingDedup]] discipline):
    * restarts recover it for free, batch consumers query it
    * concurrently, and state size scales with storage, not executor
    * memory. Replayed micro-batches are recognized by indexBatch's
    * ingest ledger and doc-level guard, and a batch killed mid-append
    * is repaired table-by-table on replay, so the foreachBatch
    * at-least-once contract does not double-count tf/df down to the
    * single-table-append atomicity floor indexBatch documents.
    */
  def streamingIndex(
      spark: SparkSession,
      prefix: String,
      docs: DataFrame,
      checkpoint: String,
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        indexBatch(spark, prefix, batch)
      }
      .start()

  /** Conjunctive (AND) retrieval from the stored postings — identical
    * semantics (and core) to [[SearchOps.searchAnd]], but the term
    * filter prunes buckets of the persisted table instead of gating a
    * corpus explode.
    */
  def searchAnd(spark: SparkSession, prefix: String, terms: Seq[String]): DataFrame =
    SearchOps.andFrom(IndexCatalog.readLive(spark, s"${prefix}_postings"), terms)

  /** Proximity (NEAR/slop) search from the stored postings — identical
    * core to [[SearchOps.searchNear]]; the term filter prunes buckets
    * of the persisted table, so the range join sees only the query
    * terms' posting lists.
    */
  def searchNear(spark: SparkSession, prefix: String, terms: Seq[String], slop: Int): DataFrame =
    SearchOps.nearFrom(IndexCatalog.readLive(spark, s"${prefix}_postings"), terms, slop)

  /** Negated conjunctive retrieval (MUST/MUST_NOT) from the stored
    * postings — identical core to [[SearchOps.searchNot]]; the combined
    * term filter prunes buckets to the union of both clause lists, and
    * the exclusion stays a conditional count (no anti-join, no second
    * index contact).
    */
  def searchNot(
      spark: SparkSession,
      prefix: String,
      must: Seq[String],
      mustNot: Seq[String],
  ): DataFrame =
    SearchOps.notFrom(IndexCatalog.readLive(spark, s"${prefix}_postings"), must, mustNot)

  /** Exact phrase match from the stored positional postings — each
    * phrase term contributes one pruned per-term read.
    */
  def searchPhrase(spark: SparkSession, prefix: String, phrase: Seq[String]): DataFrame =
    SearchOps.phraseFrom(
      t =>
        spark
          .table(s"${prefix}_postings")
          .filter(col("term") === t)
          .select(col("doc_id"), col("pos")),
      phrase,
    )

  /** Ranked TF-IDF retrieval served entirely from the artifact: tf from
    * the pruned postings read, df as the sum of the lexicon's per-batch
    * partials, N as the sum of the meta rows. Same arithmetic as the
    * corpus-scan face ([[SearchOps.rankedFrom]] is shared), so scores
    * are bit-equal — the oracle is unchanged.
    *
    * CONSISTENCY: this read touches multiple tables whose partials
    * must be of the same generation (new postings scored against old
    * df/meta mis-rank silently). The returned frame resolves every
    * table's file listing when it is CONSTRUCTED — one synchronous
    * call — and an analyzed frame keeps those listings even across a
    * concurrent append's cache refresh, so one constructed read always
    * serves one consistent snapshot no matter when it executes
    * (SearchIndexSpec pins this: an append between construction and
    * collect does not leak in). The un-pinnable window is construction
    * itself — an append committing between the individual
    * `spark.table` resolutions inside this method; the single-writer
    * contract covers that instant (writers pause while readers
    * construct, not while they run).
    */
  def searchRanked(spark: SparkSession, prefix: String, terms: Seq[String], k: Int): DataFrame = {
    val tf = SearchOps.tfFrom(IndexCatalog.readLive(spark, s"${prefix}_postings"), terms)
    val df = spark
      .table(s"${prefix}_lexicon")
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"))
    val n = IndexCatalog.readLive(spark, s"${prefix}_meta").agg(sum(col("n_docs")).as("n"))
    SearchOps.rankedFrom(tf, df, n, terms, k)
  }

  /** BM25 retrieval served entirely from the artifact: tf from the
    * pruned postings read, df from lexicon partials, (N, avgdl) from
    * meta partials, length norms from the stored docs table — the core
    * ([[SearchOps.bm25From]]) is shared with the corpus-scan face, so
    * scores are bit-equal and the oracle unchanged. Cross-table
    * consistency: [[searchRanked]]'s snapshot-at-construction contract
    * applies identically (four tables, one construction, one
    * generation).
    */
  def searchBm25(
      spark: SparkSession,
      prefix: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    val tf = SearchOps.tfFrom(IndexCatalog.readLive(spark, s"${prefix}_postings"), terms)
    val df = spark
      .table(s"${prefix}_lexicon")
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term"))
      .agg(sum(col("df")).as("df"))
    val stats = spark
      .table(s"${prefix}_meta")
      .agg(sum(col("n_docs")).as("n"), sum(col("n_tokens")).as("total_dl"))
    SearchOps.bm25From(
      tf, df, stats, IndexCatalog.readLive(spark, s"${prefix}_docs"), terms, k, k1, b)
  }
}

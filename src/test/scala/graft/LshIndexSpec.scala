package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, LshIndexOps}

/** The persisted LSH index artifact (LshIndexOps): pairs computed from
  * the stored bucketed tables must be IDENTICAL to the single-pass
  * operator's, the candidate self-join must read the bucketed band table
  * without any exchange, and incremental dedup against the index must
  * flag a planted near-duplicate without touching stored text.
  */
class LshIndexSpec extends SparkSpec {

  private val N = 3
  private val K = 32
  private val Bands = 8
  private val Threshold = 0.8
  private val Prefix = "lshix"

  private def buildOnce(): Unit =
    if (!spark.catalog.tableExists(s"${Prefix}_bands")) {
      LshIndexOps.writeIndex(
        Tables.documents(spark, Sf), N, K, Bands, buckets = 4, prefix = Prefix,
      )
    }

  test("near-dup pairs from the stored index equal the single-pass operator's") {
    buildOnce()
    val fromIndex = LshIndexOps.nearDupPairs(spark, Prefix, Threshold)
    val singlePass = DedupOps.minhashLshPairs(Tables.documents(spark, Sf), N, K, Bands, Threshold)
    assert(fromIndex.count() > 0, "test corpus should contain near-dups")
    assert(
      fromIndex.exceptAll(singlePass).isEmpty && singlePass.exceptAll(fromIndex).isEmpty,
      "index-derived pairs must match the single-pass pipeline",
    )
  }

  test("the candidate self-join over the bucketed band table is exchange-free") {
    buildOnce()
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Exchange elision is a static EnsureRequirements property; AQE off
    // so executedPlan is the final physical tree, not an adaptive shell.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // The raw self-join (before the distinct, whose shuffle is its own
      // stage and legitimately present).
      val bandsDf = spark.table(s"${Prefix}_bands")
      val joined = bandsDf
        .as("x")
        .join(
          bandsDf.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id"),
        )
      assert(joined.count() > 0)
      // The scan's HashPartitioning(band_idx, band_key) is exactly the
      // join's required clustering on both sides, so EnsureRequirements
      // must not insert any exchange below the join.
      val plan = joined.queryExecution.executedPlan.toString
      assert(
        plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join over the band table:\n$plan",
      )
      assert(!plan.contains("Exchange"), s"bucketed band self-join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
  }

  test("streaming dedup flags dups against index + earlier arrivals and grows the index with keepers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val prefix = "lshstream"
    Seq(s"${prefix}_docs", s"${prefix}_bands").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val cut = docs(docs.length / 2)._1
    val (indexed, streamed) = docs.partition(_._1 < cut)
    LshIndexOps.writeIndex(
      indexed.toSeq.toDF("doc_id", "text"), N, K, Bands, buckets = 4, prefix = prefix)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.Buffer[(Long, Long, Double)]()
    val ckpt = java.nio.file.Files.createTempDirectory("lsh_stream").toFile.getAbsolutePath
    val q = LshIndexOps.streamingDedup(
      spark, prefix, in.toDF().toDF("doc_id", "text"), N, K, Bands, buckets = 4,
      threshold = Threshold, checkpoint = ckpt,
      onDups = (d, _) => collected ++= d.as[(Long, Long, Double)].collect(),
    )
    // Three arrival waves, ascending doc_id.
    val waves = streamed.grouped(streamed.length / 3 + 1).toSeq
    try waves.foreach { w => in.addData(w.toSeq); q.processAllAvailable() }
    finally q.stop()
    // Independent expectation: greedy simulation of the documented match
    // rule over the single-pass operator's pair set (itself pinned by
    // its own DuckDB oracle).
    val pairs = DedupOps
      .minhashLshPairs(Tables.documents(spark, Sf), N, K, Bands, Threshold)
      .as[(Long, Long, Double)].collect() // doc_a < doc_b
    val wave = streamed.zipWithIndex.flatMap { case ((id, _), i) =>
      Some(id -> waves.indexWhere(_.exists(_._1 == id)))
    }.toMap
    val kept = scala.collection.mutable.Set(indexed.map(_._1): _*)
    val expected = scala.collection.mutable.Buffer[(Long, Long, Double)]()
    streamed.map(_._1).foreach { x =>
      val rows = pairs.collect {
        case (a, b, j) if b == x && (wave.get(a) match {
              case None => kept.contains(a) // indexed corpus: keepers only
              case Some(wa) if wa < wave(x) => kept.contains(a) // earlier wave: keepers only
              case Some(wa) => wa == wave(x) // same wave: any lower id
            }) => (x, a, j)
      }
      if (rows.isEmpty) kept += x else expected ++= rows
    }
    assert(collected.nonEmpty, "stream should observe near-dups")
    assert(collected.toSet == expected.toSet,
      s"stream dups mismatch:\n got ${collected.sorted.mkString(", ")}\n exp ${expected.sorted.mkString(", ")}")
    // The index grew by exactly the kept streamed docs.
    val storedIds = spark.table(s"${prefix}_docs").select("doc_id").as[Long].collect().toSet
    assert(storedIds == kept.toSet, "index must contain exactly the keepers")
  }

  test("crash between bands and docs appends is repaired on replay: keepers keep their bands") {
    import spark.implicits._
    val prefix = "lshcrash"
    Seq(s"${prefix}_docs", s"${prefix}_bands", s"${prefix}_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val cut = docs(docs.length / 2)._1
    val (indexed, streamed) = docs.partition(_._1 < cut)
    LshIndexOps.writeIndex(
      indexed.toSeq.toDF("doc_id", "text"), N, K, Bands, buckets = 4, prefix = prefix)
    val batch = streamed.toSeq.toDF("doc_id", "text")
    // The kill: the keepers' bands land, the docs membership rows do
    // not. Under the OLD docs-first order the mirror-image crash left
    // keepers in docs with no bands — permanently invisible to every
    // future candidate join, and unrepairable because the kept
    // anti-join hid them.
    val crash = intercept[IllegalStateException] {
      LshIndexOps.dedupBatchAndGrow(
        spark, prefix, batch, N, K, Bands, buckets = 4, threshold = Threshold,
        crashAfter = "bands")
    }
    assert(crash.getMessage.contains("bands"))
    val bandsAfterCrash = spark.table(s"${prefix}_bands").count()
    assert(spark.table(s"${prefix}_batches").filter(col("phase") === "commit").isEmpty)
    // Replay the same batch: intent-without-commit → presence-guarded
    // repair. Bands must not double; docs must land; dups re-emitted
    // identically (keepers never verify against each other, so their
    // own stored bands add nothing).
    val replayDups = LshIndexOps.dedupBatchAndGrow(
      spark, prefix, batch, N, K, Bands, buckets = 4, threshold = Threshold)
      .as[(Long, Long, Double)].collect().toSet
    assert(spark.table(s"${prefix}_bands").count() == bandsAfterCrash,
      "repair must not re-append the bands that survived the crash")
    assert(!replayDups.exists(d => d._1 == d._2), "no self-dups on the repair replay")
    // The repaired index equals a clean uninterrupted build+grow.
    val cleanPrefix = "lshcrashref"
    Seq(s"${cleanPrefix}_docs", s"${cleanPrefix}_bands", s"${cleanPrefix}_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    LshIndexOps.writeIndex(
      indexed.toSeq.toDF("doc_id", "text"), N, K, Bands, buckets = 4, prefix = cleanPrefix)
    val cleanDups = LshIndexOps.dedupBatchAndGrow(
      spark, cleanPrefix, batch, N, K, Bands, buckets = 4, threshold = Threshold)
      .as[(Long, Long, Double)].collect().toSet
    assert(replayDups == cleanDups, "replayed dups must equal the uninterrupted run's")
    val repairedPairs = LshIndexOps.nearDupPairs(spark, prefix, Threshold)
    val cleanPairs = LshIndexOps.nearDupPairs(spark, cleanPrefix, Threshold)
    assert(
      repairedPairs.exceptAll(cleanPairs).isEmpty && cleanPairs.exceptAll(repairedPairs).isEmpty,
      "repaired index must serve pairs identical to the uninterrupted run")
    // A further replay of the committed batch is a no-op on the store.
    val done = spark.table(s"${prefix}_bands").count()
    LshIndexOps.dedupBatchAndGrow(
      spark, prefix, batch, N, K, Bands, buckets = 4, threshold = Threshold)
    assert(spark.table(s"${prefix}_bands").count() == done)
  }

  test("text crash between meta and docs appends is repaired on replay without doubling meta") {
    // The text twin of MediaIndexSpec's crash-after-meta test: bands
    // and meta landed, the docs membership rows did not — the replay
    // must presence-probe meta (not re-append it) and complete docs,
    // converging to the uninterrupted run.
    import spark.implicits._
    val prefix = "lshcrashmeta"
    Seq(s"${prefix}_docs", s"${prefix}_bands", s"${prefix}_meta", s"${prefix}_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val all = Tables.documents(spark, Sf).select("doc_id", "text")
    val stored = all.filter(col("doc_id") % 5 =!= 0)
    val batch = all.filter(col("doc_id") % 5 === 0)
    LshIndexOps.writeIndex(stored, N, K, Bands, buckets = 4, prefix = prefix)
    LshIndexOps.writeMetaTable(stored, buckets = 4, prefix = prefix)
    intercept[IllegalStateException] {
      LshIndexOps.dedupBatchAndGrow(
        spark, prefix, batch, N, K, Bands, buckets = 4, threshold = Threshold,
        crashAfter = "meta")
    }
    val metaAfterCrash = spark.table(s"${prefix}_meta").count()
    assert(spark.table(s"${prefix}_batches").filter(col("phase") === "commit").isEmpty)
    LshIndexOps.dedupBatchAndGrow(
      spark, prefix, batch, N, K, Bands, buckets = 4, threshold = Threshold)
    assert(spark.table(s"${prefix}_meta").count() == metaAfterCrash,
      "repair must not re-append the meta rows that survived the crash")
    assert(!spark.table(s"${prefix}_batches").filter(col("phase") === "commit").isEmpty)
    // Every admitted doc carries exactly one meta row, and the repaired
    // meta equals an uninterrupted run's.
    val docIds = spark.table(s"${prefix}_docs").select("doc_id")
    val metaIds = spark.table(s"${prefix}_meta").select("doc_id")
    assert(docIds.exceptAll(metaIds).isEmpty, "every member must carry a meta row")
    assert(metaIds.count() == metaIds.distinct().count(), "meta rows must be unique per doc")
    val cleanPrefix = "lshcrashmetaref"
    Seq(s"${cleanPrefix}_docs", s"${cleanPrefix}_bands", s"${cleanPrefix}_meta",
      s"${cleanPrefix}_batches")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    LshIndexOps.writeIndex(stored, N, K, Bands, buckets = 4, prefix = cleanPrefix)
    LshIndexOps.writeMetaTable(stored, buckets = 4, prefix = cleanPrefix)
    LshIndexOps.dedupBatchAndGrow(
      spark, cleanPrefix, batch, N, K, Bands, buckets = 4, threshold = Threshold)
    val repaired = spark.table(s"${prefix}_meta")
    val clean = spark.table(s"${cleanPrefix}_meta")
    assert(repaired.exceptAll(clean).isEmpty && clean.exceptAll(repaired).isEmpty,
      "repaired meta must equal the uninterrupted run's — exactly-once under crash/replay")
  }

  test("streaming dedup restart: replayed batch adds no keepers twice, no self-dups, converges to the uninterrupted run") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, Sf).select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1)
    val cut = docs(docs.length / 2)._1
    val (indexed, streamed) = docs.partition(_._1 < cut)
    val waves = streamed.grouped(streamed.length / 3 + 1).toSeq

    def runStream(
        prefix: String,
        in: MemoryStream[(Long, String)],
        ckpt: String,
        collected: scala.collection.mutable.Buffer[(Long, Long, Double)],
    ) = {
      if (!spark.catalog.tableExists(s"${prefix}_docs")) {
        LshIndexOps.writeIndex(
          indexed.toSeq.toDF("doc_id", "text"), N, K, Bands, buckets = 4, prefix = prefix)
      }
      LshIndexOps.streamingDedup(
        spark, prefix, in.toDF().toDF("doc_id", "text"), N, K, Bands, buckets = 4,
        threshold = Threshold, checkpoint = ckpt,
        onDups = (d, _) => collected ++= d.as[(Long, Long, Double)].collect(),
      )
    }

    // Reference: the uninterrupted run.
    Seq("lshrref", "lshrcut").foreach(p =>
      Seq(s"${p}_docs", s"${p}_bands").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t")))
    val refDups = scala.collection.mutable.Buffer[(Long, Long, Double)]()
    val inRef = MemoryStream[(Long, String)]
    val ckptRef = java.nio.file.Files.createTempDirectory("lsh_restart_ref").toFile.getAbsolutePath
    val qRef = runStream("lshrref", inRef, ckptRef, refDups)
    try waves.foreach { w => inRef.addData(w.toSeq); qRef.processAllAvailable() }
    finally qRef.stop()

    // Interrupted run: crash in the window where batch 1's table appends
    // committed but its streaming checkpoint commit was lost — the worst
    // case for the "index as state" design, forcing a full replay of a
    // batch whose side effects already landed.
    val cutDups = scala.collection.mutable.Buffer[(Long, Long, Double)]()
    val in = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("lsh_restart_cut").toFile.getAbsolutePath
    val q1 = runStream("lshrcut", in, ckpt, cutDups)
    try {
      in.addData(waves(0).toSeq); q1.processAllAvailable()
      in.addData(waves(1).toSeq); q1.processAllAvailable()
    } finally { q1.stop(); q1.awaitTermination() }
    val commits = new java.io.File(ckpt, "commits")
      .listFiles().filter(_.getName.forall(_.isDigit))
    assert(commits.length == 2, s"expected two committed batches, got ${commits.length}")
    val lastCommit = commits.maxBy(_.getName.toInt)
    // Hadoop's local ChecksumFileSystem keeps a .N.crc sidecar; leaving
    // it behind makes the replay's atomic rename fail as already-exists.
    new java.io.File(lastCommit.getParentFile, s".${lastCommit.getName}.crc").delete()
    assert(lastCommit.delete())
    val q2 = runStream("lshrcut", in, ckpt, cutDups)
    try {
      q2.processAllAvailable() // replays wave 1 against its own committed appends
      in.addData(waves(2).toSeq); q2.processAllAvailable()
    } finally q2.stop()

    val refKept = spark.table("lshrref_docs").select("doc_id").as[Long].collect().sorted.toSeq
    val cutKept = spark.table("lshrcut_docs").select("doc_id").as[Long].collect().sorted.toSeq
    assert(cutKept.length == cutKept.distinct.length, "replay must not double-insert keepers")
    assert(cutKept == refKept, "restarted run must converge to the uninterrupted keeper set")
    assert(!cutDups.exists(r => r._1 == r._2), "replay must not emit self-dup rows")
    assert(cutDups.toSet == refDups.toSet,
      "dup SET must equal the uninterrupted run's (at-least-once multiplicity aside)")
  }

  test("rebucket preserves pair results, stays exchange-free, and the cost dial triggers correctly") {
    import spark.implicits._
    val prefix = "lshrebkt"
    Seq(s"${prefix}_docs", s"${prefix}_bands").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    LshIndexOps.writeIndex(
      Tables.documents(spark, Sf), N, K, Bands, buckets = 4, prefix = prefix)
    def pairs() = LshIndexOps.nearDupPairs(spark, prefix, Threshold)
      .as[(Long, Long, Double)].collect().toSeq
    def numBuckets() = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(s"${prefix}_bands"))
      .bucketSpec.map(_.numBuckets).getOrElse(0)
    val before = pairs()
    assert(before.nonEmpty && numBuckets() == 4)

    // Within budget: no rewrite.
    assert(LshIndexOps.rebucketIfNeeded(spark, prefix, Long.MaxValue).isEmpty)
    assert(numBuckets() == 4)
    // A 1-candidate-per-bucket budget forces a rewrite at more buckets.
    val grown = LshIndexOps.rebucketIfNeeded(spark, prefix, 1L, maxBuckets = 16)
    assert(grown.contains(16), s"expected the maxBuckets cap, got $grown")
    assert(numBuckets() == 16)
    assert(pairs() == before, "physical rebucketing must not change pair results")

    // The candidate self-join stays exchange-free at the new count.
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val bandsDf = spark.table(s"${prefix}_bands")
      val joined = bandsDf.as("x").join(
        bandsDf.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"),
      )
      assert(joined.count() > 0)
      assert(!joined.queryExecution.executedPlan.toString.contains("Exchange"),
        "rebucketed band self-join must not shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
  }

  test("grow-everything text ingest keeps the cluster artifact bit-equal to a from-scratch rebuild") {
    import spark.implicits._
    val pre = "lshixgrow"
    val ref = "lshixgrowref"
    val tables = Seq("_docs", "_bands", "_clusters", "_batches")
    Seq(pre, ref).foreach(p => tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $p$t")))
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cut = ids(ids.length / 2)
    val seed = docs.filter(col("doc_id") < cut)
    val rest = docs.filter(col("doc_id") >= cut)
      .as[(Long, String)].collect().sortBy(_._1)
    val waves = rest.grouped(rest.length / 2 + 1).toSeq.map(_.toSeq)
    LshIndexOps.writeIndex(seed, N, K, Bands, buckets = 4, prefix = pre)
    LshIndexOps.writeClusters(spark, pre, Threshold, buckets = 4)
    waves.foreach { w =>
      LshIndexOps.ingestBatchAndMaintain(
        spark, pre, w.toDF("doc_id", "text"), N, K, Bands, buckets = 4,
        threshold = Threshold)
    }
    LshIndexOps.writeIndex(docs, N, K, Bands, buckets = 4, prefix = ref)
    LshIndexOps.writeClusters(spark, ref, Threshold, buckets = 4)
    Seq("_docs", "_clusters").foreach { t =>
      val grown = spark.table(s"$pre$t")
      val rebuilt = spark.table(s"$ref$t")
      assert(rebuilt.count() > 0, s"$t rebuild is empty")
      assert(
        grown.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(grown).isEmpty,
        s"incrementally maintained $t differs from the from-scratch rebuild")
    }
    // Clusters must span the split: at least one component joining a
    // seed doc to an ingested doc, or the maintenance path was not
    // genuinely exercised.
    val crossSplit = spark.table(s"${pre}_clusters")
      .groupBy(col("component"))
      .agg(
        sum(when(col("doc_id") < cut, 1L).otherwise(0L)).as("n_seed"),
        sum(when(col("doc_id") >= cut, 1L).otherwise(0L)).as("n_new"))
      .filter(col("n_seed") > 0 && col("n_new") > 0)
    assert(!crossSplit.isEmpty, "expected at least one cross-split cluster")
    // Replaying the last wave is a no-op on every artifact.
    val before = Seq("_docs", "_clusters")
      .map(t => t -> spark.table(s"$pre$t").collect().toSeq).toMap
    LshIndexOps.ingestBatchAndMaintain(
      spark, pre, waves.last.toDF("doc_id", "text"), N, K, Bands, buckets = 4,
      threshold = Threshold)
    before.foreach { case (t, rows0) =>
      assert(spark.table(s"$pre$t").collect().toSeq.sortBy(_.toString) ==
        rows0.sortBy(_.toString), s"replaying a committed batch must not change $t")
    }
  }

  test("a swap crashed between renames is recovered by the next ingest, not silently skipped") {
    import spark.implicits._
    val pre = "lshixdangle"
    val ref = "lshixdangleref"
    val tables = Seq("_docs", "_bands", "_clusters", "_clusters_old", "_batches")
    Seq(pre, ref).foreach(p => tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $p$t")))
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val seed = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    LshIndexOps.writeIndex(seed, N, K, Bands, buckets = 4, prefix = pre)
    LshIndexOps.writeClusters(spark, pre, Threshold, buckets = 4)
    // Inject the crash-between-renames state a prior maintenance swap
    // can leave: `_clusters` gone, `_clusters_old` the sole copy. The
    // old tableExists guard read this as "no cluster artifact", skipped
    // the merge, and still committed the batch — leaving the cluster
    // read face permanently stale.
    spark.sql(s"ALTER TABLE ${pre}_clusters RENAME TO ${pre}_clusters_old")
    LshIndexOps.ingestBatchAndMaintain(
      spark, pre, batch.toDF("doc_id", "text"), N, K, Bands, buckets = 4,
      threshold = Threshold)
    assert(spark.catalog.tableExists(s"${pre}_clusters"),
      "ingest must recover the dangling _old before its exists guard")
    assert(!spark.catalog.tableExists(s"${pre}_clusters_old"))
    // And the recovered-then-merged clusters equal the from-scratch truth.
    LshIndexOps.writeIndex(docs, N, K, Bands, buckets = 4, prefix = ref)
    LshIndexOps.writeClusters(spark, ref, Threshold, buckets = 4)
    val grown = spark.table(s"${pre}_clusters")
    val rebuilt = spark.table(s"${ref}_clusters")
    assert(rebuilt.count() > 0)
    assert(grown.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(grown).isEmpty,
      "clusters maintained across the recovered swap must equal the rebuild")
  }

  test("incrementally admitted keepers are visible to the text exact-dup digest probe") {
    import spark.implicits._
    val pre = "lshixmetagrow"
    Seq("_docs", "_bands", "_meta", "_batches")
      .foreach(sfx => spark.sql(s"DROP TABLE IF EXISTS $pre$sfx"))
    val docs = Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val stored = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    LshIndexOps.writeIndex(stored, N, K, Bands, buckets = 4, prefix = pre)
    LshIndexOps.writeMetaTable(stored, buckets = 4, prefix = pre)
    val metaBefore = spark.table(s"${pre}_meta").count()
    LshIndexOps.dedupBatchAndGrow(
      spark, pre, batch, N, K, Bands, buckets = 4, threshold = Threshold)
    val keptIds = spark.table(s"${pre}_docs").select("doc_id").as[Long].collect().toSet --
      stored.select("doc_id").as[Long].collect().toSet
    assert(keptIds.nonEmpty)
    assert(spark.table(s"${pre}_meta").count() == metaBefore + keptIds.size,
      "admitted keepers' meta rows must ride the same commit")
    // Replay an EXACT copy of an admitted doc (same text, fresh id):
    // the digest probe labels it exact_dup with the admitted doc_id —
    // not near_dup at jaccard 1.
    val admitted = keptIds.min
    val text = batch.filter(col("doc_id") === admitted).select("text").as[String].head()
    val maxId = docs.agg(max(col("doc_id"))).as[Long].head()
    val copy = Seq((maxId + 1L, text)).toDF("doc_id", "text")
    val verdict = LshIndexOps.uploadVerdict(
      spark, pre, copy, N, K, Bands, Threshold, minTok = 20L)
      .as[(Long, String, java.lang.Long)].collect().toSeq
    assert(verdict == Seq((maxId + 1L, "exact_dup", java.lang.Long.valueOf(admitted))),
      s"expected exact_dup of $admitted, got $verdict")
  }

  test("incremental dedup against the index flags a planted near-duplicate") {
    buildOnce()
    import spark.implicits._
    // A batch doc whose text IS an indexed doc's text (jaccard 1.0) plus
    // one unrelated doc; ids far above the corpus range.
    val stored = Tables.documents(spark, Sf)
      .orderBy("doc_id").select("doc_id", "text").as[(Long, String)].head()
    val batch = Seq(
      (1000000L, stored._2),
      (1000001L, "zzz qqq xxx completely unrelated nonsense tokens " * 3),
    ).toDF("doc_id", "text")
    val hits = LshIndexOps
      .dedupAgainstIndex(spark, Prefix, batch, N, K, Bands, Threshold)
      .collect()
    assert(hits.exists(r => r.getLong(0) == 1000000L && r.getLong(1) == stored._1),
      s"planted duplicate not flagged: ${hits.mkString(", ")}")
    assert(!hits.exists(r => r.getLong(0) == 1000001L),
      "unrelated batch doc must not be flagged")
  }
}

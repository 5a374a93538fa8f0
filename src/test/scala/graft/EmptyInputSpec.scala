package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Operators must degrade to empty output (not throw) on empty input —
  * the behavior a partition-pruned or fully-filtered scan produces in
  * production.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEvents = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
    .toDF("event_id", "ts", "user_id", "value")

  test("dedup operators on empty input") {
    assert(DedupOps.exactDedup(noDocs).count() == 0)
    assert(DedupOps.jaccardPairs(noDocs, 3, 0.8).count() == 0)
    assert(DedupOps.minhashLshPairs(noDocs, 3, 32, 8, 0.8).count() == 0)
    assert(DedupOps.simhashPairs(noDocs, 32, 4, 3).count() == 0)
  }

  test("text operators on empty input") {
    assert(TextOps.tokenStats(noDocs).count() == 0)
    assert(TextOps.langId(noDocs.withColumn("lang", lit("en"))).count() == 0)
    assert(TextOps.winnow(noDocs, 3, 4).count() == 0)
  }

  test("event operators on empty input") {
    assert(EventOps.accessTrend(noEvents, "2024-01-01", "2024-01-31").count() == 0)
    assert(EventOps.sessionize(noEvents, 30).count() == 0)
    assert(EventOps.window10s(noEvents).count() == 0)
  }

  test("round-5 operators on empty input") {
    assert(TextOps.removeBoilerplate(noDocs, 10, 2).count() == 0)
    assert(TextOps.cdcChunk(noDocs, 8).count() == 0)
    assert(TextOps.qualityBins(noDocs).count() == 0)
    assert(DedupOps.editDistancePairs(noDocs, 3, 32, 8, 6).count() == 0)
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val cbEmpty = SimilarityOps.trainCodebook(noEmb, 1, 64, col("vec_id") < 8, iters = 2)
    assert(cbEmpty.count() == 0)
    assert(SimilarityOps.assignCells(noEmb, cbEmpty).count() == 0)
  }

  test("round-2 operators on empty input") {
    assert(TextOps.repetition(noDocs).count() == 0)
    assert(TextOps.piiScrub(noDocs, col("text")).count() == 0)
    assert(
      TextOps
        .stratifiedHashSample(
          noDocs.withColumn("lang", lit("en")), col("lang"), 10, Seq("en" -> 5),
        )
        .count() == 0,
    )
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupOps.connectedComponents(noPairs).count() == 0)
    assert(DedupOps.connectedComponentsStars(noPairs).count() == 0)
    val noPoints = Seq.empty[(Long, java.sql.Timestamp)].toDF("pid", "p_ts")
    val noIntervals = Seq.empty[(Long, java.sql.Timestamp, java.sql.Timestamp)]
      .toDF("iid", "lo", "hi")
    assert(
      RangeJoinOp
        .rangeJoin(noPoints, noIntervals, col("p_ts"), col("lo"), col("hi"), 86400L)
        .count() == 0,
    )
  }

  test("round-4 operators on empty input") {
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val noCellVecs = Seq.empty[(Long, String, Seq[Float])].toDF("vec_id", "cell", "embedding")
    // kmeansStep with an empty corpus has no seeds either — empty out.
    assert(SimilarityOps.kmeansStep(noVecs, col("vec_id") < 8).count() == 0)
    assert(DedupOps.semanticDedup(noCellVecs, col("cell"), 0.9).count() == 0)
    assert(TextOps.unigramRarity(noDocs).count() == 0)
    assert(TextOps.bpeMergeStep(noDocs, 5).count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(
      DedupOps
        .nearDupAwareSplit(noDocs, DedupOps.connectedComponents(noPairs), 8, 10)
        .count() == 0,
    )
  }

  test("round-6 layout/maintenance operators on empty input") {
    val noKeyed = Seq.empty[(Long, Long)].toDF("ka", "kb")
    assert(LayoutOps.zoneMapLayouts(noKeyed, "ka", "kb", 8, 32, 64L, 127L).count() == 0)
    assert(LayoutOps.curveLayouts(noKeyed, "ka", "kb", 8, 48, 40L, 110L).count() == 0)
    assert(LayoutOps.overlapDepth(
      LayoutOps.curveLayouts(noKeyed, "ka", "kb", 8, 48, 40L, 110L)).count() == 0)
    assert(LayoutOps.withHilbertIndex(noKeyed, "ka", "kb", 8, "h").count() == 0)
    val noFiles = Seq.empty[(String, Long)].toDF("file_key", "bytes")
    assert(LayoutOps.compactionPlan(noFiles, "file_key", "bytes", 100L).count() == 0)
    assert(LayoutOps.deletePlan(noKeyed, "ka", "kb", noKeyed.select(col("ka")), "ka", 8).count() == 0)
    // A bloom audit over nothing is one all-zero stats row, not a crash.
    val stats = BloomOps.bloomSemiJoinStats(noKeyed, "ka", noKeyed, "kb", 1024L).collect()
    assert(stats.length == 1 && stats.head.getAs[Long]("n_probe") == 0L)
  }

  test("round-9 operators on empty input") {
    val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphOps.triangleCounts(noEdges).count() == 0)
    assert(GraphOps.kCorePeel(noEdges, k = 3, rounds = 2).count() == 0)
    val noFlows = Seq.empty[(Long, String, String, Int, Int, java.sql.Timestamp)]
      .toDF("id", "ip_src", "ip_dst", "port_src", "port_dst", "ts")
    assert(NetflowOps.stitchBidirectional(noFlows, "1 hour").count() == 0)
    val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(SimilarityOps.rangeSearch(noEmb, col("vec_id") < 10, 0.5).count() == 0)
    val noLabeled = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(SimilarityOps.knnClassify(noLabeled, col("vec_id") < 10, k = 3).count() == 0)
    val noFan = Seq.empty[(String, String, String, Int)]
      .toDF("day", "ip_src", "ip_dst", "port_dst")
    assert(NetflowOps.fanOutProfile(noFan, scanThreshold = 4).count() == 0)
    val noBeacon = Seq.empty[(Long, String, String, java.sql.Timestamp)]
      .toDF("id", "ip_src", "ip_dst", "ts")
    assert(NetflowOps.beaconProfile(noBeacon, minGaps = 5, cvInv = 5).count() == 0)
  }

  test("late round-9 operators on empty input") {
    assert(TextOps.bpeEncode(noDocs, Seq(("a", "b"))).count() == 0)
    assert(TextOps.lmNextToken(noDocs, k = 5).count() == 0)
    val noSourced = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_chars")
    assert(TextOps.weightedSample(noSourced, k = 5).count() == 0)
    assert(SearchOps.searchNot(noDocs, Seq("a"), Seq("b")).count() == 0)
    val noTyped = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventOps.ewmaSpikes(noTyped).count() == 0)
    assert(EventOps.maxConcurrent(noTyped).count() == 0)
    assert(EventOps.madOutliers(noTyped).count() == 0)
    val noLabeled = Seq.empty[(Long, Array[Float], Long)].toDF("vec_id", "embedding", "label")
    assert(SimilarityOps.linearProbe(noLabeled, 0L, 1L).count() == 0)
    assert(SimilarityOps.centroidSimilarity(noLabeled).count() == 0)
  }

  test("round-13 operators on empty input") {
    val noSourcedDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextOps.bpeTrain(noDocs, rounds = 4).count() == 0)
    assert(TextOps.mixByTemperature(noSourcedDocs, budgetTokens = 100L, buckets = 10).count() == 0)
    assert(TextOps.mixByQuality(noSourcedDocs).count() == 0)
    val noMedia = Seq.empty[(Long, String, Array[Byte])].toDF("doc_id", "media_type", "payload")
    assert(MultimodalOps.nearDupPairs(noMedia, 49, 6, 5, "audio").count() == 0)
    assert(MultimodalOps.videoFrameFingerprints(noMedia, 49).count() == 0)
    assert(MultimodalOps.nearDupPairsVideo(noMedia, 49, 6, 5).count() == 0)
    assert(MultimodalOps.frameMatchPairs(noMedia, 49, 6, 5).count() == 0)
    assert(MultimodalOps.sceneCuts(noMedia, 49, 5).count() == 0)
    assert(MultimodalOps.keyframes(noMedia, 49, 5).count() == 0)
    assert(MultimodalOps.nearDupPairsWHash(noMedia, 49, 48, 6, 5).count() == 0)
    assert(MultimodalOps.nearDupConsensus(noMedia, 49, 6, 5, 5).count() == 0)
    val noLabeled = Seq.empty[(Long, Array[Float], Long)].toDF("vec_id", "embedding", "label")
    assert(SimilarityOps.randomProject(noLabeled, 64, 16).count() == 0)
    assert(DedupOps.semanticContamination(
      noLabeled, 0.4, Seq(Seq(0, 3, 6))).count() == 0)
  }
}

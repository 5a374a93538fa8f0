package graft

import graft.operators.MultimodalOps
import Tables.documents

class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions decode equals the declarative twin on raw (container-less) media") {
    // Raw payloads exercise the unknown-format fallback: both pipelines
    // must agree on the stub formulas.
    val media = MultimodalOps.asMedia(documents(spark, Sf))
    val typed = MultimodalOps.decodeAll(spark, media).toDF()
    val declarative = MultimodalOps.decodeHeaderMeta(media).select(typed.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(typed.count() == 500)
    assert(typed.exceptAll(declarative).isEmpty && declarative.exceptAll(typed).isEmpty)
    // And the fallback IS the documented stub.
    val stub = MultimodalOps.decodeMeta(media).select(typed.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(typed.exceptAll(stub).isEmpty && stub.exceptAll(typed).isEmpty)
  }

  test("general PNG chunk-walk / JPEG marker-scan equals the declarative header parse on encoded media") {
    val media = MultimodalOps.encodeMedia(documents(spark, Sf))
    val typed = MultimodalOps.decodeAll(spark, media).toDF()
    val declarative = MultimodalOps.decodeHeaderMeta(media).select(typed.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(typed.count() == 500)
    assert(typed.exceptAll(declarative).isEmpty && declarative.exceptAll(typed).isEmpty)
  }

  test("header decode reads dimensions from actual container bytes (hand-built PNG and JPEG)") {
    // A 640×480 truecolor PNG IHDR and a 640×480 3-component JFIF JPEG
    // built here byte-by-byte, independently of encodeMedia — the parse
    // must read THESE bytes, not derive anything from lengths.
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val png = hexBytes(
      "89504E470D0A1A0A" + "0000000D" + "49484452" +
        "00000280" + "000001E0" + "08" + "02" + "00" + "00" + "00" + "00000000",
    ) ++ "pixels".getBytes("UTF-8")
    // JPEG with an extra COM segment before SOF0, so the scan must skip
    // a segment the fixed JFIF layout does not have… exercised via the
    // typed parser only (the declarative twin is layout-pinned).
    val jfif = hexBytes(
      "FFD8" + "FFE000104A46494600010100000100010000" +
        "FFC0001108" + "01E0" + "0280" + "03011100021101031101",
    ) ++ "scan".getBytes("UTF-8")
    val jpegWithCom = hexBytes(
      "FFD8" + "FFE000104A46494600010100000100010000" + "FFFE0004ABCD" +
        "FFC0001108" + "01E0" + "0280" + "03011100021101031101",
    ) ++ "scan".getBytes("UTF-8")
    val recs = Seq(
      MultimodalOps.MediaRecord(1L, "image", png),
      MultimodalOps.MediaRecord(2L, "image", jfif),
      MultimodalOps.MediaRecord(3L, "image", jpegWithCom),
    )
    recs.map(MultimodalOps.decodeRecord).foreach { m =>
      assert(m.width == 640L && m.height == 480L && m.channels == 3L && m.n_frames == 1L, m.toString)
    }
    // Declarative parse agrees on the two fixed-layout payloads.
    import spark.implicits._
    val df = recs.take(2).map(r => (r.doc_id, r.media_type, r.payload))
      .toDF("doc_id", "media_type", "payload")
    val out = MultimodalOps.decodeHeaderMeta(df)
      .select("doc_id", "width", "height", "channels")
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(out(1L) == ((640L, 480L, 3L)))
    assert(out(2L) == ((640L, 480L, 3L)))
  }

  test("animated-GIF frame counts are parsed from real image-descriptor bytes (multi-frame)") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // A hand-built 3-frame 320×200 GIF89a, independent of encodeMedia's
    // layout: global color table (2 entries), a NETSCAPE looping
    // extension, and per-frame blocks with a local color table on the
    // middle frame — the walk must skip all of it by structure.
    val frame = "21F90404000A0000" + "2C000000004001C80000" + "02" + "020101" + "00"
    val frameLct = "21F90404000A0000" + "2C000000004001C80080" + "FF000000FF00" + "02" + "020101" + "00"
    val gif = hexBytes(
      "474946383961" + "4001" + "C800" + "80" + "0000" + "FF0000" + "00FF00" +
        "21FF0B4E45545343415045322E30" + "03010000" + "00" +
        frame + frameLct + frame + "3B",
    ) ++ "trailing-stand-in".getBytes("UTF-8")
    val m = MultimodalOps.decodeRecord(MultimodalOps.MediaRecord(7L, "video", gif))
    assert(m.width == 320L && m.height == 200L && m.channels == 3L && m.n_frames == 3L, m.toString)
    // And the corpus videos encode genuinely multi-frame containers the
    // typed walk reads back: every count matches the encoded formula,
    // and multi-frame payloads dominate.
    val media = MultimodalOps.encodeMedia(documents(spark, Sf))
    val videos = MultimodalOps.decodeAll(spark, media).filter(_.media_type == "video").collect()
    assert(videos.nonEmpty)
    assert(videos.count(_.n_frames > 1) > videos.length / 2, "expected mostly multi-frame GIFs")
  }

  test("malformed containers fall back to the stub — never hang, never throw") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val malformed = Seq(
      // PNG signature + chunk whose length field claims 4 GiB (the
      // ADVICE-flagged overflow shape: a negative Int advance).
      hexBytes("89504E470D0A1A0A" + "FFFFFFFF" + "49444154" + "0000"),
      // PNG signature, then truncated mid chunk header.
      hexBytes("89504E470D0A1A0A" + "000000"),
      // GIF header whose first block introducer is garbage (desync).
      hexBytes("474946383961" + "4001" + "C800" + "00" + "0000" + "7A"),
      // GIF with an image descriptor but truncated before its data.
      hexBytes("474946383961" + "4001" + "C800" + "00" + "0000" + "2C00000000"),
      // GIF extension whose sub-block chain runs off the end.
      hexBytes("474946383961" + "4001" + "C800" + "00" + "0000" + "21FF0BFF"),
      // JPEG SOI then a segment length pointing past the payload.
      hexBytes("FFD8" + "FFE0FFFF"),
      // Empty and single-byte payloads.
      Array.empty[Byte],
      Array(0x89.toByte),
    )
    malformed.zipWithIndex.foreach { case (b, i) =>
      val r = MultimodalOps.MediaRecord(i.toLong, "image", b)
      // Must terminate and equal the documented stub fallback.
      assert(MultimodalOps.decodeRecord(r) == MultimodalOps.stubDecode(r), s"payload $i")
    }
  }

  test("frame sampling emits ceil(n_frames/step) rows per video") {
    import spark.implicits._
    val media = MultimodalOps.encodeMedia(documents(spark, Sf))
    val frames = MultimodalOps.sampleFrames(media, step = 4)
      .groupBy("doc_id").count()
      .join(MultimodalOps.decodeHeaderMeta(media).filter($"media_type" === "video"), "doc_id")
      .select("count", "n_frames").as[(Long, Long)].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (n, f) => assert(n == (f + 3) / 4) }
  }

  test("decodeContent recovers the exact pre-wrap text through every container type") {
    import spark.implicits._
    val media = MultimodalOps.encodeMedia(documents(spark, Sf))
    val roundTrip = MultimodalOps.decodeContent(media)
      .join(documents(spark, Sf), "doc_id")
      .select($"media_type", ($"content" === $"text").as("ok"))
      .groupBy("media_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.when(!org.apache.spark.sql.functions.col("ok"), 1)).as("bad"))
      .as[(String, Long)].collect().toMap
    // All three container families present, every row recovered exactly.
    assert(roundTrip.keySet == Set("image", "audio", "video"))
    assert(roundTrip.values.forall(_ == 0L), roundTrip.toString)
  }

  test("perceptual near-dup catches re-encoded and lightly-edited copies via a banded equi-join") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running " * 4
    val edited = base.updated(40, 'x') // same length, one char → ≤2 gradient bits
    val docs = Seq(
      0L -> base, // image, PNG container (doc_id/3 even)
      3L -> base, // image, JPEG container — a RE-ENCODED copy of doc 0
      6L -> edited, // image, PNG — a lightly-edited copy
      9L -> "completely unrelated payload with different words entirely and no shared phrasing at all",
      1L -> base, // audio — identical content but not an image: excluded
      2L -> base, // video — excluded
    ).toDF("doc_id", "text")
    val pairs = MultimodalOps.nearDupPairs(
      MultimodalOps.encodeMedia(docs), regions = 49, blockBands = 6, maxHamming = 5)
    val got = pairs.as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    // The re-encoded copy: different container bytes, identical content
    // → hamming 0 (mm_exact_dedup would MISS it — payload md5 differs).
    assert(got.get((0L, 3L)).contains(0), got.toString)
    // The edited copy sits within the hamming budget of both originals.
    assert(got.contains((0L, 6L)) && got((0L, 6L)) <= 5, got.toString)
    assert(got.contains((3L, 6L)), got.toString)
    // The unrelated document matches nothing; non-image rows never pair.
    assert(got.keys.forall { case (a, b) => !Set(a, b).exists(Set(1L, 2L, 9L)) }, got.toString)
    // Candidate generation is the pigeonhole equi-join — never a
    // cartesian/nested-loop pass over the corpus.
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("scene cuts segment a hand-built video at the designed shot boundary") {
    import spark.implicits._
    // 211 chars → F = 211 % 16 + 1 = 4 frames of fl = 52 chars (3 pad
    // chars dropped). Frames must be LONGER than the 49 dHash regions:
    // shorter frames leave most regions empty and the gradient encodes
    // occupancy, not content (any ascending and descending 16-char
    // strings fingerprint identically). 52 monotonically ascending
    // codes → gradient bits ~0; the reversed block → ~1: a near-total
    // flip. Three identical blocks, then the inverted one.
    val shotA = (65 until 117).map(_.toChar).mkString // 52 ascending codes
    val shotB = shotA.reverse
    val docs = Seq(2L -> (shotA * 3 + shotB + "xyz")).toDF("doc_id", "text")
    val media = MultimodalOps.encodeMedia(docs)
    val cuts = MultimodalOps.sceneCuts(media, regions = 49, sameSceneHamming = 5)
      .as[(Long, Int, Option[Int], Long)].collect()
    assert(cuts.map(c => (c._2, c._4)).toSeq == Seq(0 -> 0L, 1 -> 0L, 2 -> 0L, 3 -> 1L),
      cuts.mkString(", "))
    assert(cuts(0)._3.isEmpty, "frame 0 has no previous frame")
    assert(cuts(1)._3.contains(0) && cuts(2)._3.contains(0), "held shot → delta 0")
    assert(cuts(3)._3.exists(_ > 5), s"inverted gradient must cross the budget: ${cuts(3)}")
    val kf = MultimodalOps.keyframes(media, regions = 49, sameSceneHamming = 5)
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(kf == Seq((2L, 0L, 0, 3L), (2L, 1L, 3, 1L)), kf.mkString(", "))
    // The per-frame window is partitioned by doc_id — never corpus-wide.
    val plan = MultimodalOps.sceneCuts(media, 49, 5).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("degenerate videos (content shorter than frame count) are dropped, matching the oracle") {
    import spark.implicits._
    // doc 2: 2 chars → F = 2 % 16 + 1 = 3 frames, fl = 2/3 = 0 — every
    // slice would be empty; the operator must drop the whole video (the
    // oracle's `WHERE fl > 0` does), or all such videos pair with each
    // other at hamming 0 on content-free all-zero fingerprints.
    // doc 5: 17 chars → F = 2, fl = 8 — a real video, kept.
    val docs = Seq(2L -> "ab", 5L -> ("q" * 17)).toDF("doc_id", "text")
    val media = MultimodalOps.encodeMedia(docs)
    val fps = MultimodalOps.videoFrameFingerprints(media, regions = 49)
      .as[(Long, Int, Long)].collect()
    assert(fps.forall(_._1 == 5L), s"flen=0 video must yield no frames: ${fps.mkString(", ")}")
    assert(fps.length == 2)
    // Two degenerate videos must NOT pair: without the cut both would
    // fingerprint to dhash 0 per frame and match at hamming 0.
    val degen = Seq(2L -> "ab", 5L -> "cd").toDF("doc_id", "text")
    assert(MultimodalOps.nearDupPairsVideo(
      MultimodalOps.encodeMedia(degen), 49, 6, 5).count() == 0)
    // The video curation pass rejects them as no_content (never a
    // silent keep, never a content-free dup) while a real video keeps.
    val cur = MultimodalOps.curationPipelineVideo(
      MultimodalOps.encodeMedia(Seq(2L -> "ab", 5L -> ("q" * 17)).toDF("doc_id", "text")),
      regions = 49, blockBands = 6, maxHamming = 5)
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(cur == Seq((2L, "no_content", None), (5L, "keep", None)), cur.mkString(", "))
  }

  test("two-family consensus confirms re-encoded copies and carries every dHash pair") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running " * 4
    val edited = base.updated(40, 'x')
    val docs = Seq(
      0L -> base, // PNG
      3L -> base, // JPEG — re-encoded copy of doc 0
      6L -> edited, // lightly edited
      9L -> "completely unrelated payload with different words entirely and no shared phrasing at all",
    ).toDF("doc_id", "text")
    val media = MultimodalOps.encodeMedia(docs)
    val rows = MultimodalOps
      .nearDupConsensus(media, regions = 49, blockBands = 6, maxHamming = 5, whashBudget = 5)
      .as[(Long, Long, Int, Int, Boolean)].collect()
    val byPair = rows.map(r => (r._1, r._2) -> r).toMap
    // Identical content through two DIFFERENT containers: both families
    // agree at hamming 0 → confirmed.
    assert(byPair((0L, 3L))._3 == 0 && byPair((0L, 3L))._4 == 0 && byPair((0L, 3L))._5)
    // The consensus output carries exactly the dHash pair set (the
    // second family verifies, it never adds or drops pairs).
    val dhashPairs = MultimodalOps.nearDupPairs(media, 49, 6, 5)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(rows.map(r => (r._1, r._2)).toSet == dhashPairs)
  }

  test("curation pipeline rejects by the first failing stage in priority order") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and keeps on running " * 4
    val docs = Seq(
      0L -> base, // PNG, exact keeper AND component keeper → keep
      3L -> base, // JPEG, same content, different bytes → near_dup of 0
      6L -> base, // PNG again: byte-identical to doc 0 → exact_dup beats near_dup
      9L -> "ab", // unique, header dims 66×126 = 8316 px → too_small
      12L -> ("completely unrelated payload with different words entirely " * 5), // keep
    ).toDF("doc_id", "text")
    val r = MultimodalOps.curationPipeline(
      MultimodalOps.encodeMedia(docs),
      regions = 49, blockBands = 6, maxHamming = 5, minPixels = 16384L)
      .as[(Long, String, Option[Long])].collect().toSeq
    assert(r == Seq(
      (0L, "keep", None), // a keeper is never its own dup
      (3L, "near_dup", Some(0L)),
      (6L, "exact_dup", Some(0L)), // byte-identity outranks the perceptual verdict
      (9L, "too_small", None),
      (12L, "keep", None),
    ), r.mkString(", "))
  }

  test("text↔media screen flags documents duplicating held media, never the item itself") {
    import spark.implicits._
    val heldText = "the protected artwork description shared verbatim by a scraped document"
    val docs = Seq(
      0L -> heldText, // image (0%3), held (0%10) — the blocklist entry
      7L -> heldText, // a document whose text duplicates the held payload
      8L -> "an unrelated document about something else entirely",
    ).toDF("doc_id", "text")
    val r = MultimodalOps.textMediaScreen(
      docs, threshold = 0.999, bands = Seq(Seq(0, 1, 2, 3), Seq(4, 5, 6, 7)), blockMod = 10)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    assert(r.map(x => (x._1, x._2, x._4)) == Seq(
      (0L, 0L, false), // self-pair excluded: an item never flags itself
      (7L, 1L, true), // exact-content duplicate of the held media
      (8L, 0L, false),
    ), r.mkString(", "))
    assert(r(1)._3 > 0.999, s"duplicate text must sit at cosine ~1: ${r(1)}")
    // The held side broadcasts: the corpus is never shuffled for the join.
    val plan = MultimodalOps.textMediaScreen(
      docs, 0.999, Seq(Seq(0, 1, 2, 3), Seq(4, 5, 6, 7)), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("cross-modal frame match finds the video frame that reproduces a known image") {
    import spark.implicits._
    // 272 chars (a multiple of 16) → the video wraps it as a SINGLE
    // frame (F = L % 16 + 1 = 1), so frame 0 decodes to exactly the
    // image's content.
    val base = ("the quick brown fox jumps over the lazy dog and keeps on running " * 4)
      .padTo(272, 'z')
    val docs = Seq(
      0L -> base, // image (doc_id % 3 == 0): the known/blocklisted still
      2L -> base, // video (doc_id % 3 == 2): single frame reproducing it
      5L -> ("entirely different footage with no overlap in phrasing at all whatsoever " * 4)
        .padTo(304, 'q'), // video, unrelated — must not match
      1L -> base, // audio: same content, but frame matching is image×video only
    ).toDF("doc_id", "text")
    val pairs = MultimodalOps.frameMatchPairs(
      MultimodalOps.encodeMedia(docs), regions = 49, blockBands = 6, maxHamming = 5)
    val got = pairs.as[(Long, Long, Int)].collect()
      .map { case (i, v, h) => (i, v) -> h }.toMap
    // The reproducing frame verifies at hamming 0 through two DIFFERENT
    // container encodings (PNG image vs GIF frame slice).
    assert(got.get((0L, 2L)).contains(0), got.toString)
    // Strictly cross-modal: left ids are images, right ids are videos,
    // and the unrelated video pairs with nothing.
    assert(got.keys.forall { case (i, v) => i % 3 == 0 && v % 3 == 2 }, got.toString)
    assert(!got.keySet.exists(_._2 == 5L), got.toString)
    // Candidates come from the pigeonhole equi-join, never all-pairs.
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  implicit private class Tup3Map(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
  }
}

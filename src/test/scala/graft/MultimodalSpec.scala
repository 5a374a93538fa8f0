package graft

import graft.operators.MultimodalOps
import Tables.documents

class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions decode equals the declarative twin on testdata") {
    val media = MultimodalOps.asMedia(documents(spark, Sf))
    val typed = MultimodalOps.decodeAll(spark, media).toDF()
    val declarative = MultimodalOps.decodeMeta(media).select(typed.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(typed.count() == 500)
    assert(typed.exceptAll(declarative).isEmpty && declarative.exceptAll(typed).isEmpty)
  }

  test("frame sampling emits ceil(n_frames/step) rows per video") {
    import spark.implicits._
    val media = MultimodalOps.asMedia(documents(spark, Sf))
    val frames = MultimodalOps.sampleFrames(media, step = 4)
      .groupBy("doc_id").count()
      .join(MultimodalOps.decodeMeta(media).filter($"media_type" === "video"), "doc_id")
      .select("count", "n_frames").as[(Long, Long)].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (n, f) => assert(n == (f + 3) / 4) }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, the layout a 100 TB media pipeline
  * uses (payload bytes stay columnar parquet; metadata is pushdown-able
  * scalar columns next to them).
  *
  * The test corpus has no real media, so the *decode* step is a
  * clearly-marked STUB: [[stubDecode]] derives deterministic fake
  * dimensions from the payload bytes. Everything around it — schema,
  * binary handling, per-partition batch iteration, frame-sample
  * explode — is the real Spark-side plumbing and is tested. A production
  * build swaps [[stubDecode]]'s body for a codec call; nothing else
  * changes.
  */
object MultimodalOps {

  /** A media row: opaque payload + routing metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Typed decode result (the "image header" a codec would emit). */
  final case class DecodedMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Long,
      height: Long,
      channels: Long,
      n_frames: Long,
  )

  /** STUB decode — deterministic fake in place of an image/audio codec
    * (none available in this environment). Dimensions are pure functions
    * of the byte length so results are reproducible and oracle-able.
    */
  def stubDecode(r: MediaRecord): DecodedMeta = {
    val n = r.payload.length.toLong
    DecodedMeta(
      doc_id = r.doc_id,
      media_type = r.media_type,
      n_bytes = n,
      width = 64L + n % 512L,
      height = 64L + (n * 31L) % 512L,
      channels = 3L,
      n_frames = n % 16L + 1L,
    )
  }

  /** Documents → media frame: payload = UTF-8 bytes standing in for
    * encoded media; media_type round-robins images/audio/video so the
    * type-dispatch plumbing is exercised.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int"),
      ).as("media_type"),
      col("text").cast("binary").as("payload"),
    )

  /** The typed per-partition decode pipeline (the Scala analogue of a
    * pandas-batch UDF): one iterator pass per partition, no driver
    * collect, codec state could be opened once per partition here.
    */
  def decodeAll(spark: SparkSession, media: DataFrame): Dataset[DecodedMeta] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it => it.map(stubDecode) }
  }

  /** Declarative twin of the decode (identical arithmetic as Column
    * algebra) — used by the oracle-checked query so the semantics of
    * [[stubDecode]] are pinned by the differential test.
    */
  def decodeMeta(media: DataFrame): DataFrame = {
    val n = octet_length(col("payload")).cast("long")
    media.select(
      col("doc_id"),
      col("media_type"),
      n.as("n_bytes"),
      (lit(64L) + pmod(n, lit(512L))).as("width"),
      (lit(64L) + pmod(n * 31L, lit(512L))).as("height"),
      lit(3L).as("channels"),
      (pmod(n, lit(16L)) + 1L).as("n_frames"),
    )
  }

  /** Resize planning: aspect-preserving fit of each decoded image into
    * a `target`×`target` box, never upscaling. The geometry (scale
    * factor, output dims) is the real pipeline logic; the pixel
    * resampling it parameterizes lives behind the stubbed codec.
    * floor(dim · scale) with scale = min(1, target/w, target/h) — all
    * exact double arithmetic.
    */
  def planResize(media: DataFrame, target: Int): DataFrame = {
    val meta = decodeMeta(media).filter(col("media_type") === "image")
    val scale = least(
      lit(1.0),
      lit(target.toDouble) / col("width"),
      lit(target.toDouble) / col("height"),
    )
    meta.select(
      col("doc_id"),
      col("width"),
      col("height"),
      scale.as("scale"),
      floor(col("width") * scale).cast("long").as("out_width"),
      floor(col("height") * scale).cast("long").as("out_height"),
    )
  }

  /** STUB feature extractor: a deterministic 8-dim "embedding" derived
    * from the payload's portable hash — stands in for an image/audio
    * encoder model (none available here). The Spark-side shape is the
    * real thing: media rows in, fixed-width `array<double>` out, ready
    * for the [[SimilarityOps]] ANN operators. e_j = ((h·(j+1)) mod 1009
    * + 1) / 1010 keeps every value an exact positive double both engines
    * reproduce (never a zero vector → cosine is always defined).
    */
  def stubEmbed(media: DataFrame, dims: Int = 8): DataFrame = {
    import graft.expressions.PolyHash
    val h = PolyHash(col("payload").cast("string"))
    // array(...) with h referenced once per dimension in ONE projection:
    // codegen subexpression elimination computes the payload hash once
    // per row. (A transform lambda would inline and re-fold it per
    // dimension — the HOF recompute trap, see graft.expressions.)
    media.select(
      col("doc_id"),
      col("media_type"),
      array(
        (0 until dims).map(j => (h * (j + 1) % 1009L + 1L).cast("double") / 1010.0): _*,
      ).as("embedding"),
    )
  }

  /** Frame sampling: every `step`-th frame index of each video payload,
    * exploded to one row per sampled frame (the shape a frame-extract
    * stage consumes; partition count scales with input, not frames).
    */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    decodeMeta(media)
      .filter(col("media_type") === "video")
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(step.toLong))).as("frame_idx"),
      )
      .orderBy("doc_id", "frame_idx")
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The banded-candidate core every LSH/pigeonhole face shares — ONE
  * implementation of the shape that was previously copied (with its
  * preconditions) into four files: fingerprint → fixed-width chunk
  * extraction, banded candidate equi-join (self or batch-vs-stored),
  * optional inline hamming verify, and the stop-key skew cap.
  *
  * Faces built on this core:
  *   - [[DedupOps.simhashPairs]] (SimHash text near-dup),
  *   - [[MultimodalOps.nearDupPairs]] (perceptual dHash media near-dup),
  *   - [[MediaIndexOps]] (the persisted fingerprint index: pair /
  *     capped / incremental / streaming-grow reads),
  *   - [[LshIndexOps]] (the persisted MinHash index: candidate /
  *     capped / incremental / streaming-grow reads, whose verify stage
  *     is exact Jaccard rather than inline hamming),
  *   - [[DedupOps.jaccardPairsFrom]] / the MinHash band candidates
  *     (same candidate-join shape on prefix-posting / band keys).
  *
  * Everything here is a pure equi-join on band keys — never an
  * all-pairs comparison at any corpus scale — and the expressions are
  * kept byte-identical to what the faces inlined before the extraction,
  * so the pinned exchange-free plans and the DuckDB oracles are
  * unchanged.
  */
object Banding {

  /** Preconditions of the floor-division chunk extraction (enforced in
    * ONE place): the fingerprint must fit a double's mantissa for the
    * `floor(fp / 2^k)` arithmetic to be exact, and the bands must tile
    * it. Returns the chunk width in bits.
    */
  def requireChunkLayout(bits: Int, blockBands: Int): Int = {
    require(bits <= 52, s"chunk extraction is exact only for bits <= 52 (got $bits)")
    require(bits % blockBands == 0, s"blockBands ($blockBands) must divide bits ($bits)")
    bits / blockBands
  }

  /** The pigeonhole guarantee's precondition: a pair within `maxHamming`
    * bit flips shares ≥1 identical chunk only when there are more chunks
    * than allowed flips.
    */
  def requirePigeonhole(blockBands: Int, maxHamming: Int): Unit =
    require(blockBands > maxHamming, "pigeonhole blocking needs bands > maxHamming")

  /** chunk c = floor(fp / 2^(c·chunkBits)) mod 2^chunkBits, c ∈
    * [0, blockBands) — floor-division form (not shifts) so the DuckDB
    * oracles mirror it verbatim; exact in doubles because
    * fp < 2^bits ≤ 2^52 ([[requireChunkLayout]]).
    */
  def chunksCol(fp: Column, bits: Int, blockBands: Int): Column = {
    val chunkBits = requireChunkLayout(bits, blockBands)
    transform(
      sequence(lit(0), lit(blockBands - 1)),
      c => floor(fp / pow(lit(2.0), c * chunkBits)).cast("long") % (1L << chunkBits),
    )
  }

  /** `(doc_id, <fpCol>, chunk_idx, chunk_bits)` rows — the banded shape
    * the candidate joins run on, extracted inline from the fingerprint
    * column.
    */
  def chunkRows(fp: DataFrame, fpCol: String, bits: Int, blockBands: Int): DataFrame =
    fp.select(
      col("doc_id"),
      col(fpCol),
      posexplode(chunksCol(col(fpCol), bits, blockBands)).as(Seq("chunk_idx", "chunk_bits")),
    )

  private def keyCond(keys: Seq[String]): Column =
    keys.map(k => col(s"x.$k") === col(s"y.$k")).reduce(_ && _)

  private def joinCond(keys: Seq[String], docPred: Option[Column]): Column =
    docPred.fold(keyCond(keys))(keyCond(keys) && _)

  /** The stop-key skew dial: drop every row whose band bucket holds more
    * than `maxBucket` members before candidate generation. One hot key
    * of size s costs s·(s−1)/2 verifications — the quadratic term at
    * corpus scale; the bounded-recall tradeoff (a true pair is missed
    * only if EVERY band it collides on is hot) is documented at each
    * capped face. The bucket sizing groups on the rows' own band keys,
    * so on a bucketed stored table it is exchange-free like the
    * candidate join itself.
    */
  def capSmallBuckets(rows: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    // A non-positive cap would silently empty candidate generation —
    // reject it at plan construction rather than return zero pairs.
    require(maxBucket >= 1, s"stop-key cap must be >= 1 (got $maxBucket)")
    rows.join(
      rows
        .groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("s"))
        .filter(col("s") <= maxBucket)
        .select(keys.head, keys.tail: _*),
      keys,
    )
  }

  /** Distinct banded candidate pairs `(outA, outB)` between two row
    * frames (aliased `x`/`y`; `docPred` may reference `x.doc_id` /
    * `y.doc_id` — e.g. the self-join's `x.doc_id < y.doc_id` or the
    * replay guard's `=!=`). No verify stage: callers whose verify
    * artifact does NOT ride in the band rows (Jaccard over shingle
    * sets) join this against their set store.
    */
  def candidatePairs(
      x: DataFrame,
      y: DataFrame,
      keys: Seq[String],
      outA: String = "doc_a",
      outB: String = "doc_b",
      docPred: Option[Column] = None,
      idCol: String = "doc_id",
  ): DataFrame =
    x.as("x")
      .join(y.as("y"), joinCond(keys, docPred))
      .select(col(s"x.$idCol").as(outA), col(s"y.$idCol").as(outB))
      .distinct()

  /** The ordered self-join face of [[candidatePairs]]. */
  def candidateSelfPairs(
      rows: DataFrame,
      keys: Seq[String],
      outA: String = "doc_a",
      outB: String = "doc_b",
      idCol: String = "doc_id",
  ): DataFrame =
    candidatePairs(
      rows, rows, keys, outA, outB,
      docPred = Some(col(s"x.$idCol") < col(s"y.$idCol")), idCol = idCol)

  /** Banded candidate join with the INLINE hamming verify — for faces
    * whose verify artifact (the fingerprint, one long) rides in the
    * band rows themselves, so candidates verify in the same join with
    * no second pass over any store. Returns distinct
    * `(outA, outB, hamming ≤ maxHamming)`.
    */
  def hammingPairs(
      x: DataFrame,
      y: DataFrame,
      keys: Seq[String],
      fpCol: String,
      maxHamming: Int,
      outA: String = "doc_a",
      outB: String = "doc_b",
      docPred: Option[Column] = None,
  ): DataFrame =
    x.as("x")
      .join(y.as("y"), joinCond(keys, docPred))
      .select(
        col("x.doc_id").as(outA),
        col("y.doc_id").as(outB),
        bit_count(col(s"x.$fpCol").bitwiseXOR(col(s"y.$fpCol"))).as("hamming"),
      )
      .distinct()
      .filter(col("hamming") <= maxHamming)

  /** The ordered self-join face of [[hammingPairs]]. */
  def hammingSelfPairs(
      rows: DataFrame,
      keys: Seq[String],
      fpCol: String,
      maxHamming: Int,
  ): DataFrame =
    hammingPairs(
      rows, rows, keys, fpCol, maxHamming,
      docPred = Some(col("x.doc_id") < col("y.doc_id")))
}

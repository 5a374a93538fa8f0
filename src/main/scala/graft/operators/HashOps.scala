package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable hash primitives shared by the dedup / text operators.
  *
  * Two tiers, chosen per call site:
  *
  *   - `xxhash64(...)` (Spark built-in, codegen'd) — the production path
  *     for 100 TB runs, where only self-consistency matters.
  *   - [[polyHash]] — a 31-bit polynomial rolling hash expressed in pure
  *     Catalyst higher-order functions, chosen because the *identical*
  *     fold is expressible in ANSI/DuckDB SQL (`list_reduce` over
  *     `unicode(substr(...))`), which makes every downstream operator
  *     (minhash signatures, LSH bands, simhash fingerprints) exactly
  *     oracle-checkable end-to-end, not just "rows>0"-checkable.
  *
  * All arithmetic stays in Long: operands are < 2^31, products < 2^62,
  * so no overflow anywhere, on either engine.
  */
object HashOps {

  /** 2^31 - 1 (Mersenne prime) — modulus of the portable hash family. */
  val P: Long = 2147483647L

  /** Multiplier/offset generators for the indexed universal hash family
    * h_i(x) = (a_i * x + b_i) mod P (Knuth/golden-ratio constants).
    */
  val MulA: Long = 2654435761L
  val MulB: Long = 2245366891L

  /** Portable polynomial rolling hash of a string column:
    * fold over characters, acc = (acc * 31 + codepoint) mod P, acc0 = 0.
    * Declarative form (kept as the spec; the DuckDB oracle mirrors it):
    * `aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s, i, 1))
    *    :: long), 0L, (acc, c) -> (acc*31 + c) % P)` ⟷ DuckDB
    * `list_reduce(list_prepend(0, list_transform(generate_series(1, length(s)),
    *    i -> CAST(unicode(substr(s, i, 1)) AS BIGINT))), (x, y) -> (x*31 + y) % 2147483647)`.
    * Evaluated via the codegen'd [[graft.expressions.PolyHash]] — same
    * fold, one tight loop (the HOF form interpreted three nested lambdas
    * per character and dominated minhash/simhash cost).
    */
  def polyHash(s: Column): Column = graft.expressions.PolyHash(s)

  /** i-th member of the universal family applied to a pre-hashed value:
    * h_i(x) = (a_i * x + b_i) mod P with a_i, b_i derived from i so the
    * oracle can re-derive them from the index alone (no constant tables).
    */
  def indexedHash(i: Column, x: Column): Column = {
    val a = (i.cast("long") + 1L) * MulA % P
    val b = (i.cast("long") + 1L) * MulB % P
    (a * x + b) % P
  }

  /** Word-level n-gram shingles of a token array. Documents shorter than
    * `n` tokens yield their full text as the single shingle (slice past
    * the end truncates identically in Spark and DuckDB).
    */
  def shingles(words: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(n))),
    )

  /** Distinct portable hashes of the n-gram shingle set — the document's
    * set representation for minhash / jaccard. Declarative spec (what the
    * DuckDB oracle mirrors): `array_distinct(transform(shingles(split(
    * text, " "), n), s => polyHash(s)))`; evaluated by the codegen'd
    * [[graft.expressions.ShingleHashesExpr]].
    */
  def shingleHashes(text: Column, n: Int): Column =
    graft.expressions.SketchColumns.shingleHashes(text, n)

  /** MinHash signature: sig[i] = min over the shingle-hash set of
    * h_i(hash). k signatures estimate Jaccard; mergeable partials make
    * this a map-side-combinable agg at cluster scale. Declarative spec:
    * `transform(sequence(0, k-1), i => array_min(transform(hashes,
    * h => indexedHash(i, h))))`; evaluated by the codegen'd
    * [[graft.expressions.MinHashSigExpr]].
    */
  def minhashSignature(hashes: Column, k: Int): Column =
    graft.expressions.SketchColumns.minHashSig(hashes, k)

  /** LSH band keys: the signature split into `bands` rows-per-band
    * groups, each rendered as a join key string. Two documents with
    * Jaccard j collide in ≥1 band with prob 1 - (1 - j^r)^b.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => concat_ws("_", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))),
    )

  /** SimHash fingerprint over the distinct token set: bit j of the
    * result is the sign of Σ_tokens (2·bit_j(h_j(polyHash(w))) − 1),
    * bits folded MSB→LSB as acc = acc*2 + bit (mirrors verbatim as a
    * DuckDB list_reduce; `bits` ≤ 62 keeps the Long positive).
    * Evaluated by the codegen'd [[graft.expressions.SimHashExpr]].
    */
  def simhash(text: Column, bits: Int): Column =
    graft.expressions.SketchColumns.simHash(text, bits)
}

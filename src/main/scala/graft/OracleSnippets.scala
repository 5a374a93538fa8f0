package graft

/** DuckDB SQL fragments that mirror the portable Catalyst expressions in
  * `graft.operators.HashOps` / `SimilarityOps` exactly — same fold
  * order, same integer arithmetic, same modulus — so minhash/LSH/simhash
  * pipelines and float dot products are end-to-end hash-comparable, not
  * just "rows>0"-checkable. Lambda parameter names are suffixed per
  * snippet to survive nesting.
  */
object OracleSnippets {

  val P = "2147483647"

  /** SimilarityOps fixed-point mean (aggregate context): mean of double
    * expr `xd` over the current group via scaled-BIGINT accumulation —
    * floor(xd·2^20) summed as an integer (order-independent, so a plain
    * partial-aggregatable sum) and divided back once. Mirrors
    * `SimilarityOps.fpMean` bit-for-bit: the product, floor, BIGINT→
    * DOUBLE conversion, and final division are all IEEE-deterministic
    * in both engines. The outer CAST to BIGINT guards DuckDB's
    * sum(BIGINT)→HUGEINT widening (the tx_cdc_chunk lesson).
    */
  def fpMeanAgg(xd: String): String =
    s"""CAST(CAST(sum(CAST(floor(($xd) * 1048576.0) AS BIGINT)) AS BIGINT) AS DOUBLE)
       |  / (count(*) * 1048576.0)""".stripMargin

  /** HashOps.polyHash: left fold (acc*31 + codepoint) mod P over chars. */
  def charHash(s: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(1, length($s)),
       |    chi -> CAST(unicode(substr($s, chi, 1)) AS BIGINT))),
       |  (chx, chy) -> (chx*31 + chy) % $P)""".stripMargin

  /** HashOps.indexedHash applied to value expr `x` with index expr `i`. */
  def indexedHash(i: String, x: String): String =
    s"(((($i)+1)*2654435761 % $P) * ($x) + (($i)+1)*2245366891 % $P) % $P"

  /** HashOps.shingleHashes: distinct charHashes of word n-gram strings
    * from token-array column `w` (n fixed to 3 as in the queries).
    */
  def shingleHashes(w: String): String =
    s"list_distinct(${shingleHashesOrdered(w, 3)})"

  /** Positional (non-distinct) shingle hashes for an n-gram width. */
  def shingleHashesOrdered(w: String, n: Int): String =
    s"""list_transform(
       |  list_transform(generate_series(1, greatest(len($w)-${n - 1}, 1)),
       |    shi -> array_to_string(($w)[shi:shi+${n - 1}], ' ')),
       |  shs -> ${charHash("shs")})""".stripMargin

  /** HashOps.minhashSignature over shingle-hash list column `sh`. */
  def minhashSig(sh: String, k: Int): String =
    s"""list_transform(generate_series(0, ${k - 1}),
       |  mhi -> list_min(list_transform($sh, mhv -> ${indexedHash("mhi", "mhv")})))""".stripMargin

  /** HashOps.simhash over token-array column `w` (bits MSB→LSB fold). */
  def simhash(w: String, bits: Int): String = {
    val hashes = s"list_transform(list_distinct($w), smw -> ${charHash("smw")})"
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |  list_transform(generate_series(${bits - 1}, 0, -1),
       |    smj -> CAST(CASE WHEN
       |      list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform($hashes,
       |          smh -> CASE WHEN (${indexedHash("smj", "smh")}) % 2 = 1
       |                      THEN 1 ELSE -1 END)),
       |        (smx, smy) -> smx + smy) > 0
       |      THEN 1 ELSE 0 END AS BIGINT))),
       |  (sma, smb) -> sma*2 + smb)""".stripMargin
  }

  /** SimilarityOps.unitNorm of a DOUBLE[] column `e`. */
  def unitNorm(e: String): String =
    s"""list_transform($e, unx -> unx / sqrt(
       |  list_reduce(list_prepend(0.0, list_transform($e, uny -> uny*uny)),
       |    (una, unb) -> una + unb)))""".stripMargin

  /** SimilarityOps.dot of two DOUBLE[] columns (strict left fold). */
  def dot(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       |  list_transform(generate_series(1, len($a)), dti -> ($a)[dti] * ($b)[dti])),
       |  (dta, dtb) -> dta + dtb)""".stripMargin

  /** SimilarityOps.kmeansStep's squared-L2 distance of two DOUBLE[]
    * columns (strict left fold over dims, matching zip_with+aggregate).
    */
  def l2sq(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0,
       |  list_transform(generate_series(1, len($a)),
       |    l2i -> (($a)[l2i] - ($b)[l2i]) * (($a)[l2i] - ($b)[l2i]))),
       |  (l2a, l2b) -> l2a + l2b)""".stripMargin

  /** Jaccard of two pre-distinct list columns as a double. */
  def jaccard(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / len(list_distinct(list_concat($a, $b)))"

  /** SimilarityOps.signBucket over FLOAT[] column `e` (MSB-first fold
    * over probe dims, rendered as a closed-form weighted sum).
    */
  def signBucket(e: String, probeDims: Seq[Int]): String =
    probeDims.zipWithIndex
      .map { case (d, i) =>
        val weight = 1L << (probeDims.size - 1 - i)
        s"(CASE WHEN ($e)[${d + 1}] > 0 THEN $weight ELSE 0 END)"
      }
      .mkString("(", " + ", ")")
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index text retrieval over the documents table — the search
  * read paths a corpus store serves (and a training-data pipeline uses
  * for targeted corpus probes): positional postings, conjunctive (AND)
  * lookup, exact phrase match, and ranked retrieval under a log-free
  * TF-IDF weight.
  *
  * Tokenization is the corpus contract shared with
  * [[TextOps.tokens]] (single-space split), so every query here is
  * bit-reproducible by a DuckDB oracle over `string_split`.
  *
  * Scale shape: [[postings]] is the one corpus-wide explode an index
  * build pays; every search below filters postings to its literal query
  * terms FIRST, so what flows into joins/aggregates is a handful of
  * per-term posting lists (size Σ df(t)), never the corpus. The
  * operators here re-derive postings from the corpus per query (fine
  * for one-off probes); [[SearchIndexOps]] PERSISTS the postings table
  * bucketed by term — the LshIndexOps pattern applied to text — and
  * serves the identical search semantics from pruned per-term reads
  * with no corpus re-explode. The `*From` cores below are shared by
  * both faces, so index-served results are the same plans over a
  * different postings source, not a reimplementation.
  */
object SearchOps {

  /** Positional postings — one row per token occurrence: (term, doc_id,
    * pos), `pos` 1-based within the document. The inverted-index build:
    * one explode over the corpus; persisted bucketed by `term`
    * ([[SearchIndexOps.writeIndex]]) it serves every retrieval query
    * without re-reading text.
    */
  def postings(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "term")))
      .select(col("term"), col("doc_id"), (col("pos0") + 1).cast("int").as("pos"))

  /** AND-retrieval core over an arbitrary postings source (corpus-derived
    * or the persisted table): the term filter comes FIRST so it reaches
    * the scan — against the bucketed table it also prunes buckets.
    */
  /** A duplicated query term would silently corrupt every retrieval
    * face: [[andFrom]] compares `countDistinct(term)` to `terms.size`
    * (so `Seq("a","a","b")` could never match any document), and the
    * fixed-order score sums in [[rankedFrom]]/[[bm25From]] would add
    * the duplicated term's score twice. Dedup is the CALLER'S decision
    * (dropping a term changes the query), so reject loudly instead.
    */
  private def requireDistinctTerms(terms: Seq[String]): Unit =
    require(
      terms.distinct.size == terms.size,
      s"duplicate query terms ${terms.mkString("[", ",", "]")} — dedup before searching " +
        "(AND could never match; ranked scores would double-count)",
    )

  private[operators] def andFrom(postings: DataFrame, terms: Seq[String]): DataFrame = {
    requireDistinctTerms(terms)
    postings
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("term")).as("n_matched"), count(lit(1)).as("total_tf"))
      .filter(col("n_matched") === terms.size)
      .select(col("doc_id"), col("total_tf"))
      .orderBy("doc_id")
  }

  /** Conjunctive (AND) retrieval: documents containing EVERY query
    * term, with the total query-term frequency per document. Postings
    * are filtered to the literal terms before anything else (the
    * predicate reaches the scan), so the aggregate sees |terms| posting
    * lists; a document qualifies when it matches all |terms| distinct
    * terms — the standard posting-list intersection as one count
    * aggregate instead of |terms| joins.
    */
  def searchAnd(docs: DataFrame, terms: Seq[String]): DataFrame =
    andFrom(postings(docs), terms)

  /** Boolean-filter core (MUST/MUST_NOT) over an arbitrary postings
    * source: documents containing every `must` term and none of the
    * `mustNot` terms. ONE pruned read of all |must|+|mustNot| posting
    * lists feeds one aggregate — the exclusion is a conditional count
    * inside the same groupBy, not an anti-join (no second corpus
    * contact, no extra shuffle); `total_tf` counts must-term
    * occurrences only, matching [[andFrom]]'s contract.
    */
  private[operators] def notFrom(
      postings: DataFrame,
      must: Seq[String],
      mustNot: Seq[String],
  ): DataFrame = {
    requireDistinctTerms(must ++ mustNot)
    require(must.nonEmpty, "MUST_NOT alone would scan the corpus complement")
    postings
      .filter(col("term").isin(must ++ mustNot: _*))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(when(col("term").isin(must: _*), col("term"))).as("n_must"),
        count(when(col("term").isin(mustNot: _*), 1)).as("n_not"),
        count(when(col("term").isin(must: _*), 1)).as("total_tf"),
      )
      .filter(col("n_must") === must.size && col("n_not") === 0)
      .select(col("doc_id"), col("total_tf"))
      .orderBy("doc_id")
  }

  /** Negated conjunctive retrieval (AND NOT): every `must` term
    * present, every `mustNot` term absent — the Lucene boolean-query
    * MUST/MUST_NOT clause pair as one posting-list aggregate.
    */
  def searchNot(docs: DataFrame, must: Seq[String], mustNot: Seq[String]): DataFrame =
    notFrom(postings(docs), must, mustNot)

  /** Phrase-match core: `termList` supplies one PRE-FILTERED positional
    * posting list (doc_id, pos) per term; the join chain advances the
    * position by one per term, so every join is an equi-join on
    * (doc_id, pos) between per-term lists — the corpus itself is never
    * self-joined.
    */
  private[operators] def phraseFrom(termList: String => DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a phrase needs at least two terms")
    val start = termList(phrase.head)
    val matched = phrase.zipWithIndex.tail.foldLeft(start) { case (acc, (t, i)) =>
      val next = termList(t).select(col("doc_id").as("d2"), col("pos").as("p2"))
      acc
        .join(next, col("d2") === col("doc_id") && col("p2") === col("pos") + i)
        .select(col("doc_id"), col("pos"))
    }
    matched
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy("doc_id")
  }

  /** Exact phrase match over positional postings: documents where the
    * phrase's terms occur at consecutive positions, with the occurrence
    * count (overlapping occurrences counted — "a a a" contains "a a"
    * twice, which substring regexes get wrong by consuming the
    * separator).
    */
  def searchPhrase(docs: DataFrame, phrase: Seq[String]): DataFrame =
    phraseFrom(
      t => postings(docs).filter(col("term") === t).select(col("doc_id"), col("pos")),
      phrase,
    )

  /** Proximity (NEAR/slop) core — between AND (any positions) and
    * phrase (exact consecutive order): a document matches when all
    * query terms occur within a window of `slop` positions, in ANY
    * order. Stated via covering anchors — a position p of any query
    * term such that every term has an occurrence in [p, p+slop] — which
    * is equivalent to ∃ one position per term with max−min ≤ slop (the
    * minimum of any qualifying set is itself a covering anchor), but
    * needs one range join instead of a k-way position product. Output:
    * (doc_id, n_windows = covering-anchor count, first_pos = earliest
    * covering anchor), deterministic integers.
    *
    * Plan shape: postings are term-filtered FIRST (scan predicate /
    * bucket pruning on the index face), so the anchor×occurrence join
    * is an equi-join on doc_id between per-term posting lists with the
    * position window as residual — per-doc work bounded by the query
    * terms' in-document frequencies, never the corpus.
    */
  private[operators] def nearFrom(postings: DataFrame, terms: Seq[String], slop: Int): DataFrame = {
    requireDistinctTerms(terms)
    require(terms.size >= 2, "a proximity query needs at least two terms")
    require(slop >= 0, s"slop must be non-negative, got $slop")
    val tp = postings
      .filter(col("term").isin(terms: _*))
      .select(col("term"), col("doc_id"), col("pos"))
    val anchors = tp.select(col("doc_id"), col("pos").as("apos"))
    anchors
      .join(tp, Seq("doc_id"))
      .filter(col("pos") >= col("apos") && col("pos") <= col("apos") + slop)
      .groupBy(col("doc_id"), col("apos"))
      .agg(countDistinct(col("term")).as("n_matched"))
      .filter(col("n_matched") === terms.size)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"), min(col("apos")).as("first_pos"))
      .orderBy("doc_id")
  }

  /** Proximity search over corpus-derived postings (the on-the-fly
    * face; [[SearchIndexOps.searchNear]] serves the same core from the
    * stored term-bucketed postings).
    */
  def searchNear(docs: DataFrame, terms: Seq[String], slop: Int): DataFrame =
    nearFrom(postings(docs), terms, slop)

  /** Ranked-retrieval core: `tf` is (doc_id, term, tf) over the query
    * terms only, `df` is (term, df), `n` a one-row (n) frame — the three
    * inputs a persisted index serves from its postings/lexicon/meta
    * tables and the corpus-scan face derives on the fly. Identical
    * arithmetic either way, so scores are bit-equal across faces.
    *
    * Plan: df is a |terms|-row broadcast, N a broadcast scalar; per-doc
    * term sums select at most one non-zero addend per term (adding an
    * exact 0.0 is order-independent), and the final top-k is the
    * bounded-heap aggregate — no window, nothing shuffles but the
    * filtered postings keyed by doc.
    */
  private[operators] def rankedFrom(
      tf: DataFrame,
      df: DataFrame,
      n: DataFrame,
      terms: Seq[String],
      k: Int,
  ): DataFrame = {
    requireDistinctTerms(terms)
    fixedOrderTopK(
      tf.join(broadcast(df), "term")
        .crossJoin(broadcast(n))
        .select(
          col("doc_id"),
          col("term"),
          (col("tf").cast("double") * col("n") / col("df")).as("s"),
        ),
      terms,
      k,
    )
  }

  /** Shared ranked-retrieval tail: per-doc score = the per-term scores
    * `s` summed in the CALLER'S term order (each term selects at most
    * one non-zero addend, and adding an exact 0.0 is order-independent,
    * so the double is deterministic), then bounded-heap top-k — no
    * window, nothing shuffles but the scored rows keyed by doc.
    */
  private def fixedOrderTopK(perTermScore: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val perDoc = perTermScore
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("term") === terms.head, col("s")).otherwise(0.0)).as(s"s_0"),
        terms.zipWithIndex.tail.map { case (t, i) =>
          sum(when(col("term") === t, col("s")).otherwise(0.0)).as(s"s_$i")
        }: _*,
      )
    val score = terms.indices.map(i => col(s"s_$i")).reduceLeft(_ + _)
    perDoc
      .select(lit(1).as("g"), col("doc_id"), score.as("score"))
      .groupBy(col("g"))
      .agg(graft.expressions.TopKPairs.topK(col("score"), col("doc_id"), k, ascending = false).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "p")))
      .select(
        (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("doc_id"),
        col("p.score").as("score"),
      )
      .orderBy("rank")
  }

  /** BM25 core (log-free idf): per (doc, term) score
    *
    *   idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    *   idf(t) = N / df(t)
    *
    * — the standard tf-saturation + document-length normalization,
    * with the same log-free idf as [[rankedFrom]] (ln() is measurably
    * non-portable across engines; the saturation and length terms are
    * pure rational arithmetic on exact integers, so every double is
    * bit-reproducible when the oracle mirrors the operation order).
    * `dl` is (doc_id, dl) — from `size(split(text))` on the corpus face
    * or the stored norms table on the index face; `stats` is one row
    * (n, total_dl) whose partials an index sums at read time. k1 = 1.2
    * and b = 0.75 are the textbook defaults; both literals parse to
    * identical doubles in both engines.
    */
  private[operators] def bm25From(
      tf: DataFrame,
      df: DataFrame,
      stats: DataFrame,
      dl: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double,
      b: Double,
  ): DataFrame = {
    requireDistinctTerms(terms)
    val avgdl = col("total_dl").cast("double") / col("n")
    val idf = col("n").cast("double") / col("df")
    val norm = lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")
    val perTermScore = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .join(dl, "doc_id")
      .withColumn("avgdl", avgdl)
      .select(
        col("doc_id"),
        col("term"),
        (idf * (col("tf") * lit(k1 + 1.0)) / (col("tf") + lit(k1) * norm)).as("s"),
      )
    fixedOrderTopK(perTermScore, terms, k)
  }

  /** BM25 ranked retrieval over the corpus: tf/df from term-filtered
    * postings, document lengths from one narrow projection (no explode
    * — `size(split(...))` per row), corpus stats from their aggregate.
    */
  def searchBm25(
      docs: DataFrame,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
  ): DataFrame = {
    val tf = tfFrom(postings(docs), terms)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("total_dl"))
    bm25From(tf, df, stats, dl, terms, k, k1, b)
  }

  /** Per-term term frequencies of the query terms from a postings
    * source — the `tf` input of [[rankedFrom]].
    */
  private[operators] def tfFrom(postings: DataFrame, terms: Seq[String]): DataFrame =
    postings
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Ranked (disjunctive) retrieval under the log-free TF-IDF weight:
    * score(d) = Σ_t tf(t,d) · N / df(t), summed in the CALLER'S term
    * order. ln()-based IDF is measurably non-portable across engines
    * (the tx_unigram_rarity precedent), so the weight keeps the exact
    * inverse-document-frequency ratio un-damped — rare terms dominate,
    * which is the ranking signal being demonstrated. Every per-term
    * component is one double multiply + divide on exact integers, and
    * the fixed-order final sum makes the score bit-reproducible.
    */
  def searchRanked(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val tf = tfFrom(postings(docs), terms)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    rankedFrom(tf, df, n, terms, k)
  }
}

package graft

import org.apache.spark.sql.functions.col
import graft.operators.TextOps
import Tables.documents

/** Text-analysis queries over `documents` (SURVEY.md §7.2 M4): token
  * counting, quality scoring, language-id, fingerprinting — the
  * pre-training-curation staples, each with an exact DuckDB oracle.
  */
object TextQueries {

  private val stopList = TextOps.Stopwords.map(s => s"'$s'").mkString(", ")

  val all: Seq[Q] = Seq(
    Q(
      "tx_token_stats",
      (s, d) => TextOps.tokenStats(documents(s, d)),
      Some(s"""SELECT doc_id, len(w) AS n_tokens,
              |  len(list_distinct(w)) AS n_distinct,
              |  len(regexp_extract_all(text, '${TextOps.BpePattern}')) AS n_bpe_tokens,
              |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr,
              |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              |         list_transform(w, tkt -> CAST(length(tkt) AS BIGINT))),
              |       (tka, tkb) -> tka + tkb) AS DOUBLE) / len(w) AS mean_token_len
              |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
              |ORDER BY doc_id""".stripMargin),
    ),
    Q(
      "tx_quality",
      (s, d) => TextOps.qualityScore(documents(s, d)),
      Some(s"""SELECT doc_id, n_tokens, stop_ratio, ttr,
              |  (n_tokens >= 20 AND n_tokens <= 200 AND stop_ratio <= 0.3 AND ttr >= 0.1) AS keep
              |FROM (
              |  SELECT doc_id, len(w) AS n_tokens,
              |    CAST(len(list_filter(w, qt -> qt IN ($stopList))) AS DOUBLE) / len(w) AS stop_ratio,
              |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
              |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
              |ORDER BY doc_id""".stripMargin),
    ),
    Q(
      "tx_lang_id",
      (s, d) => TextOps.langId(documents(s, d)),
      Some {
        val scores = TextOps.LangMarkers
          .map { case (lang, set) =>
            val inList = set.map(m => s"'$m'").mkString(", ")
            s"len(list_filter(w, lt -> lt IN ($inList))) AS score_$lang"
          }
          .mkString(",\n    ")
        val best = TextOps.LangMarkers.map { case (l, _) => s"score_$l" }.mkString("greatest(", ", ", ")")
        val caseChain = TextOps.LangMarkers.init
          .map { case (l, _) => s"WHEN score_$l = $best THEN '$l'" }
          .mkString(" ")
        s"""SELECT doc_id, ${TextOps.LangMarkers.map { case (l, _) => s"score_$l" }.mkString(", ")},
           |  CASE $caseChain ELSE '${TextOps.LangMarkers.last._1}' END AS predicted,
           |  lang,
           |  (CASE $caseChain ELSE '${TextOps.LangMarkers.last._1}' END) = lang AS agrees
           |FROM (
           |  SELECT doc_id, lang,
           |    $scores
           |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents))
           |ORDER BY doc_id""".stripMargin
      },
    ),
    Q(
      "tx_top_ngrams",
      (s, d) => TextOps.topNgrams(documents(s, d), n = 2, k = 5),
      Some("""SELECT lang, ngram, cnt, rank FROM (
             |  SELECT lang, ngram, cnt,
             |    CAST(row_number() OVER (PARTITION BY lang
             |           ORDER BY cnt DESC, ngram) AS INT) AS rank
             |  FROM (
             |    SELECT lang, ngram, CAST(count(*) AS BIGINT) AS cnt FROM (
             |      SELECT lang, unnest(list_transform(
             |               generate_series(1, greatest(len(w)-1, 1)),
             |               ni -> array_to_string(w[ni:ni+1], ' '))) AS ngram
             |      FROM (SELECT lang, string_split(text, ' ') AS w FROM documents))
             |    GROUP BY lang, ngram))
             |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin),
    ),
    // Deterministic 30% corpus sample (hash-bucket membership), with
    // per-language counts proving the mix is reproducible.
    Q(
      "tx_hash_sample",
      (s, d) => {
        import org.apache.spark.sql.functions._
        TextOps.hashSample(documents(s, d), buckets = 10, keep = 3)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"))
          .orderBy("lang")
      },
      Some(s"""SELECT lang, count(*) AS n_sampled
              |FROM documents
              |WHERE ${OracleSnippets.charHash("text")} % 10 < 3
              |GROUP BY lang ORDER BY lang""".stripMargin),
    ),
    Q(
      "tx_curation_pipeline",
      (s, d) => TextOps.curationPipeline(documents(s, d)),
      Some(s"""WITH scored AS (
              |  SELECT doc_id, text, lang, len(w) AS n_tokens,
              |    CAST(len(list_filter(w, cq -> cq IN ($stopList))) AS DOUBLE) / len(w) AS stop_ratio,
              |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
              |  FROM (SELECT doc_id, text, lang, string_split(text, ' ') AS w FROM documents)),
              |kept AS (
              |  SELECT * FROM scored
              |  WHERE n_tokens >= 20 AND n_tokens <= 200 AND stop_ratio <= 0.3 AND ttr >= 0.1),
              |deduped AS (
              |  SELECT min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang,
              |         min_by(n_tokens, doc_id) AS n_tokens
              |  FROM kept GROUP BY text)
              |SELECT lang, count(*) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
              |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin),
    ),
    Q(
      "tx_winnow",
      (s, d) => TextOps.winnow(documents(s, d), k = 3, w = 4),
      Some(s"""WITH hs AS (
              |  SELECT doc_id, ${OracleSnippets.shingleHashesOrdered("string_split(text, ' ')", 3)} AS hs
              |  FROM documents)
              |SELECT doc_id,
              |  unnest(list_distinct(list_transform(
              |    generate_series(1, greatest(len(hs)-3, 1)),
              |    wni -> list_min(hs[wni:wni+3])))) AS fingerprint
              |FROM hs ORDER BY doc_id, fingerprint""".stripMargin),
    ),
    Q(
      "tx_fingerprint",
      (s, d) => TextOps.fingerprints(documents(s, d)),
      Some(s"""SELECT doc_id,
              |  ${OracleSnippets.charHash("text")} AS rolling_hash,
              |  sha256(text) AS sha256,
              |  md5(text) AS md5
              |FROM documents ORDER BY doc_id""".stripMargin),
    ),
  )
}

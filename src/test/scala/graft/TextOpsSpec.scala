package graft

import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("token stats on a hand-written document") {
    val out = TextOps.tokenStats(Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Int]("n_tokens") == 6)
    assert(out.getAs[Int]("n_distinct") == 5) // "the" twice
    assert(math.abs(out.getAs[Double]("ttr") - 5.0 / 6.0) < 1e-15)
    assert(math.abs(out.getAs[Double]("mean_token_len") - 17.0 / 6.0) < 1e-15)
  }

  test("BPE-ish tokenizer splits letter runs, digit runs, and symbols") {
    val n = TextOps.tokenStats(Seq((1L, "abc123 def-ghi")).toDF("doc_id", "text"))
      .collect().head.getAs[Int]("n_bpe_tokens")
    assert(n == 5) // abc | 123 | def | - | ghi
  }

  test("quality keep flag enforces length bounds and ratios") {
    val short = "too short"
    val good = (Seq.fill(10)("alpha beta gamma delta epsilon").mkString(" "))
    val out = TextOps.qualityScore(Seq((1L, short), (2L, good)).toDF("doc_id", "text"))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!out(1L)) // 2 tokens < 20
    assert(out(2L))
  }

  test("language-id argmax is deterministic with lexicographic tie-break") {
    // No marker words at all → all scores 0 → first language (de) wins.
    val out = TextOps.langId(Seq((1L, "nothing matches here", "en")).toDF("doc_id", "text", "lang"))
      .collect().head
    assert(out.getAs[String]("predicted") == "de")
    assert(!out.getAs[Boolean]("agrees"))
  }

  test("fingerprints are stable and distinct across distinct texts") {
    val out = TextOps.fingerprints(
      Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("doc_id", "text"),
    ).select("doc_id", "rolling_hash").as[(Long, Long)].collect().toMap
    assert(out(1L) == out(2L))
    assert(out(1L) != out(3L))
  }

  test("repetition signals flag a degenerate document and clear a diverse one") {
    val looped = Seq.fill(30)("spam ham").mkString(" ") // "spam ham spam ham ..."
    val diverse = (1 to 60).map(i => s"w$i").mkString(" ")
    val out = TextOps.repetition(
      Seq((1L, looped), (2L, diverse)).toDF("doc_id", "text"),
    ).collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_tokens") == 60)
    // 60 tokens, 2 distinct: dup ratio 58/60, top word 30/60.
    assert(math.abs(r1.getAs[Double]("dup_word_ratio") - 58.0 / 60.0) < 1e-15)
    assert(math.abs(r1.getAs[Double]("top_word_ratio") - 0.5) < 1e-15)
    // 59 bigrams: "spam ham" ×30, "ham spam" ×29 → top 30/59.
    assert(math.abs(r1.getAs[Double]("top_bigram_ratio") - 30.0 / 59.0) < 1e-15)
    assert(r1.getAs[Boolean]("repetitive"))
    val r2 = out(2L)
    assert(r2.getAs[Double]("dup_word_ratio") == 0.0)
    assert(!r2.getAs[Boolean]("repetitive"))
  }

  test("stratified sampling is a per-stratum widening of the flat sample") {
    import org.apache.spark.sql.functions.col
    val docs = Seq.tabulate(200) { i =>
      (i.toLong, s"document number $i with some words", if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val flat = TextOps.hashSample(docs, buckets = 10, keep = 3)
      .select("doc_id").as[Long].collect().toSet
    val strat = TextOps.stratifiedHashSample(
      docs, col("lang"), buckets = 10,
      rates = Seq("en" -> 6, "de" -> 3),
    ).select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = strat.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // de at rate 3 == the flat keep-3 sample restricted to de docs.
    assert(byLang("de") == flat.filter(_ % 2 == 1))
    // en at rate 6 is a superset of the flat sample's en docs.
    assert(flat.filter(_ % 2 == 0).subsetOf(byLang.getOrElse("en", Set.empty)))
    // An unlisted stratum is dropped entirely.
    val dropped = TextOps.stratifiedHashSample(
      docs, col("lang"), buckets = 10, rates = Seq("en" -> 6),
    ).filter(col("lang") === "de").count()
    assert(dropped == 0)
  }

  test("PII scrub redacts emails, IPs, and digit runs, and counts them") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.piiScrub(
      Seq((1L, "mail bob7@host.net or 192.168.0.1 else 12345678 but not 123 x"))
        .toDF("doc_id", "text"),
      col("text"),
    ).collect().head
    assert(out.getAs[Long]("n_emails") == 1L)
    assert(out.getAs[Long]("n_ips") == 1L)
    assert(out.getAs[Long]("n_longnums") == 1L)
    assert(
      out.getAs[String]("scrubbed") ==
        "mail <EMAIL> or <IP> else <NUM> but not 123 x",
    )
  }
}

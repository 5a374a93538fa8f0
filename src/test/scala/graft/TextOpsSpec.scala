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
}

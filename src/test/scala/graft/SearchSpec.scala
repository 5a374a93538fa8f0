package graft

import org.apache.spark.sql.functions._
import graft.operators.SearchOps
import Tables.documents

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("searchAnd requires every term; total_tf counts all query-term occurrences") {
    val docs = docsOf(
      1L -> "x y z x",
      2L -> "x y",
      3L -> "z z y x z",
      4L -> "w w",
    )
    val got = SearchOps.searchAnd(docs, Seq("x", "z"))
      .as[(Long, Long)].collect().toSeq
    // doc 1: x,z,x -> 3; doc 3: z,z,x,z -> 4; doc 2 lacks z, doc 4 lacks both.
    assert(got == Seq(1L -> 3L, 3L -> 4L))
  }

  test("duplicate query terms are rejected loudly on every retrieval face") {
    val docs = docsOf(1L -> "a b c")
    // AND would compare countDistinct to the duplicated size and never
    // match; ranked/BM25 would double-count the duplicated term's score.
    // Either is silent corruption, so the cores reject up front.
    intercept[IllegalArgumentException](SearchOps.searchAnd(docs, Seq("a", "a", "b")))
    intercept[IllegalArgumentException](SearchOps.searchRanked(docs, Seq("a", "a"), 5))
    intercept[IllegalArgumentException](SearchOps.searchBm25(docs, Seq("a", "b", "a"), 5))
    // A repeated word in a PHRASE is a legitimate query ("table table"):
    // positional joins handle it, so no guard there.
    assert(SearchOps.searchPhrase(docs, Seq("a", "a")).count() == 0L)
  }

  test("searchPhrase counts OVERLAPPING occurrences and respects order") {
    val docs = docsOf(
      1L -> "a a a b a a",
      2L -> "a b a b",
      3L -> "b a",
    )
    val aa = SearchOps.searchPhrase(docs, Seq("a", "a"))
      .as[(Long, Long)].collect().toSeq
    // doc 1: positions (1,2), (2,3), (5,6) -> 3 overlapping matches.
    assert(aa == Seq(1L -> 3L))
    val ab = SearchOps.searchPhrase(docs, Seq("a", "b"))
      .as[(Long, Long)].collect().toSeq
    assert(ab == Seq(1L -> 1L, 2L -> 2L))
    // Three-term phrase advances the position twice.
    val aab = SearchOps.searchPhrase(docs, Seq("a", "a", "b"))
      .as[(Long, Long)].collect().toSeq
    assert(aab == Seq(1L -> 1L))
  }

  test("searchRanked weights rare terms by N/df, ranks deterministically, and stays window-free") {
    val docs = docsOf(
      1L -> "rare x",
      2L -> "x common",
      3L -> "common x",
      4L -> "common common x",
    )
    // df(rare)=1, df(common)=3, N=4: one 'rare' hit (weight 4.0)
    // outranks even two 'common' hits (weight 4/3 each).
    val got = SearchOps.searchRanked(docs, Seq("rare", "common"), 3)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 4L, 2L))
    assert(got.map(_._1) == Seq(1, 2, 3))
    assert(math.abs(got.head._3 - 4.0) < 1e-15)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = SearchOps.searchRanked(docs, Seq("rare", "common"), 3).queryExecution.optimizedPlan
    assert(plan.collect { case w: LWindow => w }.isEmpty,
      "ranked retrieval's top-k must be the bounded-heap aggregate, not a window")
  }

  test("term filter reaches the scan: postings of a literal term scan prunes to the term predicate") {
    // The retrieval plans filter postings on literal terms BEFORE any
    // join/aggregate; after the explode the filter sits directly on the
    // generated term column, so no full-postings exchange exists in the
    // plan (the only shuffle keys are doc ids).
    val q = SearchOps.searchAnd(documents(spark, Sf), Seq("dup", "spark"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("isin") || optimized.contains("IN ("),
      s"expected the literal term predicate in the optimized plan:\n$optimized")
    // And doc ties in ranked retrieval break ascending on doc_id.
    val r = SearchOps.searchRanked(documents(spark, Sf), Seq("dup", "spark", "table"), 10)
      .as[(Int, Long, Double)].collect()
    assert(r.length == 10)
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), "rank order must be (score desc, doc_id)")
    }
  }

  test("proximity search: any order inside the slop window, bound is inclusive") {
    val docs = Seq(
      (1L, "a x x b"), // span 3, b after a
      (2L, "b x x a"), // span 3, a after b — order must not matter
      (3L, "a x x x b"), // span 4 — outside slop 3
      (4L, "a b a x b"), // anchors: pos1(a),2(b),3(a) cover; pos5(b) lacks an a after it
      (5L, "a a a"), // missing b entirely
    ).toDF("doc_id", "text")
    val got = SearchOps.searchNear(docs, Seq("a", "b"), slop = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 1L, 1), (2L, 1L, 1), (4L, 3L, 1)))
    // Slop 4 admits doc 3; exact-phrase adjacency is slop-1 with order,
    // which proximity deliberately drops (doc 2 matches, "a b" phrase wouldn't).
    assert(SearchOps.searchNear(docs, Seq("a", "b"), slop = 4)
      .filter(col("doc_id") === 3).count() == 1)
    intercept[IllegalArgumentException](SearchOps.searchNear(docs, Seq("a", "a"), 3))
    intercept[IllegalArgumentException](SearchOps.searchNear(docs, Seq("a"), 3))
    intercept[IllegalArgumentException](SearchOps.searchNear(docs, Seq("a", "b"), -1))
  }

  test("searchNot: every MUST present, any MUST_NOT excludes; tf counts must terms only") {
    val docs = Seq(
      (1L, "a b a"), // both musts, no bad → kept, tf = 3
      (2L, "a b bad"), // excluded by MUST_NOT
      (3L, "a a a"), // missing must b
      (4L, "b a b bad bad"), // excluded (multiplicity irrelevant)
    ).toDF("doc_id", "text")
    val got = SearchOps.searchNot(docs, Seq("a", "b"), Seq("bad"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L)))
    // Cross-clause duplicates are duplicates too; MUST_NOT alone is
    // rejected (it would mean scanning the corpus complement).
    intercept[IllegalArgumentException](SearchOps.searchNot(docs, Seq("a"), Seq("a")))
    intercept[IllegalArgumentException](SearchOps.searchNot(docs, Nil, Seq("bad")))
  }
}

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

  test("trained quality classifier learns the label, not the majority class") {
    val docs = Tables.documents(spark, Sf)
    val train = TextOps.qualityTrain(docs, rounds = 8)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
    assert(train.length == 8 && train.map(_._1).toSeq == (1 to 8))
    // The Σ|r| training curve must strictly decrease — a diverging or
    // stalled fixed-point GD would show here before any oracle does.
    val curve = train.map(_._7).toSeq
    assert(curve.zip(curve.tail).forall { case (a, b) => b < a }, s"curve: $curve")
    val scored = TextOps.qualityScoreTrained(docs, docs, rounds = 8)
      .select("predicted_keep", "heuristic_keep", "agrees")
      .as[(Boolean, Boolean, Boolean)].collect()
    val n = scored.length.toDouble
    val acc = scored.count(_._3) / n
    val majority = math.max(scored.count(_._2), scored.count(!_._2)) / n
    // Predicting only the majority class would already score ~91% here;
    // the model must beat that AND emit both classes.
    assert(acc > majority, f"acc $acc%.3f vs majority $majority%.3f")
    assert(scored.exists(_._1) && scored.exists(!_._1), "one-class predictions")
    // The sampled-train face scores the full corpus with sample-trained
    // weights — different weights, same contract: beats majority.
    val sampled = TextOps.qualityScoreTrained(
      TextOps.hashSample(docs, buckets = 10, keep = 3), docs, rounds = 8)
      .select("agrees").as[Boolean].collect()
    assert(sampled.count(identity) / n > majority)
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

  test("chunking covers the text exactly: stride-spaced starts, overlap, short tail kept") {
    val docs = Seq(
      (1L, "abcdefghij"), // 10 chars
      (2L, "abc"), //        shorter than one window
      (3L, ""), //           empty → one empty chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunk(docs, width = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    // doc 1: starts 0,3,6,9 → windows abcd, defg, ghij, j
    assert(byDoc(1L).map(c => (c._3, c._4)).toSeq ==
      Seq((0L, "abcd"), (3L, "defg"), (6L, "ghij"), (9L, "j")))
    // Reconstruction: dropping the (width - stride) overlap from every
    // chunk after the first restores the original text.
    val rebuilt = byDoc(1L).sortBy(_._2).map(_._4).zipWithIndex
      .map { case (t, i) => if (i == 0) t else t.drop(4 - 3) }.mkString
    assert(rebuilt == "abcdefghij")
    assert(byDoc(2L).map(_._4).toSeq == Seq("abc"))
    assert(byDoc(3L).map(_._4).toSeq == Seq(""))
  }

  test("token-budget mixing: saturated sources keep all, capped ones quantize") {
    val docs = Seq.tabulate(40) { i =>
      val src = if (i < 20) "big" else "small"
      (i.toLong, ("w " * 9).trim + s" t$i", src) // 10 tokens per doc
    }.toDF("doc_id", "text", "source")
    // big: 200 tokens vs budget 60 → keepB = 60*10/200 = 3 of 10 buckets;
    // small: 200 tokens too — same; raise small's budget via fewer docs?
    val out = TextOps.mixByTokenBudget(docs, perSourceBudget = 60L, buckets = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.foreach { case (_, total, keepB, nKept, tokKept) =>
      assert(total == 200L && keepB == 3L)
      assert(nKept * 10 == tokKept) // every doc has exactly 10 tokens
      assert(nKept <= 20L)
    }
    // A source under budget keeps everything.
    val small = TextOps.mixByTokenBudget(docs, perSourceBudget = 500L, buckets = 10).collect()
    small.foreach(r => assert(r.getAs[Long]("keep_buckets") == 10L
      && r.getAs[Long]("n_docs_kept") == 20L))
  }

  test("contamination flags corpus docs sharing an n-gram with the benchmark set") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "the quick brown fox jumps"), //   benchmark (id % 2 == 0 here)
      (1L, "a quick brown fox appears"), //   shares 3-gram "quick brown fox"
      (3L, "entirely different words here"), // clean
      (5L, "the quick brown fox jumps"), //   exact copy of the benchmark doc
    ).toDF("doc_id", "text")
    val flags = TextOps.contamination(docs, col("doc_id") % 2 === 0, n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(flags.map(_._1).toSeq == Seq(1L, 3L, 5L)) // benchmark rows excluded
    val byId = flags.map(f => f._1 -> ((f._2, f._3))).toMap
    assert(byId(1L)._1 == 1L && byId(1L)._2) //  one shared 3-gram
    assert(byId(3L) == ((0L, false)))
    assert(byId(5L)._1 == 3L && byId(5L)._2) //  all three 3-grams shared
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

  test("sequence packing cuts the per-lang concat stream at the token budget") {
    // lang "en": docs of 3,3,3,3 tokens, budget 5 → cum_before 0,3,6,9
    // → packs 0,0,1,1. A doc STARTING inside a pack belongs to it even
    // if it overflows the budget (concat-then-split semantics).
    val docs = Seq(
      (1L, "en", "a b c"),
      (2L, "en", "d e f"),
      (3L, "en", "g h i"),
      (4L, "en", "j k l"),
      (5L, "fr", "x y"),
    ).toDF("doc_id", "lang", "text")
    val out = TextOps.packSequences(docs, budget = 5L)
      .select("lang", "pack_id", "n_docs", "tokens", "first_doc", "last_doc")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", 0L, 2L, 6L, 1L, 2L),
      ("en", 1L, 2L, 6L, 3L, 4L),
      ("fr", 0L, 1L, 2L, 5L, 5L),
    ))
  }

  test("bpeMergeStep counts adjacent BPE-token pairs with multiplicity, top-k with deterministic ties") {
    // doc 1 tokens: [ab, ab, ab] → (ab,ab)×2; doc 2: [x, 1, x] →
    // (x,1), (1,x). Tie at count 1 breaks lexicographically: (1,x)
    // before (x,1).
    val docs = Seq((1L, "ab ab ab"), (2L, "x1x")).toDF("doc_id", "text")
    val out = TextOps.bpeMergeStep(docs, k = 2)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("ab", "ab", 2L), ("1", "x", 1L)))
    // Single-token and empty docs contribute no pairs (no negative-length
    // slice blowup).
    val degenerate = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(TextOps.bpeMergeStep(degenerate, k = 5).count() == 0)
  }

  test("bpeTrain matches a straight-line reference trainer round for round") {
    // Crafted so merges CASCADE: round 1 fuses (aa,bb) → aabb, later
    // rounds can fuse tokens earlier rounds created — the semantics
    // tx_bpe_merge's single-step counts cannot express.
    val texts = Seq(
      "aa bb aa bb cc dd",
      "aa bb aa bb aa",
      "xx yy xx yy xx yy zz",
      "aa bb cc dd",
    )
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rounds = 5
    val out = TextOps.bpeTrain(docs, rounds)
      .as[(Int, String, String, Long, Long)].collect().toSeq

    val pat = TextOps.BpePattern.r
    var streams = texts.map(t => pat.findAllIn(t).toVector)
    val ref = scala.collection.mutable.Buffer[(Int, String, String, Long, Long)]()
    for (step <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      streams.foreach(s => s.iterator.zip(s.iterator.drop(1)).foreach(p => counts(p) += 1))
      val ((a, b), c) = counts.toSeq.minBy { case ((ta, tb), n) => (-n, ta, tb) }
      // Greedy left-to-right non-overlapping fuse — what the bracket
      // string replace does per document.
      streams = streams.map { s =>
        val fused = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { fused += a + b; i += 2 }
          else { fused += s(i); i += 1 }
        }
        fused.toVector
      }
      ref += ((step, a, b, c, streams.map(_.length.toLong).sum))
    }
    assert(out == ref.toSeq)
    // The cascade actually happened: some later merge consumes a token
    // an EARLIER merge produced (multi-character growth) — otherwise
    // the corpus doesn't exercise what separates training from the
    // single-step count.
    val produced = scala.collection.mutable.Set[String]()
    var cascaded = false
    out.foreach { case (_, a, b, _, _) =>
      if (produced.contains(a) || produced.contains(b)) cascaded = true
      produced += (a + b)
    }
    assert(cascaded)
  }

  test("removeBoilerplate drops corpus-repeated segments and reassembles docs in order") {
    // width=2 segments: "the footer" appears in all 3 docs (> maxReps=2)
    // → dropped everywhere; unique segments survive in position order.
    val docs = Seq(
      (1L, "alpha beta the footer"),
      (2L, "the footer gamma delta"),
      (3L, "epsilon zeta the footer tail"),
    ).toDF("doc_id", "text")
    val out = TextOps.removeBoilerplate(docs, width = 2, maxReps = 2)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, "alpha beta"),
      (2L, 2L, 1L, "gamma delta"),
      (3L, 3L, 1L, "epsilon zeta tail"),
    ))
    // A doc that is ALL boilerplate comes back empty, not missing.
    val all = Seq((1L, "x y"), (2L, "x y"), (3L, "x y"), (4L, "x y")).toDF("doc_id", "text")
    val cleaned = TextOps.removeBoilerplate(all, width = 2, maxReps = 2)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(cleaned.size == 4 && cleaned.forall { case (_, n, d, t) => n == 1 && d == 1 && t == "" })
  }

  test("unigramRarity scores documents by corpus-trained inverse token probability") {
    // Corpus: a×2, b×2, c×1 → total 5. inv_p: a=2.5, b=2.5, c=5.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramRarity(docs)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 2.5, 2.5),
      (2L, 2L, (2.5 + 5.0) / 2, 5.0),
    ))
  }

  test("bpeEncode applies merges greedily left-to-right, in rank order, with cascade") {
    // "a a a a" under merge (a,a): greedy non-overlapping pass →
    // [aa][aa] (2 tokens, NOT 3 — the first match consumes both a's).
    // Then merge (aa,aa) cascades onto the previous merge's output.
    val docs = Seq((1L, "a a a a"), (2L, "a a a")).toDF("doc_id", "text")
    val out = TextOps
      .bpeEncode(docs, Seq(("a", "a"), ("aa", "aa")))
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    assert(out == Seq(
      (1L, 4L, 1L, "[aaaa]"), // [a][a][a][a] → [aa][aa] → [aaaa]
      (2L, 3L, 2L, "[aa][a]"), // greedy leftmost: third a survives
    ))
    // Merges containing brackets are rejected up front.
    intercept[IllegalArgumentException] {
      TextOps.bpeEncode(docs, Seq(("[", "a")))
    }
  }

  test("rejectReasons partitions the corpus by the FIRST failing rule") {
    val kept = (1 to 30).map(i => s"w$i").mkString(" ") // 30 unique tokens
    val short = "a b c"
    // 10 stopwords out of 25 → stop_ratio 0.4 fails BEFORE ttr (0.64 ok)
    val stoppy = (Seq.fill(10)("the") ++ (1 to 15).map(i => s"u$i")).mkString(" ")
    // all-stopword doc fails stop_ratio AND ttr → charged to stop_ratio
    val both = Seq.fill(25)("the").mkString(" ")
    val docs = Seq((1L, kept), (2L, short), (3L, stoppy), (4L, both))
      .toDF("doc_id", "text")
    val out = TextOps.rejectReasons(docs).as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("kept", 1L, 30L), ("stop_ratio", 2L, 50L), ("too_short", 1L, 3L)))
    assert(out.map(_._2).sum == 4L) // reasons partition the corpus
  }

  test("weightedSample selects the k smallest hash-priority u/w per source") {
    val docs = Seq(
      (1L, "s", 100L),
      (2L, "s", 1L),
      (3L, "s", 1000L),
    ).toDF("doc_id", "source", "n_chars")
    val P = 2147483647L
    def u(id: Long) = ((2654435761L % P) * id + 2245366891L % P) % P
    def pr(id: Long, w: Long) = u(id).toDouble / w.toDouble
    val expected = Seq(1L, 2L, 3L).map(i => (i, pr(i, Map(1L -> 100L, 2L -> 1L, 3L -> 1000L)(i))))
      .sortBy(_._2).take(2)
    val got = TextOps.weightedSample(docs, k = 2)
      .as[(String, Long, Double)].collect().toSeq.map(r => (r._2, r._3))
    assert(got == expected)
  }

  test("rejectOverlap reports every rule COMBINATION with kept at mask 0") {
    // d1: 21 distinct words → kept (mask 0). d2: 10 distinct non-stop
    // words → too_short only (mask 1). d3: 10 words, 6 stopwords →
    // too_short + stop_ratio (mask 5). d4: 210 copies of one word →
    // too_long + ttr (mask 10).
    val docs = Seq(
      (1L, (1 to 21).map(i => s"w$i").mkString(" ")),
      (2L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (3L, "the a of and in the w1 w2 w3 w4"),
      (4L, Seq.fill(210)("w").mkString(" ")),
    ).toDF("doc_id", "text")
    val got = TextOps.rejectOverlap(docs)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, false, false, false, false, 1L, 21L),
      (1L, true, false, false, false, 1L, 10L),
      (5L, true, false, true, false, 1L, 10L),
      (10L, false, true, false, true, 1L, 210L),
    ), got.mkString(", "))
  }

  test("mixByQuality fills the budget best-bin-first: full, partial boundary, zero") {
    // Distinct scores spread one doc per quantile bin; 17 tokens total,
    // budget = 17 DIV 2 = 8 → bin 4 (5 tokens) fully taken, bin 3
    // partially (3 of 4), bins 2 and 1 not at all.
    val docs = Seq(
      (1L, "a a a a", "web"), // score 0.25 → bin 1
      (2L, "a a b b", "web"), // score 0.50 → bin 2
      (3L, "a b c a", "web"), // score 0.75 → bin 3
      (4L, "a b c d e", "web"), // score 1.00 → bin 4
    ).toDF("doc_id", "text", "source")
    val got = TextOps.mixByQuality(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("web", 1L, 1L, 4L, 0L),
      ("web", 2L, 1L, 4L, 0L),
      ("web", 3L, 1L, 4L, 3L),
      ("web", 4L, 1L, 5L, 5L),
    ), got.mkString(", "))
  }

  test("artifact-served quality mix is bit-equal to the in-query-derivation twin") {
    // tx_quality_mix_indexed reads the persisted fullLshIndex _clusters
    // and the stored 1-row _weights artifact; tx_quality_mix re-derives
    // both in-query. Same oracle, and here: bit-equal frames — a drifted
    // stored weight row or a stale cluster assignment fails this before
    // the oracle does.
    val fns = Registry.queries
    val ref = fns("tx_quality_mix")(spark, Sf)
    val idx = fns("tx_quality_mix_indexed")(spark, Sf)
    assert(
      ref.exceptAll(idx).isEmpty && idx.exceptAll(ref).isEmpty,
      "artifact-served quality mix differs from the in-query twin")
  }

  test("artifact-served scoring and encoding are bit-equal to their train-in-query twins") {
    // tx_quality_scored_indexed reads the persisted 1-row _weights;
    // tx_bpe_encode_indexed reads the persisted merge table — both must
    // reproduce the faces that retrain in-query exactly.
    val fns = Registry.queries
    for ((ref, idx) <- Seq(
        "tx_quality_train_sampled" -> "tx_quality_scored_indexed",
        "tx_bpe_train_sampled" -> "tx_bpe_encode_indexed")) {
      val a = fns(ref)(spark, Sf)
      val b = fns(idx)(spark, Sf)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$idx differs from its in-query twin $ref")
    }
  }

  test("lmNextToken returns the argmax continuation with deterministic ties") {
    // Bigrams: (a,b)×2, (a,c)×2 → tie broken to smaller w2 = b;
    // denominator is a's count as bigram START (4), so p = 2/4.
    val docs = Seq((1L, "a b a c"), (2L, "a b a c x")).toDF("doc_id", "text")
    val out = TextOps
      .lmNextToken(docs, k = 1)
      .as[(String, String, Long, Double)]
      .collect()
      .toSeq
    assert(out == Seq(("a", "b", 2L, 0.5)))
  }
}

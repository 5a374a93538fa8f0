package graft

import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, HashOps}
import Tables.documents

/** Dedup operator semantics: portable hash against a Scala reference
  * implementation, keeper policy, and the LSH/blocking guarantees
  * (candidates agree with the exact baselines on real testdata).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Scala mirror of HashOps.polyHash. */
  private def polyHashRef(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % HashOps.P)

  test("polyHash matches the Scala reference fold") {
    val samples = Seq("", "a", "spark", "the quick brown fox", "a b c d e")
    val got = samples.toDF("s").select(HashOps.polyHash(col("s"))).as[Long].collect()
    // Spark sequence(1, 0) would be descending; empty strings aren't a
    // corpus case but polyHash("") must still not throw.
    samples.zip(got).drop(1).foreach { case (s, h) => assert(h == polyHashRef(s), s"for '$s'") }
  }

  test("exact dedup keeps min doc_id and counts copies") {
    val docs = Seq((10L, "aaa"), (3L, "aaa"), (5L, "bbb")).toDF("doc_id", "text")
    val out = DedupOps.exactDedup(docs).as[(Long, Long)].collect().toSeq
    assert(out == Seq((3L, 2L), (5L, 1L)))
  }

  test("identical texts have identical minhash signatures; disjoint texts share no minima") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w v u")).toDF("doc_id", "text")
    val sig = docs
      .select(col("doc_id"), HashOps.minhashSignature(HashOps.shingleHashes(col("text"), 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("prefix-filtered jaccard join equals brute-force all-pairs") {
    val sets = documents(spark, Sf)
      .select(col("doc_id"), HashOps.shingleHashes(col("text"), 3).as("sh"))
      .as[(Long, Seq[Long])].collect()
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = sa.toSet.intersect(sb.toSet).size
      j = inter.toDouble / (sa.size + sb.size - inter) if j >= 0.8
    } yield (a, b)).toSet
    val got = DedupOps.jaccardPairs(documents(spark, Sf), 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty && got == brute)
  }

  test("LSH candidates reproduce the exact jaccard pairs on testdata (recall = 1 here)") {
    val exact = DedupOps.jaccardPairs(documents(spark, Sf), 3, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = DedupOps.minhashLshPairs(documents(spark, Sf), 3, 32, 8, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain near-dup pairs")
    assert(lsh == exact)
  }

  test("simhash pigeonhole blocking is exact for hamming <= maxHamming") {
    val docs = documents(spark, Sf)
    val blocked = DedupOps.simhashPairs(docs, 32, 4, 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // Brute force over the fingerprints:
    val fp = DedupOps.simhashFingerprints(docs, 32).as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- fp; (b, hb) <- fp if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(blocked == brute)
  }

  test("connected components labels every node with its cluster's min id") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // component {1,2,3}
      (10L, 11L), // component {10,11}
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle {20,21,22}
    ).toDF("doc_a", "doc_b")
    val got = DedupOps.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("MinHashUnionAggregator (typed UDAF) equals the explode+min declarative twin") {
    import org.apache.spark.sql.functions.{udaf, posexplode, min => fmin}
    val sigs = documents(spark, Sf).select(
      col("source"),
      graft.expressions.SketchColumns
        .minHashSig(graft.expressions.SketchColumns.shingleHashes(col("text"), 3), 32).as("sig"),
    )
    val viaUdaf = sigs
      .groupBy("source")
      .agg(udaf(new graft.operators.MinHashUnionAggregator(32)).apply(col("sig")).as("gsig"))
      .as[(String, Seq[Long])].collect().toMap
    val viaExplode = sigs
      .select(col("source"), posexplode(col("sig")).as(Seq("i", "s")))
      .groupBy("source", "i").agg(fmin("s").as("m"))
      .as[(String, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(viaUdaf.nonEmpty && viaUdaf == viaExplode)
  }

  test("embedding near-dup pairs are symmetric-free (a < b) and above threshold") {
    val pairs = DedupOps.embeddingNearDupPairs(Tables.embeddings(spark, Sf), 0.4)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, c) => assert(a < b && c >= 0.4 && c <= 1.0 + 1e-9) }
  }

  test("registered dd_embed_neardup is a bucket equi-join (no BNLJ/cartesian), subset of all-pairs") {
    // The registered query must carry the 100 TB plan: candidate
    // generation via (band_idx, bucket) equi-join, never an O(n²) join.
    val bucketed = Registry.queries("dd_embed_neardup")(spark, Sf)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"cartesian-style plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian-style plan:\n$plan")
    val got = bucketed.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val allPairs = DedupOps.embeddingNearDupPairs(Tables.embeddings(spark, Sf), 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(got.nonEmpty, "bucketing should surface some near-dup candidates on testdata")
    assert(got.subsetOf(allPairs), "bucketed pairs must be a subset of the exact all-pairs result")
  }

  test("semantic contamination: cross-table only, flags subset of exact cross pairs, verdict total") {
    val verdict = Registry.queries("dd_contamination_semantic")(spark, Sf)
    val plan = verdict.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    val rows = verdict.as[(Long, Long, Double, Boolean)].collect()
    // Total over the corpus side; benchmark vectors never appear.
    val corpusIds = Tables.embeddings(spark, Sf)
      .filter(col("vec_id") % 10 =!= 0).select("vec_id").as[Long].collect().toSet
    assert(rows.map(_._1).toSet == corpusIds)
    assert(rows.exists(_._4), "testdata should surface some semantic leakage")
    // Every flagged vector must have a true cross (benchmark, corpus)
    // cosine ≥ threshold in the exact all-pairs result, with the same
    // worst cosine and a match count bounded by the exact count
    // (banding trades recall, never precision).
    val exact = DedupOps.embeddingNearDupPairs(Tables.embeddings(spark, Sf), 0.4)
      .as[(Long, Long, Double)].collect()
      .flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .collect { case (bench, corp, c) if bench % 10 == 0 && corp % 10 != 0 => (corp, bench, c) }
      .groupBy(_._1)
    rows.filter(_._4).foreach { case (id, n, maxCos, _) =>
      val hits = exact.getOrElse(id, Array.empty)
      assert(hits.nonEmpty, s"flagged $id has no exact cross pair")
      assert(n <= hits.length, s"$id: banded count $n exceeds exact ${hits.length}")
      assert(hits.map(_._3).max >= maxCos, s"$id: max_cosine above exact max")
    }
    rows.filterNot(_._4).foreach { case (_, n, maxCos, _) =>
      assert(n == 0L && maxCos == 0.0)
    }
  }

  test("dup-ngram fraction: copies score 1.0, unique text scores 0.0, overlap in between") {
    // Docs 1 and 2 are identical (every shingle duplicated); doc 3 is
    // disjoint; doc 4 shares exactly its first 3-gram window with doc 1
    // when n=3 over 6 tokens (4 positional shingles, 1 shared).
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "q r s t u v"),
      (4L, "a b c x y z"),
    ).toDF("doc_id", "text")
    val out = DedupOps.dupNgramStats(docs, 3)
      .as[(Long, Long, Long, Double)].collect().toMap2
    assert(out(1L) == ((4L, 4L, 1.0)))
    assert(out(2L) == ((4L, 4L, 1.0)))
    assert(out(3L) == ((4L, 0L, 0.0)))
    assert(out(4L) == ((4L, 1L, 0.25)))
  }

  test("dupSpans merges consecutive duplicated positions into maximal token spans") {
    // With n=2: docs 1 and 2 share the runs "a b c d" and "e f g h";
    // the interleaved "x y" in doc 2 splits them into two islands per
    // doc. Doc 4 shares only the single 2-gram "c d" — a 1-gram island,
    // dropped by minGrams=2. Doc 3 is disjoint — no rows at all.
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y e f g h"),
      (3L, "p q r s"),
      (4L, "c d z1 z2 z3"),
    ).toDF("doc_id", "text")
    val out = DedupOps.dupSpans(docs, n = 2, minGrams = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 3L, 4L, 3L), (1L, 4L, 7L, 4L, 3L),
      (2L, 0L, 3L, 4L, 3L), (2L, 6L, 9L, 4L, 3L),
    ))
  }

  test("edgeChecksum convergence test agrees with exact symmetric-except on random edge sets") {
    // connectedComponentsStars declares convergence when round N's edge
    // set checksums equal round N−1's; this pins the cheap (count,
    // hash-sum) aggregate to the exact two-way exceptAll test across
    // equal-reordered, mutated, subset, and disjoint random edge sets.
    val shuffler = new scala.util.Random(7)
    def randomEdges(seed: Int): Seq[(Long, Long)] = {
      val r = new scala.util.Random(seed)
      (0 until 3 + r.nextInt(20))
        .map(_ => (r.nextInt(10).toLong + 12, r.nextInt(10).toLong + 1))
        .distinct
    }
    for (seed <- 1 to 24) {
      val a = randomEdges(seed)
      val b = seed % 4 match {
        case 0 => shuffler.shuffle(a) // equal set, different order
        case 1 => randomEdges(seed + 1000) // independent set
        case 2 => a.tail // strict subset
        case _ => a.map { case (u, v) => (u + 100, v) } // same size, shifted
      }
      val dfA = a.toDF("u", "v")
      val dfB = b.toDF("u", "v")
      val cheap = DedupOps.edgeChecksum(dfA) == DedupOps.edgeChecksum(dfB)
      val exact = dfA.exceptAll(dfB).isEmpty && dfB.exceptAll(dfA).isEmpty
      assert(cheap == exact, s"seed=$seed\na=$a\nb=$b")
    }
  }

  test("semanticDedup drops cosine-near vectors only within their own cell, keeping the lowest id") {
    val vecs = Seq(
      (1L, "A", Seq(1f, 0f)), // kept (lowest id of the A-cell near-dup set)
      (2L, "A", Seq(1f, 0.01f)), // cos≈1 with 1 → removed, kept_by 1
      (3L, "A", Seq(0f, 1f)), // orthogonal → kept
      (4L, "B", Seq(1f, 0f)), // identical DIRECTION to 1 but other cell → kept
      (5L, "A", Seq(0.99f, 0.02f)), // near both 1 and 2 → removed, kept_by 1, n_dups 2
    ).toDF("vec_id", "cell", "embedding")
    val out = DedupOps.semanticDedup(vecs, col("cell"), threshold = 0.9)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((2L, 1L, 1L), (5L, 1L, 2L)))
  }

  test("nearDupAwareSplit never separates a near-dup cluster across train/val") {
    val docs = (1L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // Clusters {1,2,3}→1 and {7,8}→7; the rest unclustered.
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "component")
    val out = DedupOps.nearDupAwareSplit(docs, clusters, trainBuckets = 8, buckets = 10)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 20)
    val byDoc = out.map(r => r._1 -> r._4).toMap
    assert(Set(byDoc(1L), byDoc(2L), byDoc(3L)).size == 1, "cluster {1,2,3} split apart")
    assert(byDoc(7L) == byDoc(8L), "cluster {7,8} split apart")
    assert(out.forall(r => r._4 == "train" || r._4 == "val"))
    assert(out.forall(r => r._3 >= 0 && r._3 < 10))
    // Unclustered docs hash their own id.
    assert(out.filter(r => r._1 > 8).forall(r => r._2 == r._1))
  }

  test("keepBest keeps the highest-quality cluster member, unclustered docs always kept") {
    val docs = Seq(
      (1L, "short"), (2L, "much longer text here"), (3L, "much longer text too"),
      (4L, "standalone"),
    ).toDF("doc_id", "text")
    // One cluster {1,2,3}; quality = token count (2 and 3 tie at 4
    // tokens → min doc_id 2 wins).
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "component")
    val out = DedupOps.keepBest(docs, clusters, size(split(col("text"), " ")).cast("long"))
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true))
  }

  test("lshContamination flags corpus near-dups of benchmark docs, verdict total") {
    val benchText = (1 to 25).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, benchText), // benchmark (doc_id % 10 == 0)
      (11L, benchText), // corpus copy of a benchmark item → contaminated
      (12L, (1 to 25).map(i => s"z$i").mkString(" ")), // unrelated → clean
    ).toDF("doc_id", "text")
    val out = DedupOps
      .lshContamination(docs, col("doc_id") % 10 === 0, n = 3, k = 32, bands = 8, 0.8)
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    // Verdict covers every NON-benchmark doc; the copy matches with
    // jaccard 1.0, the unrelated doc carries zeros.
    assert(out == Seq((11L, 1L, 1.0, true), (12L, 0L, 0.0, false)))
  }

  implicit private class Tup4Map(rows: Array[(Long, Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Long, Double)] =
      rows.map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
  }
}

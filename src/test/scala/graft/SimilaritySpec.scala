package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps
import Tables.embeddings

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("unitNorm produces unit-length vectors") {
    val norms = embeddings(spark, Sf)
      .select(SimilarityOps.unitNorm(col("embedding")).as("u"))
      .select(sqrt(aggregate(transform(col("u"), x => x * x), lit(0.0), (a, v) => a + v)))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }

  test("codegen'd UnitNorm is bit-identical to the declarative HOF form") {
    // The expression replaced this exact HOF composition (strict
    // left-fold sum of squares, then per-element divide) for speed; the
    // doubles must stay bit-equal or oracle parity across the whole
    // sim_*/dd_embed/mm_embed family breaks.
    def hofNorm(vec: org.apache.spark.sql.Column) = {
      val d = transform(vec, x => x.cast("double"))
      val n = sqrt(aggregate(transform(d, x => x * x), lit(0.0), (acc, v) => acc + v))
      transform(d, x => x / n)
    }
    val both = embeddings(spark, Sf)
      .select(
        SimilarityOps.unitNorm(col("embedding")).as("fast"),
        hofNorm(col("embedding")).as("ref"),
      )
      .as[(Seq[Double], Seq[Double])].collect()
    both.foreach { case (fast, ref) =>
      assert(fast.length == ref.length)
      fast.zip(ref).foreach { case (f, r) =>
        assert(java.lang.Double.doubleToRawLongBits(f) == java.lang.Double.doubleToRawLongBits(r))
      }
    }
    // Degenerate inputs behave like the HOF form: zero vector → NaN
    // elements, null array → null, double input accepted unchanged.
    val edge = Seq(
      (1L, Some(Seq(0f, 0f))),
      (2L, None),
      (3L, Some(Seq(3f, 4f))),
    ).toDF("id", "v")
    val out = edge
      .select(col("id"), SimilarityOps.unitNorm(col("v")).as("u"))
      .orderBy("id").as[(Long, Option[Seq[Double]])].collect()
    assert(out(0)._2.get.forall(_.isNaN))
    assert(out(1)._2.isEmpty)
    assert(out(2)._2.get == Seq(0.6, 0.8))
    val dbl = Seq(Seq(3.0, 4.0)).toDF("v")
      .select(SimilarityOps.unitNorm(col("v")).as("u")).as[Seq[Double]].head()
    assert(dbl == Seq(0.6, 0.8))
  }

  test("brute-force top-k matches a driver-side reference computation") {
    val vecs = embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        val d = v.map(_.toDouble).toArray
        val n = math.sqrt(d.map(x => x * x).sum)
        id -> d.map(_ / n)
      }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum

    val expected = (0L until 10L).flatMap { q =>
      vecs.toSeq
        .filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(5)
        .zipWithIndex
        .map { case ((id, _), i) => (q, id, i + 1) }
    }.toSet

    val got = SimilarityOps.bruteForceTopK(embeddings(spark, Sf), col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("LSH bucket results are a subset of same-bucket exact scoring") {
    val dims = 0 until 64 by 8
    val buckets = embeddings(spark, Sf)
      .select(col("vec_id"), SimilarityOps.signBucket(col("embedding"), dims).as("b"))
      .as[(Long, Long)].collect().toMap
    val got = SimilarityOps.lshBucketTopK(embeddings(spark, Sf), col("vec_id") < 10, dims, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    got.foreach { case (q, n) => assert(buckets(q) == buckets(n), s"$q and $n must share a bucket") }
  }

  test("IVF cell search never leaves the query's cell") {
    val labels = embeddings(spark, Sf)
      .select(col("vec_id"), col("label")).as[(Long, Int)].collect().toMap
    val got = SimilarityOps.ivfTopK(embeddings(spark, Sf), col("vec_id") < 10, col("label"), 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, n) => assert(labels(q) == labels(n)) }
  }

  test("multi-probe stays within Hamming-1 buckets and dominates single-probe recall") {
    val dims = 0 until 64 by 8
    val buckets = embeddings(spark, Sf)
      .select(col("vec_id"), SimilarityOps.signBucket(col("embedding"), dims).as("b"))
      .as[(Long, Long)].collect().toMap
    val multi = SimilarityOps.multiProbeTopK(embeddings(spark, Sf), col("vec_id") < 10, dims, 3)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    multi.foreach { case (q, n, _) =>
      assert(java.lang.Long.bitCount(buckets(q) ^ buckets(n)) <= 1, s"$q/$n differ in >1 bit")
    }
    // Widening the probe set can only improve (or tie) each query's
    // k-th best score — multi-probe's candidates are a superset.
    val single = SimilarityOps.lshBucketTopK(embeddings(spark, Sf), col("vec_id") < 10, dims, 3)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    val bestM = multi.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    single.groupBy(_._1).foreach { case (q, rows) =>
      assert(bestM(q) >= rows.map(_._3).max - 1e-15)
    }
  }

  test("int8 quantization matches a driver-side reference, including the zero vector") {
    val ref = embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        val e = v.map(_.toDouble)
        val maxabs = e.map(math.abs).max
        val scale = maxabs / 127.0
        val q = if (maxabs == 0) e.map(_ => 0L)
                else e.map(x => math.floor(x / scale + 0.5).toLong)
        assert(q.forall(c => math.abs(c) <= 127))
        val checksum = q.zipWithIndex.map { case (c, i) => c * (i + 1) }.sum
        val maxErr = e.zip(q).map { case (x, c) => math.abs(x - c * scale) }.max
        id -> ((scale, checksum, q.count(c => math.abs(c) == 127).toLong, maxErr))
      }.toMap
    val got = SimilarityOps.quantizeInt8(embeddings(spark, Sf))
      .as[(Long, Double, Long, Long, Double)].collect()
    assert(got.length == ref.size)
    got.foreach { case (id, scale, checksum, nSat, maxErr) =>
      val (rs, rc, rn, re) = ref(id)
      assert(scale == rs && checksum == rc && nSat == rn && maxErr == re, s"vec $id")
    }
    // Zero vector → scale 0, all-zero codes, zero error.
    val z = Seq((1L, Seq(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zr = SimilarityOps.quantizeInt8(z).as[(Long, Double, Long, Long, Double)].head()
    assert(zr == ((1L, 0.0, 0L, 0L, 0.0)))
  }

  test("pqEncode packs per-block nearest-codebook ids and exact reconstruction error") {
    // 4-dim vectors, 2 blocks × 2 dims, 2 seeds (ids 0, 1).
    val vecs = Seq(
      (0L, Seq(0f, 0f, 10f, 10f)), // seed 0: codebook blocks (0,0) and (10,10)
      (1L, Seq(10f, 10f, 0f, 0f)), // seed 1: codebook blocks (10,10) and (0,0)
      (2L, Seq(1f, 0f, 1f, 0f)), // blk0→seed0 (d²=1), blk1→seed1 (d²=1) → code 0+1·2=2
      (3L, Seq(9f, 9f, 9f, 9f)), // blk0→seed1 (d²=2), blk1→seed0 (d²=2) → code 1+0·2=1
      (4L, Seq(5f, 5f, 5f, 5f)), // equidistant both blocks → ties to seed 0 → code 0
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps
      .pqEncode(vecs, blocks = 2, subDim = 2, isSeed = col("vec_id") < 2, nSeeds = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(2L) == ((2L, 2.0)))
    assert(out(3L) == ((1L, 4.0)))
    assert(out(4L) == ((0L, 100.0))) // d² = 25+25 per block, both blocks
    assert(out(0L) == ((0L, 0.0))) // both blocks its own codebook entry
    assert(out(1L) == ((3L, 0.0))) // seed 1 in both blocks: 1 + 1·2
  }

  test("pqAdcTopK scores via the code LUT: ADC distance equals codebook distance of the decoded codes") {
    // Same corpus as the pqEncode test. ADC(q, x) must equal the sum of
    // squared-L2 between q's block and the CODEBOOK block x's code
    // selects (not x itself) — computed here by hand from the known
    // codes.
    val vecs = Seq(
      (0L, Seq(0f, 0f, 10f, 10f)),
      (1L, Seq(10f, 10f, 0f, 0f)),
      (2L, Seq(1f, 0f, 1f, 0f)), // codes: blk0→0, blk1→1
      (3L, Seq(9f, 9f, 9f, 9f)), // codes: blk0→1, blk1→0
      (4L, Seq(5f, 5f, 5f, 5f)), // codes: 0, 0
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps
      .pqAdcTopK(vecs, blocks = 2, subDim = 2, isSeed = col("vec_id") < 2, nSeeds = 2,
        isQuery = col("vec_id") === 2L, k = 4)
      .as[(Long, Long, Double, Int)].collect().toSeq
    // Query 2's blocks: (1,0) and (1,0). Codebook blocks: seed0 = (0,0),(10,10);
    // seed1 = (10,10),(0,0).
    // LUT: blk0: code0 → 1, code1 → 181; blk1: code0 → 181, code1 → 1.
    // ADC to 0 (codes 0,0): 1 + 181 = 182;  to 1 (codes 1,1): 181 + 1 = 182;
    // to 3 (codes 1,0): 181 + 181 = 362;    to 4 (codes 0,0): 182.
    assert(out.map(r => (r._2, r._3)) == Seq((0L, 182.0), (1L, 182.0), (4L, 182.0), (3L, 362.0)))
    assert(out.map(_._4) == Seq(1, 2, 3, 4))
    assert(out.forall(_._1 == 2L))
  }

  test("kmeansStep assigns each vector to its nearest seed (ties to lower seed id) and emits fold-mean centroids") {
    val vecs = Seq(
      (0L, Seq(0f, 0f)), // seed 0
      (1L, Seq(10f, 0f)), // seed 1
      (2L, Seq(1f, 1f)), // nearest seed 0
      (3L, Seq(9f, 1f)), // nearest seed 1
      (4L, Seq(5f, 0f)), // equidistant → tie broken to seed 0
    ).toDF("vec_id", "embedding")
    val out = SimilarityOps.kmeansStep(vecs, col("vec_id") < 2)
      .as[(Long, Int, Double, Long)].collect()
      .map { case (c, dim, v, n) => (c, dim) -> ((v, n)) }.toMap
    assert(out((0L, 1)) == (((0.0 + 1.0 + 5.0) / 3, 3L)))
    assert(out((0L, 2)) == (((0.0 + 1.0 + 0.0) / 3, 3L)))
    assert(out((1L, 1)) == (((10.0 + 9.0) / 2, 2L)))
    assert(out((1L, 2)) == (((0.0 + 1.0) / 2, 2L)))
    assert(out.size == 4)
  }

  test("PQ/kmeans argmin plans carry no Window node — partial aggregation only") {
    // The nearest-centroid argmin must be a min(struct(dist, id))
    // aggregate (map-side combinable: one exchanged row per key) rather
    // than a row_number window (which shuffles AND sorts every candidate
    // row — nSeeds× the data at a production codebook size). Pinned at
    // the optimized-plan level like LshIndexSpec pins exchange-freeness.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    def nWindows(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.size
    val emb = embeddings(spark, Sf)
    assert(nWindows(SimilarityOps.kmeansStep(emb, col("vec_id") < 8)) == 0)
    assert(nWindows(SimilarityOps.pqEncode(emb, 4, 16, col("vec_id") < 8, 8)) == 0)
    // The whole ANN read-path family is window-free: the per-query
    // top-k is the bounded-heap TopKPairs aggregate (map-side combine,
    // k rows per (partition, query) exchanged), not a row_number window
    // that would shuffle every scored candidate onto the skewed
    // query_id key.
    assert(nWindows(SimilarityOps.pqAdcTopK(emb, 4, 16, col("vec_id") < 8, 8,
      col("vec_id") < 10, 5)) == 0)
    assert(nWindows(SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 5)) == 0)
    assert(nWindows(SimilarityOps.lshBucketTopK(emb, col("vec_id") < 10, Seq(1, 2, 3), 5)) == 0)
    assert(nWindows(SimilarityOps.multiProbeTopK(emb, col("vec_id") < 10, Seq(1, 2, 3), 5)) == 0)
    assert(nWindows(SimilarityOps.ivfTopK(emb, col("vec_id") < 10, col("label"), 5)) == 0)
    // And the top-k aggregate actually partial-aggregates: the physical
    // plan carries bounded_top_k in BOTH partial (map-side, before the
    // exchange) and final mode — the whole point of replacing the window.
    val phys = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .queryExecution.executedPlan.toString
    assert(phys.contains("partial_bounded_top_k"), s"no map-side combine in:\n$phys")
    assert(phys.contains("bounded_top_k"))
  }

  test("assignCells: corpus never shuffles for assignment, codebook broadcasts, no Window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val emb = embeddings(spark, Sf)
    val cb = SimilarityOps.trainCodebook(emb, blocks = 1, subDim = 64,
      isSeed = col("vec_id") < 8, iters = 2)
    val assigned = SimilarityOps.assignCells(emb, cb)
    // Correctness: a partition of the corpus, one cell per vector, cells
    // drawn from the trained centroid ids (seed ids 0..7).
    val cells = assigned.select("vec_id", "cell").as[(Long, Long)].collect()
    assert(cells.length == emb.count() && cells.map(_._1).distinct.length == cells.length)
    assert(cells.forall(_._2 < 8))
    // Plan: the argmin is a min(struct) aggregate (no Window), the
    // codebook side broadcasts, and the corpus is never shuffled into
    // the join (no shuffled join operator anywhere).
    assert(assigned.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"codebook should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus must not shuffle for assignment:\n$plan")
  }

  test("trained-IVF multi-probe recall dominates single-probe per query and stays window-free") {
    import spark.implicits._
    val emb = embeddings(spark, Sf)
    val cb = SimilarityOps.trainCodebook(emb, blocks = 1, subDim = 64,
      isSeed = col("vec_id") < 8, iters = 2)
    val exact = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .filter(exact.contains).groupBy(_._1).view.mapValues(_.length).toMap
    val withCell = emb.join(SimilarityOps.assignCells(emb, cb), "vec_id")
    val single = hits(SimilarityOps.ivfTopK(withCell, col("vec_id") < 10, col("cell"), 3))
    val multi = SimilarityOps.ivfMultiProbeTopK(emb, cb, nprobe = 2, col("vec_id") < 10, 3)
    val multiHits = hits(multi)
    (0L until 10L).foreach { q =>
      assert(multiHits.getOrElse(q, 0) >= single.getOrElse(q, 0),
        s"query $q: multi-probe recall fell below single-probe")
    }
    assert(multiHits.values.sum > single.values.sum,
      "2 probes of 8 cells should strictly improve total recall on this corpus")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(multi.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty)
  }

  test("trainCodebook reduces total PQ reconstruction error (Lloyd monotonicity) and plugs into ADC") {
    val emb = embeddings(spark, Sf)
    val seedErr = SimilarityOps
      .pqEncode(emb, 4, 16, isSeed = col("vec_id") < 8, nSeeds = 8)
      .agg(sum("recon_err")).as[Double].head()
    val cb = SimilarityOps.trainCodebook(emb, 4, 16, isSeed = col("vec_id") < 8, iters = 2)
    val trainedErr = SimilarityOps
      .pqEncode(emb, 4, 16, codebook = cb, nSeeds = 8)
      .agg(sum("recon_err")).as[Double].head()
    // Each Lloyd step (assignment, then mean update) is non-increasing
    // in total inertia, and the final encode IS an assignment step — so
    // the trained codebook can never reconstruct worse than the seeds.
    assert(trainedErr <= seedErr + 1e-9, s"trained $trainedErr vs seed $seedErr")
    assert(trainedErr < seedErr * 0.9, "training should materially improve reconstruction here")
    // The trained frame drops straight into the ADC read path.
    val adc = SimilarityOps.pqAdcTopK(emb, 4, 16, cb, 8, isQuery = col("vec_id") < 3, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(adc.length == 15)
    assert(adc.groupBy(_._1).forall(_._2.map(_._3).toList.sorted == List(1, 2, 3, 4, 5)))
  }

  test("kmeansStep over testdata: clusters partition the corpus and every vector joins its closest seed") {
    val emb = embeddings(spark, Sf)
    val out = SimilarityOps.kmeansStep(emb, col("vec_id") < 8)
      .select("cluster", "n").distinct()
      .as[(Long, Long)].collect()
    assert(out.map(_._2).sum == emb.count(), "cluster sizes must partition the corpus")
    assert(out.forall { case (c, _) => c >= 0 && c < 8 })
  }

  test("ivfPqTopK: nprobe=#cells degenerates to trained ADC; probed search stays in probed cells, window-free") {
    val emb = embeddings(spark, Sf)
    val coarse = SimilarityOps.trainCodebook(emb, blocks = 1, subDim = 64,
      isSeed = col("vec_id") < 8, iters = 2)
    val pq = SimilarityOps.trainCodebook(emb, blocks = 4, subDim = 16,
      isSeed = col("vec_id") < 8, iters = 2)
    // With every cell probed, the cell restriction admits the whole
    // corpus and IVF-PQ IS the trained ADC scan — identical rows,
    // identical fold-order doubles, identical tie-broken ranks.
    val full = SimilarityOps.ivfPqTopK(emb, coarse, pq, blocks = 4, subDim = 16,
      nSeeds = 8, nprobe = 8, isQuery = col("vec_id") < 10, k = 5)
      .select("query_id", "neighbor_id", "approx_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val adc = SimilarityOps.pqAdcTopK(emb, 4, 16, pq, 8, isQuery = col("vec_id") < 10, k = 5)
      .select("query_id", "neighbor_id", "approx_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == adc, "nprobe=#cells must reproduce the unrestricted trained-ADC results")
    // nprobe=2: every returned neighbor's cell is one of its query's
    // two probed cells, and the plan is window-free with a map-side
    // partial bounded top-k.
    val probed = SimilarityOps.ivfPqTopK(emb, coarse, pq, blocks = 4, subDim = 16,
      nSeeds = 8, nprobe = 2, isQuery = col("vec_id") < 10, k = 5)
    val cells = SimilarityOps.assignCells(emb, coarse)
      .as[(Long, Long)].collect().toMap
    val dists = emb.crossJoin(broadcast(coarse.select(col("cid"), col("cv"))))
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("cid"),
        aggregate(zip_with(transform(col("embedding"), x => x.cast("double")), col("cv"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, d) => a + d))
      .as[(Long, Long, Double)].collect()
    val probeSets = dists.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._3, r._2)).take(2).map(_._2).toSet).toMap
    val rows = probed.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, n) =>
      assert(probeSets(q).contains(cells(n)), s"neighbor $n of query $q is outside its probed cells")
    }
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(probed.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty)
    assert(probed.queryExecution.executedPlan.toString.contains("partial_bounded_top_k"))
  }

  test("ivfPqResidualTopK is bit-identical to a driver-side recompute of the probed residual-ADC scan") {
    val emb = embeddings(spark, Sf)
    val coarse = SimilarityOps.trainCodebook(emb, blocks = 1, subDim = 64,
      isSeed = col("vec_id") < 8, iters = 2)
    val out = SimilarityOps.ivfPqResidualTopK(emb, coarse, blocks = 4, subDim = 16,
      nSeeds = 8, nprobe = 2, isSeed = col("vec_id") < 8, iters = 2,
      isQuery = col("vec_id") < 10, k = 5)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(out.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty)
    assert(out.queryExecution.executedPlan.toString.contains("partial_bounded_top_k"))
    val got = out.select("query_id", "neighbor_id", "approx_dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

    // Driver recompute, mirroring every fold order. The PQ codebook is
    // rebuilt through the same trainCodebook entry point over an
    // externally-derived residual frame (training itself is pinned by
    // the sim_pq_train oracle); the read path — cells, codes, probes,
    // per-cell LUTs, block-ordered sums, tie-broken ranks — is redone
    // in plain Scala.
    def l2(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
    val vecs = emb.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")))
      .as[(Long, IndexedSeq[Double])].collect().toMap
    val coarseCvs = coarse.select(col("cid"), col("cv"))
      .as[(Long, IndexedSeq[Double])].collect().toMap
    def argminCell(e: IndexedSeq[Double]): Long =
      coarseCvs.toSeq.map { case (cid, cv) => (l2(e, cv), cid) }.min._2
    val cellOf = vecs.map { case (v, e) => v -> argminCell(e) }
    val resOf = vecs.map { case (v, e) =>
      v -> e.indices.map(i => e(i) - coarseCvs(cellOf(v))(i))
    }
    val resFrame = emb
      .join(SimilarityOps.assignCells(emb, coarse), "vec_id")
      .join(broadcast(coarse.select(col("cid").as("cell"), col("cv"))), "cell")
      .select(col("vec_id"),
        zip_with(transform(col("embedding"), x => x.cast("double")), col("cv"), (x, y) => x - y)
          .as("embedding"))
    val pqCvs = SimilarityOps.trainCodebook(resFrame, blocks = 4, subDim = 16,
      isSeed = col("vec_id") < 8, iters = 2)
      .select(col("blk"), col("cid"), col("cv"))
      .as[(Int, Long, IndexedSeq[Double])].collect()
      .map { case (b, c, cv) => (b.toLong, c) -> cv }.toMap
    def sub(e: IndexedSeq[Double], blk: Long): IndexedSeq[Double] =
      e.slice(blk.toInt * 16, blk.toInt * 16 + 16)
    val codeOf: Map[(Long, Long), Long] = resOf.flatMap { case (v, r) =>
      (0L until 4L).map { b =>
        (v, b) -> pqCvs.collect { case ((bb, c), cv) if bb == b => (l2(sub(r, b), cv), c) }.min._2
      }
    }
    val expected = (0L until 10L).flatMap { q =>
      val probes = coarseCvs.toSeq
        .map { case (cid, cv) => (l2(vecs(q), cv), cid) }.sorted.take(2).map(_._2)
      val cand = vecs.keys.filter(v => v != q && probes.contains(cellOf(v)))
      val scoredQ = cand.map { v =>
        val qres = vecs(q).indices.map(i => vecs(q)(i) - coarseCvs(cellOf(v))(i))
        val d = (0L until 4L).map(b => l2(sub(qres, b), pqCvs((b, codeOf((v, b))))))
          .foldLeft(0.0)(_ + _)
        (v, d)
      }.toSeq
      scoredQ.sortBy { case (v, d) => (d, v) }.take(5).zipWithIndex
        .map { case ((v, d), i) => (q, v, d, i + 1) }
    }.toSet
    assert(got == expected, "probed residual-ADC results must match the driver recompute bit-for-bit")
  }

  test("rerankExact: exact-cosine re-rank of ADC candidates dominates plain ADC per query, window-free") {
    import spark.implicits._
    val emb = embeddings(spark, Sf)
    val cb = SimilarityOps.trainCodebook(emb, blocks = 4, subDim = 16,
      isSeed = col("vec_id") < 8, iters = 2)
    val exact = SimilarityOps.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def hits(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
        .filter(exact.contains).groupBy(_._1).view.mapValues(_.length).toMap
    val adc5 = SimilarityOps.pqAdcTopK(emb, blocks = 4, subDim = 16, codebook = cb,
      nSeeds = 8, isQuery = col("vec_id") < 10, k = 5)
    val cand = SimilarityOps.pqAdcTopK(emb, blocks = 4, subDim = 16, codebook = cb,
      nSeeds = 8, isQuery = col("vec_id") < 10, k = 20)
    val rr = SimilarityOps.rerankExact(emb, cand, 5)
    // Re-rank must return candidate rows only, exactly k per query, and
    // its exact-top-5 hit count can never fall below plain ADC@5's:
    // ADC@5 ⊆ the candidate set, and an exact top-5 member among the
    // candidates is outranked only by other exact top-5 members.
    val candSet = cand.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rrRows = rr.select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(rrRows.toSet.subsetOf(candSet), "re-rank emitted a non-candidate row")
    assert(rrRows.groupBy(_._1).values.forall(_.length == 5))
    val adcHits = hits(adc5)
    val rrHits = hits(rr)
    (0L until 10L).foreach { q =>
      assert(rrHits.getOrElse(q, 0) >= adcHits.getOrElse(q, 0),
        s"query $q: re-rank recall fell below plain ADC")
    }
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    assert(rr.queryExecution.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "re-rank top-k must be the bounded-heap aggregate, not a window")
  }

  test("mmrTopK demotes a near-copy of the first pick in favor of a diverse candidate") {
    import spark.implicits._
    // Query q = e1. b is the most relevant; a is b's near-copy (same
    // e1+e2 quadrant, cosine ≈ 0.99995); c matches q equally well but
    // from the OPPOSITE e2 half-plane (cosine to b ≈ 0.63). Plain
    // top-3 ranks by relevance alone → (b, a, c). MMR picks b, then
    // the 0.25·max-sim penalty (≈0.25 for the near-copy vs ≈0.157 for
    // c) flips round 2 to the diverse c → (b, c, a).
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val emb = Seq(
      0L -> vec(0 -> 1f), // the query
      1L -> vec(0 -> 0.9f, 1 -> 0.436f), // a: b's near-copy
      2L -> vec(0 -> 0.91f, 1 -> 0.43f), // b: most relevant
      3L -> vec(0 -> 0.9f, 1 -> -0.436f), // c: as relevant as a, diverse from a/b
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.mmrTopK(emb, col("vec_id") === 0, candK = 3, k = 3, lambda = 0.75)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(2L, 3L, 1L),
      s"MMR order must be most-relevant, then diverse, then the near-copy: $got")
    // Sanity: plain top-3 puts the near-copy second — the behavior MMR exists to fix.
    val plain = SimilarityOps.bruteForceTopK(emb, col("vec_id") === 0, 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(plain.map(_._2) == Seq(2L, 1L, 3L))
  }

  test("knnClassify: majority vote wins, vote ties go to the smallest label") {
    def vec(hot: Int) = Array.tabulate(4)(i => if (i == hot) 1f else 0.001f * (i + 1))
    // Query 0 sits on axis 0; neighbors on axis 0 carry label 7 (two of
    // them) vs label 3 (one) → majority 7. Query 10 sits on axis 1 with
    // a 1-1 vote split between labels 5 and 2 → tie → smaller label 2.
    val emb = Seq(
      (0L, vec(0), 3), (1L, vec(0), 7), (2L, vec(0), 7), (3L, vec(0), 3),
      (10L, vec(1), 2), (11L, vec(1), 5), (12L, vec(1), 2),
    ).toDF("vec_id", "embedding", "label")
    val k3 = SimilarityOps.knnClassify(emb, col("vec_id") === 0, k = 3)
      .collect().head
    assert(k3.getAs[Int]("predicted_label") == 7)
    assert(k3.getAs[Long]("n_votes") == 2L)
    assert(k3.getAs[Int]("true_label") == 3 && !k3.getAs[Boolean]("correct"))
    val tied = SimilarityOps.knnClassify(emb, col("vec_id") === 10, k = 2)
      .collect().head
    assert(tied.getAs[Int]("predicted_label") == 2)
    assert(tied.getAs[Long]("n_votes") == 1L)
    assert(tied.getAs[Boolean]("correct"))
  }

  test("linearProbe: separable classes classify perfectly with opposite-sign margins") {
    // Class 0 clusters near (+1, 0), class 1 near (−1, 0) — linearly
    // separable, so the midpoint-threshold rule gets every row right
    // and the mean margins are symmetric-ish and opposite in sign.
    val emb = Seq(
      (1L, Seq(1.0f, 0.1f), 0L),
      (2L, Seq(0.9f, -0.1f), 0L),
      (3L, Seq(-1.0f, 0.2f), 1L),
      (4L, Seq(-0.8f, 0.0f), 1L),
      (5L, Seq(9.9f, 9.9f), 2L), // other labels are excluded from the probe
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.linearProbe(emb, a = 0L, b = 1L)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2, r._3)) == Seq((0L, 2L, 2L), (1L, 2L, 2L)))
    assert(out(0)._4 > 0 && out(1)._4 < 0)
  }
}

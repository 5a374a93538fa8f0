package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), pure Catalyst higher-order functions — no UDFs, so
  * every arithmetic step stays inside whole-stage codegen.
  *
  * Float→double casts are exact and both the dot product and the norm
  * are strict left folds, so scores are bit-reproducible — the DuckDB
  * oracle reproduces identical doubles, making even top-k *order*
  * deterministic across engines (ties broken by neighbor id).
  *
  * Scale design: brute-force top-k is the correctness baseline (and is
  * how the verify stage scores candidates); the scale paths bucket the
  * corpus first — sign-LSH (axis-aligned random hyperplanes) or an IVF
  * coarse partition — so the per-query work is one bucket, not the
  * corpus, and the query set is always the broadcast side of the join.
  */
object SimilarityOps {

  /** Strict left-fold dot product of two equal-length double arrays —
    * a codegen'd custom Expression (see [[graft.expressions.ArrayDot]]);
    * semantically the `aggregate(zip_with(...))` fold, ~100× cheaper on
    * the per-pair hot path.
    */
  def dot(a: Column, b: Column): Column = graft.expressions.ArrayDot(a, b)

  /** Cast to double and scale to unit L2 norm — cosine then reduces to a
    * plain dot product (one division per element up front, not per pair).
    * Codegen'd custom Expression ([[graft.expressions.UnitNorm]]): the
    * equivalent `transform(d, x => x / sqrt(aggregate(...)))` HOF form
    * interprets nested lambdas and re-evaluates the norm subtree per
    * element — O(dim²) interpreted work per row, the dominant cost of
    * the whole sim_* family before the switch.
    */
  def unitNorm(vec: Column): Column = graft.expressions.UnitNorm(vec)

  /** Brute-force cosine top-k: query rows (selected by `isQuery`) joined
    * against the whole corpus. The query side is small by construction —
    * Spark broadcasts it; the corpus is never shuffled.
    */
  def bruteForceTopK(embeddings: DataFrame, isQuery: Column, k: Int): DataFrame = {
    val v = embeddings.select(col("vec_id"), unitNorm(col("embedding")).as("u"))
    val queries = broadcast(
      v.filter(isQuery).select(col("vec_id").as("query_id"), col("u").as("qu")),
    )
    val scored = queries
      .join(v, col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        dot(col("qu"), col("u")).as("cosine"),
      )
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Sign-LSH bucket id: one bit per probe dimension (axis-aligned
    * hyperplane at 0), folded MSB→LSB. Deterministic and portable — the
    * oracle derives identical buckets.
    */
  def signBucket(vec: Column, probeDims: Seq[Int]): Column =
    probeDims.foldLeft(lit(0L)) { (acc, d) =>
      acc * 2 + when(element_at(vec, d + 1) > 0f, 1L).otherwise(0L)
    }

  /** LSH-bucketed ANN: search only the query's sign bucket. The join is
    * an equi-join on the bucket id — at 100 TB this shuffles each corpus
    * row once into its bucket, instead of scoring the full corpus per
    * query. Recall < 1 by design; the exact baseline is the oracle for
    * effectiveness, this operator's oracle mirrors the bucketing itself.
    */
  def lshBucketTopK(embeddings: DataFrame, isQuery: Column, probeDims: Seq[Int], k: Int): DataFrame = {
    val v = embeddings.select(
      col("vec_id"),
      unitNorm(col("embedding")).as("u"),
      signBucket(col("embedding"), probeDims).as("bucket"),
    )
    val queries = broadcast(
      v.filter(isQuery)
        .select(col("vec_id").as("query_id"), col("u").as("qu"), col("bucket")),
    )
    val scored = queries
      .join(v, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        dot(col("qu"), col("u")).as("cosine"),
      )
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** IVF training step: per-cell centroid of the (double-cast) vectors,
    * long-form output (cell, dim, centroid, n). The mean is an ordered
    * left fold over vec_id divided by the count — deterministic doubles
    * (a plain avg() would float with partition order), so the oracle
    * reproduces them bit-for-bit. One shuffle on (cell, dim); at scale
    * the fold-based mean would switch to a mergeable (sum, count) pair
    * per partition with a documented tolerance instead.
    */
  def centroids(embeddings: DataFrame, cell: Column): DataFrame =
    embeddings
      .select(
        col("vec_id"),
        cell.as("label"),
        posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("pos", "xd")),
      )
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"), col("xd"))
      .groupBy(col("label"), col("dim"))
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("vec_id"), col("xd")))), s => s.getField("xd")),
          lit(0.0),
          (acc, v) => acc + v,
        ).as("sum_xd"),
        count(lit(1)).as("n"),
      )
      .select(
        col("label"),
        col("dim"),
        (col("sum_xd") / col("n")).as("centroid"),
        col("n"),
      )
      .orderBy("label", "dim")

  /** The 100 TB centroid path: the mean as a mergeable (sum, count)
    * aggregate (map-side-combinable partials, O(1) state per group) —
    * what replaces [[centroids]]' O(cell)-state ordered fold at scale —
    * adjudicated in the same pass against the bit-reproducible fold
    * under a tolerance contract: output carries the exact fold value
    * plus a `within_tol` boolean (|mergeable − exact| ≤ tol), so the
    * oracle (exact value + literal true) stays hash-checkable while the
    * production aggregate is the mergeable one.
    */
  def centroidsWithMergeCheck(embeddings: DataFrame, cell: Column, tol: Double): DataFrame =
    embeddings
      .select(
        col("vec_id"),
        cell.as("label"),
        posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("pos", "xd")),
      )
      .select(col("vec_id"), col("label"), (col("pos") + 1).as("dim"), col("xd"))
      .groupBy(col("label"), col("dim"))
      .agg(
        aggregate(
          transform(array_sort(collect_list(struct(col("vec_id"), col("xd")))), p => p.getField("xd")),
          lit(0.0),
          (acc, v) => acc + v,
        ).as("sum_ord"),
        sum(col("xd")).as("sum_merge"),
        count(lit(1)).as("n"),
      )
      .select(
        col("label"),
        col("dim"),
        (col("sum_ord") / col("n")).as("centroid"),
        (abs(col("sum_merge") / col("n") - col("sum_ord") / col("n")) <= lit(tol)).as("within_tol"),
        col("n"),
      )
      .orderBy("label", "dim")

  /** IVF-style ANN with a precomputed coarse assignment column (here the
    * `label` column stands in for the nearest-centroid cell id a k-means
    * quantizer would produce): search only the query's cell.
    */
  def ivfTopK(embeddings: DataFrame, isQuery: Column, cell: Column, k: Int): DataFrame = {
    val v = embeddings.select(col("vec_id"), unitNorm(col("embedding")).as("u"), cell.as("cell"))
    val queries = broadcast(
      v.filter(isQuery).select(col("vec_id").as("query_id"), col("u").as("qu"), col("cell")),
    )
    val scored = queries
      .join(v, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        dot(col("qu"), col("u")).as("cosine"),
      )
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}

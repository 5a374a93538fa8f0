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
}

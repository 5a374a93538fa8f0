package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{TopKBuffer, TopKPairs}

/** Unit coverage for the bounded top-k buffer beneath the ANN read
  * paths: the end-to-end oracles pin whole-query results, this spec
  * pins the buffer mechanics they rest on — insertion order, tie
  * handling, merge associativity, and the serialize/deserialize round
  * trip ObjectHashAggregate uses between partial and final.
  */
class TopKPairsSpec extends AnyFunSuite {

  private def refTopK(
      xs: Seq[(Double, Long)], k: Int, asc: Boolean): Seq[(Double, Long)] = {
    val sorted =
      if (asc) xs.sortBy { case (s, i) => (s, i) }
      else xs.sortBy { case (s, i) => (-s, i) }
    sorted.take(k)
  }

  private def drain(b: TopKBuffer): Seq[(Double, Long)] =
    (0 until b.n).map(j => (b.scores(j), b.ids(j)))

  /** Deterministic pseudo-random stream (LCG — no external RNG). */
  private def stream(seed: Long, n: Int): Seq[(Double, Long)] = {
    var x = seed
    (0 until n).map { i =>
      x = x * 6364136223846793005L + 1442695040888963407L
      // Coarse quantization to force score ties.
      (math.abs(x % 97).toDouble / 10.0, i.toLong)
    }
  }

  test("insertion matches the sort-based reference for both orderings, k from 1 up") {
    val xs = stream(7, 500)
    for (k <- Seq(1, 2, 5, 16, 499, 500, 600); asc <- Seq(true, false)) {
      val b = new TopKBuffer(k, asc)
      xs.foreach { case (s, i) => b.add(s, i) }
      assert(drain(b) == refTopK(xs, k, asc), s"k=$k asc=$asc")
    }
  }

  test("ties break toward the smaller id regardless of arrival order") {
    val b = new TopKBuffer(3, true)
    Seq((1.0, 9L), (1.0, 2L), (1.0, 5L), (1.0, 1L)).foreach { case (s, i) => b.add(s, i) }
    assert(drain(b) == Seq((1.0, 1L), (1.0, 2L), (1.0, 5L)))
  }

  test("merge of disjoint partial buffers equals single-pass, any split point") {
    val xs = stream(13, 300)
    for (cut <- Seq(0, 1, 150, 299, 300); asc <- Seq(true, false)) {
      val (l, r) = xs.splitAt(cut)
      val a = new TopKBuffer(10, asc)
      val bb = new TopKBuffer(10, asc)
      l.foreach { case (s, i) => a.add(s, i) }
      r.foreach { case (s, i) => bb.add(s, i) }
      var j = 0
      while (j < bb.n) { a.add(bb.scores(j), bb.ids(j)); j += 1 }
      assert(drain(a) == refTopK(xs, 10, asc), s"cut=$cut asc=$asc")
    }
  }

  test("serialize/deserialize round-trips through the aggregate, including the empty buffer") {
    import org.apache.spark.sql.GraftColumnBridge.toExpression
    val agg = TopKPairs(toExpression(lit(1.0)), toExpression(lit(1L)), k = 4, ascending = true)
    val empty = agg.createAggregationBuffer()
    assert(drain(agg.deserialize(agg.serialize(empty))).isEmpty)
    val b = agg.createAggregationBuffer()
    stream(29, 50).foreach { case (s, i) => b.add(s, i) }
    assert(drain(agg.deserialize(agg.serialize(b))) == drain(b))
  }
}

package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise minimum of minhash signatures.
  *
  * Min-of-mins IS the minhash of the union of the underlying shingle
  * sets, so aggregating per-document signatures yields the *group's*
  * signature — a mergeable corpus sketch (map-side combinable, any
  * merge tree gives the same result). This is the group-level
  * counterpart of [[graft.expressions.MinHashSigExpr]]: estimate
  * Jaccard between whole sources/shards/snapshots without touching the
  * documents again.
  *
  * The oracle-checked query twin (`dd_source_sketch`) states the same
  * computation as posexplode + min — the Aggregator is the typed API
  * surface (SURVEY.md §2.5: the reference has no UDAF; an engine needs
  * one), asserted equal to the declarative twin in tests.
  */
class MinHashUnionAggregator(k: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    var i = 0
    val n = math.min(buf.length, sig.length)
    while (i < n) {
      if (sig(i) < buf(i)) buf(i) = sig(i)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object MinHashUnionAggregator {
  /** Column-API form: `udaf(new MinHashUnionAggregator(k))`-style usage
    * goes through functions.udaf at the call site (needs the implicit
    * input encoder there).
    */
  def apply(k: Int): MinHashUnionAggregator = new MinHashUnionAggregator(k)
}

package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so `spark.sql` users get the same
  * codegen'd operators as the Column API
  * (`SELECT poly_hash(text), simhash(text, 32) FROM docs`).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard plugin mechanism; no session-state internals touched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(s"$name expects $n arguments, got ${args.length}")
      build(args)
    }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-plan extension: interval-containment theta joins rewrite to
    // binned equi-joins (see graft.plans.AutoRangeJoinRule; disable with
    // spark.graft.autoRangeJoin.enabled=false).
    ext.injectOptimizerRule(_ => graft.plans.AutoRangeJoinRule)
    ext.injectFunction(
      (FunctionIdentifier("poly_hash"),
        info("poly_hash", "poly_hash(str) - portable polynomial rolling hash mod 2^31-1"),
        arity("poly_hash", 1)(args => PolyHash(args.head))),
    )
    ext.injectFunction(
      (FunctionIdentifier("shingle_hashes"),
        info("shingle_hashes", "shingle_hashes(str, n) - distinct hashes of word n-gram shingles"),
        arity("shingle_hashes", 2)(args => ShingleHashesExpr(args.head, intArg(args(1), "n")))),
    )
    ext.injectFunction(
      (FunctionIdentifier("shingles"),
        info("shingles", "shingles(str, n) - word n-gram shingle strings in position order"),
        arity("shingles", 2)(args => ShinglesExpr(args.head, intArg(args(1), "n")))),
    )
    ext.injectFunction(
      (FunctionIdentifier("minhash_sig"),
        info("minhash_sig", "minhash_sig(array<long>, k) - k-wide minhash signature"),
        arity("minhash_sig", 2)(args => MinHashSigExpr(args.head, intArg(args(1), "k")))),
    )
    ext.injectFunction(
      (FunctionIdentifier("simhash"),
        info("simhash", "simhash(str, bits) - simhash fingerprint over distinct tokens"),
        arity("simhash", 2)(args => SimHashExpr(args.head, intArg(args(1), "bits")))),
    )
    ext.injectFunction(
      (FunctionIdentifier("cms_estimate"),
        info("cms_estimate",
          "cms_estimate(sketch, item) - probe a count_min_sketch BINARY for a string item's count"),
        arity("cms_estimate", 2)(args => CmsEstimate(args.head, args(1)))),
    )
    ext.injectFunction(
      (FunctionIdentifier("unit_norm"),
        info("unit_norm", "unit_norm(array<float|double>) - L2 unit-normalized array<double>"),
        arity("unit_norm", 1)(args => UnitNorm(args.head))),
    )
    ext.injectFunction(
      (FunctionIdentifier("array_dot"),
        info("array_dot", "array_dot(array<double>, array<double>) - strict left-fold dot product"),
        arity("array_dot", 2)(args => ArrayDot(args.head, args(1)))),
    )
    ext.injectFunction(
      (FunctionIdentifier("sorted_intersect_count"),
        info("sorted_intersect_count",
          "sorted_intersect_count(array<long>, array<long>) - |A∩B| of sorted duplicate-free arrays"),
        arity("sorted_intersect_count", 2)(args => SortedIntersectCount(args.head, args(1)))),
    )
    ext.injectFunction(
      (FunctionIdentifier("dhash"),
        info("dhash",
          "dhash(str, regions) - perceptual gradient fingerprint ((regions-1) bits) of a content stream"),
        arity("dhash", 2)(args => DHash(args.head, intArg(args(1), "regions")))),
    )
    ext.injectFunction(
      (FunctionIdentifier("whash"),
        info("whash",
          "whash(str, regions, bits) - Walsh-Hadamard coefficient-sign fingerprint of a content stream"),
        arity("whash", 3)(args =>
          WHash(args.head, intArg(args(1), "regions"), intArg(args(2), "bits")))),
    )
  }
}

package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd L2 unit-normalization of an embedding column:
  * `array<float|double>` → `array<double>` scaled to unit norm.
  *
  * Semantically identical to the declarative HOF form
  * `transform(d, x => x / sqrt(aggregate(transform(d, x => x*x), 0d, _+_)))`
  * with `d = transform(vec, _.cast(double))` — the same strict
  * left-to-right sum-of-squares fold, so the produced doubles are
  * bit-identical and the DuckDB oracle mirror is unchanged. The HOF
  * form, however, interprets three nested lambdas per element AND
  * re-evaluates the `sqrt(aggregate(...))` subtree inside the per-element
  * lambda (no subexpression elimination across lambda boundaries):
  * O(dim²) interpreted work per row. This expression makes it two tight
  * codegen'd loops — it took the sf0.1 sim_* family from ~2-3 s per
  * query to scan speed, the same repair ShinglesExpr applied to the
  * n-gram path in round 2.
  *
  * Zero-vectors normalize to NaN elements (0/0), identical to the HOF
  * form and the oracle. Null array → null; null elements are not
  * expected (internal operator over the embeddings table).
  */
case class UnitNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_norm"

  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"unit_norm needs array<float|double>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = if (fromFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = d
      acc += d * d
      i += 1
    }
    val norm = math.sqrt(acc)
    i = 0
    while (i < n) { out(i) /= norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val get = if (fromFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $get;
         |  $acc += $out[$i] * $out[$i];
         |}
         |double $norm = java.lang.Math.sqrt($acc);
         |for (int $i = 0; $i < $n; $i++) { $out[$i] /= $norm; }
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitNorm =
    copy(child = newChild)
}

object UnitNorm {
  /** Column-API entry point. */
  def apply(vec: Column): Column =
    GraftColumnBridge.toColumn(UnitNorm(GraftColumnBridge.toExpression(vec)))
}

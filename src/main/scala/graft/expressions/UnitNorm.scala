package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
  * form and the oracle. Null array → null. A null ELEMENT makes the
  * whole result null (norm is undefined) — an explicit, checked policy
  * rather than reading garbage; parquet-sourced embeddings commonly
  * declare containsNull even when no element is ever null. Wrong input
  * types are rejected at ANALYSIS time via checkInputDataTypes, not at
  * first eval.
  */
case class UnitNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double> input, got ${other.catalogString}")
  }

  private lazy val fromFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
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
      val anyNull = ctx.freshName("anyNull")
      val get = if (fromFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; } else {
         |    $out[$i] = $get;
         |    $acc += $out[$i] * $out[$i];
         |  }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $norm = java.lang.Math.sqrt($acc);
         |  for (int $i = 0; $i < $n; $i++) { $out[$i] /= $norm; }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
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

package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Probe helper for Spark's built-in `count_min_sketch` aggregate: the
  * aggregate produces the serialized sketch as BINARY, but ships no
  * scalar to query it — estimates normally require collecting the
  * sketch to the driver, which a registry query must not do. This
  * expression deserializes and probes executor-side.
  *
  * The built-in aggregate feeds StringType input to the sketch as
  * UTF-8 bytes, so the probe hashes the same byte representation
  * (`estimateCount` on `byte[]`), keeping estimates bit-identical to a
  * driver-side `CountMinSketch.estimateCount`.
  *
  * Deserialization cost is per evaluated row — the intended shape
  * probes a handful of post-aggregation keys against one broadcast
  * sketch row, so this stays off every hot path. A per-partition cache
  * keyed on the sketch bytes would amortize wide probes if ever needed.
  */
object Cms {
  def estimate(sketch: Array[Byte], item: UTF8String): Long =
    CountMinSketch.readFrom(sketch).estimateCount(item.getBytes)
}

case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"
  override def nullSafeEval(sketch: Any, item: Any): Any =
    Cms.estimate(sketch.asInstanceOf[Array[Byte]], item.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, i) => s"graft.expressions.Cms.estimate($s, $i)")
  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression,
  ): CmsEstimate = copy(left = newLeft, right = newRight)
}

object CmsColumns {
  def estimate(sketch: Column, item: Column): Column =
    GraftColumnBridge.toColumn(
      CmsEstimate(
        GraftColumnBridge.toExpression(sketch),
        GraftColumnBridge.toExpression(item),
      ),
    )
}

package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent token pairs of a bracket-serialized BPE stream
  * `[tok][tok]…` in ONE byte walk: semantically identical to
  * `zip_with(slice(toks,1,n-1), slice(toks,2,n-1), struct)` over
  * `regexp_extract_all(s, "\\[([^\\]]+)\\]", 1)`, but without the regex
  * engine, the intermediate token array, or the two sliced copies — the
  * per-round corpus pass of BPE training is this single expression, so
  * its constant factor is the training loop's constant factor. The
  * bracket delimiters are ASCII and the token alphabet is bracket-free
  * by construction (bpeTrain enforces it), and UTF-8 continuation bytes
  * are ≥ 0x80, so scanning for literal '[' / ']' bytes is an exact
  * parse of any UTF-8 payload.
  */
case class BracketPairs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BracketPairs.OutType
  override def prettyName: String = "bracket_pairs"

  override def nullSafeEval(input: Any): Any =
    BracketPairs.pairs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.BracketPairs.pairs($c)")

  override protected def withNewChildInternal(newChild: Expression): BracketPairs =
    copy(child = newChild)
}

object BracketPairs {

  val OutType: DataType = ArrayType(
    StructType(Seq(StructField("tok_a", StringType), StructField("tok_b", StringType))),
    containsNull = false,
  )

  /** Shared by interpreted eval and generated code. */
  def pairs(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[InternalRow]()
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      // tokens are "[" body "]"; anything between them is impossible by
      // construction, but skipping to the next '[' keeps the walk total.
      while (i < n && b(i) != '[') i += 1
      if (i < n) {
        val start = i + 1
        var j = start
        while (j < n && b(j) != ']') j += 1
        val tok = UTF8String.fromBytes(b, start, j - start)
        if (prev != null) out.add(new GenericInternalRow(Array[Any](prev, tok)))
        prev = tok
        i = j + 1
      }
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size())))
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(BracketPairs(GraftColumnBridge.toExpression(c)))
}

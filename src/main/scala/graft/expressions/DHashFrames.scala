package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-frame [[DHash]] fingerprints of a video's decoded content in
  * ONE pass: frame k of `nFrames` is the k-th consecutive
  * ⌊L/nFrames⌋-code-point slice of the stream, and each slice's hash is
  * exactly `DHash.hash(slice, regions)` — same region assignment, same
  * gradient fold. The fused form exists because the slice-then-hash
  * plan paid O(F²) for a video of F frames: `substr(content, k·flen+1,
  * flen)` must seek past k·flen code points of a variable-width UTF-8
  * stream for EVERY frame, and each slice then paid its own UTF-16
  * decode; here the stream is decoded once and walked once, emitting
  * every frame's hash on the way. Videos whose stream is shorter than
  * their frame count (flen = 0) yield an empty array — the degenerate
  * cut rides inside the caller's explode exactly as before.
  */
case class DHashFrames(left: Expression, right: Expression, regions: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dhash_frames"

  override def nullSafeEval(content: Any, nFrames: Any): Any =
    DHashFrames.hashes(
      content.asInstanceOf[UTF8String],
      nFrames.asInstanceOf[Long].toInt,
      regions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx, ev, (c, f) => s"graft.expressions.DHashFrames.hashes($c, (int)$f, $regions)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DHashFrames =
    copy(left = newLeft, right = newRight)
}

object DHashFrames {

  /** Shared by interpreted eval and generated code. */
  def hashes(s: UTF8String, nFrames: Int, regions: Int): ArrayData = {
    if (nFrames <= 0) return new GenericArrayData(Array.empty[Long])
    val str = s.toString
    val total = str.codePointCount(0, str.length)
    val flen = total / nFrames
    if (flen == 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nFrames)
    val sums = new Array[Long](regions)
    var i = 0 // UTF-16 index into the once-decoded stream
    var k = 0
    while (k < nFrames) {
      java.util.Arrays.fill(sums, 0L)
      var j = 0L
      while (j < flen) {
        val cp = str.codePointAt(i)
        // identical proportional-span assignment to DHash.hash over the
        // standalone slice (total there = flen here).
        sums(((j * regions) / flen).toInt) += cp
        j += 1
        i += Character.charCount(cp)
      }
      var acc = 0L
      var r = 0
      while (r < regions - 1) {
        acc = acc * 2 + (if (sums(r) > sums(r + 1)) 1L else 0L)
        r += 1
      }
      out(k) = acc
      k += 1
    }
    new GenericArrayData(out)
  }

  def apply(content: Column, nFrames: Column, regions: Int): Column =
    GraftColumnBridge.toColumn(
      DHashFrames(
        GraftColumnBridge.toExpression(content),
        GraftColumnBridge.toExpression(nFrames),
        regions))
}

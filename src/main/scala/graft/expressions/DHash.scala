package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd dHash-style perceptual fingerprint of a decoded media
  * content stream: split the code-point sequence into `regions` equal
  * spans (position j, 0-based, lands in region ⌊j·regions/L⌋ — the
  * 1-D analogue of resizing an image to a fixed grid), sum the code
  * points per span, then emit the GRADIENT bit string — bit i is 1
  * iff sum(region i) > sum(region i+1) — folded MSB→LSB into one Long
  * (`regions − 1` bits; callers keep it ≤ 52 so downstream band
  * extraction via floor-division doubles stays exact).
  *
  * This is the classic difference-hash construction (adjacent-cell
  * brightness comparisons over a fixed grid), applied to the byte
  * stream a container decode yields: the fingerprint depends only on
  * the decoded CONTENT, never the container, so a re-encoded copy
  * (same payload, different PNG/JPEG wrapper) collides at hamming 0,
  * and a lightly-edited copy differs in only the few gradient bits
  * whose spans the edit touches. Deterministic integer arithmetic end
  * to end — the DuckDB oracle replays it verbatim (per-position
  * region assignment, per-region sums, gradient fold).
  */
case class DHash(child: Expression, regions: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash"

  override def nullSafeEval(input: Any): Any =
    DHash.hash(input.asInstanceOf[UTF8String], regions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DHash.hash($c, $regions)")

  override protected def withNewChildInternal(newChild: Expression): DHash =
    copy(child = newChild)
}

object DHash {

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String, regions: Int): Long = {
    val str = s.toString
    val total = str.codePointCount(0, str.length)
    val sums = new Array[Long](regions)
    var i = 0
    var j = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      // 0-based code-point index j → region ⌊j·R/L⌋ ∈ [0, R): the same
      // proportional-span assignment both engines compute exactly in
      // 64-bit integers (j < L ≤ 2^31, R small — no overflow).
      sums(((j * regions) / total).toInt) += cp
      j += 1
      i += Character.charCount(cp)
    }
    var acc = 0L
    var k = 0
    while (k < regions - 1) {
      acc = acc * 2 + (if (sums(k) > sums(k + 1)) 1L else 0L)
      k += 1
    }
    acc
  }

  def apply(c: Column, regions: Int): Column =
    GraftColumnBridge.toColumn(DHash(GraftColumnBridge.toExpression(c), regions))
}

package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Walsh–Hadamard perceptual fingerprint — the SECOND hash
  * family next to [[DHash]], with the complementary failure mode:
  * where dHash encodes LOCAL gradients (adjacent-span comparisons, so
  * an edit flips only the bits whose spans it touches), wHash encodes
  * GLOBAL frequency structure (each bit is the sign of one
  * Walsh–Hadamard coefficient of the whole region-sum vector, so it
  * survives local noise that happens to preserve coarse structure and
  * separates documents whose local gradients coincide — the classic
  * pHash idea with the DCT swapped for the Walsh–Hadamard transform,
  * whose ±1 basis keeps every operation EXACT INTEGER arithmetic and
  * therefore bit-replayable by the DuckDB oracle; a DCT would drag in
  * cos(), which diverges across libm builds).
  *
  * Construction: the code-point stream is resized onto `regions`
  * proportional spans (the [[DHash]] grid; `regions` is padded to the
  * next power of two with zero sums so the transform is total), the
  * span sums form the signal vector s, coefficient k is
  * c_k = Σ_j (−1)^popcount(k AND j) · s_j (the natural-order WHT row),
  * and bit k−1 (MSB-first, k = 1..bits) is 1 iff c_k > 0 — the DC
  * coefficient k = 0 is skipped exactly as pHash skips it (it encodes
  * total mass, not structure). Magnitudes stay far below 2^63
  * (L · maxCodePoint · N), so nothing overflows.
  */
case class WHash(child: Expression, regions: Int, bits: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "whash"

  override def nullSafeEval(input: Any): Any =
    WHash.hash(input.asInstanceOf[UTF8String], regions, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.WHash.hash($c, $regions, $bits)")

  override protected def withNewChildInternal(newChild: Expression): WHash =
    copy(child = newChild)
}

object WHash {

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String, regions: Int, bits: Int): Long = {
    val str = s.toString
    val total = str.codePointCount(0, str.length)
    // Pad the signal to the next power of two so k AND j parity is the
    // genuine WHT row; the padded spans contribute zero sums.
    var n = 1
    while (n < regions) n *= 2
    val sums = new Array[Long](n)
    var i = 0
    var j = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      sums(((j * regions) / total).toInt) += cp
      j += 1
      i += Character.charCount(cp)
    }
    var acc = 0L
    var k = 1
    while (k <= bits) {
      var c = 0L
      var r = 0
      while (r < n) {
        val term = sums(r)
        c += (if (java.lang.Integer.bitCount(k & r) % 2 == 1) -term else term)
        r += 1
      }
      acc = acc * 2 + (if (c > 0) 1L else 0L)
      k += 1
    }
    acc
  }

  def apply(c: Column, regions: Int, bits: Int): Column =
    GraftColumnBridge.toColumn(WHash(GraftColumnBridge.toExpression(c), regions, bits))
}

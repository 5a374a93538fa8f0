package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Codegen'd sketch expressions for the dedup pipelines.
  *
  * Each is semantically IDENTICAL to a composition of built-in
  * higher-order functions (documented per expression; the DuckDB oracles
  * mirror those compositions, so results stay hash-comparable) but
  * evaluates as one tight loop per row. The HOF compositions were
  * correct yet catastrophically slow: Catalyst inlines the producing
  * array expression into each consuming lambda (projection collapsing
  * reaches through repartition barriers), so e.g. a 32-function minhash
  * re-evaluated tokenization+shingling+hashing 32× per row, each inner
  * element interpreting several expression nodes. A whole-operator
  * expression is the prescribed Catalyst extension point for exactly
  * this case.
  *
  * Hash family (shared with [[PolyHash]] / `HashOps`):
  * h_i(x) = (a_i·x + b_i) mod P, a_i = (i+1)·2654435761 mod P,
  * b_i = (i+1)·2245366891 mod P, P = 2^31 − 1. All operands < 2^31, so
  * Long arithmetic never overflows.
  */
object Sketches {
  val P: Long = 2147483647L
  val MulA: Long = 2654435761L
  val MulB: Long = 2245366891L

  /** `split(text, " ")` with Spark's limit −1 semantics (trailing empty
    * strings kept), matching DuckDB `string_split(text, ' ')`.
    */
  def words(text: UTF8String): Array[String] = text.toString.split(" ", -1)

  /** Polyhashes of word n-gram shingles in position order (`distinct =
    * false`) or deduplicated preserving first occurrence (`true`);
    * documents shorter than n words contribute their full text as the
    * single shingle. Distinct form is exactly
    * `array_distinct(transform(sequence(1, greatest(size(w)-(n-1), 1)),
    * i -> poly_hash(concat_ws(" ", slice(w, i, n)))))`; positional form
    * drops the array_distinct (winnowing needs document order).
    */
  def shingleHashes(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val w = words(text)
    val count = math.max(w.length - (n - 1), 1)
    val out = if (distinct) new mutable.LinkedHashSet[Long] else mutable.ArrayBuffer.empty[Long]
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, w.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(w(j))
        j += 1
      }
      out += polyHashString(sb)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Word n-gram shingle STRINGS in position order — exactly
    * `transform(sequence(1, greatest(size(w)-(n-1), 1)),
    * i -> concat_ws(" ", slice(w, i, n)))` over `w = split(text, " ")`;
    * documents shorter than n words yield their full text as the single
    * shingle. The HOF form interprets several expression nodes per
    * produced element (and projection collapsing re-inlines the split
    * into every lambda); this is one tight loop per row.
    */
  def shingleStrings(text: UTF8String, n: Int): ArrayData = {
    val w = words(text)
    val count = math.max(w.length - (n - 1), 1)
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = i
      val end = math.min(i + n, w.length)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(w(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def polyHashString(s: java.lang.CharSequence): Long = {
    var acc = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val cp = Character.codePointAt(s, i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** MinHash signature — `transform(sequence(0, k-1), i ->
    * array_min(transform(hashes, h -> (a_i*h + b_i) % P)))`.
    * An empty input set yields k NULL coordinates (array_min of an empty
    * array is NULL — matches the declarative spec and its DuckDB
    * mirror, instead of a Long.MaxValue sentinel that would silently
    * bucket all empty documents together).
    */
  def minHashSig(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = (i + 1) * MulA % P
      val b = (i + 1) * MulB % P
      var best = Long.MaxValue
      var j = 0
      while (j < m) {
        val v = (a * hashes.getLong(j) + b) % P
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash over the distinct-token set, bits folded MSB→LSB
    * (`HashOps.simhash`'s documented fold): bit j is the sign of
    * Σ_tokens (2·((h_j(poly_hash(w)) mod 2) − ½)).
    */
  def simHash(text: UTF8String, bits: Int): Long = {
    // Distinct by WORD (array_distinct(words)), then hash — a hash
    // collision between distinct words must contribute two votes, as in
    // the declarative spec.
    val seen = new mutable.LinkedHashSet[String]
    words(text).foreach(seen += _)
    val hs = seen.toArray.map(w => polyHashString(w))
    var acc = 0L
    var j = bits - 1
    while (j >= 0) {
      val a = (j + 1) * MulA % P
      val b = (j + 1) * MulB % P
      var vote = 0L
      var i = 0
      while (i < hs.length) {
        vote += (if ((a * hs(i) + b) % P % 2 == 1) 1 else -1)
        i += 1
      }
      acc = acc * 2 + (if (vote > 0) 1L else 0L)
      j -= 1
    }
    acc
  }
}

/** Word-n-gram shingle hashes of a text column (distinct set or
  * positional sequence).
  */
case class ShingleHashesExpr(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    Sketches.shingleHashes(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Sketches.shingleHashes($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** Word-n-gram shingle strings of a text column, in position order. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"
  override def nullSafeEval(input: Any): Any =
    Sketches.shingleStrings(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Sketches.shingleStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** k-wide minhash signature of a pre-hashed shingle set. Elements are
  * NULL for an empty input set, hence containsNull.
  */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature width must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    Sketches.minHashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Sketches.minHashSig($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** SimHash fingerprint of a text column over its distinct-token set. */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"simhash bits must be in [1, 62] (Long sign bit), got $bits")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"
  override def nullSafeEval(input: Any): Any =
    Sketches.simHash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Sketches.simHash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SketchColumns {
  def shingles(text: Column, n: Int): Column =
    GraftColumnBridge.toColumn(ShinglesExpr(GraftColumnBridge.toExpression(text), n))
  def shingleHashes(text: Column, n: Int): Column =
    GraftColumnBridge.toColumn(ShingleHashesExpr(GraftColumnBridge.toExpression(text), n))
  def shingleHashesOrdered(text: Column, n: Int): Column =
    GraftColumnBridge.toColumn(ShingleHashesExpr(GraftColumnBridge.toExpression(text), n, distinct = false))
  def minHashSig(hashes: Column, k: Int): Column =
    GraftColumnBridge.toColumn(MinHashSigExpr(GraftColumnBridge.toExpression(hashes), k))
  def simHash(text: Column, bits: Int): Column =
    GraftColumnBridge.toColumn(SimHashExpr(GraftColumnBridge.toExpression(text), bits))
}

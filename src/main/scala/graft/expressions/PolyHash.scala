package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd portable polynomial rolling hash of a string:
  * fold over code points, acc = (acc*31 + cp) mod (2^31 − 1), acc0 = 0.
  *
  * Bit-identical to the declarative form in `HashOps` docs
  * (`aggregate(transform(sequence(1, length(s)), i -> ascii(substr(s,i,1))), …)`)
  * and to its DuckDB mirror (`OracleSnippets.charHash`) — all three
  * walk code points in order — but evaluated as one tight loop instead
  * of three nested interpreted higher-order functions allocating a
  * sequence array per string. This sits under every shingle of every
  * document in the dedup pipelines, which made it the dominant cost of
  * minhash/simhash at scale.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val P: Long = 2147483647L

  /** Shared by interpreted eval and generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(PolyHash(GraftColumnBridge.toExpression(c)))
}

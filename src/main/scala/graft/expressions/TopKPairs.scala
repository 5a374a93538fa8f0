package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer: a rank-ordered insertion list of at
  * most `k` (score, id) pairs over primitive arrays (no boxing on the
  * per-candidate hot path). Ordering: score ascending (`asc = true`,
  * distances) or descending (cosines), ties broken by smaller id —
  * exactly the `row_number()` window ordering this aggregate replaces,
  * so results are bit-identical to the old plan and the DuckDB oracles
  * are unchanged.
  *
  * After the list is warm the common case is one comparison against the
  * current worst (index n-1) and a rejection; an accepted candidate
  * shift-inserts in O(k). k is small (≤ tens) by contract.
  */
final class TopKBuffer(val k: Int, val asc: Boolean) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** True iff (s1, i1) ranks strictly before (s2, i2). */
  @inline private def before(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    if (s1 != s2) { if (asc) s1 < s2 else s1 > s2 }
    else i1 < i2

  def add(s: Double, i: Long): Unit = {
    var pos =
      if (n < k) { n += 1; n - 1 }
      else if (before(s, i, scores(k - 1), ids(k - 1))) k - 1
      else return
    while (pos > 0 && before(s, i, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1)
      ids(pos) = ids(pos - 1)
      pos -= 1
    }
    scores(pos) = s
    ids(pos) = i
  }
}

/** Bounded-heap per-group top-k aggregate: keeps the k best
  * (score, id) pairs and evaluates to `array<struct<id, score>>` in
  * rank order.
  *
  * This is the scale-safe replacement for the
  * `row_number() OVER (PARTITION BY query ORDER BY score)` top-k idiom:
  * the window shuffles EVERY scored candidate onto the (low-cardinality,
  * skewed) query key and fully sorts each partition, while this
  * aggregate partial-aggregates — map-side combine reduces each
  * (partition, query) to k pairs before the exchange, so the shuffle
  * carries O(partitions × queries × k) rows instead of the whole scored
  * corpus. Runs under ObjectHashAggregate with serialize/merge between
  * partial and final.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[TopKBuffer] {
  require(k > 0, "top-k needs k > 0")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKPairs.OutType
  override def prettyName: String = "bounded_top_k"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ascending)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < o.n) { b.add(o.scores(j), o.ids(j)); j += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val out = new Array[Any](b.n)
    var j = 0
    while (j < b.n) { out(j) = InternalRow(b.ids(j), b.scores(j)); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 16 * b.n)
    buf.putInt(b.n)
    var j = 0
    while (j < b.n) { buf.putDouble(b.scores(j)); buf.putLong(b.ids(j)); j += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k, ascending)
    val m = buf.getInt
    var j = 0
    // Pairs were serialized in rank order, so each add is O(1).
    while (j < m) { b.add(buf.getDouble, buf.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false),
    )),
    containsNull = false,
  )

  /** Column-API entry point: `ascending = true` keeps the k smallest
    * scores (distances), `false` the k largest (cosines); ties always
    * break toward the smaller id.
    */
  def topK(score: Column, id: Column, k: Int, ascending: Boolean): Column =
    GraftColumnBridge.toColumn(
      TopKPairs(
        GraftColumnBridge.toExpression(score),
        GraftColumnBridge.toExpression(id),
        k,
        ascending,
      ).toAggregateExpression(),
    )
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bounded top-k-by-score as a MERGEABLE Catalyst aggregate: keep the k
  * ids with the highest (score, then lowest id) per group.
  *
  * This is the aggregate that makes distributed exact top-k-per-key a
  * partial+merge HASH AGGREGATE instead of a window: each input
  * partition folds its rows into k-sized buffers (map-side combine), so
  * the shuffle carries #partitions · k rows per group — never the
  * scored candidate stream. A `row_number() OVER (PARTITION BY ...)`
  * formulation must exchange and SORT every candidate row; this buffer
  * prunes below k before the exchange, which on an n²-candidate stream
  * (the mutual-kNN scorer) is the difference between shuffling 50M rows
  * and 160k (measured 8.2 s → 2.9 s at sf0.1).
  *
  * Total order: (score DESC, id ASC) — bit-deterministic for any input
  * order, so results hash-match a `ROW_NUMBER() ... ORDER BY score
  * DESC, id` oracle replay. NaN scores are skipped (a NaN can never
  * win a comparison, and admitting one while the buffer is short would
  * make the result input-order-dependent). Output: array<long> of ids
  * in rank order (rank = position + 1).
  */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  override def left: Expression = score
  override def right: Expression = id
  override def prettyName: String = "topk_by_score"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!sv.isNaN) buf.insert(sv, i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.ids.take(buf.n).map(_.asInstanceOf[Any]))

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(storage)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(score = newLeft, id = newRight)
}

/** Insertion-sorted bounded buffer ordered by (score DESC, id ASC).
  * k is single-digit in every use; linear insertion beats any heap at
  * that size and keeps ranks directly readable at eval. */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, id: Long): Unit = {
    if (n == k && !beats(s, id, scores(n - 1), ids(n - 1))) return
    var pos = if (n == k) n - 1 else n
    // shift larger-ranked entries right until s lands in order
    while (pos > 0 && beats(s, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = s; ids(pos) = id
    if (n < k) n += 1
  }
}

object TopKFunctions {
  /** Top-k ids by (score desc, id asc) per group, as array<long> in
    * rank order. */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScoreAgg(GraftBridge.expression(score.cast("double")),
        GraftBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}

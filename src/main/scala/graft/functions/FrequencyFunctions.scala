package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a Catalyst aggregate.
  *
  * The classic bounded-memory heavy-hitter sketch: at most `k` counters,
  * O(1) amortized per row, and MERGEABLE (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) — which is exactly the shape Spark's two-phase
  * aggregation wants: per-partition partial sketches of size ≤ k are
  * serialized, shuffled, and merged, so the final reducer sees
  * O(#partitions · k) counters, never the token stream. Guarantees after
  * any update/merge tree over n total rows:
  *
  *   - every item with true count > n/(k+1) is present in the summary;
  *   - each retained counter UNDERestimates its item's true count by at
  *     most n/(k+1) (and never overestimates).
  *
  * That makes the sketch a sound CANDIDATE GENERATOR for exact heavy
  * hitters: any threshold ≥ n/(k+1) can lose no qualifying item, and a
  * second exact counting pass over just the candidates removes the false
  * positives (see graft.ext.TextOps.heavyHitters).
  *
  * The buffer is a plain hash map (≤ k entries); `update` clones incoming
  * UTF8String keys before storing them — the input row's backing buffer
  * is reused by the scan. Output: map<string, long> of surviving items to
  * their lower-bound counts.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"sketch size k must be positive, got $k")

  override def prettyName: String = "misra_gries"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v == null) return buf
    buf.get(v) match {
      case Some(c) => buf.update(v, c + 1)
      case None if buf.size < k => buf.update(v.clone(), 1L)
      case None => // decrement-all step: drop one occurrence of every item
        val dead = buf.iterator.filter(_._2 == 1L).map(_._1).toList
        buf.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(
      b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (key, c) =>
      b1.update(key, b1.getOrElse(key, 0L) + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything and drop the
      // non-positives — the merge rule that keeps the n/(k+1) guarantee
      val counts = b1.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - k)
      val dead = b1.iterator.filter(_._2 <= cut).map(_._1).toList
      dead.foreach(b1.remove)
      b1.mapValuesInPlace((_, c) => c - cut)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val b = key.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = ByteBuffer.wrap(storage)
    val n = in.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.getInt)
      in.get(b)
      buf.update(UTF8String.fromBytes(b), in.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
}

object FrequencyFunctions {
  /** Misra-Gries frequent-items sketch over a string column: at most `k`
    * (item → lower-bound count) entries; superset of every item with
    * count > n/(k+1). */
  def misraGries(c: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(c.cast("string")), k)
        .toAggregateExpression())

  /** Spark's own runtime-filter Bloom aggregate (the machinery behind
    * InjectRuntimeFilter), surfaced as a user aggregate: folds XXH64 item
    * hashes into one binary Bloom filter. Never false-negative, so it is
    * a sound PREFILTER for an exact join. */
  def bloomFilterAgg(hashedItems: Column, expectedItems: Long): Column =
    GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        GraftBridge.expression(hashedItems), expectedItems)
        .toAggregateExpression())

  /** Membership probe against a [[bloomFilterAgg]]-built filter (binary
    * column/literal); pairs with xxhash64 on the probe side. */
  def mightContain(bloom: Column, hashedItem: Column): Column =
    GraftBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftBridge.expression(bloom), GraftBridge.expression(hashedItem)))
}

package org.apache.spark.sql.graftx

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** `collect_list` over a long column with a HARD per-group state bound.
  *
  * The inverted-index pair kernels (Dedup.pairCounts, tx08) group postings
  * into per-key doc lists and drop keys whose document frequency exceeds a
  * cap (stop-shingles). A plain `collect_list` materializes the COMPLETE
  * list in one aggregation buffer before the size filter can drop it — for
  * a stop-shingle appearing in ~1e9 documents that is a multi-GB array on
  * a single key (and object-hash aggregation's sort-based spill does not
  * help: a single key's array must still assemble in memory at merge).
  * This aggregate stops retaining beyond `limit` elements, so per-group
  * state is bounded by construction at any corpus size.
  *
  * Call sites pass `limit = cap + 1`: a group that reaches `limit` has
  * true df > cap (its retained PREFIX is arbitrary but never observed —
  * every such group is dropped by the downstream `size <= cap` filter),
  * while groups below `limit` retain every element, so emitted results
  * are exactly those of the unbounded formulation.
  */
case class BoundedCollectLong(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(limit >= 1)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_collect_long"

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    new ArrayBuffer[Long]

  override def update(b: ArrayBuffer[Long], input: InternalRow): ArrayBuffer[Long] = {
    if (b.length < limit) {
      val v = child.eval(input)
      if (v != null) b += v.asInstanceOf[Long]
    }
    b
  }

  override def merge(b: ArrayBuffer[Long], o: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < o.length && b.length < limit) { b += o(i); i += 1 }
    b
  }

  override def eval(b: ArrayBuffer[Long]): Any =
    new GenericArrayData(b.toArray)

  override def serialize(b: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * b.length)
    bb.putInt(b.length)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { b += bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}

object BoundedCollectFunctions {
  /** Bounded collect_list of a long column: retains at most `limit`
    * elements per group. See [[BoundedCollectLong]] for the cap+1 calling
    * convention. */
  def bounded_collect_long(c: Column, limit: Int): Column =
    ExpressionUtils.column(
      BoundedCollectLong(ExpressionUtils.expression(c), limit)
        .toAggregateExpression())
}

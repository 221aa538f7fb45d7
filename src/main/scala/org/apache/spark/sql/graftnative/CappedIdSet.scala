package org.apache.spark.sql.graftnative

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Distinct-set aggregate with a HARD size cap: collects distinct
  * long ids, but the moment the set exceeds `cap` distinct values the
  * buffer discards its contents and only carries an overflow flag —
  * the aggregate returns NULL for that group.
  *
  * Built for the fused gram-postings stage: the stop-gram df cap means
  * a gram with more than `cap` documents is DROPPED, so its postings
  * list is never needed — only the fact that it is over the cap. A
  * plain `collect_set` would still buffer every distinct doc_id of
  * every stop gram before the size filter ran; for a boilerplate gram
  * shared by a billion documents that is a multi-GB aggregation buffer
  * on one key — exactly the skew bomb the cap exists to defuse. This
  * buffer is bounded at cap+1 longs per group BY CONSTRUCTION, on the
  * partial (map-side) buffers as well as the final merge, so the
  * postings build is one safe shuffle at any corpus size.
  *
  * Output: the distinct ids SORTED ASCENDING (array<long>), or NULL if
  * the group overflowed the cap. Null inputs are ignored (standard
  * aggregate-skips-nulls semantics); the overflow flag survives merges
  * in both directions.
  */
case class CappedIdSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdSet.Buffer]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(cap > 0, "cap must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_capped_id_set"

  override def createAggregationBuffer(): CappedIdSet.Buffer =
    new CappedIdSet.Buffer(cap)

  override def update(b: CappedIdSet.Buffer, input: InternalRow): CappedIdSet.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CappedIdSet.Buffer, o: CappedIdSet.Buffer): CappedIdSet.Buffer = {
    b.absorb(o)
    b
  }

  override def eval(b: CappedIdSet.Buffer): Any =
    if (b.overflowed) null
    else {
      val out = b.toArray
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(b: CappedIdSet.Buffer): Array[Byte] = {
    if (b.overflowed) Array[Byte](1)
    else {
      val ids = b.toArray
      val bb = ByteBuffer.allocate(1 + 4 + 8 * ids.length)
      bb.put(0: Byte).putInt(ids.length)
      ids.foreach(bb.putLong)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): CappedIdSet.Buffer = {
    val b = new CappedIdSet.Buffer(cap)
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() != 0) b.markOverflowed()
    else {
      val n = bb.getInt
      var i = 0
      while (i < n) { b.add(bb.getLong); i += 1 }
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedIdSet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedIdSet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedIdSet =
    copy(child = newChild)
}

object CappedIdSet {
  /** Cap-bounded distinct-long buffer: at most cap+1 live entries ever
    * (the +1 detects the overflow), then the storage is released. */
  final class Buffer(cap: Int) {
    private var set = new java.util.HashSet[java.lang.Long](math.min(cap, 16))
    private var over = false

    def add(v: Long): Unit = if (!over) {
      set.add(v)
      if (set.size > cap) markOverflowed()
    }

    def absorb(o: Buffer): Unit =
      if (o.over) markOverflowed()
      else if (!over) {
        val it = o.set.iterator()
        while (it.hasNext && !over) add(it.next())
      }

    def markOverflowed(): Unit = { over = true; set = null }
    def overflowed: Boolean = over

    def toArray: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  /** Column API: distinct ids as a sorted array<long>, NULL once the
    * group exceeds `cap` distinct values. */
  def cappedIdSet(ids: Column, cap: Int): Column =
    ExpressionUtils.column(
      CappedIdSet(ExpressionUtils.expression(ids), cap).toAggregateExpression())
}

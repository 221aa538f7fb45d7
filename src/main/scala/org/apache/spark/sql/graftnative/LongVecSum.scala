package org.apache.spark.sql.graftnative

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Element-wise sum of `array<long>` rows — the fused Lloyd M-step
  * aggregate (r22, guide §2.3 "aggregate before you shuffle").
  *
  * The k-means/IVF M-step was spelled `posexplode(xq)` →
  * `groupBy(cid, pos).agg(sum div count)` → `groupBy(cid).agg(regroup)`:
  * a 64× row explosion into the exchange, TWO aggregations (the second
  * a SortAggregate over collect_list), and an array_sort per centroid.
  * With this kernel the M-step is ONE hash aggregate over unexploded
  * rows — `groupBy(cid).agg(longVecSum(xq), count(*))` — shuffling a
  * single 64-long partial per (map task, cid) instead of 64 partial
  * sums per (map task, cid, pos).
  *
  * Exactness contract (the recurrence is oracle-pinned bit-for-bit):
  * long addition is associative/commutative, so per-position sums are
  * identical to the exploded spelling under any partitioning, and the
  * caller's truncating `div` by the group count reproduces the old
  * per-(cid, pos) `sum div count` exactly — every member row carries
  * every position, so the per-position count equals the group count.
  *
  * Null input ARRAYS are ignored (standard aggregate-skips-nulls; the
  * quantized basis never produces them). Null ELEMENTS cannot occur
  * (`containsNull=false` basis) and fail loudly rather than summing
  * garbage. All input rows of a group must share one length — a
  * mismatch fails loudly (it would mean mixed-dimension vectors, which
  * the loader contract forbids). Output: `array<long>` of the common
  * length, or NULL for a group with no non-null input.
  */
case class LongVecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongVecSum.Buffer]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_long_vec_sum"

  override def createAggregationBuffer(): LongVecSum.Buffer =
    new LongVecSum.Buffer

  override def update(b: LongVecSum.Buffer, input: InternalRow): LongVecSum.Buffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[ArrayData])
    b
  }

  override def merge(b: LongVecSum.Buffer, o: LongVecSum.Buffer): LongVecSum.Buffer = {
    b.absorb(o)
    b
  }

  override def eval(b: LongVecSum.Buffer): Any =
    if (b.sums == null) null else new GenericArrayData(b.sums.clone())

  override def serialize(b: LongVecSum.Buffer): Array[Byte] = {
    val s = b.sums
    if (s == null) Array.emptyByteArray
    else {
      val bb = ByteBuffer.allocate(4 + 8 * s.length)
      bb.putInt(s.length)
      s.foreach(bb.putLong)
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): LongVecSum.Buffer = {
    val b = new LongVecSum.Buffer
    if (bytes.nonEmpty) {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val s = new Array[Long](n)
      var i = 0
      while (i < n) { s(i) = bb.getLong; i += 1 }
      b.sums = s
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): LongVecSum =
    copy(child = newChild)
}

object LongVecSum {
  /** Running element-wise sums; null until the first non-null input. */
  final class Buffer {
    var sums: Array[Long] = null

    def add(a: ArrayData): Unit = {
      val d = a.numElements()
      if (sums == null) sums = new Array[Long](d)
      require(d == sums.length,
        s"graft_long_vec_sum: mixed array lengths in one group " +
          s"($d vs ${sums.length})")
      var i = 0
      while (i < d) {
        // getLong on a null element reads garbage silently; the basis
        // is containsNull=false, so a null here is loader corruption.
        require(!a.isNullAt(i),
          "graft_long_vec_sum: null element in quantized vector")
        sums(i) += a.getLong(i)
        i += 1
      }
    }

    def absorb(o: Buffer): Unit = if (o.sums != null) {
      if (sums == null) sums = o.sums.clone()
      else {
        require(o.sums.length == sums.length,
          s"graft_long_vec_sum: mixed array lengths across partials " +
            s"(${o.sums.length} vs ${sums.length})")
        var i = 0
        while (i < sums.length) { sums(i) += o.sums(i); i += 1 }
      }
    }
  }

  /** Column API: element-wise sum of array<long> rows per group. */
  def longVecSum(a: Column): Column =
    ExpressionUtils.column(
      LongVecSum(ExpressionUtils.expression(a)).toAggregateExpression())
}

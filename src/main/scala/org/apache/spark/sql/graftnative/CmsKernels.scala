package org.apache.spark.sql.graftnative

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Merge aggregate over serialized Count-Min sketches (the rollup half
  * of a maintained frequency-sketch table): each input row is the
  * binary produced by Spark's `count_min_sketch(...)` aggregate; the
  * buffer is one live sketch that absorbs them with counter addition.
  *
  * CMS merge is EXACT (counter arrays add elementwise), so unlike the
  * HLL union a merged sketch is bit-identical to one built over the
  * concatenated input — merge order cannot change any estimate. That
  * makes the sketch table safely incremental: per-partition sketch
  * rows roll up to per-lang or global rows without rescanning
  * documents, and the rollup is deterministic. The buffer is the fixed
  * sketch size (depth x width longs) by construction — eps/confidence
  * bound it regardless of input cardinality.
  *
  * All merged rows must share this aggregate's (eps, confidence, seed)
  * — `mergeInPlace` rejects incompatible shapes, surfacing a mixed
  * table as an error instead of a silent wrong count.
  */
case class CmsMergeAgg(
    child: Expression,
    eps: Double,
    confidence: Double,
    seed: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CountMinSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_merge"

  override def createAggregationBuffer(): CountMinSketch =
    CountMinSketch.create(eps, confidence, seed)

  override def update(b: CountMinSketch, input: InternalRow): CountMinSketch = {
    val v = child.eval(input)
    if (v == null) b
    else {
      b.mergeInPlace(CountMinSketch.readFrom(
        new ByteArrayInputStream(v.asInstanceOf[Array[Byte]])))
      b
    }
  }

  override def merge(b: CountMinSketch, o: CountMinSketch): CountMinSketch = {
    b.mergeInPlace(o)
    b
  }

  override def eval(b: CountMinSketch): Any = serialize(b)

  override def serialize(b: CountMinSketch): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Batch point-lookup into a serialized Count-Min sketch: estimated
  * counts for every probe string, one deserialize per ROW (not per
  * probe). Probes hash exactly as `count_min_sketch` over a string
  * column ingested them (UTF-8 bytes), so estimate >= true count holds
  * by CMS construction.
  *
  * CodegenFallback by design: lookups run over the SKETCH table (one
  * row per lang/partition — K rows, not the corpus), never in a
  * per-document hot path, so interpreted eval costs nothing while
  * codegen would re-deserialize the sketch per generated call anyway.
  */
case class CmsEstimates(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_cms_estimates"

  override protected def nullSafeEval(sketchBytes: Any, probes: Any): Any = {
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(
      sketchBytes.asInstanceOf[Array[Byte]]))
    val arr = probes.asInstanceOf[ArrayData]
    val out = new Array[Any](arr.numElements())
    var i = 0
    while (i < out.length) {
      // count_min_sketch over a string column adds UTF8String BYTES
      // (addBinary), so probe with the same bytes — probing with a
      // java.lang.String would hash differently and break the
      // estimate >= exact guarantee. A NULL probe element (the
      // aggregate skips nulls, so no sketch contains one) estimates
      // to NULL rather than NPE-ing the task.
      out(i) = if (arr.isNullAt(i)) null
        else java.lang.Long.valueOf(cms.estimateCount(
          arr.getUTF8String(i).asInstanceOf[UTF8String].getBytes))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimates =
    copy(left = newLeft, right = newRight)
}

object CmsKernels {
  /** Column API: merge serialized CMS rows built with the same
    * (eps, confidence, seed) into one sketch (exact counter addition). */
  def cmsMerge(sketch: Column, eps: Double, confidence: Double,
      seed: Int): Column =
    ExpressionUtils.column(CmsMergeAgg(
      ExpressionUtils.expression(sketch), eps, confidence, seed)
      .toAggregateExpression())

  /** Column API: estimated counts of `probes` (array<string>) in a
    * serialized CMS column, as array<long> aligned with the probes. */
  def cmsEstimates(sketch: Column, probes: Column): Column =
    ExpressionUtils.column(CmsEstimates(
      ExpressionUtils.expression(sketch),
      ExpressionUtils.expression(probes)))
}

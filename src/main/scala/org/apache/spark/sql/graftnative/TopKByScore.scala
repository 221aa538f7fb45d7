package org.apache.spark.sql.graftnative

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Per-group top-k as a BOUNDED-HEAP aggregate: carries at most k
  * (score, id) entries per group at every stage — partial (map-side)
  * buffers, shuffle payload, and final merge alike.
  *
  * This is the scale-correct spelling of "top k per group". The
  * row_number window formulation (q_win_topk_grp) must SORT each
  * group's full partition before discarding all but k rows: a group
  * with a billion rows pays a billion-row sort and shuffles a
  * billion rows to one reducer — the same per-key skew bomb
  * [[CappedIdSet]] defuses for postings. This aggregate keeps O(k)
  * state by construction, combines on the map side (each partition
  * contributes at most k entries to the shuffle), and merges heaps in
  * O(k log k) — one safe shuffle at any group size.
  *
  * Ordering contract (spelled, so results can hash-match a window
  * oracle cross-engine): entries rank by score DESC, ties by id ASC.
  * Output: array<struct<score double, id bigint>> sorted in rank
  * order, length <= k (shorter when the group has fewer rows). Null
  * score or id rows are skipped (standard aggregate-skips-nulls).
  */
case class TopKByScore(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buffer]
  with BinaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "k must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_by_score"

  override def createAggregationBuffer(): TopKByScore.Buffer =
    new TopKByScore.Buffer(k)

  override def update(b: TopKByScore.Buffer, input: InternalRow): TopKByScore.Buffer = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKByScore.Buffer, o: TopKByScore.Buffer): TopKByScore.Buffer = {
    b.absorb(o)
    b
  }

  override def eval(b: TopKByScore.Buffer): Any = {
    val (scores, ids) = b.ranked
    val rows = new Array[Any](scores.length)
    var i = 0
    while (i < scores.length) {
      rows(i) = new GenericInternalRow(Array[Any](scores(i), ids(i)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKByScore.Buffer): Array[Byte] = {
    val (scores, ids) = b.entries
    val bb = ByteBuffer.allocate(4 + 16 * scores.length)
    bb.putInt(scores.length)
    var i = 0
    while (i < scores.length) {
      bb.putDouble(scores(i)); bb.putLong(ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buffer = {
    val b = new TopKByScore.Buffer(k)
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.add(bb.getDouble, bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(left = newLeft, right = newRight)
}

object TopKByScore {

  /** Fixed-capacity min-heap rooted at the WEAKEST kept entry (rank
    * order: score DESC, ties id ASC — so "weaker" = smaller score, or
    * equal score and larger id). At most k entries live at any time;
    * an incoming entry either beats the root (replace + sift down) or
    * is dropped in O(1). */
  final class Buffer(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    /** a is weaker than b under (score DESC, id ASC) rank order.
      * Compared via java.lang.Double.compare — a TOTAL order that ranks
      * NaN above every other double, exactly matching Spark's DESC sort
      * (and the row_number oracle). Naive `<`/`==` is not total for NaN:
      * NaN entries would be silently dropped when the buffer is full and
      * could break the heap invariant while filling. */
    @inline private def weaker(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
      val c = java.lang.Double.compare(sa, sb)
      c < 0 || (c == 0 && ia > ib)
    }

    def add(s: Double, i: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = i; n += 1
        siftUp(n - 1)
      } else if (weaker(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) >> 1
        if (weaker(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1
        val r = l + 1
        var m = i
        if (l < n && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < n && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def absorb(o: Buffer): Unit = {
      var i = 0
      while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
    }

    /** Live entries in heap order (serialization — order-free). */
    def entries: (Array[Double], Array[Long]) =
      (scores.take(n), ids.take(n))

    /** Entries in RANK order: score DESC, ties id ASC. */
    def ranked: (Array[Double], Array[Long]) = {
      // Same total order as `weaker` (Double.compare handles NaN), so
      // sortWith never sees an intransitive comparator (timsort throws on
      // contract violations).
      val idx = Array.range(0, n).sortWith { (a, b) =>
        val c = java.lang.Double.compare(scores(a), scores(b))
        c > 0 || (c == 0 && ids(a) < ids(b))
      }
      (idx.map(scores), idx.map(ids))
    }
  }

  /** Column API: per-group top-k (score, id) pairs as a rank-ordered
    * array<struct<score, id>> with O(k) aggregation state. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score),
        ExpressionUtils.expression(id), k).toAggregateExpression())
}

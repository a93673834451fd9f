package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact k-th smallest LONG per group as a bounded-heap
  * [[TypedImperativeAggregate]] — the map-parallel selection kernel
  * behind [[graft.ops.LshGuard.capBuckets]]'s two-pass hot-bucket cap.
  *
  * Returns the value at rank `min(n, k)` of the group's values in
  * ascending order (the k-th smallest once the group holds ≥ k values;
  * the maximum before that), `null` for a group with no non-null input.
  * Nulls are skipped, matching every SQL aggregate.
  *
  * Why an imperative aggregate and not a window: ranking a bucket with
  * `row_number()` funnels ALL of a collapsed bucket's rows through the
  * ONE task that owns its partition — an O(m log m) single-task sort
  * (measured 8.6 s at 1M identical vectors, round 14). This aggregate's
  * partial state is a max-heap of AT MOST k values, so a collapsed
  * bucket costs each map task one O(rows · log k) streaming pass over
  * its own partition, the shuffle moves ≤ k values per (bucket, task),
  * and the final merge handles ≤ tasks·k values — every term
  * map-parallel, none proportional to the bucket's full membership.
  * The heap array starts at 8 and doubles lazily to k, so the
  * many-small-buckets regime (an ObjectHashAggregate map holding one
  * buffer per bucket) never pays k-sized allocations for tiny groups.
  */
case class KthSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KthSmallest.BoundedMaxHeap]
  with UnaryLike[Expression] {

  require(k >= 1, s"kth_smallest requires k >= 1, got $k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kth_smallest"

  // analysis-time type check: the cap's order column is always an id
  // cast to long at the call site; anything else should fail in
  // analysis, not as an executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KthSmallest.BoundedMaxHeap =
    new KthSmallest.BoundedMaxHeap(k)

  override def update(buffer: KthSmallest.BoundedMaxHeap,
      input: InternalRow): KthSmallest.BoundedMaxHeap = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KthSmallest.BoundedMaxHeap,
      other: KthSmallest.BoundedMaxHeap): KthSmallest.BoundedMaxHeap = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: KthSmallest.BoundedMaxHeap): Any =
    if (buffer.size == 0) null else buffer.max

  override def serialize(buffer: KthSmallest.BoundedMaxHeap): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    buffer.foreach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KthSmallest.BoundedMaxHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new KthSmallest.BoundedMaxHeap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KthSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KthSmallest =
    copy(child = newChild)
}

object KthSmallest {

  /** Binary max-heap retaining the `k` smallest longs offered. The
    * backing array starts at 8 and doubles to at most `k` on demand.
    */
  final class BoundedMaxHeap(k: Int) {
    private var arr = new Array[Long](math.min(k, 8))
    private var n = 0

    def size: Int = n

    /** Largest retained value = the min(seen, k)-th smallest seen. */
    def max: Long = arr(0)

    def offer(v: Long): Unit =
      if (n < k) {
        if (n == arr.length)
          arr = java.util.Arrays.copyOf(arr, math.min(k.toLong, arr.length * 2L).toInt)
        arr(n) = v
        n += 1
        siftUp(n - 1)
      } else if (v < arr(0)) {
        arr(0) = v
        siftDown()
      }

    def absorb(other: BoundedMaxHeap): Unit = other.foreach(offer)

    def foreach(f: Long => Unit): Unit = {
      var i = 0
      while (i < n) { f(arr(i)); i += 1 }
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      val v = arr(i)
      while (i > 0 && arr((i - 1) >> 1) < v) {
        arr(i) = arr((i - 1) >> 1)
        i = (i - 1) >> 1
      }
      arr(i) = v
    }

    private def siftDown(): Unit = {
      var i = 0
      val v = arr(0)
      var c = 1
      while (c < n) {
        if (c + 1 < n && arr(c + 1) > arr(c)) c += 1
        if (arr(c) <= v) c = n // done
        else { arr(i) = arr(c); i = c; c = 2 * i + 1 }
      }
      arr(i) = v
    }
  }
}

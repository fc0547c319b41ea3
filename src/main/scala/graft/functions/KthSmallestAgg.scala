package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact k-th smallest string key per group with a BOUNDED buffer — the
  * selection primitive behind skew-safe per-group top-k (quota sampling,
  * `operators.Sampling.sourceCap`).
  *
  * The naive top-k-per-group shape (`row_number() OVER (PARTITION BY g
  * ORDER BY key)`) sorts each group on ONE reducer: a dominant group
  * serializes the whole job, and AQE cannot split a window partition.
  * This aggregate instead keeps a max-heap of the k smallest keys seen —
  * at most k strings per (group × partition) — and map-side combines
  * like any built-in, so the shuffle carries O(k) state per group
  * however many rows the group has. The final value is the k-th smallest
  * key (the heap max once full), or NULL when the group holds fewer than
  * k rows — the "no threshold needed, keep everything" signal.
  *
  * Keys must already encode the caller's total order as a plain string
  * compare (fixed-width encodings; see `Sampling.sortKey`).
  */
case class KthSmallestAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[String]] {

  require(k > 0, "kth_smallest requires k > 0")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "kth_smallest"

  // max-heap: peek() is the largest of the k smallest kept so far
  override def createAggregationBuffer(): java.util.PriorityQueue[String] =
    new java.util.PriorityQueue[String](k, java.util.Comparator.reverseOrder[String]())

  private def insert(heap: java.util.PriorityQueue[String], s: String): Unit =
    if (heap.size < k) heap.offer(s)
    else if (s.compareTo(heap.peek) < 0) { heap.poll(); heap.offer(s) }

  override def update(
      heap: java.util.PriorityQueue[String],
      input: InternalRow): java.util.PriorityQueue[String] = {
    val v = child.eval(input)
    if (v != null) insert(heap, v.asInstanceOf[UTF8String].toString)
    heap
  }

  override def merge(
      a: java.util.PriorityQueue[String],
      b: java.util.PriorityQueue[String]): java.util.PriorityQueue[String] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(heap: java.util.PriorityQueue[String]): Any =
    if (heap.size < k) null else UTF8String.fromString(heap.peek)

  override def serialize(heap: java.util.PriorityQueue[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(out)
    d.writeInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes(StandardCharsets.UTF_8)
      d.writeInt(bytes.length)
      d.write(bytes)
    }
    d.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[String] = {
    val d = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val heap = createAggregationBuffer()
    val n = d.readInt()
    var i = 0
    while (i < n) {
      val len = d.readInt()
      val buf = new Array[Byte](len)
      d.readFully(buf)
      heap.offer(new String(buf, StandardCharsets.UTF_8))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KthSmallestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KthSmallestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KthSmallestAgg =
    copy(child = newChildren.head)
}

object KthSmallestAgg {
  def kth_smallest(key: Column, k: Int): Column =
    GraftBridge.column(
      KthSmallestAgg(GraftBridge.expression(key), k).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** SimHash as a single custom aggregate (SURVEY §2.9 near-dup dedup).
  *
  * The composable form needs 64 separate `sum(CASE WHEN bit ...)` agg
  * expressions — 64 buffer slots, 64 interpreted updates per row
  * (measured 12 s over the sf0.1 shingle explosion). This
  * [[TypedImperativeAggregate]] keeps one `Array[Int](64)` buffer and
  * does the whole per-row update in a single tight loop over the hash's
  * bits, then packs the majority-vote bits into one 64-bit signature at
  * eval. Same partial/final aggregation contract as any built-in — it
  * map-side combines, so the shuffle carries one 256-byte buffer per
  * (group × partition), not the token stream.
  *
  * Input: a 64-bit token/shingle hash per row. Output: the SimHash
  * signature (LongType) whose bit i is set iff more input hashes had bit
  * i set than unset.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(child = newChildren.head)
}

object SimhashAgg {
  def simhash_agg(hash: Column): Column =
    GraftBridge.column(
      SimhashAgg(GraftBridge.expression(hash)).toAggregateExpression())
}

package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter candidates as a single custom aggregate
  * (SURVEY §2.9 text analysis — frequency mining over vocabularies that
  * do not fit anywhere).
  *
  * State is AT MOST `k` (item, weight) entries per aggregation buffer, no
  * matter how many distinct items stream through — the property that
  * makes frequency mining possible over a 100 TB shingle vocabulary
  * where exact `GROUP BY shingle` state is the size of the corpus.
  * Buffers map-side combine like any built-in aggregate; the merge is
  * the mergeable-summaries rule (Agarwal et al., PODS'12): sum counts,
  * then subtract the (k+1)-th largest and drop non-positives, which
  * keeps the total undercount of any item ≤ N/k across arbitrary merge
  * trees.
  *
  * GUARANTEE (the one downstream code may rely on): every item with true
  * count > N/k survives to the output — so the candidate list is a
  * SUPERSET of the true heavy hitters, and an exact recount of just the
  * candidates yields a deterministic result (see
  * [[graft.operators.HeavyHitters]]). Per-item counters are NOT output:
  * their residual values depend on partition order; only the (sorted)
  * candidate item list is deterministic enough to surface.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "misra_gries: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString // materialize: Spark reuses UTF8String buffers
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // classic MG decrement-all: happens at most N/k times, each
          // O(k) ⇒ amortized O(1) per arrival
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (key, c) =>
            if (c == 1L) dead += key else buf.update(key, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest weight from everything; ≤ k
      // entries stay positive, undercounts stay additive
      val weights = a.values.toArray
      java.util.Arrays.sort(weights)
      val sub = weights(weights.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.foreach { case (s, c) =>
        if (c - sub <= 0L) dead += s else a.update(s, c - sub)
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toSeq.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.size)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      out.update(new String(arr, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** Heavy-hitter CANDIDATE list (array<string>, sorted): superset of all
    * items with count > N/k.
    *
    * WARNING — candidate sets are PARTITION-ORDER DEPENDENT: which
    * sub-threshold items survive the sketch depends on merge order, so
    * the raw output is NOT run-to-run deterministic. Callers MUST
    * re-filter the candidates with an exact recount against the N/k
    * floor before surfacing them through any determinism- or
    * oracle-gated path (the [[graft.operators.HeavyHitters]] pattern:
    * candidate-sized recount join, then floor filter). Only the
    * SUPERSET property (every true heavy hitter is present) is
    * guaranteed, never the exact membership. */
  def mg_candidates(item: Column, k: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.expression(item), k).toAggregateExpression())
}

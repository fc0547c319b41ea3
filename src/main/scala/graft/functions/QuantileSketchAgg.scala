package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MERGEABLE QUANTILE SKETCH as a custom Catalyst aggregate — the
  * quantile leg of the sketch family (q42 HLL distinct, q90/q145
  * Misra-Gries heavy hitters, q169/q172 Count-Min frequencies): a
  * compactor-stack summary in the Manku–Rajagopalan–Lindsay '98 /
  * KLL '16 lineage, with DETERMINISTIC alternating compaction offsets
  * instead of coin flips (the MRL-style choice: same bounds, no RNG in
  * an aggregation buffer).
  *
  * Structure: level i holds up to [[QuantileSketchAgg.K]] items, each
  * representing 2^i input rows. A full level sorts, keeps every second
  * item (offset alternating per level — adjacent compactions cancel
  * rank error in opposite directions), and promotes survivors one
  * level up. `merge` concatenates level-wise and re-compacts — the
  * mergeability that lets every shard of a 100 TB table sketch
  * independently and fold at the end, the same monoid posture as the
  * CMS cells. Memory: O(K · log(n/K)) items per group TOTAL, any n.
  *
  * Worst-case rank error: each compaction at level i perturbs any
  * rank by ≤ 2^(i−1), and level i compacts ≤ n/(K/2 · 2^i) times, so
  * total ≤ Σ n/K = n·levels/K — with alternation the observed error
  * is far smaller (the q182 gate asserts the generous bound; the spec
  * pins the observed one).
  *
  * Output: the lower-quantile estimates (smallest kept value whose
  * cumulative weight reaches ⌈q·n⌉) for the requested quantiles, as
  * `array<bigint>`. Estimates are always ACTUAL input values. */
case class QuantileSketchAgg(
    child: Expression,
    quantilesPct: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketchAgg.State] {

  import QuantileSketchAgg._

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mrl_quantiles"

  override def createAggregationBuffer(): State = new State()

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: State, b: State): State = { a.mergeIn(b); a }

  override def eval(buf: State): Any =
    new GenericArrayData(quantilesPct.map(p => buf.quantile(p)).toArray)

  override def serialize(buf: State): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): State = State.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

object QuantileSketchAgg {

  /** Items per compactor level. */
  val K = 256

  /** The compactor stack. Level i's items each stand for 2^i inputs. */
  final class State {
    private[QuantileSketchAgg] var levels: ArrayBuffer[ArrayBuffer[Long]] =
      ArrayBuffer(ArrayBuffer.empty[Long])
    /** per-level alternating compaction offset (deterministic). */
    private[QuantileSketchAgg] var offsets: ArrayBuffer[Boolean] =
      ArrayBuffer(false)
    private[graft] var count: Long = 0L

    def insert(v: Long): Unit = {
      levels(0) += v
      count += 1
      if (levels(0).length >= K) compact(0)
    }

    private def ensureLevel(i: Int): Unit =
      while (levels.length <= i) { levels += ArrayBuffer.empty[Long]; offsets += false }

    private def compact(i: Int): Unit = {
      ensureLevel(i + 1)
      val buf = levels(i)
      val sorted = buf.toArray
      java.util.Arrays.sort(sorted)
      val start = if (offsets(i)) 1 else 0
      offsets(i) = !offsets(i)
      buf.clear()
      var j = start
      while (j < sorted.length) { levels(i + 1) += sorted(j); j += 2 }
      if (levels(i + 1).length >= K) compact(i + 1)
    }

    def mergeIn(other: State): Unit = {
      var i = 0
      while (i < other.levels.length) {
        if (other.levels(i).nonEmpty) {
          ensureLevel(i)
          levels(i) ++= other.levels(i)
        }
        i += 1
      }
      count += other.count
      var l = 0
      while (l < levels.length) {
        if (levels(l).length >= K) compact(l)
        l += 1
      }
    }

    /** Lower quantile at p percent: smallest kept value whose weighted
      * cumulative count reaches ⌈p·n/100⌉, with n the TRACKED TRUE
      * count — not the retained weight. The two drift apart whenever a
      * compaction runs over an odd-sized level (always reachable via
      * [[mergeIn]], where level sizes are arbitrary): the dropped
      * unpaired item loses its weight from the retained total, so a
      * totalW-derived rank would target a slightly different position
      * than the gate's ⌈p·n/100⌉ computed from true n, adding rank
      * error the sketch bound does not account for. */
    def quantile(p: Int): Long = {
      val weighted = levels.zipWithIndex.flatMap { case (buf, i) =>
        val w = 1L << i
        buf.map(v => (v, w))
      }.sortBy(_._1)
      if (weighted.isEmpty) return 0L
      val target = math.max(1L, (count * p + 99L) / 100L)
      var cum = 0L
      var idx = 0
      while (idx < weighted.length) {
        cum += weighted(idx)._2
        if (cum >= target) return weighted(idx)._1
        idx += 1
      }
      weighted.last._1
    }

    def toBytes: Array[Byte] = {
      val nItems = levels.map(_.length).sum
      val bb = ByteBuffer.allocate(8 + 4 + levels.length * (4 + 1) + nItems * 8)
      bb.putLong(count)
      bb.putInt(levels.length)
      levels.zipWithIndex.foreach { case (buf, i) =>
        bb.putInt(buf.length)
        bb.put(if (offsets(i)) 1.toByte else 0.toByte)
        buf.foreach(bb.putLong)
      }
      bb.array()
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte]): State = {
      val bb = ByteBuffer.wrap(bytes)
      val s = new State()
      s.count = bb.getLong()
      val nLevels = bb.getInt()
      s.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Long])
      s.offsets = ArrayBuffer.fill(nLevels)(false)
      var i = 0
      while (i < nLevels) {
        val len = bb.getInt()
        s.offsets(i) = bb.get() == 1.toByte
        var j = 0
        while (j < len) { s.levels(i) += bb.getLong(); j += 1 }
        i += 1
      }
      s
    }
  }

  /** Column-API entry: `mrl_quantiles(x, Seq(50, 90, 99))`. */
  def mrl_quantiles(x: Column, pcts: Seq[Int]): Column =
    GraftBridge.column(
      QuantileSketchAgg(GraftBridge.expression(x), pcts).toAggregateExpression())
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native Catalyst expression — the probe
  * side of a runtime-filter semi-join (see
  * [[graft.operators.BloomPrune]]).
  *
  * Why a custom expression: Spark's own runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) injects exactly this
  * shape, but only when its size-estimate heuristics fire; the operator
  * needs the filter unconditionally and with an explicitly sized bloom.
  * The filter holds a Broadcast handle — the bloom's bits ship to each
  * executor once, not once per task — and resolves it a single time per
  * generated class (mutable state init), so the per-row cost is one hash
  * probe inside whole-stage codegen.
  */
case class BloomMightContainLong(
    child: Expression,
    bloomBc: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${dt.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = bloomBc.value

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloomBc,
      classOf[Broadcast[_]].getName)
    val bloomVar = ctx.addMutableState(bloomCls, "bloomFilter",
      v => s"$v = ($bloomCls) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** EXACT membership count of an `array<bigint>` column against a SORTED
  * broadcast long array: how many of the row's hashes appear in the
  * reference set (binary search per element, so a row costs
  * O(|array| · log |set|) with zero allocation).
  *
  * Why a custom expression: the built-in that computes this shape —
  * `size(array_intersect(col, lit(set)))` — rebuilds a hash set of the
  * literal side on EVERY row (Spark's ArrayIntersect has no literal
  * fast path), turning a per-row probe into a per-row O(|set|) build;
  * and a join-based count needs an explode + shuffle + re-aggregate,
  * which a STREAMING map-only screen (the q167 at-ingest
  * decontamination) cannot afford on the firehose. Like
  * [[BloomMightContainLong]] the reference set rides a Broadcast handle
  * — shipped to each executor once, resolved once per generated class —
  * but membership here is EXACT (the decontamination verdict is a
  * keep/drop decision, so false positives would drop clean documents). */
case class SortedLongSetCount(
    child: Expression,
    sortedSetBc: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_set_count"

  @transient private lazy val set: Array[Long] = sortedSetBc.value

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    var n = 0L
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i) &&
          java.util.Arrays.binarySearch(set, arr.getLong(i)) >= 0) n += 1L
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("sortedSetBc", sortedSetBc,
      classOf[Broadcast[_]].getName)
    val setVar = ctx.addMutableState("long[]", "sortedSet",
      v => s"$v = (long[]) $bcRef.value();")
    val cnt = ctx.freshName("cnt")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long $cnt = 0L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i) &&
         |      java.util.Arrays.binarySearch($setVar, $c.getLong($i)) >= 0) $cnt++;
         |}
         |${ev.value} = $cnt;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** EXACT keyed weight sum of an `array<bigint>` column against a SORTED
  * broadcast key array with an ALIGNED weight array: Σ weights[i] over
  * the row's elements found in the key set (binary search per element —
  * O(|array| · log |keys|), zero allocation).
  *
  * Why a custom expression: the linear-model serving shape
  * `aggregate(transform(toks, t -> element_at(modelMap, t)), ...)` over
  * a LITERAL map pays a linear scan of the map per element (Catalyst's
  * `GetMapValue` has no sorted/hashed fast path for literal maps), i.e.
  * O(|doc| · K) string comparisons per document — measured as the
  * dominant cost of the q152 at-ingest scorer. Hashing the model keys
  * once at build time (with the ENGINE's own xxhash64, so the stream
  * side's `transform(toks, xxhash64)` agrees by construction) turns
  * every probe into a long binary search inside whole-stage codegen.
  * Like [[SortedLongSetCount]] both arrays ride Broadcast handles —
  * shipped once per executor, resolved once per generated class. */
case class SortedKeyWeightSum(
    child: Expression,
    keysBc: Broadcast[Array[Long]],
    weightsBc: Broadcast[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_weight_sum"

  @transient private lazy val keys: Array[Long] = keysBc.value
  @transient private lazy val weights: Array[Long] = weightsBc.value

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var i = 0
    var s = 0L
    val len = arr.numElements()
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val idx = java.util.Arrays.binarySearch(keys, arr.getLong(i))
        if (idx >= 0) s += weights(idx)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = ctx.addReferenceObj("sortedKeysBc", keysBc,
      classOf[Broadcast[_]].getName)
    val wRef = ctx.addReferenceObj("alignedWeightsBc", weightsBc,
      classOf[Broadcast[_]].getName)
    val kVar = ctx.addMutableState("long[]", "sortedKeys",
      v => s"$v = (long[]) $kRef.value();")
    val wVar = ctx.addMutableState("long[]", "alignedWeights",
      v => s"$v = (long[]) $wRef.value();")
    val sum = ctx.freshName("sum")
    val i = ctx.freshName("i")
    val idx = ctx.freshName("idx")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long $sum = 0L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    int $idx = java.util.Arrays.binarySearch($kVar, $c.getLong($i));
         |    if ($idx >= 0) $sum += $wVar[$idx];
         |  }
         |}
         |${ev.value} = $sum;""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
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

package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate: `bloom.mightContainLong(child)` against a
  * bloom filter captured at PLAN TIME — the explicit, caller-controlled
  * form of the runtime semi-join filter AQE injects when it can.
  *
  * Scale shape: the filter is built DISTRIBUTED from the small side
  * (`DataFrame.stat.bloomFilter` tree-aggregates partial bitmaps), then
  * rides to executors once per stage inside the codegen references
  * array (task binaries are broadcast). Applying it on the BIG side
  * before a shuffle join turns "shuffle 100 TB then discard 99%" into
  * "discard 99% at the scan, shuffle 1%" — the filter is consulted
  * inside WholeStageCodegen, no UDF boundary, no extra pass.
  *
  * Correctness contract: `mightContain` has NO false negatives, so this
  * expression may only ever be conjoined in FRONT of an exact
  * join/filter on the same key (see [[graft.operators.BloomPrune]]) —
  * false positives are then eliminated downstream and the composed
  * result is exact for any fpp.
  *
  * Null child → false (a null key matches nothing in an equi-join, so
  * dropping the row early is semantics-preserving there — the only
  * placement this operator's contract allows).
  */
case class BloomKeyFilter(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT key, got ${child.dataType.simpleString}" +
        " (cast integral keys to long at the call site)")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code =
      code"""
        |${c.code}
        |boolean ${ev.value} = !${c.isNull} &&
        |  $ref.mightContainLong(${c.value});
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomKeyFilter =
    copy(child = newChild)

  override def prettyName: String = "bloom_key_filter"
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Exact per-group top-k as an AGGREGATE — `top_k(col, k)` returns the
  * k largest values, descending.
  *
  * Why an aggregate and not `row_number() <= k`: an aggregate carries a
  * bounded k-element heap through the map side, so each partition sends
  * at most k values per group into the shuffle and partial heaps merge
  * associatively — the same effect `WindowGroupLimit` gives the window
  * form, but usable anywhere an aggregate is (multi-agg groupBy,
  * streaming aggregations, rollups) and with state that is k values per
  * group, period.
  *
  * This is the third rung of the custom-Catalyst ladder in this repo
  * next to `DotProduct` (codegen scalar expression) and `AsOfJoinPlan`
  * (whole-operator plan): a `TypedImperativeAggregate` with an explicit
  * serialized partial state (one UnsafeRow-encoded array per group).
  *
  * Null inputs are skipped (SQL aggregate convention). Any orderable
  * type works; values are copied out of reused input rows before
  * buffering.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k > 0, s"top_k: k must be positive, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k does not support ordering on ${child.dataType}")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  // min-heap (head = smallest of the kept k): evict the head when full
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(ordering.reverse)

  private def add(buf: mutable.PriorityQueue[Any], v: Any): Unit =
    if (v != null) {
      if (buf.size < k) buf += InternalRow.copyValue(v)
      else if (ordering.compare(v, buf.head) > 0) {
        buf.dequeue()
        buf += InternalRow.copyValue(v)
      }
    }

  override def update(buf: mutable.PriorityQueue[Any],
      input: InternalRow): mutable.PriorityQueue[Any] = {
    add(buf, child.eval(input))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any],
      other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering.reverse))

  // partial state crosses the wire as one UnsafeRow holding the array
  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](dataType))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] =
    serProj(InternalRow(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val buf = createAggregationBuffer()
    row.getArray(0).toObjectArray(child.dataType).foreach(v => add(buf, v))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {

  /** Column DSL: `df.groupBy(g).agg(TopKAgg.topK(col("v"), 5))`. */
  def topK(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toColumn(
      TopKAgg(GraftBridge.toExpr(c), k).toAggregateExpression())
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSet, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join: the full custom-operator ladder (SURVEY.md §4
  * custom-work item: logical plan + strategy + physical exec, activated
  * through `SparkSessionExtensions` / `experimentalMethods`).
  *
  * Semantics (same contract as the composed `operators.AsOfJoin.asof`,
  * which reproduces the classic "enrich events with the latest state at
  * event time" operator the reference family needs and Spark lacks): for
  * every left row, attach the payload of the most recent right row with
  * `right.time <= left.time` in the same key group, else nulls. Ties on
  * `(key, time)` resolve to the payload-max right row — deterministic
  * under any partitioning, so oracle hash-compares can't flake.
  *
  * Why a physical operator when the composed form already works: the
  * union+window plan shuffles LEFT+RIGHT rows together, sorts the merged
  * stream, evaluates a running `last(...)` window over it, then filters
  * the right rows back out — every right row travels through the window
  * operator and the filter. This exec instead declares
  * `ClusteredDistribution`/`SortOrder` requirements per child (one hash
  * shuffle + in-partition sort EACH, planned by EnsureRequirements like
  * any sort-merge join) and streams a per-partition merge holding O(1)
  * state: one buffered right row and the last match. No union row
  * widening (left rows never carry null payload slots through the
  * shuffle), no window machinery, no post-filter.
  *
  * Scale: both sides shuffle ONCE on the key regardless of size — no
  * broadcast requirement, no range-join explosion. Skewed keys degrade
  * to single-task merges exactly like sort-merge join; salt upstream if
  * one key dominates (operators.Salted).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute])
  extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty)
  require(payload.length == payloadOut.length)

  override def output: Seq[Attribute] = left.output ++ payloadOut

  // payloadOut attrs are minted by this node (fresh exprIds, nullable) —
  // without this, CheckAnalysis counts them as missing inputs.
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (builder path) and
  * `spark.experimental.extraStrategies` (already-built sessions) — both
  * feed the same planner list, and AQE re-planning sees them too.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.payload, n.payloadOut) :: Nil
    case _ => Nil
  }
}

/** Streaming sort-merge as-of join.
  *
  * Children arrive hash-clustered on the keys and sorted by
  * `(keys, time)` — the right side additionally by the payload columns,
  * which makes "last right row taken" the payload-max among equal
  * timestamps (determinism; mirrors the composed form's tie-break). The
  * merge holds one buffered right row + the last matching right row per
  * key: O(1) memory, single forward pass over both sorted streams.
  *
  * Null times follow SQL comparison semantics: a null left time matches
  * nothing; null-time right rows are skipped (both sort nulls-first, so
  * they are consumed before any real comparison happens).
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute,
    payload: Seq[Attribute],
    payloadOut: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Right ordering includes the (orderable) payload columns so the last
  // row consumed at a tied (key, time) is the payload-max — deterministic.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val l = (leftKeys :+ leftTime).map(SortOrder(_, Ascending))
    val sortablePayload = payload.filter(a => RowOrdering.isOrderable(a.dataType))
    val r = ((rightKeys :+ rightTime) ++ sortablePayload).map(SortOrder(_, Ascending))
    Seq(l, r)
  }

  // Left rows pass through in order, one output row each.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val payloadExprs = payload
    val outTypes = (leftOut ++ payload).map(_.dataType).toArray

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullPayload: InternalRow = new GenericInternalRow(payloadExprs.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outTypes)

      new Iterator[InternalRow] {
        // One buffered right row; rows behind it are gone (single pass).
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
        // Last right row with time <= some seen left time, plus its key
        // (both copied: sorter iterators reuse row buffers).
        private var lastMatch: InternalRow = _
        private var lastMatchKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTime = lTimeProj(l)
          val lTimeIsNull = lTime.isNullAt(0)
          var scanning = rHead != null
          while (scanning) {
            val cmpKey = keyOrd.compare(rKeyProj(rHead), lKey)
            if (cmpKey > 0) {
              scanning = false // right is ahead; keep it buffered
            } else if (cmpKey < 0) {
              rHead = if (rIter.hasNext) rIter.next() else null // stale key
              scanning = rHead != null
            } else {
              val rTime = rTimeProj(rHead)
              if (rTime.isNullAt(0)) {
                // null time can never satisfy <= : consume and drop
                rHead = if (rIter.hasNext) rIter.next() else null
                scanning = rHead != null
              } else if (!lTimeIsNull && timeOrd.compare(rTime, lTime) <= 0) {
                lastMatch = rHead.copy()
                lastMatchKey = rKeyProj(rHead).copy()
                rHead = if (rIter.hasNext) rIter.next() else null
                scanning = rHead != null
              } else {
                scanning = false // right row is in this left row's future
              }
            }
          }
          val matched =
            lastMatch != null && keyOrd.compare(lastMatchKey, lKey) == 0
          numOutputRows += 1
          resultProj(joined(l, if (matched) payloadProj(lastMatch) else nullPayload))
        }
      }
    }
  }
}

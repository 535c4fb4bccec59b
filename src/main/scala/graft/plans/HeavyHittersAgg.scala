package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MISRA-GRIES heavy-hitter sketch as an aggregate —
  * `mg_candidates(col, k)` returns a value set GUARANTEED to contain
  * every item whose true frequency exceeds N/(k+1), using k counters of
  * state total, independent of N or the key cardinality.
  *
  * Why this beats `groupBy(key).count()` at 100 TB: an exact count
  * keyed by a high-cardinality column shuffles one row per DISTINCT
  * key; the sketch shuffles at most k (value, count) pairs per
  * partition, and partial sketches merge associatively (Agarwal et
  * al., "Mergeable Summaries", PODS'12: sum counts, then subtract the
  * (k+1)-th largest and drop non-positives — the error bound N/(k+1)
  * survives arbitrary merge trees). The classic use is the 2-pass
  * exact heavy hitters in [[HeavyHitters.exact]]: sketch → bounded
  * candidate set → one exact count restricted to candidates. Both
  * passes are scan+aggregate; nothing is ever keyed by the full
  * cardinality.
  *
  * Update path is the textbook O(1)-amortized form: tracked key →
  * increment; free slot → insert; otherwise decrement ALL counters
  * (each such sweep is paid for by the k inserts that preceded it).
  * Estimated counts are LOWER bounds (true count ≥ estimate ≥ true
  * count − N/(k+1)); eval returns candidates ordered by estimate
  * descending so callers can inspect the sketch itself, but any exact
  * claim needs the second pass. Nulls are skipped (SQL convention).
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && k <= 1000000,
    s"mg_candidates: k must be in [1, 1e6] (sketch state is O(k)), got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"mg_candidates does not support ${child.dataType}")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_candidates"

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Any, Long],
      input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf(v) = c + 1
        case None if buf.size < k => buf(InternalRow.copyValue(v)) = 1L
        case None =>
          // decrement-all; drop zeros (amortized O(1) per update)
          val dead = buf.iterator.flatMap { case (key, c) =>
            if (c == 1L) Some(key) else { buf(key) = c - 1; None }
          }.toArray
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long],
      other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (v, c) => buf(v) = buf.getOrElse(v, 0L) + c }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives
      val d = buf.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = buf.iterator.flatMap { case (key, c) =>
        if (c - d <= 0L) Some(key) else { buf(key) = c - d; None }
      }.toArray
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any =
    new GenericArrayData(buf.toArray
      .sortWith((a, b) =>
        a._2 > b._2 || (a._2 == b._2 && ordering.compare(a._1, b._1) < 0))
      .map(_._1))

  @transient private lazy val serProj = UnsafeProjection.create(
    Array[DataType](dataType, ArrayType(LongType, containsNull = false)))

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val kv = buf.toArray
    serProj(InternalRow(
      new GenericArrayData(kv.map(_._1)),
      new GenericArrayData(kv.map(_._2)))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val keys = row.getArray(0).toObjectArray(child.dataType)
    val counts = row.getArray(1).toLongArray()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < keys.length) { buf(keys(i)) = counts(i); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

object HeavyHitters {

  import org.apache.spark.sql.functions._

  /** Column DSL: the sketch's candidate array (superset of every item
    * with frequency > N/(k+1), estimate-descending).
    */
  def candidates(c: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toColumn(
      HeavyHittersAgg(GraftBridge.toExpr(c), k).toAggregateExpression())
  }

  /** EXACT heavy hitters (share > `minShare`) in two sketch-bounded
    * passes: (1) one scan folds the MG sketch (k = slack/minShare
    * counters — slack > 1 keeps the guarantee strict: MG needs
    * k+1 > 1/minShare) plus the exact row count; (2) one scan counts
    * ONLY rows matching the ≤k candidates, keeping counts above the
    * threshold. Driver state is the candidate array — k values, the
    * price of turning an approximate sketch into an exact answer
    * without ever shuffling the full key cardinality.
    *
    * Returns (key, n_rows, share), one row per heavy hitter.
    */
  def exact(df: DataFrame, key: Column, minShare: Double,
      slack: Int = 4): DataFrame = {
    require(minShare > 0 && minShare < 1, s"minShare in (0,1): $minShare")
    val k = math.ceil(slack / minShare).toInt
    val first = df.agg(candidates(key, k).as("cand"),
      count(lit(1)).as("n")).head()
    val cand = first.getSeq[Any](0)
    val total = first.getLong(1)
    df.where(key.isin(cand: _*))
      .groupBy(key.as("key")).agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > lit(minShare) * total)
      .withColumn("share", col("n_rows") / lit(total.toDouble))
  }
}

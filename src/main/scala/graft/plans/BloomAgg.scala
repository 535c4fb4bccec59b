package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_agg(col, expectedItems, fpp)` — a column's values folded into
  * a serialized `spark.util.sketch.BloomFilter` (BinaryType result).
  *
  * The aggregate form is what makes PER-GROUP sketches one pass:
  * `groupBy(input_file_name()).agg(bloom_agg(key))` builds one filter
  * per output FILE in a single distributed scan — the write path of
  * the warehouse's bloom file index ([[graft.pipeline.Warehouse]]),
  * where per-file min/max stats can't skip anything because a
  * high-cardinality key overlaps every file's range. Partial buffers
  * merge with a bitwise OR (`mergeInPlace`) — same (m, k) geometry by
  * construction, so merging is exact and order-free.
  *
  * Encoding contract (probe side must mirror it —
  * [[BloomAgg.mightContain]]): integral types widen to putLong;
  * strings hash their UTF-8 bytes; binary hashes raw bytes. Nulls are
  * skipped (SQL aggregate convention) — a bloom can therefore never
  * attest "contains null"; null-predicate reads must keep every file.
  */
case class BloomAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter]
  with UnaryLike[Expression] {

  require(expectedItems > 0, s"bloom_agg: expectedItems > 0: $expectedItems")
  require(fpp > 0.0 && fpp < 1.0, s"bloom_agg: fpp in (0,1): $fpp")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg supports integral/string/binary columns, not $dt")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) v match {
      case b: Byte => buf.putLong(b.toLong)
      case s: Short => buf.putLong(s.toLong)
      case i: Int => buf.putLong(i.toLong)
      case l: Long => buf.putLong(l)
      case s: UTF8String => buf.putBinary(s.getBytes)
      case b: Array[Byte] => buf.putBinary(b)
      case other => throw new IllegalStateException(
        s"bloom_agg: unexpected value $other")
    }
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomAgg {

  /** Column DSL: serialized per-group bloom filter of `c`'s values. */
  def bloom(c: Column, expectedItems: Long, fpp: Double): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toColumn(
      BloomAgg(GraftBridge.toExpr(c), expectedItems, fpp)
        .toAggregateExpression())
  }

  /** Probe with the SAME encoding the aggregate used to populate. */
  def mightContain(bf: BloomFilter, value: Any): Boolean = value match {
    case b: Byte => bf.mightContainLong(b.toLong)
    case s: Short => bf.mightContainLong(s.toLong)
    case i: Int => bf.mightContainLong(i.toLong)
    case l: Long => bf.mightContainLong(l)
    case s: String =>
      bf.mightContainBinary(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case s: UTF8String => bf.mightContainBinary(s.getBytes)
    case b: Array[Byte] => bf.mightContainBinary(b)
    case null => true // blooms never attest nulls; cannot skip
    case other => throw new IllegalArgumentException(
      s"bloom probe: unsupported value $other")
  }
}

package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side DELETION-VECTOR membership: the per-task state behind
  * [[DvRowDeleted]]. Holds every deletion vector of the scan as
  * `(path-suffix key, sorted positions)` pairs and answers "is physical
  * row `idx` of the file at `path` deleted?" with a memoized key
  * resolution (one suffix walk per FILE — the scan feeds rows
  * file-by-file, so `lastPath` hits for every row but the first of each
  * file) and a binary search per row. Suffix matching sidesteps the
  * scheme/qualification differences between manifest rels and the
  * scan's `_metadata.file_path` URI; keys are unique within one scan
  * (one manifest's file names, write-job UUIDs included).
  */
final class DvLookup(keys: Array[String], arrs: Array[Array[Long]])
    extends Serializable {
  @transient private var lastPath: UTF8String = _
  @transient private var lastArr: Array[Long] = _

  def hit(path: UTF8String, idx: Long): Boolean = {
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastArr = resolve(path.toString)
    }
    lastArr != null && java.util.Arrays.binarySearch(lastArr, idx) >= 0
  }

  private def resolve(p: String): Array[Long] = {
    var i = 0
    while (i < keys.length) {
      if (p.endsWith(keys(i))) return arrs(i)
      i += 1
    }
    null
  }
}

/** `TRUE` iff the deletion vectors mark physical row `idx` of the file
  * at `path` as deleted — the merge-on-read read filter:
  * `WHERE NOT DvRowDeleted(_metadata.file_path, _metadata.row_index)`.
  * Codegen embeds the [[DvLookup]] as a plan reference object, so the
  * hot path stays inside whole-stage codegen: one virtual call doing a
  * memoized suffix resolve + binary search. Files without a vector
  * resolve to null → never deleted.
  */
case class DvRowDeleted(left: Expression, right: Expression,
    lookup: DvLookup) extends BinaryExpression with Predicate {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_row_deleted"

  override protected def nullSafeEval(path: Any, idx: Any): Any =
    lookup.hit(path.asInstanceOf[UTF8String], idx.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup,
      classOf[DvLookup].getName)
    nullSafeCodeGen(ctx, ev, (p, i) => s"${ev.value} = $ref.hit($p, $i);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

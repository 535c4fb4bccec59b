package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** What [[DvRowDeleted]] asks its lookup: "is physical row `idx` of
  * the file at `path` deleted?" Two implementations: [[DvLookup]]
  * (eager plans — the vectors are known at plan-build time) and
  * [[GrowableDvLookup]] (lazy plans — the vectors of the scan's
  * SURVIVING files are fed during `listFiles`, after pruning but
  * strictly before any task closure serializes).
  */
sealed trait DvResolver extends Serializable {
  def hit(path: UTF8String, idx: Long): Boolean
}

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
    extends DvResolver {
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

/** [[DvLookup]] for LAZY-planned scans, where the file list — and so
  * the set of deletion vectors the scan must apply — is unknown until
  * Spark's own `listFiles` callback has pruned the manifest. Starts
  * EMPTY at plan-build time; `LazyManifestFileIndex`'s prune feeds it
  * each surviving file's vector, driver-side, inside `listFiles`.
  * That ordering is what makes the empty start sound: task closures
  * (which embed this object via the codegen reference array) serialize
  * at STAGE SUBMISSION, strictly after the scan's RDD — and therefore
  * `listFiles` — was built on the driver. Feeds ACCUMULATE (putIfAbsent
  * on the immutable per-file vector), so a plan whose index serves two
  * filter shapes sees the union — each scan needs only its own
  * survivors' vectors, which its own `listFiles` fed.
  */
final class GrowableDvLookup extends DvResolver {
  private val vectors =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
  @transient private var lastPath: UTF8String = _
  @transient private var lastArr: Array[Long] = _

  /** Driver-side feed (inside `listFiles`): `key` is the entry's
    * leading-slash rel suffix, `positions` its sorted vector. */
  def add(key: String, positions: Array[Long]): Unit = {
    vectors.putIfAbsent(key, positions); ()
  }
  def fedFiles: Int = vectors.size()

  def hit(path: UTF8String, idx: Long): Boolean = {
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastArr = resolve(path.toString)
    }
    lastArr != null && java.util.Arrays.binarySearch(lastArr, idx) >= 0
  }

  private def resolve(p: String): Array[Long] = {
    val it = vectors.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (p.endsWith(e.getKey)) return e.getValue
    }
    null
  }
}

/** `TRUE` iff the deletion vectors mark physical row `idx` of the file
  * at `path` as deleted — the merge-on-read read filter:
  * `WHERE NOT DvRowDeleted(_metadata.file_path, _metadata.row_index)`.
  * Codegen embeds the [[DvResolver]] as a plan reference object, so the
  * hot path stays inside whole-stage codegen: one virtual call doing a
  * memoized suffix resolve + binary search. Files without a vector
  * resolve to null → never deleted.
  */
case class DvRowDeleted(left: Expression, right: Expression,
    lookup: DvResolver) extends BinaryExpression with Predicate {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_row_deleted"

  override protected def nullSafeEval(path: Any, idx: Any): Any =
    lookup.hit(path.asInstanceOf[UTF8String], idx.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup,
      classOf[DvResolver].getName)
    nullSafeCodeGen(ctx, ev, (p, i) => s"${ev.value} = $ref.hit($p, $i);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

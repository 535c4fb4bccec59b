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

/** The deletion-vector SIDECAR format, one place: "GDV1" magic,
  * big-endian long count, then `count` big-endian long row positions,
  * sorted ascending. Sidecars are immutable (growth writes a fresh
  * file). Shared by the warehouse's driver-side reader and
  * [[GrowableDvLookup]]'s executor-side on-demand loads.
  */
object DvFormat {
  def read(in: java.io.InputStream, what: String): Array[Long] = {
    val din = new java.io.DataInputStream(
      new java.io.BufferedInputStream(in))
    val magic = new Array[Byte](4)
    din.readFully(magic)
    require(new String(magic,
        java.nio.charset.StandardCharsets.US_ASCII) == "GDV1",
      s"bad deletion-vector magic in $what")
    val n = din.readLong()
    require(n >= 0 && n < Int.MaxValue,
      s"bad deletion-vector count $n in $what")
    val out = new Array[Long](n.toInt)
    var i = 0
    while (i < out.length) { out(i) = din.readLong(); i += 1 }
    out
  }
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
  // STABLE text, not the default identity hash: [[DvRowDeleted]]'s
  // Expression.toString prints all constructor args (this object
  // included), and that text keys the lazy index's cross-plan
  // directory memo — an identity hash would make every fresh plan's
  // key unique and the memo dead. Sound: a lookup's content is fully
  // determined by the (version-scoped) plan that built it.
  override def toString: String = "DvLookup"
  @transient private var lastPath: UTF8String = _
  @transient private var lastArr: Array[Long] = _
  // file-NAME index over the suffix keys, built lazily once per task
  // (post-deserialization): resolution is O(1) instead of a linear key
  // walk — the walk is O(|dv'd files|) PER FILE, quadratic across a
  // heavily-vectored scan at 100 TB file counts. Names are unique
  // within one scan (write-job UUIDs), but a collision degrades to the
  // bucket's short list, never to a wrong match (endsWith verifies).
  @transient private var byName: java.util.HashMap[String, List[Int]] = _

  def hit(path: UTF8String, idx: Long): Boolean = {
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastArr = resolve(path.toString)
    }
    lastArr != null && java.util.Arrays.binarySearch(lastArr, idx) >= 0
  }

  private def resolve(p: String): Array[Long] = {
    if (byName == null) {
      byName = new java.util.HashMap[String, List[Int]]()
      var i = 0
      while (i < keys.length) {
        val n = keys(i).substring(keys(i).lastIndexOf('/') + 1)
        byName.merge(n, List(i), (a, b) => b ++ a)
        i += 1
      }
    }
    val name = p.substring(p.lastIndexOf('/') + 1)
    val bucket = byName.get(name)
    if (bucket == null) return null
    bucket.collectFirst {
      case i if p.endsWith(keys(i)) => arrs(i) }.orNull
  }
}

/** [[DvLookup]] for LAZY-planned scans, where the file list — and so
  * the set of deletion vectors the scan must apply — is unknown until
  * Spark's own `listFiles` callback has pruned the manifest. Starts
  * EMPTY at plan-build time; `LazyManifestFileIndex`'s prune feeds it
  * each surviving file's sidecar REF, driver-side, inside `listFiles`.
  * That ordering is what makes the empty start sound: task closures
  * (which embed this object via the codegen reference array) serialize
  * at STAGE SUBMISSION, strictly after the scan's RDD — and therefore
  * `listFiles` — was built on the driver. Feeds ACCUMULATE (putIfAbsent
  * on the immutable per-file ref), so a plan whose index serves two
  * filter shapes sees the union — each scan needs only its own
  * survivors' vectors, which its own `listFiles` fed.
  *
  * Holds REFS (absolute sidecar paths), not positions: the vector
  * bytes are read EXECUTOR-side on first touch of each file (one
  * sidecar read per task — the scan feeds rows file-by-file), so
  * planning performs ZERO sidecar I/O and the task binary carries
  * O(survivors) short strings rather than O(total vectored positions)
  * longs. A missing sidecar fails the touching task with the format
  * error — the same semantics as a missing data file failing its scan
  * task.
  */
final class GrowableDvLookup(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends DvResolver {
  // stable text for the same reason as [[DvLookup.toString]]; content
  // is version-determined (fed from each listFiles' survivors), and
  // the memo key it participates in is version-scoped
  override def toString: String = "GrowableDvLookup"
  private val refs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  @transient private var lastPath: UTF8String = _
  @transient private var lastArr: Array[Long] = _
  // file-NAME index, built from the map on first use — same O(1)
  // resolution (and the same collision degradation) as [[DvLookup]].
  // Tasks deserialize PRIVATE copies of this object (the task binary),
  // so concurrent tasks never share these memo fields; the grow-guard
  // (builtFor) is a cheap defense for the one sequential shared-access
  // shape: the DRIVER-side instance re-evaluated after a later
  // listFiles fed more survivors (plan re-execution in one JVM).
  @transient private var byName
      : java.util.HashMap[String, List[String]] = _
  @transient private var builtFor: Int = -1

  /** Driver-side feed (inside `listFiles`): `key` is the entry's
    * leading-slash rel suffix, `dvPath` its sidecar's absolute path. */
  def add(key: String, dvPath: String): Unit = {
    refs.putIfAbsent(key, dvPath); ()
  }
  def fedFiles: Int = refs.size()

  def hit(path: UTF8String, idx: Long): Boolean = {
    if (lastPath == null || !lastPath.equals(path)) {
      lastPath = path.clone()
      lastArr = resolve(path.toString)
    }
    lastArr != null && java.util.Arrays.binarySearch(lastArr, idx) >= 0
  }

  private def resolve(p: String): Array[Long] = {
    val n = refs.size()
    if (byName == null || builtFor != n) {
      val m = new java.util.HashMap[String, List[String]]()
      val it = refs.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        m.merge(k.substring(k.lastIndexOf('/') + 1), List(k),
          (a, b) => b ++ a)
      }
      byName = m
      builtFor = n
    }
    val bucket = byName.get(p.substring(p.lastIndexOf('/') + 1))
    if (bucket == null) return null
    bucket.collectFirst {
      case k if p.endsWith(k) => load(refs.get(k)) }.orNull
  }

  private def load(dvPath: String): Array[Long] = {
    val hp = new org.apache.hadoop.fs.Path(dvPath)
    val in = hp.getFileSystem(conf.value).open(hp)
    try DvFormat.read(in, dvPath) finally in.close()
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

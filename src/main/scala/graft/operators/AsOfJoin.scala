package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed backward-looking as-of join.
  *
  * For every left row, attaches the payload of the most recent right row
  * with `right(timeCol) <= left(timeCol)` in the same key group (or nulls
  * when no prior right row exists) — the classic "enrich events with the
  * latest state at event time" operator, which Spark has no built-in for.
  *
  * Spark-first implementation (no custom physical plan needed): tag and
  * union both inputs, sort within each key by (time, side) with right
  * rows winning ties (giving `<=`, not `<`), and carry the right payload
  * forward with `last(_, ignoreNulls = true)` over an unbounded-preceding
  * running window; finally keep only left rows.
  *
  * Scale notes: exactly ONE shuffle (hash partition by key + in-partition
  * sort) regardless of input sizes — no range-join row explosion and no
  * requirement that either side broadcasts. Running `last` windows are
  * evaluated streaming within each partition (no buffering of the whole
  * frame). Skewed keys degrade to single-task sorts; salt upstream if one
  * key dominates.
  */
object AsOfJoin {

  /** @param right      must contain `keys`, `timeCol`, and `payload` cols
    * @param payload    right columns to attach (emitted as `prefix+name`)
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideCol = "_graft_side"
    val timeTag = "_graft_t"

    def typedNull(df: DataFrame, name: String): Column =
      lit(null).cast(df.schema(name).dataType)

    // Right rows carry only key + time + payload; left columns nulled.
    // SQL join semantics: a null KEY matches nothing (equi-join) and a
    // null TIME can never satisfy `right.time <= left.time` — drop such
    // right rows here (they could match no left row), or the window's
    // nulls-first order would group/order them as matchable and leak
    // their payload into null-key/early left rows. Left rows with null
    // keys or times survive with a null payload, like a left join.
    val rightTagged = right
      .where(keys.map(col(_).isNotNull)
        .foldLeft(col(timeCol).isNotNull)(_ && _)) // fold: keys may be empty (global as-of)
      .select(
      keys.map(col) ++
        Seq(col(timeCol).as(timeTag), lit(0).as(sideCol)) ++
        leftCols.filterNot(keys.contains).map(c => typedNull(left, c).as(c)) ++
        payload.map(c => col(c).as(prefix + c)): _*)

    val leftTagged = left.select(
      keys.map(col) ++
        Seq(col(timeCol).as(timeTag), lit(1).as(sideCol)) ++
        leftCols.filterNot(keys.contains).map(col) ++
        payload.map(c => typedNull(right, c).as(prefix + c)): _*)

    // Pack the right payload into ONE struct so every output column comes
    // from the SAME matched right row — carrying columns independently
    // would mix rows whenever the newest right row has a null in one
    // payload column (that column would fall back to an older row).
    val packed = "_graft_payload"
    val unioned = leftTagged.unionByName(rightTagged)
      .withColumn(packed,
        when(col(sideCol) === 0,
          struct(payload.map(c => col(prefix + c).as(prefix + c)): _*)))

    // Ties among right rows with equal timestamps are broken by the packed
    // payload itself (struct ordering) — deterministic across runs and
    // partitionings, so oracle hash-compares can't flake. Non-orderable
    // payload types (maps) can't participate in a sort order, so they
    // fall back to (time, side) ordering — still correct, but which
    // right row wins an exact-timestamp tie is then partition-dependent.
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => orderable(f.dataType))
      case _ => true
    }
    val tieBreak =
      if (payload.forall(c => orderable(right.schema(c).dataType)))
        Seq(col(packed).asc)
      else Seq.empty
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(Seq(col(timeTag).asc, col(sideCol).asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(packed, last(col(packed), ignoreNulls = true).over(w))
      .where(col(sideCol) === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(packed).getField(prefix + c).as(prefix + c))): _*)
  }

  /** Skew-resistant [[asof]]: when one key dominates (one instrument is
    * half the ticks, one satellite is half the telemetry), the single
    * hash partition for that key pins the whole join to one task. This
    * variant spreads a hot key's LEFT rows across `salts` sub-tasks by
    * salting the key with a deterministic hash of the left row's time,
    * and REPLICATES the right side to every salt — each sub-task sees
    * the key's complete right timeline, so every left row still finds
    * its true as-of match and the result is row-identical to [[asof]]
    * (spec-asserted). Trade: right-side shuffle volume ×salts — the
    * right side of an as-of join (dim-like state snapshots) is
    * typically orders of magnitude smaller than the left (events), so
    * this buys task-level parallelism on the heavy side for a bounded
    * light-side cost. AQE's skew-join splitting cannot do this for the
    * window form (it is not a join node to AQE) — salting is the
    * portable answer.
    */
  /** The salt [[salted]] assigns a left row — exposed so tests pin the
    * spread property against the IMPLEMENTATION'S hash, not a copy.
    *
    * A hash of the WHOLE row, not just the time: hot keys routinely
    * carry coarse/batch-stamped timestamps (millions of rows at one
    * epoch), and a time-only salt would put them all in one bucket —
    * paying the right-side replication for zero spread. Only fully
    * identical rows still collide, and those are the same work anyway.
    * Deterministic per row content across runs/retries. (Map columns
    * are not hashable in Spark — skipped; every other type counts.)
    */
  def saltOf(left: DataFrame, salts: Int): Column = {
    val hashable = left.schema.fields.filter { f =>
      def ok(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case a: org.apache.spark.sql.types.ArrayType => ok(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(x => ok(x.dataType))
        case _ => true
      }
      ok(f.dataType)
    }.map(f => col(f.name)).toSeq
    require(hashable.nonEmpty, "salted as-of: no hashable left columns")
    pmod(xxhash64(hashable: _*), lit(salts.toLong)).cast("int")
  }

  /** @param useNative run the salted join through the native
    *   whole-operator exec ([[native]]) instead of the composed window
    *   form — same contract, the streaming-merge plan
    */
  def salted(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payload: Seq[String],
      prefix: String = "asof_",
      salts: Int = 8,
      useNative: Boolean = false): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val saltCol = "_graft_salt"
    val l = left.withColumn(saltCol, saltOf(left, salts))
    val r = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    val joined =
      if (useNative) native(l, r, keys :+ saltCol, timeCol, payload, prefix)
      else asof(l, r, keys :+ saltCol, timeCol, payload, prefix)
    joined.drop(saltCol)
  }

  /** Same contract as [[asof]], executed by the native whole-operator
    * plan ([[graft.plans.AsOfJoinExec]]): one hash shuffle + sort per
    * side and a streaming O(1)-state merge, instead of union + window +
    * filter over the combined stream. Requires the graft planner strategy
    * (any `GraftSession` session has it; otherwise
    * `GraftExtensions.register(spark)`).
    *
    * Tie-break parity with [[asof]]: among right rows tied on
    * `(key, time)`, the payload-max row wins (the exec sorts the right
    * side by the orderable payload columns and keeps the last consumed).
    */
  def native(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      payload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    import graft.plans.AsOfJoinNode

    // Right side carries only what the merge needs — explicit pruning,
    // since Catalyst's column pruning doesn't see through a foreign node.
    // Null-keyed / null-time right rows are dropped for SQL equi-join
    // semantics (they can match no left row; the merge would otherwise
    // pair them with null-keyed LEFT rows, since the sort orders and
    // RowOrdering treat null==null). Null-keyed left rows then stop the
    // right scan at the first non-null key (nulls sort first) and emit
    // the left-join null payload.
    val rightCols = ((keys :+ timeCol) ++ payload).distinct
    val rBase = GraftBridge.analyzed(right
      .where(keys.map(col(_).isNotNull)
        .foldLeft(col(timeCol).isNotNull)(_ && _)) // fold: keys may be empty
      .select(rightCols.map(col): _*))
    // Mint fresh right-side exprIds: a self-as-of (left and right carved
    // from the same scan) would otherwise hand the analyzer duplicate ids
    // across siblings, and DeduplicateRelations cannot disambiguate a
    // foreign node's positional left/right fields (it rewrites the right
    // SUBTREE but must leave the shared ids in this node alone — the
    // node would then reference only left attrs and the planner prunes
    // the right child to nothing). An Alias layer makes the node's
    // right-facing interface unconditionally unambiguous.
    val rAliases = rBase.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rBase)
    val rOut: Seq[Attribute] = rAliases.map(_.toAttribute)
    val lPlan = GraftBridge.analyzed(left)

    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        sys.error(s"as-of join: column '$name' not found in " +
          out.map(_.name).mkString("[", ", ", "]")))

    val payloadAttrs = payload.map(attr(rOut, _))
    val payloadOut = payloadAttrs.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true)())

    GraftBridge.ofRows(left.sparkSession, AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan.output, _)), keys.map(attr(rOut, _)),
      attr(lPlan.output, timeCol), attr(rOut, timeCol),
      payloadAttrs, payloadOut))
  }
}

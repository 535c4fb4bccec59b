package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental MATERIALIZED-AGGREGATE maintenance over the warehouse
  * change feed — the consumer-side contract [[Warehouse.readChangeFeed]]
  * promises: a (count, sum)-shaped aggregate is maintained EXACTLY by
  * folding feed rows weighted by `_change_delta` (+1 added / -1
  * removed), with no rescan of table history. DELETE retracts, UPDATE
  * retracts the pre-image and asserts the post-image, COMPACT's
  * re-emitted rows cancel pairwise — the fold is oblivious to WHICH
  * DML produced the feed.
  *
  * Count and sum are the self-maintainable aggregates (avg = sum/count
  * derives); min/max are NOT maintainable from a feed alone (a
  * retracted extremum needs the remaining rows) — that restriction is
  * fundamental to incremental view maintenance, not an implementation
  * limit here.
  *
  * Scale shape: the delta fold aggregates the FEED (bounded by the
  * touched partitions since the snapshot), shuffled once on the group
  * key; merging with prior state is a second group-key shuffle of
  * |groups| rows. The maintained state never rescans the table — at
  * 100 TB that is the difference between a view refresh costing
  * O(changed partitions) and O(table).
  *
  * Two layers live here:
  *   - [[initAgg]]/[[foldAgg]]: the RAW fold primitive over a caller-held
  *     state frame (q107's oracle-gated shape);
  *   - [[ViewDef]]/[[refresh]]/[[read]]: the PERSISTED VIEW lifecycle —
  *     the aggregate sibling of [[IndexStore]]. State lives as an
  *     ordinary warehouse table of mergeable partials (row count,
  *     per-agg sum + non-null count, min/max), inheriting manifests,
  *     atomic commits, time travel and the change feed; each view commit
  *     records `txn_graft_mv_<src> = <source version>` on the
  *     txn-watermark ledger atomically with the rows, so refresh is
  *     crash-safe and re-runs are watermark no-ops. A refresh costs one
  *     partial-aggregate over the manifest diff plus a keyed merge into
  *     the (groups-sized, not corpus-sized) state table; the full
  *     `GROUP BY` scan happens once at build time. Min/max are
  *     maintained under insert-safe histories and trigger an automatic
  *     FULL REBUILD when a retracting commit could have evicted an
  *     extremum — the honest fallback for non-invertible aggregates.
  *
  * Contracts for the persisted layer: group columns must be NON-NULL
  * ([[Warehouse!.merge]]'s anti-join is null-hostile — coalesce
  * upstream, the standard MV restriction); a group whose row count
  * folds to zero stays as a tombstone row (filtered by [[read]]) until
  * [[compactView]] reclaims it. The state table is hash-partitioned on
  * the group key (a pure function of the merge key, as merge requires),
  * so a refresh rewrites only the partitions its changed groups live in.
  *
  * Reference scope: the reference recomputes its summary frames per run
  * (`/root/reference/script.py` derives everything from full re-reads);
  * this is the warehouse-side generalization.
  */
object MaterializedView {

  /** Materialize the aggregate state (one row per group:
    * `n_rows`, `total`) from a table snapshot — the view's initial
    * refresh, and the re-derivation [[foldAgg]] must always match.
    */
  def initAgg(snapshot: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame =
    snapshot.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        sum(col(valueCol)).as("total"))

  /** Advance materialized `state` by a delta-weighted change feed
    * (the [[Warehouse.readChangeFeed]] shape: table columns plus
    * `_change_delta` ∈ {+1, -1}). Groups whose maintained count
    * reaches zero leave the state — matching what a recompute over the
    * post-change snapshot would produce.
    */
  def foldAgg(state: DataFrame, feed: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val delta = feed.groupBy(groupCols.map(col): _*)
      .agg(sum(col("_change_delta")).cast("long").as("n_rows"),
        sum(col(valueCol) * col("_change_delta")).as("total"))
    state.unionByName(delta)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n_rows")).cast("long").as("n_rows"),
        sum(col("total")).as("total"))
      .where(col("n_rows") > 0)
  }


  // ------------------------------------------------------------------
  // PERSISTED, INCREMENTALLY-REFRESHED VIEWS (warehouse-table state)
  // ------------------------------------------------------------------

  /** Aggregate algebra. `out` is the view's output column name. */
  sealed trait Agg { def out: String }
  /** `count(*) AS out`. */
  final case class Count(out: String) extends Agg
  /** `sum(in) AS out` — null when the group has no non-null `in`. */
  final case class Sum(in: String, out: String) extends Agg
  /** `avg(in) AS out` (double) — null when no non-null `in`. */
  final case class Avg(in: String, out: String) extends Agg
  /** `min(in) AS out` — forces rebuild on retracting commits. */
  final case class Min(in: String, out: String) extends Agg
  /** `max(in) AS out` — forces rebuild on retracting commits. */
  final case class Max(in: String, out: String) extends Agg

  /** A view definition: `view` materializes
    * `src GROUP BY groupBy` with `aggs`, state hash-spread over
    * `nParts` partitions.
    */
  final case class ViewDef(src: String, view: String,
      groupBy: Seq[String], aggs: Seq[Agg], nParts: Int = 16) {
    require(groupBy.nonEmpty, "MatView: groupBy must be non-empty")
    require(aggs.nonEmpty, "MatView: aggs must be non-empty")
    require(aggs.map(_.out).distinct.size == aggs.size,
      "MatView: duplicate output column names")
    private[MaterializedView] def hasOrderAggs: Boolean = aggs.exists {
      case _: Min | _: Max => true
      case _ => false
    }
  }

  private def txnId(src: String) = s"graft_mv_$src"

  /** Commit-metadata key carrying the encoded [[ViewDef]] on the state
    * table's bootstrap commit — how `REFRESH MATERIALIZED VIEW` in a
    * LATER session recovers the definition from the table alone.
    */
  private val defKey = "mvdef"

  /** Encode a [[ViewDef]] for commit metadata. All names are SQL
    * identifiers (`\w+`), so the fixed delimiters are unambiguous.
    */
  private[graft] def encodeDef(vd: ViewDef): String = {
    val aggs = vd.aggs.map {
      case Count(out) => s"count:*:$out"
      case Sum(in, out) => s"sum:$in:$out"
      case Avg(in, out) => s"avg:$in:$out"
      case Min(in, out) => s"min:$in:$out"
      case Max(in, out) => s"max:$in:$out"
    }.mkString(";")
    s"${vd.src}|${vd.view}|${vd.groupBy.mkString(",")}|$aggs|${vd.nParts}"
  }

  private[graft] def decodeDef(s: String): ViewDef = {
    val Array(src, view, groups, aggs, nParts) = s.split("\\|", -1)
    ViewDef(src, view, groups.split(",").toSeq,
      aggs.split(";").toSeq.map(_.split(":") match {
        case Array("count", "*", out) => Count(out)
        case Array("sum", in, out) => Sum(in, out)
        case Array("avg", in, out) => Avg(in, out)
        case Array("min", in, out) => Min(in, out)
        case Array("max", in, out) => Max(in, out)
        case other => throw new IllegalArgumentException(
          s"mvdef: bad agg '${other.mkString(":")}'")
      }), nParts.toInt)
  }

  /** Declare the view: create its state table with the encoded
    * definition stamped on the bootstrap commit. Idempotent (IF NOT
    * EXISTS semantics); [[refresh]] alone also works for a pure-Scala
    * caller, but only a defined view is refreshable by name from a
    * fresh session ([[loadDef]]).
    *
    * @return true if this call created the table
    */
  def define(wh: Warehouse, vd: ViewDef): Boolean =
    wh.createTable(vd.view, stateSpec(wh, vd), ifNotExists = true,
      extraMeta = Map(defKey -> encodeDef(vd)))

  /** Recover a view's definition from its own history (None: table
    * absent, or never [[define]]d — a plain table).
    */
  def loadDef(wh: Warehouse, view: String): Option[ViewDef] =
    if (!wh.tables.contains(view)) None
    else wh.history(view).reverse.collectFirst {
      case (_, m) if m.contains(defKey) => decodeDef(m(defKey))
    }

  /** The source version `view` currently reflects (None = never built). */
  def viewedVersion(wh: Warehouse, vd: ViewDef): Option[Long] =
    wh.history(vd.view).lastOption
      .flatMap(_._2.get(s"txn_${txnId(vd.src)}")).map(_.toLong)

  /** Row-count state column — always maintained (tombstone filter +
    * `Count` share it).
    */
  private val nRows = "s_rows"

  private def sumIsLong(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** (state column name, type) pairs an agg needs, beyond [[nRows]]. */
  private def stateCols(vd: ViewDef, srcSchema: StructType): Seq[StructField] =
    vd.aggs.flatMap {
      case Count(_) => Nil
      case Sum(in, out) =>
        val lt = if (sumIsLong(srcSchema(in).dataType)) LongType
                 else DoubleType
        Seq(StructField(s"s_sum_$out", lt), StructField(s"s_n_$out", LongType))
      case Avg(in, out) =>
        Seq(StructField(s"s_sum_$out", DoubleType),
          StructField(s"s_n_$out", LongType))
      case Min(in, out) => Seq(StructField(s"s_min_$out", srcSchema(in).dataType))
      case Max(in, out) => Seq(StructField(s"s_max_$out", srcSchema(in).dataType))
    }

  /** Partial-aggregate a (possibly δ-weighted) batch into state-shaped
    * rows. `delta` is the ±1 weight column (literal 1 for inserts).
    * Min/max partials fold ASSERTED rows only (`delta > 0`) — identical
    * for pure inserts, and under compaction feeds every −1 value
    * reappears as +1 so the fold is unchanged; for retracting feeds it
    * is the only correct reading (a deleted value must not assert into
    * an extremum). `withRetracted` additionally emits per-group
    * `r_min_*`/`r_max_*` — the extrema of the RETRACTED values — which
    * the repair path compares against stored state to decide which
    * groups actually need a rescan.
    */
  private def partialState(vd: ViewDef, srcSchema: StructType,
      batch: DataFrame, delta: Column,
      withRetracted: Boolean = false): DataFrame = {
    val d = delta.cast("long")
    val aggExprs: Seq[Column] =
      sum(d).as(nRows) +: vd.aggs.flatMap {
        case Count(_) => Nil
        case Sum(in, out) =>
          val x = col(in)
          val lt = if (sumIsLong(srcSchema(in).dataType)) LongType
                   else DoubleType
          Seq(
            sum(when(x.isNotNull, x.cast(lt) * d.cast(lt)).otherwise(lit(0).cast(lt)))
              .cast(lt).as(s"s_sum_$out"),
            sum(when(x.isNotNull, d).otherwise(lit(0L))).as(s"s_n_$out"))
        case Avg(in, out) =>
          val x = col(in).cast("double")
          Seq(
            sum(when(x.isNotNull, x * d.cast("double")).otherwise(lit(0.0)))
              .as(s"s_sum_$out"),
            sum(when(x.isNotNull, d).otherwise(lit(0L))).as(s"s_n_$out"))
        case Min(in, out) =>
          min(when(d > 0, col(in))).as(s"s_min_$out") +:
            (if (withRetracted)
              Seq(min(when(d < 0, col(in))).as(s"r_min_$out")) else Nil)
        case Max(in, out) =>
          max(when(d > 0, col(in))).as(s"s_max_$out") +:
            (if (withRetracted)
              Seq(max(when(d < 0, col(in))).as(s"r_max_$out")) else Nil)
      }
    batch.groupBy(vd.groupBy.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*)
  }

  private def partExpr(vd: ViewDef): Column =
    pmod(xxhash64(vd.groupBy.map(col): _*), lit(vd.nParts)).cast("int")

  /** Pure-insert commits: the cheap [[Warehouse!.readChanges]] path is
    * exact (added files hold only NEW rows).
    */
  private val pureInsertOps = Set("append", "bootstrap", "ctas")

  /** Net-zero row churn on top of pure inserts: a compaction's added
    * files re-emit existing rows, so added-only reads double-count
    * (feed required), but no VALUE ever leaves the table — min/max
    * state stays valid (a re-added value cannot move an extremum).
    */
  private val minMaxSafeOps = pureInsertOps ++ Set("compact", "optimize")

  private def opsSince(wh: Warehouse, src: String, since: Long): Seq[String] =
    wh.history(src).filter(_._1 > since)
      .map { case (_, m) => m.getOrElse("op", "") }

  /** Bring `view` up to date with `src`: full aggregate on first call,
    * manifest-diff increment afterwards — δ-weighted change-feed fold
    * for count/sum/avg under any DML, insert fold when the diff range
    * is insert-safe, full rebuild when a retracting commit invalidates
    * min/max state. Crash-safe and re-runnable (txn watermark).
    *
    * @return the source version the view now reflects
    */
  private def stateSpec(wh: Warehouse, vd: ViewDef): Warehouse.TableSpec = {
    val srcSchema = wh.tables(vd.src)
    Warehouse.TableSpec(StructType(
      vd.groupBy.map(g => StructField(g, srcSchema(g).dataType)) ++
        (StructField("part", IntegerType) +:
          StructField(nRows, LongType) +: stateCols(vd, srcSchema))),
      partitionBy = Seq("part"))
  }

  def refresh(wh: Warehouse, vd: ViewDef): Long = {
    val srcSchema = wh.tables(vd.src)
    val viewSchema = stateSpec(wh, vd).schema
    wh.createTable(vd.view, stateSpec(wh, vd), ifNotExists = true)
    val head = wh.versions(vd.src).max
    val since = viewedVersion(wh, vd)
      // a vacuumed-away diff base forces a rebuild (same as IndexStore)
      .filter(v => wh.versions(vd.src).contains(v))
    if (since.contains(head)) return head
    val stateShape = viewSchema.fieldNames.toSeq

    def fullBuild(): Unit = {
      val full = partialState(vd, srcSchema, wh.read(vd.src), lit(1))
        .withColumn("part", partExpr(vd))
        .select(stateShape.map(col): _*)
      // one atomic replace: no stale groups can linger, and the
      // watermark overrides the carried-forward ledger entry
      wh.overwrite(vd.view, full,
        meta = Map(s"txn_${txnId(vd.src)}" -> head.toString))
    }

    since match {
      case None => fullBuild()
      case Some(v) =>
        val ops = opsSince(wh, vd.src, v)
        val pureInsert = ops.forall(pureInsertOps)
        // a retracting commit can evict a min/max extremum — but only
        // for groups where a RETRACTED value ties the stored extremum
        // and no asserted value re-covers it. Those groups (usually
        // none or few) get a targeted rescan below; everything else
        // folds δ-exactly. Pre-r9 behavior was a full source rebuild.
        val retracting = vd.hasOrderAggs && !ops.forall(minMaxSafeOps)
        // every non-pure-insert path folds the change feed, which needs
        // the since-removed files still on disk — vacuumed/GC'd history
        // (retainReplaced=false) makes a rebuild the only exact answer
        if (!pureInsert && !wh.changeFeedReadable(vd.src, v)) fullBuild()
        else locally {
          val delta =
            if (pureInsert)
              partialState(vd, srcSchema, wh.readChanges(vd.src, v), lit(1))
            else
              partialState(vd, srcSchema,
                wh.readChangeFeed(vd.src, v), col("_change_delta"),
                withRetracted = retracting)
          // combine with current state for the touched groups only:
          // left join keeps the delta bounded by the batch, and merge
          // rewrites only the state partitions those groups hash to
          val stCols = stateCols(vd, srcSchema).map(_.name)
          val st = wh.read(vd.view).select(
            vd.groupBy.map(col) ++
              (nRows +: stCols).map(c => col(c).as(s"o_$c")): _*)
          val joined = delta.join(st, vd.groupBy, "left")
          val combined: Seq[Column] =
            (coalesce(col(s"o_$nRows"), lit(0L)) + col(nRows)).as(nRows) +:
              vd.aggs.flatMap {
                case Count(_) => Nil
                case Sum(in, out) =>
                  val lt = if (sumIsLong(srcSchema(in).dataType)) LongType
                           else DoubleType
                  Seq(
                    (coalesce(col(s"o_s_sum_$out"), lit(0).cast(lt)) +
                      col(s"s_sum_$out")).cast(lt).as(s"s_sum_$out"),
                    (coalesce(col(s"o_s_n_$out"), lit(0L)) +
                      col(s"s_n_$out")).as(s"s_n_$out"))
                case Avg(in, out) =>
                  Seq(
                    (coalesce(col(s"o_s_sum_$out"), lit(0.0)) +
                      col(s"s_sum_$out")).as(s"s_sum_$out"),
                    (coalesce(col(s"o_s_n_$out"), lit(0L)) +
                      col(s"s_n_$out")).as(s"s_n_$out"))
                // least/greatest skip nulls: first batch for a group has
                // no stored value, late batch may have no non-null input
                case Min(in, out) =>
                  Seq(least(col(s"o_s_min_$out"), col(s"s_min_$out"))
                    .as(s"s_min_$out"))
                case Max(in, out) =>
                  Seq(greatest(col(s"o_s_max_$out"), col(s"s_max_$out"))
                    .as(s"s_max_$out"))
              }
          if (!retracting) {
            val updates = joined
              .select((vd.groupBy.map(col) ++ combined): _*)
              .withColumn("part", partExpr(vd))
              .select(stateShape.map(col): _*)
            wh.merge(vd.view, updates, vd.groupBy,
              txn = Some((txnId(vd.src), head)))
          } else {
            // RETRACTION REPAIR. Dirty iff some retracted value ties
            // the stored extremum (r ≤ o for min — eviction possible;
            // `<` would mean the state was already wrong, recompute
            // too) AND no asserted value covers it (a ≤ o makes the
            // new min a regardless of what left). o null with a
            // retraction present is an inconsistent state → recompute.
            val dirty: Column = vd.aggs.collect {
              case Min(_, out) =>
                val r = col(s"r_min_$out"); val o = col(s"o_s_min_$out")
                val a = col(s"s_min_$out")
                r.isNotNull && (o.isNull ||
                  (r <= o && (a.isNull || a > o)))
              case Max(_, out) =>
                val r = col(s"r_max_$out"); val o = col(s"o_s_max_$out")
                val a = col(s"s_max_$out")
                r.isNotNull && (o.isNull ||
                  (r >= o && (a.isNull || a < o)))
            }.reduce(_ || _)
            // groups-sized (bounded by the feed's touched groups), and
            // probed several times below — materialize once
            val base = joined
              .select((vd.groupBy.map(col) ++ combined
                :+ dirty.as("__dirty")): _*)
              .localCheckpoint()
            try {
              val dirtyKeys = base.where(col("__dirty"))
                .select(vd.groupBy.map(col): _*)
              val nDirty = dirtyKeys.count()
              val updates =
                if (nDirty == 0L) base.drop("__dirty")
                else {
                  // rescan ONLY the dirty groups: a literal IN when the
                  // key list is driver-bounded (manifest stat + bloom
                  // file skipping applies — the scan opens only files
                  // whose range covers a dirty key), a semi-join
                  // otherwise (no IN-list plan at any |dirty|)
                  val srcDf = wh.read(vd.src)
                  val restricted =
                    if (vd.groupBy.size == 1 && nDirty <= 1000L) {
                      val vals = dirtyKeys.collect().map(_.get(0)).toSeq
                      srcDf.where(col(vd.groupBy.head).isInCollection(vals))
                    } else srcDf.join(dirtyKeys, vd.groupBy, "left_semi")
                  val recAggs = vd.aggs.collect {
                    case Min(in, out) => min(col(in)).as(s"rec_s_min_$out")
                    case Max(in, out) => max(col(in)).as(s"rec_s_max_$out")
                  }
                  val rec = restricted.groupBy(vd.groupBy.map(col): _*)
                    .agg(recAggs.head, recAggs.tail: _*)
                  val repaired: Seq[Column] =
                    (nRows +: stateCols(vd, srcSchema).map(_.name)).map {
                      case c if c.startsWith("s_min_") ||
                          c.startsWith("s_max_") =>
                        // dirty → the rescan's answer (null when the
                        // group lost all rows — tombstone territory);
                        // clean → the δ-fold
                        when(col("__dirty"), col(s"rec_$c"))
                          .otherwise(col(c)).as(c)
                      case c => col(c)
                    }
                  base.join(rec, vd.groupBy, "left")
                    .select((vd.groupBy.map(col) ++ repaired): _*)
                }
              wh.merge(vd.view,
                updates.withColumn("part", partExpr(vd))
                  .select(stateShape.map(col): _*),
                vd.groupBy, txn = Some((txnId(vd.src), head)))
            } finally base.unpersist()
          }
        }
    }
    head
  }

  /** The view's CONTENTS — group columns + final aggregate values,
    * tombstones filtered, partial state folded (`avg = sum/n`,
    * empty-group sum/avg → null). This is the frame the equivalent
    * `GROUP BY` over the live source would produce.
    */
  def read(wh: Warehouse, vd: ViewDef): DataFrame = {
    val finals: Seq[Column] = vd.aggs.map {
      case Count(out) => col(nRows).as(out)
      case Sum(_, out) =>
        when(col(s"s_n_$out") > 0, col(s"s_sum_$out")).as(out)
      case Avg(_, out) =>
        when(col(s"s_n_$out") > 0,
          col(s"s_sum_$out") / col(s"s_n_$out").cast("double")).as(out)
      case Min(_, out) => col(s"s_min_$out").as(out)
      case Max(_, out) => col(s"s_max_$out").as(out)
    }
    wh.read(vd.view).where(col(nRows) > 0)
      .select((vd.groupBy.map(col) ++ finals): _*)
  }

  /** Reclaim zero-count tombstone groups (space only — [[read]] never
    * shows them). One file-targeted delete.
    */
  def compactView(wh: Warehouse, vd: ViewDef): Long =
    wh.delete(vd.view, col(nRows) <= 0)
}

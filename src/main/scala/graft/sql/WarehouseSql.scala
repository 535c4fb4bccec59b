package graft.sql

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, EqualTo, Expression, Literal, NamedExpression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._

import graft.pipeline.Warehouse

/** SQL STATEMENT surface for the warehouse — the parser-extension route
  * (the Delta shape: `SparkSessionExtensions.injectParser`) that lets a
  * SQL-first user drive the full DML/time-travel feature set with
  * statements instead of the Scala API. The reference's entire DML is
  * SQL strings against Postgres (`/root/reference/script.py:77-83,159`);
  * parity in spirit needs the statement form:
  *
  *   - `INSERT INTO wh_t SELECT ...`            → [[Warehouse!.append]]
  *   - `INSERT OVERWRITE wh_t SELECT ...`       → [[Warehouse!.overwrite]]
  *   - `TRUNCATE TABLE wh_t`                    → [[Warehouse!.truncate]]
  *   - `DELETE FROM wh_t WHERE ...`             → [[Warehouse!.delete]]
  *   - `UPDATE wh_t SET c = e [WHERE ...]`      → [[Warehouse!.update]]
  *   - `MERGE INTO wh_t USING src ON ... WHEN`  → [[Warehouse!.mergeInto]]
  *   - `SELECT ... FROM wh_t`                   → [[Warehouse!.read]]
  *     (always the LATEST committed snapshot, unlike the frozen
  *     registration-time views of [[Warehouse!.registerViews]])
  *   - `... FROM wh_t VERSION AS OF n`          → [[Warehouse!.readVersion]]
  *     (or `VERSION AS OF '<tag>'`              → [[Warehouse!.readTag]])
  *   - `... FROM wh_t TIMESTAMP AS OF ts`       → [[Warehouse!.readTimestamp]]
  *     (newest version committed at or before ts, by manifest modtime)
  *   - `ALTER TABLE wh_t CREATE TAG v1 [AS OF VERSION n]` / `DROP TAG
  *     v1` / `SHOW TAGS wh_t` → [[Warehouse!.createTag]] (immutable
  *     named versions, vacuum-pinned) / dropTag / tags
  *   - `SHOW FILES wh_t` → the head manifest's file inventory (bytes,
  *     row counts, DV rows, footer stats) — driver metadata only
  *   - `SHOW STATS wh_t` → the column statistics CBO sees for a head
  *     read (NDV, min/max, nulls, histogram bins), extracted from the
  *     read path's own published stats
  *   - `PUBLISH TABLE wh_stage TO wh_t [WITH REBASE]` →
  *     [[Warehouse!.publish]] (write-audit-publish fast-forward of an
  *     audited staging clone; WITH REBASE merges over interim blind
  *     appends, constraint-probed)
  *   - `REFRESH FINGERPRINT wh_t [COLUMNS (a, b)]` →
  *     [[graft.ext.FingerprintStore]].refresh (incrementally
  *     maintained order-invariant content hash)
  *   - `DESCRIBE HISTORY wh_t`                  → [[Warehouse!.history]]
  *   - `DESCRIBE DETAIL wh_t`                   → manifest-backed metadata
  *   - `RESTORE [TABLE] wh_t [TO] VERSION AS OF n` → [[Warehouse!.restore]]
  *   - `RESTORE [TABLE] wh_t [TO] TIMESTAMP AS OF '<ts>'` → restore of
  *     [[Warehouse!.versionAt]]
  *   - `VACUUM wh_t [RETAIN n VERSIONS] [DRY RUN]` → [[Warehouse!.vacuum]]
  *   - `FSCK TABLE wh_t` → [[Warehouse!.fsck]] (read-only consistency audit)
  *   - `OPTIMIZE wh_t [ZORDER BY (c, ...)]`     → [[Warehouse!.optimize]]
  *   - `COPY INTO wh_t FROM '<dir>' [FILEFORMAT = X] [PATTERN = '<glob>']
  *     [FORCE]` → [[Warehouse!.copyInto]] (idempotent bulk file ingest)
  *   - `CREATE TABLE [IF NOT EXISTS] wh_t (...)` → [[Warehouse!.createTable]]
  *     (routed by registered PREFIX — see [[parseCreateTable]])
  *   - `CREATE TABLE [IF NOT EXISTS] wh_t AS SELECT ...` → createTable
  *     with the query's schema, then the first append (CTAS)
  *   - `ALTER TABLE wh_t ADD CONSTRAINT n CHECK (e)` / `DROP CONSTRAINT n`
  *     → [[Warehouse!.addCheck]] / [[Warehouse!.dropCheck]]
  *   - `ALTER TABLE wh_t DROP UNIQUE (cols)` / `DROP FOREIGN KEY (cols)`
  *     / `DROP PRIMARY KEY` → [[Warehouse!.dropUnique]] /
  *     [[Warehouse!.dropForeignKey]] / [[Warehouse!.dropPrimaryKey]]
  *     (the metadata-only undo for the ADD side; PK drop refuses while
  *     referenced)
  *   - `ALTER TABLE wh_t ADD COLUMN c type`     → [[Warehouse!.addColumn]]
  *   - `SHOW WAREHOUSE TABLES`                  → this session's routed
  *     names with manifest-backed version/files/bytes
  *   - `CREATE TABLE wh_d SHALLOW CLONE wh_s [VERSION AS OF n]`
  *     → [[Warehouse!.shallowClone]] (zero-copy fork by reference)
  *   - `DROP TABLE [IF EXISTS] wh_t` (registered names only)
  *     → [[Warehouse!.dropTable]] + route removal
  *   - `SHOW CREATE TABLE wh_t` → round-trippable DDL from the live
  *     `_meta/` spec (CREATE + PARTITIONED/STATS/BLOOM BY clauses,
  *     plus one ALTER ... ADD CONSTRAINT per CHECK)
  *   - `CREATE MATERIALIZED VIEW wh_v AS SELECT g, agg(c) AS n, ...
  *     FROM wh_s GROUP BY g` → [[graft.pipeline.MaterializedView]]
  *     define + first refresh (restricted algebra:
  *     count(*)/sum/avg/min/max — incrementally maintainable by
  *     construction); SELECT on the view name reads its CONTENTS
  *   - `REFRESH MATERIALIZED VIEW wh_v` → incremental refresh from the
  *     source's manifest diff (definition recovered from the view's
  *     own history in a fresh session)
  *   - `DROP MATERIALIZED VIEW [IF EXISTS] wh_v` → dropTable, guarded
  *     to names that ARE views
  *   - `SHOW MATERIALIZED VIEWS` → the session's views with definition
  *     and freshness (the auto-rewrite eligibility bit)
  *
  * Spark's own parser already produces `MergeIntoTable` /
  * `DeleteFromTable` / `UpdateTable` / `InsertIntoStatement` /
  * `RelationTimeTravel` nodes for the first six, so the wrapper parses
  * with the DELEGATE and re-routes at PARSE time any node whose target
  * is a registered warehouse name — parse-time (not analyzer-rule)
  * routing means registered names shadow temp views and no analyzer
  * ordering can resolve the target out from under the rewrite. The last
  * three are Delta-style maintenance syntax Spark's grammar lacks;
  * they're matched as whole statements before delegation (unregistered
  * names fall through to the delegate's normal parse error).
  *
  * Mutations become [[graft.sql.GraftSqlCommands RunnableCommands]]: the
  * rewrite itself has no side effects (a parse is still just a plan);
  * the warehouse mutation runs when the command executes, exactly like
  * Delta's command plans.
  *
  * Activation: sessions built through [[graft.GraftSession]] carry the
  * parser automatically; the statement routes appear once a warehouse
  * calls [[Warehouse!.registerSql]]. A session NOT built with the
  * extensions (a foreign cached session) has no parser hook — there the
  * Scala API and `registerViews` remain the surface.
  */
object WarehouseSql {

  /** (sessionUUID, lowercase SQL name) → (warehouse, table). Session-
    * scoped so two sessions (or two tests) can route the same name to
    * different warehouse instances without interference.
    */
  private val registry =
    new ConcurrentHashMap[(String, String), (Warehouse, String)]()

  /** (sessionUUID, prefix) → warehouse: which warehouse OWNS a name
    * family — the route `CREATE TABLE <prefix><t>` needs, since its
    * target name doesn't exist yet. An empty prefix (registerSql(""))
    * claims every CREATE TABLE of the session — the mode that runs the
    * reference's verbatim DDL.
    */
  private val prefixRegistry = new ConcurrentHashMap[(String, String), Warehouse]()

  /** Eviction: the registries are process-global and their Warehouse
    * values pin SparkSession references, so without eviction every
    * registerSql would leak its session for the JVM's lifetime (test
    * suites, notebook servers spawning many sessions). Weak values are
    * NOT an option — a route silently vanishing at GC time would turn
    * registered statements into delegate parse errors nondeterministi-
    * cally — so eviction is deterministic instead: [[unregister]] for a
    * session a caller knows is done, plus a context-stop listener
    * (installed once per active context) that clears everything when
    * the application ends — the backstop that unpins all sessions of a
    * stopped context.
    */
  private val listenerInstalled =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  private def ensureEviction(spark: SparkSession): Unit =
    if (listenerInstalled.compareAndSet(false, true))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            registry.clear()
            prefixRegistry.clear()
            sessions.clear()
            listenerInstalled.set(false) // a future context re-installs
          }
        })

  /** Route `<prefix><table>` for every table of `wh` in `spark`'s
    * registry. Re-registration overwrites (latest warehouse wins) —
    * the registry holds the INSTANCE, so reads always resolve the
    * latest committed manifest at statement time, never a frozen
    * snapshot.
    */
  def register(spark: SparkSession, wh: Warehouse, prefix: String = "wh_"): Unit = {
    ensureEviction(spark)
    sessions.put(GraftBridge.sessionUUID(spark),
      new java.lang.ref.WeakReference(spark))
    prefixRegistry.put((GraftBridge.sessionUUID(spark), prefix.toLowerCase), wh)
    wh.tables.keys.foreach { t =>
      registry.put((GraftBridge.sessionUUID(spark), (prefix + t).toLowerCase), (wh, t))
      ()
    }
  }

  /** uuid → session, WEAKLY held (routes must not pin sessions — see
    * [[ensureEviction]]'s eviction story): lets table-level DDL
    * executed in ONE session fix up the routes and temp views of every
    * OTHER session registered on the same warehouse, instead of
    * leaving them pointing at a dropped table or missing a new clone.
    * A GC'd session has no views left to fix — skipping it is correct,
    * not lossy.
    */
  private val sessions =
    new ConcurrentHashMap[String, java.lang.ref.WeakReference[SparkSession]]()

  private def liveSession(uuid: String): Option[SparkSession] =
    Option(sessions.get(uuid)).flatMap(r => Option(r.get()))
      .filterNot(s => s.sparkContext.isStopped)

  /** DROP TABLE's cross-session half: remove EVERY session's route to
    * (`wh`, `table`) — identity on the warehouse instance, so an
    * unrelated warehouse's same-named table keeps its routes — and
    * drop each live session's same-named temp view. Without this,
    * other sessions registered on the same warehouse keep stale routes
    * whose reads fail at scan time (ADVICE r7).
    */
  private[sql] def unrouteTable(wh: Warehouse, table: String): Unit = {
    import scala.jdk.CollectionConverters._
    purgeMvDef(wh, table) // a recreated same-name table must re-probe
    registry.entrySet().asScala.toSeq
      .filter(e => (e.getValue._1 eq wh) && e.getValue._2 == table)
      .foreach { e =>
        registry.remove(e.getKey)
        liveSession(e.getKey._1).foreach(_.catalog.dropTempView(e.getKey._2))
      }
  }

  /** CREATE/CTAS/CLONE's cross-session half: re-register every session
    * whose prefix routes to `wh`, so a table created in one session is
    * immediately addressable from every other session registered on
    * the same warehouse.
    */
  private[sql] def rerouteAll(wh: Warehouse): Unit = {
    import scala.jdk.CollectionConverters._
    prefixRegistry.entrySet().asScala.toSeq
      .filter(_.getValue eq wh)
      .foreach { e =>
        liveSession(e.getKey._1).foreach(register(_, wh, e.getKey._2))
      }
  }

  /** Drop every route of `spark`'s session — a test suite's afterAll,
    * a notebook kernel shutdown. Idempotent; other sessions' routes
    * are untouched.
    */
  def unregister(spark: SparkSession): Unit = {
    val uuid = GraftBridge.sessionUUID(spark)
    // Drop the temp views registerSql created alongside the routes —
    // a half-unregistered surface (route gone, view alive) would keep
    // resolving reads against a possibly-stale snapshot view.
    registry.keySet.forEach { case (u, name) =>
      if (u == uuid) spark.catalog.dropTempView(name)
    }
    registry.keySet.removeIf(_._1 == uuid)
    prefixRegistry.keySet.removeIf(_._1 == uuid)
    ()
  }

  private[sql] def lookup(spark: SparkSession,
      ident: Seq[String]): Option[(Warehouse, String)] =
    if (ident.size != 1) None
    else Option(registry.get(
      (GraftBridge.sessionUUID(spark), ident.head.toLowerCase)))

  /** Remove ONE route (and its temp view) from `spark`'s session —
    * the DROP TABLE counterpart of [[register]].
    */
  private[sql] def unroute(spark: SparkSession, name: String): Unit = {
    registry.remove((GraftBridge.sessionUUID(spark), name.toLowerCase))
    spark.catalog.dropTempView(name)
    ()
  }

  /** This session's routes, (sql name, warehouse, table), name-sorted —
    * the SHOW WAREHOUSE TABLES surface.
    */
  private[sql] def routes(spark: SparkSession): Seq[(String, Warehouse, String)] = {
    val uuid = GraftBridge.sessionUUID(spark)
    import scala.jdk.CollectionConverters._
    registry.entrySet().asScala.toSeq
      .filter(_.getKey._1 == uuid)
      .map(e => (e.getKey._2, e.getValue._1, e.getValue._2))
      .sortBy(_._1)
  }

  // ------------------------------------------------------------------
  // extended statements (syntax Spark's grammar lacks)
  // ------------------------------------------------------------------

  private val DescribeHistoryStmt =
    """(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+([\w.]+)\s*;?\s*""".r
  private val RestoreStmt = // version number or tag name
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.]+)\s+(?:TO\s+)?VERSION\s+AS\s+OF\s+'?([\w.-]+)'?\s*;?\s*""".r
  private val CreateTagStmt = // Iceberg's ALTER TABLE t CREATE TAG
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+TAG\s+([\w.-]+)(?:\s+AS\s+OF\s+VERSION\s+(\d+))?\s*;?\s*""".r
  private val DropTagStmt =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+TAG\s+([\w.-]+)\s*;?\s*""".r
  private val ShowTagsStmt =
    """(?is)\s*SHOW\s+TAGS\s+([\w.]+)\s*;?\s*""".r
  private val ShowFilesStmt = // manifest-backed file inventory
    """(?is)\s*SHOW\s+FILES\s+([\w.]+)\s*;?\s*""".r
  private val ShowStatsStmt = // the column stats CBO actually sees
    """(?is)\s*SHOW\s+STATS\s+([\w.]+)\s*;?\s*""".r
  private val PublishStmt = // write-audit-publish fast-forward
    ("""(?is)\s*PUBLISH\s+TABLE\s+([\w.]+)\s+TO\s+([\w.]+)""" +
      """(\s+WITH\s+REBASE)?\s*;?\s*""").r
  private val RefreshFingerprintStmt = // incremental content fingerprint
    """(?is)\s*REFRESH\s+FINGERPRINT\s+([\w.]+)(?:\s+COLUMNS\s*\(([^)]*)\))?\s*;?\s*""".r
  private val VacuumStmt =
    """(?is)\s*VACUUM\s+([\w.]+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?(?:\s+(DRY\s+RUN))?\s*;?\s*""".r
  private val RestoreTsStmt =
    """(?is)\s*RESTORE\s+(?:TABLE\s+)?([\w.]+)\s+(?:TO\s+)?TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
  private val AnalyzeStmt = // ANALYZE TABLE t COMPUTE STATISTICS
    ("""(?is)\s*ANALYZE\s+TABLE\s+([\w.]+)\s+COMPUTE\s+STATISTICS""" +
      """(?:\s+FOR\s+(ALL\s+COLUMNS|COLUMNS\s*\(([^)]*)\))""" +
      """(?:\s+WITH\s+(\d+)\s+BINS)?)?\s*;?\s*""").r
  private val FsckStmt =
    """(?is)\s*FSCK\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val FsckRepairStmt =
    """(?is)\s*FSCK\s+REPAIR\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val OptimizeStmt =
    """(?is)\s*OPTIMIZE\s+([\w.]+)(?:\s+WHERE\s+(.+?))??(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""".r
  private val ReorgPurgeStmt = // Delta's REORG TABLE t APPLY (PURGE)
    """(?is)\s*REORG\s+TABLE\s+([\w.]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  private val AlterColumnTypeStmt = // metadata-only exact widening
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+""" +
      """TYPE\s+(.+?)\s*;?\s*""").r
  private val SetPartitionedStmt = // one-commit layout migration
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+SET\s+PARTITIONED\s+BY\s*""" +
      """\(([^)]*)\)\s*;?\s*""").r
  private val AddUniqueStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+(?:CONSTRAINT\s+\w+\s+)?""" +
      """UNIQUE\s*\(([^)]*)\)\s*;?\s*""").r
  private val AddFkStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+(?:CONSTRAINT\s+\w+\s+)?""" +
      """FOREIGN\s+KEY\s*\(([^)]*)\)\s*REFERENCES\s+([A-Za-z0-9_.]+)""" +
      """\s*\(([^)]*)\)\s*;?\s*""").r
  private val DropUniqueStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+""" +
      """UNIQUE\s*\(([^)]*)\)\s*;?\s*""").r
  private val DropFkStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+""" +
      """FOREIGN\s+KEY\s*\(([^)]*)\)\s*;?\s*""").r
  private val DropPkStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+""" +
      """PRIMARY\s+KEY\s*;?\s*""").r
  private val SetDefaultStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+""" +
      """SET\s+DEFAULT\s+(.+?)\s*;?\s*""").r
  private val DropDefaultStmt =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ALTER\s+COLUMN\s+(\w+)\s+""" +
      """DROP\s+DEFAULT\s*;?\s*""").r
  private val AddCheckStmt = // greedy (.*) + final \) = balanced to the end
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.*)\)\s*;?\s*""".r
  private val DropCheckStmt =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val TruncateStmt =
    """(?is)\s*TRUNCATE\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val AddColumnStmt = // type = rest-of-statement, Spark DDL grammar
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+(.+?)\s*;?\s*""".r
  private val RenameColumnStmt = // pure-metadata column mapping
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
  private val DropColumnStmt =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)\s*;?\s*""".r
  private val DescribeDetailStmt =
    """(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+([\w.]+)\s*;?\s*""".r
  private val ShowTablesStmt =
    """(?is)\s*SHOW\s+WAREHOUSE\s+TABLES\s*;?\s*""".r
  private val ShowMvsStmt =
    """(?is)\s*SHOW\s+MATERIALIZED\s+VIEWS\s*;?\s*""".r
  private val CloneStmt =
    """(?is)\s*CREATE\s+TABLE\s+([\w.]+)\s+(SHALLOW|DEEP)\s+CLONE\s+([\w.]+)(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""".r
  private val DropTableStmt =
    """(?is)\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r
  private val ShowCreateStmt =
    """(?is)\s*SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*;?\s*""".r
  private val CreateMvStmt =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s+AS\s+SELECT\s+(.+?)\s+FROM\s+([\w.]+)\s+GROUP\s+BY\s+([\w.,\s]+?)\s*;?\s*""".r
  private val RefreshMvStmt =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.]+)\s*;?\s*""".r
  private val DropMvStmt =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r
  private val CopyIntoStmt = // Delta's idempotent bulk file ingest
    ("""(?is)\s*COPY\s+INTO\s+([\w.]+)\s+FROM\s+'([^']+)'""" +
      """(?:\s+FILEFORMAT\s*=\s*(\w+))?(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+(FORCE))?\s*;?\s*""").r

  /** Whole-statement match for the Delta-style maintenance syntax; None
    * (unmatched, or a name the registry doesn't know) falls through to
    * the delegate parser.
    */
  private[sql] def parseStatement(spark: SparkSession,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case DescribeHistoryStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) => GraftHistoryCommand(wh, t) }
    case RestoreStmt(name, v) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftRestoreCommand(wh, t,
          versionOrTag(wh, t, v).getOrElse(
            throw new IllegalArgumentException(
              s"RESTORE $name: no tag '$v'"))) }
    case CreateTagStmt(name, tag, ver) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftCreateTagCommand(wh, t, tag,
          Option(ver).map(_.toLong)) }
    case DropTagStmt(name, tag) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDropTagCommand(wh, t, tag) }
    case ShowTagsStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftShowTagsCommand(wh, t) }
    case ShowFilesStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftShowFilesCommand(wh, t) }
    case ShowStatsStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftShowStatsCommand(wh, t) }
    case PublishStmt(stagingName, dstName, withRebase) =>
      lookup(spark, Seq(stagingName)).map { case (wh, staging) =>
        val (dstWh, dst) = lookup(spark, Seq(dstName)).getOrElse(
          throw new IllegalArgumentException(
            s"PUBLISH TABLE $stagingName TO $dstName: unknown target"))
        require(dstWh eq wh,
          s"PUBLISH TABLE $stagingName TO $dstName: staging and target " +
            "must live in the same warehouse")
        GraftPublishCommand(wh, dst, staging, rebase = withRebase != null) }
    case RefreshFingerprintStmt(name, cols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftRefreshFingerprintCommand(wh, t,
          Option(cols).toSeq.flatMap(_.split(",").toSeq)
            .map(_.trim).filter(_.nonEmpty)) }
    case SetPartitionedStmt(name, cols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftRepartitionCommand(wh, t,
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty)) }
    case AddUniqueStmt(name, cols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDdlCommand(() => wh.addUnique(t,
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty))) }
    case AddFkStmt(name, cols, parent, pcols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        val parentTable = lookup(spark, Seq(parent)).map(_._2)
          .getOrElse(parent) // bare table name, or strip the SQL route
        GraftDdlCommand(() => wh.addForeignKey(t, Warehouse.ForeignKey(
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty),
          parentTable,
          pcols.split(",").toSeq.map(_.trim).filter(_.nonEmpty)))) }
    case DropUniqueStmt(name, cols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDdlCommand(() => wh.dropUnique(t,
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty))) }
    case DropFkStmt(name, cols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDdlCommand(() => wh.dropForeignKey(t,
          cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty))) }
    case DropPkStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDdlCommand(() => wh.dropPrimaryKey(t)) }
    case SetDefaultStmt(name, colName, e) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDdlCommand(() => wh.setDefault(t, colName, e.trim)) }
    case DropDefaultStmt(name, colName) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDdlCommand(() => wh.setDefault(t, colName, "")) }
    case AlterColumnTypeStmt(name, colName, ddlType) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        val dt =
          try org.apache.spark.sql.types.StructType
            .fromDDL(s"x $ddlType").head.dataType
          catch { case e: Exception => throw new IllegalArgumentException(
            s"ALTER COLUMN $name.$colName TYPE: cannot parse type " +
              s"'$ddlType': ${e.getMessage}") }
        GraftAlterColumnTypeCommand(wh, t, colName, dt) }
    case VacuumStmt(name, keep, dry) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftVacuumCommand(wh, t,
          Option(keep).map(_.toInt).getOrElse(2), dry != null) }
    case RestoreTsStmt(name, ts) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftRestoreTsCommand(wh, t, ts) }
    case FsckRepairStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftFsckRepairCommand(wh, t) }
    case FsckStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftFsckCommand(wh, t) }
    case AnalyzeStmt(name, forClause, colList, bins) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        if (forClause == null) GraftAnalyzeCommand(wh, t)
        else {
          val cols = Option(colList).toSeq.flatMap(_.split(",").toSeq)
            .map(_.trim).filter(_.nonEmpty)
          // an explicit empty list is a mistake, not FOR ALL COLUMNS
          require(colList == null || cols.nonEmpty,
            s"ANALYZE TABLE $name: FOR COLUMNS () names no column — " +
              "use FOR ALL COLUMNS to analyze every supported column")
          GraftAnalyzeColumnsCommand(wh, t, cols,
            Option(bins).map(_.toInt))
        } }
    case OptimizeStmt(name, whereSql, zcols) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftOptimizeCommand(wh, t,
          Option(zcols).toSeq.flatMap(_.split(",").toSeq)
            .map(_.trim).filter(_.nonEmpty),
          Option(whereSql).map(_.trim).filter(_.nonEmpty)) }
    case ReorgPurgeStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftReorgPurgeCommand(wh, t) }
    case CopyIntoStmt(name, src, fmt, pat, force) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftCopyIntoCommand(wh, t, src,
          Option(fmt).map(_.toLowerCase).getOrElse("parquet"),
          Option(pat).getOrElse(""), force != null) }
    case AddCheckStmt(name, check, e) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftCheckCommand(wh, t, check, Some(e.trim)) }
    case DropCheckStmt(name, check) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftCheckCommand(wh, t, check, None) }
    case TruncateStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftTruncateCommand(wh, t) }
    case DescribeDetailStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDetailCommand(wh, t) }
    case ShowCreateStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftShowCreateCommand(wh, t, name.toLowerCase) }
    case ShowTablesStmt() => Some(GraftShowTablesCommand())
    case ShowMvsStmt() => Some(GraftShowMvsCommand())
    case RenameColumnStmt(name, oldCol, newCol) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftRenameColumnCommand(wh, t, oldCol, newCol) }
    case DropColumnStmt(name, colName) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDropColumnCommand(wh, t, colName) }
    case AddColumnStmt(name, colName, colType) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        val dt =
          try org.apache.spark.sql.types.DataType.fromDDL(colType)
          catch { case e: Exception => throw new IllegalArgumentException(
            s"ALTER TABLE $name ADD COLUMN $colName: cannot parse type " +
              s"'$colType': ${e.getMessage}") }
        GraftAddColumnCommand(wh, t,
          org.apache.spark.sql.types.StructField(colName, dt)) }
    case CloneStmt(dstName, kind, srcName, ver) =>
      prefixFor(spark, dstName).map { case (wh, prefix) =>
        val (srcWh, srcTable) = lookup(spark, Seq(srcName)).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE TABLE $dstName $kind CLONE: $srcName is not a " +
              "registered warehouse table"))
        require(srcWh eq wh,
          s"CREATE TABLE $dstName $kind CLONE $srcName: source and " +
            "destination must live in the same warehouse (borrowed " +
            "file references don't cross warehouse roots)")
        GraftCloneCommand(wh, dstName.toLowerCase.drop(prefix.length),
          srcTable, Option(ver).map(_.toLong), prefix,
          deep = kind.equalsIgnoreCase("DEEP"))
      }
    // DROP TABLE routes only for REGISTERED names — a plain temp view
    // or catalog table falls through to the delegate's own DROP TABLE
    case DropTableStmt(_, name) if lookup(spark, Seq(name)).isDefined =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftDropTableCommand(wh, t, name.toLowerCase) }
    case CreateMvStmt(viewName, items, srcName, groupBy) =>
      prefixFor(spark, viewName).map { case (wh, prefix) =>
        val (srcWh, srcTable) = lookup(spark, Seq(srcName)).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE MATERIALIZED VIEW $viewName: $srcName is not a " +
              "registered warehouse table"))
        require(srcWh eq wh,
          s"CREATE MATERIALIZED VIEW $viewName: view and source must " +
            "live in the same warehouse")
        val vd = parseMvSelect(
          viewName.toLowerCase.drop(prefix.length), srcTable, items, groupBy)
        GraftCreateMvCommand(wh, vd, prefix)
      }
    case RefreshMvStmt(name) =>
      lookup(spark, Seq(name)).map { case (wh, t) =>
        GraftRefreshMvCommand(wh, t) }
    // DROP MATERIALIZED VIEW only accepts names that ARE views (the
    // plain-table path is DROP TABLE); a view drops like any table
    case DropMvStmt(ifExists, name) =>
      lookup(spark, Seq(name)) match {
        case Some((wh, t)) =>
          require(mvDefFor(wh, t).isDefined,
            s"DROP MATERIALIZED VIEW $name: not a materialized view " +
              "(use DROP TABLE)")
          Some(GraftDropTableCommand(wh, t, name.toLowerCase))
        case None if ifExists != null => Some(GraftNoopCommand())
        case None => throw new IllegalArgumentException(
          s"DROP MATERIALIZED VIEW $name: unknown view")
      }
    case _ => parseCreateTable(spark, sqlText)
  }

  // ------------------------------------------------------------------
  // CREATE MATERIALIZED VIEW — restricted aggregate grammar
  // ------------------------------------------------------------------

  private val MvCountItem = """(?is)\s*count\s*\(\s*\*\s*\)\s+AS\s+(\w+)\s*""".r
  private val MvAggItem =
    """(?is)\s*(sum|avg|min|max)\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MvGroupItem = """(?is)\s*(\w+)\s*""".r

  /** Parse the restricted MV select list: bare group columns plus
    * `count(*)/sum/avg/min/max(col) AS name` items (the
    * [[graft.pipeline.MaterializedView]] algebra — incrementally
    * maintainable by construction; anything richer belongs in a
    * downstream SELECT over the view). Group columns in the select
    * list must match the GROUP BY clause as a set; select order wins.
    */
  private[sql] def parseMvSelect(view: String, src: String,
      items: String, groupBy: String): graft.pipeline.MaterializedView.ViewDef = {
    import graft.pipeline.{MaterializedView => MV}
    val groupCols = scala.collection.mutable.ArrayBuffer[String]()
    val aggs = scala.collection.mutable.ArrayBuffer[MV.Agg]()
    items.split(",").foreach {
      case MvCountItem(out) => aggs += MV.Count(out.toLowerCase)
      case MvAggItem(f, in, out) => aggs += (f.toLowerCase match {
        case "sum" => MV.Sum(in.toLowerCase, out.toLowerCase)
        case "avg" => MV.Avg(in.toLowerCase, out.toLowerCase)
        case "min" => MV.Min(in.toLowerCase, out.toLowerCase)
        case "max" => MV.Max(in.toLowerCase, out.toLowerCase)
      })
      case MvGroupItem(g) => groupCols += g.toLowerCase
      case other => throw new IllegalArgumentException(
        s"CREATE MATERIALIZED VIEW $view: unsupported select item " +
          s"'${other.trim}' (supported: group column, count(*) AS n, " +
          "sum/avg/min/max(col) AS n)")
    }
    val declared = groupBy.split(",").map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSeq
    require(declared.toSet == groupCols.toSet,
      s"CREATE MATERIALIZED VIEW $view: GROUP BY ${declared.mkString(",")} " +
        s"must match the select list's bare columns ${groupCols.mkString(",")}")
    MV.ViewDef(src, view, groupCols.toSeq, aggs.toSeq)
  }

  /** (warehouse identity, table) → decoded view definition, cached so
    * read routing doesn't rescan table history per statement. Populated
    * on CREATE, invalidated on DROP ([[unrouteTable]]), loaded lazily
    * from table history otherwise (covers fresh sessions).
    */
  private val mvDefs = new ConcurrentHashMap[(Warehouse, String),
    Option[graft.pipeline.MaterializedView.ViewDef]]()

  private[sql] def mvDefFor(wh: Warehouse, table: String)
      : Option[graft.pipeline.MaterializedView.ViewDef] =
    mvDefs.computeIfAbsent((wh, table),
      _ => graft.pipeline.MaterializedView.loadDef(wh, table))

  private[sql] def cacheMvDef(wh: Warehouse,
      vd: graft.pipeline.MaterializedView.ViewDef): Unit = {
    mvDefs.put((wh, vd.view), Some(vd)); ()
  }

  private[sql] def purgeMvDef(wh: Warehouse, table: String): Unit = {
    mvDefs.remove((wh, table)); ()
  }

  // ------------------------------------------------------------------
  // Transparent aggregate rewrite over MATERIALIZED VIEWS
  // ------------------------------------------------------------------

  /** `SELECT g, agg(c) FROM wh_src GROUP BY g` answered from a FRESH
    * materialized view instead of the source scan — the classic
    * engine-side MV substitution (Calcite / warehouse optimizers), done
    * at the same parse-time routing layer as everything else here.
    *
    * Soundness gates, all checked per statement:
    *   - the view's txn watermark must equal the source's HEAD version
    *     (a stale view never answers a query — the rewrite is an
    *     optimization, not a semantics change);
    *   - the query's group columns must equal the view's (answered by a
    *     Project over the view contents) or be a SUBSET of them
    *     (answered by RE-AGGREGATING the view: count(*) → sum(n),
    *     sum/min/max → themselves — the distributive rollup; avg only
    *     on the exact match, where the view's own avg is the answer);
    *   - every aggregate item must map onto a declared view output; any
    *     DISTINCT, FILTER, WHERE, expression-valued group, or unmapped
    *     function aborts the rewrite (the source scan is always
    *     correct).
    *
    * At 100 TB this turns a full-corpus GROUP BY into a scan of a
    * groups-sized state table. Disable with
    * `spark.graft.mv.autoRewrite=false`.
    */
  private val mvAggNames: Seq[String] => Boolean = {
    case Seq(n) => Set("count", "sum", "avg", "min", "max")(n)
    case _ => false
  }

  private def rewriteAggOverMv(spark: SparkSession,
      agg: Aggregate): Option[LogicalPlan] = {
    val rel = agg.child match {
      case r: UnresolvedRelation if !r.isStreaming => r
      case _ => return None
    }
    val (wh, src) = lookup(spark, rel.multipartIdentifier)
      .getOrElse(return None)
    if (spark.conf.get("spark.graft.mv.autoRewrite", "true") != "true")
      return None
    if (mvDefFor(wh, src).isDefined) return None // the view itself
    val qGroups = agg.groupingExpressions
      .foldLeft(Option(Vector.empty[String])) {
        case (Some(acc), UnresolvedAttribute(Seq(n))) =>
          Some(acc :+ n.toLowerCase)
        case _ => None
      }.getOrElse(return None)
    if (qGroups.distinct.size != qGroups.size) return None
    val head = wh.versions(src).max
    wh.tables.keys.toSeq.sorted.iterator
      .flatMap(t => mvDefFor(wh, t))
      .filter(vd => vd.src == src &&
        qGroups.toSet.subsetOf(vd.groupBy.map(_.toLowerCase).toSet) &&
        graft.pipeline.MaterializedView.viewedVersion(wh, vd)
          .contains(head))
      .map(vd => tryMvRewrite(spark, agg, rel, wh, vd, qGroups))
      .collectFirst { case Some(p) => p }
  }

  private def tryMvRewrite(spark: SparkSession, agg: Aggregate,
      rel: UnresolvedRelation, wh: Warehouse,
      vd: graft.pipeline.MaterializedView.ViewDef,
      qGroups: Seq[String]): Option[LogicalPlan] = {
    import graft.pipeline.{MaterializedView => MV}
    val exact = vd.groupBy.map(_.toLowerCase).toSet == qGroups.toSet
    val mvPlan = GraftBridge.analyzed(MV.read(wh, vd))
    val attr = mvPlan.output.map(a => a.name.toLowerCase -> a).toMap
    val countOut = vd.aggs.collectFirst { case MV.Count(o) => o }
    def aggOut(f: String, in: String): Option[String] =
      vd.aggs.collectFirst {
        case MV.Sum(i, o) if f == "sum" && i.toLowerCase == in => o
        case MV.Avg(i, o) if f == "avg" && i.toLowerCase == in => o
        case MV.Min(i, o) if f == "min" && i.toLowerCase == in => o
        case MV.Max(i, o) if f == "max" && i.toLowerCase == in => o
      }
    def reAgg(f: String, out: String): Expression =
      UnresolvedFunction(Seq(f), Seq(attr(out.toLowerCase)),
        isDistinct = false)
    def mapAggExpr(e: Expression): Option[Expression] = e match {
      case UnresolvedAttribute(Seq(n))
          if qGroups.contains(n.toLowerCase) =>
        Some(attr(n.toLowerCase))
      case f: UnresolvedFunction if !f.isDistinct && f.filter.isEmpty =>
        (f.nameParts.map(_.toLowerCase), f.arguments) match {
          case (Seq("count"), Seq(_: UnresolvedStar)) |
               (Seq("count"), Seq(Literal(1, _))) =>
            countOut.map(o =>
              if (exact) attr(o.toLowerCase) else reAgg("sum", o))
          case (Seq(fn @ ("sum" | "min" | "max")),
              Seq(UnresolvedAttribute(Seq(in)))) =>
            aggOut(fn, in.toLowerCase).map(o =>
              if (exact) attr(o.toLowerCase) else reAgg(fn, o))
          case (Seq("avg"), Seq(UnresolvedAttribute(Seq(in)))) if exact =>
            // subset-avg would need the view's internal non-null count;
            // finals don't expose it — exact match only
            aggOut("avg", in.toLowerCase).map(o => attr(o.toLowerCase))
          case _ => None
        }
      case _ => None
    }
    val mapped = agg.aggregateExpressions.map {
      case UnresolvedAttribute(Seq(n)) if qGroups.contains(n.toLowerCase) =>
        Some(attr(n.toLowerCase))
      case Alias(child, name) => mapAggExpr(child).map(e => Alias(e, name)())
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) None
    else {
      val outs = mapped.map(_.get.asInstanceOf[NamedExpression])
      val base = SubqueryAlias(rel.multipartIdentifier.head, mvPlan)
      if (exact) Some(Project(outs, base))
      else Some(Aggregate(qGroups.map(attr), outs, base))
    }
  }

  // ------------------------------------------------------------------
  // METADATA-ONLY aggregates (Delta OptimizeMetadataOnlyQuery shape)
  // ------------------------------------------------------------------

  /** `SELECT count(*) [, min(c), max(c) ...] FROM wh_t` — optionally
    * `GROUP BY <partition columns>` — with no WHERE, DISTINCT or FILTER
    * is answered from the HEAD MANIFEST: row counts are sums of
    * per-file footer counts, min/max the fold of per-file footer stats,
    * partition groups the hive-decoded directory values the files
    * already live under — without opening a single data file. At
    * 100 TB that turns the two most common sanity queries in any
    * pipeline (`count(*)`, `count(*) GROUP BY day`) into driver-side
    * metadata reads.
    *
    * Soundness gates: every live file must carry a footer row count
    * (legacy/adopted files → scan); every min/max column must be
    * stat-covered in EVERY file of every answered slice (an all-null
    * or untracked file makes the manifest answer unknowable → scan);
    * the column's type must have a lossless long decode (int/long/
    * short/byte, date, timestamp — the types footer stats encode); and
    * group columns must be PARTITION columns (their values are exact
    * in the file paths; group values re-enter typed through the same
    * string→type cast the scan path applies to partition dirs).
    * Copy-on-write DML keeps all of it exact (rewritten files re-enter
    * with fresh footers). Disable with `spark.graft.metaOnlyAgg=false`.
    */
  private def rewriteMetaOnlyAgg(spark: SparkSession,
      agg: Aggregate): Option[LogicalPlan] = {
    // time travel is free for metadata answers — every manifest IS a
    // snapshot, so VERSION/TIMESTAMP AS OF just pins the entry list
    val (rel, travel) = agg.child match {
      case r: UnresolvedRelation if !r.isStreaming => (r, None)
      case RelationTimeTravel(r: UnresolvedRelation, ts, ver)
          if !r.isStreaming =>
        (r, Some((ts, ver)))
      case _ => return None
    }
    val (wh, t) = lookup(spark, rel.multipartIdentifier)
      .getOrElse(return None)
    if (spark.conf.get("spark.graft.metaOnlyAgg", "true") != "true")
      return None
    val versionAsOf: Option[Long] = travel.map {
      case (None, Some(v)) =>
        // unknown tag → None: fall through to the scan path, whose
        // readTag raises the error naming the available tags
        versionOrTag(wh, t, v).getOrElse(return None)
      case (Some(e), None) => wh.versionAt(t,
        evalTimestampMillis(rel.multipartIdentifier.head, e))
      case _ => return None
    }
    // a view NAME resolves to view contents, not the state table the
    // manifest describes — never answer it from that table's metadata
    if (mvDefFor(wh, t).isDefined) return None
    val schema = wh.tables(t)
    def fieldOf(n: String) = schema.fields.find(_.name.equalsIgnoreCase(n))
    import org.apache.spark.sql.types._
    // manifest stats are long-encoded (footerInfo): decode back to the
    // column's external type, or None for types stats never cover
    def decoder(dt: DataType): Option[Long => Any] = dt match {
      case IntegerType => Some(v => v.toInt)
      case LongType => Some(v => v)
      case ShortType => Some(v => v.toShort)
      case ByteType => Some(v => v.toByte)
      case DateType => Some(v =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v)))
      case TimestampType => Some(v => java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plus(v, java.time.temporal.ChronoUnit.MICROS)))
      // NTZ stats share the epoch-micros encoding; the external value a
      // LocalRelation of NTZ type carries is a LocalDateTime (naive-UTC
      // reading of the micros — the Catalyst internal convention)
      case TimestampNTZType => Some(v => java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(v, 1000000L),
        Math.floorMod(v, 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))
      case _ => None
    }
    val groups = agg.groupingExpressions.map {
      case UnresolvedAttribute(Seq(n)) => fieldOf(n).getOrElse(return None).name
      case _ => return None
    }
    if (groups.distinct.size != groups.size) return None
    sealed trait Item { def out: String }
    case class GroupRef(fld: StructField, out: String) extends Item
    case class CountAll(out: String) extends Item
    case class MinMax(fn: String, fld: StructField, dec: Long => Any,
        out: String) extends Item
    def classify(core: Expression, alias: Option[String]): Option[Item] =
      core match {
        case UnresolvedAttribute(Seq(n))
            if groups.exists(_.equalsIgnoreCase(n)) =>
          fieldOf(n).map(f => GroupRef(f, alias.getOrElse(f.name)))
        case f: UnresolvedFunction if !f.isDistinct && f.filter.isEmpty &&
            f.orderingWithinGroup.isEmpty =>
          (f.nameParts.map(_.toLowerCase), f.arguments) match {
            case (Seq("count"), Seq(_: UnresolvedStar)) =>
              Some(CountAll(alias.getOrElse("count(1)")))
            case (Seq("count"), Seq(Literal(v, _))) if v != null =>
              Some(CountAll(alias.getOrElse("count(1)")))
            case (Seq(fn @ ("min" | "max")),
                Seq(UnresolvedAttribute(Seq(c)))) =>
              fieldOf(c).flatMap(fld => decoder(fld.dataType).map(dec =>
                MinMax(fn, fld, dec, alias.getOrElse(s"$fn(${fld.name})"))))
            case _ => None
          }
        case _ => None
      }
    val classified = agg.aggregateExpressions.map {
      case Alias(core, name) => classify(core, Some(name))
      case ua: UnresolvedAlias => classify(ua.child, None)
      case e => classify(e, None)
    }
    if (classified.exists(_.isEmpty)) return None
    val items = classified.map(_.get)
    // slices: (group values as partition-path strings, rows, stat fold)
    val slices: Seq[(Seq[String], Long, String => Option[(Long, Long)])] =
      if (groups.isEmpty) {
        val n = wh.metaRowCount(t, versionAsOf).getOrElse(return None)
        Seq((Nil, n, c => wh.metaMinMax(t, c, versionAsOf)))
      } else wh.metaPartitionStats(t, groups, versionAsOf)
        .getOrElse(return None)
        .map { case (vals, n, st) => (vals, n, (c: String) => st.get(c)) }
    val rows = slices.map { case (vals, n, statOf) =>
      val cells = items.map {
        case GroupRef(fld, _) => Some(vals(groups.indexOf(fld.name)))
        case CountAll(_) => Some(n)
        case MinMax(fn, fld, dec, _) =>
          // empty global slice: SQL min/max of no rows is NULL; a
          // grouped slice always holds ≥1 row (files with rows enter)
          if (n == 0L) Some(null)
          else statOf(fld.name).map { case (lo, hi) =>
            dec(if (fn == "min") lo else hi) }
      }
      if (cells.exists(_.isEmpty)) return None
      org.apache.spark.sql.Row.fromSeq(cells.map(_.get))
    }
    // group values ride as partition-path strings and re-enter typed
    // through the same cast the scan path applies to partition dirs
    val raw = StructType(items.zipWithIndex.map {
      case (_: GroupRef, i) => StructField(s"c$i", StringType, true)
      case (_: CountAll, i) => StructField(s"c$i", LongType, true)
      case (m: MinMax, i) => StructField(s"c$i", m.fld.dataType, true)
    })
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, raw)
      .select(items.zipWithIndex.map {
        case (g: GroupRef, i) => org.apache.spark.sql.functions.col(s"c$i")
          .cast(g.fld.dataType).as(g.out)
        case (it, i) =>
          org.apache.spark.sql.functions.col(s"c$i").as(it.out)
      }: _*)
    Some(SubqueryAlias(rel.multipartIdentifier.head, GraftBridge.analyzed(df)))
  }

  // ------------------------------------------------------------------
  // CREATE TABLE — the reference's own DDL shape (script.py:77-83)
  // ------------------------------------------------------------------

  private val CreateTableHead =
    """(?is)\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*\((.*)""".r

  /** `CREATE TABLE [IF NOT EXISTS] <prefix><t> (col type [PRIMARY KEY],
    * ..., [PRIMARY KEY (c, ...)]) [PARTITIONED BY (c, ...)]` →
    * [[Warehouse!.createTable]]. The name routes by the longest
    * registered warehouse PREFIX (the target itself doesn't exist yet).
    * Column types parse through Spark's own DDL grammar after the
    * PRIMARY KEY markers are stripped — so the reference's verbatim
    * SQLite-dialect DDL runs. PK columns are ENFORCED
    * ([[Warehouse.TableSpec.primaryKey]] — NULL keys, batch duplicates
    * and live-row collisions all reject the write, the reference's
    * Postgres semantics) and also ride as `pk=` commit metadata
    * (visible in DESCRIBE HISTORY). A matched prefix with a malformed
    * body FAILS (no silent
    * fall-through to the delegate's different CREATE TABLE semantics).
    */
  private[sql] def parseCreateTable(spark: SparkSession,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateTableHead(ine, name, rest) =>
      prefixFor(spark, name).map { case (wh, prefix) =>
        def fail(msg: String) = throw new IllegalArgumentException(
          s"CREATE TABLE $name: $msg")
        // balanced scan for the column list's closing paren (types like
        // DECIMAL(10,2) nest parens, so no regex split)
        var depth = 1
        var i = 0
        while (i < rest.length && depth > 0) {
          rest.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        if (depth != 0) fail("unbalanced parentheses in column list")
        val colsDdl = rest.substring(0, i - 1)
        val tail = rest.substring(i)
        // STATS BY / BLOOM BY are the engine's layout clauses (manifest
        // footer-stat columns, bloom sidecar columns) — the additions
        // that make SHOW CREATE TABLE round-trip the FULL TableSpec,
        // not just schema + partitioning
        val TailRe =
          ("""(?is)\s*(?:PARTITIONED\s+BY\s*\(([^)]*)\))?""" +
            """\s*(?:CLUSTERED\s+BY\s*\(([^)]*)\)\s+INTO\s+(\d+)\s+BUCKETS)?""" +
            """\s*(?:STATS\s+BY\s*\(([^)]*)\))?""" +
            """\s*(?:BLOOM\s+BY\s*\(([^)]*)\)""" +
            """(?:\s+ITEMS\s+(\d+))?(?:\s+FPP\s+([\d.eE+-]+))?)?""" +
            """\s*;?\s*""").r
        def cols(s: String): Seq[String] = Option(s).toSeq
          .flatMap(_.split(",").toSeq).map(_.trim).filter(_.nonEmpty)
        val (partitionBy, bucketBy, numBuckets, statsBy, bloomBy,
            bloomItems, bloomFpp) =
          tail match {
            case TailRe(p, cb, nb, s, b, items, fpp) =>
              (cols(p), cols(cb), Option(nb).map(_.toInt).getOrElse(0),
                cols(s), cols(b),
                Option(items).map(_.toLong),
                Option(fpp).map(_.toDouble))
            case _ => fail(s"unsupported clause after column list: " +
              s"'$tail' (supported: PARTITIONED BY (...), CLUSTERED BY " +
              "(...) INTO n BUCKETS, STATS BY (...), BLOOM BY (...) " +
              "[ITEMS n] [FPP x])")
          }
        // split column defs on top-level commas only
        val items = {
          val out = Seq.newBuilder[String]
          val sb = new StringBuilder
          var d = 0
          colsDdl.foreach {
            case ',' if d == 0 => out += sb.result(); sb.clear()
            case c =>
              if (c == '(') d += 1 else if (c == ')') d -= 1
              sb.append(c)
          }
          out += sb.result()
          out.result().map(_.trim).filter(_.nonEmpty)
        }
        val TablePk = """(?is)PRIMARY\s+KEY\s*\(([^)]*)\)""".r
        val ColPk = """(?is)(.*?)\s+PRIMARY\s+KEY\s*""".r
        val TableUq = """(?is)UNIQUE\s*\(([^)]*)\)""".r
        val ColUq = """(?is)(.*?)\s+UNIQUE\s*""".r
        // column-level DEFAULT <expr> — expr runs to the end of the
        // item (parenthesized exprs survive the top-level comma split)
        val ColDefault = """(?is)(.+?)\s+DEFAULT\s+(.+?)\s*$""".r
        // FOREIGN KEY (a, b) REFERENCES parent (x, y) — table level —
        // and `c type REFERENCES parent(x)` — column level. The parent
        // may be written with or without this warehouse's SQL prefix.
        val TableFk = ("""(?is)FOREIGN\s+KEY\s*\(([^)]*)\)\s*""" +
          """REFERENCES\s+([A-Za-z0-9_.]+)\s*\(([^)]*)\)\s*""").r
        val ColFk = ("""(?is)(.+?)\s+REFERENCES\s+""" +
          """([A-Za-z0-9_.]+)\s*\(([^)]*)\)\s*$""").r
        def parentName(raw: String): String = {
          val lower = raw.toLowerCase
          if (lower.startsWith(prefix) && lower.length > prefix.length)
            raw.drop(prefix.length)
          else raw
        }
        // column-level GENERATED ALWAYS AS ((expr)) — greedy capture so
        // nested parens in the expression survive
        val ColGen =
          """(?is)(.+?)\s+GENERATED\s+ALWAYS\s+AS\s*\((.*)\)\s*$""".r
        // column-level GENERATED ALWAYS AS IDENTITY
        // [(START WITH n | ORDER BY a, b | both)] — matched BEFORE
        // ColGen (the IDENTITY keyword keeps the grammars disjoint, but
        // order makes it unambiguous)
        val ColIdentity = ("""(?is)(.+?)\s+GENERATED\s+ALWAYS\s+AS\s+""" +
          """IDENTITY\s*(?:\(([^)]*)\))?\s*$""").r
        val IdStart = """(?is).*START\s+WITH\s+(-?\d+).*""".r
        val IdOrder = """(?is).*ORDER\s+BY\s+([A-Za-z0-9_,\s]+?)\s*$""".r
        val pk = Seq.newBuilder[String]
        val gen = Map.newBuilder[String, String]
        val fks = Seq.newBuilder[Warehouse.ForeignKey]
        val uq = Seq.newBuilder[Seq[String]]
        val dfl = Map.newBuilder[String, String]
        var identity: Option[Warehouse.Identity] = None
        val colDefs = items.flatMap {
          case TablePk(cols) =>
            pk ++= cols.split(",").map(_.trim).filter(_.nonEmpty); None
          case TableFk(cs, parent, ps) =>
            fks += Warehouse.ForeignKey(
              cs.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
              parentName(parent),
              ps.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
            None
          case TableUq(cols) =>
            uq += cols.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
            None
          case item =>
            // a column item may stack SEVERAL suffix clauses
            // (`c INT UNIQUE DEFAULT 5`, `c INT DEFAULT 0 REFERENCES
            // p(x)`), so clauses strip ITERATIVELY from the right until
            // only `name type [NOT NULL]` remains. DEFAULT is tried
            // LAST each pass: its expr capture runs to end-of-item, so
            // trying it earlier would swallow a trailing constraint
            // into the default expression. The column name is the
            // item's first token — stable across stripping.
            def nameOf(s: String): String = s.trim.split("\\s+").head
            var rest = item
            var stripped = true
            while (stripped) {
              stripped = true
              rest match {
                case ColIdentity(colDef, opts) =>
                  if (identity.nonEmpty) fail("at most one IDENTITY column")
                  val o = Option(opts).getOrElse("")
                  val start = o match {
                    case IdStart(n) => n.toLong
                    case _ => 1L
                  }
                  val orderBy = o match {
                    case IdOrder(cols) => cols.split(",").toSeq
                      .map(_.trim).filter(_.nonEmpty)
                    case _ => Nil
                  }
                  identity = Some(Warehouse.Identity(nameOf(rest),
                    orderBy, start))
                  rest = colDef
                case ColGen(colDef, e) =>
                  gen += nameOf(rest) -> e.trim; rest = colDef
                case ColPk(colDef) =>
                  pk += nameOf(rest); rest = colDef
                case ColUq(colDef) =>
                  uq += Seq(nameOf(rest)); rest = colDef
                case ColFk(colDef, parent, ps) =>
                  fks += Warehouse.ForeignKey(
                    Seq(nameOf(rest)), parentName(parent),
                    ps.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
                  rest = colDef
                case ColDefault(colDef, e) =>
                  dfl += nameOf(rest) -> e.trim; rest = colDef
                case _ => stripped = false
              }
            }
            Some(rest)
        }
        if (colDefs.isEmpty) fail("no columns")
        val schema =
          try org.apache.spark.sql.types.StructType.fromDDL(colDefs.mkString(", "))
          catch { case e: Exception => fail(s"cannot parse columns: ${e.getMessage}") }
        GraftCreateTableCommand(wh, name.drop(prefix.length),
          Warehouse.TableSpec(schema, partitionBy = partitionBy,
            statColumns = statsBy, bloomColumns = bloomBy,
            bloomExpectedItems = bloomItems.getOrElse(1000000L),
            bloomFpp = bloomFpp.getOrElse(0.03),
            bucketBy = bucketBy, numBuckets = numBuckets,
            generated = gen.result(),
            primaryKey = pk.result(),
            foreignKeys = fks.result(),
            identity = identity,
            unique = uq.result(),
            defaults = dfl.result()),
          ifNotExists = ine != null, pk = pk.result(), prefix = prefix)
      }
    case _ => None
  }

  /** A `VERSION AS OF` operand: a digit string is a version number,
    * anything else a TAG (the tag grammar forbids a leading digit, so
    * the two can never collide). None = unknown tag — callers pick
    * their own error (RESTORE names the statement; the meta-only
    * rewrite falls through to the scan path, whose readTag lists the
    * available tags).
    */
  private def versionOrTag(wh: Warehouse, table: String,
      v: String): Option[Long] =
    if (v.forall(_.isDigit)) Some(v.toLong) else wh.tags(table).get(v)

  /** Longest registered prefix of `name` for this session (the table
    * part must be nonempty). */
  private def prefixFor(spark: SparkSession,
      name: String): Option[(Warehouse, String)] = {
    val uuid = GraftBridge.sessionUUID(spark)
    val lower = name.toLowerCase
    import scala.jdk.CollectionConverters._
    prefixRegistry.asScala.collect {
      case ((u, p), wh) if u == uuid && lower.startsWith(p) &&
          lower.length > p.length => (wh, p)
    }.toSeq.sortBy(-_._2.length).headOption
  }

  // ------------------------------------------------------------------
  // plan routing
  // ------------------------------------------------------------------

  /** Re-route a delegate-parsed plan: warehouse-targeted DML at the top
    * level becomes a graft command; every warehouse relation anywhere in
    * the tree (FROM clauses, subqueries, the DML source) resolves
    * through the manifest.
    */
  private[sql] def route(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan match {
      case DeleteFromTable(target, cond) =>
        targetOf(spark, target) match {
          case Some((wh, table, quals)) =>
            GraftDeleteCommand(wh, table,
              GraftBridge.toColumn(prepExpr(spark, cond, quals)))
          case None => rewriteReads(spark, plan)
        }
      case UpdateTable(target, assignments, cond) =>
        targetOf(spark, target) match {
          case Some((wh, table, quals)) =>
            val schema = wh.tables(table)
            val set = assignments.map { case Assignment(key, value) =>
              columnName(schema.fieldNames, key, quals, s"UPDATE $table") ->
                GraftBridge.toColumn(prepExpr(spark, value, quals))
            }.toMap
            GraftUpdateCommand(wh, table,
              GraftBridge.toColumn(cond.map(prepExpr(spark, _, quals))
                .getOrElse(Literal.TrueLiteral)), set)
          case None => rewriteReads(spark, plan)
        }
      case m: MergeIntoTable =>
        targetOf(spark, m.targetTable) match {
          case Some((wh, table, quals)) => translateMerge(spark, m, wh, table, quals)
          case None => rewriteReads(spark, plan)
        }
      case ctas: CreateTableAsSelect =>
        val ident = ctas.name match {
          case u: org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
              if u.nameParts.size == 1 => Some(u.nameParts.head)
          case _ => None
        }
        ident.flatMap(n => prefixFor(spark, n).map(w => (n, w))) match {
          case Some((sqlName, (wh, prefix))) =>
            require(ctas.partitioning.isEmpty,
              s"CREATE TABLE $sqlName AS SELECT: PARTITIONED BY is " +
                "unsupported in the CTAS form (declare the table with " +
                "CREATE TABLE ... PARTITIONED BY, then INSERT)")
            GraftCtasCommand(wh, sqlName.drop(prefix.length),
              rewriteReads(spark, ctas.query), ctas.ignoreIfExists, prefix)
          case None => rewriteReads(spark, plan)
        }
      case i: InsertIntoStatement =>
        targetOf(spark, i.table) match {
          case Some((wh, table, _)) =>
            require(i.partitionSpec.isEmpty,
              s"INSERT INTO $table PARTITION (...): partition values ride " +
                "the rows themselves (hive-style static spec unsupported)")
            GraftAppendCommand(wh, table, i.userSpecifiedCols,
              rewriteReads(spark, i.query), i.byName,
              overwrite = i.overwrite)
          case None => rewriteReads(spark, plan)
        }
      case other => rewriteReads(spark, other)
    }

  /** Unwrap a DML target down to its UnresolvedRelation, collecting the
    * alias qualifiers (`DELETE FROM wh_t AS x WHERE x.c`) that condition
    * expressions may carry and [[prepExpr]] must strip.
    */
  private def targetOf(spark: SparkSession,
      plan: LogicalPlan): Option[(Warehouse, String, Set[String])] = plan match {
    case SubqueryAlias(id, child) =>
      targetOf(spark, child).map { case (wh, t, q) =>
        (wh, t, q + id.name.toLowerCase) }
    case r: UnresolvedRelation =>
      lookup(spark, r.multipartIdentifier).map { case (wh, t) =>
        (wh, t, Set(r.multipartIdentifier.head.toLowerCase)) }
    case _ => None
  }

  /** Condition/value expression → the form the Warehouse API evaluates
    * against the table's own DataFrame: table/alias qualifiers stripped
    * (the DataFrame has no alias), warehouse relations inside subquery
    * predicates (`WHERE k IN (SELECT ...)`) routed like any other read.
    */
  private def prepExpr(spark: SparkSession, e: Expression,
      quals: Set[String]): Expression = e.transformUp {
    case a: UnresolvedAttribute if a.nameParts.size > 1 &&
        quals.contains(a.nameParts.head.toLowerCase) =>
      UnresolvedAttribute(a.nameParts.tail)
    case s: SubqueryExpression => s.withNewPlan(rewriteReads(spark, s.plan))
  }

  /** Resolve an assignment key to its schema field name. */
  private def columnName(fields: Array[String], key: Expression,
      quals: Set[String], ctx: String): String = key match {
    case a: UnresolvedAttribute =>
      val bare =
        if (a.nameParts.size > 1 && quals.contains(a.nameParts.head.toLowerCase))
          a.nameParts.tail
        else a.nameParts
      require(bare.size == 1, s"$ctx: cannot assign to ${a.sql} " +
        "(nested-field assignment unsupported)")
      fields.find(_.equalsIgnoreCase(bare.head)).getOrElse(
        throw new IllegalArgumentException(s"$ctx: no column ${bare.head}"))
    case other =>
      throw new IllegalArgumentException(
        s"$ctx: assignment target must be a column, got ${other.sql}")
  }

  /** Replace every registered warehouse relation (and VERSION AS OF
    * form) in the tree — subqueries included — with the manifest-planned
    * read, wrapped in a SubqueryAlias carrying the SQL name so
    * qualified references (`wh_t.c`) still resolve. Non-registered
    * relations and streaming relations pass through untouched.
    */
  private[sql] def rewriteReads(spark: SparkSession,
      plan: LogicalPlan): LogicalPlan = {
    // an Aggregate directly under HAVING must stay an Aggregate — the
    // analyzer resolves UnresolvedHaving against its child's grouping,
    // and both rewrites can replace the child with a Project
    val underHaving = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.collectWithSubqueries {
      case h: org.apache.spark.sql.catalyst.analysis.UnresolvedHaving =>
        underHaving.add(h.child)
    }
    plan.transformDownWithSubqueries {
      // CTE definitions at parse time live in UnresolvedWith's
      // cteRelations TUPLES — not children, so no transform reaches
      // them on its own: rewrite each body explicitly (recursively, so
      // nested CTEs and their subqueries route too)
      case agg: Aggregate if !underHaving.contains(agg) =>
        rewriteAggOverMv(spark, agg)
          .orElse(rewriteMetaOnlyAgg(spark, agg)).getOrElse(agg)
      // a GLOBAL aggregate parses as a Project (the analyzer's
      // GlobalAggregates rule runs later) — treat it as an Aggregate
      // with no group columns when it visibly contains agg functions
      case p: Project if p.projectList.exists {
          case Alias(f: UnresolvedFunction, _) =>
            mvAggNames(f.nameParts.map(_.toLowerCase))
          case UnresolvedAlias(f: UnresolvedFunction, _) =>
            mvAggNames(f.nameParts.map(_.toLowerCase))
          case f: UnresolvedFunction =>
            mvAggNames(f.nameParts.map(_.toLowerCase))
          case _ => false
        } =>
        val asAgg = Aggregate(Nil, p.projectList, p.child)
        rewriteAggOverMv(spark, asAgg)
          .orElse(rewriteMetaOnlyAgg(spark, asAgg)).getOrElse(p)
      case w: UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, body, m) =>
          (n, rewriteReads(spark, body).asInstanceOf[SubqueryAlias], m)
        })
      // time-traveled METADATA tables: `FROM wh_t.files VERSION AS OF
      // n` reads the manifest AS OF that version as a relation —
      // distributed at |files| scale through the same columnar
      // checkpoint + delta-replay resolution the head uses
      // ([[Warehouse.entriesRelationAt]])
      case RelationTimeTravel(r: UnresolvedRelation, ts, ver)
          if r.multipartIdentifier.size == 2 &&
            metaTableKinds(r.multipartIdentifier(1).toLowerCase) &&
            lookup(spark, r.multipartIdentifier.take(1)).isDefined =>
        val (wh, table) = lookup(spark, r.multipartIdentifier.take(1)).get
        val v: Long = (ts, ver) match {
          case (None, Some(x)) => versionOrTag(wh, table, x).getOrElse(
            throw new IllegalArgumentException(
              s"$table: unknown tag '$x' (tags: " +
                s"${wh.tags(table).keys.toSeq.sorted.mkString(", ")})"))
          case (Some(e), None) => wh.versionAt(table,
            evalTimestampMillis(r.multipartIdentifier.head, e))
          case _ => throw new IllegalArgumentException(
            s"${r.multipartIdentifier.mkString(".")}: time travel needs " +
              "exactly one of VERSION AS OF <n> / TIMESTAMP AS OF <ts>")
        }
        SubqueryAlias(r.multipartIdentifier(1),
          GraftBridge.analyzed(metaTableDf(spark, wh, table,
            r.multipartIdentifier(1).toLowerCase, Some(v))))
      case RelationTimeTravel(r: UnresolvedRelation, ts, ver)
          if lookup(spark, r.multipartIdentifier).isDefined =>
        val (wh, table) = lookup(spark, r.multipartIdentifier).get
        val df = (ts, ver) match {
          // a non-numeric version is a TAG name (tag grammar forbids
          // a leading digit, so the two can never collide)
          case (None, Some(v)) =>
            if (v.forall(_.isDigit)) wh.readVersion(table, v.toLong)
            else wh.readTag(table, v)
          case (Some(e), None) =>
            wh.readTimestamp(table, evalTimestampMillis(
              r.multipartIdentifier.head, e))
          case _ => throw new IllegalArgumentException(
            s"${r.multipartIdentifier.head}: time travel needs exactly " +
              "one of VERSION AS OF <n> / TIMESTAMP AS OF <ts>")
        }
        SubqueryAlias(r.multipartIdentifier.head, GraftBridge.analyzed(df))
      // METADATA TABLES (Iceberg's `db.table.files` shape): a two-part
      // name whose head routes to a warehouse table and whose tail is
      // a known metadata kind reads the manifest as a relation —
      // join-able, filter-able metadata instead of SHOW-only output.
      // Driver-side by construction (the manifest IS driver metadata).
      case r: UnresolvedRelation if !r.isStreaming &&
          r.multipartIdentifier.size == 2 &&
          metaTableKinds(r.multipartIdentifier(1).toLowerCase) &&
          lookup(spark, r.multipartIdentifier.take(1)).isDefined =>
        val (wh, table) = lookup(spark, r.multipartIdentifier.take(1)).get
        SubqueryAlias(r.multipartIdentifier(1),
          GraftBridge.analyzed(metaTableDf(spark, wh, table,
            r.multipartIdentifier(1).toLowerCase)))
      case r: UnresolvedRelation if !r.isStreaming &&
          lookup(spark, r.multipartIdentifier).isDefined =>
        val (wh, table) = lookup(spark, r.multipartIdentifier).get
        // a MATERIALIZED VIEW name reads its CONTENTS (finals frame,
        // tombstones filtered) — the state table stays an internal
        // representation; time travel above still reads raw state
        val df = mvDefFor(wh, table) match {
          case Some(vd) => graft.pipeline.MaterializedView.read(wh, vd)
          case None => wh.read(table)
        }
        SubqueryAlias(r.multipartIdentifier.head, GraftBridge.analyzed(df))
    }
  }

  /** The metadata kinds `FROM wh_t.<kind>` resolves. */
  private val metaTableKinds =
    Set("files", "history", "tags", "partitions")

  /** One metadata kind as a DataFrame — all driver-side manifest/meta
    * folds, bounded by |files| / |versions| / |tags|:
    *   - `files`: one row per LIVE file — rel path, its partition dir
    *     (empty for flat tables), bytes, footer row count, and rows
    *     removed by its deletion vector;
    *   - `partitions`: files/bytes/live rows per partition dir (rows
    *     NET of deletion vectors — matches what a scan returns);
    *   - `history`: version/operation/details (DESCRIBE HISTORY as a
    *     relation);
    *   - `tags`: tag → pinned version.
    */
  private def metaTableDf(spark: SparkSession, wh: Warehouse,
      table: String, kind: String,
      versionAsOf: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{
      array_join, col, count, expr, lit, slice, split, sum}
    versionAsOf.foreach { v =>
      require(wh.versions(table).contains(v),
        s"$table has no manifest v$v (vacuumed or never committed)")
      require(kind == "files" || kind == "partitions",
        s"$table.$kind: time travel applies to the files/partitions " +
          "metadata tables only")
    }
    // a versioned ask decodes partition dirs under ITS era's layout
    // depth (a later repartition changed the head's)
    val parts = versionAsOf
      .flatMap(v => wh.layoutAtVersion(table, v)).map(_.size)
      .getOrElse(wh.partitioning.getOrElse(table, Nil).size)
    def dirOf(rel: String): String =
      rel.split('/').init.takeRight(parts).mkString("/")
    // the files/partitions relations plan DISTRIBUTED over the columnar
    // checkpoint when one serves the asked version (t.files at 800k
    // entries must not be a driver fold, head or time-traveled); small
    // tables fall back to the fold
    def filesRel: Option[org.apache.spark.sql.DataFrame] =
      versionAsOf.fold(wh.entriesRelation(table))(v =>
        wh.entriesRelationAt(table, v)).map { rel =>
        val part =
          if (parts == 0) lit("")
          else array_join(slice(split(col("rel"), "/"),
            expr(s"size(split(rel, '/')) - $parts"), lit(parts)), "/")
        rel.select(col("rel"), part.as("partition"), col("bytes"),
          col("rows"), col("dvRows").as("dv_rows"))
      }
    def entriesAsOf(): Seq[graft.pipeline.Warehouse.FileEntry] =
      versionAsOf.map(v => wh.loadAt(table, v))
        .getOrElse(wh.loadLatest(table)._2)
    kind match {
      case "files" =>
        filesRel.getOrElse {
          val entries = entriesAsOf()
          spark.createDataFrame(entries.map(e =>
              (e.rel, dirOf(e.rel), e.bytes, e.rows, e.dvRows)))
            .toDF("rel", "partition", "bytes", "rows", "dv_rows")
        }
      case "partitions" =>
        filesRel.map { fr =>
          fr.groupBy(col("partition"))
            .agg(count(lit(1)).as("files"), sum(col("bytes")).as("bytes"),
              sum(col("rows") - col("dv_rows")).as("rows"))
            .orderBy(col("partition"))
        }.getOrElse {
          val grouped = entriesAsOf().groupBy(e => dirOf(e.rel)).toSeq
            .map { case (d, es) =>
              (d, es.size.toLong, es.map(_.bytes).sum,
                es.map(e => e.rows - e.dvRows).sum)
            }.sortBy(_._1)
          spark.createDataFrame(grouped)
            .toDF("partition", "files", "bytes", "rows")
        }
      case "history" =>
        spark.createDataFrame(wh.history(table).map { case (v, meta) =>
            (v, meta.getOrElse("op", null: String),
              meta.toSeq.filter(_._1 != "op").sortBy(_._1)
                .map { case (k, x) => s"$k=$x" }.mkString(" "))
          })
          .toDF("version", "operation", "details")
      case "tags" =>
        spark.createDataFrame(wh.tags(table).toSeq.sortBy(_._1))
          .toDF("tag", "version")
    }
  }

  /** Evaluate a `TIMESTAMP AS OF` expression to epoch millis. The
    * parser hands a foldable literal (string or timestamp); strings
    * parse with Spark's own timestamp rules under the session zone
    * (UTC for GraftSession) so `'2026-01-01 12:00:00'` means what a
    * CAST would mean.
    */
  private def evalTimestampMillis(name: String, e: Expression): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    import org.apache.spark.sql.types.{StringType, TimestampType}
    require(e.foldable,
      s"$name: TIMESTAMP AS OF must be a literal, got $e")
    e.dataType match {
      case TimestampType => e.eval().asInstanceOf[Long] / 1000L
      case StringType =>
        val s = e.eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        val micros = DateTimeUtils.stringToTimestamp(s,
            java.time.ZoneId.of("UTC"))
          .getOrElse(throw new IllegalArgumentException(
            s"$name: cannot parse TIMESTAMP AS OF '$s'"))
        micros / 1000L
      case other => throw new IllegalArgumentException(
        s"$name: TIMESTAMP AS OF must be a timestamp or string " +
          s"literal, got type $other")
    }
  }

  // ------------------------------------------------------------------
  // MERGE INTO translation
  // ------------------------------------------------------------------

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** `MergeIntoTable` → [[GraftMergeCommand]] over
    * [[Warehouse!.mergeInto]]'s clause set. The supported shape is
    * Delta's common core:
    *
    *   - ON: a conjunction of `target.k = source.k` SAME-NAME column
    *     equalities (the join keys);
    *   - WHEN MATCHED [AND c] THEN DELETE (at most one);
    *   - WHEN MATCHED [AND c] THEN UPDATE SET col = expr, ... or SET *
    *     (at most one);
    *   - WHEN NOT MATCHED [AND c] THEN INSERT * — or the explicit
    *     same-name full-row spelling `INSERT (a, b, ...) VALUES
    *     (s.a, s.b, ...)` (at most one);
    *   - WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE and
    *     ... THEN UPDATE SET col = expr, ... (at most one of each) —
    *     conditions and SET values may reference TARGET columns only
    *     (there is no source row on a by-source miss; a source
    *     reference fails at parse).
    *
    * Clause conditions and update values follow the Warehouse scoping
    * contract: target columns by plain name, source columns as
    * `src_<name>` (keys stay plain — they're equal on a match).
    * Unsupported shapes (cross-named keys, computed inserts) fail AT
    * PARSE with a message naming the limit — never a silently
    * different semantics.
    */
  private def translateMerge(spark: SparkSession, m: MergeIntoTable,
      wh: Warehouse, table: String, targetQuals: Set[String]): LogicalPlan = {
    require(!m.schemaEvolutionEnabled,
      s"MERGE INTO $table: WITH SCHEMA EVOLUTION is unsupported " +
        "(evolve explicitly via Warehouse.addColumn)")
    val schema = wh.tables(table)
    val parts = wh.partitioning(table)

    val srcQuals: Set[String] = m.sourceTable match {
      case SubqueryAlias(id, child) => Set(id.name.toLowerCase) ++ (child match {
        case r: UnresolvedRelation => Set(r.multipartIdentifier.last.toLowerCase)
        case _ => Set.empty[String]
      })
      case r: UnresolvedRelation => Set(r.multipartIdentifier.last.toLowerCase)
      case _ => Set.empty[String]
    }

    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute)
          if a.nameParts.last.equalsIgnoreCase(b.nameParts.last) =>
        schema.fieldNames.find(_.equalsIgnoreCase(a.nameParts.last))
          .getOrElse(throw new IllegalArgumentException(
            s"MERGE INTO $table: ON column ${a.nameParts.last} not in schema"))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO $table: ON must be a conjunction of same-named " +
          s"target.k = source.k equalities, got ${other.sql}")
    }
    val keySet = keys.map(_.toLowerCase).toSet

    // matched-clause scoping: target plain, source src_<c> (keys plain)
    def matchedExpr(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute =>
        val col = a.nameParts.last
        val srcName =
          if (keySet.contains(col.toLowerCase)) col else s"src_$col"
        if (a.nameParts.size == 2) {
          val q = a.nameParts.head.toLowerCase
          if (targetQuals.contains(q)) UnresolvedAttribute(Seq(col))
          else if (srcQuals.contains(q)) UnresolvedAttribute(Seq(srcName))
          else a
        } else if (a.nameParts.size == 1) {
          if (schema.fieldNames.exists(_.equalsIgnoreCase(col))) a
          else UnresolvedAttribute(Seq(srcName))
        } else a
    }
    // insert-clause scoping: source columns by PLAIN name (the anti-join
    // branch runs on the raw source); target references are meaningless
    def insertExpr(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.size == 2 =>
        val q = a.nameParts.head.toLowerCase
        if (srcQuals.contains(q)) UnresolvedAttribute(Seq(a.nameParts.last))
        else if (targetQuals.contains(q))
          throw new IllegalArgumentException(
            s"MERGE INTO $table: WHEN NOT MATCHED sees only source " +
              s"columns, got target reference ${a.sql}")
        else a
    }

    val toCol: Expression => org.apache.spark.sql.Column = GraftBridge.toColumn
    var matchedDelete: Option[org.apache.spark.sql.Column] = None
    var matchedUpdate: Option[(Option[org.apache.spark.sql.Column],
      Map[String, org.apache.spark.sql.Column])] = None
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        require(matchedDelete.isEmpty,
          s"MERGE INTO $table: at most one WHEN MATCHED ... DELETE")
        matchedDelete = Some(toCol(cond.map(matchedExpr)
          .getOrElse(Literal.TrueLiteral)))
      case UpdateAction(cond, assignments, _) =>
        require(matchedUpdate.isEmpty,
          s"MERGE INTO $table: at most one WHEN MATCHED ... UPDATE")
        val set = assignments.map { case Assignment(key, value) =>
          columnName(schema.fieldNames, key, targetQuals,
            s"MERGE INTO $table UPDATE") -> toCol(matchedExpr(value))
        }.toMap
        matchedUpdate = Some((cond.map(c => toCol(matchedExpr(c))), set))
      case UpdateStarAction(cond) =>
        require(matchedUpdate.isEmpty,
          s"MERGE INTO $table: at most one WHEN MATCHED ... UPDATE")
        // SET * = every non-key, non-partition column from the source
        // (keys are equal on a match; partition columns are immutable
        // by the merge contract — and equal anyway, being key-derived)
        val set = schema.fieldNames.toSeq
          .filterNot(c => keySet.contains(c.toLowerCase) || parts.contains(c))
          .map(c => c -> toCol(UnresolvedAttribute(Seq(s"src_$c"))))
          .toMap
        matchedUpdate = Some((cond.map(c => toCol(matchedExpr(c))), set))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO $table: unsupported matched action $other")
    }

    var notMatchedInsert: Option[Option[org.apache.spark.sql.Column]] = None
    m.notMatchedActions.foreach {
      case InsertStarAction(cond) =>
        require(notMatchedInsert.isEmpty,
          s"MERGE INTO $table: at most one WHEN NOT MATCHED ... INSERT")
        notMatchedInsert = Some(cond.map(c => toCol(insertExpr(c))))
      case InsertAction(cond, assignments) =>
        require(notMatchedInsert.isEmpty,
          s"MERGE INTO $table: at most one WHEN NOT MATCHED ... INSERT")
        // the warehouse inserts whole source rows; the explicit column
        // form is accepted exactly when it spells INSERT * out
        assignments.foreach { case Assignment(key, value) =>
          val k = columnName(schema.fieldNames, key, targetQuals,
            s"MERGE INTO $table INSERT")
          val vn = value match {
            case a: UnresolvedAttribute => a.nameParts.last
            case other => throw new IllegalArgumentException(
              s"MERGE INTO $table: INSERT values must be bare source " +
                s"columns (same-name full row), got ${other.sql}")
          }
          require(k.equalsIgnoreCase(vn),
            s"MERGE INTO $table: INSERT must map each column to the " +
              s"same-named source column (got $k <- $vn); computed " +
              "inserts are unsupported — project the source instead")
        }
        val assigned = assignments.map(a =>
          columnName(schema.fieldNames, a.key, targetQuals, "")).toSet
        require(schema.fieldNames.forall(assigned.contains),
          s"MERGE INTO $table: INSERT must assign every table column " +
            s"(missing ${schema.fieldNames.filterNot(assigned.contains).mkString(", ")})")
        notMatchedInsert = Some(cond.map(c => toCol(insertExpr(c))))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO $table: unsupported not-matched action $other")
    }

    // by-source scoping: TARGET columns only (plain or target-qualified);
    // any source reference is meaningless — there is no source row
    def bySourceExpr(e: Expression): Expression = e.transformUp {
      case a: UnresolvedAttribute =>
        val c = a.nameParts.last
        if (a.nameParts.size == 2) {
          val q = a.nameParts.head.toLowerCase
          if (targetQuals.contains(q)) UnresolvedAttribute(Seq(c))
          else if (srcQuals.contains(q)) throw new IllegalArgumentException(
            s"MERGE INTO $table: WHEN NOT MATCHED BY SOURCE sees only " +
              s"target columns, got source reference ${a.sql}")
          else a
        } else {
          require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
            s"MERGE INTO $table: WHEN NOT MATCHED BY SOURCE sees only " +
              s"target columns, got $c (not in the table schema)")
          a
        }
    }
    var bySourceDelete: Option[org.apache.spark.sql.Column] = None
    var bySourceUpdate: Option[(Option[org.apache.spark.sql.Column],
      Map[String, org.apache.spark.sql.Column])] = None
    m.notMatchedBySourceActions.foreach {
      case DeleteAction(cond) =>
        require(bySourceDelete.isEmpty,
          s"MERGE INTO $table: at most one WHEN NOT MATCHED BY SOURCE " +
            "... DELETE")
        bySourceDelete = Some(toCol(cond.map(bySourceExpr)
          .getOrElse(Literal.TrueLiteral)))
      case UpdateAction(cond, assignments, _) =>
        require(bySourceUpdate.isEmpty,
          s"MERGE INTO $table: at most one WHEN NOT MATCHED BY SOURCE " +
            "... UPDATE")
        val set = assignments.map { case Assignment(key, value) =>
          columnName(schema.fieldNames, key, targetQuals,
            s"MERGE INTO $table BY SOURCE UPDATE") -> toCol(bySourceExpr(value))
        }.toMap
        bySourceUpdate = Some((cond.map(c => toCol(bySourceExpr(c))), set))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO $table: unsupported not-matched-by-source action " +
          s"$other (UPDATE SET * has no meaning without a source row)")
    }

    GraftMergeCommand(wh, table, rewriteReads(spark, m.sourceTable), keys,
      matchedDelete, matchedUpdate, notMatchedInsert,
      bySourceDelete, bySourceUpdate)
  }
}

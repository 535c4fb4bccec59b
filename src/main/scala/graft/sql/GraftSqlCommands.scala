package graft.sql

import org.apache.spark.sql.{Column, GraftBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

import graft.pipeline.Warehouse

/** The RunnableCommand plans [[WarehouseSql]]'s parse-time routing emits
  * — the same execution shape as Delta's command plans: parsing/planning
  * is side-effect free, the warehouse mutation happens when Spark
  * executes the command (eagerly on `spark.sql(...)` for commands), and
  * row-count results surface as the command's result rows.
  *
  * Source/condition fields hold PARSE-time state on purpose: they are
  * constructor data, not children, so the analyzer leaves them alone,
  * and `run` resolves them against the execution-time snapshot — a
  * lifecycle of statements against the same table each sees the
  * previous statement's commit. Conditions/values ride as [[Column]]s
  * (not bare Expressions): Expression-typed product fields of a command
  * are visible to CheckAnalysis, which would reject their unresolved
  * attributes before run() ever got to resolve them against the table.
  */
object GraftSqlCommands // scaladoc anchor

/** `DELETE FROM wh_t WHERE ...` → [[Warehouse!.delete]] (copy-on-write,
  * the default), or [[Warehouse!.deleteVectored]] (merge-on-read
  * deletion vectors — the thin-delete path) when the session sets
  * `spark.graft.delete.mode=dv`. The mode is read at EXECUTION, so one
  * session can flip per statement.
  */
case class GraftDeleteCommand(wh: Warehouse, table: String,
    cond: Column) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    spark.conf.get("spark.graft.delete.mode", "cow") match {
      case "dv" => Seq(Row(wh.deleteVectored(table, cond)))
      case "cow" => Seq(Row(wh.delete(table, cond)))
      case other => throw new IllegalArgumentException(
        s"spark.graft.delete.mode must be 'cow' or 'dv', got '$other'")
    }
}

/** `UPDATE wh_t SET c = e, ... [WHERE ...]` → [[Warehouse!.update]]
  * (copy-on-write, the default) or [[Warehouse!.updateVectored]]
  * (merge-on-read: vector old rows + append new versions) when the
  * session sets `spark.graft.update.mode=dv`; read at execution.
  */
case class GraftUpdateCommand(wh: Warehouse, table: String,
    cond: Column, set: Map[String, Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_affected_rows", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    spark.conf.get("spark.graft.update.mode", "cow") match {
      case "dv" => Seq(Row(wh.updateVectored(table, cond, set)))
      case "cow" => Seq(Row(wh.update(table, cond, set)))
      case other => throw new IllegalArgumentException(
        s"spark.graft.update.mode must be 'cow' or 'dv', got '$other'")
    }
}

/** `MERGE INTO wh_t USING src ON ... WHEN ...` →
  * [[Warehouse!.mergeInto]]. The source plan resolves at execution, so
  * it reads whatever its relations hold THEN (including other warehouse
  * tables routed through the manifest).
  */
case class GraftMergeCommand(wh: Warehouse, table: String,
    source: LogicalPlan, keys: Seq[String],
    matchedDelete: Option[Column],
    matchedUpdate: Option[(Option[Column], Map[String, Column])],
    notMatchedInsert: Option[Option[Column]],
    bySourceDelete: Option[Column] = None,
    bySourceUpdate: Option[(Option[Column], Map[String, Column])] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.mergeInto(table, GraftBridge.ofRows(spark, source), keys,
      matchedDelete, matchedUpdate, notMatchedInsert,
      bySourceDelete, bySourceUpdate)
    Seq.empty
  }
}

/** `INSERT INTO wh_t [(cols)] SELECT ...` → [[Warehouse!.append]].
  * Bare form maps the query's columns POSITIONALLY onto the table
  * schema (SQL INSERT semantics); an explicit column list must cover
  * every table column (appended files carry full rows); `BY NAME`
  * matches by name. Values are cast to the declared column types —
  * non-ANSI, so unconvertible values null out like every other
  * reference-semantics cast.
  */
case class GraftAppendCommand(wh: Warehouse, table: String,
    userCols: Seq[String], query: LogicalPlan, byName: Boolean,
    overwrite: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftBridge.ofRows(spark, query)
    val schema = wh.tables(table)
    // GENERATED columns may be omitted everywhere — append derives
    // them; an IDENTITY column MUST be omitted — append assigns it
    val gen = wh.tableSpec(table).generated
    val auto = gen.keySet ++ wh.tableSpec(table).identity.map(_.column) ++
      wh.tableSpec(table).defaults.keySet
    val named =
      if (byName) df
      else if (userCols.nonEmpty) {
        require(userCols.size == df.columns.length,
          s"INSERT INTO $table: ${userCols.size} target columns but " +
            s"${df.columns.length} query columns")
        val missing = schema.fieldNames
          .filterNot(c => userCols.exists(_.equalsIgnoreCase(c)) ||
            auto.contains(c))
        require(missing.isEmpty,
          s"INSERT INTO $table: column list must cover the full schema " +
            s"(missing ${missing.mkString(", ")}); appended files carry " +
            "whole rows")
        df.toDF(userCols: _*)
      } else {
        val noAuto = schema.fieldNames.filterNot(auto.contains)
        require(df.columns.length == schema.size ||
            df.columns.length == noAuto.length,
          s"INSERT INTO $table: expected ${schema.size} columns " +
            (if (auto.nonEmpty) s"(or ${noAuto.length} with the " +
              s"engine-supplied columns ${auto.mkString(", ")} omitted) "
            else "") +
            s"positionally, got ${df.columns.length}")
        df.toDF((if (df.columns.length == schema.size) schema.fieldNames
          else noAuto).toIndexedSeq: _*)
      }
    val casted = named.select(named.columns.toSeq.map(c =>
      col(c).cast(schema(c).dataType).as(c)): _*)
    if (overwrite) wh.overwrite(table, casted)
    else wh.append(table, casted)
    Seq.empty
  }
}

/** A no-output warehouse DDL action (ADD UNIQUE / ADD FOREIGN KEY /
  * SET|DROP DEFAULT — the validate-then-persist spec mutations that
  * need no dedicated result shape). Runs on the driver like every
  * RunnableCommand.
  */
case class GraftDdlCommand(action: () => Unit)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    action(); Seq.empty
  }
}

/** `ALTER TABLE wh_t ALTER COLUMN c TYPE t` →
  * [[Warehouse!.alterColumnType]] — metadata-only exact type widening
  * (no file rewrite; the parquet scan upcasts old narrow files).
  */
case class GraftAlterColumnTypeCommand(wh: Warehouse, table: String,
    column: String, to: org.apache.spark.sql.types.DataType)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.alterColumnType(table, column, to)
    Seq.empty
  }
}

/** `ALTER TABLE wh_t SET PARTITIONED BY (c, ...)` →
  * [[Warehouse!.repartitionTable]] — one-commit partition layout
  * migration (an explicit rewrite; `()` migrates to a flat layout).
  * Returns the rows rewritten.
  */
case class GraftRepartitionCommand(wh: Warehouse, table: String,
    partitionBy: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("rows_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(wh.repartitionTable(table, partitionBy)))
}

/** `DESCRIBE HISTORY wh_t` → [[Warehouse!.history]]: one row per
  * committed version, ascending — version, operation, and the remaining
  * commit metadata as sorted `k=v` pairs.
  */
case class GraftHistoryCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("operation", StringType)(),
    AttributeReference("details", StringType)())
  override def run(spark: SparkSession): Seq[Row] =
    wh.history(table).map { case (v, meta) =>
      Row(v, meta.getOrElse("op", null),
        meta.view.filterKeys(_ != "op").toSeq.sortBy(_._1)
          .map { case (k, value) => s"$k=$value" }.mkString(","))
    }
}

/** `RESTORE [TABLE] wh_t [TO] VERSION AS OF n` → [[Warehouse!.restore]]. */
case class GraftRestoreCommand(wh: Warehouse, table: String, version: Long)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.restore(table, version)
    Seq.empty
  }
}

/** `ALTER TABLE wh_t CREATE TAG <tag> [AS OF VERSION n]` →
  * [[Warehouse!.createTag]]: an immutable named version label that
  * [[Warehouse!.vacuum]] pins (the Iceberg tag semantics); read it
  * with `VERSION AS OF '<tag>'`.
  */
case class GraftCreateTagCommand(wh: Warehouse, table: String,
    tag: String, version: Option[Long]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(tag, wh.createTag(table, tag, version.getOrElse(-1L))))
}

/** `ALTER TABLE wh_t DROP TAG <tag>` → [[Warehouse!.dropTag]]. */
case class GraftDropTagCommand(wh: Warehouse, table: String, tag: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.dropTag(table, tag)
    Seq.empty
  }
}

/** `SHOW TAGS wh_t`: one (tag, version) row per tag, sorted by name. */
case class GraftShowTagsCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("tag", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    wh.tags(table).toSeq.sortBy(_._1).map { case (t, v) => Row(t, v) }
}

/** `SHOW STATS wh_t`: the column statistics the OPTIMIZER actually
  * sees for a head read, one row per stat-bearing column — extracted
  * from the read path's own published `CatalogStatistics` (manifest
  * NDV/min-max, ANALYZE histogram basis, drift guard and all), so
  * what this prints is by construction what CBO plans with, never a
  * re-derivation that could disagree. Zero data read.
  */
case class GraftShowStatsCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("distinct_count", LongType)(),
    AttributeReference("min", StringType)(),
    AttributeReference("max", StringType)(),
    AttributeReference("null_count", LongType)(),
    AttributeReference("histogram_bins", LongType)(),
    AttributeReference("histogram_height", DoubleType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val rel = wh.read(table).queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.catalogTable.exists(_.stats.isDefined) => l
    }
    val colStats = rel.flatMap(_.catalogTable).flatMap(_.stats)
      .map(_.colStats).getOrElse(Map.empty)
    colStats.toSeq.sortBy(_._1).map { case (c, cs) =>
      Row(c,
        cs.distinctCount.map(_.toLong).orNull,
        cs.min.orNull, cs.max.orNull,
        cs.nullCount.map(_.toLong).orNull,
        cs.histogram.map(_.bins.length.toLong).orNull,
        cs.histogram.map(_.height).orNull)
    }
  }
}

/** `SHOW FILES wh_t`: the HEAD manifest's file inventory, one row per
  * live entry — path, bytes, footer row count, deletion-vector rows,
  * and the encoded footer stats ("col=[lo,hi];...") — pure driver-side
  * metadata (no listing, no data read), the Iceberg `files` metadata
  * table's job.
  */
case class GraftShowFilesCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("file", StringType, nullable = false)(),
    AttributeReference("bytes", LongType, nullable = false)(),
    AttributeReference("row_count", LongType)(), // null for pre-count files
    AttributeReference("dv_rows", LongType, nullable = false)(),
    AttributeReference("stats", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (_, entries) = wh.loadLatest(table)
    entries.sortBy(_.rel).map { e =>
      Row(e.rel, e.bytes,
        if (e.rows < 0L) null else Long.box(e.rows),
        e.dvRows,
        e.stats.toSeq.sortBy(_._1)
          .map { case (c, (lo, hi)) => s"$c=[$lo,$hi]" }.mkString(";"))
    }
  }
}

/** `PUBLISH TABLE wh_stage TO wh_t [WITH REBASE]` →
  * [[Warehouse!.publish]]: the write-audit-publish fast-forward — one
  * commit flips the target to the audited staging clone's state
  * (metadata only, borrow-guarded). WITH REBASE additionally merges
  * over interim blind appends to the target (Iceberg's WAP
  * cherry-pick), constraint-probed — see the publish doc.
  */
case class GraftPublishCommand(wh: Warehouse, dst: String,
    staging: String, rebase: Boolean = false) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(wh.publish(dst, staging, rebase)))
}

/** `REFRESH FINGERPRINT wh_t [COLUMNS (a, b, ...)]` →
  * [[graft.ext.FingerprintStore]].refresh: bring the incrementally
  * maintained content fingerprint to the table's head and return it.
  * Default column set = the full schema in spec order.
  */
case class GraftRefreshFingerprintCommand(wh: Warehouse, table: String,
    cols: Seq[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("fingerprint", LongType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val use = if (cols.nonEmpty) cols
      else wh.tables(table).fieldNames.toSeq
    val (fp, v) = graft.ext.FingerprintStore.refresh(wh, table, use)
    Seq(Row(fp, v))
  }
}

/** `CREATE TABLE [IF NOT EXISTS] <prefix><t> (...)` →
  * [[Warehouse!.createTable]], then re-registration so the new name
  * routes for every following statement of the lifecycle. PK columns
  * are ENFORCED (the spec's `primaryKey`) and additionally ride as
  * `pk=` commit metadata (DESCRIBE HISTORY shows them);
  * `created=false` is the IF NOT EXISTS no-op.
  */
case class GraftCreateTableCommand(wh: Warehouse, table: String,
    spec: Warehouse.TableSpec, ifNotExists: Boolean, pk: Seq[String],
    prefix: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("created",
      org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val created = wh.createTable(table, spec, ifNotExists,
      if (pk.isEmpty) Map.empty else Map("pk" -> pk.mkString(",")))
    WarehouseSql.register(spark, wh, prefix)
    WarehouseSql.rerouteAll(wh) // other sessions see the new name too
    Seq(Row(created))
  }
}

/** `CREATE TABLE [IF NOT EXISTS] <prefix><t> AS SELECT ...` (CTAS):
  * [[Warehouse!.createTable]] with the SELECT's analyzed schema
  * (nullable columns — parquet-backed tables make no narrower promise)
  * AND the SELECT's rows as the table's ATOMIC v1 commit (create +
  * first load in one manifest — a crash mid-CTAS leaves no committed
  * table, so a re-run reloads instead of silently skipping), then
  * re-registration. IF NOT EXISTS on an existing table skips BOTH the
  * create and the load (the SQL-standard no-op, like the DDL form).
  */
case class GraftCtasCommand(wh: Warehouse, table: String,
    query: LogicalPlan, ifNotExists: Boolean, prefix: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("created",
      org.apache.spark.sql.types.BooleanType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val df = GraftBridge.ofRows(spark, query)
    val schema = org.apache.spark.sql.types.StructType(
      df.schema.fields.map(_.copy(nullable = true)))
    val created = wh.createTable(table, Warehouse.TableSpec(schema),
      ifNotExists, initial = Some(df))
    WarehouseSql.register(spark, wh, prefix)
    WarehouseSql.rerouteAll(wh) // other sessions see the new name too
    Seq(Row(created))
  }
}

/** `CREATE TABLE <p><dst> SHALLOW|DEEP CLONE <p><src> [VERSION AS OF
  * n]` → [[Warehouse!.shallowClone]] / [[Warehouse!.deepClone]], then
  * route the new name so the clone is immediately addressable by
  * statements.
  */
case class GraftCloneCommand(wh: Warehouse, dst: String, src: String,
    version: Option[Long], prefix: String, deep: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    if (deep) wh.deepClone(src, dst, version)
    else wh.shallowClone(src, dst, version)
    WarehouseSql.register(spark, wh, prefix)
    WarehouseSql.rerouteAll(wh) // other sessions see the clone too
    Nil
  }
}

/** `DROP TABLE [IF EXISTS] wh_t` for a REGISTERED name →
  * [[Warehouse!.dropTable]], then remove the route and its view (the
  * clone workflow's cleanup half: clone, experiment, drop) — in EVERY
  * session registered on this warehouse, not just the executing one,
  * so no session is left holding a route whose reads would fail at
  * scan time. Other tables' routes stay live.
  */
case class GraftDropTableCommand(wh: Warehouse, table: String,
    name: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.dropTable(table)
    WarehouseSql.unroute(spark, name)
    WarehouseSql.unrouteTable(wh, table)
    Nil
  }
}

/** `SHOW WAREHOUSE TABLES` — catalog discovery for the routed surface:
  * every registered SQL name of THIS session with its table, head
  * version, and live file count/bytes straight from the manifest (no
  * filesystem listing — the same sources as DESCRIBE DETAIL, one row
  * per route). The WAREHOUSE keyword keeps Spark's own `SHOW TABLES`
  * (catalog/temp views) untouched. Routes are read at EXECUTION time,
  * so a cached plan re-run reflects registrations made since the parse.
  */
case class GraftShowTablesCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    AttributeReference("size_bytes", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    WarehouseSql.routes(spark).map { case (name, wh, t) =>
      val (v, entries) = wh.loadLatest(t)
      Row(name, t, v, entries.size.toLong, entries.map(_.bytes).sum)
    }
}

/** `DESCRIBE DETAIL wh_t` (the Delta statement): one row of table
  * metadata — current version, live file count/bytes straight from the
  * manifest (no filesystem listing), the declared layout (partitioning,
  * stat/bloom columns, CHECK constraints), and CLONE PROVENANCE:
  * `source_table`/`source_version` from the table's v1 clone commit
  * (null for non-clones), `borrowed_files` = entries of the CURRENT
  * manifest still referencing another table's files by absolute path
  * (0 once a clone is fully localized by compaction), and
  * `borrowed_by` = files of THIS table that other tables' retained
  * manifests still borrow (the clone-guard view: vacuum keeps exactly
  * these alive, and dropTable refuses while any exist).
  */
case class GraftDetailCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("num_files", LongType, nullable = false)(),
    // exact manifest row count; null when any live file predates
    // row-count manifests (see Warehouse.metaRowCount)
    AttributeReference("row_count", LongType)(),
    AttributeReference("size_bytes", LongType, nullable = false)(),
    AttributeReference("partition_columns", StringType)(),
    // "col,col INTO n BUCKETS" for a bucketed layout, else empty
    AttributeReference("bucket_spec", StringType)(),
    AttributeReference("stat_columns", StringType)(),
    AttributeReference("bloom_columns", StringType)(),
    AttributeReference("checks", StringType)(),
    AttributeReference("source_table", StringType)(),
    AttributeReference("source_version", LongType)(),
    AttributeReference("borrowed_files", LongType, nullable = false)(),
    AttributeReference("borrowed_by", LongType, nullable = false)(),
    // merge-on-read state: live files carrying a deletion vector, and
    // the total vectored-away row count (0/0 = fully materialized)
    AttributeReference("deletion_vectors", LongType, nullable = false)(),
    AttributeReference("deleted_rows", LongType, nullable = false)(),
    // ndv-sketched columns and their CURRENT snapshot estimates
    // ("col=approx;..." — empty when none declared / sketches missing)
    AttributeReference("ndv_estimates", StringType)(),
    // ENFORCED primary key columns (empty when none declared)
    AttributeReference("primary_key", StringType)(),
    // ENFORCED referential constraints ("(c)->parent(p); ...")
    AttributeReference("foreign_keys", StringType)(),
    // ENFORCED unique groups ("(a,b); (c)")
    AttributeReference("unique_constraints", StringType)(),
    // GENERATED ALWAYS AS IDENTITY column ("col [ORDER BY ...]")
    AttributeReference("identity_column", StringType)(),
    // DEFAULT fill rules ("col=expr; ...")
    AttributeReference("column_defaults", StringType)(),
    // CLUSTERING HEALTH per stat column ("col=depth;..."): average
    // stabbing depth of the live files' footer-stat intervals — 1.0 =
    // perfectly clustered, |files| = fully decayed (appends degrade
    // it; OPTIMIZE ZORDER restores it; Warehouse.reclusterIfDecayed
    // is the maintenance hook)
    AttributeReference("clustering_depth", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (v, entries) = wh.loadLatest(table)
    val spec = wh.tableSpec(table)
    val v1 = wh.history(table).headOption.map(_._2).getOrElse(Map.empty)
    val (srcTable, srcVersion) =
      if (v1.get("op").contains("clone"))
        (v1.get("sourceTable").orNull,
          v1.get("sourceVersion").map(_.toLong))
      else (null, None)
    val borrowed = entries.count(e =>
      new org.apache.hadoop.fs.Path(e.rel).isAbsolute)
    Seq(Row(table, v, entries.size.toLong,
      wh.metaRowCount(table).map(Long.box).orNull,
      entries.map(_.bytes).sum,
      spec.partitionBy.mkString(","),
      if (spec.numBuckets == 0) ""
      else s"${spec.bucketBy.mkString(",")} INTO ${spec.numBuckets} BUCKETS",
      spec.statColumns.mkString(","),
      spec.bloomColumns.mkString(","),
      spec.checks.toSeq.sortBy(_._1)
        .map { case (n, e) => s"$n: $e" }.mkString("; "),
      srcTable, srcVersion.getOrElse(null),
      borrowed.toLong, wh.borrowedFromBy(table).size.toLong,
      entries.count(e => e.dv.nonEmpty && e.dvRows > 0).toLong,
      entries.map(_.dvRows).sum,
      wh.ndvEstimates(table, entries).toSeq.sorted
        .map { case (c, n) => s"$c=$n" }.mkString(";"),
      spec.primaryKey.mkString(","),
      spec.foreignKeys.map(fk =>
        s"(${fk.cols.mkString(",")})->${fk.parent}" +
          s"(${fk.parentCols.mkString(",")})").mkString("; "),
      spec.unique.map(u => s"(${u.mkString(",")})").mkString("; "),
      spec.identity.map(i => i.column +
        (if (i.orderBy.isEmpty) "" else s" ORDER BY ${i.orderBy.mkString(",")}"))
        .getOrElse(""),
      spec.defaults.toSeq.sortBy(_._1)
        .map { case (c, e) => s"$c=$e" }.mkString("; "),
      graft.pipeline.Warehouse.clusteringDepthOf(entries,
          spec.statColumns).toSeq.sorted
        .map { case (c, d) => f"$c=$d%.2f" }.mkString(";")))
  }
}

/** `COPY INTO wh_t FROM '<dir>' [FILEFORMAT = X] [PATTERN = '<glob>']
  * [FORCE]` → [[Warehouse!.copyInto]]: idempotent bulk file ingest —
  * only files no previous COPY INTO loaded are appended; FORCE reloads
  * everything matched.
  */
case class GraftCopyIntoCommand(wh: Warehouse, table: String,
    srcDir: String, format: String, pattern: String, force: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_files_loaded", LongType, nullable = false)(),
    AttributeReference("num_rows_loaded", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (files, rows) = wh.copyInto(table, srcDir, format, pattern, force)
    Seq(Row(files, rows))
  }
}

/** `SHOW CREATE TABLE wh_t`: one `createtab_stmt` string that RE-CREATES
  * the table's full spec when replayed — a `CREATE TABLE` carrying the
  * schema, PARTITIONED BY, STATS BY, and BLOOM BY [ITEMS/FPP] clauses,
  * followed by one `ALTER TABLE ... ADD CONSTRAINT` per CHECK (";"-
  * separated). Everything derives from the live `_meta/` spec, so the
  * statement is always current (schema evolution and constraint DDL
  * included).
  */
case class GraftShowCreateCommand(wh: Warehouse, table: String,
    sqlName: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("createtab_stmt", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val spec = wh.tableSpec(table)
    val colDefs = spec.schema.fields
      .map(f => s"  ${f.name} ${f.dataType.sql}" +
        spec.generated.get(f.name)
          .map(e => s" GENERATED ALWAYS AS ($e)").getOrElse("") +
        spec.identity.filter(_.column == f.name).map { idn =>
          val opts = (if (idn.start == 1L) Nil
            else Seq(s"START WITH ${idn.start}")) ++
            (if (idn.orderBy.isEmpty) Nil
            else Seq(s"ORDER BY ${idn.orderBy.mkString(", ")}"))
          " GENERATED ALWAYS AS IDENTITY" +
            (if (opts.isEmpty) "" else opts.mkString(" (", " ", ")"))
        }.getOrElse("") +
        spec.defaults.get(f.name).map(e => s" DEFAULT $e").getOrElse(""))
    val cols = (colDefs ++ (if (spec.primaryKey.isEmpty) Nil
      else Seq(s"  PRIMARY KEY (${spec.primaryKey.mkString(", ")})"))
      ++ spec.unique.map(u => s"  UNIQUE (${u.mkString(", ")})")
      ++ spec.foreignKeys.map(fk =>
        s"  FOREIGN KEY (${fk.cols.mkString(", ")}) REFERENCES " +
          s"${fk.parent} (${fk.parentCols.mkString(", ")})"))
      .mkString(",\n")
    val clauses = Seq(
      if (spec.partitionBy.isEmpty) ""
      else s" PARTITIONED BY (${spec.partitionBy.mkString(", ")})",
      if (spec.numBuckets == 0) ""
      else s" CLUSTERED BY (${spec.bucketBy.mkString(", ")})" +
        s" INTO ${spec.numBuckets} BUCKETS",
      if (spec.statColumns.isEmpty) ""
      else s" STATS BY (${spec.statColumns.mkString(", ")})",
      if (spec.bloomColumns.isEmpty) ""
      else s" BLOOM BY (${spec.bloomColumns.mkString(", ")})" +
        s" ITEMS ${spec.bloomExpectedItems} FPP ${spec.bloomFpp}"
    ).mkString
    val create = s"CREATE TABLE $sqlName (\n$cols\n)$clauses"
    val alters = spec.checks.toSeq.sortBy(_._1).map { case (n, e) =>
      s"ALTER TABLE $sqlName ADD CONSTRAINT $n CHECK ($e)" }
    Seq(Row((create +: alters).mkString(";\n")))
  }
}

/** `ALTER TABLE wh_t ADD COLUMN c type` → [[Warehouse!.addColumn]]
  * (nullable — existing files carry no values for it, the schema-
  * evolution contract).
  */
case class GraftAddColumnCommand(wh: Warehouse, table: String,
    field: org.apache.spark.sql.types.StructField)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.addColumn(table, field)
    Seq.empty
  }
}

/** `ALTER TABLE wh_t RENAME COLUMN a TO b` → [[Warehouse!.renameColumn]]
  * (pure metadata — no data rewrite; restricted to plain columns).
  */
case class GraftRenameColumnCommand(wh: Warehouse, table: String,
    oldName: String, newName: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.renameColumn(table, oldName, newName)
    Seq.empty
  }
}

/** `ALTER TABLE wh_t DROP COLUMN c` → [[Warehouse!.dropColumn]] (pure
  * metadata; the physical column is retired, never rewritten).
  */
case class GraftDropColumnCommand(wh: Warehouse, table: String,
    colName: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.dropColumn(table, colName)
    Seq.empty
  }
}

/** `TRUNCATE TABLE wh_t` → [[Warehouse!.truncate]]: one empty-manifest
  * commit; replaced files follow retention.
  */
case class GraftTruncateCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    wh.truncate(table)
    Seq.empty
  }
}

/** `ALTER TABLE wh_t ADD CONSTRAINT n CHECK (expr)` →
  * [[Warehouse!.addCheck]] (expr = Some); `... DROP CONSTRAINT n` →
  * [[Warehouse!.dropCheck]] (expr = None).
  */
case class GraftCheckCommand(wh: Warehouse, table: String,
    check: String, expr: Option[String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    expr match {
      case Some(e) => wh.addCheck(table, check, e)
      case None => wh.dropCheck(table, check)
    }
    Seq.empty
  }
}

/** `OPTIMIZE wh_t [WHERE <partition predicate>] [ZORDER BY (c, ...)]`
  * → [[Warehouse!.optimize]]: compaction, optionally scoped to the
  * partition dirs matching WHERE (the Delta statement — at 100 TB you
  * compact yesterday's partition, never the table) and optionally
  * clustered by the engine-normalized z-order key over the named
  * columns. A WHERE touching a non-partition column fails analysis.
  */
case class GraftOptimizeCommand(wh: Warehouse, table: String,
    zorderBy: Seq[String], whereSql: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("partitions_rewritten", LongType, nullable = false)(),
    AttributeReference("files_before", LongType, nullable = false)(),
    AttributeReference("files_after", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (p, before, after) = wh.optimize(table, zorderBy,
      partitionWhere = whereSql.map(org.apache.spark.sql.functions.expr))
    Seq(Row(p.toLong, before, after))
  }
}

/** `ANALYZE TABLE wh_t COMPUTE STATISTICS` →
  * [[Warehouse!.backfillSidecars]]: build the missing per-file
  * bloom/ndv sidecars for the current snapshot and report the
  * resulting column NDV estimates. Row counts and min/max need no
  * ANALYZE (the manifest always carries them); this statement exists
  * for tables whose files PREDATE an index-column declaration — after
  * it, every declared statistic is live.
  */
case class GraftAnalyzeCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_backfilled", LongType, nullable = false)(),
    AttributeReference("ndv_estimates", StringType)())
  override def run(spark: SparkSession): Seq[Row] = {
    val n = wh.backfillSidecars(table)
    val est = wh.ndvEstimates(table, wh.loadLatest(table)._2)
      .toSeq.sorted.map { case (c, v) => s"$c=$v" }.mkString(";")
    Seq(Row(n, est))
  }
}

/** `ANALYZE TABLE wh_t COMPUTE STATISTICS FOR COLUMNS (a, b)` /
  * `... FOR ALL COLUMNS`, optionally `WITH n BINS` (default 64) →
  * [[Warehouse!.analyzeColumns]]: build equi-height histograms (two
  * distributed passes, all columns per pass) and persist them as the
  * table's CBO basis — range-predicate and join estimates then follow
  * the data's actual shape instead of the uniform assumption. One row
  * per column built.
  */
case class GraftAnalyzeColumnsCommand(wh: Warehouse, table: String,
    cols: Seq[String], numBins: Option[Int] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("column", StringType, nullable = false)(),
    AttributeReference("bins", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    wh.analyzeColumns(table, cols, numBins.getOrElse(64))
      .toSeq.sortBy(_._1).map { case (c, b) => Row(c, b) }
}

/** `REORG TABLE wh_t APPLY (PURGE)` → [[Warehouse!.purgeVectors]]:
  * rewrite only the files carrying deletion vectors, dropping the
  * merge-on-read state (the Delta statement, verbatim).
  */
case class GraftReorgPurgeCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("files_rewritten", LongType, nullable = false)(),
    AttributeReference("rows_purged", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (files, rows) = wh.purgeVectors(table)
    Seq(Row(files.toLong, rows))
  }
}

/** `VACUUM wh_t [RETAIN n VERSIONS]` → [[Warehouse!.vacuum]]. */
case class GraftVacuumCommand(wh: Warehouse, table: String, keep: Int,
    dryRun: Boolean = false)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("num_files_deleted", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(wh.vacuum(table, keep, dryRun)))
}

/** `RESTORE [TABLE] wh_t [TO] TIMESTAMP AS OF '<ts>'` →
  * [[Warehouse!.restore]] of [[Warehouse!.versionAt]] (the newest
  * version committed at or before the timestamp).
  */
case class GraftRestoreTsCommand(wh: Warehouse, table: String, ts: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val micros = DateTimeUtils.stringToTimestamp(
      org.apache.spark.unsafe.types.UTF8String.fromString(ts),
      java.time.ZoneId.of("UTC")).getOrElse(
      throw new IllegalArgumentException(
        s"RESTORE $table: cannot parse TIMESTAMP AS OF '$ts'"))
    wh.restore(table, wh.versionAt(table, micros / 1000L))
    Seq.empty
  }
}

/** `FSCK TABLE wh_t` → [[Warehouse!.fsck]]: read-only manifest ↔
  * filesystem audit, one row per finding (empty result = healthy).
  */
case class GraftFsckCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("severity", StringType, nullable = false)(),
    AttributeReference("issue", StringType, nullable = false)(),
    AttributeReference("detail", StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    wh.fsck(table).map { case (s, i, d) => Row(s, i, d) }
}

/** `FSCK REPAIR TABLE wh_t` → [[Warehouse!.repairTable]]: commit a
  * manifest dropping entries whose data files are gone (explicit
  * data-loss acknowledgement) and clearing vector refs whose sidecars
  * vanished (conservative: vectored rows resurface, none are lost).
  */
case class GraftFsckRepairCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("num_entries_dropped", LongType, nullable = false)(),
    AttributeReference("num_vectors_cleared", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (d, c) = wh.repairTable(table)
    Seq(Row(d, c))
  }
}

/** `CREATE MATERIALIZED VIEW <prefix><v> AS SELECT ... FROM <prefix><s>
  * GROUP BY ...` → [[graft.pipeline.MaterializedView.define]] + first
  * [[graft.pipeline.MaterializedView.refresh]]. The view's SQL name
  * routes like any table, but reads resolve to the view CONTENTS
  * (see [[WarehouseSql.rewriteReads]]).
  */
case class GraftCreateMvCommand(wh: Warehouse,
    vd: graft.pipeline.MaterializedView.ViewDef, prefix: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("source_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    graft.pipeline.MaterializedView.define(wh, vd)
    val v = graft.pipeline.MaterializedView.refresh(wh, vd)
    WarehouseSql.cacheMvDef(wh, vd)
    WarehouseSql.register(spark, wh, prefix)
    WarehouseSql.rerouteAll(wh) // other sessions see the view too
    Seq(Row(vd.view, v))
  }
}

/** `REFRESH MATERIALIZED VIEW wh_v` →
  * [[graft.pipeline.MaterializedView.refresh]] under the view's
  * persisted definition (recovered from the state table's own history
  * in a fresh session). Reports the source version now reflected.
  */
case class GraftRefreshMvCommand(wh: Warehouse, table: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)(),
    AttributeReference("source_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val vd = WarehouseSql.mvDefFor(wh, table).getOrElse(
      throw new IllegalArgumentException(
        s"REFRESH MATERIALIZED VIEW: $table is not a materialized view"))
    Seq(Row(table, graft.pipeline.MaterializedView.refresh(wh, vd)))
  }
}

/** `DROP MATERIALIZED VIEW IF EXISTS <unknown>` — nothing to do, but
  * the statement must still parse to a plan.
  */
case class GraftNoopCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = Nil
}

/** `SHOW MATERIALIZED VIEWS`: every routed name of this session that IS
  * a materialized view, with its definition and freshness — `fresh` is
  * the MV auto-rewrite eligibility bit (watermark == source head).
  */
case class GraftShowMvsCommand() extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("name", StringType, nullable = false)(),
    AttributeReference("source", StringType, nullable = false)(),
    AttributeReference("group_by", StringType, nullable = false)(),
    AttributeReference("aggs", StringType, nullable = false)(),
    AttributeReference("indexed_version", LongType, nullable = true)(),
    AttributeReference("source_version", LongType, nullable = false)(),
    AttributeReference("fresh", org.apache.spark.sql.types.BooleanType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    import graft.pipeline.{MaterializedView => MV}
    WarehouseSql.routes(spark).flatMap { case (name, wh, t) =>
      WarehouseSql.mvDefFor(wh, t).map { vd =>
        val head = wh.versions(vd.src).max
        val at = MV.viewedVersion(wh, vd)
        Row(name, vd.src, vd.groupBy.mkString(","),
          vd.aggs.map {
            case MV.Count(o) => s"count(*) AS $o"
            case MV.Sum(i, o) => s"sum($i) AS $o"
            case MV.Avg(i, o) => s"avg($i) AS $o"
            case MV.Min(i, o) => s"min($i) AS $o"
            case MV.Max(i, o) => s"max($i) AS $o"
          }.mkString(", "),
          at.map(Long.box).orNull, head, at.contains(head))
      }
    }
  }
}

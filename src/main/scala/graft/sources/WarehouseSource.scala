package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{
  LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.pipeline.Warehouse

/** STREAMING SOURCE over the warehouse's versioned manifest — the
  * Delta-CDF shape: the stream offset IS the manifest version, and each
  * micro-batch is the file-set diff between two committed versions,
  * read through the same [[graft.pipeline.ManifestFileIndex]] plan as
  * any batch read (full parquet machinery, column pruning, stat
  * skipping — nothing bespoke in the row path).
  *
  *   spark.readStream.format("graft-warehouse")
  *     .option("path", warehouseDir).option("table", "fact_telemetry")
  *     .load()
  *
  * Semantics: an APPEND-ONLY row stream. The first batch is the full
  * snapshot at the then-latest version (classic backfill-then-follow;
  * `.option("startingVersion", v)` follows from `v` instead, skipping
  * the snapshot). `.option("maxVersionsPerTrigger", n)` rate-limits
  * the follow phase to n manifest versions per micro-batch — bounded
  * catch-up batches instead of one backlog-sized batch. Manifest set-diff gives exactly-once delivery for
  * pure appends — and absorbs write-side compaction mid-stream for
  * free: a file added at v2 and compacted away by v4 is absent from
  * the v4 diff while its compacted REPLACEMENT is present, so rows
  * arrive once either way. A MERGE rewrites whole partitions, so its
  * batch re-emits the touched partitions' surviving rows (at-least-
  * once across upserts — the retraction-exact alternative is the
  * batch [[Warehouse.readChangeFeed]]); downstream dedup/idempotent
  * sinks are the standard CDC answer. Open the warehouse with
  * `retainReplaced=true` (or vacuum conservatively) while streams are
  * live, so a checkpointed reader can still read files a later rewrite
  * replaced.
  *
  * Built on the v1 `Source` contract (`getOffset`/`getBatch`) — the
  * contract Delta's own streaming source uses — because getBatch may
  * return an arbitrarily-planned DataFrame: the manifest diff IS the
  * batch plan.
  */
class WarehouseSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with org.apache.spark.sql.sources.RelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-warehouse"

  /** STREAMING SINK — `df.writeStream.format("graft-warehouse")`; see
    * [[WarehouseStreamSink]] for the exactly-once txn fence.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val mergeKeys = parameters.get("mergeKeys").toSeq
      .flatMap(_.split(",").toSeq).map(_.trim).filter(_.nonEmpty)
    val update = outputMode == org.apache.spark.sql.streaming.OutputMode.Update()
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append()
        || (update && mergeKeys.nonEmpty),
      s"graft-warehouse sink: Append mode (plain), or Update mode with " +
        s".option(\"mergeKeys\", \"k1,k2\") for keyed streaming upserts " +
        s"(got $outputMode" +
        (if (update) " without mergeKeys" else "") +
        "); Complete mode is unsupported")
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-warehouse: 'path' required"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-warehouse: 'table' required"))
    val quarantine = parameters.get("quarantine")
    require(quarantine.isEmpty || mergeKeys.isEmpty,
      "graft-warehouse sink: quarantine and mergeKeys are exclusive " +
        "(expectations split appends; upserts have no quarantine path)")
    new WarehouseStreamSink(sqlContext.sparkSession, path, table,
      parameters.get("rowsPerFile").map(_.toLong).getOrElse(0L),
      if (update) mergeKeys else Nil, quarantine)
  }

  /** BATCH read — `spark.read.format("graft-warehouse")
    * .option("path", dir).option("table", t).load()`, with
    * `.option("versionAsOf", v)` for reader-API time travel (the
    * DataFrameReader spelling of [[Warehouse.readVersion]]; default is
    * the latest committed version).
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String])
      : org.apache.spark.sql.sources.BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-warehouse: 'path' required"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-warehouse: 'table' required"))
    val wh = Warehouse.open(sqlContext.sparkSession, path)
    val entries = parameters.get("versionAsOf") match {
      case Some(v) =>
        // readVersion's existence + retention checks, then the entries
        val ver = v.toLong
        require(wh.versions(table).contains(ver),
          s"$table has no manifest v$ver (vacuumed or never committed)")
        wh.loadAt(table, ver)
      case None => wh.loadLatest(table)._2
    }
    if (!entries.exists(e => e.dv.nonEmpty && e.dvRows > 0) &&
        !wh.mappingActive(table))
      wh.relationFor(table, entries)
    else {
      // DELETION VECTORS present (the raw HadoopFsRelation would
      // resurface vectored rows) or COLUMN MAPPING active (the raw
      // relation exposes physical names): delegate to the corrected
      // dfFor plan. Column pruning survives (PrunedScan); predicate
      // pushdown on this alternate reader path is traded for
      // correctness — the primary Warehouse.read/SQL route keeps full
      // pushdown.
      val ctx = sqlContext
      new org.apache.spark.sql.sources.BaseRelation
          with org.apache.spark.sql.sources.PrunedScan {
        override val sqlContext: SQLContext = ctx
        override def schema: StructType = wh.tables(table)
        override def buildScan(requiredColumns: Array[String])
            : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
          import org.apache.spark.sql.functions.col
          val df = wh.dfFor(table, entries)
          df.select(requiredColumns.toSeq.map(col): _*).rdd
        }
      }
    }
  }

  private def tableSchema(params: Map[String, String]): StructType = {
    val spark = SparkSession.active
    val wh = Warehouse.open(spark, params("path"))
    val base = wh.tables.getOrElse(params.getOrElse("table", ""),
      throw new IllegalArgumentException(
        s"graft-warehouse: 'table' option must be one of " +
          s"${wh.tables.keys.mkString(", ")}"))
    if (WarehouseSourceProvider.cdfEnabled(params))
      base.add(org.apache.spark.sql.types.StructField("_change_delta",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    else base
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(tableSchema(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-warehouse: 'path' required"))
    val table = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-warehouse: 'table' required"))
    val maxVersions = parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.toLong
      require(n > 0,
        s"graft-warehouse: maxVersionsPerTrigger must be > 0, got $n")
      n
    }
    new WarehouseChangeSource(sqlContext.sparkSession, path, table,
      parameters.get("startingVersion").map(_.toLong),
      WarehouseSourceProvider.cdfEnabled(parameters),
      maxVersions)
  }
}

object WarehouseSourceProvider {
  private[sources] def cdfEnabled(params: Map[String, String]): Boolean =
    params.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))
}

/** @param cdf when true, batches are CHANGE FEEDS: rows carry
  *   `_change_delta` (+1 file added / -1 file removed since the start
  *   offset, [[Warehouse.readChangeFeed]] semantics), so a
  *   delta-weighted downstream fold is EXACT across merges and
  *   compactions — the streaming twin of q76's batch MV maintenance.
  *   The first batch (no start offset) is the snapshot, all +1.
  *   Requires replaced files to be retained while streams are behind
  *   (`retainReplaced` + conservative vacuum), like the batch feed.
  */
class WarehouseChangeSource(spark: SparkSession, dir: String, table: String,
    startingVersion: Option[Long], cdf: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private val wh = Warehouse.open(spark, dir)

  override def schema: StructType =
    if (!cdf) wh.tables(table)
    else wh.tables(table).add(org.apache.spark.sql.types.StructField(
      "_change_delta", org.apache.spark.sql.types.IntegerType,
      nullable = false))

  private def version(o: Offset): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalStateException(
      s"graft-warehouse: unexpected offset $other")
  }

  /** Trigger.AvailableNow pins the drain target at query start: commits
    * landing after the pin are left for the next run (proper
    * "available now" semantics rather than the single-batch fallback).
    */
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = wh.versions(table).lastOption

  // SupportsAdmissionControl plumbing (inherited via
  // SupportsTriggerAvailableNow, the FileStreamSource shape). A
  // manifest version is the indivisible read unit; `.option(
  // "maxVersionsPerTrigger", n)` rate-limits the FOLLOW phase to n
  // versions per micro-batch — without it, a stream catching up on a
  // long-lived table reads the whole commit backlog in one giant batch
  // (the Delta maxFilesPerTrigger concern, one level up). The INITIAL
  // snapshot batch stays a single unit (it reads a version's file SET,
  // not a version range); cap the backfill with `startingVersion`
  // when the snapshot itself is too big for one batch. Under
  // AvailableNow the pinned drain target is reached over ceil(lag/n)
  // micro-batches instead of one.
  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val end = (getOffset.map(version), maxVersionsPerTrigger) match {
      case (Some(l), Some(n)) =>
        Option(start).map(o => version(o.asInstanceOf[Offset]))
          .orElse(startingVersion) match {
          case Some(b) => Some(math.min(l, b + n))
          case None => Some(l) // initial snapshot: one indivisible unit
        }
      case (l, _) => l
    }
    end.map(LongOffset.apply).orNull
  }

  /** Latest committed manifest version (capped under AvailableNow);
    * None before the first commit.
    */
  override def getOffset: Option[Offset] = {
    val latest = wh.versions(table).lastOption
    latest.map(v => LongOffset(availableNowCap.fold(v)(math.min(v, _))))
  }

  /** Rows of files present at `end` but not at `start` (start absent →
    * full snapshot at `end`, or the pinned startingVersion). Both
    * versions' manifests must still exist — vacuuming a version a
    * checkpoint still points at fails fast here, like readVersion.
    */
  /** The slice between the offsets, RE-ANCHORING across partition-
    * layout migrations: [[Warehouse.streamSlice]] splits the range into
    * layout ERAS at each repartition commit — the migration itself (a
    * content-identity rewrite) contributes zero rows, pre-migration
    * eras read under their own directory layout, and a caught-up
    * stream crosses the boundary without retention. Plain follow emits
    * rels added per era (vectored deletes invisible — append-only
    * consumers); CDF emits the retraction-aware feed per era.
    */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame =
    wh.streamSlice(table, start.map(version).orElse(startingVersion),
      version(end), cdf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

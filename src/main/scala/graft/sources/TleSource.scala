package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset}
import org.apache.spark.sql.sources.{
  DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual,
  In, IsNotNull, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for the TLE landing format (SURVEY §2.1 S1/S2
  * as a first-class `spark.read.format("graft-tle")` source): each file
  * is a stripped sequence of `(name, line1, line2)` record triples; a
  * trailing partial triple is dropped per file (reference parity,
  * `/root/reference/script.py:119-130` — payload `.strip()` first, so
  * edge blank lines don't shift alignment, interior ones count).
  *
  * Contract vs `ingest.TleText.triples`: the RDD path treats the whole
  * directory as ONE ordered payload (global zipWithIndex — correct for
  * a single fetched file); this source treats each FILE as a
  * self-contained record stream, which is the distributed landing
  * layout graft's writers produce (whole records never span files).
  * One InputPartition per file: ordering within a record is preserved
  * by construction, scans parallelize across files, and no global
  * index pass is needed at all.
  *
  * Supports column pruning (`SupportsPushDownRequiredColumns`): a query
  * projecting only `name` reads and emits one column.
  */
class TleSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tle"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TleSource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-tle: a path is required — spark.read.format(\"graft-tle\").load(dir)"))
    new TleTable(path)
  }
}

object TleSource {
  // same record contract as ingest.TleText.triples: per-line strip
  // (script.py:125-127), names aligned for drop-in parity
  val SCHEMA: StructType = StructType(Seq(
    StructField("sat_name", StringType),
    StructField("l1", StringType),
    StructField("l2", StringType)))

  /** Driver-side listing of data files under `path` (absolute paths,
    * sorted) — the shared hidden/temp-aware rule lives in
    * [[graft.util.FsListing]].
    */
  def listDataFiles(path: String): Seq[String] = {
    val sep = if (path.endsWith("/")) "" else "/"
    graft.util.FsListing.dataFiles(path).map { case (rel, _) =>
      s"$path$sep$rel"
    }
  }

  /** The session's Hadoop configuration as serializable pairs — the
    * executor-side readers must open files with the session's
    * spark.hadoop.* credentials/endpoints, not a bare default config.
    */
  def sessionConfProps(): Array[(String, String)] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val it = conf.iterator()
    val buf = ArrayBuffer.empty[(String, String)]
    while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
    buf.toArray
  }

  // ---------------------------------------------------------------
  // per-file stats index (file skipping for pushed-down predicates)
  // ---------------------------------------------------------------

  /** Per-file landing stats: lexical [minName, maxName] over the
    * record names (compared as UTF8 bytes — the same binary order
    * Catalyst string comparisons use) and [minNorad, maxNorad] over the
    * PARSABLE l1 norad fields (minNorad > maxNorad ⇔ none parsed).
    */
  final case class FileStats(minName: String, maxName: String,
      minNorad: Int, maxNorad: Int)

  /** Build/refresh the sidecar stats index for a landing directory —
    * INCREMENTAL via the shared [[SidecarIndex]] store: only files
    * absent from the merged index are statted (one distributed pass, a
    * task per NEW file), vanished files are recorded as drops, and
    * each refresh writes one O(delta) delta file, compacted into
    * `_index.json` every [[SidecarIndex.CompactThreshold]] deltas. The
    * `_` prefix keeps every store file invisible to data listings.
    * Files landed AFTER a refresh are simply absent from the index and
    * always scanned, so a stale index can never lose records — only
    * skip less.
    */
  def writeIndex(spark: SparkSession, dir: String): Unit = {
    val sep = if (dir.endsWith("/")) "" else "/"
    val props = sessionConfProps()
    SidecarIndex.update(dir, newRels => {
      if (newRels.isEmpty) Nil
      else {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        spark.sparkContext
          .parallelize(newRels, math.max(1, newRels.size))
          .map { rel => rel -> statsOf(s"$dir$sep$rel", props) }
          .collect().toSeq
          .map { case (rel, s) =>
            val n = m.createObjectNode()
            n.put("minName", s.minName); n.put("maxName", s.maxName)
            n.put("minNorad", s.minNorad); n.put("maxNorad", s.maxNorad)
            rel -> n
          }
      }
    })
    ()
  }

  /** The merged sidecar index, keyed by relative path; empty when
    * absent. Cached driver-side by index-file fingerprint. */
  def readIndex(dir: String): Map[String, FileStats] =
    SidecarIndex.read(dir).map { case (rel, v) =>
      rel -> FileStats(
        v.get("minName").asText(), v.get("maxName").asText(),
        v.get("minNorad").asInt(), v.get("maxNorad").asInt())
    }

  /** One file's stats via the same streaming reader the scan uses. */
  private def statsOf(file: String,
      props: Array[(String, String)]): FileStats = {
    val r = new TleFileReader(file, Array("sat_name", "l1"), props,
      Array.empty, Int.MinValue, Int.MaxValue)
    var minN: UTF8String = null; var maxN: UTF8String = null
    var minId = Int.MaxValue; var maxId = Int.MinValue
    try {
      while (r.next()) {
        val row = r.get()
        val name = row.getUTF8String(0) // fresh per row (no buffer reuse)
        if (minN == null || name.compareTo(minN) < 0) minN = name
        if (maxN == null || name.compareTo(maxN) > 0) maxN = name
        val id = TleFileReader.parseNorad(row.getUTF8String(1).toString)
        if (id != Int.MinValue) {
          if (id < minId) minId = id
          if (id > maxId) maxId = id
        }
      }
    } finally r.close()
    FileStats(
      if (minN == null) "" else minN.toString,
      if (maxN == null) "" else maxN.toString,
      minId, maxId)
  }

  /** Can a file whose names span [mn, mx] (binary UTF8 order) contain a
    * row passing `f`? Conservative: unknown filter shapes → true.
    * Prefix test compares byte-TRUNCATED bounds: truncation is monotone
    * in unsigned byte order, so mn ≤ s ≤ mx ∧ s startsWith p ⇒
    * trunc(mn,|p|) ≤ p ≤ trunc(mx,|p|).
    */
  private[sources] def nameRangeMayMatch(mn: String, mx: String,
      f: Filter): Boolean = {
    def u(s: String) = UTF8String.fromString(s)
    def truncCmp(bound: String, p: String): Int = {
      val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = bound.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val tb = if (bb.length <= pb.length) bb else java.util.Arrays.copyOf(bb, pb.length)
      java.util.Arrays.compareUnsigned(tb, pb)
    }
    f match {
      case EqualTo("sat_name", v: String) =>
        u(mn).compareTo(u(v)) <= 0 && u(v).compareTo(u(mx)) <= 0
      case In("sat_name", vs) => vs.exists {
        case v: String => u(mn).compareTo(u(v)) <= 0 && u(v).compareTo(u(mx)) <= 0
        case _ => true
      }
      case StringStartsWith("sat_name", p) =>
        truncCmp(mn, p) <= 0 && truncCmp(mx, p) >= 0
      case GreaterThan("sat_name", v: String) => u(mx).compareTo(u(v)) > 0
      case GreaterThanOrEqual("sat_name", v: String) => u(mx).compareTo(u(v)) >= 0
      case LessThan("sat_name", v: String) => u(mn).compareTo(u(v)) < 0
      case LessThanOrEqual("sat_name", v: String) => u(mn).compareTo(u(v)) <= 0
      case IsNotNull("sat_name") => true
      case _ => true
    }
  }
}

class TleTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tle:$path"
  override def schema(): StructType = TleSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // norad is a DERIVED column (substr of l1) in every downstream
    // plan, so a norad range can never reach the source as a Catalyst
    // Filter — it arrives as read options instead:
    //   .option("noradMin", 44000).option("noradMax", 45000)
    val lo = Option(options.get("noradMin")).map(_.toInt).getOrElse(Int.MinValue)
    val hi = Option(options.get("noradMax")).map(_.toInt).getOrElse(Int.MaxValue)
    val mft = Option(options.get("maxFilesPerTrigger")).map(_.toInt)
    val arch = Option(options.get("archiveDir"))
    arch.foreach(LandingArchive.validate(Seq(path), _))
    new TleScanBuilder(path, lo, hi, mft, arch)
  }
}

class TleScanBuilder(path: String, noradLo: Int, noradHi: Int,
    maxFilesPerTrigger: Option[Int] = None,
    archiveDir: Option[String] = None)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = TleSource.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept the `sat_name` shapes the file-stats index can skip on and
    * the row filter can evaluate exactly; everything is ALSO returned
    * as residual, so Spark re-applies each filter post-scan — pushdown
    * here is purely an I/O reduction, never a correctness dependency.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("sat_name", _: String) => true
      case In("sat_name", _) => true
      case StringStartsWith("sat_name", _) => true
      case GreaterThan("sat_name", _: String) => true
      case GreaterThanOrEqual("sat_name", _: String) => true
      case LessThan("sat_name", _: String) => true
      case LessThanOrEqual("sat_name", _: String) => true
      case _ => false
    }
    filters // all residual: Spark keeps the exact post-scan Filter
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new TleScan(path, required, pushed, noradLo, noradHi,
      maxFilesPerTrigger, archiveDir)
}

class TleScan(path: String, required: StructType, filters: Array[Filter],
    noradLo: Int, noradHi: Int,
    private[sources] val maxFilesPerTrigger: Option[Int] = None,
    private[sources] val archiveDir: Option[String] = None)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  /** Post-pruning size report (graft-avro's contract): the byte sum of
    * exactly the landing files this scan will read after index-based
    * skipping — a selective name/norad read looks as small to Catalyst
    * as it is, so e.g. a broadcast join on it becomes plannable. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val bytes = scala.util.Try {
      val sep = if (path.endsWith("/")) "" else "/"
      val lens = graft.util.FsListing.dataFiles(path)
        .map { case (rel, len) => s"$path$sep$rel" -> len }.toMap
      selectedFiles(lens.keys.toSeq.sorted).map(lens).sum
    }.getOrElse(-1L)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (bytes >= 0) java.util.OptionalLong.of(bytes)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val nr = if (noradLo == Int.MinValue && noradHi == Int.MaxValue) ""
             else s", norad=[$noradLo,$noradHi]"
    s"graft-tle $path, columns=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters: [${filters.mkString(", ")}]$nr"
  }

  /** One InputPartition per landing file the sidecar stats index cannot
    * rule out: a file is SKIPPED when its recorded name range can't
    * satisfy some pushed name filter, or its norad range misses the
    * option-pinned [noradLo, noradHi]. Files absent from the index (or
    * with no index at all) are always scanned — a stale index skips
    * less, never loses records.
    */
  private[sources] def selectedFiles(files: Seq[String]): Seq[String] = {
    if (filters.isEmpty && noradLo == Int.MinValue && noradHi == Int.MaxValue)
      return files
    val idx = TleSource.readIndex(path)
    val sep = if (path.endsWith("/")) "" else "/"
    files.filter { abs =>
      val rel = abs.stripPrefix(s"$path$sep")
      idx.get(rel) match {
        case None => true
        case Some(st) =>
          val nameOk = filters.forall(
            TleSource.nameRangeMayMatch(st.minName, st.maxName, _))
          // minNorad > maxNorad ⇔ no parsable norad in the file: only a
          // pinned range may then drop it (its rows can't pass the
          // range filter anyway — unparsable records are dropped by
          // the norad row filter's contract)
          val noradOk =
            if (noradLo == Int.MinValue && noradHi == Int.MaxValue) true
            else st.minNorad <= st.maxNorad &&
              st.maxNorad >= noradLo && st.minNorad <= noradHi
          nameOk && noradOk
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    selectedFiles(TleSource.listDataFiles(path)).map(TleFilePartition)
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new TleReaderFactory(required.fieldNames, TleSource.sessionConfProps(),
      TleFileReader.compile(filters), noradLo, noradHi)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TleMicroBatchStream(path, required, this, checkpointLocation,
      maxFilesPerTrigger)
}

/** Streaming form of the landing-zone read — the reference's poll loop
  * (fetch → land → parse, `/root/reference/script.py:100-177`) as a
  * Structured Streaming source: each micro-batch picks up landing
  * files that appeared since the last batch; records stream through
  * the same per-file triple assembly as the batch scan.
  *
  * Offset model: the offset IS the sorted set of files already
  * processed (one JSON array). Robust to out-of-order file names —
  * a late writer whose file sorts before already-seen names is still
  * new-set-minus-old-set — and immune to clock skew (no modtime
  * watermark). The offset grows with the landing directory; landing
  * zones are pruned after warehouse commit by contract (K2-K4 move
  * records out), which bounds it. Files are immutable once landed
  * (writers write to `_tmp` then rename). With an `archiveDir` read
  * option, `commit` MOVES the committed batch's files out of the
  * landing ([[LandingArchive]]), keeping the per-trigger listing
  * O(live files); without it `commit` is a no-op.
  */
class TleMicroBatchStream(path: String, required: StructType,
    scan: TleScan, checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None) extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {
  import FileSetAdmission.admit

  // compacts offsets against ledger snapshots under the query's own
  // checkpoint dir once the seen set outgrows the full-list bound
  private val ledger = new FileSetLedger(checkpointLocation)
  // Trigger.AvailableNow cap: the listing frozen at prepare time —
  // batches drain toward exactly this set and the run terminates
  // there even while writers keep landing new files
  @volatile private var availableNowCap: Option[Set[String]] = None

  private def listing(): Seq[String] = TleSource.listDataFiles(path)

  private def snapshot(): TleFileSetOffset = ledger.offsetFor(listing())

  override def initialOffset(): Offset = TleFileSetOffset(Seq.empty)
  override def latestOffset(): Offset = snapshot()
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(listing().toSet)
  override def getDefaultReadLimit: org.apache.spark.sql.connector.read
      .streaming.ReadLimit =
    maxFilesPerTrigger
      .map(org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles)
      .getOrElse(org.apache.spark.sql.connector.read.streaming.ReadLimit
        .allAvailable())
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset =
    admit(start.asInstanceOf[TleFileSetOffset], listing(),
      availableNowCap, limit, ledger)
  override def deserializeOffset(json: String): Offset =
    ledger.adopt(TleFileSetOffset.fromJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[TleFileSetOffset].files.toSet
    // the offset tracks EVERY file (progress must not depend on the
    // filter), but skipped files plan no reader work
    scan.selectedFiles(end.asInstanceOf[TleFileSetOffset].files
        .filterNot(seen))
      .map(TleFilePartition).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()

  // per-stream memo of already-moved names (see LandingArchive)
  private val archived = scala.collection.mutable.Set.empty[String]
  override def commit(end: Offset): Unit =
    scan.archiveDir.foreach { arch =>
      LandingArchive.moveCommitted(Seq(path), arch,
        end.asInstanceOf[TleFileSetOffset].files, archived)
    }
  override def stop(): Unit = ()
}

/** Offset = the set of data files already in the stream. Two wire
  * forms, distinguished by the JSON root:
  *
  *   - an ARRAY of file names (the legacy full-list form) — what small
  *     landing directories write, and what every pre-existing
  *     checkpoint holds;
  *   - an OBJECT `{"ledger": path, "n": count, "tail": [names]}` — the
  *     COMPACTED form: `ledger` points at an immutable full-listing
  *     snapshot file under the query's own checkpoint directory
  *     (durable across restarts by construction) and `tail` carries
  *     only the names seen since that freeze. A long-lived landing
  *     directory's offset log then grows O(tail) per commit instead of
  *     O(|files ever seen|) — the r13 gap where a 100k-file history
  *     serialized every name into every checkpoint write.
  *
  * In memory `files` is ALWAYS the fully-expanded set, so
  * `planInputPartitions`' new-minus-old math is unchanged (robust to
  * out-of-order names, no modtime clock). Expansion of a compact
  * offset is a superset of the current listing when the landing zone
  * was pruned meanwhile — harmless under the write-once landing-name
  * contract (a pruned name never comes back as new data).
  */
case class TleFileSetOffset(files: Seq[String],
    ledgerRef: Option[(String, Seq[String])] = None) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    ledgerRef match {
      case Some((path, tail)) =>
        val o = m.createObjectNode()
        o.put("ledger", path)
        o.put("n", files.size - tail.size)
        val arr = o.putArray("tail")
        tail.foreach(arr.add)
        m.writeValueAsString(o)
      case None =>
        val arr = m.createArrayNode()
        files.foreach(arr.add)
        m.writeValueAsString(arr)
    }
  }
}

object TleFileSetOffset {
  /** Offsets stay the plain full-list form until the file count
    * crosses this; past it, the tail re-freezes into a new ledger
    * whenever it outgrows the same bound. Bounds every offset write to
    * ~TailBound names + one path. */
  val TailBound = 512

  def fromJson(json: String): TleFileSetOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(json)
    if (node.isArray) {
      val buf = ArrayBuffer.empty[String]
      val it = node.elements()
      while (it.hasNext) buf += it.next().asText()
      TleFileSetOffset(buf.toSeq)
    } else {
      val path = node.get("ledger").asText()
      val tail = ArrayBuffer.empty[String]
      val it = node.get("tail").elements()
      while (it.hasNext) tail += it.next().asText()
      val ledgerFiles = FileSetLedger.readLedger(path)
      TleFileSetOffset(ledgerFiles ++ tail.filterNot(ledgerFiles.toSet),
        Some((path, tail.toSeq)))
    }
  }
}

/** Driver-side bookkeeping that COMPACTS file-set offsets against
  * ledger snapshots under `<checkpoint>/graft-file-ledger/` — shared
  * by the TLE and Avro landing streams. Ledger files are immutable,
  * content-named (same listing ⇒ same name, so a re-freeze after
  * replay is a no-op write), and published by write-then-rename.
  * Retention: the newest [[FileSetLedger.Retain]] snapshots are kept
  * and older ones GC'd — the engine replays at most the last
  * uncommitted batch, whose start/end offsets reference at most the
  * PREVIOUS and the NEW ledger, and both are explicitly protected from
  * the GC (the in-flight pair can never be collected even if a burst
  * of freezes rotates past Retain). Rewinding the offset log deeper
  * than the retained window (manual checkpoint surgery beyond
  * `minBatchesToRetain`) may reference a collected ledger and fail the
  * restart loudly with FileNotFound — by design: unbounded snapshot
  * retention would hold O(|files|) bytes per freeze forever at the
  * 8M-file design point.
  */
final class FileSetLedger(checkpointLocation: String) {
  private val dirPath = new Path(checkpointLocation, "graft-file-ledger")
  // (ledger file path, the names it holds) — the freeze the next
  // offsets ride on until their tail outgrows TailBound
  @volatile private var current: Option[(String, Set[String])] = None

  /** The offset for listing `files`: plain full-list below the bound;
    * past it, reuse the current ledger while the tail stays small and
    * freeze a fresh full snapshot when it doesn't. */
  def offsetFor(files: Seq[String]): TleFileSetOffset = {
    if (files.size <= TleFileSetOffset.TailBound)
      return TleFileSetOffset(files)
    current match {
      case Some((path, set)) if files.count(f => !set(f)) <=
          TleFileSetOffset.TailBound =>
        TleFileSetOffset(files, Some((path, files.filterNot(set))))
      case _ =>
        val path = freeze(files)
        TleFileSetOffset(files, Some((path, Nil)))
    }
  }

  /** Adopt a deserialized (restart) offset's ledger as current, so the
    * next [[offsetFor]] keeps riding it instead of re-freezing. */
  def adopt(off: TleFileSetOffset): TleFileSetOffset = {
    off.ledgerRef.foreach { case (path, tail) =>
      current = Some((path, off.files.toSet -- tail))
    }
    off
  }

  private def freeze(files: Seq[String]): String = {
    // the ledger the in-flight (possibly uncommitted) batch's START
    // offset rides — must survive this freeze's GC for replay
    val prevLedger = current.map(_._1)
    val sorted = files.sorted
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(sorted.mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(6).map(b => f"$b%02x").mkString
    val fs = dirPath.getFileSystem(FileSetLedger.hadoopConf())
    val dest = new Path(dirPath, s"ledger-${sorted.size}-$digest.json")
    if (!fs.exists(dest)) {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val arr = m.createArrayNode()
      sorted.foreach(arr.add)
      val tmp = new Path(dirPath,
        s".ledger-${java.util.UUID.randomUUID}.tmp")
      val out = fs.create(tmp, false)
      try out.write(m.writeValueAsString(arr)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      require(fs.rename(tmp, dest), s"ledger publish failed: $dest")
    }
    current = Some((dest.toString, sorted.toSet))
    // GC: keep the newest [[FileSetLedger.Retain]] snapshots (by their
    // embedded size component — the seen set only grows, so size is
    // freeze order), ALWAYS protecting the replay pair: the ledger
    // just frozen (the new END) and the one the in-flight batch's
    // START rode (adopted on restart or set by the previous freeze).
    // Deeper retention only serves manual checkpoint surgery, and each
    // snapshot is O(|files|) bytes — at the 8M-file design point an
    // unpruned directory would hold thousands.
    val protect: Set[String] = Set(dest.toString) ++ prevLedger
    scala.util.Try {
      fs.listStatus(dirPath).toSeq
        .filter(_.getPath.getName.startsWith("ledger-"))
        .flatMap { st =>
          scala.util.Try(st.getPath.getName.split("-")(1).toLong)
            .toOption.map(_ -> st.getPath)
        }
        .sortBy(-_._1)
        .drop(FileSetLedger.Retain)
        .filterNot(e => protect(e._2.toString))
        .foreach { case (_, p) => fs.delete(p, false) }
    }
    dest.toString
  }
}

/** Shared admission control for the file-set landing streams: one
  * micro-batch ADMITS up to the read limit's file count of new names,
  * bounded by the AvailableNow cap when one is armed — so a 100k-file
  * landing drains in `maxFilesPerTrigger`-sized batches instead of one
  * giant micro-batch, and Trigger.AvailableNow terminates exactly at
  * the prepare-time listing while writers keep landing new files.
  */
object FileSetAdmission {
  import org.apache.spark.sql.connector.read.streaming.{
    CompositeReadLimit, ReadLimit, ReadMaxFiles}

  /** Max files allowed by `limit`; None = unbounded. */
  private def cap(limit: ReadLimit): Option[Int] = limit match {
    case mf: ReadMaxFiles => Some(mf.maxFiles())
    case c: CompositeReadLimit =>
      c.getReadLimits.collect { case mf: ReadMaxFiles => mf.maxFiles() }
        .sorted.headOption
    case _ => None
  }

  /** The end offset for one micro-batch: seen ∪ (admitted fresh names,
    * sorted — deterministic under retries). Returns `start` ITSELF
    * when nothing is admitted, so the engine's offset-equality check
    * sees no progress and (under AvailableNow) terminates — a
    * re-serialized equal SET could still differ in representation
    * (legacy array vs ledger form) and read as spurious progress.
    */
  def admit(start: TleFileSetOffset, listing: Seq[String],
      availableNowCap: Option[Set[String]], limit: ReadLimit,
      ledger: FileSetLedger): TleFileSetOffset = {
    val seen = start.files.toSet
    val avail = availableNowCap match {
      case Some(c) => listing.filter(c)
      case None => listing
    }
    val fresh = avail.filterNot(seen).sorted
    val admitted = cap(limit).map(fresh.take).getOrElse(fresh)
    if (admitted.isEmpty) start
    else ledger.offsetFor((seen ++ admitted).toSeq.sorted)
  }
}

object FileSetLedger {
  /** Ledger snapshots retained per checkpoint (newest by frozen size).
    * 2 suffices for engine replay (an uncommitted batch's start/end);
    * 8 leaves slack for manual checkpoint surgery. */
  private[sources] val Retain = 8

  /** The session's Hadoop configuration when one is live, else a bare
    * default — ledger I/O is driver-side and must not REQUIRE a
    * session (offset (de)serialization can run before one exists). */
  private[sources] def hadoopConf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  /** The sorted listing a ledger file froze. */
  def readLedger(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf())
    val in = fs.open(p)
    val text = try {
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val buf = ArrayBuffer.empty[String]
    val it = node.elements()
    while (it.hasNext) buf += it.next().asText()
    buf.toSeq
  }
}

case class TleFilePartition(file: String) extends InputPartition

class TleReaderFactory(cols: Array[String], confProps: Array[(String, String)],
    nameFilters: Array[(String, Array[String])] = Array.empty,
    noradLo: Int = Int.MinValue, noradHi: Int = Int.MaxValue)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TleFileReader(partition.asInstanceOf[TleFilePartition].file, cols,
      confProps, nameFilters, noradLo, noradHi)
}

object TleFileReader {
  /** Compile pushed Catalyst filters to the serializable (op, values)
    * form the executor-side reader evaluates — only the shapes
    * `pushFilters` accepted appear here.
    */
  def compile(filters: Array[Filter]): Array[(String, Array[String])] =
    filters.collect {
      case EqualTo("sat_name", v: String) => ("eq", Array(v))
      case In("sat_name", vs) =>
        ("in", vs.collect { case s: String => s })
      case StringStartsWith("sat_name", p) => ("sw", Array(p))
      case GreaterThan("sat_name", v: String) => ("gt", Array(v))
      case GreaterThanOrEqual("sat_name", v: String) => ("ge", Array(v))
      case LessThan("sat_name", v: String) => ("lt", Array(v))
      case LessThanOrEqual("sat_name", v: String) => ("le", Array(v))
    }

  /** The norad field of l1 (cols 3-7, 1-indexed), Int.MinValue when
    * unparsable — mirrors `tle_parse`'s null-on-failure cast.
    */
  def parseNorad(l1: String): Int = {
    if (l1.length < 7) return Int.MinValue
    val s = l1.substring(2, 7).trim
    try s.toInt catch { case _: NumberFormatException => Int.MinValue }
  }
}

/** Streams one landing file as record triples. Reads lines lazily,
  * buffers only the 3-line window; the edge-strip needs the trailing
  * blank count, handled by deferring blank lines until a non-blank
  * follows (so trailing blanks never emit).
  */
class TleFileReader(file: String, cols: Array[String],
    confProps: Array[(String, String)],
    nameFilters: Array[(String, Array[String])] = Array.empty,
    noradLo: Int = Int.MinValue, noradHi: Int = Int.MaxValue)
  extends PartitionReader[InternalRow] {

  private val fsPath = new Path(file)
  private val conf = {
    val c = new Configuration(false)
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val in = fsPath.getFileSystem(conf).open(fsPath)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))

  private var started = false          // past the leading blank run
  private var blankRun = 0             // blanks awaiting a non-blank
  private var queuedNonBlank: String = _
  private val window = new ArrayBuffer[String](3)
  private var current: InternalRow = _

  /** Next logical line after edge-stripping, null at EOF. Blank lines
    * are DEFERRED until a non-blank follows: a run followed by content
    * is interior (each blank is a counted line), a run followed by EOF
    * is trailing (dropped) — matching `.strip().splitlines()`.
    */
  private def nextLine(): String = {
    if (blankRun > 0) { blankRun -= 1; return "" }
    if (queuedNonBlank != null) {
      val q = queuedNonBlank; queuedNonBlank = null; return q
    }
    var raw = reader.readLine()
    while (raw != null) {
      if (raw.trim.isEmpty) {
        if (started) blankRun += 1 // leading blanks skip entirely
      } else {
        started = true
        if (blankRun > 0) { queuedNonBlank = raw; blankRun -= 1; return "" }
        return raw
      }
      raw = reader.readLine()
    }
    null // EOF: any pending blankRun was trailing — dropped
  }

  /** Pushed-filter evaluation on the assembled record — binary UTF8
    * comparisons, the same order Catalyst uses on strings. Spark
    * re-applies every filter post-scan (all are residual), so this is
    * purely an emission cut; the norad option range is authoritative
    * though (it exists only here), with unparsable-norad records
    * dropped when a range is pinned.
    */
  private def passes(name: String, l1: String): Boolean = {
    val u = UTF8String.fromString(name)
    val nameOk = nameFilters.forall { case (op, vs) =>
      op match {
        case "eq" => u.compareTo(UTF8String.fromString(vs(0))) == 0
        case "in" => vs.exists(v => u.compareTo(UTF8String.fromString(v)) == 0)
        case "sw" => u.startsWith(UTF8String.fromString(vs(0)))
        case "gt" => u.compareTo(UTF8String.fromString(vs(0))) > 0
        case "ge" => u.compareTo(UTF8String.fromString(vs(0))) >= 0
        case "lt" => u.compareTo(UTF8String.fromString(vs(0))) < 0
        case "le" => u.compareTo(UTF8String.fromString(vs(0))) <= 0
        case _ => true
      }
    }
    if (!nameOk) return false
    if (noradLo == Int.MinValue && noradHi == Int.MaxValue) return true
    val id = TleFileReader.parseNorad(l1)
    id != Int.MinValue && id >= noradLo && id <= noradHi
  }

  override def next(): Boolean = {
    while (true) {
      window.clear()
      while (window.size < 3) {
        val line = nextLine()
        if (line == null) return false // EOF: partial trailer dropped
        window += line
      }
      val name = window(0).trim
      val l1 = window(1).trim
      if (passes(name, l1)) {
        val vals = cols.map {
          case "sat_name" => UTF8String.fromString(name)
          case "l1" => UTF8String.fromString(l1)
          case "l2" => UTF8String.fromString(window(2).trim)
        }
        current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        return true
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

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
  ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
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
}

class TleTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-tle:$path"
  override def schema(): StructType = TleSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TleScanBuilder(path)
}

class TleScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TleSource.SCHEMA
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new TleScan(path, required)
}

class TleScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tle $path, columns=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    TleSource.listDataFiles(path).map(TleFilePartition)
      .toArray[InputPartition]

  override def createReaderFactory(): PartitionReaderFactory =
    new TleReaderFactory(required.fieldNames, TleSource.sessionConfProps())

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TleMicroBatchStream(path, required)
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
  * (writers write to `_tmp` then rename), so `commit` is a no-op.
  */
class TleMicroBatchStream(path: String, required: StructType)
  extends MicroBatchStream {

  private def snapshot(): TleFileSetOffset =
    TleFileSetOffset(TleSource.listDataFiles(path))

  override def initialOffset(): Offset = TleFileSetOffset(Seq.empty)
  override def latestOffset(): Offset = snapshot()
  override def deserializeOffset(json: String): Offset =
    TleFileSetOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[TleFileSetOffset].files.toSet
    end.asInstanceOf[TleFileSetOffset].files
      .filterNot(seen).map(TleFilePartition).toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TleReaderFactory(required.fieldNames, TleSource.sessionConfProps())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Offset = the sorted list of data files already in the stream.
  * (De)serialized with Jackson (ships with Spark) so arbitrary path
  * characters round-trip.
  */
case class TleFileSetOffset(files: Seq[String]) extends Offset {
  override def json(): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = m.createArrayNode()
    files.foreach(arr.add)
    m.writeValueAsString(arr)
  }
}

object TleFileSetOffset {
  def fromJson(json: String): TleFileSetOffset = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(json)
    val buf = ArrayBuffer.empty[String]
    val it = node.elements()
    while (it.hasNext) buf += it.next().asText()
    TleFileSetOffset(buf.toSeq)
  }
}

case class TleFilePartition(file: String) extends InputPartition

class TleReaderFactory(cols: Array[String], confProps: Array[(String, String)])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TleFileReader(partition.asInstanceOf[TleFilePartition].file, cols, confProps)
}

/** Streams one landing file as record triples. Reads lines lazily,
  * buffers only the 3-line window; the edge-strip needs the trailing
  * blank count, handled by deferring blank lines until a non-blank
  * follows (so trailing blanks never emit).
  */
class TleFileReader(file: String, cols: Array[String],
    confProps: Array[(String, String)])
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

  override def next(): Boolean = {
    window.clear()
    while (window.size < 3) {
      val line = nextLine()
      if (line == null) return false // EOF: partial trailer dropped
      window += line
    }
    val vals = cols.map {
      case "sat_name" => UTF8String.fromString(window(0).trim)
      case "l1" => UTF8String.fromString(window(1).trim)
      case "l2" => UTF8String.fromString(window(2).trim)
    }
    current = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

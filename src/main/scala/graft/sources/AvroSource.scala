package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo,
  PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source for Avro object-container files
  * (`spark.read.format("graft-avro")`) — the environment ships avro
  * core/mapred but not the spark-avro connector, so the scan plumbing
  * is first-class here: one `InputPartition` per container-file BYTE
  * RANGE (files above `spark.sql.files.maxPartitionBytes` — or the
  * `splitSize` read option — split on Avro's own sync-marker block
  * boundaries, so few huge files still fan out), COLUMN PRUNING
  * pushed into Avro's own schema resolution (the expected/reader
  * schema carries only the required fields, so the decoder SKIPS
  * writer-only fields without materializing them — Avro's native
  * projection), and the T5 PERMISSIVE contract (SURVEY §2.3,
  * `script.py:11-20`'s null-on-failure generalized) applied at field
  * coercion:
  *
  *   - a writer value whose type doesn't convert to the asked Spark
  *     type (e.g. writer `string` "12.3X", reader `double`) becomes
  *     NULL, never a task failure, and the raw writer value is
  *     captured in the corrupt-record column
  *     (`columnNameOfCorruptRecord`, default `_corrupt`) when the
  *     read schema includes it;
  *   - a field the writer never had reads as all-NULL (add-column
  *     schema evolution), corrupt stays NULL;
  *   - a genuine writer NULL stays NULL with corrupt NULL — null and
  *     failed-parse are distinguishable.
  *
  * Container-level corruption (a torn Avro block) fails the file read
  * loudly — the container format's checksummed blocks make silent
  * repair impossible and masking a torn block would drop data, so
  * that is a job error by design, unlike per-record field coercion.
  */
class AvroSourceProvider extends TableProvider with
    org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true
  /** Data schema from the first container file, PLUS partition-path
    * columns (`dt=.../lang=...` segments of a single-directory target)
    * appended with types inferred from the first value — an explicit
    * read schema overrides the types; a name collision between a data
    * field and a partition directory is rejected loudly. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val targets = AvroSource.paths(k => Option(options.get(k)))
    val data = AvroSource.inferSchema(AvroSource.resolveFiles(targets))
    val parts =
      if (targets.length == 1) AvroSource.partitionSpec(targets.head)
      else Nil
    parts.foreach { case (k, _) =>
      require(!data.fieldNames.contains(k),
        s"graft-avro: partition directory column '$k' collides with a " +
          "data column of the same name")
    }
    StructType(data.fields ++ parts.map { case (k, v) =>
      StructField(k, AvroSource.inferPartType(v), nullable = true)
    })
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val corrupt = Option(properties.get("columnNameOfCorruptRecord"))
      .getOrElse("_corrupt")
    val targets = AvroSource.paths(k => Option(properties.get(k)))
    // partition columns = the directory chain's keys that the (possibly
    // user-supplied) schema actually carries — omitted ⇒ simply unread
    val partCols =
      if (targets.length == 1)
        AvroSource.partitionSpec(targets.head).map(_._1)
          .filter(schema.fieldNames.contains)
      else Nil
    new AvroTable(targets, schema, corrupt, partCols)
  }
}

object AvroSource {

  /** The load targets from DSv2 options: `load(dir)` arrives as
    * `path`; `load(p1, p2, ...)` (COPY INTO's explicit file list)
    * arrives as a JSON-array `paths`. */
  private[sources] def paths(get: String => Option[String]): Seq[String] =
    get("paths") match {
      case Some(json) =>
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        val node = m.readTree(json)
        (0 until node.size()).map(node.get(_).asText())
      case None => get("path").map(Seq(_)).getOrElse(
        throw new IllegalArgumentException(
          "graft-avro: a path is required — " +
            "spark.read.format(\"graft-avro\").load(dirOrFiles)"))
    }

  /** Each target resolves to itself when it is a FILE, or to its
    * sorted data-file listing when a directory. */
  private[sources] def resolveFiles(targets: Seq[String]): Seq[String] =
    resolveFilesWithLen(targets).map(_._1)

  /** [[resolveFiles]] carrying byte lengths (free from the listing) —
    * what split planning needs without a second round of stat calls. */
  private[sources] def resolveFilesWithLen(
      targets: Seq[String]): Seq[(String, Long)] = {
    // the session's Hadoop conf when live (credentials/endpoints for
    // non-local filesystems), bare default otherwise
    val conf = FileSetLedger.hadoopConf()
    targets.flatMap { t =>
      val p = new Path(t)
      val st = p.getFileSystem(conf).getFileStatus(p)
      if (st.isFile) Seq(t -> st.getLen)
      else {
        val sep = if (t.endsWith("/")) "" else "/"
        graft.util.FsListing.dataFiles(t).map { case (rel, len) =>
          s"$t$sep$rel" -> len
        }
      }
    }
  }

  /** Default block codec for written container files. zstd: the best
    * size/speed trade for a landing format that is written once and
    * scanned many times — a null-codec 100 TB landing pays a 2–4× byte
    * tax on every write AND every later scan. Sync markers sit OUTSIDE
    * the compressed block payload, so byte-range splits work unchanged
    * on every codec; reads resolve the codec from the file's own
    * metadata, so foreign snappy/deflate/xz/bzip2 files decode too.
    */
  val DefaultCodec = "zstd"

  /** Resolve a codec option value to Avro's factory. Accepts Avro's
    * own names (`null`, `deflate`, `snappy`, `bzip2`, `xz`,
    * `zstandard`) plus the Spark-familiar aliases `zstd` and
    * `uncompressed`. */
  private[sources] def codecFactory(
      name: String): org.apache.avro.file.CodecFactory = {
    val canonical = name.toLowerCase match {
      case "zstd" => "zstandard"
      case "uncompressed" => "null"
      case other => other
    }
    try org.apache.avro.file.CodecFactory.fromString(canonical)
    catch {
      case e: org.apache.avro.AvroRuntimeException =>
        throw new IllegalArgumentException(
          s"graft-avro write: unknown codec '$name' (accepted: zstd, " +
            "snappy, deflate, xz, bzip2, null/uncompressed)", e)
    }
  }

  /** NO-LIMIT sentinel for a partition's byte range: the reader skips
    * `pastSync` checks entirely (Avro's `pastSync(Long.MaxValue)`
    * overflows `position + SYNC_SIZE` and would stop at block one). */
  private[sources] val NoEnd = Long.MaxValue

  // ---------------------------------------------------------------
  // Hive-style partition directories (`dt=2026-08-16/lang=en/...`):
  // path segments surface as COLUMNS and prune whole directories at
  // plan time, BEFORE their contents are ever listed or stat-checked
  // ---------------------------------------------------------------

  /** Observability: partition directories pruned at plan time before
    * listing — the spec's witness that a partition predicate cuts the
    * listing itself, not just the scanned files. */
  private[graft] val prunedDirs =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Hive's null-partition sentinel. */
  private val HiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  /** `name=value` split of one path segment; the value is
    * percent-unescaped (Hive's path escaping) and the null sentinel
    * decodes to null. */
  private[sources] def parsePartSeg(name: String): Option[(String, String)] = {
    val i = name.indexOf('=')
    if (i <= 0) None else Some((name.take(i), unescapePathName(name.drop(i + 1))))
  }

  /** Hive-style path escaping for a partition VALUE (the write-side
    * inverse of [[unescapePathName]]): percent-encode the characters
    * that would break the `k=v/` layout or the filesystem; null
    * becomes the Hive sentinel. Spaces stay literal (Hive's own
    * convention — `pr=4-NOT SPECIFIED` is a real directory name). */
  private[sources] def escapePathName(v: String): String = {
    if (v == null) return HiveDefaultPartition
    val needs = (c: Char) => c < 0x20 || c == 0x7f || c == '%' ||
      c == '/' || c == '\\' || c == '=' || c == ':' || c == '*' ||
      c == '?' || c == '"' || c == '<' || c == '>' || c == '|'
    if (!v.exists(needs)) return v
    val sb = new java.lang.StringBuilder(v.length + 8)
    v.foreach { c =>
      if (needs(c)) sb.append(f"%%${c.toInt}%02X") else sb.append(c)
    }
    sb.toString
  }

  private[sources] def unescapePathName(s: String): String = {
    if (s == HiveDefaultPartition) return null
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val hex = s.substring(i + 1, i + 3)
        try { sb.append(Integer.parseInt(hex, 16).toChar); i += 3 }
        catch { case _: NumberFormatException => sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The partition column chain of a directory target — the `k=v`
    * names along the FIRST-sorted directory chain, with each level
    * checked for uniformity (every sibling directory at a partition
    * level must carry the same key; a mixed level ends the chain). An
    * O(depth) walk, no full listing. Returns (column, first value)
    * pairs — the values seed type inference. Empty for file targets,
    * missing dirs, and unpartitioned layouts.
    */
  def partitionSpec(target: String): Seq[(String, String)] = {
    val conf = FileSetLedger.hadoopConf()
    val p = new Path(target)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p) || fs.getFileStatus(p).isFile) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = p
    var go = true
    while (go) {
      val kids = fs.listStatus(cur)
        .filterNot { st =>
          val n = st.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        .sortBy(_.getPath.getName)
      val dirs = kids.filter(_.isDirectory)
      dirs.headOption.flatMap(d => parsePartSeg(d.getPath.getName)) match {
        case Some((k, v)) if dirs.forall(d =>
            parsePartSeg(d.getPath.getName).exists(_._1 == k)) =>
          out += k -> v
          cur = dirs.head.getPath
        case _ => go = false
      }
    }
    out.toSeq
  }

  /** Inferred Spark type for a partition column's first value — the
    * standard ladder (long, double, date, else string); an explicit
    * user schema overrides. Nulls (the Hive sentinel) infer string. */
  private[sources] def inferPartType(v: String): DataType = {
    if (v == null) return StringType
    if (scala.util.Try(v.toLong).isSuccess) LongType
    else if (scala.util.Try(v.toDouble).isSuccess) DoubleType
    else if (scala.util.Try(java.time.LocalDate.parse(v)).isSuccess) DateType
    else StringType
  }

  /** Synthetic min==max stats for one partition value in the column's
    * comparison domain — lets [[statsMayMatch]] decide directory
    * pruning with exactly the file-skipping machinery (typed, not
    * string-compared: a numeric partition pruned by string order
    * would lose data). None ⇒ never prune on this column.
    */
  private[sources] def partValueStats(dt: DataType,
      v: String): Option[ColStats] = {
    if (v == null) // null passes NO comparison filter: the empty range
      return Some(dt match {
        case StringType => ColStats("string", 1L, 0L, 1.0, 0.0, null, null)
        case DoubleType | org.apache.spark.sql.types.FloatType =>
          ColStats("double", 1L, 0L, 1.0, 0.0, null, null)
        case _ => ColStats("long", 1L, 0L, 1.0, 0.0, null, null)
      })
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        scala.util.Try(v.trim.toLong).toOption
          .map(l => ColStats("long", l, l, 1.0, 0.0, null, null))
      case DateType =>
        scala.util.Try(java.time.LocalDate.parse(v.trim).toEpochDay)
          .toOption.map(d => ColStats("long", d, d, 1.0, 0.0, null, null))
      case DoubleType | org.apache.spark.sql.types.FloatType =>
        scala.util.Try(v.trim.toDouble).toOption
          .map(d => ColStats("double", 1L, 0L, d, d, null, null))
      case StringType => Some(ColStats("string", 1L, 0L, 1.0, 0.0, v, v))
      case _ => None
    }
  }

  /** Partition-aware file resolution: walk `target`, PRUNING every
    * `col=value` directory `mayMatch(depth, value)` rejects — its
    * contents are never listed (the counter is the witness). Files
    * return with byte lengths, ready for [[planSplits]]. Directories
    * that don't parse as the expected partition key at their level
    * descend as plain data dirs.
    */
  private[sources] def resolvePrunedWithLen(target: String,
      partCols: Seq[String],
      mayMatch: (Int, String) => Boolean): Seq[(String, Long)] = {
    val conf = FileSetLedger.hadoopConf()
    val root = new Path(target)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    if (fs.getFileStatus(root).isFile)
      return Seq(target -> fs.getFileStatus(root).getLen)
    val sep = if (target.endsWith("/")) "" else "/"
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def walk(dir: Path, rel: String, depth: Int): Unit =
      fs.listStatus(dir).sortBy(_.getPath.getName).foreach { st =>
        val n = st.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".")) {
          if (st.isFile) buf += s"$target$sep$rel$n" -> st.getLen
          else parsePartSeg(n) match {
            case Some((k, v)) if depth < partCols.length &&
                k == partCols(depth) =>
              if (mayMatch(depth, v)) walk(st.getPath, s"$rel$n/", depth + 1)
              else { prunedDirs.incrementAndGet(); () }
            case _ => walk(st.getPath, s"$rel$n/", depth)
          }
        }
      }
    walk(root, "", 0)
    buf.sortBy(_._1).toSeq
  }

  /** Render one catalyst value as its partition-path string — the
    * exact inverse of what [[inferPartType]] + the reader's coercion
    * reconstruct (longs as digits, doubles with a point, dates ISO).
    */
  private[sources] def partValueString(
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int, dt: DataType): String = {
    if (row.isNullAt(i)) return null
    dt match {
      case StringType => row.getUTF8String(i).toString
      case LongType => row.getLong(i).toString
      case IntegerType => row.getInt(i).toString
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case BooleanType => row.getBoolean(i).toString
      case DoubleType => row.getDouble(i).toString
      case org.apache.spark.sql.types.FloatType => row.getFloat(i).toString
      case DateType =>
        java.time.LocalDate.ofEpochDay(row.getInt(i).toLong).toString
      case t => throw new IllegalArgumentException(
        "graft-avro write: unsupported partitionBy column type " +
          s"$t (scalar, string, boolean, date only)")
    }
  }

  /** The partition values of one data file, parsed from its `k=v`
    * path segments by NAME (order-independent, absent ⇒ null) — the
    * same for batch and streaming partitions. */
  private[sources] def partValuesOf(file: String, target: String,
      partCols: Seq[String]): Array[String] = {
    if (partCols.isEmpty) return Array.empty
    val sep = if (target.endsWith("/")) target else target + "/"
    val rel = if (file.startsWith(sep)) file.stripPrefix(sep) else file
    // DIRECTORY segments only — a data file whose own name contains
    // '=' must never masquerade as a partition value
    val found = rel.split('/').dropRight(1).iterator
      .flatMap(parsePartSeg(_)).toMap
    partCols.map(c => found.getOrElse(c, null)).toArray
  }

  /** The session default split size — `spark.sql.files.maxPartitionBytes`,
    * the same knob the built-in file sources split on. */
  private[sources] def defaultSplitSize(): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      SparkSession.active.conf
        .get("spark.sql.files.maxPartitionBytes", "134217728"))

  /** One partition per CONTAINER-FILE BYTE RANGE: files above
    * `splitSize` split into adjacent [i·s, (i+1)·s) ranges — Avro
    * container files are block-splittable by design (every block ends
    * with the file's 16-byte sync marker; `DataFileReader.sync(start)`
    * / `pastSync(end)` is the public range API, and adjacent ranges
    * cover every block exactly once) — so a landing of few huge files
    * still fans out across the cluster instead of serializing onto few
    * tasks. Files at/below the threshold stay one whole-file partition
    * with the no-limit sentinel (identical to the unsplit read path).
    */
  private[sources] def planSplits(files: Seq[(String, Long)],
      splitSize: Long): Array[InputPartition] =
    files.flatMap { case (f, len) =>
      if (splitSize <= 0 || len <= splitSize)
        Seq(AvroFilePartition(f, 0L, NoEnd))
      else {
        val n = ((len + splitSize - 1) / splitSize).toInt
        (0 until n).map { i =>
          AvroFilePartition(f, i.toLong * splitSize,
            math.min((i + 1).toLong * splitSize, len))
        }
      }
    }.toArray[InputPartition]

  /** Observability: file readers opened with a PROJECTED expected
    * schema (fewer fields than the writer's) — the spec's witness that
    * column pruning actually reached Avro's schema resolution. */
  private[graft] val projectedReads =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Observability: container files SKIPPED at plan time because the
    * sidecar stats index proved no record can pass a pushed filter —
    * the spec's witness that pushdown actually cuts I/O. */
  private[graft] val skippedFiles =
    new java.util.concurrent.atomic.AtomicLong(0L)

  // ---------------------------------------------------------------
  // per-file stats sidecar (file skipping for pushed-down filters) —
  // TleSource.writeIndex's shape, generalized over scalar columns
  // ---------------------------------------------------------------

  /** One column's per-file range. `kind` picks the comparison domain:
    * "long" (int/long + date/timestamp wire values), "double"
    * (float/double), "string" (binary UTF8 order — the order Catalyst
    * string comparisons use). min > max in the long/double domains ⇔
    * the file had no non-NaN non-null value for the column. `hasNaN`
    * (double kind only) records that the file holds at least one NaN —
    * NaN is EXCLUDED from the min/max accumulation (Parquet's rule for
    * float/double statistics: NaN would poison both bounds) and, since
    * Spark orders NaN ABOVE every other double (`NaN > x` is true for
    * all x), a file with a NaN can pass any comparison filter, so
    * [[statsMayMatch]] never skips on a hasNaN column.
    */
  final case class ColStats(kind: String, minL: Long, maxL: Long,
      minD: Double, maxD: Double, minS: String, maxS: String,
      hasNaN: Boolean = false) {
    def empty: Boolean = kind match {
      case "long" => minL > maxL
      case "double" => minD > maxD
      case _ => minS == null
    }
  }

  /** Drop the whole sidecar index for `dir` (base + any delta files) —
    * called by overwrite commits, whose delete phase removes every file
    * the index described. */
  private[sources] def invalidateIndex(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Unit = {
    val d = new Path(dir)
    if (fs.exists(d)) fs.listStatus(d)
      .filter { st =>
        val n = st.getPath.getName
        n == "_index.json" || n.startsWith("_index.delta-")
      }
      .foreach(st => fs.delete(st.getPath, false))
  }

  /** The stats-eligible comparison kind of a SPARK type (date/
    * timestamp land in the long domain — their wire format). None ⇒
    * the column never skips. */
  private[sources] def statsKindOf(dt: DataType): Option[String] =
    dt match {
      case LongType | IntegerType | DateType | TimestampType |
           TimestampNTZType => Some("long")
      case DoubleType | org.apache.spark.sql.types.FloatType =>
        Some("double")
      case StringType => Some("string")
      case _ => None
    }

  /** [[statsKindOf]] for an Avro field schema. */
  private def statsKind(s: Schema): Option[String] = statsKindOf(sparkType(s))

  /** Mutable per-file column-range accumulator for the WRITE path:
    * the writer sees every value anyway, so the sidecar stats are
    * collected inline (same domains and NaN rule as [[statsOf]]'s
    * read-back pass — the landing becomes self-indexing with zero
    * post-hoc re-read). One instance per open container file.
    */
  private[sources] final class StatsAcc(fields: Array[StructField]) {
    private val kinds: Array[String] =
      fields.map(f => statsKindOf(f.dataType).orNull)
    private val minL = Array.fill(fields.length)(Long.MaxValue)
    private val maxL = Array.fill(fields.length)(Long.MinValue)
    private val minD = Array.fill(fields.length)(Double.MaxValue)
    private val maxD = Array.fill(fields.length)(Double.MinValue)
    private val minS = new Array[UTF8String](fields.length)
    private val maxS = new Array[UTF8String](fields.length)
    private val nan = new Array[Boolean](fields.length)
    private val seen = new Array[Boolean](fields.length)

    /** Observe row value at ORIGINAL row index `rowIdx` for stats
      * column `i` (the data-schema index). */
    def update(row: org.apache.spark.sql.catalyst.InternalRow,
        rowIdx: Int, i: Int): Unit = {
      val kind = kinds(i)
      if (kind == null || row.isNullAt(rowIdx)) return
      kind match {
        case "long" =>
          val l = fields(i).dataType match {
            case IntegerType | DateType => row.getInt(rowIdx).toLong
            case _ => row.getLong(rowIdx)
          }
          if (l < minL(i)) minL(i) = l
          if (l > maxL(i)) maxL(i) = l
          seen(i) = true
        case "double" =>
          val d = fields(i).dataType match {
            case org.apache.spark.sql.types.FloatType =>
              row.getFloat(rowIdx).toDouble
            case _ => row.getDouble(rowIdx)
          }
          if (d.isNaN) nan(i) = true
          else {
            if (d < minD(i)) minD(i) = d
            if (d > maxD(i)) maxD(i) = d
            seen(i) = true
          }
        case _ =>
          val u = row.getUTF8String(rowIdx)
          if (minS(i) == null || u.compareTo(minS(i)) < 0)
            minS(i) = u.clone()
          if (maxS(i) == null || u.compareTo(maxS(i)) > 0)
            maxS(i) = u.clone()
          seen(i) = true
      }
    }

    /** The accumulated ranges in [[ColStats]] form (empty ranges for
      * never-seen columns — the provable all-null skip, exactly what
      * the read-back pass records). */
    def result(): Map[String, ColStats] =
      fields.indices.flatMap { i =>
        Option(kinds(i)).map { k =>
          fields(i).name -> (k match {
            case "long" =>
              if (seen(i)) ColStats("long", minL(i), maxL(i), 1.0, 0.0,
                null, null)
              else ColStats("long", 1L, 0L, 1.0, 0.0, null, null)
            case "double" =>
              if (seen(i)) ColStats("double", 1L, 0L, minD(i), maxD(i),
                null, null, hasNaN = nan(i))
              else ColStats("double", 1L, 0L, 1.0, 0.0, null, null,
                hasNaN = nan(i))
            case _ => ColStats("string", 1L, 0L, 1.0, 0.0,
              if (minS(i) == null) null else minS(i).toString,
              if (maxS(i) == null) null else maxS(i).toString)
          })
        }
      }.toMap
  }

  /** One file's per-column ranges via a full-schema streaming read. */
  private def statsOf(file: String,
      props: Array[(String, String)]): Map[String, ColStats] = {
    val c = new Configuration()
    props.foreach { case (k, v) => c.set(k, v) }
    val r = DataFileReader.openReader(new FsInput(new Path(file), c),
      new GenericDatumReader[GenericRecord]())
    try {
      val fields = r.getSchema.getFields.asScala.toArray
      val kinds = fields.map(f => statsKind(f.schema()))
      val acc = fields.map(_ => ColStats("", 1L, 0L, 1.0, 0.0, null, null))
      var rec: GenericRecord = null
      while (r.hasNext) {
        rec = r.next(rec)
        var i = 0
        while (i < fields.length) {
          kinds(i) match {
            case Some(kind) =>
              val v = rec.get(i)
              if (v != null) {
                val a = acc(i)
                acc(i) = kind match {
                  case "long" =>
                    val l = v.asInstanceOf[Number].longValue()
                    if (a.minL > a.maxL) a.copy(kind = kind, minL = l, maxL = l)
                    else a.copy(minL = math.min(a.minL, l),
                      maxL = math.max(a.maxL, l))
                  case "double" =>
                    val d = v.asInstanceOf[Number].doubleValue()
                    // NaN never enters the bounds (it would poison both
                    // via math.min/max propagation); it is FLAGGED so the
                    // skip test knows the file can pass any comparison
                    if (d.isNaN) a.copy(kind = kind, hasNaN = true)
                    else if (a.minD > a.maxD)
                      a.copy(kind = kind, minD = d, maxD = d)
                    else a.copy(minD = math.min(a.minD, d),
                      maxD = math.max(a.maxD, d))
                  case _ =>
                    val s = v.toString
                    val u = UTF8String.fromString(s)
                    if (a.minS == null) a.copy(kind = kind, minS = s, maxS = s)
                    else a.copy(
                      minS = if (u.compareTo(UTF8String.fromString(a.minS)) < 0)
                        s else a.minS,
                      maxS = if (u.compareTo(UTF8String.fromString(a.maxS)) > 0)
                        s else a.maxS)
                }
              }
            case None =>
          }
          i += 1
        }
      }
      fields.indices.flatMap { i =>
        val a = acc(i)
        // an eligible column that stayed all-null records its schema
        // kind with an EMPTY range — provably nothing passes a
        // comparison filter on it, so the file skips
        if (a.kind.nonEmpty) Some(fields(i).name() -> a)
        else kinds(i).map(k => fields(i).name() -> a.copy(kind = k))
      }.toMap
    } finally r.close()
  }

  /** One file's column stats as the sidecar's JSON node shape. */
  private[sources] def colsToNode(
      m: com.fasterxml.jackson.databind.ObjectMapper,
      cols: Map[String, ColStats])
      : com.fasterxml.jackson.databind.node.ObjectNode = {
    val fileNode = m.createObjectNode()
    cols.foreach { case (col, st) =>
      val n = fileNode.putObject(col)
      n.put("kind", st.kind)
      st.kind match {
        case "long" => n.put("min", st.minL); n.put("max", st.maxL)
        case "double" =>
          n.put("min", st.minD); n.put("max", st.maxD)
          if (st.hasNaN) n.put("nan", true)
        case _ => n.put("min", st.minS); n.put("max", st.maxS)
      }
      ()
    }
    fileNode
  }

  private def colsFromNode(fn: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, ColStats] = {
    val cols = scala.collection.mutable.Map.empty[String, ColStats]
    val it = fn.fieldNames()
    while (it.hasNext) {
      val col = it.next()
      val v = fn.get(col)
      cols += col -> (v.get("kind").asText() match {
        case "long" => ColStats("long", v.get("min").asLong(),
          v.get("max").asLong(), 1.0, 0.0, null, null)
        case "double" => ColStats("double", 1L, 0L, v.get("min").asDouble(),
          v.get("max").asDouble(), null, null,
          hasNaN = v.has("nan") && v.get("nan").asBoolean())
        case k =>
          // an all-null string column serialized null bounds
          def s(n: String): String = {
            val jn = v.get(n)
            if (jn == null || jn.isNull) null else jn.asText()
          }
          ColStats(k, 1L, 0L, 1.0, 0.0, s("min"), s("max"))
      })
    }
    cols.toMap
  }

  /** Build/refresh the sidecar stats index for an Avro landing
    * directory — INCREMENTAL: only files absent from the merged index
    * are statted (one distributed pass, a task per new file), vanished
    * files are recorded as drops, and the store is one O(delta) delta
    * file per refresh, compacted into `_index.json` every
    * [[SidecarIndex.CompactThreshold]] deltas. Files landed AFTER the
    * refresh are absent from it and always scanned: a stale index
    * skips less, never loses records.
    */
  def writeIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    val sep = if (dir.endsWith("/")) "" else "/"
    val props = TleSource.sessionConfProps()
    SidecarIndex.update(dir, newRels => {
      if (newRels.isEmpty) Nil
      else {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        spark.sparkContext
          .parallelize(newRels, math.max(1, newRels.size))
          .map { rel => rel -> statsOf(s"$dir$sep$rel", props) }
          .collect().toSeq
          .map { case (rel, cols) => rel -> colsToNode(m, cols) }
      }
    })
    ()
  }

  /** The merged sidecar index keyed by relative path; empty when
    * absent. Cached driver-side by index-file fingerprint (repeat scan
    * plannings over an unchanged index parse zero bytes). */
  def readIndex(dir: String): Map[String, Map[String, ColStats]] =
    SidecarIndex.read(dir).map { case (rel, fn) => rel -> colsFromNode(fn) }

  /** Filter value → the long comparison domain (date/timestamp wire
    * encodings included); None ⇒ not convertible, never skip on it. */
  private def longOf(v: Any): Option[Long] = v match {
    case n: java.lang.Long => Some(n.longValue())
    case n: java.lang.Integer => Some(n.longValue())
    case n: java.lang.Short => Some(n.longValue())
    case n: java.lang.Byte => Some(n.longValue())
    case t: java.sql.Timestamp =>
      Some(t.getTime * 1000L + (t.getNanos % 1000000) / 1000L)
    case t: java.time.Instant =>
      Some(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  private def doubleOf(v: Any): Option[Double] = v match {
    case n: java.lang.Double => Some(n.doubleValue())
    case n: java.lang.Float => Some(n.doubleValue())
    case n: java.lang.Long => Some(n.doubleValue())
    case n: java.lang.Integer => Some(n.doubleValue())
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case _ => None
  }

  /** Can a file with `stats` contain a row passing `f`? Conservative:
    * unknown shapes, missing columns, and inconvertible values → true.
    * String prefix test compares byte-TRUNCATED bounds (truncation is
    * monotone in unsigned byte order — TleSource's proof applies).
    */
  private[sources] def statsMayMatch(
      stats: Map[String, ColStats],
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def rng[T](col: String, v: Any,
        longCmp: (Long, Long, Long) => Boolean,
        dblCmp: (Double, Double, Double) => Boolean,
        strCmp: (UTF8String, UTF8String, UTF8String) => Boolean): Boolean =
      stats.get(col) match {
        // a NaN in the file can pass ANY comparison (Spark orders NaN
        // above every double), and NaN bounds from a pre-fix index are
        // meaningless — either way, never skip on this column
        case Some(st) if st.kind == "double" &&
            (st.hasNaN || st.minD.isNaN || st.maxD.isNaN) => true
        case Some(st) if !st.empty => st.kind match {
          case "long" => longOf(v).forall(x => longCmp(st.minL, st.maxL, x))
          case "double" => doubleOf(v).forall(x => dblCmp(st.minD, st.maxD, x))
          case _ => v match {
            case s: String => strCmp(UTF8String.fromString(st.minS),
              UTF8String.fromString(st.maxS), UTF8String.fromString(s))
            case _ => true
          }
        }
        // stats present and EMPTY (all-null column): no non-null value
        // can pass a comparison filter against the column
        case Some(_) => false
        case None => true
      }
    f match {
      case EqualTo(c, v) => rng(c, v,
        (mn, mx, x) => mn <= x && x <= mx,
        (mn, mx, x) => mn <= x && x <= mx,
        (mn, mx, x) => mn.compareTo(x) <= 0 && x.compareTo(mx) <= 0)
      case In(c, vs) => vs.isEmpty || vs.exists(v => rng(c, v,
        (mn, mx, x) => mn <= x && x <= mx,
        (mn, mx, x) => mn <= x && x <= mx,
        (mn, mx, x) => mn.compareTo(x) <= 0 && x.compareTo(mx) <= 0))
      case GreaterThan(c, v) => rng(c, v,
        (_, mx, x) => mx > x, (_, mx, x) => mx > x,
        (_, mx, x) => mx.compareTo(x) > 0)
      case GreaterThanOrEqual(c, v) => rng(c, v,
        (_, mx, x) => mx >= x, (_, mx, x) => mx >= x,
        (_, mx, x) => mx.compareTo(x) >= 0)
      case LessThan(c, v) => rng(c, v,
        (mn, _, x) => mn < x, (mn, _, x) => mn < x,
        (mn, _, x) => mn.compareTo(x) < 0)
      case LessThanOrEqual(c, v) => rng(c, v,
        (mn, _, x) => mn <= x, (mn, _, x) => mn <= x,
        (mn, _, x) => mn.compareTo(x) <= 0)
      case StringStartsWith(c, p) => stats.get(c) match {
        case Some(st) if st.kind == "string" && !st.empty =>
          def truncCmp(bound: String): Int = {
            val pb = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val bb = bound.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val tb = if (bb.length <= pb.length) bb
                     else java.util.Arrays.copyOf(bb, pb.length)
            java.util.Arrays.compareUnsigned(tb, pb)
          }
          truncCmp(st.minS) <= 0 && truncCmp(st.maxS) >= 0
        case Some(st) if st.kind == "string" => false // all-null column
        case _ => true
      }
      case _ => true
    }
  }

  /** A union `[null, X]` unwrapped to X; any other schema unchanged. */
  private[sources] def nonNull(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      .toList match {
        case one :: Nil => one
        case _ => s
      }

  /** Spark type for an Avro field schema; unions `[null, X]` unwrap to
    * nullable X; the standard logical types (timestamp-micros /
    * local-timestamp-micros / date / decimal) map to their Spark
    * types; arrays of supported elements map to ArrayType — the
    * embedding-column carrier (`array<float>`). Types outside that set
    * map to string (rendered via toString — honest, lossy, and never a
    * crash).
    */
  private[sources] def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.LONG => s.getLogicalType match {
      case _: org.apache.avro.LogicalTypes.TimestampMicros => TimestampType
      case _: org.apache.avro.LogicalTypes.LocalTimestampMicros =>
        TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.INT => s.getLogicalType match {
      case _: org.apache.avro.LogicalTypes.Date => DateType
      case _ => IntegerType
    }
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => s.getLogicalType match {
      case d: org.apache.avro.LogicalTypes.Decimal =>
        DecimalType(d.getPrecision, d.getScale)
      case _ => BinaryType
    }
    case Schema.Type.ARRAY =>
      // containsNull = true unconditionally: a [null, X] element union
      // obviously, but also safe for plain X (nullable never lies)
      ArrayType(sparkType(nonNull(s.getElementType)), containsNull = true)
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map(f =>
        StructField(f.name, sparkType(nonNull(f.schema())),
          nullable = true)))
    case Schema.Type.MAP => // Avro map keys are always strings
      MapType(StringType, sparkType(nonNull(s.getValueType)),
        valueContainsNull = true)
    case Schema.Type.UNION =>
      val u = nonNull(s)
      if (u.getType == Schema.Type.UNION) StringType else sparkType(u)
    case _ => StringType
  }

  /** The write-side inverse of [[sparkType]]: a Spark schema as an
    * Avro record schema — nullable fields become `[null, X]` unions
    * with a null default; timestamps/dates carry the standard logical
    * types so any Avro reader (including this source) round-trips them.
    */
  private[sources] def toAvroSchema(st: StructType): Schema = {
    // Avro record names must be unique per distinct structure. The
    // sanitized field PATH alone is NOT enough: joining path segments
    // with '_' (and mapping every non-alphanumeric character to '_')
    // can collide sibling structs — `a: struct<b_c: struct<…>>` and
    // `a_b: struct<c: struct<…>>` both sanitize to `a_b_c`. A counter
    // in schema-traversal order (deterministic for a given Spark
    // schema, so repeated writes stay byte-identical) guarantees
    // uniqueness; the path stays in the name for readability.
    var recSeq = 0
    def recName(path: String): String = {
      recSeq += 1
      s"r${recSeq}_" +
        path.map(c => if (c.isLetterOrDigit || c == '_') c else '_')
    }
    def base(dt: DataType, path: String): Schema = dt match {
      case LongType => Schema.create(Schema.Type.LONG)
      case IntegerType | ShortType | ByteType =>
        Schema.create(Schema.Type.INT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case org.apache.spark.sql.types.FloatType =>
        Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case TimestampType => org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType => org.apache.avro.LogicalTypes
        .localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType => org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
      case d: DecimalType => org.apache.avro.LogicalTypes
        .decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
      case ArrayType(et, containsNull) =>
        Schema.createArray(
          if (containsNull)
            Schema.createUnion(Schema.create(Schema.Type.NULL),
              base(et, path + "_item"))
          else base(et, path + "_item"))
      case nested: StructType =>
        Schema.createRecord(recName(path), null, "graft", false,
          nested.fields.map(f => field(f, path + "_" + f.name))
            .toList.asJava)
      case MapType(StringType, vt, valueContainsNull) =>
        Schema.createMap(
          if (valueContainsNull)
            Schema.createUnion(Schema.create(Schema.Type.NULL),
              base(vt, path + "_value"))
          else base(vt, path + "_value"))
      case t => throw new IllegalArgumentException(
        s"graft-avro write: unsupported type $t (scalar, string, " +
          "binary, decimal, timestamp, date, and arrays/structs/" +
          "string-keyed maps of those only)")
    }
    def field(f: StructField, path: String): Schema.Field =
      if (f.nullable)
        new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL),
            base(f.dataType, path)),
          null, org.apache.avro.JsonProperties.NULL_VALUE)
      else new Schema.Field(f.name, base(f.dataType, path), null)
    Schema.createRecord("spark_record", null, "graft", false,
      st.fields.map(f => field(f, f.name)).toList.asJava)
  }

  /** One catalyst field → the Avro value the writer appends (internal
    * time encodings pass through untouched: micros for timestamps,
    * days for dates, unscaled big-endian bytes for decimals — exactly
    * the logical types' wire formats). `row` is any catalyst value
    * holder — an InternalRow field or an ArrayData element, which is
    * what lets arrays and structs recurse; `as` is the target Avro
    * schema (union-unwrapped), consulted only by the nested shapes.
    */
  private[sources] def toAvroValue(
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      i: Int, dt: DataType, as: Schema = null): AnyRef = {
    if (row.isNullAt(i)) return null
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.valueOf(row.getLong(i))
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case ShortType => java.lang.Integer.valueOf(row.getShort(i).toInt)
      case ByteType => java.lang.Integer.valueOf(row.getByte(i).toInt)
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case org.apache.spark.sql.types.FloatType =>
        java.lang.Float.valueOf(row.getFloat(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case StringType => row.getUTF8String(i).toString
      case BinaryType => java.nio.ByteBuffer.wrap(row.getBinary(i))
      case d: DecimalType =>
        java.nio.ByteBuffer.wrap(row.getDecimal(i, d.precision, d.scale)
          .toJavaBigDecimal.unscaledValue().toByteArray)
      case ArrayType(et, _) =>
        val a = row.getArray(i)
        val n = a.numElements()
        val es = if (as != null) nonNull(as.getElementType) else null
        val out = new java.util.ArrayList[AnyRef](n)
        var j = 0
        while (j < n) { out.add(toAvroValue(a, j, et, es)); j += 1 }
        out
      case MapType(StringType, vt, _) =>
        val m = row.getMap(i)
        val n = m.numElements()
        val ks = m.keyArray(); val vs = m.valueArray()
        val vsch = if (as != null) nonNull(as.getValueType) else null
        // LinkedHashMap: Avro serializes maps in iteration order, and a
        // deterministic write keeps content-addressed artifacts stable
        val out = new java.util.LinkedHashMap[String, AnyRef](n)
        var j = 0
        while (j < n) {
          out.put(ks.getUTF8String(j).toString,
            toAvroValue(vs, j, vt, vsch))
          j += 1
        }
        out
      case nested: StructType =>
        require(as != null && as.getType == Schema.Type.RECORD,
          "graft-avro write: struct value without its record schema")
        val sr = row.getStruct(i, nested.length)
        val rec = new GenericData.Record(as)
        var j = 0
        while (j < nested.length) {
          rec.put(j, toAvroValue(sr, j, nested.fields(j).dataType,
            nonNull(as.getFields.get(j).schema())))
          j += 1
        }
        rec
      case t => throw new IllegalArgumentException(
        s"graft-avro write: unsupported type $t")
    }
  }

  /** Writer schema of the FIRST data file (sorted listing) → Spark
    * schema. Directories are written by one job in this model, so one
    * file's writer schema speaks for the directory; heterogeneous
    * writers are served by passing an explicit read schema instead.
    */
  def inferSchema(files: Seq[String]): StructType = {
    require(files.nonEmpty, "graft-avro: no data files to infer from")
    val in = new FsInput(new Path(files.head), new Configuration())
    val r = DataFileReader.openReader(in,
      new GenericDatumReader[GenericRecord]())
    try {
      StructType(r.getSchema.getFields.asScala.toSeq.map(f =>
        StructField(f.name, sparkType(f.schema),
          nullable = true)))
    } finally r.close()
  }
}

class AvroTable(targets: Seq[String], schema: StructType,
    corruptCol: String, partCols: Seq[String] = Nil)
  extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-avro:${targets.mkString(",")}"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val archiveDir = Option(options.get("archiveDir"))
    archiveDir.foreach(LandingArchive.validate(targets, _))
    new AvroScanBuilder(targets, schema, corruptCol,
      Option(options.get("splitSize")).map(_.toLong)
        .getOrElse(AvroSource.defaultSplitSize()),
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      archiveDir,
      partCols.map(schema(_)))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(targets.length == 1,
      "graft-avro write: exactly one target directory")
    val codec = Option(info.options().get("codec"))
      .getOrElse(AvroSource.DefaultCodec)
    AvroSource.codecFactory(codec) // fail a bad name at plan time
    // partitionBy=col1,col2 → Hive-style k=v directories; the named
    // columns move from the record payload into the PATH, producing
    // exactly the layout the read side surfaces and prunes
    val partBy = Option(info.options().get("partitionBy"))
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    partBy.foreach { c =>
      require(info.schema().fieldNames.contains(c),
        s"graft-avro write: partitionBy column '$c' is not in the " +
          s"written schema [${info.schema().fieldNames.mkString(", ")}]")
    }
    require(partBy.size < info.schema().size || partBy.isEmpty,
      "graft-avro write: partitionBy cannot consume every column")
    // self-indexing landing: writers collect column ranges inline and
    // the commit publishes them as a sidecar delta — on by default
    // (statsIndex=false opts out)
    val statsIndex = Option(info.options().get("statsIndex"))
      .forall(_.toBoolean)
    new AvroWriteBuilder(targets.head, info.schema(), codec, partBy,
      statsIndex)
  }
}

/** The WRITE half of the interchange story: `df.write.format(
  * "graft-avro").save(dir)` emits Avro object-container files, one per
  * task, with the Spark schema mapped back to Avro (nullable → union
  * [null, X]; timestamps as long/timestamp-micros, dates as int/date —
  * the logical types every Avro reader understands). Tasks write to
  * dot-prefixed temp names (invisible to the data listing) and the
  * driver-side commit renames them in — the same publish-by-rename
  * contract the rest of the engine uses; overwrite (`SupportsTruncate`)
  * deletes the pre-existing data files inside that same commit, AFTER
  * every new file has been renamed in (rename-first ordering: a crash
  * mid-commit leaves old ∪ new — recoverable — never a gutted dir).
  */
class AvroWriteBuilder(dir: String, schema: StructType,
    codec: String = AvroSource.DefaultCodec,
    partBy: Seq[String] = Nil,
    statsIndex: Boolean = true)
  extends WriteBuilder with SupportsTruncate {
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new AvroBatchWrite(dir, schema, overwrite,
        TleSource.sessionConfProps(), codec, partBy, statsIndex)
  }
}

object AvroWriteNames {
  /** Per-write-job id baked into every data file name
    * (`part-<partition>-<task>-<job>.avro`): partitionId/taskId are
    * unique only within ONE SparkContext, so a fresh application
    * appending or overwriting the same directory could reuse a name —
    * colliding with a live file (rename-to-existing fails on some
    * filesystems) or, worse, inheriting a stale `_index.json` entry
    * keyed by the reused relative name, whose old ranges could wrongly
    * stats-skip the new file. The job component makes names unique
    * across applications (Spark's own `part-<split>-<jobUUID>` pattern).
    */
  def newJobId(): String =
    java.util.UUID.randomUUID.toString.take(8)
}

/** One task's written temp files, relative to the target directory —
  * several for a partitioned write (one per partition value seen), one
  * otherwise. The file-NAME component is dot-prefixed (hidden); any
  * leading `k=v/` directory components are visible but hold no visible
  * files until commit renames them in. `stats` carries each file's
  * inline-collected column ranges (keyed by temp rel) for the
  * self-indexing sidecar commit; empty when stats are disabled. */
private[graft] final case class AvroTaskCommit(tempRels: Seq[String],
    stats: Map[String, Map[String, AvroSource.ColStats]] = Map.empty)
  extends WriterCommitMessage

private[graft] object AvroTaskCommit {
  def one(tempRel: String): AvroTaskCommit = AvroTaskCommit(Seq(tempRel))
  /** The published name: strip the hidden-dot from the FILE component,
    * keeping any partition directory prefix. */
  def visibleRel(tempRel: String): String = {
    val i = tempRel.lastIndexOf('/')
    if (i < 0) tempRel.stripPrefix(".")
    else tempRel.take(i + 1) + tempRel.drop(i + 1).stripPrefix(".")
  }
}

class AvroBatchWrite(dir: String, schema: StructType, overwrite: Boolean,
    confProps: Array[(String, String)],
    codec: String = AvroSource.DefaultCodec,
    partBy: Seq[String] = Nil,
    statsIndex: Boolean = true) extends BatchWrite {
  private val jobId = AvroWriteNames.newJobId()
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new AvroWriterFactory(dir, schema.json, confProps, jobId, codec,
      partBy, statsIndex)
  /** Phase 1 of commit: publish the new files by rename. Returns the
    * published destination paths. Temp names are dot-prefixed and thus
    * invisible to the data listing, so nothing is visible until each
    * rename lands — and the pre-existing data is still fully intact
    * through this whole phase.
    */
  private[graft] def renameIn(fs: org.apache.hadoop.fs.FileSystem,
      messages: Array[WriterCommitMessage]): Set[Path] =
    messages.flatMap { case AvroTaskCommit(tempRels, _) =>
      tempRels.map { tempRel =>
        val tmp = new Path(dir, tempRel)
        val dest = new Path(dir, AvroTaskCommit.visibleRel(tempRel))
        require(fs.rename(tmp, dest), s"graft-avro commit: rename of " +
          s"$tmp failed")
        dest
      }
    }.toSet
  /** Phase 2 (overwrite only): delete the replaced files — everything
    * the pre-commit listing held that is not one of the files just
    * renamed in. Runs AFTER every rename: a driver crash anywhere
    * between the phases leaves old ∪ new on disk (a recoverable
    * superset), never a directory with the old data already gone and
    * only hidden dot-temps — the warehouse's own publish order.
    */
  private[graft] def deleteReplaced(fs: org.apache.hadoop.fs.FileSystem,
      preexisting: Seq[String], published: Set[Path]): Unit =
    preexisting.map(new Path(_))
      .filterNot(p => published.contains(fs.makeQualified(p)) ||
        published.contains(p))
      .foreach(p => fs.delete(p, false))
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val fs = new Path(dir).getFileSystem(conf)
    val preexisting =
      if (overwrite) scala.util.Try(TleSource.listDataFiles(dir)).getOrElse(Nil)
      else Nil
    val published = renameIn(fs, messages)
    if (overwrite) {
      deleteReplaced(fs, preexisting, published)
      // every file the index described is gone — drop the sidecar too,
      // so no stale entry can ever be consulted (the job-id file names
      // already make key reuse impossible; this keeps the directory
      // clean and the next writeIndex a from-scratch base)
      AvroSource.invalidateIndex(fs, dir)
      // and sweep now-empty k=v directories: a leftover pr=a/ skeleton
      // from a replaced PARTITIONED layout would otherwise keep
      // declaring a partition column on every later read — colliding
      // with (or shadowing) a payload field of the same name
      deleteEmptyPartDirs(fs, new Path(dir))
    }
    // SELF-INDEXING commit: the tasks' inline-collected column ranges
    // publish as one sidecar delta (or a fresh base after overwrite) —
    // selective scans skip these files with zero post-hoc writeIndex
    // pass. Ordered AFTER the renames: a crash in between leaves the
    // files visible but unindexed — merely scanned, never lost.
    if (statsIndex) {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val entries = messages.toSeq.flatMap {
        case AvroTaskCommit(tempRels, stats) =>
          tempRels.flatMap { tempRel =>
            stats.get(tempRel).map(cols =>
              AvroTaskCommit.visibleRel(tempRel) ->
                AvroSource.colsToNode(m, cols))
          }
      }
      if (entries.nonEmpty)
        scala.util.Try(SidecarIndex.append(dir, entries))
      ()
    }
  }
  /** Bottom-up sweep of `k=v`-named directories that hold nothing but
    * other deletable `k=v` directories; anything else (a file, a
    * hidden sidecar, an unrecognized dir) keeps the chain. The
    * non-recursive delete is a second safety: a dir that gained
    * content between the check and the delete just fails the delete
    * and stays. */
  private def deleteEmptyPartDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: Path): Unit = {
    def sweep(p: Path): Boolean = { // true ⇔ p is now empty
      var empty = true
      fs.listStatus(p).foreach { st =>
        val deletable = st.isDirectory &&
          AvroSource.parsePartSeg(st.getPath.getName).isDefined &&
          sweep(st.getPath) && fs.delete(st.getPath, false)
        if (!deletable) empty = false
      }
      empty
    }
    if (fs.exists(root)) { sweep(root); () }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = new Configuration()
    confProps.foreach { case (k, v) => conf.set(k, v) }
    val fs = new Path(dir).getFileSystem(conf)
    messages.foreach {
      case AvroTaskCommit(tempRels, _) =>
        tempRels.foreach(r => fs.delete(new Path(dir, r), false))
      case _ =>
    }
  }
}

class AvroWriterFactory(dir: String, schemaJson: String,
    confProps: Array[(String, String)], jobId: String,
    codec: String = AvroSource.DefaultCodec,
    partBy: Seq[String] = Nil,
    statsIndex: Boolean = true)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new AvroDataWriter(dir,
      DataType.fromJson(schemaJson).asInstanceOf[StructType],
      partitionId, taskId, confProps, jobId, codec, partBy, statsIndex)
}

/** One task's writer. Unpartitioned: a single container file (the hot
  * path — zero per-row routing). With `partBy`: rows route to one open
  * container per partition VALUE seen by this task, under the value's
  * `k=v/` directory (escaped; nulls → the Hive sentinel), and the
  * partition columns move out of the record payload into the path —
  * the write-side inverse of the read's partition-directory columns.
  * Callers should cluster rows (`df.repartition(partCols...)`) so each
  * task sees few values; the open-writer count is the task's distinct
  * value count.
  */
class AvroDataWriter(dir: String, schema: StructType, partitionId: Int,
    taskId: Long, confProps: Array[(String, String)], jobId: String,
    codec: String = AvroSource.DefaultCodec,
    partBy: Seq[String] = Nil,
    statsIndex: Boolean = true)
  extends DataWriter[InternalRow] {

  // partition columns leave the payload; their values ride the path
  private val partIdx = partBy.map(schema.fieldIndex).toArray
  private val dataSchema =
    if (partBy.isEmpty) schema
    else StructType(schema.fields.zipWithIndex
      .filterNot { case (_, i) => partIdx.contains(i) }.map(_._1))
  private val dataIdx = schema.fields.indices
    .filterNot(partIdx.contains).toArray

  private val avroSchema = AvroSource.toAvroSchema(dataSchema)
  private val fields = dataSchema.fields
  private val fieldSchemas = fields.map(f =>
    AvroSource.nonNull(avroSchema.getField(f.name).schema()))
  // taskId in the temp name: two ATTEMPTS of one partition (task retry
  // / speculation) must never collide on a file; only the committed
  // attempt's message is renamed in, the loser is aborted. jobId makes
  // the name unique ACROSS applications (see [[AvroWriteNames]]).
  private val fileName = f".part-$partitionId%05d-$taskId-$jobId.avro"
  private val conf = {
    val c = new Configuration()
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val fs = new Path(dir).getFileSystem(conf)

  /** One open container plus its inline stats accumulator (null when
    * statsIndex is off). */
  private final class OpenFile(val w: DataFileWriter[GenericRecord],
    val acc: AvroSource.StatsAcc)

  private def openFile(tempRel: String): OpenFile = {
    val w = new DataFileWriter(
      new GenericDatumWriter[GenericRecord](avroSchema))
    // block compression (zstd default) — the codec name rides the
    // container's own metadata, so readers need no option to decode
    w.setCodec(AvroSource.codecFactory(codec))
    w.create(avroSchema, fs.create(new Path(dir, tempRel), true))
    new OpenFile(w,
      if (statsIndex) new AvroSource.StatsAcc(fields) else null)
  }

  // tempRel → open file
  private val writers = new java.util.LinkedHashMap[String, OpenFile]()
  // unpartitioned: open the single file EAGERLY (a zero-row task still
  // publishes an empty container carrying the schema — inference on an
  // empty write stays possible); partitioned files open lazily per
  // value, so empty tasks publish nothing
  if (partBy.isEmpty) writers.put(fileName, openFile(fileName))

  // clustered writes see long runs of one partition value: cache the
  // last row's raw values against its resolved writer so the hot loop
  // is a value-compare, not a per-row prefix rebuild + map lookup
  private var lastVals: Array[String] = null
  private var lastFile: OpenFile = null

  private def fileFor(row: InternalRow): OpenFile = {
    if (partBy.isEmpty) return writers.get(fileName)
    val vals = new Array[String](partIdx.length)
    var j = 0
    while (j < partIdx.length) {
      vals(j) = AvroSource.partValueString(
        row, partIdx(j), schema.fields(partIdx(j)).dataType)
      j += 1
    }
    if (lastVals != null && java.util.Arrays.equals(
        lastVals.asInstanceOf[Array[AnyRef]],
        vals.asInstanceOf[Array[AnyRef]]))
      return lastFile
    val sb = new java.lang.StringBuilder()
    j = 0
    while (j < partIdx.length) {
      sb.append(partBy(j)).append('=')
        .append(AvroSource.escapePathName(vals(j))).append('/')
      j += 1
    }
    val tempRel = sb.toString + fileName
    val f = {
      val existing = writers.get(tempRel)
      if (existing != null) existing
      else { val nf = openFile(tempRel); writers.put(tempRel, nf); nf }
    }
    lastVals = vals
    lastFile = f
    f
  }

  override def write(row: InternalRow): Unit = {
    val f = fileFor(row)
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < fields.length) {
      rec.put(i, AvroSource.toAvroValue(row, dataIdx(i),
        fields(i).dataType, fieldSchemas(i)))
      if (f.acc != null) f.acc.update(row, dataIdx(i), i)
      i += 1
    }
    f.w.append(rec)
    ()
  }
  override def commit(): WriterCommitMessage = {
    import scala.jdk.CollectionConverters._
    writers.values().asScala.foreach(_.w.close())
    val stats =
      if (statsIndex)
        writers.asScala.map { case (rel, f) => rel -> f.acc.result() }
          .toMap
      else Map.empty[String, Map[String, AvroSource.ColStats]]
    AvroTaskCommit(writers.keySet().asScala.toSeq, stats)
  }
  override def abort(): Unit = {
    import scala.jdk.CollectionConverters._
    writers.values().asScala.foreach(f => scala.util.Try(f.w.close()))
    writers.keySet().asScala.foreach(r =>
      fs.delete(new Path(dir, r), false))
  }
  override def close(): Unit = ()
}

class AvroScanBuilder(targets: Seq[String], full: StructType,
    corruptCol: String, splitSize: Long,
    maxFilesPerTrigger: Option[Int] = None,
    archiveDir: Option[String] = None,
    partFields: Seq[StructField] = Nil)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownLimit {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  /** PARTIAL limit push: each partition stops decoding after `n` rows
    * (an interactive `limit 10` over a 100 TB landing reads one block
    * per task instead of whole containers). Returning false keeps
    * Spark's own Limit on top — per-partition truncation is a
    * superset, never a correctness dependency. */
  override def pushLimit(n: Int): Boolean = { limit = n; false }
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept the shapes the per-file stats sidecar can skip on;
    * everything is ALSO returned as residual, so Spark re-applies each
    * filter post-scan — pushdown here is purely an I/O cut, never a
    * correctness dependency (TleScanBuilder's contract).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo(_, _) | In(_, _) | GreaterThan(_, _) |
           GreaterThanOrEqual(_, _) | LessThan(_, _) |
           LessThanOrEqual(_, _) | StringStartsWith(_, _) => true
      case _ => false
    }
    filters // all residual: Spark keeps the exact post-scan Filter
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    new AvroScan(targets, required, corruptCol, splitSize, pushed,
      maxFilesPerTrigger, archiveDir, partFields,
      // belt-and-braces: Spark never pushes a limit through a Filter
      // node, but per-partition truncation UNDER residual filters
      // would be row-losing — so refuse the combination structurally
      if (pushed.isEmpty) limit else -1)
}

class AvroScan(targets: Seq[String], required: StructType,
    corruptCol: String, private[sources] val splitSize: Long,
    pushedFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    private[sources] val maxFilesPerTrigger: Option[Int] = None,
    private[sources] val archiveDir: Option[String] = None,
    partFields: Seq[StructField] = Nil,
    limit: Int = -1)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro ${targets.mkString(",")}, " +
      s"columns=${required.fieldNames.mkString(",")}, " +
      s"PushedFilters: [${pushedFilters.mkString(", ")}]"

  // plan-time pushed filters ∪ runtime (DPP) filters — everything the
  // file/directory skipping machinery consults
  @volatile private var filters: Array[org.apache.spark.sql.sources.Filter] =
    pushedFilters

  /** Join-driven RUNTIME filtering (dynamic partition pruning's DSv2
    * hook): Spark may execute a small join side first and inject the
    * observed keys as an `In` filter here, BEFORE this scan plans its
    * partitions — whole `k=v` directories and stats-indexed container
    * files then skip on the runtime key set exactly like plan-time
    * filters (pushdown stays an I/O cut only: Spark re-applies the
    * join itself, so a conservative skip-nothing outcome is never
    * wrong). Any scan column or partition column is offered.
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    (required.fieldNames.toSeq ++ partFields.map(_.name)).distinct
      .filterNot(_ == corruptCol)
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)
      .toArray
  override def filter(
      runtime: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources._
    val usable = runtime.filter {
      case EqualTo(_, _) | In(_, _) | GreaterThan(_, _) |
           GreaterThanOrEqual(_, _) | LessThan(_, _) |
           LessThanOrEqual(_, _) | StringStartsWith(_, _) => true
      case _ => false
    }
    if (usable.nonEmpty) filters = filters ++ usable
  }

  /** Post-pruning size report: the byte sum of exactly the container
    * files this scan will read (sidecar skips and partition-directory
    * prunes applied) — so Catalyst sees a SELECTIVE avro read as
    * small and can, e.g., broadcast it. Row count stays unknown (the
    * sidecar records ranges, not cardinalities).
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val bytes = scala.util.Try(
      selectedFiles(resolveForPlan()).map(_._2).sum).getOrElse(-1L)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (bytes >= 0) java.util.OptionalLong.of(bytes)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  /** Drop files the sidecar stats index (`_index.json` per target
    * directory) proves cannot contain a passing row. Files absent from
    * the index — or targets with no index at all — always scan: a
    * stale index skips less, never loses records.
    */
  private[sources] def selectedFiles(
      files: Seq[(String, Long)]): Seq[(String, Long)] = {
    if (filters.isEmpty) return files
    val idx: Map[String, Map[String, AvroSource.ColStats]] =
      targets.flatMap { t =>
        val sep = if (t.endsWith("/")) "" else "/"
        scala.util.Try(AvroSource.readIndex(t)).getOrElse(Map.empty)
          .map { case (rel, st) => s"$t$sep$rel" -> st }
      }.toMap
    if (idx.isEmpty) return files
    files.filter { case (f, _) =>
      idx.get(f) match {
        case None => true
        case Some(st) =>
          val ok = filters.forall(AvroSource.statsMayMatch(st, _))
          if (!ok) AvroSource.skippedFiles.incrementAndGet()
          ok
      }
    }
  }

  /** Partition-directory pruning: can the `k=v` directory at `depth`
    * hold a passing row? Typed min==max stats through the same
    * [[AvroSource.statsMayMatch]] as file skipping — conservative on
    * parse failures and non-comparable types. */
  private def partDirMayMatch(depth: Int, value: String): Boolean = {
    val f = partFields(depth)
    AvroSource.partValueStats(f.dataType, value) match {
      case None => true
      case Some(st) =>
        val stats = Map(f.name -> st)
        filters.forall(AvroSource.statsMayMatch(stats, _))
    }
  }

  /** Attach each file's path-parsed partition values to its planned
    * partitions (shared by batch splits and streaming batches). */
  private[sources] def withPartValues(
      parts: Array[InputPartition]): Array[InputPartition] = {
    if (partFields.isEmpty) return parts
    val cols = partFields.map(_.name)
    parts.map { p =>
      val fp = p.asInstanceOf[AvroFilePartition]
      fp.copy(partVals =
        AvroSource.partValuesOf(fp.file, targets.head, cols))
        .asInstanceOf[InputPartition]
    }
  }

  // (filter snapshot → resolved files): estimateStatistics during
  // optimization, planInputPartitions at execution, and a DPP re-plan
  // would otherwise each pay the full listing/pruned walk. Keyed by
  // ARRAY IDENTITY — `filters` is only ever replaced wholesale by
  // filter(), so a hit means the same filter state (and one query sees
  // one consistent listing snapshot, the same semantics Spark's own
  // file-index caching has).
  @volatile private var resolveMemo
      : (Array[org.apache.spark.sql.sources.Filter],
         Seq[(String, Long)]) = null

  /** The file set this scan's CURRENT filter state selects — the
    * `k=v` directory prune applied where a partition layout exists
    * (directories skip before their contents are listed). */
  private def resolveForPlan(): Seq[(String, Long)] = {
    val memo = resolveMemo
    if (memo != null && (memo._1 eq filters)) return memo._2
    val resolved =
      if (partFields.nonEmpty && filters.nonEmpty)
        AvroSource.resolvePrunedWithLen(targets.head,
          partFields.map(_.name), partDirMayMatch)
      else AvroSource.resolveFilesWithLen(targets)
    resolveMemo = (filters, resolved)
    resolved
  }

  override def planInputPartitions(): Array[InputPartition] =
    withPartValues(
      AvroSource.planSplits(selectedFiles(resolveForPlan()), splitSize))
  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required, corruptCol,
      TleSource.sessionConfProps(), partFields.map(_.name).toArray,
      limit)
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read
      .streaming.MicroBatchStream =
    new AvroMicroBatchStream(targets, this, checkpointLocation)
}

/** Streaming form of the Avro landing read — corpus waves arriving as
  * container files stream through the same per-file scan (PERMISSIVE
  * coercion included). Offset model is [[TleFileSetOffset]]'s: the
  * sorted set of files already processed, so late writers sorting
  * before seen names are still new-minus-old and no modtime clock is
  * trusted. Files are immutable once landed (write-then-rename is the
  * landing contract, and the graft-avro write path itself publishes by
  * rename). With an `archiveDir` read option, commit MOVES the
  * committed batch's files out of the landing ([[LandingArchive]]), so
  * the per-trigger listing stays O(live files) on a long-lived landing;
  * without it commit is a no-op.
  *
  * Partition-directory columns ride each micro-batch's partitions like
  * the batch scan's; the `k=v` chain is discovered at TABLE creation,
  * so a partitioned landing must have its directory layout present
  * when the stream starts (an empty root infers no partition columns).
  */
class AvroMicroBatchStream(targets: Seq[String], scan: AvroScan,
    checkpointLocation: String)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  // compacts offsets against ledger snapshots under the query's own
  // checkpoint dir once the seen set outgrows the full-list bound
  private val ledger = new FileSetLedger(checkpointLocation)
  // Trigger.AvailableNow cap: the listing frozen at prepare time
  @volatile private var availableNowCap: Option[Set[String]] = None

  private def listing(): Seq[String] = AvroSource.resolveFiles(targets)

  private def snapshot(): TleFileSetOffset = ledger.offsetFor(listing())

  override def initialOffset(): Offset = TleFileSetOffset(Seq.empty)
  override def latestOffset(): Offset = snapshot()
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(listing().toSet)
  override def getDefaultReadLimit: ReadLimit =
    scan.maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    FileSetAdmission.admit(start.asInstanceOf[TleFileSetOffset],
      listing(), availableNowCap, limit, ledger)
  override def deserializeOffset(json: String): Offset =
    ledger.adopt(TleFileSetOffset.fromJson(json))
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[TleFileSetOffset].files.toSet
    val fresh = end.asInstanceOf[TleFileSetOffset].files.filterNot(seen)
    // real byte lengths for the new files, so one huge landed
    // container BYTE-RANGE SPLITS within its own micro-batch instead
    // of serializing onto one task (same planSplits as the batch
    // scan; deterministic across a batch replay — landed files are
    // immutable). A name that fails to stat (raced rename/archive)
    // falls back to a whole-file partition, still exactly-once.
    // Small batches stat just their own files — the trigger already
    // paid one full listing in latestOffset; a second complete sweep
    // per batch for a handful of lengths would double per-trigger
    // listing I/O. A large fresh set (initial drain) lists once.
    val lens: Map[String, Long] =
      if (fresh.size <= 64) {
        val conf = FileSetLedger.hadoopConf()
        fresh.flatMap { f =>
          val p = new Path(f)
          scala.util.Try(
            p.getFileSystem(conf).getFileStatus(p).getLen).toOption
            .map(f -> _)
        }.toMap
      } else AvroSource.resolveFilesWithLen(targets).toMap
    // The offset tracks EVERY file — progress must not depend on the
    // filter — but stats-skipped files plan no reader work. Partition
    //-directory values ride each partition like the batch scan's.
    scan.withPartValues(AvroSource.planSplits(
      scan.selectedFiles(fresh.map(f => f -> lens.getOrElse(f, 0L))),
      scan.splitSize))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    scan.createReaderFactory()
  // per-stream memo of already-moved names (see LandingArchive)
  private val archived = scala.collection.mutable.Set.empty[String]
  override def commit(end: Offset): Unit =
    scan.archiveDir.foreach { arch =>
      LandingArchive.moveCommitted(targets, arch,
        end.asInstanceOf[TleFileSetOffset].files, archived)
    }
  override def stop(): Unit = ()
}

/** One container file or one byte range of it — `[start, end)` in the
  * `sync`/`pastSync` contract; `end == AvroSource.NoEnd` means read to
  * EOF with no range checks (the whole-file fast path). `partVals`
  * carries the file's path-parsed partition-directory values (raw
  * strings, aligned with the scan's partition columns; nulls allowed).
  */
case class AvroFilePartition(file: String, start: Long = 0L,
    end: Long = AvroSource.NoEnd,
    partVals: Array[String] = Array.empty) extends InputPartition

class AvroReaderFactory(required: StructType, corruptCol: String,
    confProps: Array[(String, String)],
    partCols: Array[String] = Array.empty,
    limit: Int = -1) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val fp = p.asInstanceOf[AvroFilePartition]
    new AvroFileReader(fp.file, fp.start, fp.end, required,
      corruptCol, confProps, partCols.zip(fp.partVals).toMap, limit)
  }
}

/** Streams one container file, or one `[start, end)` byte range of it
  * (blocks covered by the `sync`/`pastSync` contract — adjacent ranges
  * partition the file's blocks exactly). The expected (reader) schema handed to
  * Avro holds exactly the required data fields present in the writer
  * schema, with the WRITER's own types — resolution then skips
  * everything else inside the decoder; Spark-type coercion (with the
  * null-on-failure contract) happens per value on the way into the
  * `InternalRow`.
  */
class AvroFileReader(file: String, start: Long, end: Long,
    required: StructType,
    corruptCol: String, confProps: Array[(String, String)],
    partVals: Map[String, String] = Map.empty,
    limit: Int = -1)
  extends PartitionReader[InternalRow] {

  private val conf = {
    val c = new Configuration()
    confProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val (reader, recordSchema) = {
    val datum = new GenericDatumReader[GenericRecord]()
    val r = DataFileReader.openReader(new FsInput(new Path(file), conf), datum)
    // byte-range positioning: sync(start) lands on the first block
    // boundary at/after start (the header ends with the sync marker,
    // so start == 0 would find block one — but the whole-file path
    // skips the scan entirely); pastSync(end) in next() stops after
    // the last block owned by this range
    if (start > 0L) r.sync(start)
    val writer = r.getSchema
    // partition columns are PATH-authoritative: a writer field with a
    // partition column's name is decoder-skipped, never surfaced —
    // directory pruning decides on the path value, so the reader must
    // agree or pruned-away rows and read rows would disagree
    val wanted = required.fieldNames.filter(n =>
      n != corruptCol && !partVals.contains(n) && writer.getField(n) != null)
    if (wanted.length < writer.getFields.size()) {
      val projected = Schema.createRecord(writer.getName, writer.getDoc,
        writer.getNamespace, false,
        wanted.map { n =>
          val f = writer.getField(n)
          new Schema.Field(f.name(), f.schema(), f.doc())
        }.toList.asJava)
      datum.setExpected(projected)
      AvroSource.projectedReads.incrementAndGet()
      (r, projected)
    } else (r, writer)
  }
  // required-field index → POSITION in the decoded record's schema
  // (the projected one when pruning happened) plus the field's
  // union-unwrapped WRITER schema (decimal scale / array element for
  // coerce), resolved ONCE — a by-name get would pay a schema-field
  // hash lookup per field per row; -1 = the writer lacks the field
  // (constant null; the corrupt column is computed, not read)
  private val plan: Array[(StructField, Int, Schema)] =
    required.fields.map { f =>
      val af =
        if (f.name == corruptCol || partVals.contains(f.name)) None
        else Option(recordSchema.getField(f.name))
      (f, af.map(_.pos()).getOrElse(-1),
        af.map(x => AvroSource.nonNull(x.schema())).orNull)
    }
  private val corruptIdx = required.fieldNames.indexOf(corruptCol)

  // partition-directory columns: required fields whose values ride the
  // file PATH — coerced ONCE (the same null-on-failure contract as
  // data fields, INCLUDING the corrupt capture: a path value that
  // fails the asked type surfaces its raw text per row) and emitted as
  // per-row constants
  private val constInit: (Array[Any], String) = {
    var bad: String = null
    val cs: Array[Any] = plan.map { case (f, pos, _) =>
      if (pos < 0 && partVals.contains(f.name)) {
        val (v, b) = coerce(partVals(f.name), f.dataType)
        if (bad == null) b.foreach(bad = _)
        v
      } else null
    }
    (cs, bad)
  }
  private val constants: Array[Any] = constInit._1
  private val constBad: String = constInit._2

  // decode buffer reused across rows (every value is COPIED into the
  // emitted InternalRow by coerce, so reuse is safe)
  private var rec: GenericRecord = _
  private var row: InternalRow = _

  /** Null-on-failure coercion of one decoded Avro value to the asked
    * Spark type. Returns (catalyst value, raw-on-failure): a parse
    * failure yields (null, Some(raw writer text)). `ws` is the
    * (union-unwrapped) WRITER schema of the field when known — it
    * carries the decimal scale and the array element schema; null is
    * fine, only those two shapes consult it. Array elements coerce
    * per-element PERMISSIVE: a bad element nulls, the row survives.
    */
  private def coerce(v: AnyRef, dt: DataType,
      ws: Schema = null): (Any, Option[String]) = {
    if (v == null) return (null, None)
    dt match {
      case d: DecimalType =>
        val jbd: java.math.BigDecimal = v match {
          case b: java.nio.ByteBuffer
              if ws != null && ws.getLogicalType
                .isInstanceOf[org.apache.avro.LogicalTypes.Decimal] =>
            val scale = ws.getLogicalType
              .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getScale
            val bytes = new Array[Byte](b.remaining())
            b.duplicate().get(bytes)
            new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
          case other =>
            try new java.math.BigDecimal(other.toString.trim)
            catch { case _: NumberFormatException =>
              return (null, Some(other.toString)) }
        }
        val dec = org.apache.spark.sql.types.Decimal(jbd)
        return if (dec.changePrecision(d.precision, d.scale)) (dec, None)
               else (null, Some(jbd.toString)) // doesn't fit: overflow
      case ArrayType(et, _) =>
        v match {
          case c: java.util.Collection[_] =>
            val ews =
              if (ws != null && ws.getType == Schema.Type.ARRAY)
                AvroSource.nonNull(ws.getElementType)
              else null
            val out = new Array[Any](c.size())
            var bad: String = null
            val it = c.iterator()
            var j = 0
            while (it.hasNext) {
              val (ev, eb) = coerce(it.next().asInstanceOf[AnyRef], et, ews)
              out(j) = ev
              if (bad == null) eb.foreach(bad = _)
              j += 1
            }
            return (new org.apache.spark.sql.catalyst.util
              .GenericArrayData(out), Option(bad))
          case other => return (null, Some(other.toString))
        }
      case MapType(StringType, vt, _) =>
        v match {
          case m: java.util.Map[_, _] =>
            val vws =
              if (ws != null && ws.getType == Schema.Type.MAP)
                AvroSource.nonNull(ws.getValueType)
              else null
            val n = m.size()
            val keys = new Array[Any](n)
            val vals = new Array[Any](n)
            var bad: String = null
            val it = m.entrySet().iterator()
            var j = 0
            while (it.hasNext) {
              val e = it.next()
              keys(j) = UTF8String.fromString(e.getKey.toString)
              val (cv, cb) = coerce(e.getValue.asInstanceOf[AnyRef], vt, vws)
              vals(j) = cv
              if (bad == null) cb.foreach(bad = _)
              j += 1
            }
            return (new org.apache.spark.sql.catalyst.util
              .ArrayBasedMapData(
                new org.apache.spark.sql.catalyst.util
                  .GenericArrayData(keys),
                new org.apache.spark.sql.catalyst.util
                  .GenericArrayData(vals)), Option(bad))
          case other => return (null, Some(other.toString))
        }
      case nested: StructType =>
        v match {
          case r: GenericRecord =>
            // subfields match by NAME against the record's own schema
            // (struct-level schema evolution: absent subfields read
            // null, extra writer subfields are skipped)
            val rs = r.getSchema
            val out = new Array[Any](nested.length)
            var bad: String = null
            var j = 0
            while (j < nested.length) {
              val f = nested.fields(j)
              val wf = rs.getField(f.name)
              if (wf != null) {
                val (cv, cb) = coerce(r.get(wf.pos()), f.dataType,
                  AvroSource.nonNull(wf.schema()))
                out(j) = cv
                if (bad == null) cb.foreach(bad = _)
              }
              j += 1
            }
            return (new GenericInternalRow(out), Option(bad))
          case other => return (null, Some(other.toString))
        }
      case _ =>
    }
    def num[T](parse: String => T): (Any, Option[String]) = v match {
      case s: CharSequence =>
        try (parse(s.toString.trim), None)
        catch { case _: NumberFormatException => (null, Some(s.toString)) }
      case other =>
        try (parse(other.toString), None)
        catch { case _: NumberFormatException => (null, Some(other.toString)) }
    }
    (v, dt) match {
      case (l: java.lang.Long, LongType) => (l.longValue(), None)
      case (i: java.lang.Integer, LongType) => (i.longValue(), None)
      case (i: java.lang.Integer, IntegerType) => (i.intValue(), None)
      // logical-type wire formats pass straight into the catalyst
      // encodings (micros / days) — the write side's exact inverses
      case (l: java.lang.Long, TimestampType) => (l.longValue(), None)
      case (l: java.lang.Long, TimestampNTZType) => (l.longValue(), None)
      case (i: java.lang.Integer, DateType) => (i.intValue(), None)
      case (b: java.nio.ByteBuffer, BinaryType) =>
        val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
        (a, None)
      case (l: java.lang.Long, IntegerType) =>
        if (l >= Int.MinValue && l <= Int.MaxValue) (l.intValue(), None)
        else (null, Some(l.toString))
      // ISO date text → days (partition-directory values, and the
      // generic PERMISSIVE str→date path)
      case (s: CharSequence, DateType) =>
        try (java.time.LocalDate.parse(s.toString.trim).toEpochDay.toInt,
          None)
        catch { case _: java.time.DateTimeException =>
          (null, Some(s.toString)) }
      case (d: java.lang.Double, DoubleType) => (d.doubleValue(), None)
      case (f: java.lang.Float, DoubleType) => (f.doubleValue(), None)
      case (i: java.lang.Integer, DoubleType) => (i.doubleValue(), None)
      case (l: java.lang.Long, DoubleType) => (l.doubleValue(), None)
      case (f: java.lang.Float, FloatType) => (f.floatValue(), None)
      case (b: java.lang.Boolean, BooleanType) => (b.booleanValue(), None)
      case (_, StringType) => (UTF8String.fromString(v.toString), None)
      case (_, LongType) => num(_.toLong)
      case (_, IntegerType) => num(_.toInt)
      case (_, DoubleType) => num(_.toDouble)
      case (_, FloatType) => num(_.toFloat)
      case (_, BooleanType) => v.toString.trim.toLowerCase match {
        case "true" => (true, None)
        case "false" => (false, None)
        case other => (null, Some(other))
      }
      case _ => (null, Some(v.toString))
    }
  }

  // pushed-limit truncation: rows emitted by THIS partition (Spark's
  // own Limit still applies on top — see AvroScanBuilder.pushLimit)
  private var emitted = 0

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    if (end != AvroSource.NoEnd && reader.pastSync(end)) return false
    if (!reader.hasNext) return false
    rec = reader.next(rec)
    val out = new Array[Any](plan.length)
    var firstBad: String = constBad // a bad partition value taints every row
    var i = 0
    while (i < plan.length) {
      val (f, pos, ws) = plan(i)
      if (pos >= 0) {
        val (value, bad) = coerce(rec.get(pos), f.dataType, ws)
        out(i) = value
        if (firstBad == null) bad.foreach(firstBad = _)
      } else out(i) = constants(i) // partition-path value or null
      i += 1
    }
    if (corruptIdx >= 0 && firstBad != null)
      out(corruptIdx) = UTF8String.fromString(firstBad)
    row = new GenericInternalRow(out)
    emitted += 1
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

package graft.sources

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.fs.{FileStatus, Path}

/** Incremental, delta-compacted per-file stats sidecar shared by the
  * graft-avro and graft-tle landing sources.
  *
  * The r14 sidecar was monolithic: every `writeIndex` re-statted EVERY
  * landing file (a full read of the whole history per refresh) and
  * rewrote one `_index.json` — O(|files|) work per call, at the
  * 8M-file design point a refresh cost that grows with history instead
  * of delta. This store follows the FileSetLedger pattern instead:
  *
  *   - `_index.json` — the BASE: one JSON object `rel → statsNode`
  *     (exactly the r14 wire shape, so pre-existing indexes read
  *     unchanged) plus a reserved `_seq` field (data file names can
  *     never start with `_` — FsListing hides them — so the key can't
  *     collide);
  *   - `_index.delta-<seq>-<uuid>.json` — DELTAS: `{"seq": n,
  *     "add": {rel → statsNode}, "drop": [rel, ...]}`, one per
  *     incremental refresh, applied over the base in seq order.
  *
  * [[update]] stats ONLY files absent from the merged index (the
  * expensive part — each stat is a full read of that landing file) and
  * writes one O(delta) delta file; after [[CompactThreshold]] deltas it
  * folds everything into a fresh base and deletes the applied deltas.
  * Both writes publish by write-then-rename. Crash safety: a crash
  * after the base rename but before delta deletion re-applies the
  * deltas over a base that already contains them — adds are
  * idempotent (same file ⇒ same stats; landing files are immutable and
  * names are job-unique) and re-drops of absent keys are no-ops.
  *
  * [[read]] merges base + deltas with a driver-side cache keyed by the
  * index files' (name, length, mtime) fingerprint: repeated scan
  * plannings over an unchanged index parse ZERO bytes — the r14 cost
  * of one monolithic JSON parse per planned scan is paid once per
  * index change instead.
  *
  * The staleness contract is unchanged and direction-safe: a file
  * landed after the last update is absent from the index and always
  * scans — a stale index skips less, never loses records.
  */
/** Post-commit archival for the file-set landing streams (`archiveDir`
  * read option): once a micro-batch COMMITS, its files are moved out of
  * the landing into the archive (relative paths preserved), so
  * `latestOffset`'s per-trigger directory listing stays O(live files)
  * on a long-lived landing instead of growing with all of history.
  *
  * Exactly-once is preserved across the boundary by construction: only
  * files inside a committed end-offset move (they are fully processed
  * and durably recorded as seen), the offset keeps their NAMES (so the
  * new-minus-seen admission math is untouched), and a moved file is
  * simply absent from later listings — it can never be re-admitted.
  * An uncommitted batch's files never move, so restart replay still
  * finds them in the landing. A rename that fails is retried on the
  * next commit (the file stays both listed and seen — harmless).
  *
  * One-batch lag: the engine calls a source's `commit(N)` when batch
  * N+1 starts, so the FINAL batch of a run moves on the next run's
  * first trigger — the landing therefore lists at most one batch of
  * already-processed files between runs (the same lag Spark's own
  * FileStreamSource cleanup has). The listing stays O(live + one
  * batch) either way.
  */
object LandingArchive {

  /** The archive must not be VISIBLE inside a landing target: a moved
    * file reappearing in the landing listing under a new name would
    * re-process. Inside a target it must sit under a hidden (`_`/`.`)
    * component, which FsListing never lists. Paths are NORMALIZED
    * before the containment check — `<landing>/./archive` or
    * `<landing>/x/../archive` must not sneak past a textual prefix
    * test while Hadoop resolves them to a visible subdirectory. */
  def validate(targets: Seq[String], archiveDir: String): Unit = {
    def norm(s: String): String = {
      val u = new Path(s).toUri
      val p = java.nio.file.Paths.get(u.getPath).normalize().toString
      Option(u.getScheme).map(sch =>
        s"$sch://${Option(u.getAuthority).getOrElse("")}").getOrElse("") + p
    }
    val arch = norm(archiveDir)
    targets.foreach { t0 =>
      val t = norm(t0)
      if (arch == t || arch.startsWith(t + "/")) {
        val first = arch.stripPrefix(t + "/").takeWhile(_ != '/')
        require(first.startsWith("_") || first.startsWith("."),
          s"archiveDir '$archiveDir' sits visibly inside the landing " +
            s"'$t0' — moved files would re-list as new data; use a " +
            "directory outside the landing or a '_'-prefixed subdir")
      }
    }
  }

  /** Move every not-yet-archived file of a committed offset out of its
    * landing target into `archiveDir`. `archived` is the per-stream
    * memo so repeat commits don't re-stat the whole history — the
    * first commit after a restart pays one existence check per seen
    * file, later commits O(batch). */
  def moveCommitted(targets: Seq[String], archiveDir: String,
      files: Seq[String],
      archived: scala.collection.mutable.Set[String]): Unit = {
    val conf = FileSetLedger.hadoopConf()
    files.filterNot(archived).foreach { f =>
      val src = new Path(f)
      val fs = src.getFileSystem(conf)
      if (!fs.exists(src)) archived += f // already moved (prior run)
      else {
        val rel = targets.collectFirst {
          case t if f.startsWith(if (t.endsWith("/")) t else t + "/") =>
            f.stripPrefix(if (t.endsWith("/")) t else t + "/")
        }.getOrElse(src.getName)
        val dest = new Path(archiveDir, rel)
        fs.mkdirs(dest.getParent)
        if (fs.rename(src, dest)) archived += f
        // else: leave listed AND seen — retried next commit, never lost
      }
    }
  }
}

object SidecarIndex {

  /** Delta files folded into a fresh base once their count would pass
    * this — bounds the per-read file count and keeps reads O(|files|)
    * bytes rather than O(|files| + history). */
  val CompactThreshold = 8

  /** Files statted by the most recent [[update]] on this driver — the
    * spec's witness that a refresh over +1 new file stats exactly 1. */
  private[graft] val lastStatted =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Total index bytes actually read from storage (cache misses only) —
    * the spec's witness that repeated reads of an unchanged index are
    * free. */
  private[graft] val indexBytesRead =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private val BaseName = "_index.json"
  private val DeltaPrefix = "_index.delta-"

  private final case class Layout(base: Option[FileStatus],
      deltas: Seq[(Long, FileStatus)]) {
    def fingerprint: Vector[(String, Long, Long)] =
      (base.toSeq ++ deltas.map(_._2)).map(st =>
        (st.getPath.getName, st.getLen, st.getModificationTime))
        .sortBy(_._1).toVector
  }

  // dir → (index-file fingerprint, merged rel → statsNode, base _seq).
  // JsonNodes are treated as immutable once parsed; entries are
  // replaced whole. The base seq rides the cache so update() never
  // re-reads the base file just to learn it.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, (Vector[(String, Long, Long)], Map[String, JsonNode], Long)]()

  private def layout(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Layout = {
    if (!fs.exists(dir)) return Layout(None, Nil)
    val sts = fs.listStatus(dir)
    val base = sts.find(_.getPath.getName == BaseName)
    val deltas = sts.toSeq
      .filter(_.getPath.getName.startsWith(DeltaPrefix))
      .flatMap { st =>
        val rest = st.getPath.getName.stripPrefix(DeltaPrefix)
        scala.util.Try(rest.takeWhile(_ != '-').toLong).toOption
          .map(_ -> st)
      }
      .sortBy { case (seq, st) => (seq, st.getPath.getName) }
    Layout(base, deltas)
  }

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
      st: FileStatus): String = {
    val in = fs.open(st.getPath)
    val text = try {
      new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    indexBytesRead.addAndGet(st.getLen)
    text
  }

  /** The merged index for `dir`, keyed by relative path; empty when no
    * index exists. Cached by index-file fingerprint. */
  def read(dir: String): Map[String, JsonNode] = readWithSeq(dir)._1

  /** [[read]] plus the base file's `_seq` (0 when absent/legacy) —
    * what [[update]] needs without a second base parse. */
  private def readWithSeq(dir: String): (Map[String, JsonNode], Long) = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(FileSetLedger.hadoopConf())
    val lay = layout(fs, dirPath)
    if (lay.base.isEmpty && lay.deltas.isEmpty) return (Map.empty, 0L)
    val fp = lay.fingerprint
    val hit = cache.get(dir)
    if (hit != null && hit._1 == fp) return (hit._2, hit._3)
    val m = new ObjectMapper()
    var baseSeq = 0L
    val merged = mutable.LinkedHashMap.empty[String, JsonNode]
    lay.base.foreach { st =>
      val node = m.readTree(readText(fs, st))
      val sq = node.get("_seq")
      if (sq != null) baseSeq = sq.asLong()
      val it = node.fieldNames()
      while (it.hasNext) {
        val k = it.next()
        if (!k.startsWith("_")) merged += k -> node.get(k)
      }
    }
    lay.deltas.foreach { case (_, st) =>
      val node = m.readTree(readText(fs, st))
      val add = node.get("add")
      if (add != null) {
        val it = add.fieldNames()
        while (it.hasNext) { val k = it.next(); merged += k -> add.get(k) }
      }
      val drop = node.get("drop")
      if (drop != null) {
        val it = drop.elements()
        while (it.hasNext) merged -= it.next().asText()
      }
    }
    val out = merged.toMap
    // crude bound: a driver planning over many distinct landings must
    // not accumulate every parsed index forever
    if (cache.size >= 64) cache.clear()
    cache.put(dir, (fp, out, baseSeq))
    (out, baseSeq)
  }

  private def publish(fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      destName: String, text: String): Unit = {
    val tmp = new Path(dir, s"._sidecar-${java.util.UUID.randomUUID}.tmp")
    val out = fs.create(tmp, false)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dest = new Path(dir, destName)
    fs.delete(dest, false)
    require(fs.rename(tmp, dest), s"sidecar index publish failed: $dest")
  }

  /** Direct entry publication — the SELF-INDEXING write path: the
    * caller already holds each new file's stats (collected inline
    * while writing), so no listing and no statting happens here at
    * all. One O(entries) delta file (fresh base when no index exists;
    * fold when the chain would outgrow [[CompactThreshold]]). Safe
    * under concurrent writers: delta names are uuid-unique and adds
    * are idempotent per (job-unique) file name.
    */
  def append(dir: String, entries: Seq[(String, ObjectNode)]): Unit = {
    if (entries.isEmpty) return
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(FileSetLedger.hadoopConf())
    val lay = layout(fs, dirPath)
    val m = new ObjectMapper()
    if (lay.base.isEmpty && lay.deltas.isEmpty) {
      val root = m.createObjectNode()
      root.put("_seq", 1L)
      entries.foreach { case (rel, node) =>
        root.set[ObjectNode](rel, node); ()
      }
      publish(fs, dirPath, BaseName, m.writeValueAsString(root))
    } else {
      val (existing, baseSeq) = readWithSeq(dir)
      val maxSeq = (baseSeq +: lay.deltas.map(_._1)).max
      if (lay.deltas.size + 1 > CompactThreshold) {
        val root = m.createObjectNode()
        root.put("_seq", maxSeq + 1)
        existing.foreach { case (rel, node) =>
          root.set[JsonNode](rel, node); ()
        }
        entries.foreach { case (rel, node) =>
          root.set[ObjectNode](rel, node); ()
        }
        publish(fs, dirPath, BaseName, m.writeValueAsString(root))
        lay.deltas.foreach { case (_, st) => fs.delete(st.getPath, false) }
      } else {
        val root = m.createObjectNode()
        root.put("seq", maxSeq + 1)
        val add = root.putObject("add")
        entries.foreach { case (rel, node) =>
          add.set[ObjectNode](rel, node); ()
        }
        publish(fs, dirPath,
          f"$DeltaPrefix${maxSeq + 1}%06d-${java.util.UUID.randomUUID.toString.take(8)}.json",
          m.writeValueAsString(root))
      }
    }
  }

  /** Incremental refresh: stat ONLY the data files under `dir` that
    * the merged index does not yet hold (`statNew` runs the caller's
    * distributed stats pass over exactly those), record vanished files
    * as drops, and publish either one O(delta) delta file or — when
    * the delta chain would outgrow [[CompactThreshold]], or no base
    * exists yet — a compacted base. Returns the number of files
    * statted (also mirrored in [[lastStatted]]).
    */
  def update(dir: String,
      statNew: Seq[String] => Seq[(String, ObjectNode)]): Int = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(FileSetLedger.hadoopConf())
    val rels = graft.util.FsListing.dataFiles(dir).map(_._1)
    val (existing, baseSeq) = readWithSeq(dir)
    val listed = rels.toSet
    val newRels = rels.filterNot(existing.keySet)
    val dropped = existing.keySet.filterNot(listed).toSeq.sorted
    val added = statNew(newRels)
    lastStatted.set(newRels.size.toLong)
    val lay = layout(fs, dirPath)
    val m = new ObjectMapper()
    val maxSeq = (baseSeq +: lay.deltas.map(_._1)).max
    val compact = lay.base.isEmpty ||
      lay.deltas.size + 1 > CompactThreshold
    if (compact) {
      val root = m.createObjectNode()
      root.put("_seq", maxSeq + 1)
      (existing -- dropped).foreach { case (rel, node) =>
        root.set[ObjectNode](rel, node); ()
      }
      added.foreach { case (rel, node) => root.set[ObjectNode](rel, node); () }
      publish(fs, dirPath, BaseName, m.writeValueAsString(root))
      // applied deltas are redundant now; a crash before these deletes
      // re-applies them idempotently over the new base
      lay.deltas.foreach { case (_, st) => fs.delete(st.getPath, false) }
    } else if (added.nonEmpty || dropped.nonEmpty) {
      val root = m.createObjectNode()
      root.put("seq", maxSeq + 1)
      val add = root.putObject("add")
      added.foreach { case (rel, node) => add.set[ObjectNode](rel, node); () }
      val drop = root.putArray("drop")
      dropped.foreach(drop.add)
      publish(fs, dirPath,
        f"$DeltaPrefix${maxSeq + 1}%06d-${java.util.UUID.randomUUID.toString.take(8)}.json",
        m.writeValueAsString(root))
    }
    newRels.size
  }
}

package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LocalCheckpointFileManager

/** The r15 fork-free local checkpoint manager: the CheckpointFileManager
  * contract HDFSMetadataLog and the state stores rely on — atomic
  * publish, loser-fails-on-existing, cancel leaves nothing behind, and
  * list/open/delete round-trips (see LocalCheckpointFileManager's
  * scaladoc for the measured fork-storm it replaces).
  */
class LocalCheckpointFileManagerSpec extends AnyFunSuite {

  private def mgr(root: String) =
    new LocalCheckpointFileManager(new Path(root), new Configuration())

  private def scratch() =
    Files.createTempDirectory("graft-ckpt-fm-").toString

  test("createAtomic publishes on close and is readable back") {
    val root = scratch()
    val m = mgr(root)
    val p = new Path(s"$root/offsets/0")
    val out = m.createAtomic(p, overwriteIfPossible = false)
    out.write("v1\nbatch0".getBytes("UTF-8"))
    out.close()
    assert(m.exists(p))
    val in = m.open(p)
    val text = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    assert(text == "v1\nbatch0")
    // no temp litter next to the published file
    val names = Files.list(Paths.get(s"$root/offsets")).toArray.map(_.toString)
    assert(names.length == 1, names.mkString(","))
  }

  test("non-overwrite close onto an existing file fails the LOSER and " +
      "keeps the winner's bytes (the HDFSMetadataLog race contract)") {
    val root = scratch()
    val m = mgr(root)
    val p = new Path(s"$root/commits/7")
    val w = m.createAtomic(p, overwriteIfPossible = false)
    w.write("winner".getBytes("UTF-8")); w.close()
    val l = m.createAtomic(p, overwriteIfPossible = false)
    l.write("loser".getBytes("UTF-8"))
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] { l.close() }
    val in = m.open(p)
    val text = try scala.io.Source.fromInputStream(in).mkString
      finally in.close()
    assert(text == "winner")
    val names = Files.list(Paths.get(s"$root/commits")).toArray.map(_.toString)
    assert(names.length == 1, s"loser temp must be cleaned: ${names.toSeq}")
  }

  test("overwrite close replaces atomically; cancel deletes the temp") {
    val root = scratch()
    val m = mgr(root)
    val p = new Path(s"$root/state/1.delta")
    val a = m.createAtomic(p, overwriteIfPossible = true)
    a.write("old".getBytes("UTF-8")); a.close()
    val b = m.createAtomic(p, overwriteIfPossible = true)
    b.write("new".getBytes("UTF-8")); b.close()
    val in = m.open(p)
    assert(scala.io.Source.fromInputStream(in).mkString == "new")
    in.close()
    val c = m.createAtomic(p, overwriteIfPossible = true)
    c.write("never".getBytes("UTF-8")); c.cancel()
    val names = Files.list(Paths.get(s"$root/state")).toArray.map(_.toString)
    assert(names.length == 1, s"cancel must leave no temp: ${names.toSeq}")
  }

  test("list filters, missing-dir list is empty, delete is idempotent") {
    val root = scratch()
    val m = mgr(root)
    m.mkdirs(new Path(s"$root/d"))
    Seq("0", "1", ".0.tmp").foreach { n =>
      Files.write(Paths.get(s"$root/d/$n"), "x".getBytes("UTF-8")); ()
    }
    val listed = m.list(new Path(s"$root/d"),
      (p: Path) => !p.getName.startsWith("."))
    assert(listed.map(_.getPath.getName).sorted.toSeq == Seq("0", "1"))
    assert(m.list(new Path(s"$root/absent")).isEmpty)
    m.delete(new Path(s"$root/d"))
    assert(!m.exists(new Path(s"$root/d")))
    m.delete(new Path(s"$root/d")) // absent: no-op, no throw
    assert(m.isLocal)
    assert(m.createCheckpointDirectory().toUri.getPath ==
      new Path(root).toUri.getPath)
  }
}

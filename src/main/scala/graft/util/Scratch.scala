package graft.util

import java.nio.file.{Files, Path}

/** Process-lifetime scratch directories. Query builders that materialize
  * a warehouse / landing fixture (q46, q50, q52, q56, q61, q62, q74,
  * q76, q79, q81, q83, q89, q96, q100) previously leaked one temp dir
  * per build — unbounded disk across repeated bench/correctness runs.
  * Every dir handed out here is recursively deleted by one JVM shutdown
  * hook, so a run cleans up after itself no matter how many times each
  * query was built.
  */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    created.forEach { p =>
      try deleteRecursively(p) catch { case _: java.io.IOException => () }
    }
  }, "graft-scratch-cleanup"))

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }

  /** A fresh temp directory, deleted (recursively) at JVM exit. */
  def dir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p
  }
}

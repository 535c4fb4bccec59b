package graft.util

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The one place that decides what counts as a DATA file under a root:
  * recursive listing, excluding hidden/temp components (`_`/`.` prefix)
  * at ANY depth — a crashed writer's `_temporary/...` leftovers and
  * checksum `.crc` files must never be data (same rule as Spark's
  * InMemoryFileIndex). Shared by the DSv2 TLE source and the warehouse
  * maintenance ops so the two can't drift.
  */
object FsListing {

  /** (relative path, byte size) of every data file under `root`, sorted
    * by relative path; empty if the root does not exist. Listed with the
    * active session's Hadoop configuration.
    *
    * @param parallelism >1 fans the first directory level out over a
    *   bounded pool — a date-partitioned write leaves hundreds of
    *   one-file directories, and serial per-directory listing was the
    *   dominant cost of the warehouse's staged commit (measured 2.7 s
    *   for 366 dirs, ~60 ms parallel).
    */
  def dataFiles(root: String, parallelism: Int = 1): Seq[(String, Long)] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) return Seq.empty
    val rootUri = fs.makeQualified(rootPath).toUri
    def hiddenName(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(p: Path): Seq[(String, Long)] = {
      val buf = ArrayBuffer.empty[(String, Long)]
      fs.listStatus(p).foreach { st =>
        if (!hiddenName(st.getPath.getName)) {
          if (st.isDirectory) buf ++= walk(st.getPath)
          else buf += rootUri.relativize(
            fs.makeQualified(st.getPath).toUri).getPath -> st.getLen
        }
      }
      buf.toSeq
    }
    val out =
      if (parallelism <= 1) walk(rootPath)
      else {
        val top = fs.listStatus(rootPath).toSeq
          .filterNot(st => hiddenName(st.getPath.getName))
        val (dirs, files) = top.partition(_.isDirectory)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.max(1, math.min(parallelism, dirs.size max 1)))
        try {
          val futs = dirs.map(d =>
            pool.submit(new java.util.concurrent.Callable[Seq[(String, Long)]] {
              override def call(): Seq[(String, Long)] = walk(d.getPath)
            }))
          files.map(st => rootUri.relativize(
            fs.makeQualified(st.getPath).toUri).getPath -> st.getLen) ++
            futs.flatMap(_.get())
        } finally { pool.shutdown(); () }
      }
    out.sortBy(_._1)
  }
}

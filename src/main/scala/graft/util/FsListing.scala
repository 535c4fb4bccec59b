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
    */
  def dataFiles(root: String): Seq[(String, Long)] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(conf)
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val rootUri = fs.makeQualified(rootPath).toUri
      val it = fs.listFiles(rootPath, true)
      val buf = ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        val rel = rootUri.relativize(fs.makeQualified(f.getPath).toUri).getPath
        val hidden = rel.split('/')
          .exists(c => c.startsWith("_") || c.startsWith("."))
        if (f.isFile && !hidden) buf += (rel -> f.getLen)
      }
      buf.sortBy(_._1).toSeq
    }
  }
}

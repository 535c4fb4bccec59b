package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** Operational surface: VACUUM DRY RUN (report without deleting),
  * RESTORE TIMESTAMP AS OF (rollback by wall clock), and FSCK (the
  * read-only manifest ↔ filesystem audit).
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType)))

  private def fresh(retain: Boolean = true): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-ops-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = retain,
      specs = Map("t" -> Warehouse.TableSpec(schema)))
    wh.bootstrap()
    wh.registerSql("ops_")
    (wh, dir)
  }

  private def rows(ids: Range) =
    ids.map(i => (i.toLong, i * 1.0)).toDF("id", "val")

  test("VACUUM DRY RUN counts without deleting; real vacuum matches") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0 until 20))
    wh.overwrite("t", rows(100 until 110)) // old files now collectable
    val before = graft.util.FsListing.dataFiles(s"$dir/t").size
    val dry = spark.sql("VACUUM ops_t RETAIN 1 VERSIONS DRY RUN")
      .head().getLong(0)
    assert(dry > 0L)
    assert(graft.util.FsListing.dataFiles(s"$dir/t").size === before,
      "dry run must not delete anything")
    val real = spark.sql("VACUUM ops_t RETAIN 1 VERSIONS").head().getLong(0)
    assert(real === dry)
    assert(graft.util.FsListing.dataFiles(s"$dir/t").size
      === before - real.toInt)
  }

  test("RESTORE TIMESTAMP AS OF rolls back by wall clock") {
    val (wh, _) = fresh()
    wh.append("t", rows(0 until 10)) // v2
    // a timestamp safely in the future resolves to the CURRENT head;
    // restoring to it is a no-op commit-wise
    spark.sql("RESTORE TABLE ops_t TO TIMESTAMP AS OF '2099-01-01 00:00:00'")
    val vHead = wh.versions("t").max
    Thread.sleep(150) // keep v2/v3 manifest modtimes distinguishable
    wh.append("t", rows(10 until 30)) // v3
    assert(wh.read("t").count() === 30L)
    // pin the boundary with v2's own commit time, formatted in the UTC
    // zone the statement parser uses
    val ts = java.time.Instant.ofEpochMilli(wh.commitTimeMillis("t", vHead))
      .atZone(java.time.ZoneId.of("UTC")).toLocalDateTime
      .toString.replace('T', ' ')
    spark.sql(s"RESTORE TABLE ops_t TO TIMESTAMP AS OF '$ts'")
    assert(wh.read("t").count() === 10L)
    assert(wh.history("t").last._2("op") === "restore")
  }

  test("FSCK REPAIR drops lost entries and clears lost vectors") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0 until 10), rowsPerFile = 2) // 5 files
    wh.deleteVectored("t", col("id") === 3L)
    // lose one data file and the deletion-vector sidecar externally
    val files = graft.util.FsListing.dataFiles(s"$dir/t")
      .map(_._1).filterNot(_.startsWith("_")).sorted
    new java.io.File(s"$dir/t/${files.head}").delete()
    new java.io.File(s"$dir/t/_dv").listFiles().foreach(_.delete())
    intercept[Exception] { wh.read("t").count() } // unreadable as-is
    val r = spark.sql("FSCK REPAIR TABLE ops_t").head()
    assert(r.getLong(0) === 1L && r.getLong(1) >= 1L)
    // readable again: the lost file's rows are gone (acknowledged),
    // the vectored row RESURFACES (conservative direction)
    val ids = wh.read("t").select("id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L))
    assert(ids.size === 8) // 10 - 2 rows of the lost file
    assert(spark.sql("FSCK TABLE ops_t").collect()
      .forall(_.getString(0) != "error"))
    assert(wh.history("t").last._2("op") === "repair")
  }

  test("FSCK's damage scan runs as a Spark job above the probe " +
    "threshold, result-identical to the serial loop (repair included)") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0 until 10), rowsPerFile = 2) // 5 files
    wh.deleteVectored("t", col("id") === 3L)
    val files = graft.util.FsListing.dataFiles(s"$dir/t")
      .map(_._1).filterNot(_.startsWith("_")).sorted
    new java.io.File(s"$dir/t/${files.head}").delete()
    new java.io.File(s"$dir/t/_dv").listFiles().foreach(_.delete())
    // serial findings first (read-only), then the job path must agree
    val serial = wh.fsck("t").filter(_._1 == "error")
    wh.bloomProbeDistributedThreshold = 1 // every scan goes distributed
    val jobbed = wh.fsck("t").filter(_._1 == "error")
    assert(jobbed === serial)
    assert(jobbed.exists(_._2 == "missing-file") &&
      jobbed.exists(_._2 == "missing-dv"))
    // repair through the distributed scan behaves identically
    val (droppedN, clearedN) = wh.repairTable("t")
    assert(droppedN === 1L && clearedN >= 1L)
    val ids = wh.read("t").select("id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(3L) && ids.size === 8)
    assert(wh.fsck("t").forall(_._1 != "error"))
  }

  test("FSCK: healthy is empty; missing file and orphan are reported") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0 until 10))
    assert(spark.sql("FSCK TABLE ops_t").collect().isEmpty)
    // delete a live data file behind the manifest's back
    val live = graft.util.FsListing.dataFiles(s"$dir/t").head._1
    new java.io.File(s"$dir/t/$live").delete()
    val issues = spark.sql("FSCK TABLE ops_t").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(issues.contains(("error", "missing-file")))
    // an orphan parquet (uncommitted leftovers) reports as info
    rows(500 until 505).coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/t/orphans")
    val issues2 = spark.sql("FSCK TABLE ops_t").collect()
      .map(r => r.getString(1)).toSeq
    assert(issues2.contains("orphan-file"))
  }
}

package graft

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

import graft.ingest.TleText

/** DataSource V2 TLE source: record assembly parity with the RDD path,
  * reference edge-strip semantics, partial-trailer drop, column
  * pruning, and multi-file parallel reads.
  */
class TleSourceSpec extends SparkSpec {

  import spark.implicits._

  private def write(dir: String, name: String, text: String): Unit =
    Files.write(Paths.get(dir, name), text.getBytes(StandardCharsets.UTF_8))

  test("triples assemble per file; partial trailer and edge blanks drop") {
    val dir = Files.createTempDirectory("graft-tlesrc-").toString
    // leading + trailing blanks must not shift alignment; the interior
    // blank IS line content (reference .strip().splitlines() parity);
    // the trailing (name, l1) pair is a partial record -> dropped
    write(dir, "part-0.txt",
      "\n\nSAT-A\n1 11111U\n2 11111\nSAT-B\n\n1 22222U\nSAT-C\n1 33333U\n\n\n")
    val got = spark.read.format("graft-tle").load(dir)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("SAT-A", "1 11111U", "2 11111"),
      ("SAT-B", "", "1 22222U"))) // interior blank counts as l1
  }

  test("matches TleText.triples on a single ordered payload") {
    val dir = Files.createTempDirectory("graft-tlesrc2-").toString
    val recs = (1 to 40).map(i => s"SAT-$i\n1 ${i}U\n2 $i").mkString("\n")
    write(dir, "payload.txt", recs + "\nTRAILING-NAME\n1 partial")
    val viaSource = spark.read.format("graft-tle").load(dir)
      .as[(String, String, String)].collect().toSet
    val viaRdd = TleText.triples(spark, s"$dir/payload.txt")
      .select("sat_name", "l1", "l2")
      .as[(String, String, String)].collect().toSet
    assert(viaSource === viaRdd)
    assert(viaSource.size === 40)
  }

  test("column pruning reaches the scan") {
    val dir = Files.createTempDirectory("graft-tlesrc3-").toString
    write(dir, "p.txt", "SAT-A\nl1\nl2\n")
    val df = spark.read.format("graft-tle").load(dir).select("sat_name")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("columns=sat_name"), scan)
    assert(df.as[String].collect().toSeq === Seq("SAT-A"))
  }

  test("multiple files read in parallel partitions, records intact") {
    val dir = Files.createTempDirectory("graft-tlesrc4-").toString
    (0 until 4).foreach { p =>
      write(dir, s"part-$p.txt",
        (0 until 5).map(i => s"SAT-$p-$i\n1 $p$i\n2 $p$i").mkString("\n"))
    }
    val df = spark.read.format("graft-tle").load(dir)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 20)
    assert(df.select("sat_name").distinct().count() === 20)
  }

  test("micro-batch stream picks up only new files per batch, resumes from checkpoint") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-tlestream-").toString
    val ckp = Files.createTempDirectory("graft-tlestream-ckp-").toString
    write(dir, "part-0.txt", "SAT-A\n1 A1\n2 A2\nSAT-B\n1 B1\n2 B2\n")

    val out = Files.createTempDirectory("graft-tlestream-out-").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-tle").load(dir)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(out)
      .as[(String, String, String)].collect().toSet
    assert(first === Set(("SAT-A", "1 A1", "2 A2"), ("SAT-B", "1 B1", "2 B2")))

    // a new file lands — a restart from the SAME checkpoint must emit
    // only its records (part-0 is in the committed offset), even though
    // its name sorts BEFORE the already-seen file
    write(dir, ".hidden.txt", "ignored hidden file\n1 X\n2 X\n")
    write(dir, "another-1.txt", "SAT-C\n1 C1\n2 C2\n")
    runOnce()
    val second = spark.read.parquet(out)
      .as[(String, String, String)].collect().toSet
    assert(second === first + (("SAT-C", "1 C1", "2 C2")))
  }

  private def noradLine(id: Int) = f"1 $id%05dU 98067A   26012.5"

  /** Three landing files with disjoint name prefixes + norad ranges. */
  private def indexedDir(): String = {
    val dir = Files.createTempDirectory("graft-tleidx-").toString
    write(dir, "a.txt", (0 until 3).map(i =>
      s"ALPHA-$i\n${noradLine(100 + i)}\n2 x").mkString("\n"))
    write(dir, "b.txt", (0 until 3).map(i =>
      s"BETA-$i\n${noradLine(200 + i)}\n2 x").mkString("\n"))
    write(dir, "c.txt", (0 until 3).map(i =>
      s"GAMMA-$i\n${noradLine(300 + i)}\n2 x").mkString("\n"))
    graft.sources.TleSource.writeIndex(spark, dir)
    dir
  }

  test("pushed name filters skip whole files via the stats index") {
    val dir = indexedDir()
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("graft-tle").load(dir)
      .where(col("sat_name").startsWith("BETA"))
    // one of three files survives planning; the scan advertises the push
    assert(df.rdd.getNumPartitions === 1, "files not skipped")
    val scan = df.queryExecution.executedPlan
      .collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.description()
      }.getOrElse("")
    assert(scan.contains("PushedFilters") && scan.contains("BETA"), scan)
    // and the rows are exactly the BETA records (Spark re-applies the
    // residual filter on top — pushdown is never a correctness gate)
    assert(df.select("sat_name").as[String].collect().sorted ===
      Array("BETA-0", "BETA-1", "BETA-2"))

    // equality + range shapes skip too
    assert(spark.read.format("graft-tle").load(dir)
      .where(col("sat_name") === "GAMMA-1").rdd.getNumPartitions === 1)
    assert(spark.read.format("graft-tle").load(dir)
      .where(col("sat_name") >= "GAMMA").rdd.getNumPartitions === 1)
  }

  test("norad-range options skip files and filter rows") {
    val dir = indexedDir()
    val mid = spark.read.format("graft-tle")
      .option("noradMin", 200).option("noradMax", 299).load(dir)
    assert(mid.rdd.getNumPartitions === 1)
    assert(mid.count() === 3)
    // a range straddling two files keeps both, drops out-of-range rows
    val straddle = spark.read.format("graft-tle")
      .option("noradMin", 102).option("noradMax", 201).load(dir)
    assert(straddle.rdd.getNumPartitions === 2)
    assert(straddle.select("sat_name").as[String].collect().sorted ===
      Array("ALPHA-2", "BETA-0", "BETA-1"))
  }

  test("files landed after the index write are still scanned (stale-safe)") {
    val dir = indexedDir()
    write(dir, "late.txt", s"BETA-LATE\n${noradLine(250)}\n2 x")
    import org.apache.spark.sql.functions.col
    val df = spark.read.format("graft-tle").load(dir)
      .where(col("sat_name").startsWith("BETA"))
    // b.txt (indexed, matching) + late.txt (unindexed, always scanned)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 4)
    // without any index at all, nothing skips but results are identical
    val plain = Files.createTempDirectory("graft-tlenoidx-").toString
    write(plain, "a.txt", s"ALPHA-0\n${noradLine(100)}\n2 x")
    write(plain, "b.txt", s"BETA-0\n${noradLine(200)}\n2 x")
    val noIdx = spark.read.format("graft-tle").load(plain)
      .where(col("sat_name").startsWith("BETA"))
    assert(noIdx.rdd.getNumPartitions === 2) // no skip without stats
    assert(noIdx.select("sat_name").as[String].collect() === Array("BETA-0"))
  }

  test("empty and missing directories yield empty frames, not errors") {
    val dir = Files.createTempDirectory("graft-tlesrc5-").toString
    assert(spark.read.format("graft-tle").load(dir).count() === 0)
    assert(spark.read.format("graft-tle").load(s"$dir/nope").count() === 0)
  }

  test("scan statistics report post-pruning bytes: a name-selective " +
    "read over an indexed landing looks as small to Catalyst as it is") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    val dir = indexedDir()
    def bytes(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.collectFirst {
        case r: DataSourceV2ScanRelation => r.stats.sizeInBytes
      }.get
    val full = spark.read.format("graft-tle").load(dir)
    val sel = full.where(col("sat_name").startsWith("BETA"))
    assert(bytes(sel) < bytes(full),
      "the index-skipped files must leave the size estimate")
    assert(bytes(sel) > 0)
  }

  test("index refresh is INCREMENTAL: only the new landing file is " +
    "statted, the delta-held entry skips like a base entry, and the " +
    "merged index survives compaction") {
    import org.apache.spark.sql.functions.col
    import graft.sources.SidecarIndex
    val dir = indexedDir() // 3 files, base written
    assert(SidecarIndex.lastStatted.get() === 3L)
    write(dir, "d.txt", (0 until 3).map(i =>
      s"DELTA-$i\n${noradLine(400 + i)}\n2 x").mkString("\n"))
    graft.sources.TleSource.writeIndex(spark, dir)
    assert(SidecarIndex.lastStatted.get() === 1L,
      "refreshing over +1 file must stat exactly one file")
    // the fresh entry is held by a delta file, not a base rewrite
    assert(new java.io.File(dir).listFiles.map(_.getName)
      .count(_.startsWith("_index.delta-")) === 1)
    // and it skips: a DELTA-prefix query plans only d.txt
    val df = spark.read.format("graft-tle").load(dir)
      .where(col("sat_name").startsWith("DELTA"))
    assert(df.rdd.getNumPartitions === 1,
      "the delta-held stats entry must skip the other three files")
    assert(df.count() === 3)
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** Per-file NDV (distinct count) sketches — the Iceberg-puffin analogue:
  * each committed file carries an HLL sketch per declared ndv column,
  * written in the same pass as the bloom sidecars; the snapshot NDV is
  * the union over live files, published to the optimizer as
  * CatalogColumnStat so CBO join estimation runs at ANALYZE parity with
  * zero ANALYZE. Copy-on-write DML composes exactly (fresh files get
  * fresh sketches); estimates stay within HLL lgK=12 error (~2%).
  */
class WarehouseNdvSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cat", StringType),
    StructField("day", DateType),
    StructField("val", DoubleType)))

  private def fresh(): Warehouse = {
    val dir = Files.createTempDirectory("graft-ndv-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"),
        ndvColumns = Seq("id", "cat", "day"))))
    wh.bootstrap()
    wh
  }

  private def batch(lo: Long, hi: Long) =
    spark.range(lo, hi).toDF("id").select(col("id"),
      concat(lit("c"), col("id") % 37).as("cat"),
      date_add(to_date(lit("2026-01-01")), (col("id") % 11).cast("int"))
        .as("day"),
      col("id").cast("double").as("val"))

  private def within(est: Long, truth: Long, pct: Double = 0.05): Boolean =
    math.abs(est - truth) <= math.max(1L, (truth * pct).toLong)

  test("above the threshold the NDV sketch union runs as a SPARK JOB " +
    "and matches the driver fold exactly") {
    val dir = Files.createTempDirectory("graft-ndv-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"), ndvColumns = Seq("id", "cat"))))
    wh.bootstrap()
    wh.append("t", batch(0, 3000).coalesce(3))
    wh.append("t", batch(2000, 5000).coalesce(3))
    val entries = wh.loadLatest("t")._2
    assert(entries.size >= 6)
    // distributed path on this instance (fresh memo)
    wh.bloomProbeDistributedThreshold = 1
    val viaJob = wh.ndvEstimates("t", entries)
    // driver fold on an independent instance (fresh memo, default knob)
    val wh2 = Warehouse.open(spark, dir)
    val viaDriver = wh2.ndvEstimates("t", entries)
    assert(viaJob === viaDriver)
    assert(within(viaJob("id"), 5000L), s"id ndv ${viaJob("id")}")
    assert(within(viaJob("cat"), 37L), s"cat ndv ${viaJob("cat")}")
    // a missing sidecar withholds the column on the distributed path
    // too (never undercount): drop one id-sidecar and re-ask fresh
    val ndvDir = java.nio.file.Paths.get(dir, "t", "_ndvidx")
    val victim = java.nio.file.Files.list(ndvDir)
      .filter(_.getFileName.toString.endsWith("-id.hll"))
      .findFirst().get()
    java.nio.file.Files.delete(victim)
    val wh3 = Warehouse.open(spark, dir)
    wh3.bloomProbeDistributedThreshold = 1
    val est3 = wh3.ndvEstimates("t", entries)
    assert(!est3.contains("id") && est3.contains("cat"))
  }

  test("published CatalogColumnStat corrects NDV for deletion vectors: " +
      "a 50%-DV'd unique column publishes ~half, a high-multiplicity " +
      "column stays ~flat, and the raw sketch union is untouched") {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val wh = fresh()
    wh.append("t", batch(0, 2000).coalesce(1))
    wh.deleteVectored("t", $"id" % 2 === 0) // 1000 vectored rows
    assert(wh.read("t").count() === 1000L)
    def published(c: String): Long = {
      val ct = wh.read("t").queryExecution.analyzed.collectFirst {
        case lr: LogicalRelation => lr.catalogTable
      }.flatten.getOrElse(fail("no CatalogTable on the scan"))
      ct.stats.get.colStats(c).distinctCount.get.toLong
    }
    // id is unique (m = 1): live NDV ≈ ndv · liveFrac = 1000
    assert(within(published("id"), 1000L, 0.06),
      s"id live ndv ${published("id")}")
    // cat has 37 values × ~54 rows (m ≈ 54): deleting half the rows
    // kills no value — published NDV stays ≈ 37
    assert(within(published("cat"), 37L), s"cat live ndv ${published("cat")}")
    // the RAW estimate surface stays the physical union (q149's
    // coupon-exact contract is about sketches, not liveness)
    val raw = wh.ndvEstimates("t", wh.loadLatest("t")._2)
    assert(within(raw("id"), 2000L), s"raw id ndv ${raw("id")}")
  }

  test("ndv sketches union across appended files to the true distinct " +
      "count; copy-on-write delete re-sketches exactly") {
    val wh = fresh()
    wh.append("t", batch(0, 4000).coalesce(2))
    wh.append("t", batch(3000, 8000).coalesce(2)) // overlapping ids
    val (_, entries) = wh.loadLatest("t")
    val est = wh.ndvEstimates("t", entries)
    assert(within(est("id"), 8000L), s"id ndv ${est("id")}")
    assert(within(est("cat"), 37L), s"cat ndv ${est("cat")}")
    assert(within(est("day"), 11L), s"day ndv ${est("day")}")
    // CoW DELETE rewrites touched files with FRESH sketches — the
    // union reflects the surviving rows, not the history
    wh.delete("t", col("id") >= 1000)
    val (_, e2) = wh.loadLatest("t")
    val est2 = wh.ndvEstimates("t", e2)
    assert(within(est2("id"), 1000L), s"post-delete id ndv ${est2("id")}")
    // a subset read estimates the SUBSET
    val sub = wh.loadLatest("t")._2.take(1)
    val est3 = wh.ndvEstimates("t", sub)
    assert(est3("id") < est2("id") || sub.size == e2.size)
  }

  test("ndv + manifest min/max reach the optimizer as per-column plan " +
      "statistics under CBO (ANALYZE parity, zero ANALYZE)") {
    val wh = fresh()
    wh.append("t", batch(0, 6000))
    val df = wh.read("t")
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.rowCount === Some(BigInt(6000)))
    val byName = stats.attributeStats.map { case (a, s) => a.name -> s }
    assert(byName.contains("id") && byName.contains("cat"),
      s"no column stats published: ${byName.keys}")
    assert(within(byName("id").distinctCount.get.toLong, 6000L))
    assert(within(byName("cat").distinctCount.get.toLong, 37L))
    // integral min/max ride along from the manifest stat fold
    assert(byName("id").min.contains(0L) && byName("id").max.contains(5999L))
    // val is not a declared ndv column → no stats, no error
    assert(!byName.contains("val"))
  }

  test("setIndexColumns on an existing table backfills sidecars for " +
      "pre-declaration files: estimates and bloom point-skips work " +
      "without rewriting a single data file") {
    val dir = Files.createTempDirectory("graft-ndvbf-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"))))
    wh.bootstrap()
    wh.append("t", batch(0, 1500).coalesce(1))
    wh.append("t", batch(1500, 3000).coalesce(1))
    assert(wh.ndvEstimates("t", wh.loadLatest("t")._2) === Map.empty)
    // declare ndv + bloom AFTER the data exists → one backfill pass
    val backfilled = wh.setIndexColumns("t",
      bloomColumns = Some(Seq("cat")), ndvColumns = Some(Seq("id", "cat")))
    assert(backfilled === 2L)
    val est = wh.ndvEstimates("t", wh.loadLatest("t")._2)
    assert(within(est("id"), 3000L) && within(est("cat"), 37L))
    // bloom sidecars now skip point lookups on the backfilled files:
    // a probe for a value NO file contains opens zero files
    assert(wh.readPoint("t", "cat", "nope").inputFiles.isEmpty)
    assert(wh.readPoint("t", "cat", "c5").where($"cat" === "c5").count() ===
      wh.read("t").where($"cat" === "c5").count())
    // idempotent: nothing left to backfill
    assert(wh.backfillSidecars("t") === 0L)
    // the SQL route: ANALYZE reports 0 files (already live) + estimates
    wh.registerSql("ndvbf_")
    val r = spark.sql("ANALYZE TABLE ndvbf_t COMPUTE STATISTICS").head()
    assert(r.getLong(0) === 0L)
    assert(r.getString(1).contains("cat=") && r.getString(1).contains("id="))
    // new appends keep writing sidecars through the normal pass
    wh.append("t", batch(3000, 3500).coalesce(1))
    assert(wh.backfillSidecars("t") === 0L)
    val est2 = wh.ndvEstimates("t", wh.loadLatest("t")._2)
    assert(within(est2("id"), 3500L))
  }

  test("a file without a sketch withholds the estimate instead of " +
      "undercounting; vacuum reclaims dead sidecars") {
    val dir = Files.createTempDirectory("graft-ndv2-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema)))
    wh.bootstrap()
    wh.append("t", batch(0, 100)) // no ndvColumns declared → no sidecars
    assert(wh.ndvEstimates("t", wh.loadLatest("t")._2) === Map.empty)

    val dir2 = Files.createTempDirectory("graft-ndv3-").toString
    val ndvSpec = Warehouse.TableSpec(schema,
      statColumns = Seq("id"), ndvColumns = Seq("id", "cat", "day"))
    val wh2 = new Warehouse(spark, dir2, specs = Map("t" -> ndvSpec))
    wh2.bootstrap()
    wh2.append("t", batch(0, 2000).coalesce(1))
    val before = wh2.loadLatest("t")._2
    assert(wh2.ndvEstimates("t", before).contains("id"))
    // delete the sidecar of a live file → the column is withheld
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val ndvDir = new org.apache.hadoop.fs.Path(s"$dir2/t/_ndvidx")
    val one = fs.listStatus(ndvDir)
      .filter(_.getPath.getName.endsWith("-id.hll"))
    assert(one.nonEmpty)
    fs.delete(one.head.getPath, false)
    // a NEW warehouse handle (empty memo) withholds id, keeps cat
    val wh3 = new Warehouse(spark, dir2, specs = Map("t" -> ndvSpec))
    val est2 = wh3.ndvEstimates("t", wh3.loadLatest("t")._2)
    assert(!est2.contains("id") && est2.contains("cat"))
  }
}

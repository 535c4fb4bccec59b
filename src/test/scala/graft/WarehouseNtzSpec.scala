package graft

import java.nio.file.Files
import java.time.LocalDateTime

import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** TIMESTAMP_NTZ as a first-class warehouse type (the r8 q133 failure
  * class): naive timestamps must survive the warehouse round-trip as
  * NTZ, carry manifest footer stats (parquet stores NTZ as INT64
  * micros, so LongStatistics cover them), skip files through both the
  * explicit readRange/readPoint surface and Catalyst-pushed filters
  * (ManifestFileIndex.statLong), answer metadata-only min/max with
  * NTZ-typed results, and z-order. The driver's own testdata encodes
  * every timestamp column as parquet TIMESTAMP_NTZ, so this is the
  * type real tables hit first.
  */
class WarehouseNtzSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampNTZType),
    StructField("val", DoubleType)))

  private def microsOf(ldt: LocalDateTime): Long =
    ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L

  private def fresh(prefix: String): Warehouse = {
    val dir = Files.createTempDirectory("graft-ntz-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id", "ts"))))
    wh.bootstrap()
    wh.registerSql(prefix)
    wh
  }

  private def batch(idBase: Long, day: Int) =
    (0 until 4).map(i => (idBase + i,
      LocalDateTime.of(2026, 3, day, i, 0, 0), (idBase + i) * 1.0))
      .toDF("id", "ts", "val").coalesce(1)

  test("NTZ column round-trips as NTZ, carries manifest stats, and " +
      "skips files on readRange/readPoint") {
    val wh = fresh("ntz1_")
    wh.append("t", batch(0L, 1))   // ts in 2026-03-01
    wh.append("t", batch(10L, 9))  // ts in 2026-03-09 — disjoint
    val all = wh.read("t")
    assert(all.schema("ts").dataType === TimestampNTZType,
      "warehouse read must preserve the naive type")
    assert(all.inputFiles.length === 2)
    // footer stats recorded (INT64 micros) → manifest min/max exact
    val cut = LocalDateTime.of(2026, 3, 5, 0, 0, 0)
    assert(wh.metaMinMax("t", "ts") ===
      Some((microsOf(LocalDateTime.of(2026, 3, 1, 0, 0, 0)),
        microsOf(LocalDateTime.of(2026, 3, 9, 3, 0, 0)))))
    // explicit range surface: micros encoding skips the early file
    val late = wh.readRange("t", "ts", microsOf(cut), Long.MaxValue)
    assert(late.inputFiles.length === 1)
    assert(late.where($"ts" > cut).count() === 4L)
    // point probe accepts the EXTERNAL LocalDateTime type
    val probe = LocalDateTime.of(2026, 3, 9, 2, 0, 0)
    val pt = wh.readPoint("t", "ts", probe)
    assert(pt.inputFiles.length === 1)
    assert(pt.where($"ts" === probe).count() === 1L)
  }

  test("Catalyst-pushed NTZ comparisons skip files at scan planning") {
    val wh = fresh("ntz2_")
    wh.append("t", batch(0L, 1))
    wh.append("t", batch(10L, 9))
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
    }.flatten
    val q = wh.read("t")
      .where($"ts" >= LocalDateTime.of(2026, 3, 5, 0, 0, 0))
    assert(q.collect().length === 4)
    val scan = scans(q.queryExecution.executedPlan).head
    assert(scan.metrics("numFiles").value === 1L,
      s"NTZ filter did not skip: numFiles=${scan.metrics("numFiles").value}")
  }

  test("metadata-only min/max answers NTZ-typed; z-order on NTZ works") {
    val wh = fresh("ntz3_")
    spark.sql("INSERT INTO ntz3_t VALUES " +
      "(1, TIMESTAMP_NTZ'2026-03-01 01:00:00', 1.0), " +
      "(2, TIMESTAMP_NTZ'2026-03-09 23:00:00', 2.0)")
    val q = spark.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM ntz3_t")
    // no data file opened: the answer folds the manifest
    val meta = q.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        true
    }.nonEmpty
    assert(meta, "NTZ min/max must be answerable from the manifest")
    assert(q.schema.fields.map(_.dataType).toSeq ===
      Seq(TimestampNTZType, TimestampNTZType))
    val r = q.head()
    assert(r.getAs[LocalDateTime](0) ===
      LocalDateTime.of(2026, 3, 1, 1, 0, 0))
    assert(r.getAs[LocalDateTime](1) ===
      LocalDateTime.of(2026, 3, 9, 23, 0, 0))
    // the meta answer must equal the scan answer
    spark.conf.set("spark.graft.metaOnlyAgg", "false")
    try assert(spark.sql(
        "SELECT min(ts) AS lo, max(ts) AS hi FROM ntz3_t").head() === r)
    finally spark.conf.unset("spark.graft.metaOnlyAgg")
    // z-order accepts NTZ (UTC session zone → micros identical to stats)
    wh.optimize("t", zorderBy = Seq("ts"))
    assert(wh.read("t").count() === 2L)
    assert(spark.sql(
      "SELECT min(ts) AS lo, max(ts) AS hi FROM ntz3_t").head() === r)
  }
}

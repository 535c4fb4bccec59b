package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** GENERATED columns ([[Warehouse.TableSpec.generated]]): append paths
  * derive the column when the batch omits it and verify it (null-safe)
  * when present; partitioned on a generated column this is HIDDEN
  * PARTITIONING — callers write the raw column, the engine derives the
  * partition key and pruning applies.
  */
class WarehouseGeneratedSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts", TimestampType),
    StructField("val", DoubleType),
    StructField("day", DateType)))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-genwh-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = false,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        partitionBy = Seq("day"),
        generated = Map("day" -> "CAST(ts AS DATE)"))))
    wh.bootstrap()
    (wh, dir)
  }

  private def rows(ids: Range) = ids.map { i =>
    (i.toLong, java.sql.Timestamp.valueOf(s"2024-01-0${i % 3 + 1} 06:00:00"),
      i * 1.0)
  }.toDF("id", "ts", "val")

  test("omitted column derives; hidden partitioning prunes") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0 until 30)) // no `day` column in the batch
    assert(wh.read("t").where(col("day") === "2024-01-02").count() === 10L)
    // the derived values landed as REAL partition directories
    val dirs = new java.io.File(dir, "t").listFiles()
      .filter(_.isDirectory).map(_.getName).filterNot(_.startsWith("_"))
    assert(dirs.toSet === Set("day=2024-01-01", "day=2024-01-02",
      "day=2024-01-03"))
    // present-and-consistent passes; present-and-WRONG violates
    wh.append("t", Seq((100L,
      java.sql.Timestamp.valueOf("2024-01-01 07:00:00"), 1.0,
      java.sql.Date.valueOf("2024-01-01"))).toDF("id", "ts", "val", "day"))
    val ex = intercept[Warehouse.CheckViolation] {
      wh.append("t", Seq((101L,
        java.sql.Timestamp.valueOf("2024-01-01 07:00:00"), 1.0,
        java.sql.Date.valueOf("2024-02-09"))).toDF("id", "ts", "val", "day"))
    }
    assert(ex.check === "__gen_day")
    assert(wh.read("t").count() === 31L)
  }

  test("spec persists; SQL INSERT omits the column; SHOW CREATE round-trips") {
    val (wh, dir) = fresh()
    wh.registerSql("gen_")
    rows(0 until 6).createOrReplaceTempView("gen_src")
    // positional INSERT with the generated column omitted
    spark.sql("INSERT INTO gen_t SELECT id, ts, val FROM gen_src")
    assert(spark.sql("SELECT count(DISTINCT day) FROM gen_t")
      .head().getLong(0) === 3L)
    val ddl = spark.sql("SHOW CREATE TABLE gen_t").head().getString(0)
    assert(ddl.contains("GENERATED ALWAYS AS (CAST(ts AS DATE))"), ddl)
    spark.sql(ddl.replace("gen_t", "gen_t2").split(";\n").head)
    assert(wh.tableSpec("t2").generated === Map("day" -> "CAST(ts AS DATE)"))
    // reopen keeps the derivation
    val re = Warehouse.open(spark, dir)
    re.append("t", rows(6 until 9))
    assert(re.read("t").where(col("day").isNull).count() === 0L)
  }

  // shared scan collector for the hidden-pruning assertions
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
    }.flatten
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    scansOf(df.queryExecution.executedPlan).map(
      _.metrics("numFiles").value).sum
  }

  test("a predicate on the BASE column prunes generated partitions — " +
      "cast-to-date, year and DIV transforms (Iceberg-style hidden " +
      "partition pruning)") {
    // day = CAST(ts AS DATE): a ts range never mentioning `day`
    val (wh, _) = fresh()
    wh.append("t", rows(0 until 30).coalesce(1)) // 3 day-dirs, 1 file each
    val cut = java.sql.Timestamp.valueOf("2024-01-03 00:00:00")
    val q = wh.read("t").where(col("ts") >= cut)
    assert(q.count() === 10L)
    assert(filesRead(wh.read("t").where(col("ts") >= cut)) === 1L,
      "ts predicate did not prune the generated day partitions")
    // equality too
    assert(filesRead(wh.read("t").where(
      col("ts") === java.sql.Timestamp.valueOf("2024-01-02 06:00:00")))
      === 1L)
    // yr = year(ts): integer partition dirs pruned by a ts predicate
    val dir2 = Files.createTempDirectory("graft-genwh2-").toString
    val s2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType),
      StructField("yr", IntegerType)))
    val wh2 = new Warehouse(spark, dir2, specs = Map(
      "t" -> Warehouse.TableSpec(s2, partitionBy = Seq("yr"),
        generated = Map("yr" -> "year(ts)"))))
    wh2.bootstrap()
    wh2.append("t", (0 until 30).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(
          s"${2021 + i % 3}-06-15 12:00:00")))
      .toDF("id", "ts").coalesce(1))
    assert(filesRead(wh2.read("t").where(
      col("ts") >= java.sql.Timestamp.valueOf("2023-01-01 00:00:00")))
      === 1L, "ts predicate did not prune year() partitions")
    // mon = date_trunc('MONTH', ts): timestamp partition dirs pruned;
    // the derived month floor must agree with Spark's own date_trunc
    // (the generated check pins dir values to Spark's evaluation)
    val dirT = Files.createTempDirectory("graft-genwhT-").toString
    val sT = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("ts", TimestampType),
      StructField("mon", TimestampType)))
    val whT = new Warehouse(spark, dirT, specs = Map(
      "t" -> Warehouse.TableSpec(sT, partitionBy = Seq("mon"),
        generated = Map("mon" -> "date_trunc('MONTH', ts)"))))
    whT.bootstrap()
    whT.append("t", (0 until 30).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(
          s"2026-0${i % 3 + 1}-2${i % 8} 13:0$i:00".takeWhile(_ != ' ') +
            " 13:00:00")))
      .toDF("id", "ts").coalesce(1))
    assert(filesRead(whT.read("t").where(
      col("ts") >= java.sql.Timestamp.valueOf("2026-03-01 00:00:00")))
      === 1L, "ts predicate did not prune date_trunc(MONTH) partitions")
    assert(whT.read("t").where(
      col("ts") >= java.sql.Timestamp.valueOf("2026-03-01 00:00:00"))
      .count() === 10L)
    // bucket = id DIV 1000: integral range predicate prunes
    val dir3 = Files.createTempDirectory("graft-genwh3-").toString
    val s3 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("bucket", LongType)))
    val wh3 = new Warehouse(spark, dir3, specs = Map(
      "t" -> Warehouse.TableSpec(s3, partitionBy = Seq("bucket"),
        generated = Map("bucket" -> "id DIV 1000"))))
    wh3.bootstrap()
    wh3.append("t", spark.range(0, 3000).toDF("id").coalesce(1))
    assert(filesRead(wh3.read("t").where(col("id") < 500)) === 1L,
      "id predicate did not prune DIV partitions")
    assert(wh3.read("t").where(col("id") < 500).count() === 500L)
  }

  test("rename/drop refuse generated and referenced columns") {
    val (wh, _) = fresh()
    intercept[IllegalArgumentException] { wh.renameColumn("t", "ts", "t2") }
    intercept[IllegalArgumentException] { wh.dropColumn("t", "ts") }
    // `val` is plain — still mappable
    wh.renameColumn("t", "val", "score")
    assert(wh.read("t").columns.contains("score"))
  }
}

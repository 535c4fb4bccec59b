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

  test("rename/drop refuse generated and referenced columns") {
    val (wh, _) = fresh()
    intercept[IllegalArgumentException] { wh.renameColumn("t", "ts", "t2") }
    intercept[IllegalArgumentException] { wh.dropColumn("t", "ts") }
    // `val` is plain — still mappable
    wh.renameColumn("t", "val", "score")
    assert(wh.read("t").columns.contains("score"))
  }
}

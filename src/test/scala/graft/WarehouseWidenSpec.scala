package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** TYPE WIDENING — metadata-only `ALTER COLUMN c TYPE t`: old narrow
  * files stay on disk and the scan upcasts them natively; manifest
  * footer stats are long-encoded (type-erased) so file skipping keeps
  * working across the boundary; hash-sensitive artifacts (buckets,
  * bloom/NDV sidecars, FK pairs) refuse instead of silently breaking.
  */
class WarehouseWidenSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(spec: Warehouse.TableSpec): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-widen-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    (wh, dir)
  }

  test("int→long and float→double widen without a rewrite; mixed " +
    "narrow/wide files read correctly; stats still skip; PK survives") {
    val spec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("qty", IntegerType),
        StructField("price", FloatType))),
      statColumns = Seq("id", "qty"),
      primaryKey = Seq("id"))
    val (wh, dir) = fresh(spec)
    wh.append("t", (1L to 100L).map(i => (i, i.toInt, i.toFloat))
      .toDF("id", "qty", "price"))
    val filesBefore = wh.loadLatest("t")._2.map(_.rel).toSet
    wh.alterColumnType("t", "qty", LongType)
    wh.alterColumnType("t", "price", DoubleType)
    // metadata-only: same files, new read schema
    assert(wh.loadLatest("t")._2.map(_.rel).toSet === filesBefore)
    assert(wh.tables("t")("qty").dataType === LongType)
    // values beyond int range land in the SAME column now
    wh.append("t", Seq((101L, 5000000000L, 2.5))
      .toDF("id", "qty", "price"))
    val got = wh.read("t").select("id", "qty", "price")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length === 101)
    assert(got.last === ((101L, 5000000000L, 2.5)))
    assert(got.head === ((1L, 1L, 1.0)))
    // old long-encoded stats still skip: corrupt the ORIGINAL files,
    // then probe a key far outside their range — never read
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    wh.loadLatest("t")._2.filter(e => filesBefore(e.rel)).foreach { e =>
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/t/${e.rel}"),
        true)
      out.write("not parquet".getBytes); out.close()
    }
    wh.append("t", Seq((7777L, 1L, 1.0)).toDF("id", "qty", "price"))
    // the PK probe also sees the widened qty stats; a probe INTO the
    // corrupted range surfaces the corruption (files really read)
    intercept[Exception] {
      wh.append("t", Seq((50L, 1L, 1.0)).toDF("id", "qty", "price"))
    }
    // the spec survives reopen
    assert(Warehouse.open(spark, dir).tables("t")("qty").dataType
      === LongType)
  }

  test("appendMergeSchema widens automatically when the batch arrives " +
    "wider, and casts narrower batches up to the spec") {
    val spec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("qty", IntegerType))))
    val (wh, _) = fresh(spec)
    wh.append("t", Seq((1L, 1)).toDF("id", "qty"))
    wh.appendMergeSchema("t", Seq((2L, 6000000000L)).toDF("id", "qty"))
    assert(wh.tables("t")("qty").dataType === LongType)
    // narrower-than-spec batch casts up instead of writing int32 files
    wh.appendMergeSchema("t", Seq((3L, 3)).toDF("id", "qty"))
    assert(wh.read("t").select("id", "qty").as[(Long, Long)]
      .collect().sortBy(_._1).toSeq ===
      Seq((1L, 1L), (2L, 6000000000L), (3L, 3L)))
  }

  test("hash-sensitive and lossy widenings refuse with actionable " +
    "errors: buckets, bloom/NDV columns, FK pairs, long→double") {
    val base = StructType(Seq(
      StructField("id", LongType),
      StructField("k", IntegerType),
      StructField("v", LongType)))
    val (whB, _) = fresh(Warehouse.TableSpec(base,
      bucketBy = Seq("k"), numBuckets = 4))
    val b = intercept[IllegalArgumentException] {
      whB.alterColumnType("t", "k", LongType)
    }
    assert(b.getMessage.contains("bucket"))
    val (whI, _) = fresh(Warehouse.TableSpec(base,
      bloomColumns = Seq("k")))
    assert(intercept[IllegalArgumentException] {
      whI.alterColumnType("t", "k", LongType)
    }.getMessage.contains("sidecars"))
    val (whL, _) = fresh(Warehouse.TableSpec(base))
    assert(intercept[IllegalArgumentException] {
      whL.alterColumnType("t", "v", DoubleType) // lossy past 2^53
    }.getMessage.contains("not an exact widening"))
    // FK pair: neither side widens alone
    val dir = Files.createTempDirectory("graft-widen-").toString
    val wh = new Warehouse(spark, dir, specs = Map(
      "p" -> Warehouse.TableSpec(
        StructType(Seq(StructField("pid", IntegerType))),
        primaryKey = Seq("pid")),
      "c" -> Warehouse.TableSpec(
        StructType(Seq(StructField("cid", LongType),
          StructField("pid", IntegerType))),
        primaryKey = Seq("cid"),
        foreignKeys = Seq(
          Warehouse.ForeignKey(Seq("pid"), "p", Seq("pid"))))))
    wh.bootstrap()
    assert(intercept[IllegalArgumentException] {
      wh.alterColumnType("c", "pid", LongType)
    }.getMessage.contains("FOREIGN KEY"))
    assert(intercept[IllegalArgumentException] {
      wh.alterColumnType("p", "pid", LongType)
    }.getMessage.contains("referenced by"))
  }

  test("SQL: ALTER TABLE ALTER COLUMN c TYPE BIGINT routes and widens") {
    val dir = Files.createTempDirectory("graft-widen-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "wd_")
    spark.sql("CREATE TABLE wd_t (id BIGINT, qty INT)")
    spark.sql("INSERT INTO wd_t VALUES (1, 7)")
    spark.sql("ALTER TABLE wd_t ALTER COLUMN qty TYPE BIGINT")
    spark.sql("INSERT INTO wd_t VALUES (2, 8000000000)")
    assert(spark.sql("SELECT sum(qty) FROM wd_t").head().getLong(0)
      === 8000000007L)
    val ddl = spark.sql("SHOW CREATE TABLE wd_t").head().getString(0)
    assert(ddl.contains("qty BIGINT"))
  }
}

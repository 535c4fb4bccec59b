package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** SQL metadata tables — `FROM wh_t.files / .partitions / .history /
  * .tags` (Iceberg's metadata-relation shape): the manifest as
  * join-able, filter-able relations instead of SHOW-only output.
  * Everything folds driver-side metadata; the load-bearing invariant
  * is that `partitions.rows` equals what a scan returns (footer counts
  * net of deletion vectors).
  */
class WarehouseMetaTablesSpec extends SparkSpec {

  import spark.implicits._

  test("files/partitions agree with the data exactly — across appends, " +
    "CoW deletes and VECTORED deletes; history and tags join") {
    val dir = Files.createTempDirectory("graft-meta-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" ->
      Warehouse.TableSpec(
        StructType(Seq(
          StructField("id", LongType),
          StructField("grp", StringType),
          StructField("val", DoubleType))),
        partitionBy = Seq("grp"),
        statColumns = Seq("id"))))
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "mt_")
    wh.append("t", (1L to 300L).map(i => (i, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "val"))
    wh.createTag("t", "loaded")
    wh.delete("t", $"id" % 7 === 0)       // copy-on-write
    wh.deleteVectored("t", $"id" % 11 === 0) // merge-on-read sidecars
    // partitions.rows (net of vectors) == the scan's own counts
    val metaRows = spark.sql(
      "SELECT partition, rows FROM mt_t.partitions ORDER BY partition")
      .as[(String, Long)].collect().toSeq
    val dataRows = spark.sql(
      "SELECT concat('grp=', grp), count(*) FROM mt_t GROUP BY grp " +
        "ORDER BY 1").as[(String, Long)].collect().toSeq
    assert(metaRows === dataRows)
    // files: sum(rows - dv_rows) == total live; every rel carries its dir
    val (live, files) = (spark.sql("SELECT count(*) FROM mt_t")
        .head().getLong(0),
      spark.sql("SELECT sum(rows - dv_rows), count(*) FROM mt_t.files")
        .head())
    assert(files.getLong(0) === live)
    assert(spark.sql(
      "SELECT count(*) FROM mt_t.files WHERE partition NOT LIKE 'grp=%'")
      .head().getLong(0) === 0L)
    // metadata relations JOIN like any other: per-partition file sizes
    // against data counts in one query
    val joined = spark.sql("""
      SELECT p.partition, p.files, d.n
      FROM mt_t.partitions p
      JOIN (SELECT concat('grp=', grp) AS partition, count(*) AS n
            FROM mt_t GROUP BY grp) d
      ON p.partition = d.partition""").count()
    assert(joined === 3L)
    // history as a relation: the op sequence we just ran
    val ops = spark.sql(
      "SELECT operation, count(*) FROM mt_t.history GROUP BY operation")
      .as[(String, Long)].collect().toMap
    assert(ops("append") === 1L)
    assert(ops("delete") === 2L) // CoW + merge-on-read share the op name
    // tags as a relation
    assert(spark.sql("SELECT tag, version FROM mt_t.tags")
      .as[(String, Long)].collect().toSeq === Seq(("loaded", 2L)))
    // an unknown kind is NOT intercepted (falls through to Spark's
    // own resolution and fails like any unknown table)
    intercept[Exception] { spark.sql("SELECT * FROM mt_t.nope").collect() }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** GENERATED ALWAYS AS IDENTITY — engine-assigned surrogate keys.
  * Assignment is DISTRIBUTED (range-partition + per-partition rank,
  * never a one-partition window) and, with a declared ORDER BY,
  * DETERMINISTIC — the reproducible-sample-id contract a training-data
  * pipeline wants. The high-water mark rides commit metadata and only
  * ratchets: deletes burn ids, conflict retries reassign from the new
  * head, rewrites carry ids through untouched.
  */
class WarehouseIdentitySpec extends SparkSpec {

  import spark.implicits._

  private val idSpec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("rid", LongType),
      StructField("k", LongType),
      StructField("s", StringType))),
    statColumns = Seq("k"),
    identity = Some(Warehouse.Identity("rid", orderBy = Seq("k"))))

  private def fresh(spec: Warehouse.TableSpec = idSpec)
      : (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-id-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    (wh, dir)
  }

  private def rows(ks: Seq[Long]) =
    ks.map(k => (k, s"s$k")).toDF("k", "s")

  test("ordered assignment is deterministic rank + running offset; " +
    "batches continue the sequence; many partitions, no reuse") {
    val (wh, _) = fresh()
    // shuffled input over several partitions: ids must follow k-order
    wh.append("t", rows(scala.util.Random.shuffle((1L to 500L).toList))
      .repartition(8))
    val got1 = wh.read("t").select("rid", "k").as[(Long, Long)]
      .collect().sortBy(_._2)
    assert(got1.map(_._1).toSeq === (1L to 500L))
    assert(got1.map(_._2).toSeq === (1L to 500L)) // rank == k here
    // second batch: continues at 501, ordered by ITS OWN k order
    wh.append("t", rows(Seq(1000L, 900L, 950L)))
    val got2 = wh.read("t").where($"k" >= 900L)
      .select("rid", "k").as[(Long, Long)].collect().sortBy(_._2)
    assert(got2.toSeq === Seq((501L, 900L), (502L, 950L), (503L, 1000L)))
  }

  test("ALWAYS contract: a batch supplying the column rejects; ids " +
    "survive CoW rewrites untouched; deletes burn ids (no reuse)") {
    val (wh, _) = fresh()
    wh.append("t", rows(1L to 10L))
    val always = intercept[IllegalArgumentException] {
      wh.append("t", Seq((99L, 11L, "x")).toDF("rid", "k", "s"))
    }
    assert(always.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    // CoW update of another column: survivors keep their ids
    wh.update("t", $"k" <= 3L, Map("s" -> lit("upd")))
    val after = wh.read("t").select("rid", "k").as[(Long, Long)]
      .collect().sortBy(_._2)
    assert(after.map(_._1).toSeq === (1L to 10L))
    // delete the TOP ids, then append: the hwm metadata ratchet means
    // no reuse even though the max live id dropped
    wh.delete("t", $"rid" >= 8L)
    wh.append("t", rows(Seq(100L)))
    assert(wh.read("t").where($"k" === 100L).head().getLong(0) === 11L)
    // truncate doesn't reset it either
    wh.truncate("t")
    wh.append("t", rows(Seq(200L)))
    assert(wh.read("t").head().getLong(0) === 12L)
  }

  test("a commit-conflict against a racing assigner REASSIGNS from the " +
    "new head — ids never collide across writers") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1L to 5L))
    val other = Warehouse.open(spark, dir)
    // inject a competing identity append between our probe and commit
    var injected = false
    wh.beforeCommit = Some(() => if (!injected) {
      injected = true
      other.append("t", rows(Seq(501L, 502L)))
    })
    try wh.append("t", rows(Seq(601L, 602L, 603L)))
    finally wh.beforeCommit = None
    val all = wh.read("t").select("rid", "k").as[(Long, Long)]
      .collect().sortBy(_._2)
    // 10 rows, 10 DISTINCT ids, and the racing batch won 6-7
    assert(all.length === 10)
    assert(all.map(_._1).distinct.length === 10)
    assert(all.map(_._1).toSet === (1L to 10L).toSet)
    assert(all.filter(_._2 >= 600L).map(_._1).toSeq === Seq(8L, 9L, 10L))
  }

  test("overwrite assigns and ratchets; merge-family, appendAll and " +
    "quarantine reject identity tables; SET/rename/drop guards hold") {
    val dir = Files.createTempDirectory("graft-id-").toString
    val wh = new Warehouse(spark, dir, specs = Map(
      "t" -> idSpec,
      "t2" -> Warehouse.TableSpec(StructType(Seq(
        StructField("k", LongType), StructField("s", StringType))))))
    wh.bootstrap()
    wh.append("t", rows(1L to 4L))
    wh.overwrite("t", rows(Seq(7L, 6L)))
    assert(wh.read("t").select("rid", "k").as[(Long, Long)]
      .collect().sortBy(_._2).toSeq === Seq((5L, 6L), (6L, 7L)))
    intercept[IllegalArgumentException] {
      wh.merge("t", rows(Seq(1L)), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      wh.mergeInto("t", rows(Seq(1L)), Seq("k"),
        notMatchedInsert = Some(None))
    }
    intercept[IllegalArgumentException] {
      wh.scdMerge("t", rows(Seq(1L)), Seq("k"), lit("2026-01-01"))
    }
    intercept[IllegalArgumentException] {
      wh.appendAll(Seq(("t", rows(Seq(50L)), 0L),
        ("t2", rows(Seq(1L)), 0L)))
    }
    intercept[IllegalArgumentException] {
      wh.appendQuarantine("t", "t_bad", rows(Seq(50L)))
    }
    intercept[IllegalArgumentException] {
      wh.update("t", $"k" === 6L, Map("rid" -> lit(99L)))
    }
    intercept[IllegalArgumentException] { wh.renameColumn("t", "rid", "r2") }
    intercept[IllegalArgumentException] { wh.dropColumn("t", "rid") }
  }

  test("streaming sink into an identity table: exactly-once assignment " +
    "across a checkpointed restart — replays mint nothing, no gaps") {
    val root = Files.createTempDirectory("graft-id-stream-").toString
    val wh = new Warehouse(spark, s"$root/wh", specs = Map("t" -> idSpec))
    wh.bootstrap()
    val srcSchema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    rows(scala.util.Random.shuffle((1L to 100L).toList)).coalesce(1)
      .write.parquet(srcDir)
    def run(): Unit = {
      val q = spark.readStream.schema(srcSchema).parquet(srcDir)
        .writeStream.format("graft-warehouse")
        .option("path", s"$root/wh").option("table", "t")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    // one epoch → one deterministic ordered assignment
    val got = wh.read("t").select("rid", "k").as[(Long, Long)]
      .collect().sortBy(_._2)
    assert(got.map(_._1).toSeq === (1L to 100L))
    // restart with more data: continues; idle restart: mints nothing
    rows(Seq(500L, 400L)).coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(wh.read("t").where($"k" >= 400L).select("rid", "k")
      .as[(Long, Long)].collect().sortBy(_._2).toSeq ===
      Seq((101L, 400L), (102L, 500L)))
    run()
    assert(wh.read("t").count() === 102L)
    assert(wh.read("t").select("rid").distinct().count() === 102L)
  }

  test("DDL: GENERATED ALWAYS AS IDENTITY parses (START WITH/ORDER BY), " +
    "INSERT omits the column, SHOW CREATE + reopen round-trip") {
    val dir = Files.createTempDirectory("graft-id-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "idt_")
    spark.sql("""CREATE TABLE idt_t (
        rid BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 ORDER BY k),
        k BIGINT, s STRING)""")
    spark.sql("INSERT INTO idt_t VALUES (3, 'c'), (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT rid, k FROM idt_t ORDER BY k")
      .as[(Long, Long)].collect().toSeq ===
      Seq((100L, 1L), (101L, 2L), (102L, 3L)))
    // supplying the column positionally (3 values for 2 insertable
    // columns) is an arity error up front
    intercept[Exception] {
      spark.sql("INSERT INTO idt_t VALUES (999, 4, 'd')")
    }
    val ddl = spark.sql("SHOW CREATE TABLE idt_t").head().getString(0)
    assert(ddl.contains(
      "GENERATED ALWAYS AS IDENTITY (START WITH 100 ORDER BY k)"))
    val wh2 = Warehouse.open(spark, dir)
    assert(wh2.tableSpec("t").identity ===
      Some(Warehouse.Identity("rid", Seq("k"), 100L)))
    wh2.append("t", Seq((4L, "d")).toDF("k", "s"))
    assert(wh2.read("t").where($"k" === 4L).head().getLong(0) === 103L)
  }
}

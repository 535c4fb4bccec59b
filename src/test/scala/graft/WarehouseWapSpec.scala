package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** WRITE-AUDIT-PUBLISH on the clone machinery: stage on a shallow
  * clone, audit, fast-forward the target in one metadata commit;
  * stale audits and diverged layouts are rejected; the borrow guard
  * keeps staging undroppable until the target localizes.
  */
class WarehouseWapSpec extends SparkSpec {

  import spark.implicits._

  private val spec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("id", LongType),
      StructField("grp", StringType),
      StructField("val", DoubleType))),
    checks = Map("val_pos" -> "val >= 0"))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-wap-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    wh.append("t", (1L to 20L).map(i => (i, s"g${i % 2}", i * 1.0))
      .toDF("id", "grp", "val"))
    (wh, dir)
  }

  test("WAP cycle: stage DML invisibly, audit, publish one commit; " +
    "borrow guard + localize + drop staging") {
    val (wh, _) = fresh()
    val v0 = wh.versions("t").max
    wh.shallowClone("t", "stage")
    // stage: corrections land on the clone — delete bad ids, append
    // replacements and fresh rows; a MoR delete exercises the dv path
    wh.delete("stage", $"id" <= 5L)
    wh.deleteVectored("stage", $"id" === 20L)
    wh.append("stage", Seq((21L, "gN", 21.0), (22L, "gN", 22.0))
      .toDF("id", "grp", "val"))
    // the audit: target is UNTOUCHED while staging mutates
    assert(wh.versions("t").max === v0)
    assert(wh.read("t").count() === 20L)
    val audited = wh.read("stage")
    assert(audited.count() === 16L) // 20 - 5 - 1 + 2
    assert(audited.where($"val" < 0).isEmpty) // the quality gate
    // publish: ONE commit flips the target
    val v1 = wh.publish("t", "stage")
    assert(v1 === v0 + 1)
    assert(wh.read("t").select($"id").as[Long].collect().toSet ===
      ((6L to 19L) ++ Seq(21L, 22L)).toSet)
    // time travel still shows the pre-publish state
    assert(wh.readVersion("t", v0).count() === 20L)
    // the borrow guard: staging owns published bytes, drop refused
    val guard = intercept[IllegalArgumentException] {
      wh.dropTable("stage")
    }
    assert(guard.getMessage.contains("borrow"))
    // localize the target and retire the borrowing manifests (compact
    // rewrites the head; vacuum drops the retained versions that still
    // reference staging) — then staging drops cleanly
    wh.compact("t")
    wh.vacuum("t", keepManifests = 1)
    wh.dropTable("stage")
    assert(wh.read("t").select($"id").as[Long].collect().toSet ===
      ((6L to 19L) ++ Seq(21L, 22L)).toSet)
  }

  test("stale audit, non-clone staging, and diverged layout reject") {
    val (wh, _) = fresh()
    wh.shallowClone("t", "stage")
    wh.delete("stage", $"id" === 1L)
    // the target advances after the clone: the audit is stale
    wh.append("t", Seq((99L, "g1", 99.0)).toDF("id", "grp", "val"))
    val stale = intercept[IllegalArgumentException] {
      wh.publish("t", "stage")
    }
    assert(stale.getMessage.contains("re-clone"))
    // a non-clone table cannot publish
    wh.createTable("other", spec, ifNotExists = false)
    val notClone = intercept[IllegalArgumentException] {
      wh.publish("t", "other")
    }
    assert(notClone.getMessage.contains("not a clone"))
    // schema drift on staging after cloning rejects too
    wh.shallowClone("t", "stage2")
    wh.addColumn("stage2", StructField("extra", StringType))
    val drift = intercept[IllegalArgumentException] {
      wh.publish("t", "stage2")
    }
    assert(drift.getMessage.contains("diverged"))
  }

  test("SQL: PUBLISH TABLE staging TO target") {
    val dir = Files.createTempDirectory("graft-wap-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    wh.registerSql("wap_")
    spark.sql("INSERT INTO wap_t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    spark.sql("CREATE TABLE wap_stage SHALLOW CLONE wap_t")
    spark.sql("DELETE FROM wap_stage WHERE id = 1")
    spark.sql("INSERT INTO wap_stage VALUES (3, 'c', 3.0)")
    assert(spark.sql("SELECT count(*) FROM wap_t").head().getLong(0) === 2L)
    val v = spark.sql("PUBLISH TABLE wap_stage TO wap_t").head().getLong(0)
    assert(v === wh.versions("t").max)
    assert(spark.sql("SELECT id FROM wap_t ORDER BY id")
      .as[Long].collect().toSeq === Seq(2L, 3L))
  }
}

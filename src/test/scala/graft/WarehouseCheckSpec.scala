package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** CHECK constraints: enforced on every path that writes NEW values
  * (append, merge, mergeInto, update — and therefore SQL INSERT and the
  * streaming sink), SQL three-valued semantics (NULL passes), validated
  * against existing data at ADD CONSTRAINT, persisted through `_meta/`
  * so reopened warehouses enforce them too.
  */
class WarehouseCheckSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("val", DoubleType)))

  private def freshAt(checks: Map[String, String] = Map.empty): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-chk-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema, checks = checks)))
    wh.bootstrap()
    (wh, dir)
  }

  private def fresh(checks: Map[String, String] = Map.empty): Warehouse =
    freshAt(checks)._1

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "val")

  test("violating append fails atomically; table version unchanged") {
    val wh = fresh(checks = Map("val_nonneg" -> "val >= 0"))
    wh.append("t", rows(0, 10))
    val v = wh.versions("t").max
    val ex = intercept[Warehouse.CheckViolation] {
      wh.append("t", Seq((100L, "g0", -1.0)).toDF("id", "grp", "val"))
    }
    assert(ex.check === "val_nonneg" && ex.violations === 1L)
    assert(wh.versions("t").max === v) // nothing committed
    assert(wh.read("t").count() === 10L)
  }

  test("NULL passes (SQL three-valued semantics); FALSE alone violates") {
    val wh = fresh(checks = Map("val_nonneg" -> "val >= 0"))
    wh.append("t", Seq((1L, "g0", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "grp", "val"))
    assert(wh.read("t").count() === 1L)
  }

  test("update and mergeInto check the NEW values, not the batch") {
    val wh = fresh(checks = Map("val_cap" -> "val <= 100"))
    wh.append("t", rows(0, 10))
    // SET result violates even though every stored row passes
    intercept[Warehouse.CheckViolation] {
      wh.update("t", col("id") === 3, Map("val" -> lit(500.0)))
    }
    assert(wh.read("t").where($"val" > 100).count() === 0L)
    // merge clause result violates via the update branch
    intercept[Warehouse.CheckViolation] {
      wh.mergeInto("t", Seq((3L, "g0", 1.0)).toDF("id", "grp", "val"),
        Seq("id"),
        matchedDelete = None,
        matchedUpdate = Some((None, Map("val" -> lit(999.0)))),
        notMatchedInsert = None)
    }
    // a compliant merge still lands
    wh.mergeInto("t", Seq((3L, "g9", 42.0)).toDF("id", "grp", "val"),
      Seq("id"), None, Some((None, Map("val" -> col("src_val")))), None)
    assert(wh.read("t").where($"id" === 3).head().getDouble(2) === 42.0)
  }

  test("addCheck validates existing data and persists through reopen") {
    val (wh, dir) = freshAt()
    wh.append("t", rows(0, 10))
    // existing data violates → rejected, constraint NOT added
    intercept[Warehouse.CheckViolation] {
      wh.addCheck("t", "id_cap", "id < 5")
    }
    wh.append("t", Seq((50L, "g0", 1.0)).toDF("id", "grp", "val")) // no check
    // a satisfiable constraint lands and persists
    wh.addCheck("t", "val_nonneg", "val >= 0")
    val reopened = Warehouse.open(spark, dir)
    val ex = intercept[Warehouse.CheckViolation] {
      reopened.append("t", Seq((99L, "g0", -5.0)).toDF("id", "grp", "val"))
    }
    assert(ex.check === "val_nonneg")
    wh.dropCheck("t", "val_nonneg")
    wh.append("t", Seq((99L, "g0", -5.0)).toDF("id", "grp", "val"))
    assert(wh.read("t").count() === 12L)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT route as SQL statements") {
    val wh = fresh()
    wh.registerSql("chk_")
    rows(0, 5).createOrReplaceTempView("chk_src")
    spark.sql("INSERT INTO chk_t SELECT * FROM chk_src")
    spark.sql("ALTER TABLE chk_t ADD CONSTRAINT val_nonneg CHECK (val >= 0)")
    val ex = intercept[Warehouse.CheckViolation] {
      spark.sql("INSERT INTO chk_t VALUES (100, 'g0', -1.0)")
    }
    assert(ex.check === "val_nonneg")
    spark.sql("ALTER TABLE chk_t DROP CONSTRAINT val_nonneg")
    spark.sql("INSERT INTO chk_t VALUES (100, 'g0', -1.0)")
    assert(spark.sql("SELECT count(*) FROM chk_t").head().getLong(0) === 6L)
  }

  test("appendQuarantine: split is atomic, first-fail attributed") {
    val wh = fresh(checks = Map(
      "a_nonneg" -> "val >= 0", "b_small_id" -> "id < 100"))
    // id 150 violates b; val<0 violates a; id 200 + val<0 violates BOTH
    // and must be attributed to the FIRST check in name order (a_nonneg)
    val batch = Seq(
      (1L, "g0", 5.0), (2L, "g1", 6.0),           // good
      (150L, "g2", 7.0),                          // b_small_id
      (3L, "g0", -1.0),                           // a_nonneg
      (200L, "g1", -2.0)                          // both -> a_nonneg
    ).toDF("id", "grp", "val")
    val (kept, quarantined) = wh.appendQuarantine("t", "t_bad", batch)
    assert(kept === 2L && quarantined === 3L)
    assert(wh.read("t").count() === 2L)
    val bad = wh.read("t_bad")
      .select(col("id"), col("violation")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(bad === Map(150L -> "b_small_id", 3L -> "a_nonneg",
      200L -> "a_nonneg"))
    // re-run with an all-good batch: quarantine stays put
    val (k2, q2) = wh.appendQuarantine("t", "t_bad",
      Seq((10L, "g2", 1.0)).toDF("id", "grp", "val"))
    assert(k2 === 1L && q2 === 0L)
  }

  test("appendQuarantine: crash between member commits publishes neither") {
    val wh = fresh(checks = Map("a_nonneg" -> "val >= 0"))
    wh.crashPoint = Some("between-manifests")
    intercept[IllegalStateException] {
      wh.appendQuarantine("t", "t_bad",
        Seq((1L, "g0", 1.0), (2L, "g1", -1.0)).toDF("id", "grp", "val"))
    }
    wh.crashPoint = None
    assert(wh.read("t").count() === 0L)
    assert(wh.read("t_bad").count() === 0L)
    // the re-run completes both sides exactly once (lease expired so
    // the dead transaction's pending slot is reclaimable immediately)
    wh.txnStaleMs = 0L
    val (k, q) = wh.appendQuarantine("t", "t_bad",
      Seq((1L, "g0", 1.0), (2L, "g1", -1.0)).toDF("id", "grp", "val"))
    assert(k === 1L && q === 1L)
    assert(wh.read("t").count() === 1L && wh.read("t_bad").count() === 1L)
  }

}

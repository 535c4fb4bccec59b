package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** FK integrity at the WHOLE-TABLE operations — the paths a row-level
  * RESTRICT probe doesn't naturally cover: TRUNCATE of a referenced
  * parent, OVERWRITE of a self-referencing table, RESTORE across
  * versions whose key sets differ, and quarantine tagging when the
  * batch itself supplies (or fails to supply) self-FK parents. Plus the
  * DDL grammar's stacked column-suffix clauses (`c INT UNIQUE DEFAULT
  * 5`) that feed these constraints.
  */
class WarehouseRestrictSpec extends SparkSpec {

  import spark.implicits._

  private val parentSpec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("pid", LongType),
      StructField("pname", StringType))),
    statColumns = Seq("pid"),
    primaryKey = Seq("pid"))

  private val childSpec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("cid", LongType),
      StructField("pid", LongType))),
    statColumns = Seq("cid"),
    primaryKey = Seq("cid"),
    foreignKeys = Seq(Warehouse.ForeignKey(Seq("pid"), "p", Seq("pid"))))

  private def fresh(retain: Boolean = false): Warehouse = {
    val dir = Files.createTempDirectory("graft-restrict-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = retain,
      specs = Map("p" -> parentSpec, "c" -> childSpec))
    wh.bootstrap()
    wh
  }

  private def selfWh(): Warehouse = {
    val dir = Files.createTempDirectory("graft-restrict-").toString
    val spec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("mgr", LongType))),
      statColumns = Seq("id"),
      primaryKey = Seq("id"),
      foreignKeys = Seq(Warehouse.ForeignKey(Seq("mgr"), "e", Seq("id"))))
    val wh = new Warehouse(spark, dir, specs = Map("e" -> spec))
    wh.bootstrap()
    wh
  }

  test("TRUNCATE of a referenced parent refuses while child rows " +
    "reference it; empties once they are gone; self-FK tables truncate") {
    val wh = fresh()
    wh.append("p", Seq((1L, "a"), (2L, "b")).toDF("pid", "pname"))
    wh.append("c", Seq((10L, 1L)).toDF("cid", "pid"))
    val e = intercept[Warehouse.ForeignKeyViolation] { wh.truncate("p") }
    assert(e.getMessage.contains("RESTRICT"))
    assert(e.getMessage.contains("truncate"))
    assert(wh.read("p").count() === 2L) // nothing committed
    // a child row with a NULL key does not block (references nothing)
    wh.truncate("c")
    wh.append("c", Seq((java.lang.Long.valueOf(11L),
      null.asInstanceOf[java.lang.Long])).toDF("cid", "pid"))
    wh.truncate("p")
    assert(wh.read("p").count() === 0L)
    // a purely SELF-referencing table truncates: its referencing rows
    // vanish in the same flip (the Postgres one-statement analog)
    val sw = selfWh()
    sw.append("e", Seq((1L, 1L), (2L, 1L)).toDF("id", "mgr"))
    sw.truncate("e")
    assert(sw.read("e").count() === 0L)
  }

  test("OVERWRITE of a self-FK table validates the batch against its " +
    "OWN keys: references to evicted keys reject; a self-consistent " +
    "replacement lands even when the OLD rows referenced doomed keys") {
    val wh = selfWh()
    wh.append("e", Seq((1L, Option.empty[Long]),
      (2L, Option.empty[Long])).toDF("id", "mgr"))
    // key 1 is live NOW but the replacement doesn't resupply it — a
    // batch row referencing it must fail (pre-fix it rode the stale
    // live-snapshot probe through)
    val e = intercept[Warehouse.ForeignKeyViolation] {
      wh.overwrite("e", Seq((3L, Option(1L))).toDF("id", "mgr"))
    }
    assert(e.getMessage.contains("no parent row"))
    assert(wh.read("e").count() === 2L)
    // old rows referencing evicted keys do NOT block the replacement —
    // they are evicted in the same flip (pre-fix: false rejection)
    wh.overwrite("e", Seq((5L, Option(5L)), (6L, Option(5L)))
      .toDF("id", "mgr"))
    assert(wh.read("e").as[(Long, Long)].collect().toSet ===
      Set((5L, 5L), (6L, 5L)))
    // and a NON-self child still RESTRICTs an overwrite that would
    // evict its parent key
    val wh2 = fresh()
    wh2.append("p", Seq((1L, "a"), (2L, "b")).toDF("pid", "pname"))
    wh2.append("c", Seq((10L, 1L)).toDF("cid", "pid"))
    intercept[Warehouse.ForeignKeyViolation] {
      wh2.overwrite("p", Seq((2L, "b")).toDF("pid", "pname"))
    }
    wh2.overwrite("p", Seq((1L, "a2"), (3L, "c")).toDF("pid", "pname"))
    assert(wh2.read("p").count() === 2L)
  }

  test("RESTORE enforces FK both ways: a parent restore that drops a " +
    "referenced key refuses; a child restore that resurrects rows " +
    "referencing since-deleted parents refuses") {
    val wh = fresh(retain = true)
    wh.append("p", Seq((1L, "a"), (5L, "e")).toDF("pid", "pname"))
    val (vP, _) = wh.loadLatest("p")
    wh.append("p", Seq((7L, "g")).toDF("pid", "pname"))
    wh.append("c", Seq((100L, 7L)).toDF("cid", "pid"))
    // restoring p to vP drops key 7 — the child still references it
    val e = intercept[Warehouse.ForeignKeyViolation] {
      wh.restore("p", vP)
    }
    assert(e.getMessage.contains("RESTRICT"))
    // child-side: capture a version whose rows reference 7, delete the
    // row, delete parent 7, then try to resurrect the reference
    val (vC, _) = wh.loadLatest("c")
    wh.delete("c", $"cid" === 100L)
    wh.delete("p", $"pid" === 7L)
    val e2 = intercept[Warehouse.ForeignKeyViolation] {
      wh.restore("c", vC)
    }
    assert(e2.getMessage.contains("no parent row"))
    // a restore that stays consistent goes through
    wh.restore("p", vP)
    assert(wh.read("p").as[(Long, String)].collect().map(_._1).toSet ===
      Set(1L, 5L))
  }

  test("appendQuarantine self-FK: in-batch SURVIVING parents count; a " +
    "quarantined parent CASCADES its dependents to quarantine instead " +
    "of failing the batch") {
    val dir = Files.createTempDirectory("graft-restrict-").toString
    val spec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("mgr", LongType),
        StructField("v", DoubleType))),
      statColumns = Seq("id"),
      primaryKey = Seq("id"),
      checks = Map("v_pos" -> "v > 0"),
      foreignKeys = Seq(Warehouse.ForeignKey(Seq("mgr"), "e", Seq("id"))))
    val wh = new Warehouse(spark, dir, specs = Map("e" -> spec))
    wh.bootstrap()
    // 1: clean root. 2: fails the CHECK. 3: references 2 — dangling
    // only BECAUSE 2 quarantines (depth-1 cascade). 5: references 3 —
    // dangling only because 3 cascades (depth-2, needs the FIXPOINT
    // pass). 4: references 1, an in-batch surviving parent — must land
    // (pre-fix: misrouted to quarantine).
    val batch = Seq(
      (1L, Option.empty[Long], 1.0),
      (2L, Option(1L), -1.0),
      (3L, Option(2L), 1.0),
      (4L, Option(1L), 1.0),
      (5L, Option(3L), 1.0)).toDF("id", "mgr", "v")
    val (kept, quarantined) = wh.appendQuarantine("e", "e_bad", batch)
    assert(kept === 2L)
    assert(quarantined === 3L)
    val bad = wh.read("e_bad").select("id", "violation")
      .as[(Long, String)].collect().toMap
    assert(bad(2L) === "v_pos")
    assert(bad(3L) === "foreign_key")
    assert(bad(5L) === "foreign_key")
    assert(wh.read("e").select("id").as[Long].collect().toSet ===
      Set(1L, 4L))
    // the landed side passes appendAll's statement-end FK check — a
    // second batch referencing the landed rows appends cleanly
    wh.append("e", Seq((5L, Option(4L), 2.0)).toDF("id", "mgr", "v"))
    assert(wh.read("e").count() === 3L)
  }

  test("DROP UNIQUE/FOREIGN KEY/PRIMARY KEY: metadata-only undo that " +
    "persists across reopen; PK drop refuses while referenced") {
    val dir = Files.createTempDirectory("graft-restrict-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("p" -> parentSpec, "c" -> childSpec))
    wh.bootstrap()
    wh.append("p", Seq((1L, "a")).toDF("pid", "pname"))
    wh.append("c", Seq((10L, 1L)).toDF("cid", "pid"))
    // PK drop refuses while c's FK references p
    val held = intercept[IllegalArgumentException] {
      wh.dropPrimaryKey("p")
    }
    assert(held.getMessage.contains("FOREIGN KEY"))
    // unknown constraint drops fail loudly, naming what exists
    assert(intercept[IllegalArgumentException] {
      wh.dropForeignKey("c", Seq("cid"))
    }.getMessage.contains("(pid) -> p"))
    intercept[IllegalArgumentException] { wh.dropUnique("c", Seq("pid")) }
    // FK drop is metadata-only: the formerly-dangling append now lands
    wh.dropForeignKey("c", Seq("pid"))
    wh.append("c", Seq((11L, 99L)).toDF("cid", "pid"))
    // now the parent's PK can go — and duplicate keys land
    wh.dropPrimaryKey("p")
    wh.append("p", Seq((1L, "dup")).toDF("pid", "pname"))
    assert(wh.read("p").count() === 2L)
    // the drops PERSISTED: a reopened warehouse enforces neither
    val wh2 = Warehouse.open(spark, dir)
    assert(wh2.tableSpec("p").primaryKey.isEmpty)
    assert(wh2.tableSpec("c").foreignKeys.isEmpty)
    wh2.append("c", Seq((12L, 98L)).toDF("cid", "pid"))
    assert(wh2.read("c").count() === 3L)
  }

  test("DDL: stacked column-suffix clauses parse — UNIQUE DEFAULT, " +
    "DEFAULT REFERENCES, PRIMARY KEY DEFAULT") {
    val dir = Files.createTempDirectory("graft-restrict-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "sres_")
    spark.sql("CREATE TABLE sres_par (pid BIGINT PRIMARY KEY)")
    spark.sql("CREATE TABLE sres_t (" +
      "id BIGINT PRIMARY KEY, " +
      "a INT UNIQUE DEFAULT 5, " +
      "b BIGINT DEFAULT 0 REFERENCES sres_par(pid), " +
      "c STRING DEFAULT 'x')")
    val spec = wh.tableSpec("t")
    assert(spec.primaryKey === Seq("id"))
    assert(spec.unique === Seq(Seq("a")))
    assert(spec.defaults === Map("a" -> "5", "b" -> "0", "c" -> "'x'"))
    assert(spec.foreignKeys ===
      Seq(Warehouse.ForeignKey(Seq("b"), "par", Seq("pid"))))
    // the stacked clauses ENFORCE: defaults fill, UNIQUE probes, FK
    // validates against the parent
    spark.sql("INSERT INTO sres_par VALUES (0)")
    spark.sql("INSERT INTO sres_t (id) VALUES (1)")
    val row = spark.sql("SELECT a, b, c FROM sres_t WHERE id = 1").head()
    assert((row.getInt(0), row.getLong(1), row.getString(2)) ===
      ((5, 0L, "x")))
    intercept[Exception] { // a=5 again violates the stacked UNIQUE
      spark.sql("INSERT INTO sres_t (id) VALUES (2)")
    }
    intercept[Exception] { // b=9 has no parent
      spark.sql("INSERT INTO sres_t (id, a, b) VALUES (3, 6, 9)")
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** UNIQUE constraints (NULLS DISTINCT) and DEFAULT column fills — the
  * rest of the SQL constraint surface around the enforced PK/FK:
  * batch-internal and live-table uniqueness reject atomically with the
  * PK probe's file skipping; merge excludes its own replaced keys;
  * DEFAULTs fill omitted columns on every append path (a fill rule,
  * not ALWAYS — supplied values pass through).
  */
class WarehouseUniqueSpec extends SparkSpec {

  import spark.implicits._

  private val spec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("id", LongType),
      StructField("email", StringType),
      StructField("tier", StringType))),
    statColumns = Seq("id"),
    primaryKey = Seq("id"),
    unique = Seq(Seq("email")),
    defaults = Map("tier" -> "'basic'"))

  private def fresh(s: Warehouse.TableSpec = spec): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-uq-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> s))
    wh.bootstrap()
    (wh, dir)
  }

  test("UNIQUE rejects batch duplicates and live collisions atomically; " +
    "NULLs are distinct; DEFAULT fills omitted columns") {
    val (wh, _) = fresh()
    // tier omitted → DEFAULT fills 'basic'
    wh.append("t", Seq((1L, "a@x.com"), (2L, "b@x.com"))
      .toDF("id", "email"))
    assert(wh.read("t").where($"tier" === "basic").count() === 2L)
    // supplied values pass through (DEFAULT, not ALWAYS)
    wh.append("t", Seq((3L, "c@x.com", "pro")).toDF("id", "email", "tier"))
    assert(wh.read("t").where($"id" === 3L).head().getString(2) === "pro")
    val dup = intercept[Warehouse.UniqueViolation] {
      wh.append("t", Seq((4L, "d@x.com"), (5L, "d@x.com"))
        .toDF("id", "email"))
    }
    assert(dup.getMessage.contains("duplicate within batch"))
    val live = intercept[Warehouse.UniqueViolation] {
      wh.append("t", Seq((6L, "fresh@x.com"), (7L, "a@x.com"))
        .toDF("id", "email"))
    }
    assert(live.getMessage.contains("already exists"))
    assert(live.getMessage.contains("a@x.com"))
    assert(wh.read("t").count() === 3L) // nothing of either batch landed
    // NULL emails are all fine together (NULLS DISTINCT)
    wh.append("t", Seq((8L, null.asInstanceOf[String]),
      (9L, null.asInstanceOf[String])).toDF("id", "email"))
    assert(wh.read("t").count() === 5L)
  }

  test("merge may re-assert a row's OWN unique value but not steal " +
    "another's; SET of unique columns is banned on update paths") {
    val (wh, _) = fresh()
    wh.append("t", Seq((1L, "a@x.com"), (2L, "b@x.com"))
      .toDF("id", "email"))
    // replacing row 1 with its own email is legal
    wh.merge("t", Seq((1L, "a@x.com", "gold")).toDF("id", "email", "tier"),
      Seq("id"))
    assert(wh.read("t").where($"id" === 1L).head().getString(2) === "gold")
    // stealing row 2's email via row 1 is not
    intercept[Warehouse.UniqueViolation] {
      wh.merge("t", Seq((1L, "b@x.com", "gold"))
        .toDF("id", "email", "tier"), Seq("id"))
    }
    intercept[IllegalArgumentException] {
      wh.update("t", $"id" === 1L, Map("email" -> lit("z@x.com")))
    }
    intercept[IllegalArgumentException] {
      wh.updateVectored("t", $"id" === 1L, Map("email" -> lit("z@x.com")))
    }
    intercept[IllegalArgumentException] {
      wh.mergeInto("t", Seq((1L, "q@x.com", "x")).toDF("id", "email", "tier"),
        Seq("id"), matchedUpdate = Some((None, Map("email" -> lit("q@x.com")))))
    }
    // mergeInto INSERTS enforce against live values
    intercept[Warehouse.UniqueViolation] {
      wh.mergeInto("t", Seq((9L, "b@x.com", "x")).toDF("id", "email", "tier"),
        Seq("id"), notMatchedInsert = Some(None))
    }
  }

  test("quarantine routes `unique` rows (all duplicate members tag, " +
    "after primary_key); concurrent unique race re-probes on conflict") {
    val (wh, dir) = fresh()
    wh.append("t", Seq((1L, "a@x.com")).toDF("id", "email"))
    val (kept, quarantined) = wh.appendQuarantine("t", "t_bad", Seq(
      (2L, "ok@x.com", "basic"),   // fine
      (3L, "dup@x.com", "basic"),  // batch-dup pair → both quarantine
      (4L, "dup@x.com", "basic"),
      (5L, "a@x.com", "basic"),    // live hit
      (1L, "new@x.com", "basic")   // PK collision outranks unique
    ).toDF("id", "email", "tier"))
    assert(kept === 1L)
    assert(quarantined === 4L)
    val bad = wh.read("t_bad").select("id", "violation")
      .as[(Long, String)].collect().toMap
    assert(bad(3L) === "unique" && bad(4L) === "unique")
    assert(bad(5L) === "unique")
    assert(bad(1L) === "primary_key")
    // conflict re-probe: a racing writer lands the same email between
    // our probe and commit → rejected, nothing duplicated
    val other = Warehouse.open(spark, dir)
    var injected = false
    wh.beforeCommit = Some(() => if (!injected) {
      injected = true
      other.append("t", Seq((50L, "race@x.com")).toDF("id", "email"))
    })
    try intercept[Warehouse.UniqueViolation] {
      wh.append("t", Seq((51L, "race@x.com")).toDF("id", "email"))
    } finally wh.beforeCommit = None
    assert(wh.read("t").where($"email" === "race@x.com").count() === 1L)
  }

  test("DDL: column UNIQUE / table UNIQUE(...) / DEFAULT parse, INSERT " +
    "column lists may omit defaulted columns, SHOW CREATE + reopen " +
    "round-trip; scd/rename guards hold") {
    val dir = Files.createTempDirectory("graft-uq-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "uq_")
    spark.sql("""CREATE TABLE uq_t (
        id BIGINT PRIMARY KEY,
        email STRING UNIQUE,
        tier STRING DEFAULT 'basic',
        UNIQUE (tier, email)) STATS BY (id)""")
    spark.sql("INSERT INTO uq_t VALUES (1, 'a@x.com', 'pro')")
    // positional insert omitting the defaulted column
    spark.sql("INSERT INTO uq_t VALUES (2, 'b@x.com')")
    assert(spark.sql("SELECT tier FROM uq_t WHERE id = 2")
      .head().getString(0) === "basic")
    intercept[Exception] {
      spark.sql("INSERT INTO uq_t VALUES (3, 'a@x.com', 'x')")
    }
    val ddl = spark.sql("SHOW CREATE TABLE uq_t").head().getString(0)
    assert(ddl.contains("UNIQUE (email)"))
    assert(ddl.contains("UNIQUE (tier, email)"))
    assert(ddl.contains("DEFAULT 'basic'"))
    val det = spark.sql("DESCRIBE DETAIL uq_t").head()
    assert(det.getAs[String]("unique_constraints") ===
      "(email); (tier,email)")
    assert(det.getAs[String]("column_defaults") === "tier='basic'")
    val wh2 = Warehouse.open(spark, dir)
    assert(wh2.tableSpec("t").unique.toSet ===
      Set(Seq("email"), Seq("tier", "email")))
    assert(wh2.tableSpec("t").defaults === Map("tier" -> "'basic'"))
    intercept[IllegalArgumentException] { wh2.renameColumn("t", "email", "e") }
    intercept[IllegalArgumentException] {
      wh2.scdMerge("t", Seq((1L, "x@x.com", "b")).toDF("id", "email", "tier"),
        Seq("id"), lit("2026-01-01"))
    }
    // a broken DEFAULT fails the CREATE, not the first append
    intercept[IllegalArgumentException] {
      wh2.createTable("bad", Warehouse.TableSpec(
        StructType(Seq(StructField("a", LongType))),
        defaults = Map("a" -> "no_such_fn()")))
    }
  }

  test("ALTER-time DDL: ADD UNIQUE / ADD FOREIGN KEY validate existing " +
    "data first; SET/DROP DEFAULT take effect immediately") {
    val dir = Files.createTempDirectory("graft-uq-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "alt_")
    spark.sql("CREATE TABLE alt_p (pid BIGINT PRIMARY KEY, nm STRING)")
    spark.sql("CREATE TABLE alt_c (cid BIGINT, pid BIGINT, tag STRING)")
    spark.sql("INSERT INTO alt_p VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO alt_c VALUES (10, 1, 'x'), (11, 2, 'x')")
    // ADD UNIQUE over clean data succeeds and then enforces
    spark.sql("ALTER TABLE alt_c ADD UNIQUE (cid)")
    intercept[Exception] {
      spark.sql("INSERT INTO alt_c VALUES (10, 1, 'dup')")
    }
    // ADD UNIQUE over dirty data refuses (tag has duplicates)
    val dirty = intercept[Exception] {
      spark.sql("ALTER TABLE alt_c ADD CONSTRAINT u2 UNIQUE (tag)")
    }
    assert(dirty.getMessage.contains("existing rows violate"))
    // ADD FOREIGN KEY over satisfied data succeeds and then enforces
    spark.sql(
      "ALTER TABLE alt_c ADD FOREIGN KEY (pid) REFERENCES alt_p (pid)")
    intercept[Exception] {
      spark.sql("INSERT INTO alt_c VALUES (12, 99, 'y')")
    }
    intercept[Exception] { spark.sql("DELETE FROM alt_p WHERE pid = 1") }
    // ADD FOREIGN KEY over dangling data refuses
    spark.sql("CREATE TABLE alt_c2 (cid BIGINT, pid BIGINT)")
    spark.sql("INSERT INTO alt_c2 VALUES (1, 77)")
    val dangle = intercept[Exception] {
      spark.sql(
        "ALTER TABLE alt_c2 ADD FOREIGN KEY (pid) REFERENCES alt_p (pid)")
    }
    assert(dangle.getMessage.contains("no parent row"))
    // and the refused constraint did NOT stick
    spark.sql("INSERT INTO alt_c2 VALUES (2, 88)")
    // SET DEFAULT applies to subsequent inserts; DROP DEFAULT reverts
    spark.sql("ALTER TABLE alt_c ALTER COLUMN tag SET DEFAULT 'filled'")
    spark.sql("INSERT INTO alt_c (cid, pid) VALUES (13, 2)")
    assert(spark.sql("SELECT tag FROM alt_c WHERE cid = 13")
      .head().getString(0) === "filled")
    spark.sql("ALTER TABLE alt_c ALTER COLUMN tag DROP DEFAULT")
    intercept[Exception] { // tag now required again
      spark.sql("INSERT INTO alt_c (cid, pid) VALUES (14, 2)")
    }
    // everything persisted: reopen sees the added constraints
    val wh2 = Warehouse.open(spark, dir)
    assert(wh2.tableSpec("c").unique === Seq(Seq("cid")))
    assert(wh2.tableSpec("c").foreignKeys ===
      Seq(Warehouse.ForeignKey(Seq("pid"), "p", Seq("pid"))))
    assert(wh2.tableSpec("c").defaults === Map.empty)
  }
}

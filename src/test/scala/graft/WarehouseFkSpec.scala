package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** ENFORCED FOREIGN KEYs — referential integrity between warehouse
  * tables, the other half of the reference's Postgres constraint story
  * (its star schema joins `fact_telemetry.norad_id` to
  * `dim_satellites.norad_id`; Postgres users declare that as a FOREIGN
  * KEY, `script.py:78-82` ff.). Child-side: every row-adding path
  * rejects keys no parent row has (MATCH SIMPLE — null components
  * pass). Parent-side: DELETE/overwrite/merge-delete obey ON DELETE
  * RESTRICT. Probes file-skip through the same footer-stat/bloom
  * machinery as the PK probe; quarantine appends route violations as
  * `foreign_key` rows instead of failing the batch.
  */
class WarehouseFkSpec extends SparkSpec {

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
      StructField("pid", LongType),
      StructField("v", DoubleType))),
    statColumns = Seq("cid"),
    primaryKey = Seq("cid"),
    foreignKeys = Seq(Warehouse.ForeignKey(Seq("pid"), "p", Seq("pid"))))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-fk-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("p" -> parentSpec, "c" -> childSpec))
    wh.bootstrap()
    (wh, dir)
  }

  private def parents(ids: Seq[Long]) =
    ids.map(i => (i, s"p$i")).toDF("pid", "pname")
  private def children(rows: Seq[(Long, Long)]) =
    rows.map { case (c, p) => (c, p, c * 1.0) }.toDF("cid", "pid", "v")

  test("child append rejects a dangling key atomically; null FK " +
    "components satisfy the constraint (MATCH SIMPLE)") {
    val (wh, _) = fresh()
    wh.append("p", parents(1L to 10L))
    wh.append("c", children(Seq(101L -> 1L, 102L -> 5L)))

    val dangle = intercept[Warehouse.ForeignKeyViolation] {
      wh.append("c", children(Seq(103L -> 2L, 104L -> 99L)))
    }
    assert(dangle.getMessage.contains("no parent row"))
    assert(dangle.getMessage.contains("pid=99"))
    // atomic: 103 (valid half of the batch) must NOT have landed
    assert(wh.read("c").count() === 2L)

    // a NULL key component passes (SQL MATCH SIMPLE)
    wh.append("c", Seq(
      (java.lang.Long.valueOf(105L), null.asInstanceOf[java.lang.Long], 1.0)
    ).toDF("cid", "pid", "v"))
    assert(wh.read("c").count() === 3L)
  }

  test("parent-side ON DELETE RESTRICT: delete/deleteKeys/" +
    "deleteVectored of a referenced key reject; unreferenced keys go") {
    val (wh, _) = fresh()
    wh.append("p", parents(1L to 10L))
    wh.append("c", children(Seq(101L -> 1L, 102L -> 5L)))

    val res = intercept[Warehouse.ForeignKeyViolation] {
      wh.delete("p", $"pid" === 5L)
    }
    assert(res.getMessage.contains("RESTRICT"))
    assert(res.getMessage.contains("pid=5"))
    assert(wh.read("p").count() === 10L)

    intercept[Warehouse.ForeignKeyViolation] {
      wh.deleteKeys("p", Seq(1L).toDF("pid"), Seq("pid"))
    }
    intercept[Warehouse.ForeignKeyViolation] {
      wh.deleteVectored("p", $"pid" === 1L)
    }
    // unreferenced parents delete fine, by every path
    assert(wh.delete("p", $"pid" === 10L) === 1L)
    assert(wh.deleteKeys("p", Seq(9L).toDF("pid"), Seq("pid")) === 1L)
    assert(wh.deleteVectored("p", $"pid" === 8L) === 1L)
    assert(wh.read("p").count() === 7L)
    // and once the child rows are gone, their parent may go too
    wh.delete("c", $"pid" === 5L)
    assert(wh.delete("p", $"pid" === 5L) === 1L)
  }

  test("appendAll loading parent + child in ONE transaction sees the " +
    "co-committed parent keys; child alone still rejects") {
    val (wh, _) = fresh()
    intercept[Warehouse.ForeignKeyViolation] {
      wh.appendAll(Seq(("c", children(Seq(101L -> 1L)), 0L)))
    }
    // parent + child in one atomic commit: the child's keys resolve
    // against the parent BATCH (arrival order inside the txn is moot)
    wh.appendAll(Seq(
      ("c", children(Seq(101L -> 1L, 102L -> 2L)), 0L),
      ("p", parents(1L to 3L), 0L)))
    assert(wh.read("c").count() === 2L)
    assert(wh.read("p").count() === 3L)
    // a co-committed parent batch does NOT excuse keys in neither
    intercept[Warehouse.ForeignKeyViolation] {
      wh.appendAll(Seq(
        ("c", children(Seq(103L -> 99L)), 0L),
        ("p", parents(Seq(4L)), 0L)))
    }
  }

  test("self-referencing FK: keys the batch itself introduces count " +
    "as parents; a truly dangling self-reference rejects") {
    val dir = Files.createTempDirectory("graft-fk-").toString
    val spec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("mgr", LongType))),
      statColumns = Seq("id"),
      primaryKey = Seq("id"),
      foreignKeys = Seq(Warehouse.ForeignKey(Seq("mgr"), "e", Seq("id"))))
    val wh = new Warehouse(spark, dir, specs = Map("e" -> spec))
    wh.bootstrap()
    // root points at itself; reports point at batch-mates
    wh.append("e", Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "mgr"))
    assert(wh.read("e").count() === 3L)
    intercept[Warehouse.ForeignKeyViolation] {
      wh.append("e", Seq((4L, 42L)).toDF("id", "mgr"))
    }
    // RESTRICT applies to self-children too
    intercept[Warehouse.ForeignKeyViolation] { wh.delete("e", $"id" === 2L) }
    assert(wh.delete("e", $"id" === 3L) === 1L) // leaf goes
  }

  test("appendQuarantine routes dangling keys as `foreign_key` rows; " +
    "good rows land; priority is checks > primary_key > foreign_key") {
    val (wh, _) = fresh()
    wh.append("p", parents(1L to 5L))
    wh.append("c", children(Seq(100L -> 1L)))
    val (kept, quarantined) = wh.appendQuarantine("c", "c_bad",
      children(Seq(101L -> 2L, 102L -> 77L, 100L -> 1L)))
    assert(kept === 1L) // 101 only
    assert(quarantined === 2L)
    val bad = wh.read("c_bad").select("cid", "violation")
      .as[(Long, String)].collect().toMap
    assert(bad(102L) === "foreign_key")
    assert(bad(100L) === "primary_key") // collision outranks FK
    assert(wh.read("c").count() === 2L)
  }

  test("child-side probe file-skips the PARENT by footer stats: a " +
    "corrupted parent file outside the batch's key range is never read") {
    val (wh, dir) = fresh()
    wh.append("p", parents(1L to 100L))
    wh.append("p", parents(10000L to 10100L))
    val (_, entries) = wh.loadLatest("p")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val victims = entries.filter(_.stats.get("pid").exists(_._1 >= 10000L))
    assert(victims.nonEmpty)
    victims.foreach { e =>
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/p/${e.rel}"),
        true)
      out.write("not parquet".getBytes); out.close()
    }
    // child keys far below the corrupted range: probe prunes those files
    wh.append("c", children(Seq(201L -> 20L, 202L -> 90L)))
    // a key INSIDE the corrupted range forces the read → surfaces
    intercept[Exception] { wh.append("c", children(Seq(203L -> 10050L))) }
  }

  test("UPDATE of an FK column enforces; merge/mergeInto paths " +
    "enforce; overwrite RESTRICTs evicted keys") {
    val (wh, _) = fresh()
    wh.append("p", parents(1L to 5L))
    wh.append("c", children(Seq(101L -> 1L, 102L -> 2L)))

    intercept[Warehouse.ForeignKeyViolation] {
      wh.update("c", $"cid" === 101L, Map("pid" -> lit(66L)))
    }
    wh.update("c", $"cid" === 101L, Map("pid" -> lit(3L)))
    intercept[Warehouse.ForeignKeyViolation] {
      wh.updateVectored("c", $"cid" === 101L, Map("pid" -> lit(66L)))
    }
    intercept[Warehouse.ForeignKeyViolation] {
      wh.merge("c", children(Seq(103L -> 44L)), Seq("cid"))
    }
    intercept[Warehouse.ForeignKeyViolation] {
      wh.mergeInto("c", children(Seq(104L -> 44L)), Seq("cid"),
        notMatchedInsert = Some(None))
    }
    // mergeInto delete clause on the PARENT obeys RESTRICT
    intercept[Warehouse.ForeignKeyViolation] {
      wh.mergeInto("p", parents(Seq(2L)), Seq("pid"),
        matchedDelete = Some(lit(true)))
    }
    // overwrite of the parent evicting a referenced key rejects;
    // re-supplying every referenced key is fine
    intercept[Warehouse.ForeignKeyViolation] {
      wh.overwrite("p", parents(Seq(1L)))
    }
    wh.overwrite("p", parents(Seq(2L, 3L)))
    assert(wh.read("p").count() === 2L)
  }

  test("DDL: FOREIGN KEY / column REFERENCES parse, persist, reopen, " +
    "and SHOW CREATE TABLE round-trips; invalid targets fail createTable") {
    val dir = Files.createTempDirectory("graft-fk-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "fkt_")
    spark.sql(
      "CREATE TABLE fkt_dept (did BIGINT PRIMARY KEY, dname STRING) " +
        "STATS BY (did)")
    spark.sql(
      "CREATE TABLE fkt_emp (eid BIGINT, did BIGINT, " +
        "PRIMARY KEY (eid), FOREIGN KEY (did) REFERENCES fkt_dept (did))")
    spark.sql("INSERT INTO fkt_dept VALUES (1, 'eng'), (2, 'ops')")
    spark.sql("INSERT INTO fkt_emp VALUES (10, 1)")
    intercept[Exception] { spark.sql("INSERT INTO fkt_emp VALUES (11, 9)") }
    assert(spark.sql("SELECT count(*) FROM fkt_emp").head().getLong(0) === 1L)
    val ddl = spark.sql("SHOW CREATE TABLE fkt_emp").head().getString(0)
    assert(ddl.contains("FOREIGN KEY (did) REFERENCES dept (did)"))
    // column-level REFERENCES sugar
    spark.sql("CREATE TABLE fkt_badge (bid BIGINT PRIMARY KEY, " +
      "eid BIGINT REFERENCES fkt_emp(eid))")
    intercept[Exception] { spark.sql("INSERT INTO fkt_badge VALUES (1, 99)") }
    spark.sql("INSERT INTO fkt_badge VALUES (1, 10)")
    // the spec survives a reopen (JSON round-trip)
    val wh2 = Warehouse.open(spark, dir)
    assert(wh2.tableSpec("emp").foreignKeys ===
      Seq(Warehouse.ForeignKey(Seq("did"), "dept", Seq("did"))))
    intercept[Warehouse.ForeignKeyViolation] {
      wh2.append("emp", Seq((12L, 9L)).toDF("eid", "did"))
    }
    // dropTable of a referenced parent is guarded
    val guard = intercept[Exception] { wh2.dropTable("dept") }
    assert(guard.getMessage.contains("FOREIGN KEY"))
    // rename/drop of FK columns is guarded
    intercept[Exception] { wh2.renameColumn("emp", "did", "dept_id") }
    // createTable validation: missing parent / wrong columns / type
    intercept[IllegalArgumentException] {
      wh2.createTable("x1", Warehouse.TableSpec(
        StructType(Seq(StructField("a", LongType))),
        foreignKeys = Seq(Warehouse.ForeignKey(Seq("a"), "nope", Seq("z")))))
    }
    intercept[IllegalArgumentException] {
      wh2.createTable("x2", Warehouse.TableSpec(
        StructType(Seq(StructField("a", LongType))),
        foreignKeys = Seq(
          Warehouse.ForeignKey(Seq("a"), "dept", Seq("dname")))))
    }
    intercept[IllegalArgumentException] {
      wh2.createTable("x3", Warehouse.TableSpec(
        StructType(Seq(StructField("a", IntegerType))),
        foreignKeys = Seq(
          Warehouse.ForeignKey(Seq("a"), "dept", Seq("did")))))
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** ENFORCED PRIMARY KEY — the reference's Postgres `PRIMARY KEY`
  * (`script.py:78-82`) made real on the warehouse: NULL keys, batch
  * duplicates and live-row collisions reject the write atomically;
  * the collision probe file-skips via footer stats; concurrent
  * same-key appends are serialized by the commit-conflict re-probe;
  * merge-family ops must key on the PK; quarantine appends route
  * violations instead of failing the batch.
  */
class WarehousePkSpec extends SparkSpec {

  import spark.implicits._

  private val pkSpec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("id", LongType),
      StructField("grp", StringType),
      StructField("val", DoubleType))),
    statColumns = Seq("id"),
    primaryKey = Seq("id"))

  private def fresh(spec: Warehouse.TableSpec = pkSpec)
      : (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-pk-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    (wh, dir)
  }

  private def rows(ids: Seq[Long]) =
    ids.map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "val")

  test("append rejects NULL keys, batch duplicates, and collisions — " +
    "atomically (nothing of the failing batch commits)") {
    val (wh, _) = fresh()
    wh.append("t", rows(1L to 10L))
    val v0 = wh.versions("t").max

    val dup = intercept[Warehouse.PrimaryKeyViolation] {
      wh.append("t", rows(Seq(21L, 22L, 21L)))
    }
    assert(dup.getMessage.contains("duplicate key within batch"))

    val nul = intercept[Warehouse.PrimaryKeyViolation] {
      wh.append("t", Seq(
        (java.lang.Long.valueOf(23L), "g", 1.0),
        (null.asInstanceOf[java.lang.Long], "g", 2.0)
      ).toDF("id", "grp", "val"))
    }
    assert(nul.getMessage.contains("NULL key"))

    val hit = intercept[Warehouse.PrimaryKeyViolation] {
      wh.append("t", rows(Seq(30L, 5L))) // 5 is live
    }
    assert(hit.getMessage.contains("already exists"))
    assert(hit.getMessage.contains("id=5"))

    // atomic: no version advanced, no stray rows (30 must NOT land)
    assert(wh.versions("t").max === v0)
    assert(wh.read("t").count() === 10L)
    // disjoint keys append fine after all those rejections
    wh.append("t", rows(11L to 15L))
    assert(wh.read("t").count() === 15L)
  }

  test("collision probe file-skips by footer stats: a corrupted file " +
    "outside the batch's key range is never read") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1L to 100L))
    wh.append("t", rows(10000L to 10100L))
    // corrupt the SECOND append's files on disk (manifest still lists
    // them): any probe that touches them now explodes
    val (_, entries) = wh.loadLatest("t")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val victims = entries.filter(_.stats.get("id").exists(_._1 >= 10000L))
    assert(victims.nonEmpty)
    victims.foreach { e =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/t/${e.rel}")
      val out = fs.create(p, true)
      out.write("not parquet".getBytes); out.close()
    }
    // batch far below the corrupted range: the probe's range predicate
    // prunes those files from the manifest plan, so this append works
    wh.append("t", rows(200L to 210L))
    // batch overlapping the corrupted range: the probe MUST read them
    intercept[Exception] { wh.append("t", rows(Seq(10050L))) }
  }

  test("STRING-key collision probe file-skips by BLOOM sidecars (no " +
    "footer stats for strings): corrupted non-matching files unread") {
    val dir = Files.createTempDirectory("graft-pk-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" ->
      Warehouse.TableSpec(
        StructType(Seq(
          StructField("id", StringType),
          StructField("val", DoubleType))),
        bloomColumns = Seq("id"), bloomFpp = 0.001,
        primaryKey = Seq("id"))))
    wh.bootstrap()
    def srows(p: String, n: Range) = n.map(i => (s"$p$i", i * 1.0))
      .toDF("id", "val")
    wh.append("t", srows("a", 1 to 100))
    val before = wh.loadLatest("t")._2.map(_.rel).toSet
    wh.append("t", srows("b", 1 to 100))
    // corrupt the b-batch's files: readable only if the probe fails
    // to bloom-skip them
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val victims = wh.loadLatest("t")._2.filterNot(e => before(e.rel))
    assert(victims.nonEmpty)
    victims.foreach { e =>
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/t/${e.rel}"),
        true)
      out.write("not parquet".getBytes); out.close()
    }
    // fresh keys: every file's bloom excludes them -> nothing is read
    wh.append("t", srows("c", 1 to 5))
    // a key IN the corrupted batch: its bloom attests "maybe", the file
    // must be read, and the corruption surfaces
    intercept[Exception] { wh.append("t", srows("b", 5 to 5)) }
  }

  test("concurrent same-key appends serialize: the conflict re-probe " +
    "rejects the second writer") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1L to 5L))
    val other = Warehouse.open(spark, dir)
    // inject a colliding commit BETWEEN wh's probe and its commit
    wh.beforeCommit = Some(() => other.append("t", rows(Seq(77L))))
    try {
      val e = intercept[Warehouse.PrimaryKeyViolation] {
        wh.append("t", rows(Seq(77L, 78L)))
      }
      assert(e.getMessage.contains("id=77"))
    } finally wh.beforeCommit = None
    // the injected commit is the only change; 78 never landed
    assert(wh.read("t").as[(Long, String, Double)].collect()
      .map(_._1).toSet === (1L to 5L).toSet + 77L)
  }

  test("merge-family ops must key on the PK; SET of a key column and " +
    "rename/drop of it are banned") {
    val (wh, _) = fresh()
    wh.append("t", rows(1L to 5L))
    val wrongKeys = intercept[IllegalArgumentException] {
      wh.merge("t", rows(Seq(1L)), Seq("grp"))
    }
    assert(wrongKeys.getMessage.contains("PRIMARY KEY"))
    // merge ON the pk upserts fine (replace 1, insert 6)
    wh.merge("t", Seq((1L, "gX", 9.0), (6L, "gY", 6.0))
      .toDF("id", "grp", "val"), Seq("id"))
    assert(wh.read("t").where($"id" === 1L).head().getString(1) === "gX")
    assert(wh.read("t").count() === 6L)
    // a key-duplicated merge batch is rejected up front
    intercept[Warehouse.PrimaryKeyViolation] {
      wh.merge("t", rows(Seq(8L, 8L)), Seq("id"))
    }
    val setPk = intercept[IllegalArgumentException] {
      wh.update("t", $"grp" === "gX", Map("id" -> lit(99L)))
    }
    assert(setPk.getMessage.contains("PRIMARY KEY column id"))
    val setPkMor = intercept[IllegalArgumentException] {
      wh.updateVectored("t", $"grp" === "gX", Map("id" -> lit(99L)))
    }
    assert(setPkMor.getMessage.contains("PRIMARY KEY column id"))
    // rename/drop guard on a PK column with NO other layout role (the
    // fixture's id is also a stat column, which trips its own guard)
    val (wh3, _) = fresh(pkSpec.copy(statColumns = Nil))
    val ren = intercept[IllegalArgumentException] {
      wh3.renameColumn("t", "id", "id2")
    }
    assert(ren.getMessage.contains("PRIMARY KEY"))
    val drop = intercept[IllegalArgumentException] {
      wh3.dropColumn("t", "id")
    }
    assert(drop.getMessage.contains("PRIMARY KEY"))
    // mergeInto: SET of the pk is banned, keyed DML works
    intercept[IllegalArgumentException] {
      wh.mergeInto("t", rows(Seq(2L)), Seq("id"),
        matchedUpdate = Some((None, Map("id" -> lit(50L)))))
    }
    wh.mergeInto("t", Seq((2L, "gZ", 0.0)).toDF("id", "grp", "val"),
      Seq("id"),
      matchedUpdate = Some((None, Map("grp" -> col("src_grp")))))
    assert(wh.read("t").where($"id" === 2L).head().getString(1) === "gZ")
    // an SCD2 merge on a bare-business-key PK is a modeling error —
    // versions share the key by design; rejected before any write
    val scd = intercept[IllegalArgumentException] {
      wh.scdMerge("t", rows(Seq(1L)), Seq("id"), lit("2026-01-01"))
    }
    assert(scd.getMessage.contains("SCD2"))
  }

  test("scdMerge ENFORCES a (key, validFrom) PK: duplicate-key source " +
    "and same-instant re-version are rejected; distinct instants work") {
    val dir = Files.createTempDirectory("graft-pk-").toString
    val wh = new Warehouse(spark, dir, specs = Map("d" ->
      Warehouse.TableSpec(
        StructType(Seq(
          StructField("id", LongType),
          StructField("attr", StringType),
          StructField("valid_from", StringType),
          StructField("valid_to", StringType),
          StructField("is_current", BooleanType))),
        primaryKey = Seq("id", "valid_from"))))
    wh.bootstrap()
    def src(pairs: (Long, String)*) = pairs.toSeq.toDF("id", "attr")
    wh.scdMerge("d", src(1L -> "a", 2L -> "b"), Seq("id"), lit("T1"))
    // duplicate business key in the source batch
    intercept[Warehouse.PrimaryKeyViolation] {
      wh.scdMerge("d", src(3L -> "x", 3L -> "y"), Seq("id"), lit("T2"))
    }
    // same-instant re-version: the close+insert pair would share
    // (id=1, valid_from=T1)
    intercept[Warehouse.PrimaryKeyViolation] {
      wh.scdMerge("d", src(1L -> "CHANGED"), Seq("id"), lit("T1"))
    }
    // a distinct instant versions cleanly and keeps the PK unique
    wh.scdMerge("d", src(1L -> "CHANGED"), Seq("id"), lit("T2"))
    val all = wh.read("d").select($"id", $"valid_from")
      .as[(Long, String)].collect().toSeq
    assert(all.size === all.distinct.size, "PK must stay unique")
    assert(all.toSet === Set((1L, "T1"), (2L, "T1"), (1L, "T2")))
  }

  test("appendQuarantine routes PK violations: null keys, ALL batch-dup " +
    "members, live collisions — named CHECKs win attribution") {
    val dir = Files.createTempDirectory("graft-pk-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> pkSpec.copy(
      checks = Map("val_pos" -> "val >= 0"))))
    wh.bootstrap()
    wh.append("t", rows(1L to 3L))
    val batch = Seq(
      (java.lang.Long.valueOf(10L), "g", 1.0),  // good
      (java.lang.Long.valueOf(11L), "g", 2.0),  // batch dup (both out)
      (java.lang.Long.valueOf(11L), "g", 3.0),
      (java.lang.Long.valueOf(2L), "g", 4.0),   // live collision
      (null.asInstanceOf[java.lang.Long], "g", 5.0), // null key
      (java.lang.Long.valueOf(12L), "g", -1.0)  // CHECK loses first
    ).toDF("id", "grp", "val")
    val (kept, quarantined) = wh.appendQuarantine("t", "t_bad", batch)
    assert((kept, quarantined) === (1L, 5L))
    val bad = wh.read("t_bad")
      .select($"violation", $"val").as[(String, Double)].collect().toSet
    assert(bad === Set(("primary_key", 2.0), ("primary_key", 3.0),
      ("primary_key", 4.0), ("primary_key", 5.0), ("val_pos", -1.0)))
    assert(wh.read("t").count() === 4L) // 3 base + the good row
    // a PK-only table (no checks) may quarantine too
    val wh2 = new Warehouse(spark,
      Files.createTempDirectory("graft-pk-").toString,
      specs = Map("t" -> pkSpec))
    wh2.bootstrap()
    wh2.append("t", rows(1L to 2L))
    val (k2, q2) = wh2.appendQuarantine("t", "t_bad", rows(Seq(2L, 3L)))
    assert((k2, q2) === (1L, 1L))
  }

  test("copyInto and overwrite enforce; spec survives Warehouse.open") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1L to 5L))
    val src = Files.createTempDirectory("graft-pk-src-").toString
    rows(Seq(4L, 40L)).write.parquet(s"$src/batch")
    intercept[Warehouse.PrimaryKeyViolation] {
      wh.copyInto("t", src) // 4 collides
    }
    assert(wh.read("t").count() === 5L)
    // overwrite replaces everything: only batch-internal rules apply
    wh.overwrite("t", rows(Seq(4L, 40L)))
    assert(wh.read("t").count() === 2L)
    intercept[Warehouse.PrimaryKeyViolation] {
      wh.overwrite("t", rows(Seq(50L, 50L)))
    }
    // reopen from _meta: enforcement still on
    val re = Warehouse.open(spark, dir)
    assert(re.tableSpec("t").primaryKey === Seq("id"))
    intercept[Warehouse.PrimaryKeyViolation] {
      re.append("t", rows(Seq(40L)))
    }
  }

  test("SQL surface: CREATE TABLE enforces, SHOW CREATE round-trips, " +
    "DESCRIBE DETAIL reports the key") {
    val dir = Files.createTempDirectory("graft-pk-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map.empty[String, Warehouse.TableSpec])
    wh.registerSql("pks_")
    spark.sql("""CREATE TABLE pks_t (
        id BIGINT PRIMARY KEY, grp STRING, val DOUBLE
      ) STATS BY (id)""")
    spark.sql("INSERT INTO pks_t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO pks_t VALUES (2, 'x', 9.0)")
    }
    assert(e.getMessage.contains("PRIMARY KEY"))
    assert(spark.sql("SELECT count(*) FROM pks_t").head().getLong(0) === 2L)
    assert(spark.sql("DESCRIBE DETAIL pks_t").head()
      .getAs[String]("primary_key") === "id")
    val stmt = spark.sql("SHOW CREATE TABLE pks_t")
      .head().getString(0)
    assert(stmt.contains("PRIMARY KEY (id)"))
    // the emitted DDL replays into an ENFORCING twin
    spark.sql(stmt.split(";\n").head.replace("pks_t", "pks_u"))
    spark.sql("INSERT INTO pks_u VALUES (7, 'a', 1.0)")
    intercept[Exception] {
      spark.sql("INSERT INTO pks_u VALUES (7, 'b', 2.0)")
    }
  }
}

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

  test("rebase publishes over interim blind appends; interim edits of " +
    "its OWN files ride along; history records the rebase") {
    val (wh, _) = fresh() // ids 1..20
    wh.shallowClone("t", "stage")
    wh.delete("stage", $"id" <= 5L) // CoW rewrite into staging-local
    wh.append("stage", Seq((21L, "gN", 21.0)).toDF("id", "grp", "val"))
    // ingest continues on the target while the audit runs
    wh.append("t", Seq((30L, "gI", 30.0), (31L, "gI", 31.0))
      .toDF("id", "grp", "val"))
    wh.append("t", Seq((32L, "gI", 32.0)).toDF("id", "grp", "val"))
    // interim may mutate its OWN post-base rows (MoR dv on the file
    // the interim append itself wrote — no audited file is touched)
    wh.deleteVectored("t", $"id" === 31L)
    val headBefore = wh.versions("t").max
    // without rebase the stale audit still rejects (with the hint)
    val stale = intercept[IllegalArgumentException] {
      wh.publish("t", "stage")
    }
    assert(stale.getMessage.contains("rebase"))
    val v = wh.publish("t", "stage", rebase = true)
    assert(v === headBefore + 1)
    // staging state (6..21) + interim net additions (30, 32)
    assert(wh.read("t").select($"id").as[Long].collect().toSet ===
      ((6L to 21L) ++ Seq(30L, 32L)).toSet)
    val (hv, hm) = wh.history("t").last
    assert(hv === v && hm("op") === "publish_rebase")
    assert(hm("rebasedOnto").toLong === headBefore)
    // both parent states stay time-travelable
    assert(wh.readVersion("t", headBefore).select($"id").as[Long]
      .collect().toSet === ((1L to 20L) ++ Seq(30L, 32L)).toSet)
  }

  test("rebase conflicts: an interim touch of an audited file names " +
    "the file and version; PK / UNIQUE collisions between staged and " +
    "interim writes are probed") {
    val (wh, _) = fresh()
    wh.shallowClone("t", "stage")
    wh.append("stage", Seq((21L, "gN", 21.0)).toDF("id", "grp", "val"))
    wh.delete("t", $"id" === 1L) // rewrites an audited base file
    val c = intercept[Warehouse.CommitConflict] {
      wh.publish("t", "stage", rebase = true)
    }
    assert(c.getMessage.contains("touched audited file") &&
      c.getMessage.contains("op=delete"))

    // PK collision: staging and interim both add id=50
    val pkSpec = spec.copy(primaryKey = Seq("id"))
    val dir2 = Files.createTempDirectory("graft-wap-").toString
    val wh2 = new Warehouse(spark, dir2, specs = Map("t" -> pkSpec))
    wh2.bootstrap()
    wh2.append("t", Seq((1L, "g0", 1.0)).toDF("id", "grp", "val"))
    wh2.shallowClone("t", "stage")
    wh2.append("stage", Seq((50L, "gN", 50.0)).toDF("id", "grp", "val"))
    wh2.append("t", Seq((50L, "gI", 50.0), (60L, "gI", 60.0))
      .toDF("id", "grp", "val"))
    val pkHit = intercept[Warehouse.PrimaryKeyViolation] {
      wh2.publish("t", "stage", rebase = true)
    }
    assert(pkHit.getMessage.contains("id=50"))
    // disjoint keys publish fine under the same constraint
    wh2.dropTable("stage")
    wh2.shallowClone("t", "stage")
    wh2.append("stage", Seq((70L, "gN", 70.0)).toDF("id", "grp", "val"))
    wh2.append("t", Seq((80L, "gI", 80.0)).toDF("id", "grp", "val"))
    wh2.publish("t", "stage", rebase = true)
    assert(wh2.read("t").select($"id").as[Long].collect().toSet ===
      Set(1L, 50L, 60L, 70L, 80L))

    // UNIQUE collision (NULLS DISTINCT: colliding non-null values trip,
    // a NULL on either side never does)
    val uqSpec = spec.copy(unique = Seq(Seq("grp")))
    val dir3 = Files.createTempDirectory("graft-wap-").toString
    val wh3 = new Warehouse(spark, dir3, specs = Map("t" -> uqSpec))
    wh3.bootstrap()
    wh3.append("t", Seq((1L, "a", 1.0)).toDF("id", "grp", "val"))
    wh3.shallowClone("t", "stage")
    wh3.append("stage", Seq((2L, "dup", 2.0)).toDF("id", "grp", "val"))
    wh3.append("t", Seq((3L, "dup", 3.0)).toDF("id", "grp", "val"))
    val uqHit = intercept[Warehouse.UniqueViolation] {
      wh3.publish("t", "stage", rebase = true)
    }
    assert(uqHit.getMessage.contains("grp=dup"))
    wh3.dropTable("stage")
    wh3.shallowClone("t", "stage")
    wh3.append("stage",
      Seq((4L, Option.empty[String], 4.0)).toDF("id", "grp", "val"))
    wh3.append("t",
      Seq((5L, Option.empty[String], 5.0)).toDF("id", "grp", "val"))
    wh3.publish("t", "stage", rebase = true) // NULLs never collide
    assert(wh3.read("t").select($"id").as[Long].collect().toSet ===
      Set(1L, 3L, 4L, 5L))
  }

  test("IDENTITY across WAP: clones inherit the high-water mark, " +
    "publish carries the max of both chains, and a rebase where both " +
    "sides minted refuses") {
    val idSpec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("rid", LongType),
        StructField("k", LongType))),
      identity = Some(Warehouse.Identity("rid", orderBy = Seq("k"))))
    val dir = Files.createTempDirectory("graft-wap-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> idSpec))
    wh.bootstrap()
    wh.append("t", Seq(10L, 20L).toDF("k")) // rids 1, 2
    // the clone INHERITS the ratchet: its first append must not
    // re-mint rid 1..2
    wh.shallowClone("t", "stage")
    wh.append("stage", Seq(30L).toDF("k")) // rid 3, not 1
    assert(wh.read("stage").select($"rid").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
    // exact-base publish: the target's next append continues PAST the
    // ids staging minted (the hwm rides the publish commit)
    wh.publish("t", "stage")
    wh.append("t", Seq(40L).toDF("k"))
    assert(wh.read("t").select($"rid").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L))
    // one-sided interim growth rebases fine (only the target minted);
    // localize + retire borrowing manifests first so staging can drop
    wh.compact("t")
    wh.vacuum("t", keepManifests = 1)
    wh.dropTable("stage")
    wh.shallowClone("t", "stage")
    wh.deleteVectored("stage", $"k" === 10L) // audit edit, mints nothing
    wh.append("t", Seq(50L).toDF("k")) // rid 5 (interim mint)
    wh.publish("t", "stage", rebase = true)
    assert(wh.read("t").select($"rid").as[Long].collect().toSet ===
      Set(2L, 3L, 4L, 5L))
    wh.append("t", Seq(60L).toDF("k")) // hwm max carried → rid 6
    assert(wh.read("t").select($"rid").as[Long].collect().toSet ===
      Set(2L, 3L, 4L, 5L, 6L))
    // both sides minted from the same base → id ranges may overlap
    wh.compact("t")
    wh.vacuum("t", keepManifests = 1)
    wh.dropTable("stage")
    wh.shallowClone("t", "stage")
    wh.append("stage", Seq(70L).toDF("k"))
    wh.append("t", Seq(80L).toDF("k"))
    val both = intercept[Warehouse.CommitConflict] {
      wh.publish("t", "stage", rebase = true)
    }
    assert(both.getMessage.contains("IDENTITY"))
  }

  test("rebase refuses a PRE-STAMPING staging clone (no identityHwm " +
    "on its v1 commit) instead of trusting the start-1 fallback") {
    val idSpec = Warehouse.TableSpec(
      StructType(Seq(
        StructField("rid", LongType),
        StructField("k", LongType))),
      identity = Some(Warehouse.Identity("rid", orderBy = Seq("k"))))
    val dir = Files.createTempDirectory("graft-wap-pre-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> idSpec))
    wh.bootstrap()
    wh.append("t", Seq(10L, 20L).toDF("k")) // rids 1, 2
    wh.shallowClone("t", "stage")
    // a clone minted by a pre-stamping build: strip identityHwm from
    // the clone commit's meta line, raw (no Warehouse code runs)
    val mf = java.nio.file.Paths.get(dir, "stage", "_manifests",
      "v000000000001.mf")
    val text = new String(java.nio.file.Files.readAllBytes(mf),
      java.nio.charset.StandardCharsets.UTF_8)
    val stripped = text.linesIterator.map { l =>
      if (l.startsWith("#"))
        "#" + l.drop(1).split("\t")
          .filterNot(_.startsWith("identityHwm=")).mkString("\t")
      else l
    }.mkString("\n")
    assert(stripped != text, "the stamp must have been present")
    java.nio.file.Files.write(mf, stripped.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    Warehouse.invalidateCached(s"$dir#stage#")
    // interim mint on the target engages the rebase identity detector
    wh.append("t", Seq(30L).toDF("k"))
    val e = intercept[Warehouse.CommitConflict] {
      wh.publish("t", "stage", rebase = true)
    }
    assert(e.getMessage.contains("identityHwm stamp"),
      s"must refuse the un-stamped clone, got: ${e.getMessage}")
    // an exact-base publish of a stamped clone still works afterwards
    wh.dropTable("stage")
    wh.shallowClone("t", "stage")
    wh.publish("t", "stage")
    assert(wh.read("t").select($"rid").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))
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
    // WITH REBASE merges over an interim blind append
    spark.sql("CREATE TABLE wap_stage2 SHALLOW CLONE wap_t")
    spark.sql("INSERT INTO wap_stage2 VALUES (4, 'd', 4.0)")
    spark.sql("INSERT INTO wap_t VALUES (9, 'i', 9.0)")
    val v2 = spark.sql("PUBLISH TABLE wap_stage2 TO wap_t WITH REBASE")
      .head().getLong(0)
    assert(v2 === wh.versions("t").max)
    assert(spark.sql("SELECT id FROM wap_t ORDER BY id")
      .as[Long].collect().toSeq === Seq(2L, 3L, 4L, 9L))
  }
}

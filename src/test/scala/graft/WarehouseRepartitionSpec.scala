package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** ALTER TABLE ... SET PARTITIONED BY — partition layout migration as
  * ONE explicit rewrite commit (the Delta trade, deliberately not
  * Iceberg's per-file spec: see repartitionTable's scaladoc). Content
  * is invariant, the new layout prunes, the stamp rides commit
  * metadata (crash between commit and spec publish reconciles at
  * open). Readers cross the boundary by RE-ANCHORING: the migration
  * commit stamps the layout it replaced (`partitionByOld`), so
  * readVersion and the streaming source parse each era under its own
  * directory layout; restore and the batch change feeds still refuse
  * (a restore would rewire old-layout dirs under a new-layout spec).
  */
class WarehouseRepartitionSpec extends SparkSpec {

  import spark.implicits._

  private val spec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("id", LongType),
      StructField("grp", StringType),
      StructField("val", DoubleType))),
    statColumns = Seq("id"))

  private def fresh(s: Warehouse.TableSpec = spec): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-repart-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> s))
    wh.bootstrap()
    (wh, dir)
  }

  private def rows(ids: Seq[Long]) =
    ids.map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "val")

  test("flat → partitioned: content invariant, spec persisted, the new " +
    "layout dir-prunes (corrupted sibling partitions are never read), " +
    "and post-migration DML works") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1L to 300L))
    val before = wh.read("t").select("id", "grp", "val").as[(Long, String, Double)].collect().toSet
    val n = wh.repartitionTable("t", Seq("grp"))
    assert(n === 300L)
    assert(wh.read("t").select("id", "grp", "val").as[(Long, String, Double)].collect().toSet
      === before)
    // persisted + reopenable
    assert(Warehouse.open(spark, dir).tableSpec("t").partitionBy
      === Seq("grp"))
    // dir pruning: corrupt every g1/g2 file; a grp=g0 read still works
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val (_, entries) = wh.loadLatest("t")
    assert(entries.forall(_.rel.contains("grp=")))
    entries.filterNot(_.rel.contains("grp=g0")).foreach { e =>
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/t/${e.rel}"),
        true)
      out.write("not parquet".getBytes); out.close()
    }
    assert(wh.read("t").where($"grp" === "g0").count() === 100L)
    intercept[Exception] { wh.read("t").where($"grp" === "g1").count() }
    // migrating to the SAME layout is a no-op
    assert(wh.repartitionTable("t", Seq("grp")) === 0L)
  }

  test("partitioned → repartitioned → flat round-trip keeps content; " +
    "DML and appends work after each hop") {
    val (wh, _) = fresh(spec.copy(partitionBy = Seq("grp")))
    wh.append("t", rows(1L to 90L))
    val want = wh.read("t").select("id", "grp", "val").as[(Long, String, Double)].collect().toSet
    wh.repartitionTable("t", Seq("val")) // odd but legal
    assert(wh.read("t").select("id", "grp", "val").as[(Long, String, Double)].collect().toSet === want)
    wh.repartitionTable("t", Nil) // back to flat
    assert(wh.read("t").select("id", "grp", "val").as[(Long, String, Double)].collect().toSet === want)
    wh.append("t", rows(Seq(1000L)))
    assert(wh.delete("t", $"id" === 1000L) === 1L)
    assert(wh.read("t").select("id", "grp", "val").as[(Long, String, Double)].collect().toSet === want)
  }

  test("history across the migration boundary: readVersion RE-ANCHORS " +
    "under the old era's layout when files are retained (GC'd message " +
    "otherwise); feeds cross by era-splitting") {
    val (wh, _) = fresh()
    wh.append("t", rows(1L to 50L))
    val preV = wh.versions("t").max
    // tags no longer block migrations — a live tag would PIN the old
    // era's files across the rewrite (WarehouseTagSpec pins that);
    // this test wants the old era eager-GC'd, so release it first
    wh.createTag("t", "pin")
    wh.dropTag("t", "pin")
    wh.repartitionTable("t", Seq("grp"))
    val postV = wh.versions("t").max
    wh.append("t", rows(51L to 60L))
    // eager retention GC'd the old era's files: readVersion resolves
    // the OLD layout fine now ([[layoutAtVersion]]) and fails on the
    // missing FILES, with the retention story
    val rv = intercept[IllegalArgumentException] {
      wh.readVersion("t", preV)
    }
    assert(rv.getMessage.contains("retainReplaced"))
    // restore CAN cross now (it flips the layout back — see the
    // dedicated test), but not without the old era's FILES: eager
    // retention GC'd them, so it refuses with the retention story
    val rr = intercept[IllegalArgumentException] { wh.restore("t", preV) }
    assert(rr.getMessage.contains("retainReplaced"))
    // the per-commit attributed feed crosses too: the migration commit
    // itself attributes ZERO rows (content-identity rewrite)
    val attributed = wh.readChangeFeedVersioned("t", preV)
    assert(attributed.where($"_commit_version" === postV).count() === 0L)
    assert(attributed.agg(sum($"_change_delta")).head().getLong(0) === 10L)
    // the δ feed CROSSES the boundary by era-splitting: the stream was
    // caught up at preV (empty pre-migration era — no retention
    // needed), the rewrite nets ZERO, and only the post-migration
    // append folds
    assert(wh.changeFeedReadable("t", preV))
    assert(wh.readChangeFeed("t", preV)
      .agg(sum($"_change_delta")).head().getLong(0) === 10L)
    // post-migration history is fully functional
    assert(wh.readVersion("t", postV).count() === 50L)
    assert(wh.changeFeedReadable("t", postV))
    assert(wh.readChangeFeed("t", postV)
      .agg(sum($"_change_delta")).head().getLong(0) === 10L)
    wh.restore("t", postV)
    assert(wh.read("t").count() === 50L)

    // WITH retention, a pre-migration snapshot time-travels across the
    // boundary (same content, parsed under its own era's layout) and a
    // LAGGING feed folds pre-migration DML exactly
    val dir2 = Files.createTempDirectory("graft-repart-").toString
    val wh2 = new Warehouse(spark, dir2, retainReplaced = true,
      specs = Map("t" -> spec.copy(partitionBy = Seq("grp"))))
    wh2.bootstrap()
    wh2.append("t", rows(1L to 30L))
    val wm = wh2.versions("t").max // the lagging consumer's watermark
    wh2.append("t", rows(31L to 35L)) // pre-migration, unfolded
    val pre2 = wh2.versions("t").max
    wh2.repartitionTable("t", Nil) // partitioned → flat
    wh2.append("t", rows(36L to 40L))
    val old = wh2.readVersion("t", pre2)
    assert(old.count() === 35L)
    // the old era's partition VALUES parse from its k=v dirs
    assert(old.where($"grp" === "g1").count() > 0L)
    assert(wh2.read("t").count() === 40L)
    // the lagging feed: +5 old-era rows, ZERO from the 35-row rewrite,
    // +5 new-era rows — a δ-fold consumer lands on the batch state
    assert(wh2.changeFeedReadable("t", wm))
    val feed = wh2.readChangeFeed("t", wm)
    assert(feed.agg(sum($"_change_delta")).head().getLong(0) === 10L)
    assert(feed.agg(sum($"id" * $"_change_delta")).head().getLong(0) ===
      (31L to 40L).sum)
    // a lagging feed WITHOUT retention is honestly unreadable
    val (wh3, _) = fresh()
    wh3.append("t", rows(1L to 10L))
    val wm3 = wh3.versions("t").max
    wh3.append("t", rows(11L to 12L))
    wh3.repartitionTable("t", Seq("grp")) // eager GC drops the old era
    assert(!wh3.changeFeedReadable("t", wm3))
  }

  test("restore CROSSES a layout-migration boundary with retention: " +
    "the layout flips back, post-restore DML works, middle-era time " +
    "travel re-anchors, and change feeds across the restore sandwich " +
    "stay exact") {
    val dir = Files.createTempDirectory("graft-repres-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = true,
      specs = Map("t" -> spec))
    wh.bootstrap()
    wh.append("t", rows(1L to 30L))
    val wm = wh.versions("t").max // δ-fold consumer's watermark (v2)
    wh.append("t", rows(31L to 35L))
    val preV = wh.versions("t").max // v3: flat, ids 1..35
    wh.repartitionTable("t", Seq("grp")) // v4: flip to grp
    wh.append("t", rows(36L to 40L)) // v5: grp era
    val midV = wh.versions("t").max

    // (a live tag no longer blocks the cross-layout restore — it pins
    // its own era and re-anchors through the stamp; WarehouseTagSpec
    // exercises exactly that)
    wh.restore("t", preV) // v6: rollback ACROSS the migration
    // the layout flipped back, in memory and persisted
    assert(wh.tableSpec("t").partitionBy === Nil)
    assert(Warehouse.open(spark, dir).tableSpec("t").partitionBy === Nil)
    assert(wh.read("t").select("id").as[Long].collect().toSet ===
      (1L to 35L).toSet)
    val meta = wh.history("t").last._2
    assert(meta("op") === "restore" && meta("partitionByOld") === "grp")
    // post-restore DML lands under the restored (flat) layout
    wh.append("t", rows(41L to 42L)) // v7
    assert(wh.read("t").count() === 37L)
    // the middle (grp) era still time-travels, re-anchored through the
    // restore commit's partitionByOld stamp
    val mid = wh.readVersion("t", midV)
    assert(mid.count() === 40L)
    assert(mid.where($"grp" === "g1").count() > 0L)

    // δ change feed across the whole sandwich: migration nets zero,
    // the RESTORE hop emits its true diff (−grp-era content, +restored
    // content), and the fold lands exactly on the final state
    assert(wh.changeFeedReadable("t", wm))
    val feed = wh.readChangeFeed("t", wm)
    assert(feed.agg(sum($"_change_delta")).head().getLong(0) === 7L)
    assert(feed.agg(sum($"id" * $"_change_delta")).head().getLong(0) ===
      (31L to 35L).sum + 41L + 42L)
    // attributed feed: repartition attributes ZERO, the restore commit
    // attributes its full rollback diff (35 adds + 40 removes)
    val attributed = wh.readChangeFeedVersioned("t", wm)
    assert(attributed.where($"_commit_version" === (preV + 1)).count()
      === 0L)
    assert(attributed.where($"_commit_version" === (midV + 1)).count()
      === 75L)
    assert(attributed.agg(sum($"id" * $"_change_delta")).head().getLong(0)
      === (31L to 35L).sum + 41L + 42L)
  }

  test("crash between commit and spec publish: open() adopts the " +
    "committed stamp (the manifest is the truth)") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1L to 40L))
    wh.crashPoint = Some("after-commit")
    intercept[IllegalStateException] {
      wh.repartitionTable("t", Seq("grp"))
    }
    wh.crashPoint = None
    // the _meta JSON still says flat; the manifest stamp says grp —
    // a reopen reconciles to the stamp and reads correctly
    val wh2 = Warehouse.open(spark, dir)
    assert(wh2.tableSpec("t").partitionBy === Seq("grp"))
    assert(wh2.read("t").count() === 40L)
    assert(wh2.read("t").where($"grp" === "g1").count() > 0L)
    // and the reconcile re-published the spec
    val wh3 = Warehouse.open(spark, dir)
    assert(wh3.tableSpec("t").partitionBy === Seq("grp"))
  }

  test("SQL: ALTER TABLE SET PARTITIONED BY migrates and reports rows; " +
    "identity/bucket guards come from the spec constructor") {
    val dir = Files.createTempDirectory("graft-repart-").toString
    val wh = new Warehouse(spark, dir, specs = Map.empty)
    wh.bootstrap()
    graft.sql.WarehouseSql.register(spark, wh, "rp_")
    spark.sql("CREATE TABLE rp_t (id BIGINT, grp STRING, val DOUBLE)")
    rows(1L to 30L).createOrReplaceTempView("rp_src")
    spark.sql("INSERT INTO rp_t SELECT * FROM rp_src")
    assert(spark.sql("ALTER TABLE rp_t SET PARTITIONED BY (grp)")
      .head().getLong(0) === 30L)
    assert(wh.tableSpec("t").partitionBy === Seq("grp"))
    assert(spark.sql("SELECT count(*) FROM rp_t WHERE grp = 'g0'")
      .head().getLong(0) === 10L)
    // a bucket column cannot also partition (TableSpec's own require)
    val (whB, _) = {
      val d = Files.createTempDirectory("graft-repart-").toString
      val w = new Warehouse(spark, d, specs = Map("t" ->
        spec.copy(bucketBy = Seq("id"), numBuckets = 4)))
      w.bootstrap(); (w, d)
    }
    whB.append("t", rows(1L to 10L))
    intercept[IllegalArgumentException] {
      whB.repartitionTable("t", Seq("id"))
    }
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** Named immutable version TAGS (Iceberg's `CREATE TAG`): resolution
  * through readTag / `VERSION AS OF '<tag>'`, immutability, and the
  * load-bearing half — vacuum PINS tagged snapshots past any retention
  * window until the tag is dropped.
  */
class WarehouseTagSpec extends SparkSpec {

  import spark.implicits._

  private val spec = Warehouse.TableSpec(
    StructType(Seq(
      StructField("id", LongType),
      StructField("val", DoubleType))))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-tag-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    (wh, dir)
  }

  private def rows(ids: Range) = ids.map(i => (i.toLong, i * 1.0))
    .toDF("id", "val")

  test("createTag pins a version for readTag; tags are immutable; " +
    "dropTag releases; tags die with their table") {
    val (wh, dir) = fresh()
    wh.append("t", rows(1 to 10))
    val v1 = wh.createTag("t", "batch-1")
    wh.append("t", rows(11 to 20))
    wh.createTag("t", "batch-2")
    assert(wh.tags("t") === Map("batch-1" -> v1, "batch-2" -> (v1 + 1)))
    assert(wh.readTag("t", "batch-1").count() === 10L)
    assert(wh.readTag("t", "batch-2").count() === 20L)
    // immutable: re-pointing needs drop + create
    intercept[IllegalArgumentException] { wh.createTag("t", "batch-1") }
    // a numeric-looking tag could shadow VERSION AS OF n — rejected
    intercept[IllegalArgumentException] { wh.createTag("t", "123") }
    intercept[IllegalArgumentException] { wh.readTag("t", "nope") }
    wh.dropTag("t", "batch-1")
    assert(wh.tags("t").keySet === Set("batch-2"))
    // reopen sees persisted tags
    assert(Warehouse.open(spark, dir).tags("t") ===
      Map("batch-2" -> (v1 + 1)))
    wh.dropTable("t")
    val wh2 = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh2.bootstrap()
    assert(wh2.tags("t") === Map.empty)
  }

  test("vacuum pins tagged snapshots: files of a tagged version survive " +
    "any retention; dropping the tag releases them") {
    val (wh, _) = fresh()
    wh.append("t", rows(1 to 10))
    wh.createTag("t", "keep-me") // v2: the 10-row snapshot
    val tagged = wh.tags("t")("keep-me")
    // bury the tagged version under overwrites, far past retention
    (1 to 5).foreach(i => wh.overwrite("t", rows(100 * i to 100 * i + 3)))
    assert(wh.vacuum("t", keepManifests = 1) >= 0L)
    // the tagged snapshot reads in full after the vacuum
    assert(wh.readTag("t", "keep-me").as[(Long, Double)].collect()
      .map(_._1).toSet === (1L to 10L).toSet)
    assert(wh.readVersion("t", tagged).count() === 10L)
    // released: the same vacuum now collects the old snapshot's files
    wh.dropTag("t", "keep-me")
    assert(wh.vacuum("t", keepManifests = 1) > 0L)
    intercept[Exception] {
      wh.readVersion("t", tagged).collect()
    }
  }

  test("SQL surface: CREATE/DROP TAG, SHOW TAGS, VERSION AS OF 'tag', " +
    "RESTORE to a tag") {
    val dir = Files.createTempDirectory("graft-tag-").toString
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec))
    wh.bootstrap()
    wh.registerSql("tag_")
    spark.sql("INSERT INTO tag_t VALUES (1, 1.0), (2, 2.0)")
    val made = spark.sql("ALTER TABLE tag_t CREATE TAG rel-1").head()
    assert(made.getString(0) === "rel-1")
    spark.sql("INSERT INTO tag_t VALUES (3, 3.0)")
    spark.sql("ALTER TABLE tag_t CREATE TAG rel-2 AS OF VERSION " +
      made.getLong(1))
    val shown = spark.sql("SHOW TAGS tag_t")
      .as[(String, Long)].collect().toSeq
    assert(shown === Seq(("rel-1", made.getLong(1)),
      ("rel-2", made.getLong(1))))
    assert(spark.sql("SELECT count(*) FROM tag_t VERSION AS OF 'rel-1'")
      .head().getLong(0) === 2L)
    assert(spark.sql("SELECT count(*) FROM tag_t").head().getLong(0) === 3L)
    // RESTORE accepts a tag where it accepts a version
    spark.sql("RESTORE TABLE tag_t TO VERSION AS OF 'rel-1'")
    assert(spark.sql("SELECT count(*) FROM tag_t").head().getLong(0) === 2L)
    spark.sql("ALTER TABLE tag_t DROP TAG rel-2")
    assert(spark.sql("SHOW TAGS tag_t").count() === 1L)
  }

  test("tags SURVIVE layout migrations: readTag re-anchors to the " +
    "tag's own era's layout across SET PARTITIONED BY, and RESTORE to " +
    "the tagged version flips the layout back") {
    val dir = Files.createTempDirectory("graft-tagmig-").toString
    val spec2 = Warehouse.TableSpec(
      StructType(Seq(
        StructField("id", LongType),
        StructField("grp", StringType),
        StructField("val", DoubleType))))
    val wh = new Warehouse(spark, dir, specs = Map("t" -> spec2))
    wh.bootstrap()
    wh.registerSql("tmg_")
    val data = (1 to 12).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
    wh.append("t", data.toDF("id", "grp", "val"))
    wh.createTag("t", "flat-era")
    val taggedV = wh.tags("t")("flat-era")

    // the migration no longer requires dropping tags: the commit's
    // partitionByOld stamp resolves the tag's own era
    wh.repartitionTable("t", Seq("grp"))
    assert(wh.tableSpec("t").partitionBy === Seq("grp"))
    wh.append("t", Seq((100L, "g0", 100.0)).toDF("id", "grp", "val"))

    // readTag reads the PRE-migration snapshot under the flat layout
    // (partitioned reads surface partition columns last — select the
    // declared order explicitly)
    assert(wh.readTag("t", "flat-era").select("id", "grp", "val")
      .as[(Long, String, Double)].collect().toSet === data.toSet)
    // SQL surface agrees
    assert(spark.sql("SELECT count(*) FROM tmg_t VERSION AS OF 'flat-era'")
      .head().getLong(0) === 12L)
    // the tagged files survived the migration's rewrite (eager GC
    // pins tag-referenced rels)
    assert(wh.readVersion("t", taggedV).count() === 12L)

    // vacuum far past retention still pins the tagged (cross-era)
    // snapshot
    assert(wh.vacuum("t", keepManifests = 1) >= 0L)
    assert(wh.readTag("t", "flat-era").count() === 12L)

    // RESTORE to the tagged version crosses the boundary back: layout
    // flips to flat, content is the tag's
    wh.restore("t", taggedV)
    assert(wh.tableSpec("t").partitionBy === Seq.empty)
    assert(wh.read("t").select("id", "grp", "val")
      .as[(Long, String, Double)].collect().toSet === data.toSet)
    // the tag itself still reads after the restore
    assert(wh.readTag("t", "flat-era").count() === 12L)

    // a second migration direction: tag the PARTITIONED era, migrate
    // back to flat, and read the partitioned-era tag
    wh.repartitionTable("t", Seq("grp"))
    wh.createTag("t", "part-era")
    wh.repartitionTable("t", Seq.empty)
    assert(wh.readTag("t", "part-era").select("id", "grp", "val")
      .as[(Long, String, Double)].collect().toSet === data.toSet)
    assert(wh.readTag("t", "flat-era").count() === 12L)
  }

  test("SHOW FILES inventories the head manifest; REFRESH FINGERPRINT " +
    "maintains the content hash through SQL DML") {
    val dir = Files.createTempDirectory("graft-tag-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = true,
      specs = Map("t" -> spec.copy(statColumns = Seq("id"))))
    wh.bootstrap()
    wh.registerSql("tsf_")
    spark.sql("INSERT INTO tsf_t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val files = spark.sql("SHOW FILES tsf_t").collect()
    assert(files.nonEmpty)
    assert(files.map(r => r.getLong(r.fieldIndex("row_count"))).sum === 3L)
    assert(files.forall(_.getAs[String]("stats").startsWith("id=[")))
    val fp1 = spark.sql("REFRESH FINGERPRINT tsf_t").head()
    spark.sql("DELETE FROM tsf_t WHERE id = 2")
    val fp2 = spark.sql("REFRESH FINGERPRINT tsf_t").head()
    assert(fp1.getLong(0) !== fp2.getLong(0))
    assert(fp2.getLong(1) === wh.versions("t").max)
    // the incremental answer equals a direct recompute
    assert(fp2.getLong(0) === graft.ext.Fingerprint.dataset(
      wh.read("t"), Seq("id", "val")))
    // COLUMNS (...) scopes the hash (different column set, own store)
    val fpId = spark.sql("REFRESH FINGERPRINT tsf_t COLUMNS (id)").head()
    assert(fpId.getLong(0) === graft.ext.Fingerprint.dataset(
      wh.read("t"), Seq("id")))
  }
}

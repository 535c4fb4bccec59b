package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** Merge-on-read DELETE via DELETION VECTORS: sidecar semantics (no
  * file rewrite, immutable vectors, unions on repeat), read-path
  * application everywhere one manifest snapshot is read (head, time
  * travel, clones, change feeds), materialization by copy-on-write DML
  * and compaction, metadata-stat interaction, and lifecycle (vacuum of
  * superseded sidecars, the thin-delete guard).
  */
class WarehouseDvSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("val", DoubleType)))

  private def src(n: Int) =
    (1L to n.toLong).map(i => (i, s"g${i % 4}", i * 1.0))
      .toDF("id", "grp", "val")

  private def fresh(retain: Boolean = false): Warehouse = {
    val dir = Files.createTempDirectory("graft-dv-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = retain,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"))))
    wh.bootstrap()
    wh
  }

  test("vectored delete removes rows without rewriting a single file; " +
      "repeat deletes union; a no-match delete is a no-op") {
    val wh = fresh()
    wh.append("t", src(100))
    val filesBefore = wh.read("t").inputFiles.sorted.toSeq
    val n1 = wh.deleteVectored("t", col("id") % 10 === 0)
    assert(n1 === 10L)
    assert(wh.read("t").count() === 90L)
    assert(wh.read("t").where(col("id") % 10 === 0).count() === 0L)
    // the data files are untouched — same rels, a dv ref appeared
    val meta = wh.history("t").last._2
    assert(meta("op") === "delete" && meta("mode") === "merge-on-read")
    assert(!meta.contains("numFilesRewritten"))
    assert(wh.read("t").inputFiles.sorted.toSeq === filesBefore,
      "merge-on-read delete must not rewrite or add data files")
    // second delete overlaps the first: only NEW rows count, vectors
    // union (id%5==0 ⊃ id%10==0)
    val n2 = wh.deleteVectored("t", col("id") % 5 === 0)
    assert(n2 === 10L)
    assert(wh.read("t").count() === 80L)
    assert(wh.read("t").where(col("id") % 5 === 0).count() === 0L)
    // aggregate over the filtered scan
    assert(wh.read("t").agg(sum("id")).head().getLong(0) ===
      (1L to 100L).filter(_ % 5 != 0).sum)
    assert(wh.deleteVectored("t", col("id") > 1000) === 0L)
    assert(wh.read("t").count() === 80L)
  }

  test("time travel reads each version's own vectors; the change feed " +
      "emits exactly the vectored rows as retractions") {
    val wh = fresh()
    wh.append("t", src(60)) // v2
    wh.deleteVectored("t", col("id") <= 10) // v3
    wh.deleteVectored("t", col("id") > 50) // v4
    assert(wh.readVersion("t", 2L).count() === 60L)
    assert(wh.readVersion("t", 3L).count() === 50L)
    assert(wh.readVersion("t", 3L).where(col("id") <= 10).count() === 0L)
    assert(wh.read("t").count() === 40L)
    // feed since v2: -1 rows for ids 1-10 and 51-60, nothing else
    val feed = wh.readChangeFeed("t", 2L)
    val retr = feed.where(col("_change_delta") === -1)
      .select("id").as[Long].collect().sorted
    assert(retr.toSeq === ((1L to 10L) ++ (51L to 60L)))
    assert(feed.where(col("_change_delta") === 1).count() === 0L)
    // delta-weighted fold since v1 (bootstrap) equals the final state
    val fold = wh.readChangeFeed("t", 1L)
      .agg(sum(col("_change_delta")).as("n"),
        sum(col("val") * col("_change_delta")).as("tot")).head()
    assert(fold.getLong(0) === 40L)
    assert(fold.getDouble(1) === (11L to 50L).map(_.toDouble).sum)
  }

  test("copy-on-write UPDATE and compaction MATERIALIZE vectors: " +
      "rewritten entries carry none and results are unchanged") {
    val wh = fresh()
    wh.append("t", src(100))
    wh.deleteVectored("t", col("id") % 4 === 0)
    assert(wh.read("t").count() === 75L)
    // update rows in the same files the vector covers: the rewrite
    // reads THROUGH the vector (deleted rows stay gone) and the fresh
    // files need no vector
    wh.update("t", col("id") % 4 === 1, Map("val" -> (col("val") + 0.5)))
    assert(wh.read("t").count() === 75L)
    assert(wh.read("t").where(col("id") % 4 === 0).count() === 0L)
    assert(wh.read("t").where(col("id") === 5).head().getDouble(2) === 5.5)
    val afterUpdate = wh.metaRowCount("t")
    assert(afterUpdate === Some(75L), "materialized counts stay exact")
    // a further vectored delete, then compact: vectors purge
    wh.deleteVectored("t", col("id") === 3)
    assert(wh.read("t").count() === 74L)
    wh.compact("t", targetBytes = 64L * 1024 * 1024)
    assert(wh.read("t").count() === 74L)
    assert(wh.metaRowCount("t") === Some(74L))
    assert(wh.metaMinMax("t", "id").isDefined,
      "compaction rewrote the vectored files - stats are exact again")
  }

  test("metadata answers: counts subtract vectors, min/max declines " +
      "while a vector could have removed the extremum") {
    val wh = fresh()
    wh.append("t", src(50))
    assert(wh.metaRowCount("t") === Some(50L))
    assert(wh.metaMinMax("t", "id") === Some((1L, 50L)))
    wh.deleteVectored("t", col("id") > 45)
    assert(wh.metaRowCount("t") === Some(45L))
    assert(wh.metaMinMax("t", "id") === None,
      "the vector deleted the max - the footer fold must decline")
    assert(wh.read("t").agg(max("id")).head().getLong(0) === 45L)
  }

  test("shallow clone borrows vectors; vacuum keeps borrowed and live " +
      "sidecars and collects superseded ones") {
    val wh = fresh()
    wh.append("t", src(40))
    wh.deleteVectored("t", col("id") <= 5) // sidecar A
    wh.shallowClone("t", "fork")
    assert(wh.read("fork").count() === 35L)
    // source keeps deleting: sidecar B supersedes A for the SOURCE, but
    // the clone still references A (borrowed, absolute)
    wh.deleteVectored("t", col("id") <= 10)
    assert(wh.read("t").count() === 30L)
    assert(wh.read("fork").count() === 35L, "clone pinned at borrow time")
    wh.vacuum("t", keepManifests = 1)
    assert(wh.read("t").count() === 30L)
    assert(wh.read("fork").count() === 35L,
      "vacuum must treat clone-borrowed sidecars as live")
    // superseded, unborrowed sidecars are collected once retention and
    // borrowers release them: drop the clone, vacuum again
    wh.dropTable("fork")
    wh.vacuum("t", keepManifests = 1)
    assert(wh.read("t").count() === 30L)
    val dvDir = new java.io.File(
      wh.read("t").inputFiles.head.stripPrefix("file:")
        .replaceAll("/t/[^/]*$", "/t/_dv"))
    assert(dvDir.listFiles().count(f =>
      !f.getName.startsWith(".") && f.getName.endsWith(".dv")) === 1,
      "only the live sidecar survives the vacuum")
  }

  test("vectored UPDATE: old versions vector out, new versions append, " +
      "one commit; the change feed folds it exactly; checks veto " +
      "before any sidecar lands") {
    val wh = fresh(retain = true)
    wh.append("t", src(60)) // v2
    val oldFiles = wh.read("t").inputFiles.toSet
    val n = wh.updateVectored("t", col("id") % 6 === 0,
      Map("val" -> (col("val") + 1000.0)))
    assert(n === 10L)
    assert(wh.read("t").count() === 60L, "an update changes no row count")
    assert(wh.read("t").where(col("val") > 1000).count() === 10L)
    assert(wh.read("t").where(col("id") === 6).head().getDouble(2) === 1006.0)
    assert(wh.read("t").where(col("id") === 7).head().getDouble(2) === 7.0)
    // old files untouched (vectored), the new versions landed as fresh
    // files alongside
    assert(oldFiles.subsetOf(wh.read("t").inputFiles.toSet))
    val meta = wh.history("t").last._2
    assert(meta("op") === "update" && meta("mode") === "merge-on-read")
    // double-update of the same slice: vectors union into the FRESH
    // files' rows too? No - fresh files carry the current versions; the
    // second update vectors those and appends again
    val n2 = wh.updateVectored("t", col("id") === 6,
      Map("val" -> (col("val") - 6.0)))
    assert(n2 === 1L)
    assert(wh.read("t").where(col("id") === 6).head().getDouble(2) === 1000.0)
    assert(wh.read("t").count() === 60L)
    // delta-weighted fold since bootstrap equals the final state
    val fold = wh.readChangeFeed("t", 1L)
      .agg(sum(col("_change_delta")).as("n"),
        round(sum(col("val") * col("_change_delta")), 2).as("tot")).head()
    assert(fold.getLong(0) === 60L)
    val expect = (1L to 60L).map { i =>
      if (i == 6L) 1000.0
      else if (i % 6 == 0) i + 1000.0
      else i.toDouble
    }.sum
    assert(fold.getDouble(1) === expect)
    // CHECK constraints veto the whole statement before sidecars land
    wh.addCheck("t", "val_cap", "val <= 2000")
    val e = intercept[Warehouse.CheckViolation] {
      wh.updateVectored("t", col("id") === 12,
        Map("val" -> (col("val") + 5000.0)))
    }
    assert(wh.read("t").where(col("id") === 12).head().getDouble(2)
      === 1012.0, "vetoed update changed nothing")
  }

  test("SQL surface: mode confs route DELETE/UPDATE to vectors, REORG " +
      "APPLY (PURGE) drops them, DESCRIBE DETAIL reports the state") {
    val dir = Files.createTempDirectory("graft-dv-sql-").toString
    val wh = new Warehouse(spark, dir,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"))))
    wh.bootstrap()
    wh.registerSql("sdv_")
    src(50).createOrReplaceTempView("sdv_src")
    spark.sql("INSERT INTO sdv_t SELECT * FROM sdv_src")
    val files = wh.read("t").inputFiles.toSet
    spark.conf.set("spark.graft.delete.mode", "dv")
    spark.conf.set("spark.graft.update.mode", "dv")
    try {
      assert(spark.sql("DELETE FROM sdv_t WHERE id % 5 = 0")
        .head().getLong(0) === 10L)
      assert(spark.sql("UPDATE sdv_t SET val = val + 7 WHERE id = 1")
        .head().getLong(0) === 1L)
    } finally {
      spark.conf.unset("spark.graft.delete.mode")
      spark.conf.unset("spark.graft.update.mode")
    }
    assert(files.subsetOf(wh.read("t").inputFiles.toSet),
      "dv-mode statements must not rewrite the original files")
    assert(spark.sql("SELECT count(*) FROM sdv_t").head().getLong(0) === 40L)
    assert(spark.sql("SELECT val FROM sdv_t WHERE id = 1")
      .head().getDouble(0) === 8.0)
    val d = spark.sql("DESCRIBE DETAIL sdv_t").head()
    assert(d.getAs[Long]("deletion_vectors") > 0L && d.getAs[Long]("deleted_rows") === 11L,
      "deletion_vectors / deleted_rows surface the merge-on-read state")
    // REORG purges: vectored files rewritten, state zeroed, results same
    val r = spark.sql("REORG TABLE sdv_t APPLY (PURGE)").head()
    assert(r.getLong(1) === 11L)
    val d2 = spark.sql("DESCRIBE DETAIL sdv_t").head()
    assert(d2.getAs[Long]("deletion_vectors") === 0L && d2.getAs[Long]("deleted_rows") === 0L)
    assert(spark.sql("SELECT count(*) FROM sdv_t").head().getLong(0) === 40L)
    assert(wh.metaMinMax("t", "id").isDefined,
      "purged footers make metadata extrema exact again")
    // defaults unchanged: DELETE without the conf rewrites (cow)
    assert(spark.sql("DELETE FROM sdv_t WHERE id = 2").head().getLong(0) === 1L)
    assert(wh.history("t").last._2.get("mode") !== Some("merge-on-read"))
  }

  test("the thin-delete guard refuses wide deletes and names the " +
      "copy-on-write path") {
    val wh = fresh()
    wh.append("t", src(100))
    val e = intercept[IllegalArgumentException] {
      wh.deleteVectored("t", col("id") > 0, maxRows = 50L)
    }
    assert(e.getMessage.contains("use delete()"))
    assert(wh.read("t").count() === 100L, "failed delete changed nothing")
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** COLUMN MAPPING ([[Warehouse.renameColumn]]/[[Warehouse.dropColumn]]
  * + the routed ALTER TABLE statements): rename and drop are pure
  * metadata — no data file is rewritten — yet reads, writes, DML,
  * time travel and the spec round-trip all speak the LOGICAL names;
  * a re-added column after a drop can never resurface stale values.
  */
class WarehouseColumnMapSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("val", DoubleType)))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-cmwh-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = false,
      specs = Map("t" -> Warehouse.TableSpec(schema,
        statColumns = Seq("id"))))
    wh.bootstrap()
    (wh, dir)
  }

  private def rows(from: Int, until: Int): DataFrame =
    (from until until).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "val")

  test("rename: old files read under the new name; new writes round-trip") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0, 50))
    val filesBefore = graft.util.FsListing
      .dataFiles(s"$dir/t").map(_._1).toSet
    wh.renameColumn("t", "val", "score")
    // pure metadata: not a single data file changed
    assert(graft.util.FsListing.dataFiles(s"$dir/t").map(_._1).toSet
      === filesBefore)
    assert(wh.read("t").columns.toSeq === Seq("id", "grp", "score"))
    assert(wh.read("t").agg(sum("score")).head().getDouble(0) === 1225.0)
    // new appends speak the logical name; old+new files mix in one scan
    wh.append("t", rows(50, 100)
      .withColumnRenamed("val", "score"))
    assert(wh.read("t").agg(sum("score")).head().getDouble(0) === 4950.0)
    // filter on the logical name still prunes into both generations
    assert(wh.read("t").where(col("score") < 10.0).count() === 10L)
  }

  test("rename survives reopen; DML speaks logical names") {
    val (wh, dir) = fresh()
    wh.append("t", rows(0, 40))
    wh.renameColumn("t", "val", "score")
    val re = Warehouse.open(spark, dir)
    assert(re.read("t").columns.toSeq === Seq("id", "grp", "score"))
    assert(re.update("t", col("score") === 5.0,
      Map("score" -> lit(500.0))) === 1L)
    assert(re.delete("t", col("score") > 400.0) === 1L)
    assert(re.read("t").count() === 39L)
    // vectored (merge-on-read) delete against the mapped scan
    assert(re.deleteVectored("t", col("score") < 3.0) === 3L)
    assert(re.read("t").count() === 36L)
  }

  test("drop is metadata-only; a re-added name never resurfaces values") {
    val (wh, _) = fresh()
    wh.append("t", rows(0, 30))
    wh.dropColumn("t", "val")
    assert(wh.read("t").columns.toSeq === Seq("id", "grp"))
    // re-add the same logical name: must come back all-NULL, not with
    // the retired column's values
    wh.addColumn("t", StructField("val", DoubleType))
    assert(wh.read("t").where(col("val").isNotNull).count() === 0L)
    wh.append("t", rows(100, 110))
    assert(wh.read("t").where(col("val").isNotNull).count() === 10L)
    assert(wh.read("t").agg(sum("val")).head().getDouble(0) === 1045.0)
  }

  test("restricted columns refuse; checks block until dropped") {
    val (wh, _) = fresh()
    intercept[IllegalArgumentException] {
      wh.renameColumn("t", "id", "key") // stat column
    }
    wh.addCheck("t", "pos", "val >= 0")
    intercept[IllegalArgumentException] { wh.dropColumn("t", "val") }
    wh.dropCheck("t", "pos")
    wh.dropColumn("t", "val") // now allowed
    assert(wh.read("t").columns.toSeq === Seq("id", "grp"))
  }

  test("SQL: ALTER TABLE RENAME/DROP COLUMN route; SELECT follows") {
    val (wh, _) = fresh()
    wh.registerSql("cmap_")
    wh.append("t", rows(0, 20))
    spark.sql("ALTER TABLE cmap_t RENAME COLUMN val TO score")
    assert(spark.sql("SELECT sum(score) FROM cmap_t").head().getDouble(0)
      === 190.0)
    spark.sql("ALTER TABLE cmap_t DROP COLUMN grp")
    assert(spark.sql("SELECT * FROM cmap_t").columns.toSeq
      === Seq("id", "score"))
  }

  test("shallow clone of a mapping-active table reads logical names") {
    val (wh, _) = fresh()
    wh.append("t", rows(0, 25))
    wh.renameColumn("t", "val", "score")
    wh.shallowClone("t", "t2")
    assert(wh.read("t2").columns.toSeq === Seq("id", "grp", "score"))
    assert(wh.read("t2").agg(sum("score")).head().getDouble(0) === 300.0)
    // divergence: the clone renames independently of the source
    wh.renameColumn("t2", "score", "points")
    assert(wh.read("t2").columns.toSeq === Seq("id", "grp", "points"))
    assert(wh.read("t").columns.toSeq === Seq("id", "grp", "score"))
  }

  test("time travel reads a pre-rename version under CURRENT names") {
    // Delta column-mapping semantics: the schema is table metadata, not
    // per-version — time travel rewinds DATA, names stay current
    val (wh, _) = fresh()
    wh.append("t", rows(0, 10)) // v2
    wh.renameColumn("t", "val", "score")
    wh.append("t", rows(10, 20).withColumnRenamed("val", "score")) // v3
    assert(wh.readVersion("t", 2).columns.toSeq === Seq("id", "grp", "score"))
    assert(wh.readVersion("t", 2).count() === 10L)
  }
}

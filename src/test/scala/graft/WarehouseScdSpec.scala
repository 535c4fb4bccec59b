package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** SCD TYPE-2 merge ([[Warehouse.scdMerge]]): versioned dimension
  * maintenance in one commit — changed keys close their old version and
  * insert a new current one, unchanged keys are no-ops, new keys
  * insert; history rows are frozen forever and compose with time
  * travel.
  */
class WarehouseScdSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("city", StringType),
    StructField("tier", StringType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType),
    StructField("is_current", BooleanType)))

  private def fresh(): Warehouse = {
    val dir = Files.createTempDirectory("graft-scd-").toString
    val wh = new Warehouse(spark, dir, retainReplaced = true,
      specs = Map("dim" -> Warehouse.TableSpec(schema)))
    wh.bootstrap()
    wh
  }

  private def ts(s: String) = lit(s).cast(TimestampType)

  private def wave(rows: (Long, String, String)*): DataFrame =
    rows.toDF("id", "city", "tier")

  test("initial load inserts; changes close+insert; no-ops stay put") {
    val wh = fresh()
    val (c1, i1) = wh.scdMerge("dim",
      wave((1L, "berlin", "gold"), (2L, "paris", "silver"),
        (3L, "tokyo", "gold")),
      Seq("id"), ts("2024-01-01 00:00:00"))
    assert(c1 === 0L && i1 === 3L)
    val vAfterLoad = wh.versions("dim").max

    // wave 2: id 1 changes tier, id 2 unchanged, id 4 new
    val (c2, i2) = wh.scdMerge("dim",
      wave((1L, "berlin", "platinum"), (2L, "paris", "silver"),
        (4L, "lima", "bronze")),
      Seq("id"), ts("2024-02-01 00:00:00"))
    assert(c2 === 1L && i2 === 2L)

    val cur = wh.read("dim").where(col("is_current"))
      .select(col("id"), col("tier")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur === Map(1L -> "platinum", 2L -> "silver", 3L -> "gold",
      4L -> "bronze"))
    // the closed version is frozen with its close timestamp
    val closed = wh.read("dim")
      .where(!col("is_current") && col("id") === 1L).collect()
    assert(closed.length === 1)
    assert(closed.head.getAs[java.sql.Timestamp]("valid_to").toString
      .startsWith("2024-02-01"))
    assert(wh.read("dim").count() === 5L) // 4 current + 1 history

    // identical re-merge: nothing closes, nothing inserts, no commit
    val vBefore = wh.versions("dim").max
    assert(wh.scdMerge("dim",
      wave((1L, "berlin", "platinum"), (2L, "paris", "silver")),
      Seq("id"), ts("2024-03-01 00:00:00")) === ((0L, 0L)))
    assert(wh.versions("dim").max === vBefore)

    // time travel: the pre-change snapshot still answers with the OLD
    // current version of id 1
    val old = wh.readVersion("dim", vAfterLoad)
      .where(col("id") === 1L && col("is_current")).collect()
    assert(old.length === 1 && old.head.getAs[String]("tier") === "gold")
  }

  test("null-safe attribute compare: null -> value and value -> null") {
    val wh = fresh()
    wh.scdMerge("dim", wave((1L, null, "gold"), (2L, "rome", null)),
      Seq("id"), ts("2024-01-01 00:00:00"))
    // null == null is a no-op, null -> value closes and re-inserts
    val (c, i) = wh.scdMerge("dim",
      wave((1L, "oslo", "gold"), (2L, "rome", null)),
      Seq("id"), ts("2024-02-01 00:00:00"))
    assert(c === 1L && i === 1L)
    assert(wh.read("dim").where(col("is_current")).count() === 2L)
    assert(wh.read("dim").count() === 3L)
  }

  test("a re-activated key (all versions closed) inserts a fresh current") {
    val wh = fresh()
    wh.scdMerge("dim", wave((7L, "cairo", "gold")),
      Seq("id"), ts("2024-01-01 00:00:00"))
    // close it manually (the delete-a-dimension-member shape)
    wh.update("dim", col("id") === 7L && col("is_current"),
      Map("is_current" -> lit(false),
        "valid_to" -> ts("2024-01-15 00:00:00")))
    val (c, i) = wh.scdMerge("dim", wave((7L, "cairo", "gold")),
      Seq("id"), ts("2024-02-01 00:00:00"))
    assert(c === 0L && i === 1L)
    assert(wh.read("dim").where(col("is_current")).count() === 1L)
  }
}

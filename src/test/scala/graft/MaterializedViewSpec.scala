package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.pipeline.{MaterializedView, Warehouse}

/** Incremental view maintenance == recompute, across the full DML mix.
  * Values are dyadic rationals (id * 0.5) so delta-folded double sums
  * are float-EXACT and the equality below is exact, not approximate.
  */
class MaterializedViewSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("val", DoubleType)))

  private def freshWh(): Warehouse = {
    val dir = graft.util.Scratch.dir("graft-mv-").toString
    val wh = new Warehouse(spark, s"$dir/wh", retainReplaced = true,
      specs = Map("t" -> Warehouse.TableSpec(schema)))
    wh.bootstrap()
    wh
  }

  private def src(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"g${i % 5}", i * 0.5)).toDF("id", "grp", "val")

  private def state(df: org.apache.spark.sql.DataFrame) =
    df.select($"grp", $"n_rows", $"total")
      .as[(String, Long, Double)].collect().toSet

  test("delta fold over append+update+delete+compact equals recompute") {
    val wh = freshWh()
    wh.append("t", src(0, 200))
    val snapVersion = wh.versions("t").max
    val state0 = MaterializedView.initAgg(wh.read("t"), Seq("grp"), "val")
      .localCheckpoint() // freeze: later DML must not leak into the base
    wh.append("t", src(200, 300))
    wh.update("t", col("grp") === "g3", Map("val" -> (col("val") + 8.0)))
    wh.delete("t", col("id") % 7 === 0)
    wh.compact("t")
    val folded = MaterializedView.foldAgg(state0,
      wh.readChangeFeed("t", snapVersion), Seq("grp"), "val")
    val recomputed = MaterializedView.initAgg(wh.read("t"), Seq("grp"), "val")
    assert(state(folded) === state(recomputed))
    assert(state(folded).nonEmpty)
  }

  test("a fully-deleted group leaves the maintained state") {
    val wh = freshWh()
    wh.append("t", src(0, 50))
    val v = wh.versions("t").max
    val state0 = MaterializedView.initAgg(wh.read("t"), Seq("grp"), "val")
      .localCheckpoint()
    wh.delete("t", col("grp") === "g2")
    val folded = MaterializedView.foldAgg(state0,
      wh.readChangeFeed("t", v), Seq("grp"), "val")
    assert(!state(folded).exists(_._1 == "g2"))
    assert(state(folded) ===
      state(MaterializedView.initAgg(wh.read("t"), Seq("grp"), "val")))
  }

  test("compaction-only changes net to a no-op fold") {
    val wh = freshWh()
    wh.append("t", src(0, 40))
    wh.append("t", src(40, 80))
    val v = wh.versions("t").max
    val state0 = MaterializedView.initAgg(wh.read("t"), Seq("grp"), "val")
      .localCheckpoint()
    wh.compact("t")
    val folded = MaterializedView.foldAgg(state0,
      wh.readChangeFeed("t", v), Seq("grp"), "val")
    assert(state(folded) === state(state0))
  }

  // ---- persisted-view lifecycle (ViewDef / refresh / read) ----

  private def vdFull = MaterializedView.ViewDef("t", "mv", Seq("grp"),
    Seq(MaterializedView.Count("n"), MaterializedView.Sum("val", "total"),
      MaterializedView.Avg("val", "mean"), MaterializedView.Min("val", "lo"),
      MaterializedView.Max("val", "hi")), nParts = 4)

  private def recompute(wh: Warehouse) =
    wh.read("t").groupBy("grp").agg(
      count(lit(1)).as("n"), sum("val").as("total"), avg("val").as("mean"),
      min("val").as("lo"), max("val").as("hi"))

  private def viewSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"grp", $"n", $"total", $"mean", $"lo", $"hi")
      .as[(String, Long, Double, Double, Double, Double)].collect().toSet

  test("persisted view: refresh after every DML equals recompute") {
    val wh = freshWh()
    wh.append("t", src(0, 120))
    MaterializedView.refresh(wh, vdFull) // full build
    assert(viewSet(MaterializedView.read(wh, vdFull)) ===
      viewSet(recompute(wh)))
    wh.append("t", src(120, 200))
    MaterializedView.refresh(wh, vdFull) // pure-insert delta path
    assert(viewSet(MaterializedView.read(wh, vdFull)) ===
      viewSet(recompute(wh)))
    wh.update("t", col("grp") === "g1", Map("val" -> (col("val") - 4.5)))
    MaterializedView.refresh(wh, vdFull) // retraction → min/max rebuild
    assert(viewSet(MaterializedView.read(wh, vdFull)) ===
      viewSet(recompute(wh)))
    wh.delete("t", col("id") % 7 === 0)
    wh.compact("t")
    MaterializedView.refresh(wh, vdFull)
    assert(viewSet(MaterializedView.read(wh, vdFull)) ===
      viewSet(recompute(wh)))
  }

  test("persisted view: refresh with no new commits is a watermark no-op") {
    val wh = freshWh()
    wh.append("t", src(0, 60))
    MaterializedView.refresh(wh, vdFull)
    val v = wh.versions("mv").max
    MaterializedView.refresh(wh, vdFull)
    assert(wh.versions("mv").max === v)
  }

  test("persisted view: sum-only view delta-folds through retraction " +
      "without rebuild, and a zeroed group tombstones away") {
    val wh = freshWh()
    val vd = MaterializedView.ViewDef("t", "mvs", Seq("grp"),
      Seq(MaterializedView.Count("n"), MaterializedView.Sum("val", "total")),
      nParts = 4)
    wh.append("t", src(0, 100))
    MaterializedView.refresh(wh, vd)
    val builtFiles = wh.versions("mvs").max
    wh.delete("t", col("grp") === "g2")
    MaterializedView.refresh(wh, vd) // δ-feed fold, no rebuild
    // rebuild would be an overwrite commit; the delta path merges
    val ops = wh.history("mvs").filter(_._1 > builtFiles).map(_._2("op"))
    assert(ops === Seq("merge"))
    val got = MaterializedView.read(wh, vd)
      .select($"grp", $"n", $"total")
      .as[(String, Long, Double)].collect().toSet
    assert(!got.exists(_._1 == "g2"))
    val want = wh.read("t").groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("val").as("total"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
    // tombstone row exists in raw state until compactView reclaims it
    assert(wh.read("mvs").where($"s_rows" <= 0).count() === 1)
    assert(MaterializedView.compactView(wh, vd) === 1L)
    assert(wh.read("mvs").where($"s_rows" <= 0).count() === 0)
  }

  test("persisted view: sum of an all-null group reads as null") {
    val wh = freshWh()
    val vd = MaterializedView.ViewDef("t", "mvn", Seq("grp"),
      Seq(MaterializedView.Count("n"), MaterializedView.Sum("val", "total"),
        MaterializedView.Avg("val", "mean")), nParts = 2)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "gx", null), Row(2L, "gx", null), Row(3L, "gy", 2.0))),
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("grp", StringType), StructField("val", DoubleType))))
    wh.append("t", rows)
    MaterializedView.refresh(wh, vd)
    val out = MaterializedView.read(wh, vd).orderBy("grp").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("gx", "gy"))
    assert(out(0).getLong(1) === 2L && out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(out(1).getLong(1) === 1L && out(1).getDouble(2) === 2.0)
  }
}

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
}

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

  test("persisted view: min/max retraction repair rescans only dirty " +
      "groups' files (no full rebuild), and a clean retraction " +
      "rescans nothing") {
    val dir = graft.util.Scratch.dir("graft-mvr-").toString
    val s2 = StructType(Seq(
      StructField("gid", LongType, nullable = false),
      StructField("val", DoubleType)))
    val wh = new Warehouse(spark, s"$dir/wh", retainReplaced = true,
      specs = Map("t2" -> Warehouse.TableSpec(s2,
        statColumns = Seq("gid"))))
    wh.bootstrap()
    // three files with disjoint gid ranges; per gid, vals gid*10+j
    def batch(gidLo: Long) = (gidLo until gidLo + 10)
      .flatMap(g => (0 until 4).map(j => (g, g * 10.0 + j)))
      .toDF("gid", "val").coalesce(1)
    wh.append("t2", batch(0))
    wh.append("t2", batch(100))
    wh.append("t2", batch(200))
    val vd = MaterializedView.ViewDef("t2", "mv2", Seq("gid"),
      Seq(MaterializedView.Count("n"), MaterializedView.Min("val", "lo"),
        MaterializedView.Max("val", "hi")), nParts = 4)
    MaterializedView.refresh(wh, vd) // full build
    def recompute2() = wh.read("t2").groupBy("gid").agg(
      count(lit(1)).as("n"), min("val").as("lo"), max("val").as("hi"))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"gid", $"n", $"lo", $"hi")
        .as[(Long, Long, Double, Double)].collect().toSet

    // listener: per-scan numFiles for scans over the SOURCE table dir
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
    }.flatten
    val srcScanFiles =
      java.util.Collections.synchronizedList(
        new java.util.ArrayList[Long]())
    val sawMarker = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        if (qe.analyzed.output.exists(_.name == "__drain_marker2"))
          sawMarker.set(true)
        else scansOf(qe.executedPlan)
          .filter(_.relation.location.rootPaths
            .exists(_.toString.contains("/t2")))
          .foreach(s => srcScanFiles.add(s.metrics("numFiles").value))
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }

    // DIRTY retraction: delete gid 5's min row (val 50.0)
    wh.delete("t2", col("gid") === 5 && col("val") === 50.0)
    spark.listenerManager.register(listener)
    try {
      MaterializedView.refresh(wh, vd)
      spark.range(0, 1).toDF("__drain_marker2").collect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!sawMarker.get() && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(sawMarker.get(), "listener bus did not drain in 30s")
    } finally spark.listenerManager.unregister(listener)
    assert(asSet(MaterializedView.read(wh, vd)) === asSet(recompute2()))
    assert(MaterializedView.read(wh, vd).where($"gid" === 5)
      .select($"lo").as[Double].head() === 51.0)
    // no full rebuild: latest view commit is a merge, not an overwrite
    assert(wh.history("mv2").last._2("op") === "merge")
    // strict file subset: the table has 3 live files; no refresh scan
    // read all of them, and the dirty-group rescan (IN (5) under
    // manifest gid stats) read exactly 1
    val reads = {
      val it = srcScanFiles.iterator(); val b = Seq.newBuilder[Long]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(reads.nonEmpty, "no source scans observed")
    assert(reads.max < 3,
      s"a refresh scan read the whole table: numFiles=$reads")
    assert(reads.contains(1L),
      s"dirty-group rescan did not skip files: numFiles=$reads")

    // CLEAN retraction: delete a NON-extremum row (gid 7, val 71.0 —
    // min 70, max 73 untouched) → δ-fold only, merge commit, correct
    wh.delete("t2", col("gid") === 7 && col("val") === 71.0)
    MaterializedView.refresh(wh, vd)
    assert(asSet(MaterializedView.read(wh, vd)) === asSet(recompute2()))
    assert(wh.history("mv2").last._2("op") === "merge")

    // group wipe-out: delete ALL of gid 9 → tombstone, read hides it
    wh.delete("t2", col("gid") === 9)
    MaterializedView.refresh(wh, vd)
    assert(asSet(MaterializedView.read(wh, vd)) === asSet(recompute2()))
    assert(!asSet(MaterializedView.read(wh, vd)).exists(_._1 == 9L))
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

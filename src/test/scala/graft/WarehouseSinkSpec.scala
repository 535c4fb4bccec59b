package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.StreamExecution
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.pipeline.Warehouse

/** The native graft-warehouse STREAMING SINK and its exactly-once txn
  * fence: replayed epochs are no-ops (the crash-between-sink-commit-
  * and-checkpoint case), watermarks survive interleaved batch commits
  * (carry-forward), and a checkpointed restart appends only new data.
  */
class WarehouseSinkSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("val", DoubleType)))

  private def fresh(): (Warehouse, String) = {
    val dir = Files.createTempDirectory("graft-sink-").toString
    val wh = new Warehouse(spark, s"$dir/wh",
      specs = Map("t" -> Warehouse.TableSpec(schema, statColumns = Seq("id"))))
    wh.bootstrap()
    (wh, s"$dir/wh")
  }

  private def rows(ids: Range) = ids.map(i => (i.toLong, i * 1.0)).toDF("id", "val")

  test("append txn fence: replayed and stale epochs are no-ops") {
    val (wh, _) = fresh()
    wh.append("t", rows(1 to 10), txn = Some(("q1", 0L)))
    assert(wh.read("t").count() === 10L)
    // exact replay (the restart-after-sink-commit case)
    wh.append("t", rows(1 to 10), txn = Some(("q1", 0L)))
    assert(wh.read("t").count() === 10L)
    // stale epoch from a lagging writer instance
    wh.append("t", rows(1 to 5), txn = Some(("q1", -1L)))
    assert(wh.read("t").count() === 10L)
    // next epoch commits; a different query's epoch 0 also commits
    wh.append("t", rows(11 to 15), txn = Some(("q1", 1L)))
    wh.append("t", rows(16 to 18), txn = Some(("q2", 0L)))
    assert(wh.read("t").count() === 18L)
    // no-ops left no versions behind: bootstrap + 3 commits
    assert(wh.versions("t").size === 4)
  }

  test("txn watermarks survive interleaved non-streaming commits") {
    val (wh, _) = fresh()
    wh.append("t", rows(1 to 10), txn = Some(("q1", 7L)))
    // interleaved batch ops commit new manifests; carry-forward must
    // keep the q1 watermark visible at the new head
    wh.append("t", rows(11 to 12))
    wh.delete("t", org.apache.spark.sql.functions.col("id") === 12L)
    wh.append("t", rows(1 to 10), txn = Some(("q1", 7L))) // replay → no-op
    assert(wh.read("t").count() === 11L)
    wh.append("t", rows(13 to 13), txn = Some(("q1", 8L)))
    assert(wh.read("t").count() === 12L)
  }

  test("sink addBatch is idempotent per (queryId, batchId)") {
    val (wh, whDir) = fresh()
    val sink = new WarehouseSinkSpecAccess().createSink(spark, whDir, "t")
    spark.sparkContext.setLocalProperty(StreamExecution.QUERY_ID_KEY, "spec-q")
    try {
      sink.addBatch(0, rows(1 to 10))
      sink.addBatch(0, rows(1 to 10)) // epoch replay
      assert(wh.read("t").count() === 10L)
      sink.addBatch(1, rows(11 to 20))
      assert(wh.read("t").count() === 20L)
    } finally {
      spark.sparkContext.setLocalProperty(StreamExecution.QUERY_ID_KEY, null)
    }
  }

  test("writeStream end-to-end with checkpointed restart: no dup, no loss") {
    val (wh, whDir) = fresh()
    val root = Files.createTempDirectory("graft-sinke2e-").toString
    val srcDir = s"$root/src"
    val ckpt = s"$root/ckpt"
    rows(1 to 100).coalesce(1).write.parquet(srcDir)
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .writeStream.format("graft-warehouse")
        .option("path", whDir).option("table", "t")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(wh.read("t").count() === 100L)
    // restart over the same checkpoint with MORE source data: only the
    // new files flow; nothing replays
    rows(101 to 150).coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val got = wh.read("t").as[(Long, Double)].collect().toSeq.sorted
    assert(got === (1 to 150).map(i => (i.toLong, i * 1.0)))
    // and an idle restart appends nothing
    run()
    assert(wh.read("t").count() === 150L)
  }
  test("update-mode upsert sink: continuous MV; stale epochs never regress") {
    val mvSchema = StructType(Seq(
      StructField("grp", LongType, nullable = false),
      StructField("n", LongType),
      StructField("total", DoubleType)))
    val root = Files.createTempDirectory("graft-upsink-").toString
    val (whDir, srcDir, ckpt) = (s"$root/wh", s"$root/src", s"$root/ckpt")
    val wh = new Warehouse(spark, whDir,
      specs = Map("mv" -> Warehouse.TableSpec(mvSchema)))
    wh.bootstrap()
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(srcDir)
        .groupBy((org.apache.spark.sql.functions.col("id") % 3).as("grp"))
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).cast("long").as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("val")).as("total"))
        .writeStream.format("graft-warehouse")
        .option("path", whDir).option("table", "mv")
        .option("mergeKeys", "grp")
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def mvState = wh.read("mv").as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def expect(r: Range) = r.groupBy(_.toLong % 3)
      .map { case (g, xs) => g -> ((xs.size.toLong, xs.map(_ * 1.0).sum)) }

    rows(1 to 30).coalesce(1).write.parquet(srcDir)
    run()
    assert(mvState === expect(1 to 30))
    // second wave over the same checkpoint: cumulative upsert, not append
    rows(31 to 50).coalesce(1).write.mode("append").parquet(srcDir)
    run()
    assert(mvState === expect(1 to 50))
    run() // idle restart: no change
    assert(mvState === expect(1 to 50))

    // stale-epoch fence at the unit level: after epoch 5 lands, a
    // lagging writer's epoch 3 snapshot must be a NO-OP (re-merging an
    // older cumulative snapshot would silently regress the view)
    val sink = new WarehouseSinkSpecAccess()
      .createUpsertSink(spark, whDir, "mv", Seq("grp"))
    spark.sparkContext.setLocalProperty(StreamExecution.QUERY_ID_KEY, "up-q")
    try {
      sink.addBatch(5, Seq((0L, 100L, 100.0)).toDF("grp", "n", "total"))
      val after5 = mvState
      assert(after5(0L) === ((100L, 100.0)))
      sink.addBatch(3, Seq((0L, 7L, 7.0)).toDF("grp", "n", "total"))
      assert(mvState === after5) // stale epoch: no regression
      sink.addBatch(6, Seq((0L, 101L, 101.0)).toDF("grp", "n", "total"))
      assert(mvState(0L) === ((101L, 101.0)))
    } finally {
      spark.sparkContext.setLocalProperty(StreamExecution.QUERY_ID_KEY, null)
    }
  }

  test("quarantine sink: epochs split atomically, replay is a no-op") {
    val dir = Files.createTempDirectory("graft-sinkq-").toString
    val wh = new Warehouse(spark, s"$dir/wh",
      specs = Map("t" -> Warehouse.TableSpec(schema,
        checks = Map("nonneg" -> "val >= 0"))))
    wh.bootstrap()
    val sink = new WarehouseSinkSpecAccess()
      .createQuarantineSink(spark, s"$dir/wh", "t", "t_bad")
    spark.sparkContext.setLocalProperty(StreamExecution.QUERY_ID_KEY, "spec-qq")
    try {
      sink.addBatch(0, Seq((1L, 1.0), (2L, -2.0), (3L, 3.0))
        .toDF("id", "val"))
      // the sink auto-created t_bad in ITS warehouse instance; a fresh
      // open sees it through the persisted _meta spec
      val whR = Warehouse.open(spark, s"$dir/wh")
      assert(whR.read("t").count() === 2L)
      assert(whR.read("t_bad").count() === 1L)
      assert(whR.read("t_bad").head().getAs[String]("violation") === "nonneg")
      // epoch replay (restart after sink commit, before checkpoint):
      // NEITHER side double-writes
      sink.addBatch(0, Seq((1L, 1.0), (2L, -2.0), (3L, 3.0))
        .toDF("id", "val"))
      assert(whR.read("t").count() === 2L)
      assert(whR.read("t_bad").count() === 1L)
      // next epoch: all good rows — quarantine stays put
      sink.addBatch(1, Seq((4L, 4.0)).toDF("id", "val"))
      assert(whR.read("t").count() === 3L)
      assert(whR.read("t_bad").count() === 1L)
    } finally {
      spark.sparkContext.setLocalProperty(StreamExecution.QUERY_ID_KEY, null)
    }
  }

  test("quarantine sink: dead attempt's pending slots reclaimed on replay") {
    val dir = Files.createTempDirectory("graft-sinkq2-").toString
    val wh = new Warehouse(spark, s"$dir/wh",
      specs = Map("t" -> Warehouse.TableSpec(schema,
        checks = Map("nonneg" -> "val >= 0"))))
    wh.bootstrap()
    // crash BETWEEN the member manifests: target pending, quarantine
    // absent, marker absent — nothing visible
    wh.crashPoint = Some("between-manifests")
    intercept[IllegalStateException] {
      wh.appendQuarantine("t", "t_bad",
        Seq((1L, 1.0), (2L, -2.0)).toDF("id", "val"),
        txn = Some(("spec-qr", 0L)))
    }
    wh.crashPoint = None
    assert(wh.read("t").count() === 0L)
    // the replay must reclaim its own dead pending slot IMMEDIATELY
    // (no lease wait — txnStaleMs stays at the 10-minute default)
    val (k, q) = wh.appendQuarantine("t", "t_bad",
      Seq((1L, 1.0), (2L, -2.0)).toDF("id", "val"),
      txn = Some(("spec-qr", 0L)))
    assert(k === 1L && q === 1L)
    assert(wh.read("t").count() === 1L)
    assert(wh.read("t_bad").count() === 1L)
    // and a full replay after success is a (0, 0) no-op
    assert(wh.appendQuarantine("t", "t_bad",
      Seq((1L, 1.0), (2L, -2.0)).toDF("id", "val"),
      txn = Some(("spec-qr", 0L))) === ((0L, 0L)))
  }
}

/** Test access to the provider's createSink (package-private surface
  * stays package-private; the spec drives the public format string in
  * the end-to-end test above).
  */
private class WarehouseSinkSpecAccess {
  def createSink(spark: org.apache.spark.sql.SparkSession, path: String,
      table: String): graft.sources.WarehouseStreamSink =
    new graft.sources.WarehouseStreamSink(spark, path, table, 0L)
  def createQuarantineSink(spark: org.apache.spark.sql.SparkSession,
      path: String, table: String,
      quarantine: String): graft.sources.WarehouseStreamSink =
    new graft.sources.WarehouseStreamSink(spark, path, table, 0L, Nil,
      Some(quarantine))
  def createUpsertSink(spark: org.apache.spark.sql.SparkSession, path: String,
      table: String, keys: Seq[String]): graft.sources.WarehouseStreamSink =
    new graft.sources.WarehouseStreamSink(spark, path, table, 0L, keys)
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.pipeline.{MaterializedView, Warehouse}

/** End-to-end CDC REPLICATION — the composition the round-5 pieces
  * exist for: an upstream table's change feed streams through the
  * graft-warehouse SOURCE (CDF mode) into a downstream EVENT LOG via
  * the graft-warehouse SINK (exactly-once), across checkpointed
  * restarts and arbitrary upstream DML; the log then delta-folds to
  * exactly the upstream state. A lost feed row, a replayed epoch, or a
  * broken retraction all break the final equality.
  */
class CdcReplicationSpec extends SparkSpec {
  import spark.implicits._

  private val upSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", StringType),
    StructField("val", DoubleType)))

  // downstream log = upstream row + the retraction weight
  private val logSchema = upSchema
    .add(StructField("_change_delta", IntegerType, nullable = false))

  test("change feed -> sink -> delta fold reproduces upstream exactly") {
    val root = Files.createTempDirectory("graft-cdc-").toString
    val (aDir, bDir, ckpt) = (s"$root/a", s"$root/b", s"$root/ckpt")
    val up = new Warehouse(spark, aDir, retainReplaced = true,
      specs = Map("t" -> Warehouse.TableSpec(upSchema)))
    up.bootstrap()
    val down = new Warehouse(spark, bDir,
      specs = Map("log" -> Warehouse.TableSpec(logSchema)))
    down.bootstrap()

    def drain(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", aDir).option("table", "t")
        .option("readChangeFeed", "true").load()
        .writeStream.format("graft-warehouse")
        .option("path", bDir).option("table", "log")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rows(r: Range) =
      r.map(i => (i.toLong, s"g${i % 4}", i * 0.5)).toDF("id", "grp", "val")
    def upState = up.read("t").groupBy($"grp")
      .agg(count(lit(1)).cast("long").as("n_rows"), sum($"val").as("total"))
    def logFold = down.read("log").groupBy($"grp")
      .agg(sum($"_change_delta").cast("long").as("n_rows"),
        sum($"val" * $"_change_delta").as("total"))
      .where($"n_rows" > 0)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap

    up.append("t", rows(0 until 40))
    drain()
    assert(asMap(logFold) === asMap(upState))

    // upstream DML mix: append, partition-rewriting merge, delete
    up.append("t", rows(40 until 60))
    up.merge("t", rows(10 until 15).select($"id", $"grp",
      ($"val" + 100).as("val")), Seq("id"))
    up.delete("t", $"id" % 9 === 0)
    drain()
    assert(asMap(logFold) === asMap(upState))

    // idle restart over the same checkpoint: nothing replays
    drain()
    assert(asMap(logFold) === asMap(upState))

    // the log also feeds MaterializedView.foldAgg directly (it IS a
    // change feed at rest): seed with an empty state, fold everything
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("grp", StringType),
        StructField("n_rows", LongType), StructField("total", DoubleType))))
    val folded = MaterializedView.foldAgg(empty, down.read("log"),
      Seq("grp"), "val")
    assert(asMap(folded) === asMap(upState))
  }

  test("versioned change feed attributes every row to its commit and " +
      "folds identically to the unversioned feed") {
    val root = Files.createTempDirectory("graft-cdcv-").toString
    val wh = new Warehouse(spark, s"$root/wh", retainReplaced = true,
      specs = Map("t" -> Warehouse.TableSpec(upSchema)))
    wh.bootstrap() // v1
    def rows(r: Range) =
      r.map(i => (i.toLong, s"g${i % 4}", i * 0.5)).toDF("id", "grp", "val")
    wh.append("t", rows(0 until 40))                       // v2: +40
    wh.append("t", rows(40 until 60))                      // v3: +20
    val deleted = wh.delete("t", $"id" % 5 === 0)          // v4: net -12
    assert(deleted === 12L)
    wh.update("t", $"id" === 7, Map("val" -> lit(99.0)))   // v5: net 0
    val feed = wh.readChangeFeedVersioned("t", 1L)
    // per-commit NET row deltas are exact regardless of file layout
    val net = feed.groupBy($"_commit_version")
      .agg(sum($"_change_delta").as("net"))
      .as[(Long, Long)].collect().toMap
    assert(net === Map(2L -> 40L, 3L -> 20L, 4L -> -12L, 5L -> 0L))
    // value-level attribution: v5's asserted-minus-retracted val delta
    // is the update's +99 - old (7*0.5)
    val v5 = feed.where($"_commit_version" === 5L)
      .agg(sum($"val" * $"_change_delta")).as[Double].head()
    assert(math.abs(v5 - (99.0 - 3.5)) < 1e-9)
    // commit timestamps ride along, non-null and non-decreasing
    val ts = feed.select($"_commit_version", $"_commit_timestamp")
      .distinct().orderBy($"_commit_version")
      .as[(Long, java.sql.Timestamp)].collect()
    assert(ts.forall(_._2 != null))
    assert(ts.sliding(2).forall(p =>
      p.length < 2 || !p(0)._2.after(p(1)._2)))
    // dropping the attribution folds exactly like the two-snapshot feed
    def fold(df: org.apache.spark.sql.DataFrame) =
      MaterializedView.foldAgg(
        spark.emptyDataset[(String, Long, Double)]
          .toDF("grp", "n_rows", "total"),
        df, Seq("grp"), "val")
        .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(fold(feed.drop("_commit_version", "_commit_timestamp")) ===
      fold(wh.readChangeFeed("t", 1L)))
    // since==head → empty frame with the full attributed schema
    val empty2 = wh.readChangeFeedVersioned("t", wh.versions("t").max)
    assert(empty2.count() === 0L)
    assert(empty2.columns.takeRight(3).toSeq ===
      Seq("_change_delta", "_commit_version", "_commit_timestamp"))
  }
}

package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.Warehouse

/** The graft-warehouse streaming source: manifest version as the
  * offset. Snapshot-then-follow, exactly-once for appends across
  * checkpointed restarts (the SerializedOffset path), compaction
  * absorption, and the documented at-least-once re-emission on merge.
  */
class WarehouseSourceSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private def mkRows(day: Int, norads: Seq[Int], rev: Int = 100) =
    norads.map { n =>
      (n, ts(f"2026-01-$day%02dT0${n % 10}:00:00Z"),
        ts("2026-02-01T00:00:00Z"),
        1.0, 2.0, 3.0, 4.0, 5.0, 15.0, 0.1, rev,
        java.sql.Date.valueOf(f"2026-01-$day%02d"))
    }.toDF("norad_id", "epoch_utc", "fetched_at_utc", "inclination",
      "raan", "eccentricity", "arg_perigee", "mean_anomaly", "mean_motion",
      "b_star_drag", "rev_number", "epoch_date")

  private def drain(whDir: String, ckp: String, sinkDir: String): Unit = {
    val q = spark.readStream.format("graft-warehouse")
      .option("path", whDir).option("table", "fact_telemetry").load()
      .select("norad_id", "epoch_utc", "rev_number")
      .writeStream.format("parquet").option("path", sinkDir)
      .option("checkpointLocation", ckp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("custom-schema warehouse: specs persist and reopen from _meta") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-whcustom-").toString
    val whDir = s"$root/wh"
    val docsSpec = Map("documents" -> Warehouse.TableSpec(
      StructType(Seq(
        StructField("doc_id", LongType, nullable = false),
        StructField("text", StringType),
        StructField("lang", StringType))),
      partitionBy = Seq("lang"),
      statColumns = Seq("doc_id")))
    val wh = new Warehouse(spark, whDir, specs = docsSpec)
    wh.bootstrap()
    wh.append("documents", Seq(
      (1L, "hello", "en"), (2L, "welt", "de"), (3L, "monde", "fr"))
      .toDF("doc_id", "text", "lang"))

    // reopen with NO specs in code — _meta carries the layout
    val reopened = Warehouse.open(spark, whDir)
    assert(reopened.tables.keySet === Set("documents"))
    assert(reopened.partitioning("documents") === Seq("lang"))
    assert(reopened.statColumns("documents") === Seq("doc_id"))
    assert(reopened.read("documents").count() === 3L)
    // partition pruning on the custom layout
    assert(reopened.read("documents").where($"lang" === "de")
      .select($"text").as[String].head() === "welt")

    // both read formats self-describe from _meta
    val batch = spark.read.format("graft-warehouse")
      .option("path", whDir).option("table", "documents").load()
    assert(batch.count() === 3L)
    val ckp = s"$root/ckp"
    val q = spark.readStream.format("graft-warehouse")
      .option("path", whDir).option("table", "documents").load()
      .writeStream.format("memory").queryName("custom_docs")
      .option("checkpointLocation", ckp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("custom_docs").count() === 3L)

    // upserts work on the custom key/partition layout
    reopened.merge("documents",
      Seq((2L, "hallo welt", "de")).toDF("doc_id", "text", "lang"),
      Seq("doc_id"))
    assert(reopened.read("documents").where($"doc_id" === 2L)
      .select($"text").as[String].head() === "hallo welt")
  }

  test("batch read format: latest + versionAsOf time travel") {
    val root = Files.createTempDirectory("graft-whbatch-").toString
    val whDir = s"$root/wh"
    val wh = new Warehouse(spark, whDir, retainReplaced = true)
    wh.bootstrap()
    wh.append("fact_telemetry", mkRows(1, Seq(1, 2)))
    val v2 = wh.versions("fact_telemetry").last
    wh.append("fact_telemetry", mkRows(2, Seq(3)))

    def readWh(opts: Map[String, String]) = spark.read
      .format("graft-warehouse")
      .option("path", whDir).option("table", "fact_telemetry")
      .options(opts).load()

    assert(readWh(Map.empty).count() === 3L)
    assert(readWh(Map("versionAsOf" -> v2.toString))
      .select($"norad_id").as[Int].collect().sorted.toSeq === Seq(1, 2))
    // manifest stat skipping works through the reader API too
    val selective = readWh(Map.empty).where($"norad_id" === 3)
    assert(selective.collect().length === 1) // populates THIS plan's metrics
    import org.apache.spark.sql.execution.FileSourceScanExec
    assert(selective.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.get === 1L)
    // unknown version fails fast
    val e = intercept[IllegalArgumentException] {
      readWh(Map("versionAsOf" -> "999"))
    }
    assert(e.getMessage.contains("no manifest"))
  }

  test("maxVersionsPerTrigger: follow phase drains in bounded steps, " +
      "checkpointed restart continues the cadence") {
    val root = Files.createTempDirectory("graft-whrate-").toString
    val whDir = s"$root/wh"
    val ckp = s"$root/ckp"
    val wh = new Warehouse(spark, whDir)
    wh.bootstrap() // v1
    (1 to 5).foreach { i => // v2..v6, one row each
      wh.append("fact_telemetry", mkRows(i, Seq(100 + i)))
    }
    val counts = scala.collection.mutable.ArrayBuffer[Long]()
    def drainLimited(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "fact_telemetry")
        .option("startingVersion", "1")
        .option("maxVersionsPerTrigger", "2")
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = df.count()
          counts.synchronized { counts += n }
          ()
        }
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainLimited()
    // 5 versions of lag at 2 versions/batch: 2 + 2 + 1 rows
    assert(counts.sum === 5L, counts)
    assert(counts.forall(_ <= 2L), counts)
    assert(counts.count(_ > 0L) === 3, counts)
    // restart from the checkpoint: only the new commit, same cadence
    counts.clear()
    wh.append("fact_telemetry", mkRows(9, Seq(200))) // v7
    drainLimited()
    assert(counts.sum === 1L, counts)
  }

  test("snapshot then follow: appends arrive exactly once across restarts") {
    val root = Files.createTempDirectory("graft-whstream-").toString
    val (whDir, ckp, sink) = (s"$root/wh", s"$root/ckp", s"$root/sink")
    val wh = new Warehouse(spark, whDir)
    wh.bootstrap()
    wh.append("fact_telemetry", mkRows(1, Seq(1, 2)))
    wh.append("fact_telemetry", mkRows(2, Seq(3)))

    // run 1: full snapshot at the current version
    drain(whDir, ckp, sink)
    val after1 = spark.read.parquet(sink).select($"norad_id")
      .as[Int].collect().sorted
    assert(after1.toSeq === Seq(1, 2, 3))

    // no new commits → a restarted drain emits nothing
    drain(whDir, ckp, sink)
    assert(spark.read.parquet(sink).count() === 3L)

    // two more commits; restart picks up exactly the delta
    wh.append("fact_telemetry", mkRows(3, Seq(4)))
    wh.append("fact_telemetry", mkRows(3, Seq(5)))
    drain(whDir, ckp, sink)
    val after3 = spark.read.parquet(sink).select($"norad_id")
      .as[Int].collect().sorted
    assert(after3.toSeq === Seq(1, 2, 3, 4, 5))
  }

  test("write-side compaction between commits never duplicates or drops rows") {
    val root = Files.createTempDirectory("graft-whstream-c-").toString
    val (whDir, ckp, sink) = (s"$root/wh", s"$root/ckp", s"$root/sink")
    val wh = new Warehouse(spark, whDir, retainReplaced = true)
    wh.bootstrap()
    wh.append("fact_telemetry", mkRows(1, Seq(1)))
    drain(whDir, ckp, sink) // checkpoint at v2

    // fragment day 2 with three appends, then compact it away BEFORE
    // the stream sees any of it: the diff v2→latest contains the
    // compacted files, not the replaced originals
    (2 to 4).foreach(n =>
      wh.append("fact_telemetry", mkRows(2, Seq(n)).repartition(1)))
    wh.compact("fact_telemetry")
    drain(whDir, ckp, sink)
    val got = spark.read.parquet(sink).select($"norad_id")
      .as[Int].collect().sorted
    assert(got.toSeq === Seq(1, 2, 3, 4))
  }

  test("live MV: streaming aggregation over the source tracks the table") {
    // the composition the source exists for — a per-satellite aggregate
    // maintained by Spark's OWN stateful streaming aggregation, fed by
    // manifest diffs: restart after each append, state carries the MV
    val root = Files.createTempDirectory("graft-whstream-mv-").toString
    val (whDir, ckp) = (s"$root/wh", s"$root/ckp")
    val wh = new Warehouse(spark, whDir)
    wh.bootstrap()

    def drainAgg(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "fact_telemetry").load()
        .groupBy($"norad_id")
        .agg(count(lit(1)).as("n"), sum($"mean_motion").as("s"))
        .writeStream.format("memory").queryName("wh_mv")
        .option("checkpointLocation", ckp)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    wh.append("fact_telemetry", mkRows(1, Seq(1, 2)))
    drainAgg()
    wh.append("fact_telemetry", mkRows(2, Seq(1, 3)))
    drainAgg()

    val mv = spark.table("wh_mv")
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val full = wh.read("fact_telemetry").groupBy($"norad_id")
      .agg(count(lit(1)).as("n"), sum($"mean_motion").as("s"))
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mv === full)
    assert(mv(1)._1 === 2L) // norad 1 appeared in both appends
  }

  test("CDF mode: delta-weighted fold is exact across a merge") {
    // readChangeFeed semantics in the stream: rows carry _change_delta,
    // so maintaining an aggregate by folding n += δ, s += mm*δ is
    // EXACT even though the merge rewrites whole partitions
    val root = Files.createTempDirectory("graft-whstream-cdf-").toString
    val (whDir, ckp) = (s"$root/wh", s"$root/ckp")
    val wh = new Warehouse(spark, whDir, retainReplaced = true)
    wh.bootstrap()

    // Spark's OWN streaming aggregation state does the folding (sum of
    // δ and mm*δ across the whole feed IS the current count/sum);
    // update mode emits the changed keys' CUMULATIVE values, which the
    // consumer upserts — a keyed store would do the identical upsert
    val mv = scala.collection.mutable.Map.empty[Int, (Long, Double)]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "fact_telemetry")
        .option("readChangeFeed", "true").load()
        .groupBy($"norad_id")
        .agg(sum($"_change_delta").as("n"),
          sum($"mean_motion" * $"_change_delta").as("s"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Int, Long, Double)].collect().foreach {
            case (id, n, s) =>
              if (n == 0L) mv.remove(id) else mv(id) = (n, s)
          }
          ()
        }
        .option("checkpointLocation", ckp)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    wh.append("fact_telemetry", mkRows(1, Seq(1, 2))
      .unionByName(mkRows(2, Seq(3))))
    drainCdf()
    // upsert norad 1 on day 1 (mean_motion unchanged, rev bumped) and
    // insert norad 9 on day 2
    wh.merge("fact_telemetry",
      mkRows(1, Seq(1), rev = 999).unionByName(mkRows(2, Seq(9))),
      Seq("norad_id", "epoch_utc"))
    drainCdf()

    val full = wh.read("fact_telemetry").groupBy($"norad_id")
      .agg(count(lit(1)).as("n"), sum($"mean_motion").as("s"))
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mv.toMap === full)
    assert(full.keySet === Set(1, 2, 3, 9))
  }

  test("CDF mode: a vectored delete streams its retractions exactly " +
      "once (grown deletion vector, no file rewritten)") {
    val root = Files.createTempDirectory("graft-whstream-dv-").toString
    val (whDir, ckp) = (s"$root/wh", s"$root/ckp")
    val wh = new Warehouse(spark, whDir, retainReplaced = true)
    wh.bootstrap()
    val mv = scala.collection.mutable.Map.empty[Int, (Long, Double)]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "fact_telemetry")
        .option("readChangeFeed", "true").load()
        .groupBy($"norad_id")
        .agg(sum($"_change_delta").as("n"),
          sum($"mean_motion" * $"_change_delta").as("s"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(Int, Long, Double)].collect().foreach {
            case (id, n, s) =>
              if (n == 0L) mv.remove(id) else mv(id) = (n, s)
          }
          ()
        }
        .option("checkpointLocation", ckp)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    wh.append("fact_telemetry", mkRows(1, Seq(1, 2, 3)))
    drainCdf()
    assert(mv.keySet === Set(1, 2, 3))
    // merge-on-read delete: the entry's vector grows, no rel changes —
    // the stream must still see norad 2 leave, as -1 retractions
    wh.deleteVectored("fact_telemetry", $"norad_id" === 2)
    drainCdf()
    drainCdf() // idle restart: nothing re-retracts
    val full = wh.read("fact_telemetry").groupBy($"norad_id")
      .agg(count(lit(1)).as("n"), sum($"mean_motion").as("s"))
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mv.toMap === full)
    assert(full.keySet === Set(1, 3))
  }

  test("merge re-emits the touched partition (documented at-least-once)") {
    val root = Files.createTempDirectory("graft-whstream-m-").toString
    val (whDir, ckp, sink) = (s"$root/wh", s"$root/ckp", s"$root/sink")
    val wh = new Warehouse(spark, whDir, retainReplaced = true)
    wh.bootstrap()
    wh.append("fact_telemetry", mkRows(1, Seq(1, 2)) // day 1
      .unionByName(mkRows(2, Seq(3))))               // day 2
    drain(whDir, ckp, sink)
    assert(spark.read.parquet(sink).count() === 3L)

    // upsert norad 1 on day 1: the rewritten partition re-emits both
    // its rows (1 updated + 2 surviving); day 2 stays silent
    wh.merge("fact_telemetry", mkRows(1, Seq(1), rev = 999),
      Seq("norad_id", "epoch_utc"))
    drain(whDir, ckp, sink)
    val emitted = spark.read.parquet(sink)
      .groupBy($"norad_id").agg(count(lit(1)).as("n"),
        max($"rev_number").as("maxRev"))
      .as[(Int, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(emitted(1) === ((2L, 999)))  // snapshot + re-emission w/ update
    assert(emitted(2) === ((2L, 100)))  // same-partition survivor re-emitted
    assert(emitted(3) === ((1L, 100)))  // untouched partition: once only
  }

  test("stream-stream join of two warehouse sources: fact-enrichment " +
      "across checkpointed restarts equals the batch join of final states") {
    val root = Files.createTempDirectory("graft-whstream-j-").toString
    val (whDir, ckp, sink) = (s"$root/wh", s"$root/ckp", s"$root/sink")
    val wh = new Warehouse(spark, whDir)
    wh.bootstrap()
    // batch 1: dims for sats 1,2 — facts for sats 1,2,3 (3 is EARLY:
    // its dim arrives in batch 2, so the join must hold its fact rows
    // in state and emit them when the dim lands)
    wh.append("dim_satellites",
      Seq((1, "SAT-1", "2026-001"), (2, "SAT-2", "2026-002"))
        .toDF("norad_id", "sat_name", "intl_designator"))
    wh.append("fact_telemetry", mkRows(1, Seq(1, 2, 3)))

    def enriched() = {
      val facts = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "fact_telemetry").load()
        .select("norad_id", "epoch_utc", "rev_number")
      val dims = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "dim_satellites").load()
        .select("norad_id", "sat_name")
      facts.join(dims, Seq("norad_id")) // stream-stream INNER equi-join
    }
    def drainJoin(): Unit = {
      val q = enriched().writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainJoin()
    // sat 3's fact has no dim yet: only 1,2 enriched so far
    assert(spark.read.parquet(sink).select($"norad_id")
      .as[Int].collect().sorted.toSeq === Seq(1, 2))

    // batch 2: the late dim for 3, plus a new fact for 1 — the restart
    // resumes BOTH sources and the join state from the checkpoint
    wh.append("dim_satellites",
      Seq((3, "SAT-3", "2026-003"))
        .toDF("norad_id", "sat_name", "intl_designator"))
    wh.append("fact_telemetry", mkRows(2, Seq(1)))
    drainJoin()

    val streamed = spark.read.parquet(sink)
      .select($"norad_id", $"epoch_utc", $"rev_number", $"sat_name")
      .as[(Int, Timestamp, Int, String)].collect()
    val batch = wh.read("fact_telemetry")
      .select("norad_id", "epoch_utc", "rev_number")
      .join(wh.read("dim_satellites").select("norad_id", "sat_name"),
        Seq("norad_id"))
      .as[(Int, Timestamp, Int, String)].collect()
    // exactly the batch join of the FINAL states — the held-back sat-3
    // fact emitted once its dim arrived, nothing duplicated across the
    // restart, nothing dropped
    assert(streamed.sorted.toSeq === batch.sorted.toSeq)
    assert(streamed.length === 4) // 3 facts day1 + 1 fact day2, all dims
  }

  test("follow stream SURVIVES a partition-layout migration: the " +
    "rewrite emits zero rows, a lagging era re-anchors under the OLD " +
    "layout, and union-of-emissions equals the batch content") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-whstream-mig-").toString
    val (whDir, ckp, sink) = (s"$root/wh", s"$root/ckp", s"$root/sink")
    val wh = new Warehouse(spark, whDir, retainReplaced = true,
      specs = Map("t" -> Warehouse.TableSpec(
        StructType(Seq(
          StructField("id", LongType),
          StructField("grp", StringType),
          StructField("val", DoubleType))))))
    wh.bootstrap()
    def rows(ids: Seq[Long]) =
      ids.map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "val")
    def drain(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "t").load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    wh.append("t", rows(1L to 20L))
    drain()
    assert(spark.read.parquet(sink).count() === 20L)
    // the stream now LAGS: an old-layout append, the migration itself,
    // and a new-layout append all land before the next drain
    wh.append("t", rows(21L to 30L))
    wh.repartitionTable("t", Seq("grp"))
    wh.append("t", rows(31L to 40L))
    drain()
    val streamed = spark.read.parquet(sink).select($"id").as[Long]
      .collect().sorted
    // exactly-once across the boundary: 21–30 came from the OLD era's
    // files (re-anchored), 31–40 from the new era, and the migration's
    // 30-row rewrite emitted NOTHING
    assert(streamed === (1L to 40L).toArray)
    assert(streamed.toSeq === wh.read("t").select($"id").as[Long]
      .collect().sorted.toSeq)
    // a caught-up stream also crosses (empty pre-era, no retention use)
    wh.repartitionTable("t", Nil)
    wh.append("t", rows(41L to 45L))
    drain()
    assert(spark.read.parquet(sink).count() === 45L)
  }

  test("CDF stream across a layout migration nets ZERO for the " +
    "rewrite: the delta-weighted fold still equals the batch state") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-whstream-migcdf-").toString
    val (whDir, ckp) = (s"$root/wh", s"$root/ckp")
    val wh = new Warehouse(spark, whDir, retainReplaced = true,
      specs = Map("t" -> Warehouse.TableSpec(
        StructType(Seq(
          StructField("id", LongType),
          StructField("grp", StringType),
          StructField("val", DoubleType))))))
    wh.bootstrap()
    def rows(ids: Seq[Long]) =
      ids.map(i => (i, s"g${i % 3}", i * 1.0)).toDF("id", "grp", "val")
    val mv = scala.collection.mutable.Map.empty[String, (Long, Double)]
    def drainCdf(): Unit = {
      val q = spark.readStream.format("graft-warehouse")
        .option("path", whDir).option("table", "t")
        .option("readChangeFeed", "true").load()
        .groupBy($"grp")
        .agg(sum($"_change_delta").as("n"),
          sum($"val" * $"_change_delta").as("s"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.as[(String, Long, Double)].collect().foreach {
            case (g, n, s) => if (n == 0L) mv.remove(g) else mv(g) = (n, s)
          }
          ()
        }
        .option("checkpointLocation", ckp)
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    wh.append("t", rows(1L to 30L))
    drainCdf()
    // lagging DML on both sides of the migration
    wh.delete("t", $"id" <= 3L) // old-layout CoW delete
    wh.repartitionTable("t", Seq("grp"))
    wh.append("t", rows(31L to 36L))
    drainCdf()
    val full = wh.read("t").groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"val").as("s"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(mv.toMap === full)
    assert(wh.read("t").count() === 33L)
  }
}

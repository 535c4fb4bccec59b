package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.schema.Schemas

/** Structured-Streaming re-expression of the ingest pipeline (SURVEY.md
  * §2.11).
  *
  * The reference is a cron-triggered incremental micro-batch job
  * (`/root/reference/.github/workflows/data-pipeline.yml:7-9`, every 8 h)
  * whose exactly-once state is the warehouse itself, re-queried per run
  * with a 3-day lookback (`/root/reference/script.py:159`). The 1:1
  * streaming mapping:
  *
  *   - cron trigger            → file source + `Trigger.AvailableNow()`
  *     (each invocation drains whatever landed, then stops);
  *   - check-then-write dedup  → `dropDuplicatesWithinWatermark` keyed
  *     `(norad_id, epoch_utc)`;
  *   - 3-day lookback bound    → `withWatermark("epoch_utc", "3 days")` —
  *     the SAME bounded-state trade: late records beyond the horizon are
  *     re-admitted as possible duplicates, in exchange for state that
  *     never grows past the window.
  *
  * State lives in the checkpoint (RocksDB/HDFS-backed at scale), scales
  * with |keys within watermark| not |history|, and partitions by key —
  * this is the design that survives 1000 executors.
  */
object StreamingIngest {

  /** Streaming EP2: watermarked bounded-state telemetry dedup. Returns a
    * started query; callers `awaitTermination` (AvailableNow stops by
    * itself once the backlog is drained).
    */
  def telemetryStream(spark: SparkSession, sourceDir: String,
      targetDir: String, checkpointDir: String,
      horizonDays: Int = 3): StreamingQuery =
    spark.readStream
      .schema(Schemas.factTelemetry)
      .parquet(sourceDir)
      .withWatermark("epoch_utc", s"$horizonDays days")
      .dropDuplicatesWithinWatermark("norad_id", "epoch_utc")
      .writeStream
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming dim upsert via foreachBatch — the idempotent-sink pattern
    * for sinks that need a read-check (here: the EP1 anti-join against
    * the CURRENT warehouse state, which a blind append sink can't do).
    * Each micro-batch runs the same check-then-write the batch pipeline
    * uses; AvailableNow drains and stops.
    */
  def dimUpsertStream(spark: SparkSession, sourceDir: String,
      checkpointDir: String,
      warehouse: graft.pipeline.Warehouse): StreamingQuery =
    spark.readStream
      .schema(Schemas.dimSatellites)
      .parquet(sourceDir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val fresh = graft.dedup.Dedup.antiJoinNew(
          graft.dedup.Dedup.keepFirst(batch.toDF(), Seq("norad_id"),
            Seq(col("sat_name"))),
          warehouse.read("dim_satellites"), Seq("norad_id"))
        if (!fresh.isEmpty) warehouse.append("dim_satellites", fresh)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming event-time tumbling-window aggregation (the §2.11 window
    * surface): per-window, per-key counts with watermark-bounded state,
    * emitted on window close (append mode).
    */
  def windowedCounts(events: DataFrame, timeCol: String, keyCol: String,
      windowLength: String, watermark: String): DataFrame =
    events
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))
}

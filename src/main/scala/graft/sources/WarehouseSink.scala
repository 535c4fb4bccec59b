package graft.sources

import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.execution.streaming.runtime.StreamExecution

import graft.pipeline.Warehouse

/** NATIVE STREAMING SINK for the warehouse — the write half of the
  * `graft-warehouse` format ([[WarehouseSourceProvider]] serves reads):
  *
  *   df.writeStream.format("graft-warehouse")
  *     .option("path", warehouseDir).option("table", "fact_telemetry")
  *     .option("checkpointLocation", ckpt).start()
  *
  * EXACTLY-ONCE, not at-least-once: the prior pattern (foreachBatch →
  * `wh.append`) double-writes when a micro-batch replays — the sink
  * committed, the query crashed before its checkpoint advanced, and the
  * restarted query re-runs the epoch. This sink fences each epoch with
  * the warehouse txn ledger ([[Warehouse!.append]]'s `txn` parameter,
  * the Delta `setTransaction` shape): the `(queryId, batchId)` pair is
  * recorded atomically WITH the appended files in the manifest's commit
  * metadata, carried forward by every subsequent commit, and a replayed
  * epoch is a no-op. queryId is Structured Streaming's stable query
  * identity (persisted in the checkpoint), so the fence survives
  * restarts, which is the entire point.
  *
  * Append mode appends; UPDATE mode (`.option("mergeKeys", "k1,k2")`)
  * turns the sink into a keyed streaming UPSERT — each epoch's changed
  * rows merge by key, which is exactly what an update-mode streaming
  * aggregation emits (cumulative values for changed keys): a
  * continuously-maintained materialized view INTO the warehouse. The
  * same txn ledger fences upserts — crucially, a replayed or STALE
  * epoch is a no-op, because re-merging epoch N's cumulative snapshot
  * after N+1 landed would REGRESS the view. Complete mode stays
  * unsupported (it would rewrite the table every epoch).
  */
/** @param quarantine when set, each epoch splits by the TARGET table's
  *   CHECK constraints through [[Warehouse!.appendQuarantine]] —
  *   STREAMING EXPECTATIONS: passing rows land in `table`, violating
  *   rows in the quarantine table with first-fail attribution, both in
  *   one atomic marker-fenced transaction per epoch, exactly-once
  *   across restarts (the fence reclaims a dead attempt's pending
  *   slots immediately). The alternative to the default sink contract
  *   where one bad row fails the whole epoch forever (a poison batch).
  */
class WarehouseStreamSink(spark: SparkSession, path: String, table: String,
    rowsPerFile: Long, mergeKeys: Seq[String] = Nil,
    quarantine: Option[String] = None) extends Sink {

  private val wh = Warehouse.open(spark, path)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the streaming query id rides a thread-local property on the
    // micro-batch thread (how Delta's sink obtains its txn appId)
    val queryId = Option(
      spark.sparkContext.getLocalProperty(StreamExecution.QUERY_ID_KEY))
      .getOrElse(throw new IllegalStateException(
        "graft-warehouse sink: no streaming query id on this thread " +
          "(addBatch must run inside a streaming query)"))
    if (quarantine.nonEmpty)
      wh.appendQuarantine(table, quarantine.get,
        GraftBridge.freshBatch(data), rowsPerFile,
        txn = Some((queryId, batchId)))
    else if (mergeKeys.nonEmpty)
      wh.merge(table, GraftBridge.freshBatch(data), mergeKeys,
        txn = Some((queryId, batchId)))
    else
      wh.append(table, GraftBridge.freshBatch(data), rowsPerFile,
        txn = Some((queryId, batchId)))
  }

  override def toString: String = s"WarehouseStreamSink[$path/$table]"
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization — resampling onto a fixed grid, gap
  * filling, last-observation-carried-forward, and linear interpolation.
  * The telemetry shapes the reference's orbital-state feed implies
  * (irregular per-satellite epochs, `/root/reference/script.py:120-135`
  * keeps raw epochs; consumers want a regular grid) and every metrics
  * pipeline needs.
  *
  * Scale shape: everything here is per-key. The grid explodes
  * `sequence()` rows per key (grid length bounded by that key's own
  * span / step — never a global cross join), and every fill is a
  * partitioned running window (`partitionBy(keys)`), so the whole
  * family distributes by key with ONE shuffle and no driver state.
  * Keys with a million-slot span produce a million rows — the same
  * contract as any dense-grid SQL, made explicit by `maxSlots`.
  */
object TimeSeries {

  /** Floor `ts` onto a `stepSec`-second grid (epoch-aligned buckets —
    * `date_trunc` generalized to arbitrary steps). Codegen'd integer
    * arithmetic on epoch seconds.
    */
  def gridFloor(ts: Column, stepSec: Long): Column =
    timestamp_seconds(
      floor(unix_timestamp(ts) / stepSec).cast("long") * stepSec)

  /** RESAMPLE: one row per (key, grid bucket) with the given
    * aggregates over the observations that fell in it. A plain
    * hash-aggregate on the bucketed timestamp — Catalyst's partial
    * aggregation applies, so the shuffle carries per-bucket partials.
    */
  def resample(df: DataFrame, keys: Seq[String], tsCol: String,
      stepSec: Long, aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "resample: no aggregates")
    df.groupBy((keys.map(col) :+
        gridFloor(col(tsCol), stepSec).as("bucket")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** GAP FILL: densify each key's grid — one row per grid slot from
    * the key's first bucket to its last, observations joined on,
    * missing slots null. Input must already be one-row-per-(key,
    * bucket) (resample output). The grid generates per key via
    * `sequence()` + explode — length bounded by that key's own span.
    *
    * @param maxSlots guard against a degenerate span exploding a
    *   key into billions of rows (fails fast, names the key count)
    */
  def gapFill(df: DataFrame, keys: Seq[String], bucketCol: String,
      stepSec: Long, maxSlots: Long = 1000000L): DataFrame = {
    val k = keys.map(col)
    val spans = df.groupBy(k: _*)
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
    val over = spans.where(
      (unix_timestamp(col("__hi")) - unix_timestamp(col("__lo"))) / stepSec
        >= maxSlots).count()
    require(over == 0L,
      s"gapFill: $over key(s) span more than $maxSlots grid slots — " +
        "raise maxSlots if that is intended")
    val grid = spans.select((k :+ explode(sequence(col("__lo"),
        col("__hi"),
        expr(s"interval $stepSec seconds"))).as(bucketCol)): _*)
    grid.join(df, keys :+ bucketCol, "left")
  }

  /** LOCF: fill null `valueCols` with the key's last non-null value at
    * or before each row — one running window per column, partitioned
    * by key (no global sort).
    */
  def locf(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** LINEAR INTERPOLATION of null `valueCol` slots between a key's
    * surrounding observations: v = prev + (next−prev)·Δt/ΔT on epoch
    * seconds. Slots before the first / after the last observation stay
    * null (interpolation, not extrapolation — compose with [[locf]]
    * for a trailing fill). Two running windows per key, no self-join.
    */
  def interpolate(df: DataFrame, keys: Seq[String], bucketCol: String,
      valueCol: String): DataFrame = {
    val wb = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bucketCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ts = unix_timestamp(col(bucketCol)).cast("double")
    val obsTs = when(col(valueCol).isNotNull, ts)
    val prevV = last(col(valueCol), ignoreNulls = true).over(wb)
    val prevT = last(obsTs, ignoreNulls = true).over(wb)
    val nextV = first(col(valueCol), ignoreNulls = true).over(wf)
    val nextT = first(obsTs, ignoreNulls = true).over(wf)
    df.withColumn(valueCol,
      when(col(valueCol).isNotNull, col(valueCol))
        .when(prevV.isNotNull && nextV.isNotNull,
          prevV + (nextV - prevV) * (ts - prevT) / (nextT - prevT)))
  }
}

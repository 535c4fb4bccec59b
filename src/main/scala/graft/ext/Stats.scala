package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe order statistics.
  *
  * Spark's exact `percentile` aggregate buffers EVERY group value in the
  * aggregation state (a per-group OpenHashMap of raw values) — at 100 TB
  * a per-language percentile over document scores means terabytes of
  * state in one aggregate buffer. But curation scores are rounded to a
  * fixed grid (quality = round(..., 6) has ≤ 10⁶+1 possible values), and
  * over a DISCRETE domain the exact interpolated percentile only needs
  * the VALUE HISTOGRAM: one mergeable map-side-combining groupBy on
  * (group, value) — bounded by the grid size, not the row count — then
  * order statistics over histogram rows.
  *
  * The interpolation reproduces Spark's `Percentile` bit-for-bit
  * (`(higher − pos)·v_lo + (pos − lower)·v_hi`, pos = p·(N−1), 0-based;
  * nulls ignored), so swapping it into an existing query keeps oracle
  * hashes stable.
  */
object Stats {

  /** Exact interpolated percentile of `valueCol` per `groups`, computed
    * from the value histogram. Output: `groups :+ pct`.
    *
    * Scale shape: one shuffle for the (group, value) histogram (partial
    * aggregation collapses repeats map-side), a window + final agg over
    * HISTOGRAM rows only (≤ grid size per group, independent of row
    * count). Use for discrete/rounded/low-cardinality domains; a truly
    * continuous unbounded domain needs `approx_percentile` instead.
    */
  def percentileDiscrete(df: DataFrame, groups: Seq[String],
      valueCol: String, p: Double, as: String = "pct"): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile must be in [0,1], got $p")
    require(groups.nonEmpty, "grouped form requires group columns")
    val g = groups.map(col)
    // histogram INCLUDING the null value row, so groups whose values
    // are all null still exist downstream — percentile() emits them
    // with a null result, and a drop-in replacement must too
    val hist0 = df.groupBy(g :+ col(valueCol): _*)
      .agg(count(lit(1)).as("_c"))
    val hist = hist0.where(col(valueCol).isNotNull)
    val w = Window.partitionBy(g: _*).orderBy(col(valueCol))
    // group totals via a partition-total window, NOT a join: window
    // partitioning groups null keys together (SQL group semantics),
    // where an equi-join would silently drop null-keyed groups
    val wp = Window.partitionBy(g: _*)
    // Spark Percentile semantics: 0-based pos = p·(N−1); lower/higher
    // bracket it; a histogram row holds indices [_cum−_c, _cum).
    val pos = lit(p) * (col("_n") - 1).cast("double")
    val lowerIdx = floor(pos)
    val higherIdx = ceil(pos)
    def valueAt(idx: Column): Column =
      min(when(col("_cum") > idx && (col("_cum") - col("_c")) <= idx,
        col(valueCol)))
    val perGroup = hist
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(wp))
      .groupBy(g: _*)
      .agg(
        valueAt(lowerIdx).as("_vlo"),
        valueAt(higherIdx).as("_vhi"),
        max(higherIdx - pos).as("_wlo"),
        max(pos - lowerIdx).as("_whi"))
      .select(g :+
        when(col("_whi") === 0.0, col("_vlo"))
          .otherwise(col("_wlo") * col("_vlo") + col("_whi") * col("_vhi"))
          .as(as): _*)
    // re-attach groups with no non-null value (absent from hist) as
    // null-percentile rows. Null-SAFE join condition: a null group KEY
    // is a real group to percentile(), not a non-match.
    val pg = perGroup.select(
      groups.map(c => col(c).as(s"_pg_$c")) :+ col(as): _*)
    val cond = groups.map(c => col(c) <=> col(s"_pg_$c")).reduce(_ && _)
    hist0.select(g: _*).distinct()
      .join(pg, cond, "left")
      .select(g :+ col(as): _*)
  }
}

package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Budgeted corpus selection — "per language, keep the best documents
  * until N tokens are spent", the step that turns scored documents into
  * a training mixture of a declared size.
  *
  * Semantics: within each group, order rows by `order` (a total order —
  * include a tiebreaker), keep the maximal prefix whose cumulative
  * `cost` stays ≤ `budget`.
  *
  * The naive plan — `sum(cost) OVER (PARTITION BY group ORDER BY ...)`
  * then filter — puts an ENTIRE GROUP in one task: at 100 TB a single
  * language is terabytes, so that window is the q24-class scale-killer.
  * This implementation keeps the same row-exact semantics with no
  * full-group window:
  *
  *   1. coarse: bucket rows by quantized sort key; aggregate per-bucket
  *      cost sums (one small shuffle);
  *   2. plan: a window over BUCKET AGGREGATES per group (≤ `buckets`
  *      rows per group — trivially one task) finds, per bucket, the
  *      budget already spent by strictly-better buckets;
  *   3. fine: rows in buckets that fit entirely are kept with no
  *      per-row window at all; ONLY the single boundary bucket per
  *      group (~1/buckets of the data) runs the exact per-row
  *      cumulative window against its remaining budget.
  *
  * Correctness requires the bucket id to be monotone along `order`,
  * which step 1 guarantees by deriving buckets from the leading sort
  * expression itself; rows that compare equal on it always land in the
  * same bucket, so bucket order refines to row order exactly.
  *
  * Scale: two shuffles (bucket agg + boundary window), broadcast of the
  * tiny bucket plan, no driver state, no full-group task.
  */
object Curation {

  /** Keep, per group, the best-first maximal prefix with cumulative
    * cost ≤ budget.
    *
    * @param groups  grouping columns (the mixture axes, e.g. lang)
    * @param leading leading sort expression, DESCENDING = better (e.g.
    *                a quality score in [0, 1])
    * @param tie     tiebreak columns making the order total (ascending)
    * @param cost    per-row non-negative cost (e.g. token count)
    * @param budget  per-group budget in cost units
    * @param buckets quantization granularity of the coarse pass
    * @param lo,hi   value range of `leading` (scores outside clamp)
    */
  def takeByBudget(df: DataFrame, groups: Seq[String], leading: Column,
      tie: Seq[String], cost: Column, budget: Long,
      buckets: Int = 1000, lo: Double = 0.0, hi: Double = 1.0): DataFrame = {
    require(groups.nonEmpty && tie.nonEmpty && buckets > 1)
    val gcols = groups.map(col)
    // monotone bucket id: 0 = best. Equal leading values share a bucket.
    val bucket = least(greatest(
        floor((lit(hi) - leading) / (lit(hi) - lit(lo)) * buckets), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("int")
    val rows = df.withColumn("_bkt", bucket).withColumn("_cost", cost)
    // 2. the bucket-level plan: spent-by-better-buckets per bucket
    val wb = Window.partitionBy(gcols: _*).orderBy(col("_bkt"))
    val plan = rows.groupBy(gcols :+ col("_bkt"): _*)
      .agg(sum("_cost").as("_bsum"))
      .withColumn("_spentBefore",
        coalesce(sum(col("_bsum")).over(wb), lit(0L)) - col("_bsum"))
      // buckets strictly past the budget drop whole; <= keeps the exact
      // boundary alive for zero-cost rows (cum == budget is still kept)
      .where(col("_spentBefore") <= budget)
      .withColumn("_fits", col("_spentBefore") + col("_bsum") <= budget)
      .select(gcols :+ col("_bkt") :+ col("_fits") :+ col("_spentBefore"): _*)
    val joined = rows.join(broadcast(plan), groups :+ "_bkt")
    // 3. whole buckets that fit need no per-row work at all
    val whole = joined.where(col("_fits"))
    // boundary buckets: exact prefix against the remaining budget. One
    // bucket per group, so the window partition is group ∪ bucket —
    // ~1/buckets of the group, not the group.
    val wf = Window.partitionBy((gcols :+ col("_bkt")): _*)
      .orderBy(leading.desc +: tie.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined.where(!col("_fits"))
      .withColumn("_cum", sum(col("_cost")).over(wf))
      .where(col("_spentBefore") + col("_cum") <= budget)
      .drop("_cum")
    whole.unionByName(boundary)
      .drop("_bkt", "_cost", "_fits", "_spentBefore")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless range join — "point in interval" with NO equi-key — as a
  * binned equi-join.
  *
  * Spark plans a pure range predicate as BroadcastNestedLoopJoin (if
  * one side fits in memory) or a cartesian product: both are
  * O(|points|·|intervals|) and the nested-loop side must broadcast
  * whole — a non-starter at 100 TB. The standard fix (Databricks'
  * range-join bins, Flink's interval buckets) is to quantize the range
  * domain into fixed-width bins: points land in one bin, intervals
  * replicate over the bins they cover, and the join becomes a plain
  * shuffled HASH equi-join on bin id with the exact range predicate as
  * a residual filter. Cost: |points| + |intervals|·(span/width + 1)
  * rows through one shuffle — linear, partitionable, AQE-skewable,
  * no broadcast of either side.
  *
  * Pick `binWidth` near the typical interval span: replication is
  * span/width + 1 per interval, while too-wide bins admit more
  * false-candidate pairs for the residual filter to discard.
  *
  * When an equi-key EXISTS, Spark's SortMergeJoin on the key with a
  * range residual is already the right plan — this operator is for the
  * keyless case (time-window enrichment, IP-range lookup, genomic
  * interval overlap).
  */
object RangeJoin {

  /** Exact floor division for longs across the FULL long range.
    * pmod makes the numerator exactly divisible by w; the division
    * runs in decimal(38,0) because a double quotient silently loses
    * ulps above 2^53 (nanosecond epochs live there) and Spark's `/`
    * on longs returns double. Integer `div` alone would also be wrong:
    * it truncates toward zero for negatives.
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c.cast("decimal(38,0)") - pmod(c, lit(w))) / lit(w))
      .cast("long")

  /** Inner-join `points` (numeric `ptCol`) against `intervals`
    * (numeric `[loCol, hiCol]`, both inclusive). Output carries all
    * columns of both inputs (names must not collide). Intervals with
    * hi < lo or null bounds match nothing; null points match nothing.
    *
    * @param binWidth bin width in the range domain's units (e.g. ms)
    */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    val p = points.where(col(ptCol).isNotNull)
      .withColumn("_rj_bin", floorDiv(col(ptCol), binWidth))
    val iv = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(hiCol) >= col(loCol))
      .withColumn("_rj_bin",
        explode(sequence(floorDiv(col(loCol), binWidth),
          floorDiv(col(hiCol), binWidth))))
    p.join(iv, Seq("_rj_bin"))
      .where(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("_rj_bin")
  }

  /** Interval-overlap join: pairs where [aLo,aHi] ∩ [bLo,bHi] ≠ ∅
    * (inclusive bounds). Both sides replicate over their covered bins;
    * the pair is deduplicated without a `distinct` by keeping only the
    * bin containing the overlap's start — each surviving pair exists in
    * exactly one bin.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = a.columns.toSet.intersect(b.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    def binned(df: DataFrame, lo: String, hi: String) = df
      .where(col(lo).isNotNull && col(hi).isNotNull && col(hi) >= col(lo))
      .withColumn("_rj_bin",
        explode(sequence(floorDiv(col(lo), binWidth),
          floorDiv(col(hi), binWidth))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("_rj_bin"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("_rj_bin") === floorDiv(greatest(col(aLo), col(bLo)), binWidth))
      .drop("_rj_bin")
  }
}
